"""Per-SparkSession cache whose entries actually die with the session.

A module-level ``WeakKeyDictionary[SparkSession, dict]`` is IMMORTAL when
the cached values are DataFrames: ``df._session`` strongly references the
key, so the weak reference can never clear (the documented
WeakKeyDictionary caveat) and every stopped session plus its persisted
relations stays pinned for process lifetime. An ``id(spark)``-keyed
registry has the same flaw plus id-reuse aliasing.

The only structure with the right lifetime is the session's OWN object
graph: the bucket lives as an attribute on the session instance, so
session → bucket → DataFrame → session is one self-contained cycle the
garbage collector frees as a unit when the last external reference to
the session drops. No global registry, no id reuse, no immortal pins.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

_ATTR = "_autoaudit_session_caches"


def session_bucket(spark: SparkSession, name: str) -> dict[Any, Any]:
    """Named per-session dict stored on the session instance itself —
    collected together with the session, immune to id reuse."""
    caches = getattr(spark, _ATTR, None)
    if caches is None:
        caches = {}
        setattr(spark, _ATTR, caches)
    return caches.setdefault(name, {})
