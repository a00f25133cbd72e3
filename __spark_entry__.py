"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``autoaudit_spark`` (see SURVEY.md §2 for the
operator inventory); this module is a thin adapter over its registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from autoaudit_spark import registry

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 2-hop smurf-candidate detection (SURVEY.md §7.1 —
    `AA-Smurf.py:102-111` re-expressed as self-join + hash aggregate)."""
    return registry.QUERIES["two_hop_candidates"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query (rows-only ops omitted)."""
    return dict(registry.ORACLES)
