"""Query + oracle registry backing __spark_entry__.py.

Every operator module registers its public queries here via the
:func:`query` decorator. The driver's correctness gate runs each Spark
query AND its DuckDB oracle SQL at sf0.01 and compares row-count + schema +
order-insensitive value-hash — so every registered pair must agree on
COLUMN NAMES and exact value semantics (var_pop vs var_samp, exact median,
coalesce-zero-fill, half-open intervals).

Oracle SQL runs in DuckDB with views pre-registered for: region nation
customer supplier part orders lineitem events documents embeddings.
Queries over the derived graph prepend the `edges` CTE from
``sources.EDGES_SQL``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register `fn(spark, sf_dir) -> DataFrame` under `name`, with an
    optional DuckDB oracle SQL string (omit only for genuinely
    non-SQL-expressible operators — the driver then records a weaker
    rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            if "--" in oracle:
                # whitespace collapsing below would swallow everything
                # after a `--` line comment into one giant comment
                raise ValueError(
                    f"oracle for {name!r} contains a `--` SQL comment; "
                    "put explanations in the Python docstring instead"
                )
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def load_all() -> None:
    """Import every registering module (idempotent)."""
    from .operators import graph, relational, features, windows, temporal_joins, analytics  # noqa: F401
    from .mining import powerlaw, mdl, smurf, iforest, sketch, change, generator  # noqa: F401
    from .llm import dedup, similarity, text, multimodal  # noqa: F401
    from .sources import bucketed, pysource  # noqa: F401
    from .streaming import windowed  # noqa: F401
    from .functions import udtf  # noqa: F401
