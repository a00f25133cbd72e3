"""Bucketed storage → co-located joins: the 100 TB shuffle eliminator.

At cluster scale, the dominant cost of a fact⋈fact join is the exchange
of both sides on the join key. Spark's storage bucketing
(`DataFrameWriter.bucketBy` + `saveAsTable`) pre-partitions each table
into N hash buckets ON DISK; a join of two tables bucketed by the same
key into the same N reads bucket i against bucket i directly — zero
Exchange in the physical plan, on every subsequent join, forever.

The registered query writes two per-account aggregate relations of the
edge table bucketed by `account` (out-degree totals and in-degree
totals), reads them back through the catalog, and joins them co-located.
`tests/test_plans.py::TestRound3Plans` asserts the joined plan contains
NO Exchange — the property that survives the 1000-executor scale-up.
The oracle is the plain logical result (bucketing must never change
values, only the plan).

Reference scope note: the reference engine (AA-AR.py / AA-Smurf.py)
re-reads and re-shuffles its pickle inputs per run; bucketed tables are
the engine-level capability a 100 TB deployment swaps in.
"""

from __future__ import annotations

import itertools
import os
import tempfile
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from .tables import EDGES_SQL, edges

N_BUCKETS = 8

# Session-scoped caches keyed on the SparkSession OBJECT (weakly), not
# id(spark): CPython can reuse an id after GC, which would alias a new
# session to a dead one's catalog tables / temp paths. WeakKeyDictionary
# entries die with the session instead.
_WRITTEN: "weakref.WeakKeyDictionary[SparkSession, dict[str, tuple[str, str]]]" = (
    weakref.WeakKeyDictionary()
)
_TAG = itertools.count()


def bucketed_degree_tables(
    spark: SparkSession, sf_dir: str, n_buckets: int = N_BUCKETS
) -> tuple[DataFrame, DataFrame]:
    """Write (once per session+sf) and read back the two co-bucketed
    per-account aggregate tables. `sortBy` on the bucket key additionally
    lets the merge join skip its sorts on a real cluster."""
    per_session = _WRITTEN.setdefault(spark, {})
    if sf_dir not in per_session:
        e = edges(spark, sf_dir)
        tag = next(_TAG)
        names = (f"acct_out_{tag}", f"acct_in_{tag}")
        # DECIMAL(18,2) before SUM on BOTH engines: float summation order
        # differs between Spark partial aggregation and DuckDB, so a raw
        # double sum can land either side of a 2dp rounding boundary.
        rels = (
            e.groupBy(F.col("src").alias("account")).agg(
                F.count("*").alias("n_out"),
                F.round(F.sum(F.col("weight").cast("decimal(18,2)")), 2)
                .cast("double")
                .alias("tot_out"),
            ),
            e.groupBy(F.col("dst").alias("account")).agg(
                F.count("*").alias("n_in"),
                F.round(F.sum(F.col("weight").cast("decimal(18,2)")), 2)
                .cast("double")
                .alias("tot_in"),
            ),
        )
        base = tempfile.mkdtemp(prefix="bucketed_")
        for name, rel in zip(names, rels):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            (
                rel.write.bucketBy(n_buckets, "account")
                .sortBy("account")
                .option("path", os.path.join(base, name))
                .format("parquet")
                .mode("overwrite")
                .saveAsTable(name)
            )
        per_session[sf_dir] = names
    out_name, in_name = per_session[sf_dir]
    return spark.table(out_name), spark.table(in_name)


_PARTITIONED: "weakref.WeakKeyDictionary[SparkSession, dict[str, str]]" = (
    weakref.WeakKeyDictionary()
)


def partitioned_events_path(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per session+sf) the events table as parquet
    HIVE-PARTITIONED by event_type — the layout that lets a typed query
    read only its directories. At 100 TB, partition pruning is the
    difference between scanning one event type and scanning the table."""
    per_session = _PARTITIONED.setdefault(spark, {})
    if sf_dir not in per_session:
        from .tables import load_table

        path = tempfile.mkdtemp(prefix="events_by_type_")
        (
            load_table(spark, sf_dir, "events")
            .write.partitionBy("event_type")
            .mode("overwrite")
            .parquet(path)
        )
        per_session[sf_dir] = path
    return per_session[sf_dir]


@query(
    "partition_pruned_scan",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS tot_value
    FROM events
    WHERE event_type IN ('click', 'view')
    GROUP BY event_type ORDER BY event_type
    """,
)
def q_partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over two event types read from the event_type-partitioned
    layout: the filter must become a PartitionFilter (directory pruning —
    untouched partitions are never listed or read; CI-asserted), not a
    row-level predicate. Values identical to scanning the flat table."""
    df = spark.read.parquet(partitioned_events_path(spark, sf_dir))
    return (
        df.filter(F.col("event_type").isin("click", "view"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("tot_value"),
        )
        .orderBy("event_type")
    )


@query(
    "bucketed_degree_join",
    oracle=f"""
    WITH edges AS ({EDGES_SQL}),
    o AS (SELECT src AS account, COUNT(*) AS n_out,
                 CAST(ROUND(SUM(CAST(weight AS DECIMAL(18,2))), 2) AS DOUBLE)
                     AS tot_out
          FROM edges GROUP BY src),
    i AS (SELECT dst AS account, COUNT(*) AS n_in,
                 CAST(ROUND(SUM(CAST(weight AS DECIMAL(18,2))), 2) AS DOUBLE)
                     AS tot_in
          FROM edges GROUP BY dst)
    SELECT o.account, o.n_out, o.tot_out, i.n_in, i.tot_in
    FROM o JOIN i ON o.account = i.account
    ORDER BY o.account
    """,
)
def q_bucketed_degree_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join of two account-bucketed tables — values identical
    to the plain join (the oracle IS the plain form); the plan is the
    point: zero Exchange (CI-asserted). The `merge` hint pins a
    sort-merge join so the test scale's broadcast threshold doesn't hide
    the bucketing (broadcast would also be exchange-free here, but only
    bucketing stays exchange-free when BOTH sides are fact-sized)."""
    out_t, in_t = bucketed_degree_tables(spark, sf_dir)
    return (
        out_t.hint("merge")
        .join(in_t, "account")
        .select("account", "n_out", "tot_out", "n_in", "tot_in")
        .orderBy("account")
    )


# ---------------------------------------------------------------------------
# Source-format round-trips: the same relation through JSONL (the
# ubiquitous ingest format — schema'd read, no inference at scale) and
# ORC (the other columnar container Spark ships a native reader for).
# The oracle is the parquet-view content: a format layer must never
# change values. Timestamps ride as epoch micros in JSON (string-free,
# timezone-proof) and natively in ORC.
# ---------------------------------------------------------------------------
_FMT_DIRS: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], str]]" = (
    weakref.WeakKeyDictionary()
)


def _events_via_format(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    from .tables import load_table

    per_session = _FMT_DIRS.setdefault(spark, {})
    key = (sf_dir, fmt)
    if key not in per_session:
        ev = load_table(spark, sf_dir, "events").select(
            "user_id", "event_id",
            F.unix_micros("ts").alias("ts_us"), "event_type", "value",
        )
        path = tempfile.mkdtemp(prefix=f"events_{fmt}_")
        ev.write.format(fmt).mode("overwrite").save(path)
        per_session[key] = path
    schema = "user_id long, event_id long, ts_us long, event_type string, value double"
    return (
        spark.read.format(fmt).schema(schema).load(per_session[key])
        .select(
            "user_id", "event_id",
            F.timestamp_micros("ts_us").alias("ts"), "event_type", "value",
        )
    )


_EVENTS_ORACLE = """
    SELECT user_id, event_id, ts, event_type, value
    FROM events ORDER BY event_id
    """


@query("json_source_roundtrip", oracle=_EVENTS_ORACLE)
def q_json_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family: events → JSONL → schema'd read (no inference — at 100 TB
    schema inference is a full extra scan) → identical relation."""
    return _events_via_format(spark, sf_dir, "json").orderBy("event_id")


@query("orc_source_roundtrip", oracle=_EVENTS_ORACLE)
def q_orc_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family: events → ORC → native columnar read → identical relation."""
    return _events_via_format(spark, sf_dir, "orc").orderBy("event_id")


@query("csv_source_roundtrip", oracle=_EVENTS_ORACLE)
def q_csv_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family: events → CSV → schema'd read → identical relation
    (the reference's own ingest format, `AA-AR.py:286-287` /
    `smurf_generator.py:45`, as a round-trip). Doubles survive because
    Spark writes shortest-round-trip decimal text; timestamps ride as
    epoch-micros longs (text timestamps would re-parse through a
    pattern — lossy and tz-dependent)."""
    return _events_via_format(spark, sf_dir, "csv").orderBy("event_id")


# ---------------------------------------------------------------------------
# S-family: Morton (Z-order) interleaved sort key — the data-layout lever
# for MULTI-dimension predicate pruning (what Delta's OPTIMIZE ZORDER does;
# OSS parquet gets the same effect by sorting on the interleaved key before
# writing, so per-file/row-group min-max stats are narrow on BOTH columns).
# The pruning win is MEASURED in tests/test_analytics.py::TestMortonLayout
# against file-footer stats; this query pins the interleave arithmetic
# itself cross-engine.
# ---------------------------------------------------------------------------
MORTON_USER_BITS = 8   # user_id ∈ [0, 150) fits 8 bits
MORTON_VAL_BITS = 5    # value bucket ∈ [0, 20) fits 5 bits


def _morton_sql(u: str, b: str) -> str:
    """Engine-portable interleave expression (works verbatim in Spark SQL
    and DuckDB: shiftleft/shiftright exist in both? — DuckDB uses <<//>>,
    Spark accepts both function and operator forms; emit operators via
    each engine's accepted spelling)."""
    terms = []
    for i in range(MORTON_USER_BITS):
        terms.append(f"((({u} >> {i}) & 1) << {2 * i + 1})")
    for i in range(MORTON_VAL_BITS):
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return " | ".join(terms)


@query(
    "morton_order_key",
    oracle=f"""
    WITH b AS (
        SELECT event_id, user_id,
               LEAST(CAST(FLOOR(value / 25.0) AS BIGINT), 19) AS bucket
        FROM events
    )
    SELECT event_id, user_id, bucket,
           CAST({_morton_sql('user_id', 'bucket')} AS BIGINT) AS morton
    FROM b
    ORDER BY morton, event_id
    """,
)
def q_morton_order_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family: the Z-order sort key — user_id and value-bucket bits
    interleaved so sorting by it clusters BOTH dimensions at once
    (points close in Morton order are close in each coordinate). Writing
    parquet sorted on this key gives every file narrow min-max stats on
    both columns, so a 2-D predicate prunes files the way a 1-D sort
    only can for its own column; the measured file-level evidence lives
    in the test suite. Pure integer bit arithmetic — identical in both
    engines."""
    from .tables import load_table

    ev = load_table(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 25.0).cast("long"), F.lit(19))
    b = ev.select("event_id", "user_id", bucket.alias("bucket"))
    morton = F.expr(_morton_sql("user_id", "bucket")).cast("long")
    return b.select(
        "event_id", "user_id", "bucket", morton.alias("morton")
    ).orderBy("morton", "event_id")
