"""Parquet table loaders + the canonical graph derivation.

The driver testdata (TESTDATA.md) is a TPC-H-ish star schema plus `events`,
`documents`, `embeddings`. The reference's primary input is a weighted
temporal multigraph with columns (Source, Destination, Weight, Timestamp)
— `AA-AR.py:286-287` in /root/reference. We derive the equivalent edge
relation from `events` deterministically and SQL-expressibly, so every
graph operator has a DuckDB-oracle twin:

    src    = user_id
    dst    = event_id % DST_MOD        (deterministic pseudo-counterparty)
    weight = value
    ts     = ts

Duplicate (src, dst) pairs are distinct transactions (multigraph — never
pre-dedup); the binary adjacency used by AA-Smurf's matrix algebra
(`AA-Smurf.py:190`) is the DISTINCT projection of (src, dst).

Scale note: loaders are plain `spark.read.parquet` — Catalyst handles
column pruning + predicate pushdown; nothing is collected or cached here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: modulus for the derived counterparty id — chosen to match the sf0.01
#: user-id universe (150 users) so 2-hop paths exist at every sf.
DST_MOD = 150

#: DuckDB CTE equivalent of :func:`edges` — prepend to oracle SQL.
#: CSV timestamp format carrying full microsecond precision (S2 loader +
#: any writer meant to round-trip through it).
CSV_TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

EDGES_SQL = (
    "SELECT user_id AS src, CAST(event_id % 150 AS BIGINT) AS dst, "
    "value AS weight, ts FROM events"
)


def _ensure_session_confs(spark: SparkSession) -> None:
    """Make a FOREIGN SparkSession (e.g. the driver harness's own) able to
    run every query: these are runtime-settable SQL confs, so setting them
    here is cheap, idempotent, and covers sessions not built by
    `session.get_spark`.

    - nanosAsLong: events.parquet carries TIMESTAMP(NANOS), which Spark
      rejects outright without it;
    - UTC session timezone: timestamps must hash-match the DuckDB oracle
      (DuckDB parquet timestamps are UTC-naive);
    - Arrow: every pandas-boundary operator assumes columnar batches."""
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked (e.g. static in a future version) — proceed


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) in parquet; what Spark hands back
    depends on the version:

    - with spark.sql.legacy.parquet.nanosAsLong honored (≤4.0) it arrives
      as LONG nanoseconds — truncate to micros with integer `div`, NOT `/`:
      ns-since-epoch (~1.7e18) exceeds double's 2^53 integer range, so float
      division corrupts the low microseconds;
    - ≥4.1 reads nanos natively as TIMESTAMP_NTZ already truncated to
      micros — cast to session-tz TIMESTAMP (UTC session ⇒ value-preserving).

    Both paths land on the same micros-truncated TIMESTAMP, identical to
    DuckDB's ns→us TIMESTAMP coercion, so oracle value-hashes match."""
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted temporal multigraph (src, dst, weight, ts) from `events`.

    Mirrors the reference's edge DataFrame (`AA-AR.py:286-287`): one row
    per transaction, parallel edges preserved.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").alias("src"),
        (F.col("event_id") % F.lit(DST_MOD)).cast("long").alias("dst"),
        F.col("value").alias("weight"),
        F.col("ts"),
    )


def adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static binary directed graph: DISTINCT (src, dst) — the sparse COO
    form of the reference's dense adjacency matrix (`AA-Smurf.py:190`).
    Never materializes N×N; at 100 TB the dense form is impossible.

    Session-scoped persist (r18, the shared_points pattern): this
    relation is the shared input of the entire graph family (~29 call
    sites, ~25 HEADLINE rows) and was re-derived — scan + distinct
    exchange, ~0.5-0.8 s per evaluation at sf0.1 — inside every
    consumer's plan, usually twice per query (node universe + neighbor
    relation sides). One persisted build per (session, sf_dir); the
    build cost is paid inside the FIRST consumer's own execution, never
    across bench/oracle runs (in-memory only, dies with the session).
    persist() rather than localCheckpoint deliberately: the logical
    plan is two operators (scan, distinct), so there is no re-analysis
    cost to truncate (the r17 maha lesson does not apply), and keeping
    the plan lets consumers' scans stay visible for column-pruning
    checks. MEMORY_AND_DISK by default, so a real deployment spills
    instead of OOMing on a corpus-sized edge set."""
    from ..session_cache import session_bucket

    bucket = session_bucket(spark, "adjacency")
    df = bucket.get(sf_dir)
    if df is None:
        df = edges(spark, sf_dir).select("src", "dst").distinct().persist()
        bucket[sf_dir] = df
    return df


def load_csv_edges(
    spark: SparkSession, path: str, sep: str = ",", columns: list[str] | None = None
) -> DataFrame:
    """S2/S3: edge-list CSV scan with explicit schema (no inference), header
    skip, configurable delimiter, optional column projection, null-drop —
    `pd.read_csv(dtype=int, skiprows=1, names=[...])` at `AA-AR.py:286-287`
    and `pd.read_csv(sep=';', usecols=[...]).dropna()` at
    `smurf_generator.py:45`, as one declarative scan. Projection and the
    not-null predicates reach the CSV reader via Catalyst."""
    schema = "src LONG, dst LONG, weight DOUBLE, ts TIMESTAMP"
    df = (
        spark.read.option("header", "true")
        .option("sep", sep)
        # micros-precision: the default CSV format truncates to millis
        .option("timestampFormat", CSV_TS_FORMAT)
        .schema(schema)
        .csv(path)
        .na.drop()
    )
    return df.select(*columns) if columns else df
