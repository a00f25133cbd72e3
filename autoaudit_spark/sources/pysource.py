"""S-family, Python DataSource API tier (Spark 4): a custom `DataSource`
that reads the events parquet through pyarrow on the EXECUTORS — one
input partition per parquet row group, each yielding Arrow RecordBatches.

This pins the API a user reaches for when the data lives somewhere
Spark has no built-in connector (internal services, bespoke formats,
REST-paginated feeds): implement `partitions()` for parallelism and
`read(partition)` for the per-split scan, and the engine handles
scheduling, retries, and Arrow transfer. Reading a parquet file this way
is deliberately redundant — it makes the custom source's output
comparable byte-for-byte against the native reader via the same DuckDB
oracle as the JSONL/ORC/CSV round-trips.

Scale posture: splits = row groups (the natural parquet parallelism
unit); the file is opened per split on the executor (no driver
materialization); batches stream through Arrow without row conversion.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..registry import query

_SCHEMA = (
    "user_id long, event_id long, ts_us long, event_type string, value double"
)


class _RowGroup(InputPartition):
    def __init__(self, index: int):
        self.index = index


class _EventsReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]

    def partitions(self):
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self.path).num_row_groups
        return [_RowGroup(i) for i in range(n)]

    def read(self, partition):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        f = pq.ParquetFile(self.path)
        tbl = f.read_row_group(
            partition.index,
            columns=["user_id", "event_id", "ts", "event_type", "value"],
        )
        # normalize to epoch micros whatever unit pyarrow surfaces the
        # parquet timestamp as (integer floor-div; exact)
        ts_col = tbl.column("ts")
        unit = ts_col.type.unit
        div = {"ns": 1000, "us": 1, "ms": None, "s": None}[unit]
        if div is None:
            raise ValueError(f"unexpected timestamp unit {unit!r}")
        ts_us = pc.divide(ts_col.cast(pa.int64()), div)
        out = pa.table(
            {
                "user_id": tbl.column("user_id"),
                "event_id": tbl.column("event_id"),
                "ts_us": ts_us,
                "event_type": tbl.column("event_type"),
                "value": tbl.column("value"),
            }
        )
        yield from out.to_batches()


class PyArrowEventsDataSource(DataSource):
    """`format("pyarrow_events")` — events.parquet via a user-defined
    Python source (row-group-parallel pyarrow scan)."""

    @classmethod
    def name(cls) -> str:
        return "pyarrow_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _EventsReader(self.options)


import weakref

# per-session registration marker on the session OBJECT (repo convention
# — an id(spark) key could alias a NEW session to a collected one's id
# and silently skip registration, leaving format("pyarrow_events")
# unresolvable)
_REGISTERED: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def _ensure_registered(spark: SparkSession) -> None:
    if spark not in _REGISTERED:
        spark.dataSource.register(PyArrowEventsDataSource)
        _REGISTERED.add(spark)


@query(
    "python_datasource_roundtrip",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM events ORDER BY event_id
    """,
)
def q_python_datasource_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family: events through the custom Python DataSource (executor-
    side pyarrow, one split per row group) → identical relation to the
    native parquet scan, under the same oracle as the format
    round-trips."""
    _ensure_registered(spark)
    path = os.path.join(sf_dir, "events.parquet")
    return (
        spark.read.format("pyarrow_events")
        .schema(_SCHEMA)
        .option("path", path)
        .load()
        .select(
            "user_id",
            "event_id",
            F.timestamp_micros("ts_us").alias("ts"),
            "event_type",
            "value",
        )
        .orderBy("event_id")
    )
