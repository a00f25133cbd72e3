"""SparkSession factory tuned for the local[32] test harness while keeping
cluster-scale posture (AQE, adaptive coalesce/skew-join) on by default.

On a real 1000-executor cluster the same settings apply unchanged except
`master` and memory sizing; nothing here assumes single-node execution.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "autoaudit_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the session.

    - shuffle partitions default to the local core count: the testdata is
      small (sf<=0.1); at real scale this is overridden by AQE's coalescing
      anyway (`spark.sql.adaptive.coalescePartitions.enabled`).
    - session timezone pinned to UTC so timestamps hash-match the DuckDB
      oracle (DuckDB parquet timestamps are UTC-naive).
    - Arrow enabled: every pandas-boundary operator (applyInPandas /
      mapInPandas) transfers columnar batches, not pickled rows.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # AQE coalescing merges small shuffle partitions by BYTE size; our
        # pandas-UDF stages (iforest, sketches) are CPU-bound per row, so
        # at test scale (~MBs) it collapses them to 1 partition and
        # serializes the forest (measured 35s -> 5.5s at sf0.01 off).
        # On a real cluster partitions exceed the advisory size and
        # re-enabling is free; locally the extra empty tasks cost ~ms.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.parquet stores TIMESTAMP(NANOS) which Spark rejects by
        # default; read as long and convert in the loader (sources/tables.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
