"""Equivalence proofs for the round-5 scale decompositions: each
distributed form (shard/day/pid prefix-offset) must produce BIT-IDENTICAL
rows to the straightforward single-window formulation on the same data.
The plan tests assert the scale shape; these assert the algebra —
together they pin "same answer, scalable plan".
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from autoaudit_spark.registry import QUERIES


def rows(df):
    return [tuple(r) for r in df.collect()]


class TestPrefixOffsetEquivalence:
    def test_sequence_packing_equals_global_window(self, spark, sf_dir):
        from autoaudit_spark.llm.text import PACK_CAPACITY, _tokens
        from autoaudit_spark.sources import load_table

        docs = load_table(spark, sf_dir, "documents")
        toks = docs.filter(F.length(F.trim(F.col("text"))) > 0).select(
            "doc_id",
            F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens"),
        )
        w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
        start = F.sum("n_tokens").over(w) - F.col("n_tokens")
        reference = toks.select(
            "doc_id",
            "n_tokens",
            F.floor(start / PACK_CAPACITY).cast("long").alias("bin"),
            (start % PACK_CAPACITY).cast("long").alias("offset_in_bin"),
        ).orderBy("doc_id")
        got = QUERIES["sequence_packing"](spark, sf_dir)
        assert rows(got) == rows(reference)

    def test_session_concurrency_equals_global_sweep(self, spark, sf_dir):
        from autoaudit_spark.sources import load_table

        ev = load_table(spark, sf_dir, "events")
        order = Window.partitionBy("user_id").orderBy("ts", "event_id")
        lag_ts = F.lag("ts").over(order)
        seq = ev.select(
            "user_id",
            "ts",
            "event_id",
            F.when(
                lag_ts.isNull()
                | (
                    F.unix_micros(F.col("ts")) - F.unix_micros(lag_ts)
                    > 3_600_000_000
                ),
                1,
            )
            .otherwise(0)
            .alias("is_new"),
        )
        sess = seq.withColumn(
            "session_id",
            F.sum("is_new").over(
                order.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        spans = sess.groupBy("user_id", "session_id").agg(
            F.min("ts").alias("s"),
            (F.max("ts") + F.expr("INTERVAL 1 HOUR")).alias("e"),
        )
        bounds = spans.select(
            F.col("s").alias("ts"), F.lit(1).alias("delta")
        ).unionAll(spans.select(F.col("e").alias("ts"), F.lit(-1).alias("delta")))
        sweep = Window.orderBy("ts", "delta").rowsBetween(
            Window.unboundedPreceding, 0
        )
        reference = bounds.select(
            "ts",
            F.col("delta").cast("long").alias("delta"),
            F.sum("delta").over(sweep).cast("long").alias("concurrent"),
        ).orderBy("ts", "delta", "concurrent")
        got = QUERIES["session_concurrency"](spark, sf_dir)
        assert rows(got) == rows(reference)

    def test_relabel_rank_equals_global_row_number(self, spark, sf_dir):
        from autoaudit_spark.operators.graph import (
            adjacency,
            node_universe,
            relabel,
        )

        adj = adjacency(spark, sf_dir)
        nodes = node_universe(adj)
        reference_map = nodes.withColumn(
            "rank",
            (F.row_number().over(Window.orderBy("node")) - 1).cast("long"),
        )
        reference = relabel(adj, reference_map, hint_broadcast=True).orderBy(
            "src", "dst"
        )
        got = QUERIES["relabel_reorder"](spark, sf_dir)
        assert rows(got) == rows(reference)

    def test_sequence_packing_is_span_invariant(self, spark, sf_dir):
        """The shard span is a pure parallelism knob: results must not
        depend on it (exact BIGINT sums regroup associatively)."""
        import autoaudit_spark.llm.text as text_mod

        base = rows(QUERIES["sequence_packing"](spark, sf_dir))
        orig = text_mod.PACK_SHARD_SPAN
        try:
            for span in (7, 1000000):
                text_mod.PACK_SHARD_SPAN = span
                assert rows(QUERIES["sequence_packing"](spark, sf_dir)) == base
        finally:
            text_mod.PACK_SHARD_SPAN = orig
