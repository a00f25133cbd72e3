"""Structured Streaming layer: batch/stream parity + stateful operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


class TestStreamWindowedAgg:
    def test_parity_with_batch_window_agg(self, spark, sf_dir):
        from autoaudit_spark.registry import QUERIES

        stream_rows = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["tot_value"])
            for r in QUERIES["stream_window_event_stats"](spark, sf_dir).collect()
        }
        batch_rows = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["tot_value"])
            for r in QUERIES["window_event_stats"](spark, sf_dir).collect()
        }
        assert stream_rows == batch_rows


class TestStreamSessions:
    def test_session_windows_close_on_gap(self, spark, sf_dir):
        from autoaudit_spark.registry import QUERIES

        rows = QUERIES["stream_user_sessions"](spark, sf_dir).collect()
        assert rows
        # session invariants: end = last event + gap ⇒ end - start ≥ gap
        # only when >1 event; n_events ≥ 1; per-user sessions don't overlap
        by_user: dict[int, list] = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append(r)
        for sess in by_user.values():
            sess.sort(key=lambda r: r["session_start"])
            for a, b in zip(sess, sess[1:]):
                assert a["session_end"] <= b["session_start"]

    def test_session_total_events_matches_raw(self, spark, sf_dir):
        from autoaudit_spark.registry import QUERIES
        from autoaudit_spark.sources import load_table

        total = sum(
            r["n_events"]
            for r in QUERIES["stream_user_sessions"](spark, sf_dir).collect()
        )
        assert total == load_table(spark, sf_dir, "events").count()


class TestStatefulChangeScores:
    def test_parity_with_batch_change_scores(self, spark, sf_dir):
        from autoaudit_spark.registry import QUERIES

        stream = {
            r["window_start"]: (r["z"], r["max_sketch"])
            for r in QUERIES["stream_change_scores"](spark, sf_dir).collect()
        }
        batch = {
            r["window_start"]: (r["z"], r["max_sketch"])
            for r in QUERIES["change_scores"](spark, sf_dir).collect()
        }
        # change_scores at sf0.001 uses the same sketch_num=64 default
        assert set(stream) == set(batch)
        for w, (z, mx) in batch.items():
            assert stream[w][0] == pytest.approx(z, rel=1e-9)
            assert stream[w][1] == mx
