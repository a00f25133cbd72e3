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

    def test_two_interleaved_streams_score_independently(self, spark, tmp_path):
        """State is keyed by stream_id: two sketch streams with DIFFERENT
        histories, interleaved across micro-batches, must each reproduce
        their own batch scores (a shared key would merge the histories
        and corrupt both), and the state store must hold exactly one
        bounded row per stream."""
        import os
        import shutil
        import tempfile

        import numpy as np
        from autoaudit_spark.mining.change import change_scores_from_matrix
        from autoaudit_spark.streaming.windowed import stateful_change_scores

        n_sketch, back_ws, n_win = 4, 4, 12
        windows = [w * 1_000_000 for w in range(n_win)]

        def mat(stream):
            m = np.zeros((n_win, n_sketch))
            for i in range(n_win):
                for s in range(n_sketch):
                    m[i, s] = float((i * 7 + s * 3 + stream * 5) % 11) + 1.0
            return m

        mats = {0: mat(0), 1: mat(1)}
        expected = {
            sid: change_scores_from_matrix(windows, m, back_ws)
            for sid, m in mats.items()
        }
        # the two histories genuinely differ — merging them would show
        assert expected[0] != expected[1]

        rows = [
            (sid, windows[i], s, float(mats[sid][i, s]))
            for sid in (0, 1)
            for i in range(n_win)
            for s in range(n_sketch)
        ]
        # 3 micro-batches, each carrying a window range of BOTH streams
        stream_dir = tmp_path / "sketches"
        stream_dir.mkdir()
        for b, lo, hi in ((0, 0, 4), (1, 4, 8), (2, 8, 12)):
            chunk = [
                r for r in rows if windows[lo] <= r[1] < windows[hi - 1] + 1
            ]
            tmp = tmp_path / f"b{b}"
            spark.createDataFrame(
                chunk,
                "stream_id long, window_start long, sketch_id int, value double",
            ).coalesce(1).write.parquet(str(tmp))
            part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
            dest = stream_dir / f"{b}.parquet"
            shutil.copy(tmp / part, dest)
            os.utime(dest, (1_700_000_000 + b * 100,) * 2)

        sdf = (
            spark.readStream.schema(
                "stream_id long, window_start long, sketch_id int, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(str(stream_dir))
        )
        scored = stateful_change_scores(sdf, n_sketch=n_sketch, back_ws=back_ws)
        ck = tempfile.mkdtemp(prefix="ckpt_two_streams_")
        q = (
            scored.writeStream.format("memory")
            .queryName("two_stream_scores")
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
        assert state_rows == 2  # one bounded state row per stream key

        got: dict[int, dict[int, tuple[float, int]]] = {0: {}, 1: {}}
        for r in spark.table("two_stream_scores").collect():
            got[r["stream_id"]][r["window_start"]] = (r["z"], r["max_sketch"])
        for sid, exp in expected.items():
            assert set(got[sid]) == {w for w, _, _ in exp}
            for w, z, mx in exp:
                assert got[sid][w][0] == pytest.approx(z, rel=1e-9)
                assert got[sid][w][1] == mx


class TestStatefulChangeCosine:
    def test_bit_exact_parity_with_batch_twin(self, spark, sf_dir):
        """r5-verdict #6: the streaming cosine twin is under the FULL
        value-hash, so parity with the batch twin must be BIT-exact
        (== on doubles, not approx)."""
        from autoaudit_spark.registry import QUERIES

        stream = QUERIES["stream_change_cosine"](spark, sf_dir).collect()
        batch = QUERIES["sketch_change_cosine"](spark, sf_dir).collect()
        assert [tuple(r) for r in stream] == [tuple(r) for r in batch]

    def test_incremental_chunks_match_single_batch(self, spark, tmp_path):
        """Three maxFilesPerTrigger=1 micro-batches over the same grid
        must emit exactly the rows the single-batch run (the oracled
        path) emits — state carry-over and the last_ws emission gate
        at work."""
        import os
        import shutil

        from autoaudit_spark.streaming.windowed import (
            drain,
            stateful_change_cosine,
        )

        n_sketch, n_win = 4, 12
        windows = [w * 1_000_000 for w in range(n_win)]
        rows = [
            (windows[i], s, ((i * 7 + s * 3) % 11 + 1) * 100)
            for i in range(n_win)
            for s in range(n_sketch)
        ]
        schema = "window_start long, sketch_id int, cents long"

        def run(name, chunks):
            stream_dir = tmp_path / name
            stream_dir.mkdir()
            for b, (lo, hi) in enumerate(chunks):
                chunk = [r for r in rows if windows[lo] <= r[0] < windows[hi - 1] + 1]
                tmp = tmp_path / f"{name}_b{b}"
                spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                    str(tmp)
                )
                part = next(
                    p for p in os.listdir(tmp) if p.endswith(".parquet")
                )
                dest = stream_dir / f"{b}.parquet"
                shutil.copy(tmp / part, dest)
                os.utime(dest, (1_700_000_000 + b * 100,) * 2)
            sdf = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(str(stream_dir))
            )
            out = drain(
                stateful_change_cosine(sdf, n_sketch=n_sketch),
                f"cosine_{name}",
                output_mode="append",
            )
            return sorted(
                (r["window_start"], r["z"], r["max_sketch"])
                for r in out.collect()
            )

        incremental = run("inc", [(0, 4), (4, 8), (8, 12)])
        single = run("single", [(0, 12)])
        assert incremental == single
        assert len(single) == n_win - 4  # wn >= back_ws+1 emission rule

    def test_incomplete_window_behind_frontier_ages_out(self):
        """ADVICE r6: a window that never completes (one lost sketch row)
        must not leak state forever. Drive the scorer closures directly
        with a fake GroupState: after the frontier passes the lossy
        window, its rows are pruned, and every retained row sits at or
        above the lookback horizon."""
        import pandas as pd

        from autoaudit_spark.streaming.windowed import (
            _change_cosine_fn,
            _change_scores_fn,
        )

        class FakeState:
            def __init__(self):
                self._v = None

            @property
            def exists(self):
                return self._v is not None

            @property
            def get(self):
                return self._v

            def update(self, v):
                self._v = v

        n_sketch, back_ws, n_win = 4, 4, 12
        windows = [w * 1_000_000 for w in range(n_win)]
        lossy = windows[2]  # drop sketch 3 of window 2 — never completes

        for factory, valcol, mk in (
            (_change_cosine_fn, "cents", lambda i, s: ((i * 7 + s * 3) % 11 + 1) * 100),
            (_change_scores_fn, "value", lambda i, s: float((i * 7 + s * 3) % 11 + 1)),
        ):
            score = factory(n_sketch, back_ws)
            state = FakeState()
            rows = [
                (windows[i], s, mk(i, s))
                for i in range(n_win)
                for s in range(n_sketch)
                if not (windows[i] == lossy and s == 3)
            ]
            pdf = pd.DataFrame(
                rows, columns=["window_start", "sketch_id", valcol]
            )
            emitted = list(score((0,), iter([pdf]), state))
            assert emitted  # scoring proceeded past the lossy window
            ws, _, _, last_ws = state.get
            assert lossy < last_ws
            assert lossy not in ws, "lossy window leaked in state"
            # nothing older than the lookback horizon survives either
            complete = sorted(set(windows) - {lossy})
            horizon = complete[len(complete) - (back_ws + 1)]
            assert all(w >= horizon for w in ws)


class TestDelayParsing:
    def test_known_units_and_raise_on_calendar(self):
        """The replay sentinel must be coupled to the real watermark
        delay: fixed-duration units parse, calendar units raise (a
        silent 30-day default would strand buffered tails for larger
        delays in other units)."""
        import datetime

        from autoaudit_spark.streaming.windowed import _parse_delay

        assert _parse_delay("30 days") == datetime.timedelta(days=30)
        assert _parse_delay("1 day") == datetime.timedelta(days=1)
        assert _parse_delay("2 weeks") == datetime.timedelta(weeks=2)
        assert _parse_delay("90 minutes") == datetime.timedelta(minutes=90)
        for bad in ("2 months", "1 year", "fortnight", "10"):
            with pytest.raises(ValueError):
                _parse_delay(bad)


class TestWatermarkLateData:
    def test_very_late_rows_dropped_in_append_mode(self, spark, tmp_path):
        """T2: multi-batch replay (maxFilesPerTrigger=1). Batch 0 spans
        days 0–34; batch 1's fresh day-35 row advances the watermark to
        day 21 and EVICTS every window ending before it (they emit); batch
        2 then delivers a day-3 straggler whose windows are already
        closed — the watermark drops it. (A straggler arriving in the
        same batch as the eviction would still be merged — Spark filters
        against state that exists, a documented semantics point.)"""
        import datetime
        import os
        import shutil

        from pyspark.sql import functions as F
        from autoaudit_spark.streaming.windowed import drain

        base = datetime.datetime(2024, 1, 1)
        t = lambda d: base + datetime.timedelta(days=d)
        early = [(t(d), 1.0) for d in (0, 2, 5, 9, 12, 16, 20, 27, 34)]
        fresh = [(t(35), 1.0)]
        straggler = [(t(3), 100.0)]

        stream_dir = tmp_path / "stream"
        stream_dir.mkdir()
        for i, rows in enumerate((early, fresh, straggler)):
            tmp = tmp_path / f"w{i}"
            spark.createDataFrame(rows, "ts timestamp, v double").coalesce(
                1
            ).write.parquet(str(tmp))
            part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
            dest = stream_dir / f"{i}.parquet"
            shutil.copy(tmp / part, dest)
            os.utime(dest, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))

        sdf = (
            spark.readStream.schema("ts timestamp, v double")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(stream_dir))
        )
        agg = (
            sdf.withWatermark("ts", "14 days")
            .groupBy(F.window("ts", "14 days", "7 days").alias("w"))
            .agg(F.sum("v").alias("tot"), F.count("*").alias("n"))
            .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "tot", "n")
        )
        out = drain(agg, "wm_late_test", output_mode="append").collect()
        assert out, "no windows were closed/emitted"
        # the straggler's v=100 must not appear anywhere
        assert all(r["tot"] < 100 for r in out)
        # every emitted window's count matches batch recomputation WITHOUT
        # the dropped straggler
        kept = early + fresh
        for r in out:
            expect = sum(1 for ts, _ in kept if r["ws"] <= ts < r["we"])
            assert r["n"] == expect, (r, expect)


class TestMilestonesOutOfOrder:
    def test_shuffled_replay_matches_in_order_semantics(self, spark, sf_dir):
        """Rows dealt to micro-batch files by hash — arbitrary cross-batch
        arrival order. The watermark-buffered operator must still emit the
        global (ts, event_id)-ordered milestone crossings (round-2 verdict
        'Next round' #5: the old operator folded rows in arrival order and
        would emit wrong crossings here)."""
        from autoaudit_spark.sources import load_table
        from autoaudit_spark.streaming.windowed import (
            MILESTONE_CENTS,
            drain,
            replay_events_chunked,
            value_milestones_stream,
        )

        out = drain(
            value_milestones_stream(
                replay_events_chunked(
                    spark, sf_dir, n_chunks=4, delay="3650 days", shuffle_seed=42
                ),
                delay="3650 days",
            ),
            "milestones_ooo",
            output_mode="append",
        ).collect()
        got = {
            (r["user_id"], r["event_id"]): (r["milestone"], r["total_value"])
            for r in out
        }
        assert len(got) == len(out), "duplicate (user, event) emissions"

        # independent expected: fold each user's events in (ts, event_id)
        # order in plain Python, integer cents
        ev = sorted(
            load_table(spark, sf_dir, "events")
            .select("user_id", "event_id", "ts", "value")
            .collect(),
            key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
        )
        expected = {}
        cum, cur = 0, None
        for r in ev:
            if r["user_id"] != cur:
                cur, cum = r["user_id"], 0
            prev, cum = cum, cum + int(round(float(r["value"]) * 100))
            if cum // MILESTONE_CENTS > prev // MILESTONE_CENTS:
                expected[(r["user_id"], r["event_id"])] = (
                    cum // MILESTONE_CENTS,
                    cum / 100.0,
                )
        assert got == expected


class TestTransformWithState:
    def test_running_totals_processor_fold(self):
        """The processor's cross-batch fold (count + exact cents) without
        the streaming engine — the engine path needs protobuf, absent in
        this container (windowed.tws_available gates registration)."""
        import pandas as pd

        from autoaudit_spark.streaming.windowed import (
            _RunningTotalsProcessor,
            tws_available,
        )

        class FakeState:
            def __init__(self):
                self.v = None

            def exists(self):
                return self.v is not None

            def get(self):
                return self.v

            def update(self, v):
                self.v = v

        class FakeHandle:
            def __init__(self):
                self.state = FakeState()

            def getValueState(self, name, schema, ttlDurationMs=None):
                return self.state

        p = _RunningTotalsProcessor()
        h = FakeHandle()
        p.init(h)
        out1 = list(
            p.handleInputRows((7,), iter([pd.DataFrame({"value": [1.25, 2.50]})]), None)
        )
        out2 = list(
            p.handleInputRows((7,), iter([pd.DataFrame({"value": [0.25]})]), None)
        )
        assert h.state.v == (3, 400)  # 3 rows, 4.00 in cents
        assert out2[0]["n_events"].iloc[0] == 3
        assert out2[0]["cents"].iloc[0] == 400
        # this container lacks protobuf; if that ever changes, the
        # registration gate flips on and the query joins the oracle sweep
        assert isinstance(tws_available(), bool)


class TestCheckpointRecovery:
    def test_foreachbatch_resumes_exactly_once(self, spark, sf_dir, tmp_path):
        """Kill a streaming query mid-replay and restart it from the SAME
        checkpoint: the micro-batch log must resume without losing or
        double-counting rows. foreachBatch writes each batch to a
        batch-id-keyed dir with overwrite — the idempotent-sink pattern
        that turns at-least-once replay into exactly-once results."""
        import glob
        import time as _time

        from pyspark.sql import functions as Fn

        from autoaudit_spark.streaming.windowed import replay_events_chunked

        stream = replay_events_chunked(spark, sf_dir, n_chunks=3, delay="30 days")
        ck = str(tmp_path / "ck")
        out = str(tmp_path / "out")

        def write_batch(batch, batch_id):
            (
                batch.filter(Fn.col("event_id") >= 0)
                .select("user_id", "event_id", "value")
                .write.mode("overwrite")
                .parquet(f"{out}/batch-{batch_id}")
            )

        # phase 1: normal trigger, stop after the first committed batch
        q = (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ck)
            .trigger(processingTime="1 second")
            .start()
        )
        deadline = _time.time() + 120
        while _time.time() < deadline:
            p = q.lastProgress
            if p and p.get("numInputRows", 0) > 0:
                break
            _time.sleep(0.3)
        q.stop()
        q.awaitTermination()
        n_before = len(glob.glob(f"{out}/batch-*"))
        assert n_before >= 1  # crashed mid-replay, some batches committed

        # phase 2: SAME checkpoint + sink, drain the rest
        q2 = (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination()

        got = spark.read.parquet(f"{out}/batch-*")
        want = spark.read.parquet(f"{sf_dir}/events.parquet")
        # exactly-once: same row count, same distinct ids, same value sum
        assert got.count() == want.count()
        assert (
            got.select("event_id").distinct().count()
            == want.select("event_id").distinct().count()
        )
        g = got.agg(
            Fn.sum(Fn.col("value").cast("decimal(18,2)")).alias("s")
        ).collect()[0]["s"]
        w = want.agg(
            Fn.sum(Fn.col("value").cast("decimal(18,2)")).alias("s")
        ).collect()[0]["s"]
        assert g == w


class TestCDCOutOfOrder:
    def test_latest_snapshot_agg_is_arrival_order_free(self, spark, sf_dir):
        """max_by((ts,event_id)) over a SHUFFLED cross-batch replay must
        equal the batch latest-wins result — the fold is order-free, so
        arbitrary arrival order cannot corrupt the CDC view."""
        from pyspark.sql import functions as Fn

        from autoaudit_spark.streaming.windowed import (
            drain,
            replay_events_chunked,
        )

        stream = replay_events_chunked(
            spark,
            sf_dir,
            n_chunks=3,
            delay="40 days",
            shuffle_seed=99,  # hash-dealt chunks: arbitrary arrival order
            include_type=True,
        )
        ordkey = Fn.struct(Fn.col("ts"), Fn.col("event_id"))
        row = Fn.struct("event_id", "event_type", "value", "ts")
        agg = (
            stream.filter(Fn.col("event_id") >= 0)
            .groupBy("user_id")
            .agg(Fn.max_by(row, ordkey).alias("r"))
        )
        out = (
            drain(agg, "tst_ooo_snapshot", output_mode="complete")
            .select("user_id", "r.event_id", "r.ts")
            .orderBy("user_id")
            .collect()
        )
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(
            Fn.col("ts").desc(), Fn.col("event_id").desc()
        )
        want = (
            ev.withColumn("rn", Fn.row_number().over(w))
            .filter(Fn.col("rn") == 1)
            .select("user_id", "event_id", "ts")
            .orderBy("user_id")
            .collect()
        )
        assert [(r["user_id"], r["event_id"]) for r in out] == [
            (r["user_id"], r["event_id"]) for r in want
        ]

class TestStateBounds:
    def test_state_bounded_when_nothing_ever_completes(self):
        """Review r7: a stream that loses one sketch row of EVERY window
        (so nothing ever completes and the frontier never advances) must
        still hold at most MAX_PENDING_WINDOWS distinct windows in
        state."""
        import pandas as pd

        from autoaudit_spark.streaming.windowed import (
            MAX_PENDING_WINDOWS,
            _change_cosine_fn,
            _change_scores_fn,
        )

        class FakeState:
            def __init__(self):
                self._v = None

            @property
            def exists(self):
                return self._v is not None

            @property
            def get(self):
                return self._v

            def update(self, v):
                self._v = v

        n_sketch = 4
        for factory, valcol, mk in (
            (_change_cosine_fn, "cents", lambda i, s: 100 * (s + 1)),
            (_change_scores_fn, "value", lambda i, s: float(s + 1)),
        ):
            score = factory(n_sketch, 4)
            state = FakeState()
            for batch in range(10):  # 10 batches x 20 windows, all lossy
                rows = [
                    (1_000_000 * (batch * 20 + i), s, mk(i, s))
                    for i in range(20)
                    for s in range(n_sketch - 1)  # sketch 3 always lost
                ]
                pdf = pd.DataFrame(
                    rows, columns=["window_start", "sketch_id", valcol]
                )
                list(score((0,), iter([pdf]), state))
            ws = state.get[0]
            assert len(set(ws)) <= MAX_PENDING_WINDOWS
            # the retained windows are the NEWEST ones
            assert min(ws) >= 1_000_000 * (200 - MAX_PENDING_WINDOWS)
