"""Property tests that drive REGISTERED queries on hypothesis-generated
event sets through the temp-parquet seam (ADVICE r4 direction, extended):
an independent pure-Python reference recomputes each result, so the
Spark implementation is checked across tie/boundary geometries the
fixed fixtures never hit — equal timestamps, gap-exactly-1h boundaries,
out-of-order stage arrivals, single-event users.

Each hypothesis example pays a parquet write + two Spark jobs, so
example counts are kept small; the generators are biased onto coarse
time grids to make collisions likely rather than relying on volume.
"""

from __future__ import annotations

import datetime as dt
import itertools

from hypothesis import HealthCheck, given, settings, strategies as st

from autoaudit_spark.registry import QUERIES

T0 = dt.datetime(2024, 1, 1)
STAGES = ["signup", "view", "click", "purchase"]
TYPES = STAGES + ["noise"]

# coarse grid: 0..12 steps of 20 minutes → equal-ts ties are likely and
# consecutive events can sit EXACTLY 3600 s apart (3 steps), pinning the
# strict-> session boundary
event_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),       # user_id
        st.integers(min_value=0, max_value=12),      # ts grid step
        st.sampled_from(TYPES),                      # event_type
    ),
    min_size=0,
    max_size=14,
)

_counter = itertools.count()


def _write_events(spark, tmp_path, rows, schema):
    d = str(tmp_path / f"ex{next(_counter)}")
    spark.createDataFrame(rows, schema).write.parquet(f"{d}/events.parquet")
    return d


class TestFunnelProperty:
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(evs=event_strategy)
    def test_funnel_matches_python_reference(self, spark, tmp_path, evs):
        rows = [
            (u, i, T0 + dt.timedelta(minutes=20 * step), t)
            for i, (u, step, t) in enumerate(evs)
        ]
        d = _write_events(
            spark,
            tmp_path,
            rows,
            "user_id long, event_id long, ts timestamp, event_type string",
        )
        got = {
            r["user_id"]: (r["t1"], r["t2"], r["t3"], r["t4"], r["reached"])
            for r in QUERIES["funnel_stages"](spark, d).collect()
        }
        # reference: array_sort on struct(ts, event_type) orders ties by
        # the type string; the fold reads PRE-step state per element
        want = {}
        for u in sorted({r[0] for r in rows}):
            seq = sorted(
                [(ts, t) for (uu, _, ts, t) in rows if uu == u],
                key=lambda x: (x[0], x[1]),
            )
            t = [None, None, None, None]
            for ts, typ in seq:
                prev = list(t)
                if typ == "signup" and prev[0] is None:
                    t[0] = ts
                if (
                    typ == "view"
                    and prev[1] is None
                    and prev[0] is not None
                    and ts > prev[0]
                ):
                    t[1] = ts
                if (
                    typ == "click"
                    and prev[2] is None
                    and prev[1] is not None
                    and ts > prev[1]
                ):
                    t[2] = ts
                if (
                    typ == "purchase"
                    and prev[3] is None
                    and prev[2] is not None
                    and ts > prev[2]
                ):
                    t[3] = ts
            reached = 4 if t[3] else 3 if t[2] else 2 if t[1] else 1 if t[0] else 0
            want[u] = (t[0], t[1], t[2], t[3], reached)
        assert got == want


class TestSessionProperty:
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(evs=event_strategy)
    def test_sessions_match_python_reference(self, spark, tmp_path, evs):
        rows = [
            (u, i, T0 + dt.timedelta(minutes=20 * step))
            for i, (u, step, _) in enumerate(evs)
        ]
        d = _write_events(
            spark, tmp_path, rows, "user_id long, event_id long, ts timestamp"
        )
        got = [
            (
                r["user_id"],
                r["session_id"],
                r["n_events"],
                r["session_start"],
                r["session_end"],
            )
            for r in QUERIES["user_sessions"](spark, d).collect()
        ]
        want = []
        for u in sorted({r[0] for r in rows}):
            seq = sorted(
                [(ts, eid) for (uu, eid, ts) in rows if uu == u],
                key=lambda x: (x[0], x[1]),
            )
            sid = 0
            cur: list[dt.datetime] = []
            for i, (ts, _) in enumerate(seq):
                # strictly MORE than one hour opens a new session — a gap
                # of exactly 3600s continues the current one
                if i == 0 or (ts - seq[i - 1][0]).total_seconds() > 3600:
                    if cur:
                        want.append((u, sid, len(cur), cur[0], cur[-1]))
                    sid += 1
                    cur = []
                cur.append(ts)
            if cur:
                want.append((u, sid, len(cur), cur[0], cur[-1]))
        assert got == sorted(want, key=lambda x: (x[0], x[1]))


class TestAsofProperty:
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        evs=st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=3),   # user
                st.integers(min_value=0, max_value=8),   # ts step
                st.sampled_from(["view", "click", "noise"]),
            ),
            min_size=0,
            max_size=16,
        )
    )
    def test_attribution_matches_python_reference(self, spark, tmp_path, evs):
        """Each click attaches the latest view with v.ts <= c.ts for the
        same user; views tied on (user, ts) resolve to the GREATEST
        event_id. The coarse grid makes same-timestamp view/view and
        view/click collisions common, pinning both tie rules."""
        rows = [
            (u, i, T0 + dt.timedelta(minutes=20 * step), t)
            for i, (u, step, t) in enumerate(evs)
        ]
        d = _write_events(
            spark,
            tmp_path,
            rows,
            "user_id long, event_id long, ts timestamp, event_type string",
        )
        got = [
            (r["click_id"], r["user_id"], r["click_ts"], r["view_id"],
             r["view_ts"], r["wait_us"])
            for r in QUERIES["asof_join_attribution"](spark, d).collect()
        ]
        views = [(u, ts, eid) for (u, eid, ts, t) in rows if t == "view"]
        want = []
        for (u, eid, ts, t) in rows:
            if t != "click":
                continue
            cands = [(vts, vid) for (vu, vts, vid) in views
                     if vu == u and vts <= ts]
            if cands:
                vts, vid = max(cands)
                us = int((ts - vts).total_seconds() * 1_000_000)
                want.append((eid, u, ts, vid, vts, us))
            else:
                want.append((eid, u, ts, None, None, None))
        want.sort(key=lambda x: x[0])
        assert got == want


class TestFunnelStrictness:
    def test_same_timestamp_stage_does_not_advance(self, spark, tmp_path):
        """Deterministic pin for the STRICT t_k > t_{k-1} rule (a
        mutation sweep showed the randomized generator can miss it): a
        view at exactly the signup's timestamp must NOT count as stage
        2, but a later view must — and the user still reaches stage 2
        only through the later view."""
        rows = [
            (1, 0, T0, "signup"),
            (1, 1, T0, "view"),                          # same instant: no
            (1, 2, T0 + dt.timedelta(minutes=5), "view"),  # later: yes
            (2, 3, T0, "signup"),
            (2, 4, T0, "view"),                          # same instant only
        ]
        d = _write_events(
            spark,
            tmp_path,
            rows,
            "user_id long, event_id long, ts timestamp, event_type string",
        )
        got = {
            r["user_id"]: (r["t1"], r["t2"], r["reached"])
            for r in QUERIES["funnel_stages"](spark, d).collect()
        }
        assert got[1] == (T0, T0 + dt.timedelta(minutes=5), 2)
        assert got[2] == (T0, None, 1)


class TestAsofTiebreak:
    def test_equal_ts_views_resolve_to_greatest_event_id(self, spark, tmp_path):
        """Deterministic pin (mutation sweep: the randomized generator
        can miss it): two views at the identical (user, ts) must
        attribute to the GREATEST event_id, and a view at exactly the
        click's timestamp is eligible (inclusive bound)."""
        rows = [
            (1, 10, T0, "view"),
            (1, 11, T0, "view"),   # same instant, higher id → must win
            (1, 12, T0, "click"),  # same instant as the views: inclusive
        ]
        d = _write_events(
            spark,
            tmp_path,
            rows,
            "user_id long, event_id long, ts timestamp, event_type string",
        )
        r = QUERIES["asof_join_attribution"](spark, d).collect()
        assert len(r) == 1
        assert (r[0]["view_id"], r[0]["wait_us"]) == (11, 0)


class TestMixAllocationProperty:
    def test_hamilton_invariants_random_strata(self, spark, tmp_path):
        """Random stratum masses through the temp-parquet seam into the
        REGISTERED query: Σalloc == budget exactly, every stratum gets
        base or base+1, and |alloc − ideal| < 1 (the Hamilton quota
        property)."""
        from hypothesis import HealthCheck, given, settings, strategies as st

        from autoaudit_spark.llm.text import MIX_BUDGET
        from autoaudit_spark.registry import QUERIES

        counter = itertools.count(1000)

        @settings(
            max_examples=8,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(
            masses=st.lists(
                st.integers(min_value=1, max_value=400),
                min_size=1,
                max_size=12,
            )
        )
        def check(masses):
            rows = [
                (i, "w " * (m - 1) + "w", f"l{i % 3}", f"s{i}", m)
                for i, m in enumerate(masses)
            ]
            d = str(tmp_path / f"mix{next(counter)}")
            spark.createDataFrame(
                rows,
                "doc_id long, text string, lang string, source string, "
                "n_chars long",
            ).write.parquet(f"{d}/events.parquet".replace("events", "documents"))
            out = QUERIES["corpus_mix_allocation"](spark, d).collect()
            total = sum(r["g_tokens"] for r in out)
            assert total == sum(masses)
            assert sum(r["alloc"] for r in out) == MIX_BUDGET
            for r in out:
                assert r["alloc"] in (r["base_alloc"], r["base_alloc"] + 1)
                ideal = MIX_BUDGET * r["g_tokens"] / total
                assert abs(r["alloc"] - ideal) < 1.0

        check()
