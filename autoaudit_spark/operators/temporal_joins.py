"""Temporal join operators beyond the reference's surface — as-of
(point-in-time) join and trailing range join over the `events` stream.

The reference's only cross-time alignment is the J4 lookback
(`AA-AR.py:163-174`); these are the general forms a training-data /
analytics pipeline needs and that Spark has no native operator for.
Both are built Spark-first:

- **As-of join** (`asof_join_attribution`): the naive form is a
  per-row "latest earlier row" correlated subquery — quadratic and
  unshippable. The scale form used here is the union-merge idiom: tag
  both sides, union them into one relation, and run ONE analytic window
  (`last(..., ignorenulls)` over rows-unbounded-preceding) partitioned
  by the join key and ordered by event time. Cost = one shuffle on the
  key + a per-partition sort — the same plan shape at 100 TB, with no
  pair blow-up ever materialized. DuckDB's native `ASOF LEFT JOIN` is
  the oracle, pinning the exact match semantics (latest view with
  view.ts <= click.ts; ties resolved toward the view by the secondary
  `side` sort key).

- **Trailing range join** (`range_join_event_context`): interval
  predicate `[t-5min, t)` anchored on an equi key. With an equi key the
  right plan is the plain equi-join (the shuffle moves each key's rows
  once) with the range as a post-join filter — Catalyst keeps the range
  out of the shuffle key automatically. For the keyless variant at
  scale, bucket time into interval-width epochs, equi-join on the
  bucket (each probe row lands in exactly 2 buckets), then apply the
  precise range filter; that form is documented here and exercised by
  the equi-keyed query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    tiebreak: str | None = None,
) -> DataFrame:
    """Generic left as-of join: for each `left` row, attach the columns
    of the latest `right` row with right.ts <= left.ts and equal `on`
    key. Union-merge idiom — one shuffle on `on`, no pair explosion.

    `right_cols` are the right-side columns to carry (renamed
    `r_<name>`); all left columns pass through unchanged.

    `tiebreak` names a right-side column that breaks ties when several
    right rows share (key, ts): the GREATEST tiebreak value wins. Without
    it the winner is partition-order-dependent — a nondeterministic hash
    under retries/AQE — so pass one whenever (key, ts) isn't unique."""
    carried = [f"r_{c}" for c in right_cols]
    tie_t = right.schema[tiebreak].dataType if tiebreak else "int"
    lhs = left.select(
        on,
        ts,
        F.lit(1).alias("_side"),
        F.lit(None).cast(tie_t).alias("_tie"),
        F.struct(*[c for c in left.columns if c not in (on, ts)]).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(rc) for c, rc in zip(right_cols, carried)],
    )
    rhs = right.select(
        on,
        ts,
        F.lit(0).alias("_side"),
        (F.col(tiebreak) if tiebreak else F.lit(None)).cast(tie_t).alias("_tie"),
        F.lit(None).cast(lhs.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(rc) for c, rc in zip(right_cols, carried)],
    )
    # side 0 (right) sorts before side 1 (left) at equal ts, so a
    # same-timestamp right row is visible to the left row — matching
    # ASOF's `l.ts >= r.ts` inclusive bound. Among right rows at equal
    # ts, ascending _tie puts the greatest tiebreak nearest the left row,
    # so last(ignorenulls) picks it deterministically.
    w = (
        Window.partitionBy(on)
        .orderBy(ts, "_side", F.col("_tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = lhs.unionByName(rhs)
    for rc in carried:
        out = out.withColumn(rc, F.last(rc, ignorenulls=True).over(w))
    return (
        out.filter(F.col("_side") == 1)
        .select(on, ts, "_l.*", *carried)
    )


@query(
    "asof_join_attribution",
    oracle="""
    SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
           v.event_id AS view_id, v.ts AS view_ts,
           epoch_us(c.ts) - epoch_us(v.ts) AS wait_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                         ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'view') WHERE rn = 1
    ) v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    ORDER BY click_id
    """,
)
def q_asof_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click attributed to the latest prior-or-same-time
    view by the same user (left join — unattributed clicks kept with
    nulls). Gap reported in exact integer microseconds so the value-hash
    needs no float tolerance."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join(
        clicks, views, on="user_id", right_cols=("event_id", "ts"),
        tiebreak="event_id",
    )
    return joined.select(
        "click_id",
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("r_event_id").alias("view_id"),
        F.col("r_ts").alias("view_ts"),
        (F.unix_micros("ts") - F.unix_micros("r_ts")).alias("wait_us"),
    ).orderBy("click_id")


@query(
    "asof_join_within",
    oracle="""
    SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
           CASE WHEN v.ts >= c.ts - INTERVAL 30 MINUTE THEN v.event_id END AS view_id,
           CASE WHEN v.ts >= c.ts - INTERVAL 30 MINUTE THEN v.ts END AS view_ts,
           CASE WHEN v.ts >= c.ts - INTERVAL 30 MINUTE
                THEN epoch_us(c.ts) - epoch_us(v.ts) END AS wait_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                         ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'view') WHERE rn = 1
    ) v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    ORDER BY click_id
    """,
)
def q_asof_join_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join: attribute a click only to a view at
    most 30 minutes old. Because the as-of match is the LATEST prior row,
    it is also the NEAREST prior row — so the tolerance is an exact
    post-filter on the unbounded match (no second window pass), and the
    plan is identical to `asof_join_attribution`: one key shuffle."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    j = asof_join(
        clicks, views, on="user_id", right_cols=("event_id", "ts"),
        tiebreak="event_id",
    )
    ok = F.col("r_ts") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES")
    return j.select(
        "click_id",
        "user_id",
        F.col("ts").alias("click_ts"),
        F.when(ok, F.col("r_event_id")).alias("view_id"),
        F.when(ok, F.col("r_ts")).alias("view_ts"),
        F.when(ok, F.unix_micros("ts") - F.unix_micros("r_ts")).alias("wait_us"),
    ).orderBy("click_id")


@query(
    "asof_join_nearest",
    oracle="""
    WITH v AS (
        SELECT user_id, event_id, epoch_us(ts) AS us FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                         ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'view') WHERE rn = 1
    ),
    c AS (SELECT user_id, event_id, epoch_us(ts) AS us
          FROM events WHERE event_type = 'click'),
    u AS (
        SELECT user_id, us, 1 AS side, event_id AS click_id,
               NULL::BIGINT AS r_id, NULL::BIGINT AS r_us FROM c
        UNION ALL
        SELECT user_id, us, 0 AS side, NULL, event_id, us FROM v
    ),
    m AS (
        SELECT *,
               last_value(r_id IGNORE NULLS) OVER wprev AS prior_id,
               last_value(r_us IGNORE NULLS) OVER wprev AS prior_us,
               first_value(r_id IGNORE NULLS) OVER wnext AS next_id,
               first_value(r_us IGNORE NULLS) OVER wnext AS next_us
        FROM u
        WINDOW wprev AS (PARTITION BY user_id ORDER BY us, side
                         ROWS UNBOUNDED PRECEDING),
               wnext AS (PARTITION BY user_id ORDER BY us, side
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    picked AS (
        SELECT click_id, user_id, us,
               CASE WHEN prior_id IS NOT NULL AND
                         (next_id IS NULL OR us - prior_us <= next_us - us)
                    THEN prior_id ELSE next_id END AS view_id,
               CASE WHEN prior_id IS NOT NULL AND
                         (next_id IS NULL OR us - prior_us <= next_us - us)
                    THEN prior_us ELSE next_us END AS view_us
        FROM m WHERE side = 1
    )
    SELECT click_id, user_id, make_timestamp(us) AS click_ts,
           view_id, make_timestamp(view_us) AS view_ts,
           us - view_us AS gap_us
    FROM picked ORDER BY click_id
    """,
)
def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest (bidirectional) as-of join: each click attributed to the
    view by the same user with the smallest |Δt| — before OR after the
    click; equal distances resolve toward the PRIOR view, same-timestamp
    view duplicates resolve to the greatest event_id (pre-dedup). Same
    union-merge shape as the backward variant — two analytic windows over
    ONE key shuffle, no join operator, no pair blow-up; the signed gap is
    exact integer microseconds (negative = view after click)."""
    ev = load_table(spark, sf_dir, "events")
    wv = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    views = (
        ev.filter(F.col("event_type") == "view")
        .withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            F.lit(0).alias("side"),
            F.lit(None).cast("long").alias("click_id"),
            F.col("event_id").alias("r_id"),
            F.unix_micros("ts").alias("r_us"),
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.lit(1).alias("side"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("r_id"),
        F.lit(None).cast("long").alias("r_us"),
    )
    base = Window.partitionBy("user_id").orderBy("us", "side")
    wprev = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wnext = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    m = (
        clicks.unionByName(views)
        .withColumn("prior_id", F.last("r_id", ignorenulls=True).over(wprev))
        .withColumn("prior_us", F.last("r_us", ignorenulls=True).over(wprev))
        .withColumn("next_id", F.first("r_id", ignorenulls=True).over(wnext))
        .withColumn("next_us", F.first("r_us", ignorenulls=True).over(wnext))
        .filter(F.col("side") == 1)
    )
    take_prior = F.col("prior_id").isNotNull() & (
        F.col("next_id").isNull()
        | (F.col("us") - F.col("prior_us") <= F.col("next_us") - F.col("us"))
    )
    return m.select(
        "click_id",
        "user_id",
        F.timestamp_micros("us").alias("click_ts"),
        F.when(take_prior, F.col("prior_id")).otherwise(F.col("next_id")).alias("view_id"),
        F.timestamp_micros(
            F.when(take_prior, F.col("prior_us")).otherwise(F.col("next_us"))
        ).alias("view_ts"),
        (
            F.col("us")
            - F.when(take_prior, F.col("prior_us")).otherwise(F.col("next_us"))
        ).alias("gap_us"),
    ).orderBy("click_id")


@query(
    "range_join_event_context",
    oracle="""
    SELECT e.event_id AS error_id, e.user_id, e.ts AS error_ts,
           COUNT(a.event_id) AS n_context,
           COALESCE(ROUND(SUM(a.value), 2), 0.0) AS ctx_value
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN events a
      ON a.user_id = e.user_id
     AND a.ts >= e.ts - INTERVAL 5 MINUTE
     AND a.ts < e.ts
    GROUP BY e.event_id, e.user_id, e.ts
    ORDER BY error_id
    """,
)
def q_range_join_event_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing range join: per error event, count and 2dp-rounded value
    sum of same-user events in the half-open window [ts−5min, ts).
    Zero-fill via coalesce (A7 discipline); sum rounded at the data's
    native 2dp so the hash is summation-order-proof."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").alias("e")
    ctx = ev.alias("a")
    return (
        errors.join(
            ctx,
            (F.col("a.user_id") == F.col("e.user_id"))
            & (F.col("a.ts") >= F.col("e.ts") - F.expr("INTERVAL 5 MINUTES"))
            & (F.col("a.ts") < F.col("e.ts")),
            "left",
        )
        .groupBy(
            F.col("e.event_id").alias("error_id"),
            F.col("e.user_id").alias("user_id"),
            F.col("e.ts").alias("error_ts"),
        )
        .agg(
            F.count(F.col("a.event_id")).alias("n_context"),
            F.coalesce(F.round(F.sum(F.col("a.value")), 2), F.lit(0.0)).alias(
                "ctx_value"
            ),
        )
        .orderBy("error_id")
    )
