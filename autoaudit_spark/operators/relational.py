"""Relational core — projections/filters (P1–P9), aggregations (A1–A12),
sorts/top-k (O1–O3), set ops (U1–U3), scalar functions (F1–F8) from
SURVEY.md §2, each as an oracle-checked query over the driver testdata.

Everything here is pure DataFrame API (JVM-side, whole-stage codegen) —
no UDFs. Catalyst owns predicate pushdown, column pruning, and join
strategy; `.explain` on any of these shows PushedFilters reaching the
parquet scan.

Exact-semantics notes (the traps SURVEY §5.2 lists):
- population variance `var_pop`, NOT `variance`/`var_samp` (`AA-AR.py:33`
  uses NumPy default ddof=0);
- exact interpolated `median` (both Spark ≥3.4 and DuckDB interpolate);
- zero-fill of empty groups via full-outer join + `coalesce(..., 0)`
  (`AA-AR.py:32-35`), not null propagation;
- half-open time intervals `[s, s+w)` (`AA-AR.py:70`);
- `floor`/`ceil` cast to BIGINT on both sides (Spark returns LONG,
  DuckDB DOUBLE — the value hash is type-sensitive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources import EDGES_SQL, edges, load_table

_E = f"WITH edges AS ({EDGES_SQL})"


# ---------------------------------------------------------------------------
# P1–P5: projection + predicate stack (pushdown-friendly single scan)
# ---------------------------------------------------------------------------
@query(
    "filter_project",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE event_type IN ('purchase', 'click')
      AND ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-22'
      AND value IS NOT NULL AND value > 50.0
    ORDER BY event_id
    """,
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 projection + P2 equality → IN (P4) + P3 half-open time range +
    P5 null-drop, one scan; all predicates push to the parquet reader
    (reference: `AA-AR.py:40,44-45,70`, `smurf_generator.py:45-46`)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .filter((F.col("ts") >= F.lit("2024-01-08")) & (F.col("ts") < F.lit("2024-01-22")))
        .filter(F.col("value").isNotNull() & (F.col("value") > 50.0))
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# A1/A2: distinct vs multi degree (the in/out-degree feature pair)
# ---------------------------------------------------------------------------
@query(
    "degree_counts",
    oracle=f"""
    {_E}
    SELECT dst AS account,
           COUNT(DISTINCT src) AS uniq_in_deg,
           COUNT(*) AS multi_in_deg
    FROM edges GROUP BY dst ORDER BY account
    """,
)
def q_degree_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 countDistinct + A2 count — unique vs multi in-degree
    (`AA-AR.py:47-50`); multigraph semantics: parallel edges counted."""
    return (
        edges(spark, sf_dir)
        .groupBy(F.col("dst").alias("account"))
        .agg(
            F.countDistinct("src").alias("uniq_in_deg"),
            F.count("*").alias("multi_in_deg"),
        )
        .orderBy("account")
    )


# ---------------------------------------------------------------------------
# A3–A6, A10: the weight-statistics block (sum/mean/median/var_pop, min/max)
# ---------------------------------------------------------------------------
@query(
    "weight_stats",
    oracle=f"""
    {_E}
    SELECT src AS account,
           ROUND(SUM(weight), 2) AS tot_out_w,
           ROUND(SUM(weight), 2) / COUNT(*) AS mean_out_w,
           ROUND(MEDIAN(weight), 4) AS med_out_w,
           (ROUND(SUM(weight * weight), 4)
            - ROUND(SUM(weight), 2) * ROUND(SUM(weight), 2) / COUNT(*)) / COUNT(*) AS var_out_w,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts
    FROM edges GROUP BY src ORDER BY account
    """,
)
def q_weight_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 sum, A4 mean, A5 exact median, A6 POPULATION variance
    (`AA-AR.py:31-35` — np.var ddof=0), A10 min/max (`AA-AR.py:103-104`).

    Double aggregates are rounded to 4 decimals on BOTH sides: Spark and
    DuckDB reduce floats in different orders, so the last ulp differs and
    an exact value-hash would flake. 4 decimals >> the 1e-8 summation
    noise, << the data's signal."""
    return (
        edges(spark, sf_dir)
        .groupBy(F.col("src").alias("account"))
        .agg(
            F.round(F.sum("weight"), 2).alias("tot_out_w"),
            (F.round(F.sum("weight"), 2) / F.count("*")).alias("mean_out_w"),
            F.round(F.median("weight"), 4).alias("med_out_w"),
            (
                (
                    F.round(F.sum(F.col("weight") * F.col("weight")), 4)
                    - F.round(F.sum("weight"), 2) * F.round(F.sum("weight"), 2) / F.count("*")
                )
                / F.count("*")
            ).alias("var_out_w"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("account")
    )


# ---------------------------------------------------------------------------
# A7: zero-fill via full outer join + coalesce (the empty-group contract)
# ---------------------------------------------------------------------------
@query(
    "inout_zero_fill",
    oracle=f"""
    {_E},
    outs AS (SELECT src AS account, SUM(weight) AS tot_out_w, COUNT(*) AS out_deg
             FROM edges GROUP BY src),
    ins AS (SELECT dst AS account, SUM(weight) AS tot_in_w, COUNT(*) AS in_deg
            FROM edges GROUP BY dst)
    SELECT COALESCE(o.account, i.account) AS account,
           ROUND(COALESCE(o.tot_out_w, 0.0), 4) AS tot_out_w,
           COALESCE(o.out_deg, 0) AS out_deg,
           ROUND(COALESCE(i.tot_in_w, 0.0), 4) AS tot_in_w,
           COALESCE(i.in_deg, 0) AS in_deg
    FROM outs o FULL OUTER JOIN ins i ON o.account = i.account
    ORDER BY account
    """,
)
def q_inout_zero_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: accounts missing one side get 0, not null (`AA-AR.py:32-35`).
    Full outer join of the two grouped passes + coalesce — this is the
    skeleton of the 12-feature block (A9, operators/features.py)."""
    e = edges(spark, sf_dir)
    outs = e.groupBy(F.col("src").alias("account")).agg(
        F.sum("weight").alias("tot_out_w"), F.count("*").alias("out_deg")
    )
    ins = e.groupBy(F.col("dst").alias("account")).agg(
        F.sum("weight").alias("tot_in_w"), F.count("*").alias("in_deg")
    )
    return (
        outs.join(ins, "account", "full_outer")
        .select(
            "account",
            F.round(F.coalesce("tot_out_w", F.lit(0.0)), 4).alias("tot_out_w"),
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.round(F.coalesce("tot_in_w", F.lit(0.0)), 4).alias("tot_in_w"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
        .orderBy("account")
    )


# ---------------------------------------------------------------------------
# TPC-H Q1-shaped pricing summary (A2/A3/A4 at bench scale; headline query)
# ---------------------------------------------------------------------------
@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))
                    * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: one scan, map-side partial agg, tiny shuffle —
    the canonical Catalyst-friendly aggregate (bench headline).

    Money arithmetic is DECIMAL end-to-end: the 2-decimal source data
    round-trips exactly through double→DECIMAL(12,2) (a 2dp decimal is
    the nearest double to itself, so the cast is tie-free in both
    engines), decimal products/sums are exact and order-independent, and
    only the finished aggregate returns to double. Rounding a double SUM
    instead is NOT enough: at 1e8 magnitude reduction-order ulps exceed a
    4-decimal ROUND (measured 4e-4 drift vs DuckDB), and casting a double
    PRODUCT per row hits engine-specific tie-rounding (measured 4e-3)."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(12,2)")
    one = F.lit(1).cast("decimal(12,2)")
    disc_price = dec("l_extendedprice") * (one - dec("l_discount"))
    charge = disc_price * (one + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Star join: fact ⋈ broadcast dims (Catalyst broadcast at every scale)
# ---------------------------------------------------------------------------
@query(
    "revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region,
           ROUND(SUM(o.o_totalprice), 4) AS revenue,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    ORDER BY revenue DESC, nation
    """,
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join, then grouped aggregate. The CONSTANT-sized dims
    (nation 25 rows, region 5) carry explicit broadcast hints; customer
    GROWS with the data, so its strategy is left to the optimizer —
    size stats auto-broadcast it while it fits the threshold and
    shuffle-join it beyond (a forced hint OOMs executors at 100 TB,
    the r4-verdict k_core lesson applied to the dim tier)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"), F.count("*").alias("n_orders"))
        .orderBy(F.col("revenue").desc(), "nation")
    )


# ---------------------------------------------------------------------------
# J3/P8/U3: anti-join (membership exclusion)
# ---------------------------------------------------------------------------
#: High-value-subgraph threshold for q_sink_accounts. On the FULL graph
#: the anti-join is vacuous at every driver SF (the mod-150 derived id
#: space gives every account an out-edge — the r15 verdict's nit), so
#: the query restricts to edges above this weight: measured sink counts
#: 1 / 18 / 105 at sf0.001 / sf0.01 / sf0.1, nonzero at ALL driver SFs.
SINK_WEIGHT_MIN = 300.0


@query(
    "sink_accounts",
    oracle=f"""
    {_E}
    SELECT DISTINCT dst AS account FROM edges
    WHERE weight > {SINK_WEIGHT_MIN}
      AND dst NOT IN (SELECT src FROM edges WHERE weight > {SINK_WEIGHT_MIN})
    ORDER BY account
    """,
)
def q_sink_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/U3: left_anti join — accounts that only ever receive within the
    high-value subgraph (weight > SINK_WEIGHT_MIN): they take large
    transfers in but never send one (`AA-Smurf.py:117-122` membership
    exclusion, `:58,164` residual set). The weight filter pushes to the
    parquet scan on BOTH branches; the anti-join stays a pure equi
    LeftAnti (no NOT-IN null trap — `events` carries no NULL ids, and
    left_anti is null-safe regardless)."""
    e = edges(spark, sf_dir).filter(F.col("weight") > SINK_WEIGHT_MIN)
    dsts = e.select(F.col("dst").alias("account")).distinct()
    srcs = e.select(F.col("src").alias("account")).distinct()
    return dsts.join(srcs, "account", "left_anti").orderBy("account")


# ---------------------------------------------------------------------------
# U1: union + dedup
# ---------------------------------------------------------------------------
@query(
    "union_dedup",
    oracle=f"""
    {_E}
    SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM edges WHERE weight > 100.0
        UNION ALL
        SELECT dst AS src, src AS dst FROM edges WHERE weight <= 10.0
    ) ORDER BY src, dst
    """,
)
def q_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: merge two edge sets, duplicates collapse
    (`smurf_generator.py:50-60` set-union semantics)."""
    e = edges(spark, sf_dir)
    a = e.filter(F.col("weight") > 100.0).select("src", "dst")
    b = e.filter(F.col("weight") <= 10.0).select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return a.union(b).distinct().orderBy("src", "dst")


# ---------------------------------------------------------------------------
# O1–O3: sort / argmax / top-k per group
# ---------------------------------------------------------------------------
@query(
    "topk_per_group",
    oracle=f"""
    {_E},
    totals AS (
        SELECT src, dst, ROUND(SUM(weight), 4) AS tot_w FROM edges GROUP BY src, dst
    ),
    ranked AS (
        SELECT src, dst, tot_w,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY tot_w DESC, dst) AS rk
        FROM totals
    )
    SELECT src, dst, tot_w, rk FROM ranked WHERE rk <= 3 ORDER BY src, rk
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/W3: top-k per partition via row_number (`AA-AR.py:258-260`).
    Deterministic tie-break on dst so the oracle hash-matches."""
    totals = (
        edges(spark, sf_dir)
        .groupBy("src", "dst")
        .agg(F.round(F.sum("weight"), 4).alias("tot_w"))
    )
    w = Window.partitionBy("src").orderBy(F.col("tot_w").desc(), F.col("dst"))
    return (
        totals.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .orderBy("src", "rk")
    )


@query(
    "global_argmax",
    oracle=f"""
    {_E},
    totals AS (SELECT dst, ROUND(SUM(weight), 4) AS tot_w FROM edges GROUP BY dst)
    SELECT dst, tot_w FROM totals ORDER BY tot_w DESC, dst LIMIT 1
    """,
)
def q_global_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: global argmax as orderBy-desc-limit-1 (`AA-Smurf.py:153`,
    `AA-AR.py:241,252`); tie-broken for determinism."""
    return (
        edges(spark, sf_dir)
        .groupBy("dst")
        .agg(F.round(F.sum("weight"), 4).alias("tot_w"))
        .orderBy(F.col("tot_w").desc(), "dst")
        .limit(1)
    )


# ---------------------------------------------------------------------------
# P6 + O1: HAVING threshold + sort desc (candidate pruning shape)
# ---------------------------------------------------------------------------
@query(
    "heavy_pairs",
    oracle=f"""
    {_E}
    SELECT src, dst, COUNT(*) AS n_tx
    FROM edges GROUP BY src, dst HAVING COUNT(*) >= 3
    ORDER BY n_tx DESC, src, dst
    """,
)
def q_heavy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 threshold-on-aggregate + O1 desc sort (`AA-Smurf.py:107-110`)."""
    return (
        edges(spark, sf_dir)
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_tx"))
        .filter(F.col("n_tx") >= 3)
        .orderBy(F.col("n_tx").desc(), "src", "dst")
    )


# ---------------------------------------------------------------------------
# F1–F5, F7, F8: scalar math stack (pure column expressions, codegen'd)
# ---------------------------------------------------------------------------
@query(
    "scalar_math",
    oracle="""
    SELECT event_id,
           CAST(CEIL(LOG2(value + 1)) AS BIGINT) AS ceil_log2,
           ROUND(2 * LOG2(value + 1) + 1, 8) AS log_star,
           ROUND(LOG10(value + 1), 8) AS log10_v,
           ROUND(LN(value + 1), 8) AS ln_v,
           ROUND(EXP(LN(value + 1)) - 1, 8) AS roundtrip,
           CAST(FLOOR(LOG2(value + 1)) AS BIGINT) AS log_bin,
           ROUND(POW(2, CAST(FLOOR(LOG2(value + 1)) AS BIGINT)), 8) AS bin_lo,
           CAST(TRUNC(value) AS BIGINT) AS value_int
    FROM events WHERE value > 0 ORDER BY event_id
    """,
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 log2 + universal code length log_star(x)=2·log2(x)+1
    (`AA-Smurf.py:16-26`), F2 ceil, F3 log10(x+1) (`AA-AR.py:81-82`),
    F4 ln/exp (`AA-AR.py:188-212`), F5 power-of-2 bins (`AA-AR.py:182`),
    F7 int cast. All JVM column expressions — zero UDFs."""
    ev = load_table(spark, sf_dir, "events")
    v1 = F.col("value") + 1
    log_bin = F.floor(F.log2(v1)).cast("long")
    return (
        ev.filter(F.col("value") > 0)
        .select(
            "event_id",
            F.ceil(F.log2(v1)).cast("long").alias("ceil_log2"),
            F.round(2 * F.log2(v1) + 1, 8).alias("log_star"),
            F.round(F.log10(v1), 8).alias("log10_v"),
            F.round(F.log(v1), 8).alias("ln_v"),
            F.round(F.exp(F.log(v1)) - 1, 8).alias("roundtrip"),
            log_bin.alias("log_bin"),
            F.round(F.pow(F.lit(2), log_bin), 8).alias("bin_lo"),
            F.col("value").cast("long").alias("value_int"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# A12 + F5: grouped mean by log2 bin (power-law plot substrate)
# ---------------------------------------------------------------------------
@query(
    "log_bin_means",
    oracle=f"""
    {_E},
    totals AS (SELECT src, SUM(weight) AS x, COUNT(*) AS y FROM edges GROUP BY src)
    SELECT CAST(FLOOR(LOG2(x + 1)) AS BIGINT) AS bin,
           CAST(SUM(y) AS DOUBLE) / COUNT(*) AS mean_y, COUNT(*) AS n
    FROM totals GROUP BY 1 ORDER BY bin
    """,
)
def q_log_bin_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: power-law binning — mean of y per power-of-2 bin of x
    (`AA-AR.py:182-186`, +1 shift at `:179`)."""
    totals = (
        edges(spark, sf_dir)
        .groupBy("src")
        .agg(F.sum("weight").alias("x"), F.count("*").alias("y"))
    )
    return (
        totals.groupBy(F.floor(F.log2(F.col("x") + 1)).cast("long").alias("bin"))
        .agg((F.sum("y").cast("double") / F.count("*")).alias("mean_y"), F.count("*").alias("n"))
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# F6: conditional direction mapping (when/otherwise)
# ---------------------------------------------------------------------------
@query(
    "direction_mapped_edges",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'purchase' THEN CAST(event_id % 150 AS BIGINT)
                ELSE user_id END AS src,
           CASE WHEN event_type = 'purchase' THEN user_id
                ELSE CAST(event_id % 150 AS BIGINT) END AS dst,
           value AS weight
    FROM events WHERE event_type IN ('purchase', 'click', 'view')
    ORDER BY event_id
    """,
)
def q_direction_mapped_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: operation-code dispatch flips edge direction
    (`smurf_generator.py:52-55` 'PREVOD Z UCTU' → reversed edge);
    event_type='purchase' plays the reversed-direction code."""
    ev = load_table(spark, sf_dir, "events")
    counterparty = (F.col("event_id") % 150).cast("long")
    is_rev = F.col("event_type") == "purchase"
    return (
        ev.filter(F.col("event_type").isin("purchase", "click", "view"))
        .select(
            "event_id",
            F.when(is_rev, counterparty).otherwise(F.col("user_id")).alias("src"),
            F.when(is_rev, F.col("user_id")).otherwise(counterparty).alias("dst"),
            F.col("value").alias("weight"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# JSON + date scalar surface (X8; reference has none — engine capability)
# ---------------------------------------------------------------------------
@query(
    "json_props_extract",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT) AS k,
           CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour
    FROM events ORDER BY event_id
    """,
)
def q_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8: JSON property access + date functions on the events stream
    (engine capability beyond the reference, SURVEY §2.7)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.hour("ts").cast("long").alias("hour"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# P9: seeded Bernoulli sample — rows-only (Spark and DuckDB RNGs differ)
# ---------------------------------------------------------------------------
@query("bernoulli_sample")
def q_bernoulli_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: seeded random filter (`AA-AR.py:131-134`, `smurf_generator.py:59`).
    `F.rand(seed)` is per-partition deterministic — partitioning is fixed
    by the parquet layout, so the sample is reproducible across runs; no
    SQL oracle because DuckDB's RNG stream differs (driver rows-only check)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.rand(seed=42) > 0.5).select("event_id", "user_id", "value")


# ---------------------------------------------------------------------------
# Grouping sets (engine capability: rollup — not in reference)
# ---------------------------------------------------------------------------
@query(
    "rollup_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           ROUND(SUM(o_totalprice), 4) AS revenue, COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup/grouping-sets capability (SURVEY §2.4 'not present' list —
    provided as engine surface)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"), F.count("*").alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# X9: approximate aggregates — the 100 TB posture for A1/A5
# ---------------------------------------------------------------------------
@query("approx_distinct_stats")
def q_approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9: `approx_count_distinct` (HyperLogLog++) and `percentile_approx`
    (KLL-style quantile sketch) as the documented scale alternates to the
    exact A1/A5 — at 100 TB an exact distinct is a full shuffle of the key
    universe; the sketches are fixed-size mergeable state. Rows-only:
    sketch estimates are engine-specific by construction (exactness is
    pinned by the A1/A5 oracle twins; here the unit test pins the
    tolerance vs the exact values)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.percentile_approx("value", 0.5, 10000).alias("approx_median_value"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Date/time function surface (SURVEY §2.7 — none in the reference, which
# treats timestamps as opaque ints; surfaced here because the engine's
# `ts` is a real timestamp)
# ---------------------------------------------------------------------------
@query(
    "date_functions",
    oracle="""
    SELECT event_id,
           CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk,
           CAST(year(ts) AS INT) AS y,
           CAST(month(ts) AS INT) AS m,
           CAST(dayofweek(ts) + 1 AS INT) AS dow,
           CAST(hour(ts) AS INT) AS h,
           CAST(datediff('day', DATE '2024-01-01', ts::DATE) AS INT) AS days_since
    FROM events
    WHERE event_id < 1000
    ORDER BY event_id
    """,
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date function surface: truncation, calendar parts, day arithmetic.
    Cross-engine traps pinned here: Spark weeks and DuckDB weeks both
    start Monday; Spark `dayofweek` is 1-based Sunday=1 vs DuckDB's
    0-based Sunday=0 (oracle shifts); both `datediff`s count calendar-day
    boundaries."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_id") < 1000)
        .select(
            "event_id",
            F.date_trunc("week", "ts").alias("wk"),
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.dayofweek("ts").alias("dow"),
            F.hour("ts").alias("h"),
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias("days_since"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# INTERSECT / EXCEPT (SURVEY §2.6 'not present' list — engine surface)
# ---------------------------------------------------------------------------
@query(
    "intersect_except_users",
    oracle="""
    WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    both_u AS (SELECT user_id FROM clickers INTERSECT SELECT user_id FROM buyers),
    only_click AS (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM buyers)
    SELECT user_id, 'both' AS segment FROM both_u
    UNION ALL
    SELECT user_id, 'click_only' AS segment FROM only_click
    ORDER BY segment, user_id
    """,
)
def q_intersect_except_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op surface: `intersect` and `exceptAll`-style difference on the
    distinct user universes (semantics = SQL INTERSECT/EXCEPT DISTINCT)."""
    ev = load_table(spark, sf_dir, "events")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    both_u = clickers.intersect(buyers).withColumn("segment", F.lit("both"))
    only_click = clickers.exceptAll(buyers).withColumn("segment", F.lit("click_only"))
    return both_u.unionAll(only_click).select("user_id", "segment").orderBy("segment", "user_id")


# ---------------------------------------------------------------------------
# CUBE (grouping-sets surface beyond rollup)
# ---------------------------------------------------------------------------
@query(
    "cube_events",
    oracle="""
    SELECT event_type, CAST(year(ts) AS INT) AS y,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS tot
    FROM events
    GROUP BY CUBE (event_type, year(ts))
    ORDER BY event_type NULLS FIRST, y NULLS FIRST
    """,
)
def q_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over (event_type, year)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.cube("event_type", F.year("ts").alias("y"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("tot"))
        .orderBy(F.col("event_type").asc_nulls_first(), F.col("y").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# Skew-proof salted aggregation (SURVEY §4: "skewed keys → salting or AQE
# skew-join" — the explicit form, with results provably identical to the
# direct groupBy via the oracle)
# ---------------------------------------------------------------------------
SALT_BUCKETS = 8


@query(
    "salted_user_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS tot_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def q_salted_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation: phase 1 groups on (key, salt) so a
    hot key's rows spread over SALT_BUCKETS reducers; phase 2 merges the
    partial states. Output is bit-identical to the direct groupBy (the
    oracle IS the direct form) — sums stay unrounded until the final
    merge. This is the hand-rolled fallback for skew beyond what AQE's
    skew-join splitting handles; count/sum/min/max are algebraic, so the
    merge is exact."""
    ev = load_table(spark, sf_dir, "events")
    phase1 = (
        ev.withColumn("salt", F.pmod(F.hash("event_id"), F.lit(SALT_BUCKETS)))
        .groupBy("user_id", "salt")
        .agg(F.count("*").alias("pn"), F.sum("value").alias("pv"))
    )
    return (
        phase1.groupBy("user_id")
        .agg(
            F.sum("pn").alias("n_events"),
            F.round(F.sum("pv"), 2).alias("tot_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Multi-way star join (TPC-H Q9-lite): fact ⋈ three broadcast dimensions
# ---------------------------------------------------------------------------
@query(
    "profit_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(l.l_shipdate) AS INT) AS yr,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS gross_value,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_size >= 10
    GROUP BY n.n_name, year(l.l_shipdate)
    ORDER BY nation, yr
    """,
)
def q_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join: the lineitem fact streams once past the
    dimensions (part filtered before the join so the pushdown prunes
    fact rows early via Catalyst's join-filter inference); one shuffle
    total, for the final aggregate. part/supplier GROW with the data so
    their join strategy is left to the optimizer (auto-broadcast from
    size stats while small, shuffle beyond); only constant-sized nation
    keeps the explicit hint."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 10)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("yr"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("gross_value"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("nation", "yr")
    )


# ---------------------------------------------------------------------------
# Exact order-statistic aggregates: PERCENTILE_DISC picks an actual data
# value (smallest value with cumulative distribution ≥ p — SQL standard),
# so unlike interpolating percentiles there is no float arithmetic to
# drift between engines. The scale path for a 100 TB table is
# approx_percentile (covered rows-only by `approx_distinct_stats`); this
# is the exact form both engines agree on bit-for-bit.
# ---------------------------------------------------------------------------
@query(
    "value_percentiles",
    oracle="""
    SELECT event_type,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50,
           percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90,
           percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles of event value per type (p50/p90/p99)."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_vp_events")
    return spark.sql(
        """
        SELECT event_type,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50,
               percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90,
               percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99,
               COUNT(*) AS n
        FROM _vp_events GROUP BY event_type ORDER BY event_type
        """
    )


# ---------------------------------------------------------------------------
# Pivot — the wide-table reshape (long event stream → one row per user
# with a column per event type). Spark's pivot with EXPLICIT values: at
# scale the implicit form pays an extra distinct scan to discover the
# column set, so a production pipeline always pins it.
# ---------------------------------------------------------------------------
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "pivot_event_matrix",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def q_pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot with pinned columns, one shuffle (pivot compiles
    to conditional aggregates — same plan as the oracle's FILTER form);
    empty cells zero-filled to match COUNT FILTER semantics."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Analytic-function suite — the ranking/distribution window functions a
# SQL surface must provide (row_number exists elsewhere; this pins rank,
# dense_rank, ntile, percent_rank, cume_dist, lag, lead in one relation).
# ---------------------------------------------------------------------------
@query(
    "window_function_suite",
    oracle="""
    SELECT event_id, user_id,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           LAG(event_id) OVER w AS prev_event,
           LEAD(event_id) OVER w AS next_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, rnk, event_id
    """,
)
def q_window_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full analytic-window battery over (user, ts) orderings. ONE window
    spec → one shuffle + one sort serves all seven functions (Catalyst
    collapses same-spec windows into a single Window node).
    percent_rank/cume_dist are IEEE-exact cross-engine ((rank−1)/(n−1)
    and rank/n in double)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
    ).orderBy("user_id", "rnk", "event_id")


# ---------------------------------------------------------------------------
# GROUPING SETS — the general form behind cube/rollup (both registered
# elsewhere): explicit set list + GROUPING() disambiguation of the
# aggregate NULL vs a data NULL.
# ---------------------------------------------------------------------------
_GROUPING_SETS_SQL = """
    SELECT event_type,
           CAST(user_id % 10 AS BIGINT) AS user_bucket,
           CAST(GROUPING(event_type) AS BIGINT) AS g_type,
           CAST(GROUPING(user_id % 10) AS BIGINT) AS g_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS tot_value
    FROM {src}
    GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
    ORDER BY g_type, g_bucket, event_type, user_bucket
"""


@query(
    "grouping_sets_events",
    oracle=_GROUPING_SETS_SQL.format(src="events"),
)
def q_grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL surface (identical text runs on both
    engines — the engine IS a SQL engine, not only a DataFrame API).
    One shuffle: Spark expands the sets with a single Expand node, not
    one scan per set."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_gs")
    return spark.sql(_GROUPING_SETS_SQL.format(src="events_gs"))


# ---------------------------------------------------------------------------
# X8 on the VariantType tier (Spark 4): semi-structured JSON parsed ONCE
# into the binary Variant encoding, then typed-path access — the modern
# replacement for per-access get_json_object string re-parsing.
# ---------------------------------------------------------------------------
@query(
    "variant_props_extract",
    oracle="""
    WITH k AS (
        SELECT CAST(props->>'$.k' AS INTEGER) AS k, value FROM events
    )
    SELECT CAST(FLOOR(k / 10.0) AS BIGINT) AS k_decade,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(k) AS BIGINT) AS k_min,
           CAST(MAX(k) AS BIGINT) AS k_max,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS tot_value
    FROM k GROUP BY 1 ORDER BY 1
    """,
)
def q_variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 (VariantType tier): `parse_json` → binary Variant →
    `variant_get` typed path access, aggregated by decade of the
    extracted field. Functionally a twin of `json_props_extract`, but
    the props string is parsed ONCE into Spark 4's Variant encoding and
    every subsequent access is a typed binary read — at 100 TB, N path
    accesses over get_json_object re-parse the string N times, while
    Variant parses once and shreds; this query pins that API tier.

    DECIMAL money sum per repo convention; the decade is FLOOR division
    on BOTH engines (ADVICE r5: DuckDB's integer `//` TRUNCATES toward
    zero — verified -7 // 10 = 0 on duckdb 1.0.0 — so the oracle uses
    CAST(FLOOR(k / 10.0) AS BIGINT) to match Spark's F.floor for every
    sign; a negative-k crafted test pins the boundary)."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(F.parse_json("props").alias("v"), "value")
    k = v.select(
        F.variant_get(F.col("v"), "$.k", "int").alias("k"), "value"
    )
    return (
        k.groupBy(F.floor(F.col("k") / 10).cast("long").alias("k_decade"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("tot_value"),
        )
        .orderBy("k_decade")
    )
