"""Pipeline-analytics operators over `events`: SCD latest-snapshot upsert,
deterministic hash-reservoir sampling, robust (median/MAD) anomaly scores,
Markov event-transition counts, and a portable equi-width histogram.

These extend the reference's audit surface (AutoAudit flags anomalous
accounts; a production deployment also needs dedup-by-key current-state
views, reproducible samples for labeling, and distribution summaries).
Everything is pure JVM expressions — window functions and hash/floor
arithmetic chosen to be bit-identical in ANSI SQL so every query carries a
DuckDB value-hash oracle.

Scale notes per query in the docstrings; the common posture: one shuffle
on the natural key (user_id), no Python, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

#: rows kept per group by the deterministic reservoir
SAMPLE_K = 5

#: |robust z| threshold for the MAD outlier report
ZSCORE_CUT = 2.5

#: equi-width histogram: [0, HIST_HI) in HIST_BUCKETS buckets (+ clamp)
HIST_HI = 500.0
HIST_BUCKETS = 20


@query(
    "latest_snapshot",
    oracle="""
    SELECT user_id, event_id, event_type, value, ts
    FROM (
        SELECT user_id, event_id, event_type, value, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
    WHERE rn = 1
    ORDER BY user_id
    """,
)
def q_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-1 / upsert semantics as a query: the latest row per key
    (ts desc, event_id desc tie-break — deterministic on the multiset).

    This is the batch equivalent of a CDC merge: dedup-by-key with
    latest-wins. One shuffle on user_id; at 100 TB the window is the
    right form (vs self-join on max-ts, which shuffles twice and breaks
    on ts ties)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value", "ts")
        .orderBy("user_id")
    )


@query(
    "hash_reservoir_sample",
    oracle=f"""
    SELECT user_id, event_id, event_type, value
    FROM (
        SELECT user_id, event_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
        FROM events)
    WHERE rn <= {SAMPLE_K}
    ORDER BY user_id, event_id
    """,
)
def q_hash_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group reservoir: k rows per user chosen by md5
    priority — reproducible across engines, runs, and partitionings
    (unlike `rand()` sampling), which is what a labeling/eval pipeline
    needs ("the same 5 docs per source every rerun").

    md5 (not xxhash64) because the priority must be engine-portable; the
    scale default would swap in xxhash64. One shuffle; rank-k per group
    is the same top-k-per-partition shape as `topk_per_group` — at 100 TB
    a partial per-partition top-k pre-prune bounds the shuffle."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SAMPLE_K)
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id", "event_id")
    )


@query(
    "robust_zscore",
    oracle=f"""
    WITH med AS (
        SELECT user_id, median(value) AS med
        FROM events GROUP BY user_id
    ), mad AS (
        SELECT e.user_id, m.med, median(abs(e.value - m.med)) AS mad
        FROM events e JOIN med m USING (user_id)
        GROUP BY e.user_id, m.med
    )
    SELECT e.user_id, e.event_id, e.value,
           ROUND(m.med, 6) AS med,
           ROUND(m.mad, 6) AS mad,
           ROUND((e.value - m.med) / m.mad, 6) AS z
    FROM events e JOIN mad m USING (user_id)
    WHERE m.mad > 0 AND abs((e.value - m.med) / m.mad) > {ZSCORE_CUT}
    ORDER BY e.user_id, e.event_id
    """,
)
def q_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier scores: z = (x − median) / MAD per user — the
    median/MAD pair is the standard heavy-tail-safe alternative to
    mean/stddev for audit anomaly flags (AutoAudit's domain: a few huge
    transfers shouldn't mask each other by inflating sigma).

    Two grouped exact medians (both engines interpolate identically on
    doubles) + one equi-join back on user_id. All three shuffles share
    the user_id key, so AQE/co-partitioning reuses the exchange. MAD=0
    groups (constant value) are excluded rather than divided by zero."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("user_id").agg(F.median("value").alias("med"))
    mad = (
        ev.join(med, "user_id")
        .groupBy("user_id", "med")
        .agg(F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"))
    )
    z = (F.col("value") - F.col("med")) / F.col("mad")
    return (
        ev.join(mad, "user_id")
        .filter((F.col("mad") > 0) & (F.abs(z) > ZSCORE_CUT))
        .select(
            "user_id",
            "event_id",
            "value",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            F.round(z, 6).alias("z"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS next_type
        FROM events)
    SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    ORDER BY event_type, next_type
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's event
    stream (ts, event_id ordering — total, so LEAD is deterministic).
    The classic session-behavior feature matrix: P(next | current).

    One window shuffle on user_id, then a tiny (|types|²) aggregate the
    map-side combine collapses almost entirely — scale-dominated by the
    single sort-within-user, which is the floor for any sequence op."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("event_type", "next_type")
    )


@query(
    "value_histogram",
    oracle=f"""
    SELECT LEAST(CAST(FLOOR(value / {HIST_HI / HIST_BUCKETS}) AS BIGINT),
                 {HIST_BUCKETS - 1}) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2)::DOUBLE AS sum_value
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of `value`: 20 buckets over [0, 500) with a
    clamped overflow bucket — floor arithmetic instead of width_bucket()
    because the bucket id must be engine-portable (DuckDB lacks
    width_bucket). Sum per bucket through DECIMAL(18,2) (order-independent
    money math, repo convention).

    Pure map + 20-group aggregate: map-side combine reduces each
    partition to ≤20 rows, so the shuffle is O(buckets × partitions) —
    the canonical distribution-summary shape at any scale."""
    ev = load_table(spark, sf_dir, "events")
    width = HIST_HI / HIST_BUCKETS
    bucket = F.least(
        F.floor(F.col("value") / F.lit(width)).cast("long"),
        F.lit(HIST_BUCKETS - 1),
    )
    return (
        ev.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("bucket")
    )


#: Benford expected first-digit fractions log10(1+1/d), 6dp — compiled as
#: literals into BOTH engines' plans so the deviation arithmetic is
#: bit-identical (no runtime log10).
BENFORD = {
    1: 0.301030, 2: 0.176091, 3: 0.124939, 4: 0.096910, 5: 0.079181,
    6: 0.066947, 7: 0.057992, 8: 0.051153, 9: 0.045757,
}

_BENFORD_CASE = "CAST(CASE digit " + " ".join(
    f"WHEN '{d}' THEN {p}" for d, p in BENFORD.items()
) + " END AS DOUBLE)"


@query(
    "benford_digits",
    oracle=f"""
    WITH digits AS (
        SELECT regexp_extract(CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR),
                              '([1-9])', 1) AS digit
        FROM events WHERE value > 0
    ), counts AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
        FROM digits GROUP BY digit
    )
    SELECT digit, n,
           ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS frac,
           {_BENFORD_CASE} AS benford,
           ROUND(abs(CAST(n AS DOUBLE) / SUM(n) OVER ()
                     - {_BENFORD_CASE}), 6) AS deviation
    FROM counts
    ORDER BY digit
    """,
)
def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit — THE classic
    accounting-fraud screen (fabricated amounts over-sample digits 5–9;
    AutoAudit's domain per `README.md:58-62` accounting/financial
    datasets). Digit extraction goes through DECIMAL(18,2)→string so
    both engines see identical text (no float-formatting divergence),
    then the first [1-9] via RE2∩Java-safe regex.

    Map + 9-group aggregate with map-side combine; the `SUM(n) OVER ()`
    total runs on the 9 aggregated rows, not the corpus — O(1) whatever
    the scale. Expected fractions are compiled literals, so frac and
    deviation are pure deterministic double ops."""
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.filter(F.col("value") > 0)
        .select(
            F.regexp_extract(
                F.col("value").cast("decimal(18,2)").cast("string"),
                "([1-9])",
                1,
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n"))
    )
    expected = F.element_at(
        F.create_map(
            *[x for d, p in BENFORD.items() for x in (F.lit(str(d)), F.lit(p))]
        ),
        F.col("digit"),
    )
    total = F.sum("n").over(Window.partitionBy())
    frac = F.col("n").cast("double") / total
    return counts.select(
        "digit",
        "n",
        F.round(frac, 6).alias("frac"),
        expected.alias("benford"),
        F.round(F.abs(frac - expected), 6).alias("deviation"),
    ).orderBy("digit")


#: burst flag threshold (mean + BURST_SIGMA·σ of the user's daily rate)
BURST_SIGMA = 3.0

#: minimum observed days before a user's rate distribution is trusted
BURST_MIN_DAYS = 3


@query(
    "burst_detection",
    oracle=f"""
    WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ), stats AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(cnt) AS BIGINT) AS sx,
               CAST(SUM(cnt * cnt) AS BIGINT) AS sxx
        FROM daily GROUP BY user_id
    )
    SELECT d.user_id, d.day, d.cnt,
           ROUND(CAST(s.sx AS DOUBLE) / s.n_days, 6) AS mean_daily,
           ROUND(sqrt(GREATEST((s.sxx - CAST(s.sx AS DOUBLE) * s.sx
                                / s.n_days) / s.n_days, 0.0)), 6) AS sd_daily
    FROM daily d JOIN stats s USING (user_id)
    WHERE s.n_days >= {BURST_MIN_DAYS}
      AND d.cnt > CAST(s.sx AS DOUBLE) / s.n_days
                  + {BURST_SIGMA} * sqrt(GREATEST((s.sxx
                      - CAST(s.sx AS DOUBLE) * s.sx / s.n_days)
                      / s.n_days, 0.0))
    ORDER BY d.user_id, d.day
    """,
)
def q_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transaction-burst flags: days where a user's event count exceeds
    their own mean + 3σ daily rate — the temporal-anomaly complement to
    `robust_zscore` (value axis) in the audit stack. Variance comes from
    EXACT integer sums (Σx, Σx²) with a pinned double formula, so the
    threshold — and hence the flag set — is bit-identical across engines
    (engine-native var_pop implementations differ in fp accumulation
    order). Gap days count as absent, not zero; `resample_gap_fill` is
    the zero-filled feed when that semantics is wanted.

    Two aggregations + one join, all keyed on user_id — a single
    exchange under AQE exchange reuse. Daily pre-aggregation shrinks the
    join input to users×days regardless of event volume."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
        )
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    stats = daily.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("cnt").cast("long").alias("sx"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("sxx"),
    )
    mean = F.col("sx").cast("double") / F.col("n_days")
    # GREATEST(var, 0): with exact integer moments the variance is
    # mathematically >= 0, but the double expression can round to -eps
    # when sx*sx exceeds 2^53 — DuckDB sqrt then RAISES where Spark
    # returns NaN, so the clamp is a cross-engine parity requirement
    sd = F.sqrt(
        F.greatest(
            (
                F.col("sxx")
                - F.col("sx").cast("double") * F.col("sx") / F.col("n_days")
            )
            / F.col("n_days"),
            F.lit(0.0),
        )
    )
    return (
        daily.join(stats, "user_id")
        .filter(
            (F.col("n_days") >= BURST_MIN_DAYS)
            & (F.col("cnt") > mean + F.lit(BURST_SIGMA) * sd)
        )
        .select(
            "user_id",
            "day",
            "cnt",
            F.round(mean, 6).alias("mean_daily"),
            F.round(sd, 6).alias("sd_daily"),
        )
        .orderBy("user_id", "day")
    )


@query(
    "type_entropy",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY user_id, event_type
    ), t AS (
        SELECT user_id,
               CAST(SUM(c) AS BIGINT) AS total,
               SUM(CAST(ROUND(c * log2(c), 6) AS DECIMAL(18,6))) AS sclog
        FROM c GROUP BY user_id
    )
    SELECT user_id, total,
           ROUND(log2(total) - CAST(sclog AS DOUBLE) / total, 6) AS entropy
    FROM t
    ORDER BY user_id
    """,
)
def q_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the event-type distribution — the
    behavioral-diversity feature (bots/smurf mules hammer one action →
    entropy ≈ 0; organic users spread out). Uses the identity
    H = log2(T) − Σc·log2(c)/T so only integer-argument log2 appears;
    each Σ term is 6dp-quantized to DECIMAL before summation (double
    addition is not associative — an unquantized SUM would flake with
    aggregation order), and log2 is the one libm function verified
    bit-identical across both engines (ln is NOT — last-ulp divergence).

    Two aggregations sharing the user_id key, |types| rows per user in
    between — the second agg is over a relation 5× smaller than the
    events scan."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("c")
    )
    t = c.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("total"),
        F.sum(
            F.round(F.col("c") * F.log2("c"), 6).cast("decimal(18,6)")
        ).alias("sclog"),
    )
    return t.select(
        "user_id",
        "total",
        F.round(
            F.log2("total") - F.col("sclog").cast("double") / F.col("total"), 6
        ).alias("entropy"),
    ).orderBy("user_id")


@query(
    "chisq_type_segment",
    oracle="""
    WITH o AS (
        SELECT c.c_mktsegment AS seg, e.event_type AS typ,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1, 2
    ), m AS (
        SELECT seg, typ, o,
               CAST(SUM(o) OVER (PARTITION BY seg) AS BIGINT) AS rt,
               CAST(SUM(o) OVER (PARTITION BY typ) AS BIGINT) AS ct,
               CAST(SUM(o) OVER () AS BIGINT) AS t
        FROM o
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           ROUND(CAST(SUM(CAST(ROUND(
               (o - CAST(rt AS DOUBLE) * ct / t)
               * (o - CAST(rt AS DOUBLE) * ct / t)
               / (CAST(rt AS DOUBLE) * ct / t), 6) AS DECIMAL(18,6)))
               AS DOUBLE), 6) AS chi2
    FROM m
    """,
)
def q_chisq_type_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² independence test between event type and customer market
    segment — the statistical screen behind "does behavior differ by
    segment" audit questions. Observed counts are exact integers;
    expected counts and per-cell terms run in pinned-order double, each
    cell 6dp-quantized to DECIMAL before the final sum (order-free).

    The contingency table is |segments|×|types| (25 cells) — the window
    totals and χ² fold run on the aggregated relation, so everything
    after the first groupBy is O(1) whatever the event volume. The
    customer dim is DATA-sized, so its join strategy is left to the
    optimizer (auto-broadcast from size stats while it fits, shuffle
    beyond — no forced hint, the r4-verdict k_core lesson)."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("seg")
    )
    o = (
        ev.join(cust, "user_id")
        .groupBy("seg", F.col("event_type").alias("typ"))
        .agg(F.count("*").cast("long").alias("o"))
    )
    m = o.select(
        "seg",
        "typ",
        "o",
        F.sum("o").over(Window.partitionBy("seg")).cast("long").alias("rt"),
        F.sum("o").over(Window.partitionBy("typ")).cast("long").alias("ct"),
        F.sum("o").over(Window.partitionBy()).cast("long").alias("t"),
    )
    e = F.col("rt").cast("double") * F.col("ct") / F.col("t")
    cell = F.round((F.col("o") - e) * (F.col("o") - e) / e, 6).cast(
        "decimal(18,6)"
    )
    return m.agg(
        F.count("*").cast("long").alias("n_cells"),
        F.round(F.sum(cell).cast("double"), 6).alias("chi2"),
    )


#: rolling-active window length in days (WAU-7)
ROLLING_DAYS = 7


@query(
    "rolling_active_users",
    oracle=f"""
    WITH daily AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        FROM events
    ), days AS (SELECT DISTINCT day FROM daily),
    cover AS (
        SELECT CAST(UNNEST(generate_series(day, day + INTERVAL {ROLLING_DAYS - 1} DAY,
                                           INTERVAL 1 DAY)) AS DATE) AS cday,
               user_id
        FROM daily
    )
    SELECT d.day,
           CAST((SELECT COUNT(*) FROM daily x WHERE x.day = d.day) AS BIGINT)
               AS dau,
           CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS wau
    FROM days d JOIN cover c ON c.cday = d.day
    GROUP BY d.day
    ORDER BY d.day
    """,
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-{ROLLING_DAYS}-day distinct active users per day (DAU +
    WAU) — the canonical engagement rollup. Spark-first shape: instead
    of a range join (day BETWEEN d-6 AND d → nested-loop), each (day,
    user) activity row EXPLODES to the ≤7 future grid days it covers,
    turning the range condition into an equi-join/groupBy on cday —
    hash-partitioned, scale-safe, 7× row amplification bounded by the
    window constant. Days past the observed range drop in the grid
    semi-join.

    distinct-user daily pre-aggregation first, so the explode runs on
    users×days rows, not raw events."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"), "user_id"
    ).distinct()
    days = daily.select("day").distinct()
    cover = daily.select(
        F.explode(
            F.sequence(
                F.col("day"),
                F.date_add(F.col("day"), ROLLING_DAYS - 1),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("cday"),
        "user_id",
    )
    wau = (
        cover.join(days.withColumnRenamed("day", "cday"), "cday")
        .groupBy("cday")
        .agg(F.count_distinct("user_id").cast("long").alias("wau"))
        .withColumnRenamed("cday", "day")
    )
    dau = daily.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    return (
        dau.join(wau, "day")
        .select("day", "dau", "wau")
        .orderBy("day")
    )


#: columns profiled by `profile_columns` — one per major type family
PROFILE_COLS = ("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")


@query(
    "profile_columns",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM lineitem"""
        for c in PROFILE_COLS
    )
    + " ORDER BY column_name",
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling summary — row count, null count, exact distinct
    cardinality per column (one column per type family: key, measure,
    categorical, timestamp). The first query every pipeline runs against
    a new dataset; the approximate twin at 100 TB is
    `approx_distinct_stats` (HLL), this is the exact form.

    Spark-first shape: ONE pass computes all metrics as a single
    multi-distinct aggregate (Catalyst expands the distinct columns into
    one Expand + two-level aggregate — still a single scan), then the
    1-row result UNPIVOTS via `stack` into the per-column report. The
    unpivot runs on one row; the scan is never widened or repeated per
    column (the naive per-column UNION ALL rescans the table 4×)."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for c in PROFILE_COLS:
        aggs.append(
            (F.count("*") - F.count(c)).cast("long").alias(f"null_{c}")
        )
        aggs.append(F.count_distinct(c).cast("long").alias(f"dist_{c}"))
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', null_{c}, dist_{c}" for c in PROFILE_COLS
    )
    return (
        one.selectExpr(
            "n_rows",
            f"stack({len(PROFILE_COLS)}, {stack_args}) "
            "AS (column_name, n_null, n_distinct)",
        )
        .select("column_name", "n_rows", "n_null", "n_distinct")
        .orderBy("column_name")
    )


#: minimum run length reported by `event_runs`
RUN_MIN_LEN = 3


@query(
    "event_runs",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS rn,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) AS rnt
        FROM events
    )
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS run_len,
           MIN(ts) AS start_ts, MAX(ts) AS end_ts
    FROM seq
    GROUP BY user_id, event_type, rn - rnt
    HAVING COUNT(*) >= {RUN_MIN_LEN}
    ORDER BY user_id, start_ts
    """,
)
def q_event_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands run-length encoding: maximal streaks of the SAME
    event type per user (rn − rn_per_type is constant within a streak —
    the classic islands idiom), reporting runs of ≥3. Repetitive-action
    streaks (N identical transfers in a row) are a first-order audit
    flag, and RLE is the general sequence-compression primitive.

    Both ROW_NUMBERs ride the SAME (user_id | ts, event_id) sort, so
    Catalyst collapses them into one window stage over one exchange —
    a second shuffle only for the post-group HAVING aggregate keyed by
    the island id."""
    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias("grp"),
    )
    return (
        seq.groupBy("user_id", "event_type", "grp")
        .agg(
            F.count("*").cast("long").alias("run_len"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
        )
        .filter(F.col("run_len") >= RUN_MIN_LEN)
        .select("user_id", "event_type", "run_len", "start_ts", "end_ts")
        .orderBy("user_id", "start_ts")
    )


@query(
    "dow_seasonality",
    oracle="""
    WITH d AS (
        SELECT CAST(isodow(ts) AS BIGINT) AS dow,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
                   AS tot_value
        FROM events GROUP BY 1
    )
    SELECT dow, n, tot_value,
           ROUND(CAST(n AS DOUBLE) * 7 / SUM(n) OVER (), 6) AS load_ratio
    FROM d ORDER BY dow
    """,
)
def q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile: per ISO weekday (Mon=1..Sun=7),
    event counts, DECIMAL value totals, and the load ratio vs a flat
    week (ratio 1 = uniform; transaction fraud screens key off
    off-pattern weekend spikes). The `SUM OVER ()` total runs on the
    7-row aggregate. ISO weekday bridges the engines' differing
    dayofweek conventions (Spark Sun=1 vs DuckDB Sun=0) exactly."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        (F.weekday(F.col("ts")) + 1).cast("long").alias("dow")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("tot_value"),
    )
    total = F.sum("n").over(Window.partitionBy())
    return d.select(
        "dow",
        "n",
        "tot_value",
        F.round(F.col("n").cast("double") * 7 / total, 6).alias("load_ratio"),
    ).orderBy("dow")


#: half-life of the exponential decay, in whole weeks (integer k keeps
#: 2^-k an EXACT power of two in both engines — no libm pow divergence)
DECAY_ANCHOR = "2024-12-31"


@query(
    "decayed_user_value",
    oracle=f"""
    WITH w AS (
        SELECT user_id,
               CAST(ROUND(value * pow(2.0,
                   -CAST(floor(date_diff('day', CAST(ts AS DATE),
                                DATE '{DECAY_ANCHOR}') / 7.0) AS BIGINT)), 6)
                   AS DECIMAL(18,6)) AS dv
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(dv) AS DOUBLE) AS decayed_value
    FROM w GROUP BY user_id ORDER BY user_id
    """,
)
def q_decayed_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted activity score: Σ value · 2^(−age_weeks) per
    user, anchored at a fixed as-of date — the standard
    exponential-decay feature for churn/risk models (a transfer last
    week counts double one from a fortnight ago). The exponent is an
    INTEGER week count — FLOOR(days/7) on both engines (truncating `//`
    would diverge from floor for post-anchor events), so 2^±k is an
    exact power of two in both (libm pow on fractional exponents
    diverges in the last ulp); each term is 6dp-DECIMAL quantized so the per-user sum is
    order-free. One shuffle on user_id, map-side combined."""
    ev = load_table(spark, sf_dir, "events")
    weeks = F.floor(
        F.datediff(F.lit(DECAY_ANCHOR).cast("date"), F.to_date("ts")) / 7
    ).cast("long")
    dv = F.round(
        F.col("value") * F.pow(F.lit(2.0), -weeks.cast("double")), 6
    ).cast("decimal(18,6)")
    return (
        ev.select("user_id", dv.alias("dv"))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("dv").cast("double").alias("decayed_value"),
        )
        .orderBy("user_id")
    )


@query(
    "grouped_percentiles",
    oracle="""
    SELECT event_type,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50,
           percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90,
           percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q_grouped_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type exact latency-style percentiles (PERCENTILE_DISC —
    an actual data value, no interpolation arithmetic to diverge): the
    grouped form of `value_percentiles`. At 100 TB the exact form is a
    per-group sort; `approx_distinct_stats` carries the sketch
    (t-digest-style) alternative."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").alias("p90"),
            F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").alias("p99"),
            F.count("*").cast("long").alias("n"),
        )
        .orderBy("event_type")
    )


#: reporting threshold for the structuring screen; the suspicious band
#: is [STRUCTURING_BAND_LO, STRUCTURING_THRESHOLD) — amounts kept JUST
#: under the limit (the classic CTR-avoidance pattern the reference's
#: smurf generator models as many sub-threshold transfers).
STRUCTURING_THRESHOLD = 100.0
STRUCTURING_BAND_LO = 90.0

#: minimum transactions before a user's band/round-number rate is scored
RATE_BIAS_MIN_TX = 20


def _rate_bias(
    ev: DataFrame, flag, n_flag: str, frac: str, z: str
) -> DataFrame:
    """Shared binomial rate-bias skeleton (X73/X74): per-user count of
    flagged transactions vs the corpus base rate p0, scored with the
    normal-approximation binomial z. ONE scan + one user_id shuffle:
    the per-user relation is localCheckpoint-ed and the 1-row global
    is summed FROM it (identical by additivity of counts), so the
    event stream is read once however many consumers follow; z is a pinned chain of IEEE ops on
    exact counts — (n_f - n_tx*p0) / sqrt((n_tx*p0) * (1.0-p0)) with
    the same parenthesization in the oracle, so unrounded doubles
    hash-match cross-engine. Degenerate base rates (p0 = 0 or 1 — no
    flagged transaction anywhere, or nothing BUT flagged ones) make
    the binomial variance 0: z is NULL then, guarded by the exact
    INTEGER test 0 < B < N in BOTH engines (review r7: without the
    guard Spark's ANSI mode throws DIVIDE_BY_ZERO where DuckDB
    returns NULL — a crash plus an oracle mismatch)."""
    lf = flag.cast("long")
    per = ev.groupBy("user_id").agg(
        F.count("*").alias("n_tx"), F.sum(lf).alias(n_flag)
    ).localCheckpoint()
    tot = per.agg(
        F.sum("n_tx").alias("_N"), F.sum(n_flag).alias("_B")
    )
    p0 = F.col("_B").cast("double") / F.col("_N")
    nf = F.col(n_flag).cast("double")
    zc = F.when(
        (F.col("_B") > 0) & (F.col("_B") < F.col("_N")),
        (nf - F.col("n_tx") * p0)
        / F.sqrt((F.col("n_tx") * p0) * (F.lit(1.0) - p0)),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .filter(F.col("n_tx") >= RATE_BIAS_MIN_TX)
        .select(
            "user_id",
            F.col("n_tx").cast("long").alias("n_tx"),
            F.col(n_flag).cast("long").alias(n_flag),
            (nf / F.col("n_tx")).alias(frac),
            zc.alias(z),
        )
        .orderBy(F.desc(z), "user_id")
    )


def _rate_bias_sql(flag_sql: str, n_flag: str, frac: str, z: str) -> str:
    return f"""
    WITH per AS (
        SELECT user_id, COUNT(*) AS n_tx,
               SUM(CAST(({flag_sql}) AS BIGINT)) AS nf
        FROM events GROUP BY user_id
    ),
    tot AS (
        SELECT COUNT(*) AS big_n,
               SUM(CAST(({flag_sql}) AS BIGINT)) AS big_b
        FROM events
    )
    SELECT user_id, CAST(n_tx AS BIGINT) AS n_tx,
           CAST(nf AS BIGINT) AS {n_flag},
           CAST(nf AS DOUBLE) / n_tx AS {frac},
           CASE WHEN big_b > 0 AND big_b < big_n THEN
               (CAST(nf AS DOUBLE) - n_tx * (CAST(big_b AS DOUBLE) / big_n))
                 / SQRT((n_tx * (CAST(big_b AS DOUBLE) / big_n))
                        * (1.0 - (CAST(big_b AS DOUBLE) / big_n)))
           ELSE NULL END AS {z}
    FROM per CROSS JOIN tot
    WHERE n_tx >= {RATE_BIAS_MIN_TX}
    ORDER BY {z} DESC, user_id
    """


@query(
    "threshold_structuring",
    oracle=_rate_bias_sql(
        f"value >= {STRUCTURING_BAND_LO} AND value < {STRUCTURING_THRESHOLD}",
        "n_band", "band_frac", "z_band",
    ),
)
def q_threshold_structuring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structuring screen (X73, r7): per account, how over-represented
    are amounts JUST UNDER the reporting threshold — the behavioral
    fingerprint of splitting a large transfer to dodge a reporting
    limit, i.e. exactly the smurfing economics the reference's
    generator plants (`smurf_generator.py` spreads a sum over many
    small transfers). Counts in [{STRUCTURING_BAND_LO},
    {STRUCTURING_THRESHOLD}) per user vs the corpus base rate, binomial
    z under the normal approximation, ranked by z.

    Scale: one user_id hash aggregate over the event scan (map-side
    combine) + a 1-row broadcast global; no window over a data-sized
    relation, no second scan — the flag is computed once inside both
    aggregates of the same scan."""
    ev = load_table(spark, sf_dir, "events")
    flag = (F.col("value") >= STRUCTURING_BAND_LO) & (
        F.col("value") < STRUCTURING_THRESHOLD
    )
    return _rate_bias(ev, flag, "n_band", "band_frac", "z_band")


@query(
    "round_number_bias",
    oracle=_rate_bias_sql(
        "value = ROUND(value, 0)", "n_round", "round_frac", "z_round"
    ),
)
def q_round_number_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-number bias (X74, r7): per account, over-use of whole-unit
    amounts vs the corpus base rate — fabricated or internally-invented
    figures cluster on round numbers while organic prices carry cents
    (the psychological-pricing complement of `benford_digits`, per-
    account instead of corpus-wide). Whole-unit test is `value =
    ROUND(value, 0)`: both engines round the EXACT double half-away-
    from-zero at scale 0, so the equality is bit-deterministic; same
    binomial-z skeleton and scale posture as `threshold_structuring`."""
    ev = load_table(spark, sf_dir, "events")
    flag = F.col("value") == F.round(F.col("value"), 0)
    return _rate_bias(ev, flag, "n_round", "round_frac", "z_round")


#: CUSUM decision threshold as a multiple of the allowance k (the
#: global mean transaction, in cents): an excursion must accumulate
#: CUSUM_H_MULT mean-transactions of excess before it flags.
CUSUM_H_MULT = 5

_CUSUM_SQL = f"""
    WITH c AS (
        SELECT event_id, user_id, ts,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events
    ),
    k AS (SELECT CAST(ROUND(AVG(cents), 0) AS BIGINT) AS kc FROM c),
    cs AS (
        SELECT user_id, event_id, ts, kc,
               SUM(cents - kc) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS cum
        FROM c CROSS JOIN k
    ),
    s AS (
        SELECT user_id, event_id, ts, kc,
               cum - LEAST(0, MIN(cum) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)) AS sp
        FROM cs
    ),
    f AS (
        SELECT user_id, event_id, ts, kc, sp,
               COALESCE(LAG(sp) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id), 0) AS prev
        FROM s
    )
    SELECT user_id, event_id, ts, CAST(sp AS BIGINT) AS s_plus_cents
    FROM f
    WHERE sp >= {CUSUM_H_MULT} * kc AND prev < {CUSUM_H_MULT} * kc
    ORDER BY user_id, ts, event_id
    """


@query("cusum_upshifts", oracle=_CUSUM_SQL)
def q_cusum_upshifts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-account CUSUM upward level-shift detection (X75, r7): the
    sequential changepoint statistic S_t = max(0, S_{{t-1}} + x_t - k)
    over each account's transaction stream (x = amount in cents, k =
    the corpus mean transaction) flags the moment an account STARTS
    transacting persistently above normal — the onset-of-activity
    change the reference's window-level SVD change score (`AA-CD.py`)
    sees only at window granularity, here located at the exact
    transaction. Emits each UPCROSSING of the decision threshold
    h = {CUSUM_H_MULT}·k (sp >= h where the previous sp < h).

    The recursion is windowed exactly via the reflection identity
    S_t = C_t - min(0, min_{{j<=t}} C_j) with C the running sum of
    (x - k): three per-user ordered window passes (running sum,
    running min, lag), ALL in exact BIGINT cents — no float
    accumulation, so the cross-engine hash is bitwise by construction
    (windowed double sums would be segment-tree order-dependent in the
    oracle engine). The allowance k is a 1-row broadcast; mean cents
    is exact-integer-sum / count, identical IEEE in both engines.

    Scale: one shuffle on user_id, then linear streaming frames within
    each partition; per-account history is the only state."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    k = c.agg(F.round(F.avg("cents"), 0).cast("long").alias("kc"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    h = F.col("kc") * CUSUM_H_MULT
    cs = c.crossJoin(F.broadcast(k)).withColumn(
        "cum", F.sum(F.col("cents") - F.col("kc")).over(w)
    )
    s = cs.withColumn(
        "sp", F.col("cum") - F.least(F.lit(0), F.min("cum").over(w))
    ).withColumn("prev", F.coalesce(F.lag("sp").over(wl), F.lit(0)))
    return (
        s.filter((F.col("sp") >= h) & (F.col("prev") < h))
        .select(
            "user_id",
            "event_id",
            "ts",
            F.col("sp").cast("long").alias("s_plus_cents"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


_PROFILE_KL_SQL = """
    WITH per AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY user_id, event_type
    ),
    un AS (
        SELECT user_id, CAST(SUM(c) AS BIGINT) AS n FROM per
        GROUP BY user_id
    ),
    gl AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cg
        FROM events GROUP BY event_type
    ),
    tot AS (SELECT CAST(SUM(cg) AS BIGINT) AS ng FROM gl),
    terms AS (
        SELECT per.user_id, un.n,
               CAST(ROUND(
                   (CAST(per.c AS DOUBLE) / un.n)
                   * (ROUND(LOG2(per.c), 6) - ROUND(LOG2(un.n), 6)
                      - ROUND(LOG2(gl.cg), 6) + ROUND(LOG2(tot.ng), 6)),
                   9) AS DECIMAL(18,9)) AS t
        FROM per
        JOIN un USING (user_id)
        JOIN gl USING (event_type)
        CROSS JOIN tot
    )
    SELECT user_id, CAST(MIN(n) AS BIGINT) AS n_events,
           CAST(SUM(t) AS DOUBLE) AS kl_bits
    FROM terms GROUP BY user_id
    ORDER BY kl_bits DESC, user_id
    """


@query("user_profile_divergence", oracle=_PROFILE_KL_SQL)
def q_user_profile_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-profile divergence (X78, r7): per-account KL
    divergence (in bits) between the account's event-type mix and the
    corpus mix — the per-account complement of `type_entropy` (global)
    and `chisq_type_segment` (per-segment): an account whose ACTION
    DISTRIBUTION is unlike everyone else's is anomalous even when every
    individual count is unremarkable. KL(p_u || p_g) =
    Σ_type (c/n)·(log₂c − log₂n − log₂c_g + log₂N_g).

    Exactness discipline: all four logs are INTEGER-argument log₂
    (bit-identical cross-engine), 6dp-rounded; each type's term is one
    pinned IEEE chain 9dp-DECIMAL-quantized so the per-account sum is
    order-free (a bare SUM of doubles would be aggregation-order-
    dependent). Scale: two hash aggregates over the event scan
    (checkpointing the (user, type) relation was MEASURED SLOWER at
    sf0.1 — 1.96 vs 1.40 s warm — the re-aggregation is cheaper than
    the materialization barrier, so the declarative form stands); the
    type dictionary (broadcast) and the 1-row total are the only
    joined relations besides the account-sized `un`."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("c")
    )
    un = per.groupBy("user_id").agg(F.sum("c").cast("long").alias("n"))
    glob = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("cg")
    )
    tot = glob.agg(F.sum("cg").cast("long").alias("ng"))
    term = (F.col("c").cast("double") / F.col("n")) * (
        F.round(F.log2("c"), 6)
        - F.round(F.log2("n"), 6)
        - F.round(F.log2("cg"), 6)
        + F.round(F.log2("ng"), 6)
    )
    terms = (
        per.join(un, "user_id")
        .join(F.broadcast(glob), "event_type")
        .crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n",
            F.round(term, 9).cast("decimal(18,9)").alias("t"),
        )
    )
    return (
        terms.groupBy("user_id")
        .agg(
            F.min("n").cast("long").alias("n_events"),
            F.sum("t").cast("double").alias("kl_bits"),
        )
        .orderBy(F.desc("kl_bits"), "user_id")
    )


#: EWMA baseline: dyadic decay 2^-(k-1) over the EWMA_LAGS most recent
#: prior transactions; a transaction EWMA_SPIKE_MULT x its baseline
#: flags, once EWMA_MIN_HIST history rows exist.
EWMA_LAGS = 16
EWMA_MIN_HIST = 8
EWMA_SPIKE_MULT = 4


def _ewma_terms_sql() -> tuple[str, str]:
    num = " + ".join(
        f"COALESCE(LAG(cents, {k}) OVER w * (CAST(1 AS DOUBLE) / {1 << (k - 1)}), 0.0)"
        for k in range(1, EWMA_LAGS + 1)
    )
    den = " + ".join(
        f"CASE WHEN LAG(cents, {k}) OVER w IS NOT NULL"
        f" THEN CAST(1 AS DOUBLE) / {1 << (k - 1)} ELSE 0.0 END"
        for k in range(1, EWMA_LAGS + 1)
    )
    return num, den


def _ewma_sql() -> str:
    num, den = _ewma_terms_sql()
    return f"""
    WITH c AS (
        SELECT user_id, event_id, ts,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events
    ),
    b AS (
        SELECT user_id, event_id, ts, cents,
               ROW_NUMBER() OVER w AS rn,
               ({num}) / NULLIF(({den}), 0.0) AS baseline
        FROM c
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, ts, cents,
           CAST(baseline AS DOUBLE) AS baseline_cents
    FROM b
    WHERE rn > {EWMA_MIN_HIST}
      AND CAST(cents AS DOUBLE) >= {EWMA_SPIKE_MULT} * baseline
    ORDER BY user_id, ts, event_id
    """


@query("ewma_spike_flags", oracle=_ewma_sql())
def q_ewma_spike_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA spend-baseline spike detection (X80, r7): per account, an
    exponentially-decayed baseline over the {EWMA_LAGS} most recent
    PRIOR transactions (weight 2^-(k-1) on the k-th most recent), and a
    flag on any transaction >= {EWMA_SPIKE_MULT}x its own baseline —
    the memory-ful complement of `cusum_upshifts` (CUSUM finds
    persistent level shifts; this finds individual spikes against a
    recency-weighted norm, the standard velocity/limit-check shape).

    The exactness trick making an all-float recursion hash-exact: every
    weight is DYADIC (1/2^k built as an exact power-of-two DIVISION,
    never a parsed double literal or libm pow), cents are BIGINT, so
    every product has a short exact mantissa and the {EWMA_LAGS}-term
    sum stays well inside 53 bits — the numerator, denominator, and
    the final single division are all EXACT IEEE in both engines (a
    conventional float-alpha EWMA would drift by evaluation order).
    Truncating the tail at {EWMA_LAGS} lags (weight < 1/32768 beyond)
    is what makes the window form exact AND bounded.

    Scale: one shuffle on user_id, then {EWMA_LAGS} LAG reads over one
    per-account ordered pass — no self-joins, no state beyond the
    window frame."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    # explicit-N repartition on the window key (r17): the {EWMA_LAGS}
    # LAG expressions make this window stage CPU-bound per row while its
    # input is small by bytes — AQE byte-based coalescing would shrink
    # its parallelism (measured +35% at sf0.1). REPARTITION_BY_NUM is
    # exempt; the window reuses the pinned hash(user_id) partitioning.
    c = c.repartition(
        spark.sparkContext.defaultParallelism, "user_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = sum(
        F.coalesce(
            F.lag("cents", k).over(w) * (F.lit(1.0) / F.lit(1 << (k - 1))),
            F.lit(0.0),
        )
        for k in range(1, EWMA_LAGS + 1)
    )
    den = sum(
        F.when(
            F.lag("cents", k).over(w).isNotNull(),
            F.lit(1.0) / F.lit(1 << (k - 1)),
        ).otherwise(F.lit(0.0))
        for k in range(1, EWMA_LAGS + 1)
    )
    b = c.select(
        "user_id",
        "event_id",
        "ts",
        "cents",
        F.row_number().over(w).alias("rn"),
        (num / F.nullif(den, F.lit(0.0))).alias("baseline"),
    )
    return (
        b.filter(
            (F.col("rn") > EWMA_MIN_HIST)
            & (
                F.col("cents").cast("double")
                >= F.lit(float(EWMA_SPIKE_MULT)) * F.col("baseline")
            )
        )
        .select(
            "user_id",
            "event_id",
            "ts",
            "cents",
            F.col("baseline").cast("double").alias("baseline_cents"),
        )
        .orderBy("user_id", "ts", "event_id")
    )
