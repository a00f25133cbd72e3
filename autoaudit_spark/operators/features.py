"""The 12-feature account block (A9) — AA-AR's per-account structural
features, static and per sliding window, plus the feature-pair dimension
(J7) and the Isolation-Forest input points (P7+F3).

Reference (`AA-AR.py:19-66`): for each account, 12 features in this exact
order (fid 0..11) —

    0 uniq_in_deg   1 multi_in_deg   2 uniq_out_deg  3 multi_out_deg
    4 tot_in_w      5 mean_in_w      6 med_in_w      7 var_in_w
    8 tot_out_w     9 mean_out_w    10 med_out_w    11 var_out_w

computed there by an O(N·E) per-account loop; here as TWO grouped passes
(in-side by dst, out-side by src) + one full-outer join with coalesce-zero
fill (`AA-AR.py:32-35` — empty side yields (0,0,0,0)). One shuffle per
side regardless of window count — the per-window joblib fan-out
(`AA-AR.py:111-115`) collapses into a single windowed aggregation.

Variance is POPULATION variance (np.var ddof=0); median is exact.
Account universe = accounts appearing in the (windowed) edge set — an
account absent from a window has no row, matching `np.unique` at
`AA-AR.py:40`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import EDGES_SQL, edges

FEATURE_NAMES = [
    "uniq_in_deg",
    "multi_in_deg",
    "uniq_out_deg",
    "multi_out_deg",
    "tot_in_w",
    "mean_in_w",
    "med_in_w",
    "var_in_w",
    "tot_out_w",
    "mean_out_w",
    "med_out_w",
    "var_out_w",
]

#: 66 unordered feature pairs in reference order: pair_id increments over
#: f1 in 0..11, f2 in f1+1..11 (`AA-AR.py:76-77` `num` counter).
FEATURE_PAIRS = [
    (f1, f2) for f1 in range(len(FEATURE_NAMES)) for f2 in range(f1 + 1, len(FEATURE_NAMES))
]

WINDOW_DURATION = "14 days"
SLIDE_DURATION = "7 days"
_SLIDE_US = 7 * 86400 * 1_000_000

#: DuckDB fragment assigning each edge to its 2 sliding windows — validated
#: to produce byte-identical window_start values to Spark's
#: `F.window(ts, '14 days', '7 days')` (epoch-aligned, UTC).
WINDOWED_EDGES_SQL = f"""
    SELECT make_timestamp(((epoch_us(ts) // {_SLIDE_US}) - k.k) * {_SLIDE_US}) AS window_start,
           src, dst, weight, ts
    FROM edges, (VALUES (0), (1)) k(k)
"""


def _stat_aggs() -> list[Column]:
    """sum/mean/median/var_pop of weight, cross-engine-exact:

    Sums are rounded at the data's native decimal count (weight has 2dp,
    weight² has 4dp) — a rounding boundary cannot sit there, so the two
    engines' summation-order ulps collapse to identical doubles. Mean and
    population variance are then DERIVED from those identical doubles
    (IEEE arithmetic is deterministic), never rounded after a division —
    `ROUND(AVG(..))` flips on exact boundaries (mean = sum/2^k hits
    x.xxxx5 exactly), which is why no direct AVG/VAR_POP appears here."""
    s = F.round(F.sum("weight"), 2)
    s2 = F.round(F.sum(F.col("weight") * F.col("weight")), 4)
    n = F.count("*")
    return [
        s.alias("tot_w"),
        (s / n).alias("mean_w"),
        F.round(F.median("weight"), 4).alias("med_w"),
        ((s2 - s * s / n) / n).alias("var_w"),
    ]


def _stat_sql(suffix: str) -> str:
    return (
        f"ROUND(SUM(weight), 2) AS tot_{suffix}, "
        f"ROUND(SUM(weight), 2) / COUNT(*) AS mean_{suffix}, "
        f"ROUND(MEDIAN(weight), 4) AS med_{suffix}, "
        f"(ROUND(SUM(weight * weight), 4) "
        f"- ROUND(SUM(weight), 2) * ROUND(SUM(weight), 2) / COUNT(*)) / COUNT(*) AS var_{suffix}"
    )


def account_features(edges_df: DataFrame, window: bool = False) -> DataFrame:
    """A9: the 12-feature block. With ``window=True``, keys are
    (window_start, account) over 14d/7d sliding windows (T1) — one
    windowed aggregation computes every window at once."""
    keys = ["account"]
    if window:
        edges_df = edges_df.withColumn(
            "window_start",
            F.window("ts", WINDOW_DURATION, SLIDE_DURATION)["start"],
        )
        keys = ["window_start", "account"]

    in_keys = [F.col("window_start")] if window else []
    outs = (
        edges_df.groupBy(*in_keys, F.col("src").alias("account"))
        .agg(
            F.countDistinct("dst").alias("uniq_out_deg"),
            F.count("*").alias("multi_out_deg"),
            *_stat_aggs(),
        )
        .withColumnsRenamed(
            {"tot_w": "tot_out_w", "mean_w": "mean_out_w", "med_w": "med_out_w", "var_w": "var_out_w"}
        )
    )
    ins = (
        edges_df.groupBy(*in_keys, F.col("dst").alias("account"))
        .agg(
            F.countDistinct("src").alias("uniq_in_deg"),
            F.count("*").alias("multi_in_deg"),
            *_stat_aggs(),
        )
        .withColumnsRenamed(
            {"tot_w": "tot_in_w", "mean_w": "mean_in_w", "med_w": "med_in_w", "var_w": "var_in_w"}
        )
    )
    joined = ins.join(outs, keys, "full_outer")
    zero_long = ["uniq_in_deg", "multi_in_deg", "uniq_out_deg", "multi_out_deg"]
    sel: list[Column] = [F.col(k) for k in keys]
    for name in FEATURE_NAMES:
        zero = F.lit(0) if name in zero_long else F.lit(0.0)
        sel.append(F.coalesce(F.col(name), zero).alias(name))
    return joined.select(*sel)


_FEATURES_SQL_BODY = f"""
    outs AS (
        SELECT {{win_key}} src AS account,
               COUNT(DISTINCT dst) AS uniq_out_deg, COUNT(*) AS multi_out_deg,
               {_stat_sql('out_w')}
        FROM {{src_tbl}} GROUP BY {{win_grp}} src
    ),
    ins AS (
        SELECT {{win_key}} dst AS account,
               COUNT(DISTINCT src) AS uniq_in_deg, COUNT(*) AS multi_in_deg,
               {_stat_sql('in_w')}
        FROM {{src_tbl}} GROUP BY {{win_grp}} dst
    )
    SELECT {{out_keys}}
           COALESCE(i.uniq_in_deg, 0) AS uniq_in_deg,
           COALESCE(i.multi_in_deg, 0) AS multi_in_deg,
           COALESCE(o.uniq_out_deg, 0) AS uniq_out_deg,
           COALESCE(o.multi_out_deg, 0) AS multi_out_deg,
           COALESCE(i.tot_in_w, 0.0) AS tot_in_w,
           COALESCE(i.mean_in_w, 0.0) AS mean_in_w,
           COALESCE(i.med_in_w, 0.0) AS med_in_w,
           COALESCE(i.var_in_w, 0.0) AS var_in_w,
           COALESCE(o.tot_out_w, 0.0) AS tot_out_w,
           COALESCE(o.mean_out_w, 0.0) AS mean_out_w,
           COALESCE(o.med_out_w, 0.0) AS med_out_w,
           COALESCE(o.var_out_w, 0.0) AS var_out_w
    FROM ins i FULL OUTER JOIN outs o ON {{join_cond}}
"""

_STATIC_FEATURES_SQL = (
    f"WITH edges AS ({EDGES_SQL}), "
    + _FEATURES_SQL_BODY.format(
        win_key="", win_grp="", src_tbl="edges",
        out_keys="COALESCE(i.account, o.account) AS account,",
        join_cond="i.account = o.account",
    )
    + " ORDER BY account"
)

#: `WITH ... feats AS (...)` prefix exposing the windowed 12-feature table
#: as CTE `feats` — shared by every downstream AR-pipeline oracle.
WINDOWED_FEATS_CTE = (
    f"WITH edges AS ({EDGES_SQL}), wedges AS ({WINDOWED_EDGES_SQL}), "
    + _FEATURES_SQL_BODY.format(
        win_key="window_start,", win_grp="window_start,", src_tbl="wedges",
        out_keys=(
            "COALESCE(i.window_start, o.window_start) AS window_start, "
            "COALESCE(i.account, o.account) AS account,"
        ),
        join_cond="i.account = o.account AND i.window_start = o.window_start",
    ).replace(
        ")\n    SELECT COALESCE(i.window_start",
        "),\n    feats AS (\n    SELECT COALESCE(i.window_start",
    )
    + ")"
)

_WINDOWED_FEATURES_SQL = (
    WINDOWED_FEATS_CTE + " SELECT * FROM feats ORDER BY window_start, account"
)


@query("account_features", oracle=_STATIC_FEATURES_SQL)
def q_account_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 static: whole-graph 12-feature block (`AA-AR.py:39-66`)."""
    return account_features(edges(spark, sf_dir)).orderBy("account")


@query("windowed_features", oracle=_WINDOWED_FEATURES_SQL)
def q_windowed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9×T1: per sliding window (14d/7d) — ONE shuffle computes all
    windows (replaces the reference's per-window process fan-out,
    `AA-AR.py:111-115`)."""
    return account_features(edges(spark, sf_dir), window=True).orderBy(
        "window_start", "account"
    )


def feature_pairs(spark: SparkSession) -> DataFrame:
    """J7: the 66-row (pair_id, f1, f2) dimension in reference order —
    broadcast everywhere it joins."""
    return spark.createDataFrame(
        [(i, f1, f2) for i, (f1, f2) in enumerate(FEATURE_PAIRS)],
        "pair_id int, f1 int, f2 int",
    )


@query(
    "feature_pairs",
    oracle="""
    WITH f AS (SELECT UNNEST(range(12)) AS fid)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY a.fid, b.fid) - 1 AS INTEGER) AS pair_id,
           CAST(a.fid AS INTEGER) AS f1, CAST(b.fid AS INTEGER) AS f2
    FROM f a JOIN f b ON a.fid < b.fid
    ORDER BY pair_id
    """,
)
def q_feature_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: theta(<) self-join over the feature dimension → 66 unordered
    pairs, numbered by the reference's loop order (`AA-AR.py:76-77`)."""
    f = spark.range(12).select(F.col("id").cast("int").alias("fid"))
    a, b = f.alias("a"), f.alias("b")
    from pyspark.sql.window import Window

    return (
        a.join(b, F.col("a.fid") < F.col("b.fid"))
        .select(F.col("a.fid").alias("f1"), F.col("b.fid").alias("f2"))
        .withColumn(
            "pair_id",
            (F.row_number().over(Window.orderBy("f1", "f2")) - 1).cast("int"),
        )
        .select("pair_id", "f1", "f2")
        .orderBy("pair_id")
    )


def iforest_points(features_df: DataFrame) -> DataFrame:
    """P7+F3: expand each feature row into its 66 feature-pair points,
    keep points where BOTH features are nonzero (`AA-AR.py:78`),
    log10(x+1)-scale (`AA-AR.py:81-82`).

    Spark-first shape: a literal 66-struct array + `explode` — pure
    projection, NO join and NO shuffle (the pair dimension is compiled
    into the plan). Output: (window_start?, account, pair_id, x, y) —
    the exact input of the per-(window, pair) Isolation Forest
    (mining/iforest.py).
    """
    keys = [c for c in ("window_start", "account") if c in features_df.columns]
    pair_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("pair_id"),
                F.col(FEATURE_NAMES[f1]).cast("double").alias("v1"),
                F.col(FEATURE_NAMES[f2]).cast("double").alias("v2"),
            )
            for i, (f1, f2) in enumerate(FEATURE_PAIRS)
        ]
    )
    return (
        features_df.select(*keys, F.explode(pair_structs).alias("p"))
        .where((F.col("p.v1") != 0) & (F.col("p.v2") != 0))
        .select(
            *keys,
            F.col("p.pair_id").alias("pair_id"),
            # + 0.0 normalizes IEEE -0.0 (tiny negative log rounded) to
            # +0.0 so both engines emit an identical value.
            (F.round(F.log10(F.col("p.v1") + 1), 8) + 0.0).alias("x"),
            (F.round(F.log10(F.col("p.v2") + 1), 8) + 0.0).alias("y"),
        )
    )


def _case_pick(alias: str, fid_col: str) -> str:
    branches = " ".join(
        f"WHEN {i} THEN CAST({name} AS DOUBLE)" for i, name in enumerate(FEATURE_NAMES)
    )
    return f"CASE {fid_col} {branches} END AS {alias}"


_IFOREST_POINTS_SQL = (
    WINDOWED_FEATS_CTE
    + """,
    pairs AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY a.fid, b.fid) - 1 AS INTEGER) AS pair_id,
               a.fid AS f1, b.fid AS f2
        FROM (SELECT UNNEST(range(12)) AS fid) a
        JOIN (SELECT UNNEST(range(12)) AS fid) b ON a.fid < b.fid
    ),
    pts AS (
        SELECT f.window_start, f.account, p.pair_id,
               """
    + _case_pick("v1", "p.f1")
    + ", "
    + _case_pick("v2", "p.f2")
    + """
        FROM feats f CROSS JOIN pairs p
    )
    SELECT window_start, account, pair_id,
           ROUND(LOG10(v1 + 1), 8) + 0.0 AS x, ROUND(LOG10(v2 + 1), 8) + 0.0 AS y
    FROM pts WHERE v1 <> 0 AND v2 <> 0
    ORDER BY window_start, account, pair_id
    """
)


@query("iforest_points", oracle=_IFOREST_POINTS_SQL)
def q_iforest_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7+F3 over windowed features: the Isolation-Forest input points
    (`AA-AR.py:76-82`)."""
    feats = account_features(edges(spark, sf_dir), window=True)
    return iforest_points(feats).orderBy("window_start", "account", "pair_id")
