"""M3 — SVD change-point score over the sketch stream + stage-4 attention
routing (`AA-AR.py:234-266`).

Per window i ≥ back_ws: the trailing sketch matrix sketches[i−b : i−1]
(length b−1 — the reference EXCLUDES window i−1 from the history, a quirk
we reproduce, `AA-AR.py:237`) is SVD-decomposed; ev = |first left singular
vector|, sum-normalized; z_i = cosine distance(ev, sk_i/Σsk_i);
max_sketch_i = argmax (sk−ev)/ev.

The sketch matrix is W×256 floats — trivially driver-resident at ANY data
scale (window count grows with time span, not data volume; 256 is fixed),
so the SVD loop runs on the driver over the collected relation; the
expensive upstream (scores, sketch sums) is all Spark. The streaming
variant keeps the same math in applyInPandasWithState
(streaming/windowed.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query

BACK_WS = 4  # `--b` default (`AA-AR.py:279`)


def _cosine(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return float("nan")
    return float(1.0 - np.dot(a, b) / (na * nb))


def change_scores_from_matrix(
    windows: list, sk: np.ndarray, back_ws: int = BACK_WS
) -> list[tuple[object, float, int]]:
    """(window_start, z, max_sketch) per scored window. sk: W×S matrix in
    window order."""
    out = []
    for i in range(back_ws, len(windows)):
        hist = sk[i - back_ws : i - 1].T            # S×(b−1); excludes i−1
        u, _, _ = np.linalg.svd(hist)
        ev = np.abs(u[:, 0].T)
        cur = sk[i]
        ev_n = ev / np.sum(ev)
        cur_n = cur / np.sum(cur)
        z = _cosine(ev_n, cur_n)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = (cur_n - ev_n) / ev_n
        out.append((windows[i], z, int(np.nanargmax(ratio))))
    return out


def change_scores(sketches: DataFrame, back_ws: int = BACK_WS) -> DataFrame:
    """Collect the (tiny) sketch relation → driver SVD → score DF."""
    spark = sketches.sparkSession
    rows = sketches.orderBy("window_start", "sketch_id").collect()
    windows = sorted({r["window_start"] for r in rows})
    widx = {w: i for i, w in enumerate(windows)}
    n_sketch = max(r["sketch_id"] for r in rows) + 1
    sk = np.zeros((len(windows), n_sketch))
    for r in rows:
        sk[widx[r["window_start"]], r["sketch_id"]] = r["value"]
    out = change_scores_from_matrix(windows, sk, back_ws)
    return spark.createDataFrame(
        out, "window_start timestamp, z double, max_sketch int"
    )


@query("change_scores")
def q_change_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 end-to-end (sketches → SVD → z). Rows-only (SVD + RNG
    permutation are not SQL-expressible); math pinned by unit tests."""
    from .sketch import build_sketches

    vals, _, _ = build_sketches(spark, sf_dir, sketch_num=64)
    return change_scores(vals).orderBy("window_start")


# ---------------------------------------------------------------------------
# M3 routing stage under a full value-hash oracle (round-2 verdict, "Next
# round" #6). The SVD direction itself is not SQL; this deterministic twin
# replaces ev = |u₀(history)| with ev = Σ(history) — the trailing-window
# SUM — and checks everything AROUND the SVD exactly: the trailing frame
# (i−4..i−2, reference's i−1 exclusion), sum-normalization, cosine
# distance, and the (cur_n − ev_n)/ev_n argmax routing. Two identities
# make it exact & SQL-able:
#   · cosine is scale-invariant ⇒ normalizing by Σ and dividing by the
#     history length both cancel — the decimal SUM vectors feed the dot
#     and norms EXACTLY (order-independent sums), and only the final
#     sqrt/divide is double (equal decimals in ⇒ equal doubles out);
#   · argmax_s (cur_n−ev_n)/ev_n = argmax_s cur/ev (positive Σ factors
#     cancel), with ev=0 ∧ cur>0 ranking first (numpy's +inf under
#     nanargmax) and sketch_id breaking double ties.
# ---------------------------------------------------------------------------
_CHANGE_COSINE_SQL = """
    WITH wev AS (
        SELECT make_timestamp(((epoch_us(ts) // 604800000000) - k.k) * 604800000000)
                   AS window_start,
               user_id, value
        FROM events, (VALUES (0), (1)) k(k)
    ),
    msums AS (
        SELECT window_start, CAST(s.sid AS INTEGER) AS sketch_id,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS v
        FROM wev CROSS JOIN (SELECT UNNEST(range(64)) AS sid) s
        WHERE ((((user_id % 100003) * 2654435761) % 1000003
                + s.sid * 97 + 7) % 1000003) % 1000 < 5
        GROUP BY window_start, s.sid
    ),
    wins AS (
        SELECT window_start, ROW_NUMBER() OVER (ORDER BY window_start) AS wn
        FROM (SELECT DISTINCT window_start FROM msums)
    ),
    sk AS (SELECT CAST(UNNEST(range(64)) AS INTEGER) AS sketch_id),
    grid AS (
        SELECT w.window_start, w.wn, k.sketch_id,
               COALESCE(m.v, CAST(0 AS DECIMAL(18,2))) AS v
        FROM wins w CROSS JOIN sk k
        LEFT JOIN msums m ON m.window_start = w.window_start
                         AND m.sketch_id = k.sketch_id
    ),
    hist AS (
        SELECT *, CAST(SUM(v) OVER (PARTITION BY sketch_id ORDER BY window_start
                       ROWS BETWEEN 4 PRECEDING AND 2 PRECEDING)
                  AS DECIMAL(18,2)) AS h
        FROM grid
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start ORDER BY
                  (h = 0 AND v > 0) DESC,
                  CASE WHEN h <> 0 THEN CAST(v AS DOUBLE) / CAST(h AS DOUBLE)
                       END DESC NULLS LAST,
                  sketch_id) AS rk
        FROM hist WHERE wn >= 5
    ),
    agg AS (
        SELECT window_start,
               CAST(SUM(CAST(h * v AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS dot,
               CAST(SUM(CAST(h * h AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS ss_ev,
               CAST(SUM(CAST(v * v AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS ss_cur,
               MAX(CASE WHEN rk = 1 THEN sketch_id END) AS max_sketch
        FROM ranked GROUP BY window_start
    )
    SELECT window_start,
           CASE WHEN ss_ev > 0 AND ss_cur > 0 THEN
               ROUND(1 - CAST(dot AS DOUBLE)
                         / (SQRT(CAST(ss_ev AS DOUBLE))
                            * SQRT(CAST(ss_cur AS DOUBLE))), 6)
           END AS z,
           max_sketch
    FROM agg ORDER BY window_start
    """


def change_cosine_grid(
    spark: SparkSession, sf_dir: str, n_sketch: int = 64
) -> DataFrame:
    """The zero-filled (window × sketch) DECIMAL-sum grid feeding the
    deterministic change-cosine twin: windowed hash-membership sums over
    events, completed to all n_sketch rows per window (missing cells =
    0.00) with the window's global rank `wn`. Shared by the batch twin
    (`sketch_change_cosine`) and its streaming stateful twin
    (`stream_change_cosine`, streaming/windowed.py) so both score the
    bit-identical input. Scale: the grid is windows × n_sketch —
    parameter-sized; the only data-sized stage is the member-explode
    aggregation of events."""
    from pyspark.sql.window import Window

    from ..sources import load_table
    from .sketch import _member_pred

    ev = load_table(spark, sf_dir, "events")
    member_sids = F.filter(
        F.sequence(F.lit(0), F.lit(n_sketch - 1)),
        lambda sid: _member_pred(F.col("user_id"), sid),
    )
    msums = (
        ev.select("ts", "value", F.explode(member_sids).alias("sketch_id"))
        .groupBy(
            F.window("ts", "14 days", "7 days")["start"].alias("window_start"),
            "sketch_id",
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("v")
        )
    )
    wins = (
        msums.select("window_start")
        .distinct()
        .withColumn("wn", F.row_number().over(Window.orderBy("window_start")))
    )
    sk = spark.range(n_sketch).select(F.col("id").cast("int").alias("sketch_id"))
    return (
        wins.crossJoin(sk)
        .join(msums, ["window_start", "sketch_id"], "left")
        .select(
            "window_start",
            "wn",
            "sketch_id",
            F.coalesce("v", F.lit(0).cast("decimal(18,2)")).alias("v"),
        )
    )


@query("sketch_change_cosine", oracle=_CHANGE_COSINE_SQL)
def q_sketch_change_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 routing stage, deterministic twin under the exact value-hash:
    trailing-frame direction → cosine distance → ratio argmax over the
    windowed hash-sketch sums (`AA-AR.py:234-266` with ev = Σ history in
    place of |u₀|; see _CHANGE_COSINE_SQL comment)."""
    from pyspark.sql.window import Window

    back_ws = BACK_WS
    grid = change_cosine_grid(spark, sf_dir, n_sketch=64)
    wf = (
        Window.partitionBy("sketch_id")
        .orderBy("window_start")
        .rowsBetween(-back_ws, -2)
    )
    hist = grid.withColumn("h", F.sum("v").over(wf).cast("decimal(18,2)")).filter(
        F.col("wn") >= back_ws + 1
    )
    h, v = F.col("h"), F.col("v")
    wr = Window.partitionBy("window_start").orderBy(
        ((h == 0) & (v > 0)).desc(),
        F.when(h != 0, v.cast("double") / h.cast("double")).desc_nulls_last(),
        "sketch_id",
    )
    ranked = hist.withColumn("rk", F.row_number().over(wr))
    agg = ranked.groupBy("window_start").agg(
        F.sum((h * v).cast("decimal(38,4)")).cast("decimal(38,4)").alias("dot"),
        F.sum((h * h).cast("decimal(38,4)")).cast("decimal(38,4)").alias("ss_ev"),
        F.sum((v * v).cast("decimal(38,4)")).cast("decimal(38,4)").alias("ss_cur"),
        F.max(F.when(F.col("rk") == 1, F.col("sketch_id"))).alias("max_sketch"),
    )
    z = F.when(
        (F.col("ss_ev") > 0) & (F.col("ss_cur") > 0),
        F.round(
            1
            - F.col("dot").cast("double")
            / (
                F.sqrt(F.col("ss_ev").cast("double"))
                * F.sqrt(F.col("ss_cur").cast("double"))
            ),
            6,
        ),
    )
    return agg.select("window_start", z.alias("z"), "max_sketch").orderBy(
        "window_start"
    )


# ---------------------------------------------------------------------------
# Stage-4 attention routing under a FULL value-hash oracle. Composes the
# three already-oracled twins end to end: the hashed-membership sketch
# pipeline (sums + declarative greedy, mining/sketch.py), the
# deterministic change-cosine routing stage (same math as
# `sketch_change_cosine`, here over the sketch-value matrix), and the
# Mahalanobis scorer — then picks the argmax-z window, that window's
# most-changed sketch, the sketch's greedily-chosen pair columns, the
# top-3 accounts per pair by focus score, and their trailing-average
# past positions (`AA-AR.py:251-266`). Every stage is declarative; the
# one-row "best" relation flows by broadcast join, not collect.
# ---------------------------------------------------------------------------
def _routing_hashed_sql() -> str:
    from .iforest import _PTS_CTE
    from .sketch import _sketch_hashed_cte

    lpts_sql = _PTS_CTE + "\n    SELECT window_start, account, pair_id, x, y FROM lpts"
    return (
        _sketch_hashed_cte()
        + f""",
    lp AS ({lpts_sql}),
    rwins AS (
        SELECT window_start, ROW_NUMBER() OVER (ORDER BY window_start) AS wn
        FROM (SELECT DISTINCT window_start FROM sv)
    ),
    v6 AS (
        SELECT s.window_start, w.wn, s.sketch_id,
               CAST(s.value AS DECIMAL(18,6)) AS v
        FROM sv s JOIN rwins w ON w.window_start = s.window_start
    ),
    rhist AS (
        SELECT *, CAST(SUM(v) OVER (PARTITION BY sketch_id ORDER BY window_start
                       ROWS BETWEEN {BACK_WS} PRECEDING AND 2 PRECEDING)
                  AS DECIMAL(18,6)) AS h
        FROM v6
    ),
    rranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start ORDER BY
                  (h = 0 AND v > 0) DESC,
                  CASE WHEN h <> 0 THEN CAST(v AS DOUBLE) / CAST(h AS DOUBLE)
                       END DESC NULLS LAST,
                  sketch_id) AS srk
        FROM rhist WHERE wn >= {BACK_WS + 1}
    ),
    ragg AS (
        SELECT window_start,
               CAST(SUM(CAST(h * v AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS dot,
               CAST(SUM(CAST(h * h AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS ss_ev,
               CAST(SUM(CAST(v * v AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS ss_cur,
               MAX(CASE WHEN srk = 1 THEN sketch_id END) AS max_sketch
        FROM rranked GROUP BY window_start
    ),
    rz AS (
        SELECT window_start, max_sketch,
               CASE WHEN ss_ev > 0 AND ss_cur > 0 THEN
                   1 - CAST(dot AS DOUBLE)
                       / (SQRT(CAST(ss_ev AS DOUBLE)) * SQRT(CAST(ss_cur AS DOUBLE)))
               END AS z
        FROM ragg
    ),
    best AS (
        SELECT window_start AS win, max_sketch FROM rz
        QUALIFY ROW_NUMBER() OVER (ORDER BY z DESC NULLS LAST, window_start) = 1
    ),
    rpairs AS (
        SELECT ch.pair_id FROM chosen ch JOIN best b ON ch.sketch_id = b.max_sketch
    ),
    top3 AS (
        SELECT sc.window_start, sc.pair_id, sc.account, sc.score,
               ROW_NUMBER() OVER (PARTITION BY sc.pair_id
                                  ORDER BY sc.score DESC, sc.account) AS rk
        FROM scored sc
        JOIN best b ON sc.window_start = b.win
        JOIN rpairs rp ON rp.pair_id = sc.pair_id
    ),
    past0 AS (
        SELECT l.account, l.pair_id, l.x, l.y,
               ROW_NUMBER() OVER (PARTITION BY l.account, l.pair_id
                                  ORDER BY l.window_start DESC) AS wrk
        FROM lp l JOIN best b ON l.window_start < b.win
    ),
    rpast AS (
        SELECT account, pair_id,
               CAST(SUM(CAST(x AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) AS past_x,
               CAST(SUM(CAST(y AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) AS past_y
        FROM past0 WHERE wrk <= {BACK_WS} GROUP BY account, pair_id
    )
    SELECT t.window_start, t.pair_id, t.account, t.score,
           CAST(t.rk AS BIGINT) AS rk, p.past_x, p.past_y
    FROM top3 t LEFT JOIN rpast p
      ON p.account = t.account AND p.pair_id = t.pair_id
    WHERE t.rk <= 3
    ORDER BY t.pair_id, t.rk
    """
    )


@query("attention_routing_hashed", oracle=_routing_hashed_sql())
def q_attention_routing_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 4 end to end under the exact value-hash (see the block
    comment above). The SVD-based `attention_routing` keeps the
    reference's |u₀| direction (rows-only); this twin substitutes the
    scale-invariant trailing-sum direction so every downstream routing
    decision — argmax window, most-changed sketch, chosen pairs, top-3
    accounts, past positions — is cross-engine exact."""
    from pyspark.sql.window import Window

    from .iforest import shared_maha_scores, shared_points
    from .sketch import hashed_sketch_parts

    vals, chosen = hashed_sketch_parts(spark, sf_dir, sketch_num=64)
    wins = (
        vals.select("window_start")
        .distinct()
        .withColumn("wn", F.row_number().over(Window.orderBy("window_start")))
    )
    v6 = vals.join(wins, "window_start").withColumn(
        "v", F.col("value").cast("decimal(18,6)")
    )
    wf = (
        Window.partitionBy("sketch_id")
        .orderBy("window_start")
        .rowsBetween(-BACK_WS, -2)
    )
    hist = v6.withColumn("h", F.sum("v").over(wf).cast("decimal(18,6)")).filter(
        F.col("wn") >= BACK_WS + 1
    )
    h, v = F.col("h"), F.col("v")
    wr = Window.partitionBy("window_start").orderBy(
        ((h == 0) & (v > 0)).desc(),
        F.when(h != 0, v.cast("double") / h.cast("double")).desc_nulls_last(),
        "sketch_id",
    )
    ragg = (
        hist.withColumn("srk", F.row_number().over(wr))
        .groupBy("window_start")
        .agg(
            F.sum((h * v).cast("decimal(38,12)")).cast("decimal(38,12)").alias("dot"),
            F.sum((h * h).cast("decimal(38,12)")).cast("decimal(38,12)").alias("ss_ev"),
            F.sum((v * v).cast("decimal(38,12)")).cast("decimal(38,12)").alias("ss_cur"),
            F.max(F.when(F.col("srk") == 1, F.col("sketch_id"))).alias("max_sketch"),
        )
    )
    z = F.when(
        (F.col("ss_ev") > 0) & (F.col("ss_cur") > 0),
        1
        - F.col("dot").cast("double")
        / (
            F.sqrt(F.col("ss_ev").cast("double"))
            * F.sqrt(F.col("ss_cur").cast("double"))
        ),
    )
    best = (
        ragg.select("window_start", "max_sketch", z.alias("z"))
        .withColumn(
            "brk",
            F.row_number().over(
                Window.orderBy(F.col("z").desc_nulls_last(), "window_start")
            ),
        )
        .filter(F.col("brk") == 1)
        .select(F.col("window_start").alias("win"), "max_sketch")
    )
    rpairs = chosen.join(
        F.broadcast(best), chosen.sketch_id == best.max_sketch
    ).select("pair_id", "win")
    scored = shared_maha_scores(spark, sf_dir)
    wt = Window.partitionBy("pair_id").orderBy(F.col("score").desc(), "account")
    top3 = (
        scored.join(
            F.broadcast(rpairs),
            (scored.pair_id == rpairs.pair_id) & (scored.window_start == rpairs.win),
        )
        .select("window_start", scored.pair_id, "account", "score")
        .withColumn("rk", F.row_number().over(wt).cast("long"))
        .filter(F.col("rk") <= 3)
    )
    pts = shared_points(spark, sf_dir)
    wp = Window.partitionBy("account", "pair_id").orderBy(
        F.col("window_start").desc()
    )
    past = (
        pts.join(F.broadcast(best.select("win")), pts.window_start < F.col("win"))
        .withColumn("wrk", F.row_number().over(wp))
        .filter(F.col("wrk") <= BACK_WS)
        .groupBy("account", "pair_id")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(18,8)")).cast("double") / F.count("*")
            ).alias("past_x"),
            (
                F.sum(F.col("y").cast("decimal(18,8)")).cast("double") / F.count("*")
            ).alias("past_y"),
        )
    )
    return (
        top3.join(past, ["account", "pair_id"], "left")
        .select(
            "window_start", "pair_id", "account", "score", "rk", "past_x", "past_y"
        )
        .orderBy("pair_id", "rk")
    )


@query("attention_routing")
def q_attention_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 4 (`AA-AR.py:251-266`): pick the argmax-z window, the
    most-changed sketch's pair columns, and for each such pair the top-3
    accounts by focus score with their trailing-average past position
    (W1 intended semantics). Output one row per (pair, ranked account)."""
    from pyspark.sql.window import Window

    from ..operators.features import account_features, iforest_points
    from ..sources import edges
    from .iforest import shared_maha_scores
    from .sketch import build_sketches

    vals, perm, _ = build_sketches(spark, sf_dir, sketch_num=64)
    ch = change_scores(vals).collect()
    if not ch:
        return spark.createDataFrame(
            [],
            "window_start timestamp, pair_id int, account long, score double,"
            " rk int, past_x double, past_y double",
        )
    best = max(ch, key=lambda r: (r["z"] if r["z"] == r["z"] else -1))
    win, sketch_id = best["window_start"], best["max_sketch"]
    dst_pairs = perm[sketch_id][1]

    pts = iforest_points(
        account_features(edges(spark, sf_dir), window=True)
    ).persist()
    scores = shared_maha_scores(spark, sf_dir)
    w = Window.partitionBy("pair_id").orderBy(F.col("score").desc(), "account")
    top = (
        scores.filter(
            (F.col("window_start") == F.lit(win))
            & F.col("pair_id").isin([int(p) for p in dst_pairs])
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )
    past = (
        pts.filter(F.col("window_start") < F.lit(win))
        .withColumn(
            "wrk",
            F.row_number().over(
                Window.partitionBy("account", "pair_id").orderBy(
                    F.col("window_start").desc()
                )
            ),
        )
        .filter(F.col("wrk") <= BACK_WS)
        .groupBy("account", "pair_id")
        .agg(
            (F.round(F.sum("x"), 6) / F.count("*")).alias("past_x"),
            (F.round(F.sum("y"), 6) / F.count("*")).alias("past_y"),
        )
    )
    return (
        top.join(past, ["account", "pair_id"], "left")
        .select(
            "window_start", "pair_id", "account", "score", "rk", "past_x", "past_y"
        )
        .orderBy("pair_id", "rk")
    )
