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
