"""M1 — per-(window, feature-pair) anomaly scoring of the log-scaled
2-D feature points (`AA-AR.py:69-94`).

The reference fits sklearn `IsolationForest(n_estimators=100)` per
(window, pair) and uses `-decision_function + 0.5` — which is exactly the
canonical iForest anomaly score s(x) = 2^(−E[h(x)]/c(ψ)) (Liu, Ting, Zhou,
ICDM 2008). sklearn is not in this environment, so the forest is a
self-contained seeded NumPy implementation of that public algorithm,
executed as `applyInPandas` over (window_start, pair_id) groups — each
group is ≤ #accounts rows, embarrassingly parallel across 66 pairs × W
windows, Arrow-batched (no per-row Python).

The reference leaves the forest UNSEEDED (nondeterministic —
SURVEY §7.4); we seed per (window, pair) for reproducibility.

A deterministic alternate scorer with identical operator shape —
2-D Mahalanobis distance — is exposed for the DuckDB oracle
(SQL-expressible; the forest itself is rows-only checkable).
"""

from __future__ import annotations


import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import edges
from ..operators.features import WINDOWED_FEATS_CTE, account_features, iforest_points

N_ESTIMATORS = 100
MAX_SAMPLES = 256
EULER_GAMMA = 0.5772156649015329


def _avg_path(n: float) -> float:
    """c(n): average unsuccessful-search path length of a BST of n nodes."""
    if n <= 1:
        return 0.0
    return 2.0 * (np.log(n - 1) + EULER_GAMMA) - 2.0 * (n - 1) / n


def _avg_path_vec(n: np.ndarray) -> np.ndarray:
    """Vectorized c(n) (0 for n ≤ 1)."""
    n = np.asarray(n, dtype=np.float64)
    out = np.zeros_like(n)
    m = n > 1
    nm = n[m]
    out[m] = 2.0 * (np.log(nm - 1) + EULER_GAMMA) - 2.0 * (nm - 1) / nm
    return out


def _forest_paths(X: np.ndarray, idx: np.ndarray, rng: np.random.RandomState,
                  depth_limit: int) -> np.ndarray:
    """Sum over ALL T trees of the expected path length of every row of X;
    tree t is built on X[idx[t]].

    Level-synchronous across the WHOLE FOREST: one bincount sizes every
    node of every tree, one ufunc.at pass computes every node's extents,
    one draw batch picks every split, one comparison routes every
    (tree, point) pair. Python/NumPy call count is O(depth) for the
    forest — not O(trees × depth) as in a per-tree loop — which is an
    ~8× wall-clock win for 100 trees inside the pandas UDF (call
    overhead dominated the per-tree version; measured 1.3 ms/tree →
    ~0.15 ms/tree at n=1500).

    Node addressing: local ids are contiguous per tree and uniform-width
    across trees (nn = 2 × max active nodes of any tree), so global id =
    tree × nn + local. Trees that finish early simply stop contributing
    alive rows."""
    T, psi = idx.shape
    n, d = X.shape
    depths_sum = np.zeros(n)
    Xs = X[idx.ravel()]                         # (T·ψ, d) sample points
    tree_s = np.repeat(np.arange(T), psi)
    pa_s = np.zeros(T * psi, dtype=np.int64)    # sample row → local node
    tree_e = np.repeat(np.arange(T), n)         # eval rows: every (t, i)
    row_e = np.tile(np.arange(n), T)
    pa_e = np.zeros(T * n, dtype=np.int64)
    alive = np.ones(T * n, dtype=bool)
    n_nodes = 1
    for depth in range(depth_limit + 1):
        if n_nodes == 0 or not alive.any():
            break
        G = T * n_nodes
        g_s = tree_s * n_nodes + pa_s
        sizes = np.bincount(g_s, minlength=G)
        lo = np.full((G, d), np.inf)
        hi = np.full((G, d), -np.inf)
        for k in range(d):
            np.minimum.at(lo[:, k], g_s, Xs[:, k])
            np.maximum.at(hi[:, k], g_s, Xs[:, k])
        # empty slots of the uniform id space keep (±inf) extents; zero
        # them explicitly — they are never routed to, but inf−inf in the
        # split-point arithmetic below would emit NaN RuntimeWarnings
        # that could mask a real regression
        empty = sizes == 0
        if empty.any():
            lo[empty] = 0.0
            hi[empty] = 0.0
        splittable = (hi > lo).any(axis=1)
        is_leaf = (sizes <= 1) | (depth == depth_limit) | ~splittable

        # finalize alive (tree, point) pairs that reached a leaf — index
        # via the alive subset only; finalized pairs hold stale node ids
        alive_idx = np.flatnonzero(alive)
        g_e = tree_e[alive_idx] * n_nodes + pa_e[alive_idx]
        leaf_sub = is_leaf[g_e]
        if leaf_sub.any():
            done = alive_idx[leaf_sub]
            g_done = g_e[leaf_sub]
            np.add.at(
                depths_sum, row_e[done], depth + _avg_path_vec(sizes[g_done])
            )
            alive[done] = False

        active = ~is_leaf
        act_2d = active.reshape(T, n_nodes)
        max_active = int(act_2d.sum(axis=1).max(initial=0))
        if max_active == 0:
            break
        # split dim: uniform among non-degenerate dims of each node
        valid = hi > lo
        nvalid = valid.sum(axis=1)
        r = rng.random_sample(G)
        k_idx = np.minimum(
            (r * np.maximum(nvalid, 1)).astype(np.int64),
            np.maximum(nvalid - 1, 0),
        )
        cum = np.cumsum(valid, axis=1) - 1
        q = np.argmax(cum == k_idx[:, None], axis=1)
        u = rng.random_sample(G)
        ar = np.arange(G)
        p = lo[ar, q] + u * (hi[ar, q] - lo[ar, q])

        # renumber per tree: children of a tree's i-th active node get
        # local ids 2i / 2i+1 in a uniform 2·max_active id space
        rank = (np.cumsum(act_2d, axis=1) - 1).ravel()
        keep_s = active[g_s]
        Xs = Xs[keep_s]
        tree_s = tree_s[keep_s]
        g_old = g_s[keep_s]
        right_s = Xs[np.arange(len(Xs)), q[g_old]] >= p[g_old]
        pa_s = 2 * rank[g_old] + right_s

        alive_idx = np.flatnonzero(alive)
        g_e = tree_e[alive_idx] * n_nodes + pa_e[alive_idx]
        right_e = X[row_e[alive_idx], q[g_e]] >= p[g_e]
        pa_e[alive_idx] = 2 * rank[g_e] + right_e
        n_nodes = 2 * max_active
    if alive.any():
        # safety: anything still alive (cannot happen) closes at the limit
        np.add.at(depths_sum, row_e[alive], float(depth_limit))
    return depths_sum


def iforest_scores(X: np.ndarray, n_estimators: int = N_ESTIMATORS,
                   max_samples: int = MAX_SAMPLES, seed: int = 0) -> np.ndarray:
    """Anomaly scores in (0, 1): 2^(−E[h]/c(ψ)). Equals sklearn's
    `-decision_function + 0.5` under contamination='auto'."""
    rng = np.random.RandomState(seed)
    n = len(X)
    psi = min(max_samples, n)
    if psi <= 1:
        # degenerate group: c(1)=0 → the score formula is undefined;
        # a lone point is neither in- nor outlier → neutral 0.5
        return np.full(n, 0.5)
    depth_limit = int(np.ceil(np.log2(max(psi, 2))))
    idx = np.stack(
        [rng.choice(n, psi, replace=False) for _ in range(n_estimators)]
    )
    depths = _forest_paths(X, idx, rng, depth_limit)
    return 2.0 ** (-(depths / n_estimators) / _avg_path(psi))


def anomaly_scores(points: DataFrame, n_estimators: int = N_ESTIMATORS) -> DataFrame:
    """applyInPandas per (window_start, pair_id): fit+score the group's
    2-D points. Output (window_start, account, pair_id, score)."""

    def fit_score(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        X = pdf[["x", "y"]].to_numpy(dtype=np.float64)
        # stable per-group seed → reproducible across retries/partitionings
        seed = (hash((int(key[1]), pdf["window_start"].iloc[0].value)) & 0x7FFFFFFF)
        s = iforest_scores(X, n_estimators=n_estimators, seed=seed)
        return pd.DataFrame(
            {
                "window_start": pdf["window_start"],
                "account": pdf["account"],
                "pair_id": pdf["pair_id"],
                "score": s,
            }
        )

    # EXPLICIT partition count (r17): this stage is CPU-bound per GROUP
    # (a forest fit), not per byte — AQE's byte-sized coalescing would
    # collapse the tiny-by-bytes shuffle to one task and serialize the
    # forest (measured 35 s vs 5.5 s at sf0.01 in r3). A user-specified
    # numPartitions (REPARTITION_BY_NUM) is exempt from AQE coalescing,
    # so the fit keeps core-count parallelism while the rest of the
    # session runs with coalescing on. defaultParallelism scales with
    # the cluster; groups hash-spread over it.
    n_parts = points.sparkSession.sparkContext.defaultParallelism
    return (
        points.repartition(n_parts, "window_start", "pair_id")
        .groupBy("window_start", "pair_id")
        .applyInPandas(
            fit_score,
            "window_start timestamp, account long, pair_id int, score double",
        )
    )


def mahalanobis_scores(points: DataFrame, input_materialized: bool = False) -> DataFrame:
    """Deterministic alternate scorer, same operator shape: squared 2-D
    Mahalanobis distance of each point from its (window, pair) group —
    pure column expressions over grouped moments (oracle-checkable).
    Groups with a singular covariance (σ=0 or |ρ|=1) are dropped.

    Shape chosen for scale: `points` is persisted once, the group moments
    reduce through a map-side partial aggregate (the stats relation is
    only windows × 66 rows), and the moments come BACK via a broadcast
    join — the fact table is never shuffled or sorted. The alternatives
    both lose at 100 TB: groupBy+join without the persist runs the whole
    upstream feature pipeline twice, and an analytic window function
    sort-shuffles every point row.

    `input_materialized=True` skips the internal persist: callers passing
    an already-checkpointed/persisted relation (`shared_points`) would
    otherwise store the same rows twice (r18)."""
    pts = points if input_materialized else points.persist()
    # x/y are 8dp-exact → DECIMAL(18,8) captures them losslessly and the
    # decimal SUM is exact and summation-order-independent in both
    # engines (a 6dp round of the double sum is NOT: a moment landing on
    # a rounding half-boundary flips with partition order). The exact sum
    # is then rounded to 6dp IN DECIMAL (both engines HALF_UP on the same
    # exact value) before the double cast, so the cast is a single IEEE
    # division of a <2^53 scaled integer — bit-identical cross-engine,
    # where casting the full scale-16 sum is not (int128→double is a
    # double-rounding in DuckDB).
    xd = F.col("x").cast("decimal(18,8)")
    yd = F.col("y").cast("decimal(18,8)")
    g = pts.groupBy("window_start", "pair_id").agg(
        F.count("*").alias("n"),
        F.round(F.sum(xd), 6).cast("double").alias("sx"),
        F.round(F.sum(yd), 6).cast("double").alias("sy"),
        F.round(F.sum(xd * xd), 6).cast("double").alias("sxx"),
        F.round(F.sum(yd * yd), 6).cast("double").alias("syy"),
        F.round(F.sum(xd * yd), 6).cast("double").alias("sxy"),
    )
    n = F.col("n")
    mx, my = F.col("sx") / n, F.col("sy") / n
    vx = F.col("sxx") / n - mx * mx
    vy = F.col("syy") / n - my * my
    cxy = F.col("sxy") / n - mx * my
    det = vx * vy - cxy * cxy
    stats = g.select(
        "window_start", "pair_id", mx.alias("mx"), my.alias("my"),
        vx.alias("vx"), vy.alias("vy"), cxy.alias("cxy"), det.alias("det"),
    ).filter(F.col("det") > 0)
    j = pts.join(F.broadcast(stats), ["window_start", "pair_id"])
    dx, dy = F.col("x") - F.col("mx"), F.col("y") - F.col("my")
    d2 = (F.col("vy") * dx * dx - 2 * F.col("cxy") * dx * dy + F.col("vx") * dy * dy) / F.col("det")
    return j.select(
        "window_start", "account", "pair_id", F.round(d2, 6).alias("score")
    )


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return iforest_points(account_features(edges(spark, sf_dir), window=True))


def shared_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped cache of the (window, account, pair, x, y) points
    relation (r17) — the same justification as `shared_maha_scores`
    below, one level up the pipeline: THREE suite consumers (the
    Mahalanobis build, the iforest fit, and the stage-4 routing twins'
    past-position aggregate) each re-ran the windowed-feature pipeline
    (~3-5 s at sf0.1) to rebuild identical points. Same cardinality
    class as the scores cache (windows × accounts × 66), materialized
    MEMORY_AND_DISK (localCheckpoint's default level) so a real
    deployment spills instead of OOMing.

    localCheckpoint, not persist (r18, guide §5/§3.3): a persisted
    relation keeps its full LOGICAL plan, so every consumer's query
    plan nests the whole feature pipeline and Catalyst re-analyzes it
    per query — the maha-family explain dumps ran 400-5400 lines and
    the first run of each consumer paid seconds of driver
    plan-analysis + codegen on already-cached data. The checkpoint
    truncates the lineage to an RDD leaf: identical rows, identical
    storage level, O(1)-depth consumer plans. Trade (documented at
    damped_walk too): the materialized blocks are not fault-tolerant —
    an executor loss forces the query to fail/rerun instead of
    recomputing partitions; on a durable cluster swap for checkpoint()
    if that matters."""
    from ..session_cache import session_bucket

    per_session = session_bucket(spark, "iforest_points")
    df = per_session.get(sf_dir)
    if df is None:
        df = _points(spark, sf_dir).localCheckpoint()
        per_session[sf_dir] = df
    return df


# session-scoped cache of the persisted Mahalanobis scores relation —
# three suite queries (anomaly_scores_mahalanobis, focus_plot_sum,
# sketch_values_hashed) and the T3 skeleton all consume the same
# (window, account, pair, score) relation; materializing it once per
# (session, sf_dir) removes the repeated ~10 s feature→score pipeline
# (round-2 verdict, "Next round" #4). The bucket lives ON the session
# object (session_cache.session_bucket): a module-level
# WeakKeyDictionary would be immortal here because the cached DataFrame
# strongly references its session — the weak key could never clear.


def shared_maha_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session_cache import session_bucket

    per_session = session_bucket(spark, "maha_scores")
    df = per_session.get(sf_dir)
    if df is None:
        # localCheckpoint for the same plan-truncation reason as
        # shared_points above; input_materialized because the points
        # relation is already checkpointed (persisting it again inside
        # mahalanobis_scores would store the rows twice)
        df = mahalanobis_scores(
            shared_points(spark, sf_dir), input_materialized=True
        ).localCheckpoint()
        per_session[sf_dir] = df
    return df


@query("anomaly_scores_iforest")
def q_anomaly_scores_iforest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: seeded NumPy Isolation Forest per (window, pair) — rows-only
    check (nondeterministic-by-algorithm; semantics pinned by unit tests).

    Score-stream note: the round-3 forest-batched vectorization changed
    the RNG consumption order vs the old per-tree loop (subsample draws
    up-front; split draws sized over the uniform node-id space), so for
    the same seed the emitted scores DIFFER from rounds 1–2. That is safe
    precisely because this query is rows-only checked — never value-hash
    compare its output against pre-r3 captures."""
    return anomaly_scores(shared_points(spark, sf_dir)).orderBy(
        "window_start", "pair_id", "account"
    )


#: shared CTE chain up to `lpts(window_start, account, pair_id, x, y)` —
#: the log-scaled nonzero feature-pair points (= `iforest_points`).
#: Reused by the Mahalanobis oracle and the stage-4 routing twin
#: (`mining/change.py`).
_PTS_CTE = (
    WINDOWED_FEATS_CTE
    + """,
    pairs AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY a.fid, b.fid) - 1 AS INTEGER) AS pair_id,
               a.fid AS f1, b.fid AS f2
        FROM (SELECT UNNEST(range(12)) AS fid) a
        JOIN (SELECT UNNEST(range(12)) AS fid) b ON a.fid < b.fid
    ),
    pts AS (
        SELECT f.window_start, f.account, p.pair_id, {v1} AS v1, {v2} AS v2
        FROM feats f CROSS JOIN pairs p
    ),
    lpts AS (
        SELECT window_start, account, pair_id,
               ROUND(LOG10(v1 + 1), 8) AS x, ROUND(LOG10(v2 + 1), 8) AS y
        FROM pts WHERE v1 <> 0 AND v2 <> 0
    )"""
)

_MAHA_SQL = (
    _PTS_CTE
    + """,
    dpts AS (
        SELECT window_start, account, pair_id, x, y,
               CAST(x AS DECIMAL(18,8)) AS xd, CAST(y AS DECIMAL(18,8)) AS yd
        FROM lpts
    ),
    g AS (
        SELECT window_start, pair_id, COUNT(*) AS n,
               CAST(ROUND(SUM(xd), 6) AS DOUBLE) AS sx,
               CAST(ROUND(SUM(yd), 6) AS DOUBLE) AS sy,
               CAST(ROUND(SUM(xd * xd), 6) AS DOUBLE) AS sxx,
               CAST(ROUND(SUM(yd * yd), 6) AS DOUBLE) AS syy,
               CAST(ROUND(SUM(xd * yd), 6) AS DOUBLE) AS sxy
        FROM dpts GROUP BY window_start, pair_id
    ),
    stats AS (
        SELECT window_start, pair_id,
               sx / n AS mx, sy / n AS my,
               sxx / n - (sx / n) * (sx / n) AS vx,
               syy / n - (sy / n) * (sy / n) AS vy,
               sxy / n - (sx / n) * (sy / n) AS cxy,
               (sxx / n - (sx / n) * (sx / n)) * (syy / n - (sy / n) * (sy / n))
                   - (sxy / n - (sx / n) * (sy / n)) * (sxy / n - (sx / n) * (sy / n)) AS det
        FROM g
    )
    SELECT l.window_start, l.account, l.pair_id,
           ROUND((s.vy * (l.x - s.mx) * (l.x - s.mx)
                  - 2 * s.cxy * (l.x - s.mx) * (l.y - s.my)
                  + s.vx * (l.y - s.my) * (l.y - s.my)) / s.det, 6) AS score
    FROM lpts l JOIN stats s
      ON l.window_start = s.window_start AND l.pair_id = s.pair_id
    WHERE s.det > 0
    ORDER BY l.window_start, l.pair_id, l.account
    """
)

# reuse the CASE-pick fragments from features.py to select v1/v2 by fid
from ..operators.features import _case_pick  # noqa: E402

_PICKS = {
    "v1": _case_pick("v1", "p.f1").replace(" AS v1", ""),
    "v2": _case_pick("v2", "p.f2").replace(" AS v2", ""),
}
_MAHA_SQL = _MAHA_SQL.format(**_PICKS)
_PTS_CTE = _PTS_CTE.format(**_PICKS)


@query("anomaly_scores_mahalanobis", oracle=_MAHA_SQL)
def q_anomaly_scores_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 alternate: deterministic Mahalanobis scorer, full value-hash
    oracle — pins the whole feature→pair→filter→log pipeline upstream of
    the forest."""
    return shared_maha_scores(spark, sf_dir).orderBy(
        "window_start", "pair_id", "account"
    )


@query(
    "focus_plot_sum",
    oracle="WITH scored AS (" + _MAHA_SQL.replace("ORDER BY l.window_start, l.pair_id, l.account", "") + """)
    SELECT account, pair_id, ROUND(SUM(score), 6) AS tot_score
    FROM scored GROUP BY account, pair_id
    ORDER BY account, pair_id
    """,
)
def q_focus_plot_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: element-wise sum of focus plots across windows
    (`AA-AR.py:129` sum_graph), over the deterministic scorer."""
    scored = shared_maha_scores(spark, sf_dir)
    return (
        scored.groupBy("account", "pair_id")
        # addends are 6dp-exact (rounded upstream) → a 6dp round of their
        # sum cannot sit on a boundary
        .agg(F.round(F.sum("score"), 6).alias("tot_score"))
        .orderBy("account", "pair_id")
    )
