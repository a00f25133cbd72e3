"""M2 — sketching: seeded random projections of the focus plot + greedy
max-coverage column selection (`AA-AR.py:124-160`).

The permutation (per sketch: a ~0.5% random subset of account rows and up
to 3 greedily-chosen feature-pair columns) is generated ON THE DRIVER with
the reference's exact RNG draw order (`np.random.seed(seed)`, one draw per
account then one per pair column, per sketch) — reproducibility beats
distributed rand (SURVEY §4d). It is then broadcast as two tiny
membership tables and the sketch VALUES — the heavy part — are a join +
grouped sum over the scores relation (A13): Spark-side, one shuffle, any
scale.

The greedy objective per candidate column set D: Σ_{sid∈S} max_{d∈D}
sum_graph[sid, d] (`AA-AR.py:136-146`). Reference quirk: if no candidate
scores positive (e.g. the sampled row set is empty), its `max_idx`
stays 0 and `ori_dst_id.remove(0)` would crash; we take the first
remaining candidate instead (documented deviation — unreachable at the
reference's own data scale, routine at small n).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query

#: reference defaults (`AA-AR.py:124,278,280-281`)
SKETCH_NUM = 256
NUM_DST = 3
S_RATE = 0.995
D_RATE = 0.8
PN = 78  # (12+1)*12/2 — reference over-allocates; cols 66..77 stay zero


def generate_permutation(
    n_accounts: int,
    sum_graph: np.ndarray,
    sketch_num: int = SKETCH_NUM,
    num_dst: int = NUM_DST,
    s_rate: float = S_RATE,
    d_rate: float = D_RATE,
    seed: int = 0,
) -> list[tuple[list[int], list[int]]]:
    """[(src_row_indices, dst_pair_columns)] per sketch — reference RNG
    draw order exactly (`AA-AR.py:126-147`)."""
    rng = np.random
    rng.seed(seed)
    permutation = []
    for _ in range(sketch_num):
        src_id = [i for i in range(n_accounts) if rng.random_sample() > s_rate]
        ori_dst_id = [i for i in range(PN) if rng.random_sample() > d_rate]
        dst_id: list[int] = []
        for _ in range(min(len(ori_dst_id), num_dst)):
            max_s, max_idx = 0.0, None
            for did in ori_dst_id:
                cols = dst_id + [did]
                s = sum(np.max(sum_graph[sid, cols]) for sid in src_id)
                if s > max_s:
                    max_idx, max_s = did, s
            if max_idx is None:  # deviation: reference would crash here
                max_idx = ori_dst_id[0]
            ori_dst_id.remove(max_idx)
            dst_id.append(max_idx)
        permutation.append((src_id, dst_id))
    return permutation


def sketch_values(
    scores: DataFrame,
    accounts: list[int],
    permutation: list[tuple[list[int], list[int]]],
) -> DataFrame:
    """A13: sketch value = Σ_{sid∈S, did∈D} plot[sid, did] per (window,
    sketch) — scores ⋈ broadcast membership ⋈ grouped sum, zero-filled to
    the full (window × sketch) grid (absent rows sum to 0 in the
    reference's dense matrix)."""
    spark = scores.sparkSession
    src_rows = [
        (ski, accounts[sid])
        for ski, (src_id, _) in enumerate(permutation)
        for sid in src_id
    ]
    dst_rows = [
        (ski, did)
        for ski, (_, dst_id) in enumerate(permutation)
        for did in dst_id
    ]
    src_m = spark.createDataFrame(src_rows or [(-1, -1)], "sketch_id int, account long")
    dst_m = spark.createDataFrame(dst_rows or [(-1, -1)], "sketch_id int, pair_id int")

    vals = (
        scores.join(F.broadcast(src_m), "account")
        .join(F.broadcast(dst_m), ["sketch_id", "pair_id"])
        .groupBy("window_start", "sketch_id")
        .agg(F.round(F.sum("score"), 6).alias("value"))
    )
    grid = (
        scores.select("window_start")
        .distinct()
        .crossJoin(
            spark.createDataFrame(
                [(i,) for i in range(len(permutation))], "sketch_id int"
            )
        )
    )
    return (
        grid.join(vals, ["window_start", "sketch_id"], "left")
        .select(
            "window_start",
            "sketch_id",
            F.coalesce("value", F.lit(0.0)).alias("value"),
        )
    )


def build_sketches(
    spark: SparkSession, sf_dir: str, sketch_num: int = SKETCH_NUM, seed: int = 0
) -> tuple[DataFrame, list[tuple[list[int], list[int]]], list[int]]:
    """Full M2: deterministic scorer → focus-plot sum → seeded permutation
    → sketch value relation. Returns (values DF, permutation, accounts)."""
    from .iforest import _points, mahalanobis_scores

    scores = mahalanobis_scores(_points(spark, sf_dir)).persist()
    # ONE collected aggregate feeds both the account universe and the
    # summed graph (a separate distinct() pass would re-scan the cache)
    sum_rows = (
        scores.groupBy("account", "pair_id")
        .agg(F.sum("score").alias("s"))
        .collect()
    )
    accounts = sorted({r["account"] for r in sum_rows})
    aidx = {a: i for i, a in enumerate(accounts)}
    sum_graph = np.zeros((len(accounts), PN))
    for r in sum_rows:
        sum_graph[aidx[r["account"]], r["pair_id"]] = r["s"]
    perm = generate_permutation(len(accounts), sum_graph, sketch_num=sketch_num, seed=seed)
    return sketch_values(scores, accounts, perm), perm, accounts


@query("sketch_values")
def q_sketch_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 end-to-end (seeded; deterministic scorer). Rows-only: the
    permutation is RNG-generated driver-side, not SQL-expressible."""
    vals, _, _ = build_sketches(spark, sf_dir, sketch_num=64)
    return vals.orderBy("window_start", "sketch_id")
