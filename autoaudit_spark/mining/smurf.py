"""M6 — greedy MDL search for smurf-pattern blocks (AA-Smurf main loop),
plus the S1 dense-matrix-text → COO scan.

Algorithm re-derived from `AA-Smurf.py:86-165`:

1. Candidate generation: all pairs (i, j) with ≥3 two-hop paths i→m→j,
   ordered by path count desc — our `operators.graph.two_hop_*` Spark
   queries (one shuffle) replace the dense A·A product.
2. Greedy loop: per iteration, tentatively append each candidate block
   [i, mids..., j] to the order; keep the candidate maximizing
   ((prev−mdl)/prev)·purity among those that REDUCE the MDL; stop when
   none improves (or max_iter). Tie-breaks replicate the reference
   exactly (first argmax; candidate order = count desc, ties in reverse
   row-major) so the golden fixture reproduces.
3. Model selection: first iteration whose MDL < 1.1× final, minus one
   (`AA-Smurf.py:162` — including its negative-index quirk when the
   initial cost already qualifies).

Execution model: candidate scoring is a pure function of (edge ranks,
layout) — embarrassingly parallel. Below a threshold the driver scores
with vectorized NumPy over the collected COO arrays (the reference's
joblib pool, minus the per-task matrix pickling); above it, scoring fans
out as a Spark `mapInPandas` job over a candidate DataFrame with the COO
arrays broadcast once per iteration. Candidates and layout state are
O(patterns) — tiny; the edge array is the only big object and it is
broadcast, not shipped per task.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import adjacency
from .mdl import compute_mdl, initial_mdl, ranks_for_order


def matrix_text_to_edges(spark: SparkSession, path: str) -> DataFrame:
    """S1: whitespace-delimited N×N 0/1 matrix → COO edge DataFrame
    (`AA-Smurf.py:190` np.loadtxt → sparse). Row index = line number
    (zipWithIndex on the text source), col index = posexplode position."""
    lines = spark.read.text(path)
    # zipWithIndex preserves input line order independent of partitioning
    rows = lines.rdd.zipWithIndex().map(lambda t: (t[1], t[0].value))
    df = spark.createDataFrame(rows, "src_idx long, line string")
    return (
        df.select(
            "src_idx",
            F.posexplode(F.split(F.trim("line"), r"\s+")).alias("dst_idx", "v"),
        )
        .filter(F.col("v").cast("double") != 0)
        .select("src_idx", F.col("dst_idx").cast("long").alias("dst_idx"))
    )


@dataclass
class SmurfResult:
    order: list[int]            # final permutation prefix (explicit blocks)
    start: list[int]            # block boundaries (cumulative)
    count: list[int]            # [patterns, intermediaries, receivers]
    mdl_history: list[float]    # MDL per accepted iteration (monotone ↓)
    n: int
    selected_iter: int = field(default=0)

    def rank_map(self) -> list[tuple[int, int, int]]:
        """(node, rank, block_id) rows; residual nodes get block_id -1."""
        pos = ranks_for_order(self.order, self.n)
        blocks = np.full(self.n, -1, dtype=np.int64)
        for b in range(1, len(self.start)):
            blocks[self.start[b - 1] : self.start[b]] = b - 1
        return [
            (node, int(pos[node]), int(blocks[pos[node]]) if pos[node] < len(blocks) else -1)
            for node in range(self.n)
        ]


def two_hop_pairs_numpy(
    ru: np.ndarray, rv: np.ndarray, n: int, min_paths: int = 3
) -> list[tuple[tuple[int, int], list[int]]]:
    """Pure-NumPy twin of the J1/J2 candidate generation, same ordering
    contract as :func:`_candidate_list` — for driver-scale inputs and
    property tests (no SparkSession needed)."""
    from collections import defaultdict

    outn: dict[int, set[int]] = defaultdict(set)
    inn: dict[int, set[int]] = defaultdict(set)
    for sN, dN in zip(ru, rv):
        outn[int(sN)].add(int(dN))
        inn[int(dN)].add(int(sN))
    pairs: dict[tuple[int, int], set[int]] = defaultdict(set)
    for m in range(n):
        for i in inn[m]:
            for j in outn[m]:
                pairs[(i, j)].add(m)
    rows = [(i, j, len(ms)) for (i, j), ms in pairs.items() if len(ms) >= min_paths]
    rows.sort(key=lambda t: (t[0], t[1]))
    rows.sort(key=lambda t: t[2])
    rows.reverse()
    return [((i, j), sorted(pairs[(i, j)])) for i, j, _ in rows]


def _candidate_list(adj: DataFrame, max_candidates: int | None):
    """Collect candidates ordered exactly like the reference: path count
    desc, ties in REVERSE row-major (src, dst) order (`AA-Smurf.py:110` —
    ascending stable sort then [::-1]); mids ascending (`:109`).

    Scale posture: only the (pair, count) list is collected (O(candidate
    pairs)); intermediary sets are fetched ONLY for the kept candidates
    via a broadcast semi-join + collect_set — the full (src, dst, mid)
    relation (O(2-hop paths), the big one) never reaches the driver. That
    path relation is persisted (memory-and-disk, spillable) between the
    count pass and the mids pass so the self-join — the expensive stage —
    executes once, not twice."""
    spark = adj.sparkSession
    a, b = adj.alias("a"), adj.alias("b")
    paths = (
        a.join(b, F.col("a.dst") == F.col("b.src"))
        .select(
            F.col("a.src").alias("src"),
            F.col("b.dst").alias("dst"),
            F.col("a.dst").alias("mid"),
        )
        .persist()
    )
    counts = (
        paths.groupBy("src", "dst")
        .agg(F.count("*").alias("path_cnt"))
        .filter(F.col("path_cnt") >= 3)
    )
    rows = [(r["src"], r["dst"], r["path_cnt"]) for r in counts.collect()]
    rows.sort(key=lambda t: (t[0], t[1]))          # row-major
    rows.sort(key=lambda t: t[2])                  # stable asc by count
    rows.reverse()                                 # desc count, rev row-major ties
    kept = rows[:max_candidates] if max_candidates else rows

    keep_df = F.broadcast(
        spark.createDataFrame([(s, d) for s, d, _ in kept], "src long, dst long")
    )
    mids_rows = (
        paths.join(keep_df, ["src", "dst"], "left_semi")
        .groupBy("src", "dst")
        .agg(F.sort_array(F.collect_set("mid")).alias("mids"))
        .collect()
    )
    paths.unpersist()
    mids = {(r["src"], r["dst"]): list(r["mids"]) for r in mids_rows}
    return [((s, d), mids.get((s, d), [])) for s, d, _ in kept]


def _score_one(ru, rv, n, placed, order, start, count, prev_mdl, key, mid_list):
    """One candidate evaluation (`AA-Smurf.py:116-131` func)."""
    i, j = key
    if i in placed or j in placed:
        return None
    # m != i mirrors the reference (key[0] enters `order` before the mid
    # filter, `AA-Smurf.py:117-119`); m != j guards self-loop graphs the
    # reference never sees (zero-diagonal fixtures) — without it j would
    # be placed twice and the permutation would break.
    tmp_mid = [m for m in mid_list if m not in placed and m != i and m != j]
    if not tmp_mid:
        return None
    # Conscious fix of a reference bug: for a self-pair candidate (i, i) —
    # the diagonal of A·A, a 2-cycle hub, present in the reference's own
    # sample fixture — `AA-Smurf.py:117-122` appends key[0] AND key[1],
    # putting the node in `order` twice and corrupting the permutation
    # (np.ix_ then duplicates the matrix row). We place it once; counts
    # still follow the reference ([+1 pattern, +mids, +1 receiver]).
    new_order = order + [i] + tmp_mid + ([j] if j != i else [])
    new_start = start + [len(new_order)]
    new_count = [count[0] + 1, count[1] + len(tmp_mid), count[2] + 1]
    pos = ranks_for_order(new_order, n)
    mdl, purity = compute_mdl(pos[ru], pos[rv], n, new_start, new_count)
    if mdl >= prev_mdl:
        return None
    score = ((prev_mdl - mdl) / prev_mdl) * purity
    return (score, mdl, new_order, new_start, new_count)


def smurf_search(
    edges_src: np.ndarray,
    edges_dst: np.ndarray,
    n: int,
    candidates: list[tuple[tuple[int, int], list[int]]],
    max_iter: int | None = None,
    spark: SparkSession | None = None,
    distribute_threshold: int = 5000,
    selection: str = "reference",
) -> SmurfResult:
    """Greedy MDL loop over pre-generated candidates (driver-resident; the
    heavy lifting — candidate generation — already ran as Spark joins).

    When the candidate list is large and a SparkSession is provided,
    each iteration's scoring fans out via mapInPandas (the COO arrays
    ride a broadcast variable)."""
    ru, rv = edges_src, edges_dst
    old_mdl = initial_mdl(n, len(ru))
    order: list[int] = []
    start = [0]
    count = [0, 0, 0]
    history = [old_mdl]
    it = 0
    use_spark = spark is not None and len(candidates) > distribute_threshold

    while True:
        prev_mdl = history[-1]
        placed = set(order)
        best = None  # (score, seq) — argmax keeps FIRST max (np.argmax)
        if use_spark:
            best = _score_round_spark(
                spark, ru, rv, n, placed, order, start, count, prev_mdl, candidates
            )
        else:
            for key, mid_list in candidates:
                res = _score_one(ru, rv, n, placed, order, start, count, prev_mdl, key, mid_list)
                if res is not None and (best is None or res[0] > best[0]):
                    best = res
        if best is None or (max_iter is not None and it > max_iter):
            break
        _, mdl, order, start, count = best
        history.append(mdl)
        it += 1

    # Model selection (`AA-Smurf.py:162`): the reference picks the model
    # ONE BEFORE the first whose MDL < 1.1×final — "10% above the minimum
    # bits", a deliberately simpler layout (for a 1-iteration run this is
    # the empty model; `idx-1` can even be -1 → last, a Python negative-
    # index quirk we replicate). selection="final" returns the full
    # greedy result instead (every accepted block).
    if selection == "final":
        res = SmurfResult(order, start, count, history, n)
        res.selected_iter = len(history) - 1
        return res
    sel = next(
        (idx - 1 for idx, m in enumerate(history) if m < history[-1] * 1.1),
        len(history) - 1,
    )
    if sel == -1:
        sel = len(history) - 1
    if sel != len(history) - 1:
        # re-run the accepted prefix to recover that iteration's layout
        return _replay(ru, rv, n, candidates, sel, history)
    res = SmurfResult(order, start, count, history, n)
    res.selected_iter = sel
    return res


def _replay(ru, rv, n, candidates, upto, full_history) -> SmurfResult:
    order: list[int] = []
    start = [0]
    count = [0, 0, 0]
    history = [full_history[0]]
    for _ in range(upto):
        prev_mdl = history[-1]
        placed = set(order)
        best = None
        for key, mid_list in candidates:
            res = _score_one(ru, rv, n, placed, order, start, count, prev_mdl, key, mid_list)
            if res is not None and (best is None or res[0] > best[0]):
                best = res
        if best is None:
            break
        _, mdl, order, start, count = best
        history.append(mdl)
    out = SmurfResult(order, start, count, history, n)
    out.selected_iter = upto
    return out


def _score_round_spark(spark, ru, rv, n, placed, order, start, count, prev_mdl, candidates):
    """One scoring round as a Spark job: candidates DF → mapInPandas.
    COO arrays are broadcast once; each task scores a slice of candidates
    and returns (cand_idx, score) — the driver takes the first argmax."""
    sc = spark.sparkContext
    b = sc.broadcast((ru, rv, n, sorted(placed), order, start, count, prev_mdl,
                      [(k, m) for k, m in candidates]))

    def score_batches(batches):
        import pandas as pd

        bru, brv, bn, bplaced, border, bstart, bcount, bprev, bcands = b.value
        pset = set(bplaced)
        for pdf in batches:
            out = []
            for ci in pdf["cand_idx"]:
                key, mids = bcands[ci]
                res = _score_one(
                    bru, brv, bn, pset, border, bstart, bcount, bprev, key, mids
                )
                if res is not None:
                    out.append((int(ci), float(res[0])))
            yield pd.DataFrame(out, columns=["cand_idx", "score"])

    idx_df = spark.range(len(candidates)).withColumnRenamed("id", "cand_idx")
    scored = idx_df.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        score_batches, "cand_idx long, score double"
    )
    rows = scored.collect()
    b.unpersist()
    if not rows:
        return None
    # first argmax in candidate order
    best_idx, best_score = None, None
    for r in sorted(rows, key=lambda r: r["cand_idx"]):
        if best_score is None or r["score"] > best_score:
            best_idx, best_score = r["cand_idx"], r["score"]
    key, mids = candidates[best_idx]
    return _score_one(ru, rv, n, placed, order, start, count, prev_mdl, key, mids)


def smurf_pipeline(
    spark: SparkSession,
    adj: DataFrame,
    max_iter: int | None = 10,
    max_candidates: int | None = 200,
    selection: str = "reference",
    n_nodes: int | None = None,
) -> tuple[SmurfResult, DataFrame]:
    """End-to-end AA-Smurf: Spark candidate joins → greedy MDL →
    (node, rank, block_id) DataFrame.

    n_nodes: total node count INCLUDING isolated nodes (matrix fixtures —
    MDL code lengths are ⌈log2 n⌉ of the full matrix size, and isolated
    nodes occupy residual ranks). Default: universe observed in edges."""
    adj = adj.persist()
    candidates = _candidate_list(adj, max_candidates)

    # node universe is contiguous 0..n-1 only for matrix fixtures; general
    # graphs are relabeled through a rank map first
    if n_nodes is not None:
        node_ids = list(range(n_nodes))
    else:
        nodes = (
            adj.select(F.col("src").alias("node"))
            .union(adj.select(F.col("dst")))
            .distinct()
            .orderBy("node")
        )
        node_ids = [r["node"] for r in nodes.collect()]
    id_to_ix = {v: i for i, v in enumerate(node_ids)}
    n = len(node_ids)

    pdf = adj.toPandas()
    ru = np.array([id_to_ix[v] for v in pdf["src"]], dtype=np.int64)
    rv = np.array([id_to_ix[v] for v in pdf["dst"]], dtype=np.int64)
    cands_ix = [
        ((id_to_ix[i], id_to_ix[j]), [id_to_ix[m] for m in mids])
        for (i, j), mids in candidates
    ]

    result = smurf_search(
        ru, rv, n, cands_ix, max_iter=max_iter, spark=spark, selection=selection
    )
    rank_rows = [
        (node_ids[node], rank, block) for node, rank, block in result.rank_map()
    ]
    rank_df = spark.createDataFrame(rank_rows, "node long, rank long, block_id long")
    return result, rank_df


@query("smurf_blocks")
def q_smurf_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5+M6 on the derived adjacency. Non-SQL-expressible (iterative
    greedy MDL) — driver records a rows-only check; golden-fixture tests
    in tests/test_smurf.py pin the semantics."""
    adj = adjacency(spark, sf_dir)
    _, rank_df = smurf_pipeline(spark, adj, max_iter=5, max_candidates=100)
    return rank_df.orderBy("rank")
