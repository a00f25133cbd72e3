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

Execution model (two paths, bit-identical — parity-tested):

- **Fixture scale** (≤ DISTRIBUTE_EDGE_THRESHOLD edges): the driver
  scores with vectorized NumPy over collected COO arrays — the
  reference's joblib pool minus the per-task matrix pickling.
- **Scale path**: the edge relation NEVER reaches the driver. Every box
  count in the MDL formula is additive over edge partitions, so one
  `mapInPandas` pass per greedy round emits per-candidate partial
  box-count vectors (`mdl.mdl_box_counts`), a groupBy sums them, and
  the driver evaluates the nonlinear formula on O(candidates × boxes)
  integers. Candidate rank transforms are piecewise shifts
  (`_shift_ranks`), so edge ranks are MAINTAINED distributed across
  rounds (mapInPandas rewrite + localCheckpoint, O(1) plan depth).
  Driver state is the candidate list and layout — O(patterns), never
  O(E) or O(n). Only candidate descriptors (member ranks) are
  broadcast per round, not the graph.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import adjacency
from .mdl import (
    compute_mdl,
    initial_mdl,
    mdl_box_counts,
    mdl_from_counts,
    ranks_for_order,
)


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
    # the reference's ordering — ascending stable sort by count then [::-1]
    # (`AA-Smurf.py:110`) — equals ORDER BY count DESC, src DESC, dst DESC;
    # with a cap this is a DISTRIBUTED top-k (TakeOrderedAndProject), so
    # only max_candidates rows ever reach the driver, not every pair with
    # ≥3 paths (which grows with the graph)
    ordered = counts.orderBy(
        F.desc("path_cnt"), F.desc("src"), F.desc("dst")
    )
    if max_candidates:
        ordered = ordered.limit(max_candidates)
    kept = [(r["src"], r["dst"], r["path_cnt"]) for r in ordered.collect()]

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
    selection: str = "reference",
) -> SmurfResult:
    """Greedy MDL loop over pre-generated candidates — the DRIVER-RESIDENT
    scorer for fixture-scale inputs (collected COO arrays). At scale,
    :func:`smurf_pipeline` routes to :func:`_smurf_search_distributed`,
    which computes the identical numbers without ever collecting edges."""
    ru, rv = edges_src, edges_dst
    old_mdl = initial_mdl(n, len(ru))
    order: list[int] = []
    start = [0]
    count = [0, 0, 0]
    history = [old_mdl]
    it = 0

    while True:
        prev_mdl = history[-1]
        placed = set(order)
        best = None  # (score, seq) — argmax keeps FIRST max (np.argmax)
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


def _shift_ranks(
    r: np.ndarray,
    member_ranks: np.ndarray,
    member_new: np.ndarray,
    L: int,
    k: int,
) -> np.ndarray:
    """Vectorized rank transform for appending one block: a node holding
    CURRENT rank r moves to

    - its block position (member_new aligned to sorted member_ranks) if it
      is a block member,
    - r − |members with rank < r| + k if it sits in the residual region
      (members vacate ranks below it; the k-wide block is inserted at L),
    - r unchanged if already placed (r < L; members all rank ≥ L).

    This equals recomputing ``ranks_for_order(new_order, n)`` in node
    space — the residual region keeps ascending-node-id order, so relative
    order is preserved under removal — which is what makes per-edge rank
    maintenance possible WITHOUT an O(n) driver map."""
    idx = np.searchsorted(member_ranks, r)
    safe = np.minimum(idx, len(member_ranks) - 1)
    is_member = member_ranks[safe] == r
    out = np.where(r < L, r, r - idx + k)
    return np.where(is_member, member_new[safe], out)


def _viable_candidates(candidates, placed, cur_rank, order, start, count):
    """Driver-side prefilter + descriptor build for one greedy round.
    Mirrors `_score_one`'s skip rules (i/j placed, no surviving mids);
    emits per candidate the block's member CURRENT ranks, their new block
    ranks, and the tentative layout — O(candidates × block size) state,
    never edges."""
    L = len(order)
    descs = []
    for ci, (key, mid_list) in enumerate(candidates):
        i, j = key
        if i in placed or j in placed:
            continue
        tmp_mid = [m for m in mid_list if m not in placed and m != i and m != j]
        if not tmp_mid:
            continue
        block_nodes = [i] + tmp_mid + ([j] if j != i else [])
        k = len(block_nodes)
        mranks = np.array([cur_rank[x] for x in block_nodes], dtype=np.int64)
        mnew = L + np.arange(k, dtype=np.int64)
        sort_ix = np.argsort(mranks)
        new_start = start + [L + k]
        new_count = [count[0] + 1, count[1] + len(tmp_mid), count[2] + 1]
        new_order_suffix = block_nodes
        descs.append(
            (ci, mranks[sort_ix], mnew[sort_ix], L, k, new_start, new_count,
             new_order_suffix)
        )
    return descs


def _smurf_search_distributed(
    spark: SparkSession,
    edges_ranked: DataFrame,
    n: int,
    n_edges: int,
    candidates: list[tuple[tuple[int, int], list[int]]],
    max_iter: int | None,
    selection: str,
) -> tuple[SmurfResult, list[int]]:
    """Greedy MDL search with the edge relation kept DISTRIBUTED end to
    end. Per iteration: ONE mapInPandas pass over the ranked edges emits
    per-candidate PARTIAL box-count vectors (each box count is additive
    over edge batches — `mdl.mdl_box_counts`), a groupBy sums them, and
    the driver evaluates the nonlinear MDL formula on O(candidates ×
    boxes) integers. Accepting a block rewrites the edge ranks with the
    same vectorized transform and localCheckpoints to keep the plan O(1).

    Driver state: the candidate list, the layout, and current ranks of
    candidate-involved nodes only — O(patterns), never O(E) or O(n).
    Returns the result plus the order at the FINAL accepted iteration
    (for residual-rank reconstruction when selection steps back)."""
    import pandas as pd

    # current ranks of every node any candidate touches (small lookup)
    involved = sorted(
        {x for (i, j), mids in candidates for x in (i, j, *mids)}
    )
    cur_rank: dict[int, int] = {x: x for x in involved}
    # ix space == initial rank space (residual = ascending node index)

    order: list[int] = []
    start = [0]
    count = [0, 0, 0]
    history = [initial_mdl(n, n_edges)]
    layouts = [([], [0], [0, 0, 0])]  # snapshot per accepted iteration
    it = 0
    cur_edges = edges_ranked.localCheckpoint()

    while True:
        prev_mdl = history[-1]
        placed = set(order)
        descs = _viable_candidates(candidates, placed, cur_rank, order, start, count)
        if not descs or (max_iter is not None and it > max_iter):
            break
        payload = [(ci, mr, mn, L, k, ns) for ci, mr, mn, L, k, ns, _, _ in descs]
        bcast = spark.sparkContext.broadcast((n, payload))

        def count_batches(batches):
            bn, bdescs = bcast.value
            for pdf in batches:
                ru = pdf["ru"].to_numpy()
                rv = pdf["rv"].to_numpy()
                cis, bis, cnts = [], [], []
                for ci, mranks, mnew, L, k, new_start in bdescs:
                    nru = _shift_ranks(ru, mranks, mnew, L, k)
                    nrv = _shift_ranks(rv, mranks, mnew, L, k)
                    vec = mdl_box_counts(nru, nrv, bn, new_start)
                    nz = np.nonzero(vec)[0]
                    cis.extend([ci] * len(nz))
                    bis.extend(int(b) for b in nz)
                    cnts.extend(int(vec[b]) for b in nz)
                yield pd.DataFrame({"ci": cis, "bi": bis, "cnt": cnts})

        totals = (
            cur_edges.mapInPandas(count_batches, "ci long, bi long, cnt long")
            .groupBy("ci", "bi")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        )
        bcast.unpersist()
        by_ci: dict[int, dict[int, int]] = {}
        for r in totals:
            by_ci.setdefault(r["ci"], {})[r["bi"]] = r["cnt"]

        best = None  # (score, desc, mdl) — FIRST argmax in candidate order
        for desc in descs:
            ci, _, _, _, _, new_start, new_count, _ = desc
            nboxes = 4 * (len(new_start) - 1) + 1
            vec = np.array(
                [by_ci.get(ci, {}).get(b, 0) for b in range(nboxes)], dtype=np.int64
            )
            mdl, purity = mdl_from_counts(vec, n, new_start, new_count)
            if mdl >= prev_mdl:
                continue
            score = ((prev_mdl - mdl) / prev_mdl) * purity
            if best is None or score > best[0]:
                best = (score, desc, mdl)
        if best is None:
            break

        _, (ci, mranks, mnew, L, k, new_start, new_count, suffix), mdl = best
        order = order + suffix
        start = new_start
        count = new_count
        history.append(mdl)
        layouts.append((list(order), list(start), list(count)))
        # maintain tracked node ranks with the same transform
        arr = np.array([cur_rank[x] for x in involved], dtype=np.int64)
        arr = _shift_ranks(arr, mranks, mnew, L, k)
        cur_rank = dict(zip(involved, (int(v) for v in arr)))
        # rewrite distributed edge ranks; checkpoint cuts the lineage so
        # the plan stays O(1) across iterations
        bxf = spark.sparkContext.broadcast((mranks, mnew, L, k))

        def shift_batches(batches):
            mr, mn, bl, bk = bxf.value
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "ru": _shift_ranks(pdf["ru"].to_numpy(), mr, mn, bl, bk),
                        "rv": _shift_ranks(pdf["rv"].to_numpy(), mr, mn, bl, bk),
                    }
                )

        nxt = cur_edges.mapInPandas(shift_batches, "ru long, rv long").localCheckpoint()
        cur_edges.unpersist()
        cur_edges = nxt
        it += 1

    final_order = list(order)
    # model selection — same rule as smurf_search (`AA-Smurf.py:162`)
    if selection == "final":
        sel = len(history) - 1
    else:
        sel = next(
            (idx - 1 for idx, m in enumerate(history) if m < history[-1] * 1.1),
            len(history) - 1,
        )
        if sel == -1:
            sel = len(history) - 1
    s_order, s_start, s_count = layouts[sel]
    res = SmurfResult(s_order, s_start, s_count, history[: sel + 1], n)
    res.selected_iter = sel
    cur_edges.unpersist()
    return res, final_order


#: above this many edges the driver never materializes the COO arrays —
#: scoring and rank maintenance run distributed (`_smurf_search_distributed`)
DISTRIBUTE_EDGE_THRESHOLD = 2_000_000


def _node_index(spark: SparkSession, adj: DataFrame, n_nodes: int | None):
    """(node, ix) with ix = rank by ascending node id — the reference's
    implicit node→matrix-index map. Matrix fixtures (n_nodes given) have
    identity indices; general graphs get zipWithIndex over the sorted
    universe (distributed — no driver collect)."""
    if n_nodes is not None:
        return spark.range(n_nodes).select(
            F.col("id").alias("node"), F.col("id").alias("ix")
        ), n_nodes
    nodes = (
        adj.select(F.col("src").alias("node"))
        .union(adj.select(F.col("dst")))
        .distinct()
    )
    rdd = nodes.orderBy("node").rdd.map(lambda r: r["node"]).zipWithIndex()
    df = spark.createDataFrame(rdd, "node long, ix long").persist()
    return df, df.count()


def _rank_relation(
    spark: SparkSession,
    nodes_ix: DataFrame,
    result: SmurfResult,
    n: int,
) -> DataFrame:
    """(node, rank, block_id) built DECLARATIVELY from the O(placed)
    layout: explicit order via a broadcast map, residual ranks via
    zipWithIndex over the remaining nodes in ascending index order (the
    exact `ranks_for_order` semantics), block ids via a when-chain over
    the ≤ max_iter block intervals."""
    order, start = result.order, result.start
    L = len(order)
    if L:
        placed_df = F.broadcast(
            spark.createDataFrame(
                [(int(ix), r) for r, ix in enumerate(order)], "ix long, rank long"
            )
        )
        placed = nodes_ix.join(placed_df, "ix").select("node", "rank")
        rest = nodes_ix.join(placed_df.select("ix"), "ix", "left_anti")
    else:
        placed = None
        rest = nodes_ix
    rest_rdd = (
        rest.orderBy("ix").rdd.map(lambda r: r["node"]).zipWithIndex()
        .map(lambda t: (t[0], t[1] + L))
    )
    rest_df = spark.createDataFrame(rest_rdd, "node long, rank long")
    ranked = rest_df if placed is None else placed.unionByName(rest_df)

    block_id = F.lit(-1).cast("long")
    for b in range(len(start) - 1, 0, -1):
        block_id = F.when(
            (F.col("rank") >= start[b - 1]) & (F.col("rank") < start[b]),
            F.lit(b - 1).cast("long"),
        ).otherwise(block_id)
    return ranked.select("node", "rank", block_id.alias("block_id"))


def smurf_pipeline(
    spark: SparkSession,
    adj: DataFrame,
    max_iter: int | None = 10,
    max_candidates: int | None = 200,
    selection: str = "reference",
    n_nodes: int | None = None,
    distribute: bool | None = None,
) -> tuple[SmurfResult, DataFrame]:
    """End-to-end AA-Smurf: Spark candidate joins → greedy MDL →
    (node, rank, block_id) DataFrame.

    n_nodes: total node count INCLUDING isolated nodes (matrix fixtures —
    MDL code lengths are ⌈log2 n⌉ of the full matrix size, and isolated
    nodes occupy residual ranks). Default: universe observed in edges.

    distribute: None = auto (edge count > DISTRIBUTE_EDGE_THRESHOLD).
    The distributed path computes bit-identical results with no O(E) or
    O(n) driver structure; the driver path collects the COO arrays and is
    faster at fixture scale (no per-iteration job overhead)."""
    adj = adj.persist()
    n_edges = adj.count()
    if distribute is None:
        distribute = n_edges > DISTRIBUTE_EDGE_THRESHOLD
    candidates = _candidate_list(adj, max_candidates)

    if distribute:
        nodes_ix, n = _node_index(spark, adj, n_nodes)
        # candidate node ids → indices via a small lookup (O(cands × k))
        involved = sorted({x for (i, j), mids in candidates for x in (i, j, *mids)})
        ix_map = {
            r["node"]: r["ix"]
            for r in nodes_ix.filter(F.col("node").isin(involved)).collect()
        }
        cands_ix = [
            ((ix_map[i], ix_map[j]), [ix_map[m] for m in mids])
            for (i, j), mids in candidates
        ]
        if n_nodes is not None:
            edges_ranked = adj.select(
                F.col("src").alias("ru"), F.col("dst").alias("rv")
            )
        else:
            src_ix = nodes_ix.select(
                F.col("node").alias("src"), F.col("ix").alias("ru")
            )
            dst_ix = nodes_ix.select(
                F.col("node").alias("dst"), F.col("ix").alias("rv")
            )
            edges_ranked = adj.join(src_ix, "src").join(dst_ix, "dst").select("ru", "rv")
        result, _ = _smurf_search_distributed(
            spark, edges_ranked, n, n_edges, cands_ix, max_iter, selection
        )
        rank_df = _rank_relation(spark, nodes_ix, result, n)
        adj.unpersist()
        return result, rank_df

    # fixture-scale driver path: collect COO + node universe. The
    # node→ix map is just the ascending-id order, so ONE ordered collect
    # of the universe replaces _node_index's zipWithIndex + persist +
    # count + re-collect job chain (r18 — measured ~0.6 s of pure job
    # overhead per run at sf0.1; the distributed branch above still
    # builds the relation form it joins with)
    if n_nodes is not None:
        node_ids: list[int] = list(range(n_nodes))
        n = n_nodes
    else:
        node_ids = [
            r["node"]
            for r in (
                adj.select(F.col("src").alias("node"))
                .union(adj.select(F.col("dst")))
                .distinct()
                .orderBy("node")
                .collect()
            )
        ]
        n = len(node_ids)
    id_to_ix = {v: i for i, v in enumerate(node_ids)}
    pdf = adj.toPandas()
    adj.unpersist()
    ru = np.array([id_to_ix[v] for v in pdf["src"]], dtype=np.int64)
    rv = np.array([id_to_ix[v] for v in pdf["dst"]], dtype=np.int64)
    cands_ix = [
        ((id_to_ix[i], id_to_ix[j]), [id_to_ix[m] for m in mids])
        for (i, j), mids in candidates
    ]
    result = smurf_search(ru, rv, n, cands_ix, max_iter=max_iter, selection=selection)
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
