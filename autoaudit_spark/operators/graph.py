"""Graph operators — the joins-in-disguise at the heart of AA-Smurf.

The reference does sparse matrix algebra on a dense adjacency
(`AA-Smurf.py:102-111` — A·A two-hop product, nonzero iteration, threshold,
sort). Spark-first, every one of these is an equi-join + hash aggregate over
the sparse edge relation: only existing edges shuffle, Catalyst picks
broadcast vs sort-merge, AQE rebalances skew. Nothing materializes N×N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import EDGES_SQL, adjacency

#: candidate pruning constant c — pairs need >= 3 two-hop paths
#: (`AA-Smurf.py:107-109`).
MIN_PATHS = 3

_ADJ_CTE = f"WITH edges AS ({EDGES_SQL}), adj AS (SELECT DISTINCT src, dst FROM edges)"

#: canonical undirected simple graph: self-loops dropped, endpoints
#: ordered a<b, duplicates collapsed — the ONE derivation every
#: undirected operator (triangles, clustering, assortativity, Jaccard,
#: LPA, k-core's strong-tie variant) must agree on. Shared here so a
#: canonicalization change cannot silently desynchronize one oracle.
_UND_SQL = """und AS (
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM adj WHERE src <> dst
    )"""


def undirected_simple(adj: DataFrame) -> DataFrame:
    """(a, b) with a < b — the Spark twin of `_UND_SQL`."""
    return (
        adj.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )


def two_hop_counts(adj: DataFrame, min_paths: int = MIN_PATHS) -> DataFrame:
    """Smurf-candidate generation: for every (i, j), the number of directed
    length-2 paths i→m→j, thresholded and sorted desc.

    Spark form of `sparse.csr_matrix(ajm) * sparse.csr_matrix(ajm)` +
    nonzero/threshold/sort (`AA-Smurf.py:105-110`): self equi-join on the
    middle key + hash aggregate. One shuffle; scales as O(paths), not O(N²).
    """
    # fanout_pin: path fan-out is Σ_m indeg(m)·outdeg(m) from a
    # small-by-bytes adjacency (see fanout_pin's rationale)
    a, b = fanout_pin(adj, "dst").alias("a"), adj.alias("b")
    return (
        a.join(b, F.col("a.dst") == F.col("b.src"))
        .groupBy(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        .agg(F.count("*").alias("path_cnt"))
        .filter(F.col("path_cnt") >= min_paths)
        .orderBy(F.col("path_cnt").desc(), "src", "dst")
    )


def two_hop_intermediaries(adj: DataFrame, min_paths: int = MIN_PATHS) -> DataFrame:
    """Intermediary extraction (`AA-Smurf.py:103,109`): the middle nodes m
    of each candidate pair, exploded to (src, dst, mid) rows so the DuckDB
    oracle can value-hash it (array results are only rows-checkable)."""
    a, b = fanout_pin(adj, "dst").alias("a"), adj.alias("b")
    paths = a.join(b, F.col("a.dst") == F.col("b.src")).select(
        F.col("a.src").alias("src"),
        F.col("b.dst").alias("dst"),
        F.col("a.dst").alias("mid"),
    )
    cnt = (
        paths.groupBy("src", "dst")
        .agg(F.count("*").alias("path_cnt"))
        .filter(F.col("path_cnt") >= min_paths)
    )
    return (
        paths.join(cnt, ["src", "dst"])
        .select("src", "dst", "mid")
        .distinct()
        .orderBy("src", "dst", "mid")
    )


def fanout_pin(df: DataFrame, *cols: str) -> DataFrame:
    """Explicit-N repartition on a fan-out join's key (r17): the wedge /
    path self-joins do quadratic-in-degree reduce work from inputs that
    are tiny BY BYTES, so AQE's byte-based partition coalescing would
    run the whole expansion in 1-2 tasks (measured: account_succession
    2.9 → 11.6 s at sf0.1 when its wedge join coalesced). A
    user-specified numPartitions (REPARTITION_BY_NUM) is exempt from
    AQE coalescing, so pinning ONE side of the join holds the whole
    join stage at cluster parallelism — while every byte-dominated
    shuffle in the session still coalesces adaptively. At real scale
    the inputs exceed the advisory partition size and the pin changes
    nothing (the join would run wide anyway)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism, *cols)


def node_universe(edges_df: DataFrame) -> DataFrame:
    """Account universe = distinct over the union of both endpoint columns
    (`AA-AR.py:40,98`; `AA-Smurf.py:38`) — A8/U2."""
    return (
        edges_df.select(F.col("src").alias("node"))
        .union(edges_df.select(F.col("dst").alias("node")))
        .distinct()
    )


#: rank maps at or below this row count get an explicit broadcast hint in
#: `relabel`; above it the hint is dropped and AQE picks the strategy (a
#: node-universe-sized forced broadcast OOMs executors at 10⁹ nodes).
RELABEL_BROADCAST_LIMIT = 10_000_000

#: range partitions for the distributed rank build in `q_relabel_reorder`
#: — one row-number window per partition; the prefix-offset relation is
#: this many rows. Size ~cluster parallelism at scale.
RANK_PARTITIONS = 32


def relabel(
    edges_df: DataFrame, rank_map: DataFrame, hint_broadcast: bool | None = None
) -> DataFrame:
    """Matrix reorder `ajm[np.ix_(order, order)]` (`AA-Smurf.py:59,165`) as
    two joins against the (node, rank) permutation table — J5. The
    broadcast hint is GATED by the map's size (r4-verdict fix): callers
    that know the map's row count pass `hint_broadcast` explicitly
    (≤ RELABEL_BROADCAST_LIMIT → hint; larger maps shuffle-join — a
    node-universe-sized forced broadcast OOMs executors at 10⁹ nodes).
    The default None stays LAZY (ADVICE r5: the old eager
    `rank_map.count()` here ran a full Spark job during plan
    construction, even for plan-only callers) and leaves the strategy to
    AQE, whose runtime shuffle stats auto-broadcast small maps."""
    rm = F.broadcast(rank_map) if hint_broadcast else rank_map
    return (
        edges_df.join(rm.withColumnRenamed("node", "src").withColumnRenamed("rank", "src_rank"), "src")
        .join(rm.withColumnRenamed("node", "dst").withColumnRenamed("rank", "dst_rank"), "dst")
        .select(F.col("src_rank").alias("src"), F.col("dst_rank").alias("dst"))
    )


@query(
    "two_hop_candidates",
    oracle=f"""
    {_ADJ_CTE}
    SELECT a.src AS src, b.dst AS dst, COUNT(*) AS path_cnt
    FROM adj a JOIN adj b ON a.dst = b.src
    GROUP BY a.src, b.dst
    HAVING COUNT(*) >= {MIN_PATHS}
    ORDER BY path_cnt DESC, src, dst
    """,
)
def q_two_hop_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: J1+P6+O1 (`AA-Smurf.py:102-111`)."""
    return two_hop_counts(adjacency(spark, sf_dir))


def two_hop_counts_salted(
    adj: DataFrame, min_paths: int = MIN_PATHS, salt_buckets: int = 8
) -> DataFrame:
    """Skew-hardened two-hop counting (round-2 verdict, stretch #8): a
    power-law graph's hub nodes make the middle key of the self-join hot —
    AQE's skew-join splitting handles moderate skew at runtime, but this
    is the explicit salting form for hubs beyond what AQE splits.

    The edges INTO each mid (side a) scatter over `salt_buckets` synthetic
    sub-keys — salt = hash(src, dst) pmod buckets, deterministic per row —
    while the edges OUT OF each mid (side b) replicate across all buckets
    (explode of a literal sequence: b is the smaller per-mid side for an
    in-hub). The join key becomes (mid, salt): a hub's reduce work spreads
    over `salt_buckets` tasks at the cost of replicating side b ×buckets.
    Path counts are unchanged — every (a-edge, b-edge) pair still meets
    exactly once, in exactly one bucket."""
    a = fanout_pin(
        adj.select(
            F.col("src"),
            F.col("dst").alias("mid"),
            F.pmod(F.hash("src", "dst"), F.lit(salt_buckets)).alias("salt"),
        ),
        "mid",
        "salt",
    )
    b = adj.select(
        F.col("src").alias("mid"),
        F.col("dst"),
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("salt"),
    )
    return (
        a.join(b, ["mid", "salt"])
        .groupBy("src", "dst")
        .agg(F.count("*").alias("path_cnt"))
        .filter(F.col("path_cnt") >= min_paths)
        .orderBy(F.col("path_cnt").desc(), "src", "dst")
    )


@query(
    "two_hop_salted",
    oracle=f"""
    {_ADJ_CTE}
    SELECT a.src AS src, b.dst AS dst, COUNT(*) AS path_cnt
    FROM adj a JOIN adj b ON a.dst = b.src
    GROUP BY a.src, b.dst
    HAVING COUNT(*) >= {MIN_PATHS}
    ORDER BY path_cnt DESC, src, dst
    """,
)
def q_two_hop_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 under explicit hub-key salting — same oracle as the flagship
    (the salted plan must be bit-identical in results)."""
    return two_hop_counts_salted(adjacency(spark, sf_dir))


@query(
    "two_hop_intermediaries",
    oracle=f"""
    {_ADJ_CTE},
    paths AS (
        SELECT a.src AS src, b.dst AS dst, a.dst AS mid
        FROM adj a JOIN adj b ON a.dst = b.src
    ),
    cand AS (
        SELECT src, dst FROM paths GROUP BY src, dst HAVING COUNT(*) >= {MIN_PATHS}
    )
    SELECT DISTINCT p.src, p.dst, p.mid
    FROM paths p JOIN cand c ON p.src = c.src AND p.dst = c.dst
    ORDER BY 1, 2, 3
    """,
)
def q_two_hop_intermediaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 exploded to rows (`AA-Smurf.py:103,109`)."""
    return two_hop_intermediaries(adjacency(spark, sf_dir))


@query(
    "node_universe",
    oracle=f"""
    WITH edges AS ({EDGES_SQL})
    SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
    ) ORDER BY node
    """,
)
def q_node_universe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/U2: id universe over both endpoint columns."""
    from ..sources import edges as edges_src

    return node_universe(edges_src(spark, sf_dir)).orderBy("node")


@query(
    "relabel_reorder",
    oracle=f"""
    {_ADJ_CTE},
    nodes AS (
        SELECT DISTINCT node FROM (SELECT src AS node FROM adj UNION ALL SELECT dst FROM adj)
    ),
    rank_map AS (
        SELECT node, ROW_NUMBER() OVER (ORDER BY node) - 1 AS rank FROM nodes
    )
    SELECT r1.rank AS src, r2.rank AS dst
    FROM adj e JOIN rank_map r1 ON e.src = r1.node JOIN rank_map r2 ON e.dst = r2.node
    ORDER BY src, dst
    """,
)
def q_relabel_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: permutation relabeling via size-gated rank-map joins
    (`AA-Smurf.py:59,165`). Rank here = sorted-node order (deterministic
    stand-in for the MDL-derived order, which is tested separately).

    The rank build is DISTRIBUTED (r4-verdict fix — no global
    `row_number` window over the node universe): range-partition by
    node, rank WITHIN each range partition in parallel, then offset
    each partition by the count of all earlier partitions via a
    broadcast prefix relation (the `sequence_packing` decomposition,
    all-JVM — equivalent to RDD `zipWithIndex` without the Python
    round-trip). (pid, node) order equals global node order, so the
    result is exactly the sorted rank. The node UNIVERSE is
    localCheckpoint-ed (one distinct-aggregate job over the edge scan);
    everything downstream — range sampling, the per-partition windows,
    the size gate's count, both relabel joins — replays only the
    node-sized checkpoint, never the edge scan. This caller KNOWS the
    map size (the checkpointed universe's count, a cheap checkpoint
    replay — construction is already eager via localCheckpoint) and
    passes the broadcast gate explicitly, keeping `relabel` itself lazy
    (ADVICE r5)."""
    from pyspark.sql.window import Window

    adj = adjacency(spark, sf_dir)
    nodes = node_universe(adj).localCheckpoint()
    n_nodes = nodes.count()
    parts = nodes.repartitionByRange(RANK_PARTITIONS, "node").withColumn(
        "pid", F.spark_partition_id()
    )
    inner = Window.partitionBy("pid").orderBy("node")
    counts = parts.groupBy("pid").agg(F.count("*").alias("n"))
    prefix_w = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    prefix = counts.select(
        "pid",
        F.coalesce(F.sum("n").over(prefix_w), F.lit(0)).cast("long").alias("off"),
    )
    rank_map = (
        parts.withColumn("lr", F.row_number().over(inner).cast("long") - 1)
        .join(F.broadcast(prefix), "pid")
        .select("node", (F.col("off") + F.col("lr")).alias("rank"))
    )
    return relabel(
        adj, rank_map, hint_broadcast=n_nodes <= RELABEL_BROADCAST_LIMIT
    ).orderBy("src", "dst")


# ---------------------------------------------------------------------------
# Graph analytics beyond the reference (north-star "GraphX analytics"
# breadth): connected components + PageRank as iterative DataFrame joins —
# the 100 TB-shaped formulation (hash-min label propagation / power
# iteration), no vertex-centric runtime needed.
# ---------------------------------------------------------------------------
def connected_components(adj: DataFrame, max_iter: int = 50) -> DataFrame:
    """Hash-min label propagation on the UNDIRECTED view: every node
    starts labeled with its own id; each round takes the min of its own
    and its neighbors' labels; converges in O(diameter) rounds. Each round
    is one join + one aggregate — the standard scalable CC formulation.
    Deterministic → exactly oracle-checkable (recursive CTE).

    `max_iter` is a SAFETY BOUND, not a truncation: if the fixpoint is
    not reached within it (diameter > max_iter — e.g. a duplicate CHAIN
    in `dedup_components`' pair graph), the function raises rather than
    silently returning non-converged labels that would diverge from the
    closure oracle and mis-split clusters (review r7). Graphs that
    legitimately exceed it want the pointer-doubling (large-star/
    small-star) formulation, which converges in O(log diameter).

    Emits a `rounds_used` column (r7 verdict #3 — the X62-residual
    pattern applied to the CC family): the number of hash-min rounds
    executed INCLUDING the final round that proved the fixpoint
    (changed == 0). The counter is the driver loop index carried as a
    literal — zero extra shuffles. Observability contract: a user
    comparing the three CC variants reads identical (node, component)
    labelings and DIFFERENT rounds_used (O(d) here vs O(log d) for the
    jump/two-star forms) — the convergence behavior is now data, not a
    log line."""
    und = (
        adj.select("src", "dst")
        .union(adj.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    rounds_used = 0
    for r in range(1, max_iter + 1):
        neigh = (
            und.join(labels, und.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias("label"),
            )
            # lazy lineage truncation (r17): the changed-probe count
            # below is the materializing action — one job per round
            # instead of checkpoint + probe; labels still appears twice
            # per round and both consumers read the cached blocks
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            rounds_used = r
            break
    else:
        und.unpersist()
        raise ValueError(
            f"connected_components did not converge in {max_iter} hash-min "
            "rounds (graph diameter exceeds the bound) — raise max_iter or "
            "use a pointer-doubling formulation for chain-like graphs"
        )
    und.unpersist()
    return labels.select(
        "node",
        F.col("label").alias("component"),
        F.lit(rounds_used).cast("int").alias("rounds_used"),
    )


# --- CC oracles: closure labels + per-variant round simulation ---------
#
# The component LABELS are checked against an algorithm-independent
# recursive-closure computation (min reachable node id) — a shared
# algorithmic bug in Spark and a mirrored SQL simulation could not slip
# past it. The `rounds_used` convergence column (r8: verdict #3) is the
# one thing closure cannot know — it is ALGORITHM-specific — so each
# variant's oracle additionally unrolls its own round recurrence
# (the k_truss/HITS materialized-CTE precedent) just far enough to find
# the first no-change round, and takes ONLY the round count from it.
# If the true fixpoint exceeds the unroll, MIN(r) over the no-change
# flags is NULL and the driver comparison fails loudly (same contract
# as the Spark-side max_iter raise). Unroll depths are measured
# fixpoints at sf0.001/0.01/0.1 plus margin (see the constants).

_CC_CLOSURE_PARTS = f"""edges AS ({EDGES_SQL}),
    adj AS (SELECT DISTINCT src, dst FROM edges),
    und AS (SELECT src AS a, dst AS b FROM adj
            UNION SELECT dst, src FROM adj),
    nodes AS (SELECT DISTINCT a AS node FROM und),
    reach AS (
        SELECT node, node AS label FROM nodes
        UNION
        SELECT u.b AS node, r.label
        FROM reach r JOIN und u ON u.a = r.node
    ),
    comp AS (
        SELECT node, MIN(label) AS component
        FROM reach GROUP BY node
    )"""

_CC_FINAL_SQL = """
    SELECT c.node, c.component,
           CAST((SELECT MIN(r) FROM simchg WHERE NOT ch) AS INTEGER)
               AS rounds_used
    FROM comp c ORDER BY node
    """

#: unrolled-simulation depths for the three CC oracles — measured
#: fixpoints on the derived events adjacency: hash-min 4/3/3, jump
#: 4/3/3, two-star 3/2/2 at sf0.001/0.01/0.1 (one dense component,
#: tiny diameter — rounds SHRINK as density grows); the 2x+ margin
#: covers SF drift, and an exceeded unroll fails loudly (NULL rounds)
CC_HASHMIN_UNROLL = 10
CC_JUMP_UNROLL = 8
CC_TWOSTAR_UNROLL = 8


def _cc_chg_union(rounds: int) -> str:
    return "simchg AS (" + " UNION ALL ".join(
        f"SELECT * FROM c{r}" for r in range(1, rounds + 1)
    ) + ")"


def _cc_hashmin_sql(rounds: int = CC_HASHMIN_UNROLL) -> str:
    """Closure labels + an unrolled hash-min simulation (one neighbor-min
    aggregate + one LEAST per round, all-integer → exact) for rounds_used."""
    parts = [_CC_CLOSURE_PARTS,
             "sl0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)"]
    for r in range(1, rounds + 1):
        parts.append(
            f"""n{r} AS (
            SELECT u.b AS node, MIN(l.label) AS nlabel
            FROM und u JOIN sl{r - 1} l ON l.node = u.a GROUP BY u.b)"""
        )
        parts.append(
            f"""sl{r} AS MATERIALIZED (
            SELECT l.node,
                   LEAST(l.label, COALESCE(n.nlabel, l.label)) AS label
            FROM sl{r - 1} l LEFT JOIN n{r} n USING (node))"""
        )
        parts.append(
            f"""c{r} AS (SELECT {r} AS r, EXISTS (
            SELECT 1 FROM sl{r} a JOIN sl{r - 1} b USING (node)
            WHERE a.label <> b.label) AS ch)"""
        )
    parts.append(_cc_chg_union(rounds))
    return "WITH RECURSIVE " + ",\n    ".join(parts) + _CC_FINAL_SQL


def _cc_jump_sql(rounds: int = CC_JUMP_UNROLL) -> str:
    """Closure labels + the pointer-jumping recurrence
    l(v) <- least(l(v), min neighbor label, l(l(v))) unrolled."""
    parts = [_CC_CLOSURE_PARTS,
             "sl0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)"]
    for r in range(1, rounds + 1):
        parts.append(
            f"""n{r} AS (
            SELECT u.b AS node, MIN(l.label) AS nlabel
            FROM und u JOIN sl{r - 1} l ON l.node = u.a GROUP BY u.b)"""
        )
        parts.append(
            f"""sl{r} AS MATERIALIZED (
            SELECT l.node,
                   LEAST(l.label,
                         COALESCE(n.nlabel, l.label),
                         COALESCE(j.label, l.label)) AS label
            FROM sl{r - 1} l
            LEFT JOIN n{r} n USING (node)
            LEFT JOIN sl{r - 1} j ON j.node = l.label)"""
        )
        parts.append(
            f"""c{r} AS (SELECT {r} AS r, EXISTS (
            SELECT 1 FROM sl{r} a JOIN sl{r - 1} b USING (node)
            WHERE a.label <> b.label) AS ch)"""
        )
    parts.append(_cc_chg_union(rounds))
    return "WITH RECURSIVE " + ",\n    ".join(parts) + _CC_FINAL_SQL


def _cc_twostar_sql(rounds: int = CC_TWOSTAR_UNROLL) -> str:
    """Closure labels + the alternating large-star/small-star edge
    rewrite unrolled; a round's change flag is set-inequality of the
    edge relation before and after (two EXCEPT probes, mirroring the
    Spark side's exceptAll pair on distinct relations)."""
    parts = [
        _CC_CLOSURE_PARTS,
        """ts0 AS MATERIALIZED (
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM adj WHERE src <> dst)""",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"""nb{r} AS (
            SELECT a AS u, b AS v FROM ts{p}
            UNION ALL SELECT b, a FROM ts{p})"""
        )
        parts.append(
            f"""bg{r} AS (
            SELECT u, LEAST(u, MIN(v)) AS m FROM nb{r} GROUP BY u)"""
        )
        parts.append(
            f"""el{r} AS MATERIALIZED (
            SELECT DISTINCT g.m AS a, n.v AS b
            FROM nb{r} n JOIN bg{r} g USING (u) WHERE n.v > n.u)"""
        )
        parts.append(
            f"""sm{r} AS (
            SELECT u, MIN(v) AS m
            FROM (SELECT b AS u, a AS v FROM el{r}) GROUP BY u)"""
        )
        parts.append(
            f"""ts{r} AS MATERIALIZED (
            SELECT DISTINCT a, b FROM (
                SELECT s.m AS a, d.v AS b
                FROM (SELECT b AS u, a AS v FROM el{r}) d
                JOIN sm{r} s USING (u) WHERE s.m <> d.v
                UNION ALL
                SELECT m AS a, u AS b FROM sm{r}))"""
        )
        parts.append(
            f"""c{r} AS (SELECT {r} AS r,
            EXISTS (SELECT a, b FROM ts{r} EXCEPT SELECT a, b FROM ts{p})
            OR EXISTS (SELECT a, b FROM ts{p} EXCEPT SELECT a, b FROM ts{r})
                AS ch)"""
        )
    parts.append(_cc_chg_union(rounds))
    return "WITH RECURSIVE " + ",\n    ".join(parts) + _CC_FINAL_SQL


@query("connected_components", oracle=_cc_hashmin_sql())
def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CC on the derived adjacency; the oracle checks labels against an
    algorithm-independent recursive closure (min reachable id) and
    `rounds_used` against an unrolled hash-min simulation (r8: the
    convergence column — see the oracle-block comment above)."""
    return connected_components(adjacency(spark, sf_dir)).orderBy("node")


def connected_components_jump(adj: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components with POINTER JUMPING (X66, r7): hash-min
    label propagation plus a per-round shortcut l(v) ← l(l(v)) — the
    Shiloach–Vishkin/large-star idea expressed as one extra self-join.
    The neighbor step moves a min label one hop; the jump step then
    doubles the distance already covered, so a chain of diameter d
    converges in O(log d) rounds where plain hash-min needs d (measured
    in tests: a 200-node path converges in 10 rounds vs 199). This is
    the form that survives chain-shaped graphs at 10⁹ nodes — exactly
    the failure mode `connected_components`' convergence guard raises
    on.

    Invariants (why the result equals the closure oracle): labels only
    decrease; every candidate label (own, neighbor's, label-of-label)
    belongs to the same component; at a fixpoint all neighbors share a
    label, so each component is uniformly labeled, and the component's
    minimum node id m keeps l(m) = m (no smaller in-component candidate
    exists). Per round: one neighbor join + one self-join + one
    aggregate, all keyed on node/label — localCheckpoint truncates the
    iterative lineage (pagerank discipline)."""
    und = (
        adj.select("src", "dst")
        .union(adj.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    rounds_used = 0
    for r in range(1, max_iter + 1):
        neigh = (
            und.join(labels, und.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        # pointer jump: the label of my label
        jump = labels.select(
            F.col("node").alias("label"), F.col("label").alias("jlabel")
        )
        new_labels = (
            labels.join(neigh, "node", "left")
            .join(jump, "label", "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce("nlabel", F.col("label")),
                    F.coalesce("jlabel", F.col("label")),
                ).alias("label"),
            )
            # lazy: materialized by the changed-probe count (r17)
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            rounds_used = r
            break
    else:
        und.unpersist()
        raise ValueError(
            f"connected_components_jump did not converge in {max_iter} "
            "rounds — diameter above 2^max_iter is not a real graph"
        )
    und.unpersist()
    return labels.select(
        "node",
        F.col("label").alias("component"),
        F.lit(rounds_used).cast("int").alias("rounds_used"),
    )


@query("connected_components_jump", oracle=_cc_jump_sql())
def q_connected_components_jump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X66: the pointer-jumping CC twin — labels under the SAME closure
    check as `connected_components` (results must be identical), and its
    OWN unrolled round simulation for `rounds_used`, which is where the
    variants differ (O(log d) vs O(d)). The chain-graph scale path."""
    return connected_components_jump(adjacency(spark, sf_dir)).orderBy("node")


def connected_components_twostar(
    adj: DataFrame, max_iter: int = 30
) -> DataFrame:
    """Connected components via ALTERNATING LARGE-STAR / SMALL-STAR
    (X69, r7) — the edge-rewriting formulation (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) that
    complements the label-table variants already here: instead of
    iterating a (node, label) state against a STATIC edge set
    (`connected_components`, `connected_components_jump`), each round
    REWRITES the edge set itself until it is a union of stars centered
    at component minima.

      large-star(u): with m = min(Γ(u) ∪ {u}), reconnect every strictly
        LARGER neighbor v > u to m — emitted pairs (m, v) keep m < v, so
        the canonical a<b form is free.
      small-star(u): over edges directed to their larger endpoint
        (u ← its smaller neighbors), reconnect every smaller neighbor
        and u itself to m = min(Γ⁻(u)).

    Both steps preserve the component partition (every emitted edge
    connects nodes already connected through u) and monotonically shrink
    a potential (Σ over edges of the larger endpoint's height), so the
    alternation converges — in O(log² n) rounds worst-case, a handful in
    practice — to exactly the star set {(min_c, v): v ∈ c}. At 100 TB
    scale this shape has a property the label-table forms lack: the
    working relation SHRINKS every round (toward one edge per non-min
    node), whereas label tables stay node-sized for every round; each
    round is two groupBy-min aggregates + two equi-joins on the current
    edge set, and the convergence probe is a pair of anti-joins.

    The fixpoint is verified structurally (edge set unchanged over a full
    round); non-convergence within `max_iter` raises loudly (same
    contract as the sibling variants)."""
    all_nodes = (
        adj.select(F.col("src").alias("node"))
        .union(adj.select(F.col("dst")))
        .distinct()
        .persist()
    )
    e = undirected_simple(adj).persist()
    rounds_used = 0
    for r in range(1, max_iter + 1):
        # large-star: full neighborhoods (both directions)
        nbr = e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        big_m = nbr.groupBy("u").agg(
            F.min("v").alias("mv")
        ).select("u", F.least("u", "mv").alias("m"))
        e_large = (
            nbr.join(big_m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("m").alias("a"), F.col("v").alias("b"))
            .distinct()
            .localCheckpoint()
        )
        # small-star: edges keyed at their LARGER endpoint (b > a by
        # canonical form), so every neighbor v is < u and m = min(v)
        dirr = e_large.select(F.col("b").alias("u"), F.col("a").alias("v"))
        small_m = dirr.groupBy("u").agg(F.min("v").alias("m"))
        e_small = (
            dirr.join(small_m, "u")
            .select(F.col("m").alias("a"), F.col("v").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .union(
                small_m.select(F.col("m").alias("a"), F.col("u").alias("b"))
            )
            .distinct()
            # lazy: materialized by the convergence exceptAll probes
            # (r17); e_large above stays EAGER — its first consumer at
            # scale can be a broadcast build (small_m), and a broadcast
            # build must never carry a half-round's shuffle work
            # (guide §3.1 broadcast-timeout signature)
            .localCheckpoint(eager=False)
        )
        converged = (
            e_small.exceptAll(e).isEmpty() and e.exceptAll(e_small).isEmpty()
        )
        e.unpersist()
        e = e_small
        if converged:
            rounds_used = r
            break
    else:
        all_nodes.unpersist()
        raise ValueError(
            f"connected_components_twostar did not converge in {max_iter} "
            "alternating rounds — raise max_iter"
        )
    # star set → labels: non-center nodes appear exactly once as b with
    # their center as a; centers and isolated/self-loop-only nodes label
    # themselves via the coalesce
    labels = all_nodes.join(
        e.select(F.col("b").alias("node"), F.col("a").alias("comp")),
        "node",
        "left",
    ).select(
        "node",
        F.coalesce("comp", F.col("node")).alias("component"),
        F.lit(rounds_used).cast("int").alias("rounds_used"),
    )
    all_nodes.unpersist()
    return labels


@query("connected_components_twostar", oracle=_cc_twostar_sql())
def q_connected_components_twostar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X69: the edge-rewriting (large-star/small-star) CC — labels under
    the SAME closure check as the sibling variants (all three must
    produce identical labelings), `rounds_used` under its own unrolled
    alternating-round simulation; the variants differ only in round
    count and per-round relation size."""
    return connected_components_twostar(adjacency(spark, sf_dir)).orderBy("node")


#: bounded BFS depth for harmonic centrality — 3 hops is the audit
#: horizon the flagship's two-hop product implies (one hop beyond the
#: smurf pattern); ALSO the scale governor: on small-world graphs the
#: d-hop ball approaches the whole graph fast, so the depth cap — not
#: sampling — is what keeps the pair relation at Σ|ball_d(v)| instead
#: of N². Raising it is a conscious cost decision, not a default.
HARMONIC_DEPTH = 3


def harmonic_centrality(adj: DataFrame, depth: int = HARMONIC_DEPTH) -> DataFrame:
    """Bounded-depth harmonic centrality (X81, r8 — verdict #4):
    H_D(v) = Σ_{u≠v, dist(u,v)≤D} 1/dist(u,v) on the undirected simple
    graph — "which accounts sit near everything". The reference's
    candidate ordering (`AA-Smurf.py:105-110`, two-hop path counts) is a
    crude proxy for exactly this reach notion; harmonic centrality is
    the principled version (Boldi & Vigna, "Axioms for Centrality",
    2014 — handles disconnected graphs where closeness breaks).

    Implementation is the CC family's frontier kernel run for D rounds
    with an explicit visited set: per round, frontier ⋈ neighbor
    relation → distinct candidate pairs → anti-join against seen pairs
    = the exact distance-d shell; each shell is reduced IMMEDIATELY to
    per-source counts (n_d), so nothing distance-annotated accumulates
    beyond the (src, node) seen set. localCheckpoint truncates the
    per-round lineage (pagerank discipline).

    Exactness: the shell counts are BIGINT-exact; the harmonic score is
    a PINNED left-associated IEEE chain n1/1.0 + n2/2.0 + ... + nD/D.0
    — each term one correctly-rounded double division of an exact
    integer, summed in a fixed order mirrored token-for-token by the
    oracle, so the all-float output stays hash-exact cross-engine (the
    X73/X80 discipline; no ROUND anywhere).

    100 TB posture: every join is an equi-join on a node id or a
    (src, node) pair key; the frontier/seen relations are bounded by
    Σ|ball_D(v)| (the depth cap's job); no driver-side state beyond the
    D-step loop; counts fold map-side before the final node-keyed
    assembly.

    Skew shape (r8 probe-or-cite discipline): the expansion join keys
    frontier rows on the node being expanded, and a hub's task load is
    (frontier rows at the hub) x deg(hub). Round 1 is linear in degree
    (one self-pair per key), but from round 2 on the frontier rows at a
    hub are themselves ~deg(hub), so the hot key is QUADRATIC — the
    distance-2-through-a-hub set IS the wedge set, making this exactly
    the wedge-family shape whose hub behavior is already measured
    (BASELINE.md r6 wedge probe: 1.98M wedge pairs on one deg-1408 key;
    r7 butterfly table) — and MEASURED for this operator directly: the
    r8 harmonic probe (`tools/skewprobe.py ... harmonic`) plants an
    all-nodes hub (deg 1500, 2.25M deg² pairs on one key, hot/median
    2.37x) and the end-to-end kernel still lands inside its unskewed
    noise band at 15.1 s under default AQE (BASELINE.md r8 table).
    Mitigations transfer unchanged: AQE's
    skew-join split (on by default), and if a deployment needs
    deterministic balance, the wedge salting — scatter frontier rows by
    hash(s) pmod k onto key (c, salt), replicate the neighbor side xk.
    The depth cap bounds the number of such rounds."""
    if depth < 1:
        raise ValueError("harmonic_centrality needs depth >= 1")
    und = undirected_simple(adj)
    nbr = (
        und.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .union(und.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .persist()
    )
    nodes = node_universe(adj).persist()
    n_nodes = nodes.count()
    frontier = nodes.select(
        F.col("node").alias("s"), F.col("node").alias("c")
    ).localCheckpoint()
    seen = frontier
    # Ball-size ledger for the all-complete early exit below: the
    # checkpointed shells are materialized, so their counts are cheap
    # block scans (~0.15 s each), not recomputation. NOTE (r18, measured
    # rejections): two structural rewrites of this loop were implemented,
    # verified bit-identical, and REVERTED on interleaved A/B evidence —
    # (a) replacing round 1 with a direct copy of `nbr` (the d=1 shell
    # equals the neighbor relation) regressed 6.3 → 9.5 s because the
    # copy's checkpoint partitioning (64 cache partitions vs the distinct
    # exchange's AQE-coalesced 1) bloated every downstream stage, and
    # because feeding the copy made Catalyst push the anti-join BELOW the
    # round-2 distinct (53M raw-row anti probes instead of 2.25M —
    # 172 s vs 39 s of stage CPU); (b) fusing distinct + anti-join into
    # one flagged sided-union aggregation measured parity at best once
    # (a) was fixed. The r17 shape stays; only the ledger exit is new.
    ball_total = n_nodes
    # fanout_pin (r17): round 1's frontier is the node list — tiny by
    # bytes — and the expansion join fans out quadratically at hubs, so
    # AQE byte-based coalescing serializes the whole ball expansion
    # (measured 9.3 s pinned vs 29.3 s unpinned at sf0.1).
    shell_counts: list[DataFrame] = []
    for d in range(1, depth + 1):
        cand = (
            fanout_pin(frontier, "c")
            .join(nbr, frontier.c == nbr.u)
            .select("s", F.col("v").alias("c"))
            .distinct()
        )
        shell = cand.join(seen, ["s", "c"], "left_anti").localCheckpoint()
        shell_counts.append(
            shell.groupBy("s").agg(F.count("*").alias(f"n{d}"))
        )
        seen = seen.union(shell)
        frontier = shell
        ball_total += shell.count()
        # All-complete early exit (r18): Σ_s |ball(s)| == N² means every
        # source's ball already covers every node — every later shell is
        # empty by construction, so the remaining rounds would only pay
        # expansion/anti-join/checkpoint machinery to materialize empty
        # relations (measured 1.15 s for the empty round 3 at sf0.1,
        # where the distance-2 ball is the whole graph). The per-source
        # prune below covers the partial case; this covers the total one.
        if ball_total >= n_nodes * n_nodes:
            break
        if d < depth:
            # Active-source prune (r17, guide §2.4 — don't compute what
            # you throw away): a source whose seen-ball already covers
            # EVERY node cannot contribute a new shell row — all its
            # candidates anti-join away — so drop its frontier rows
            # before the next expansion. Provably result-identical
            # (shells are unchanged sets; a pruned source's next shell
            # was empty by construction). At scale this is Pregel-style
            # vote-to-halt: completed sources leave the frontier.
            active = (
                seen.groupBy("s")
                .agg(F.count("*").alias("ball"))
                .filter(F.col("ball") < F.lit(n_nodes))
                .select("s")
            )
            frontier = shell.join(active, "s", "left_semi")
    out = nodes
    for d, cnt in enumerate(shell_counts, start=1):
        out = out.join(cnt, out.node == cnt.s, "left").drop("s")
        out = out.withColumn(
            f"n{d}", F.coalesce(F.col(f"n{d}"), F.lit(0)).cast("long")
        )
    # shells skipped by the all-complete early exit are empty by
    # construction — their counts are an exact literal 0 (the same value
    # the coalesce above would have produced from an empty aggregate)
    for d in range(len(shell_counts) + 1, depth + 1):
        out = out.withColumn(f"n{d}", F.lit(0).cast("long"))
    harmonic = F.col("n1").cast("double")
    for d in range(2, depth + 1):
        harmonic = harmonic + F.col(f"n{d}").cast("double") / F.lit(float(d))
    result = out.select(
        "node", *[f"n{d}" for d in range(1, depth + 1)],
        harmonic.alias("harmonic"),
    )
    nbr.unpersist()
    nodes.unpersist()
    return result


def _harmonic_sql(depth: int = HARMONIC_DEPTH) -> str:
    """DuckDB twin of `harmonic_centrality`: distance shells as
    DISTINCT-candidate EXCEPT previous-shells chains (set semantics ==
    the Spark side's distinct + left-anti), counts per shell, and the
    SAME left-associated double chain for the harmonic score."""
    parts = [
        f"edges AS ({EDGES_SQL})",
        "adj AS (SELECT DISTINCT src, dst FROM edges)",
        """und AS (
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM adj WHERE src <> dst)""",
        "nbr AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und)",
        "nodes AS (SELECT src AS node FROM adj UNION SELECT dst FROM adj)",
        "d1 AS MATERIALIZED (SELECT u AS s, v AS c FROM nbr)",
    ]
    for d in range(2, depth + 1):
        prev = d - 1
        parts.append(
            f"""cand{d} AS (
            SELECT DISTINCT p.s, b.v AS c
            FROM d{prev} p JOIN nbr b ON b.u = p.c)"""
        )
        excepts = " ".join(
            f"EXCEPT SELECT s, c FROM d{k}" for k in range(prev, 0, -1)
        )
        parts.append(
            f"""d{d} AS MATERIALIZED (
            SELECT s, c FROM cand{d}
            {excepts}
            EXCEPT SELECT node AS s, node AS c FROM nodes)"""
        )
    for d in range(1, depth + 1):
        parts.append(
            f"cnt{d} AS (SELECT s, COUNT(*) AS n{d} FROM d{d} GROUP BY s)"
        )
    ns = ", ".join(
        f"CAST(COALESCE(c{d}.n{d}, 0) AS BIGINT) AS n{d}"
        for d in range(1, depth + 1)
    )
    chain = "CAST(COALESCE(c1.n1, 0) AS DOUBLE)" + "".join(
        f" + CAST(COALESCE(c{d}.n{d}, 0) AS DOUBLE) / {d}.0"
        for d in range(2, depth + 1)
    )
    joins = "".join(
        f" LEFT JOIN cnt{d} c{d} ON c{d}.s = n.node"
        for d in range(1, depth + 1)
    )
    return (
        "WITH " + ",\n    ".join(parts)
        + f"""
    SELECT n.node, {ns}, {chain} AS harmonic
    FROM nodes n{joins}
    ORDER BY n.node
    """
    )


@query("harmonic_centrality", oracle=_harmonic_sql())
def q_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X81: bounded-depth (D=3) harmonic centrality over the derived
    adjacency — per-distance shell counts (n1, n2, n3: BIGINT-exact)
    plus the pinned-chain harmonic score. The near-everything account
    ranking the reference's two-hop candidate ordering approximates."""
    return harmonic_centrality(adjacency(spark, sf_dir)).orderBy("node")


#: HyperBall sketch parameters (banked approximate-centrality path):
#: m = 64 registers (p = 6; HLL std error 1.04/sqrt(64) ~ 13%),
#: rank capped at 24 (register hash < 2^30; h2 values divisible by
#: 2^23 DO reach the cap — ~2^-23 of ids, rare but real — and both
#: engines treat cap-hits identically: the cap merely bounds the
#: CASE chain).
HB_M = 64
HB_RANK_CAP = 24
#: alpha_64 from Flajolet et al. 2007 (the m=64 bias constant)
HB_ALPHA = 0.709
_HB_SEED1 = 11
_HB_SEED2 = 97
#: modulus + id-split + mixers for the register hash: node ids split
#: below P (lo < 2^29 < P needs no reduction), two independent linear
#: mixes mod P with det(A1*A4 - A2*A3) != 0 mod P, so the (h1, h2)
#: PAIR is injective for node < P * 2^29 ~ 5.4e17 — the effective
#: pre-hash domain is P^2 ~ 1.15e18, not P (r13 ADVICE: the earlier
#: `% 1000003` pre-reduction collapsed the domain to ~1e6 and
#: saturated ball estimates ~37% under at 1e6 members).
#: lo-mixers chosen by measurement (not aesthetics): scored over the
#: three real SF node universes, sequential ranges, strides, and
#: random sets at n = 1e2..1e6 — median error 7-11% everywhere (the
#: m=64 accuracy class), max 12% on the real universes, and NO
#: saturation at 1e6 (the defect this design replaces). Known
#: weakness: power-of-2 strided id sets alias against idx = h1 mod 64
#: (low-bit extraction of a linear hash); account ids are dense
#: sequential, so the case is theoretical here. A2 is the xorshift64*
#: multiplier reduced mod P; A4 is a MurmurHash3 mixing constant.
_HB_P = 1000000007
_HB_SPLIT = 1 << 29
_HB_A1, _HB_A2 = 2654435761, 737407013
_HB_A3, _HB_A4 = 3266489917, 461845907


def _hb_init_exprs(node):
    """(idx, rank) register derivation from a node id. The id is split
    at 2^29 (hi = id >> 29 then mod P, lo = id & (2^29 - 1) — lo is
    already < P so only hi ever wraps) and fed to two independent
    linear mixes mod P = 1000000007; the mixer matrix determinant is
    nonzero mod P, so the (h1, h2) pair is INJECTIVE for ids up to
    P * 2^29 ~ 5.4e17 — distinct ball members can never collide into
    one register contribution, and ball-size estimates do not saturate
    at any realistic cardinality (validity bound documented; beyond it
    collisions are ~|ball|^2 / 1.15e18, negligible). Every term stays
    below 2^62, int64-safe in Spark, DuckDB, and Python alike, so the
    property tests replicate the registers BITWISE. idx = h1 mod m;
    rank = trailing zero bits of h2 + 1, as a pinned CASE chain (pure
    integer — no float, no log). Assumes non-negative ids (as does
    every portable-hash site in the repo; the sources guarantee it)."""
    node = node.cast("long")
    hi = F.shiftright(node, 29) % _HB_P
    lo = node % _HB_SPLIT
    h1 = (hi * _HB_A1 + lo * _HB_A2 + _HB_SEED1) % _HB_P
    idx = h1 % HB_M
    h2 = (hi * _HB_A3 + lo * _HB_A4 + _HB_SEED2) % _HB_P
    rank = F.when(h2 == 0, HB_RANK_CAP)
    for r in range(1, HB_RANK_CAP):
        rank = rank.when(h2 % (2 ** r) == 2 ** (r - 1), r)
    rank = rank.otherwise(HB_RANK_CAP)
    return idx, rank


def hyperball_registers(
    adj: DataFrame, depth: int = HARMONIC_DEPTH, checkpoint: bool = True
) -> list[DataFrame]:
    """HyperBall register propagation (Boldi & Vigna, "In-Core
    Computation of Geometric Centralities with HyperBall", 2013): each
    node holds an m-register HLL sketch of its ball; one round merges
    every neighbor's sketch by element-wise max, so after d rounds the
    sketch is EXACTLY the HLL of ball_d(v)'s membership (max is
    associative/commutative/idempotent — revisits are free, which is
    the whole trick). Returns the per-depth sketch DataFrames
    (node, h0..h63) for d = 1..depth.

    This is the 100 TB path the exact `harmonic_centrality` documents
    as its eventual approximation: the exact kernel's `seen` set is
    Sigma |ball_D(v)| PAIRS (quadratic through hubs), while this state
    is N x m INTEGERS regardless of ball size, and each round is the
    pagerank plan shape — one equi-join contribution expansion + one
    grouped aggregation (64 max() columns, all whole-stage codegen),
    nothing else. Registers are pure integers derived from the
    portable hash, so cross-engine/Python replication is bitwise.

    Banked capability (r13): NOT registered — the exact X81 report is
    the oracle-checked surface; this kernel is the measured scale
    escape hatch, pinned by bitwise property tests instead (the
    truss_formation/persistence pattern). `checkpoint=False` skips the
    per-round localCheckpoint (A/B-measured as the right production
    placement, BASELINE r13) so the plan tests can inspect a full
    uncut round; never use it for more than plan inspection."""
    regs = [f"h{j}" for j in range(HB_M)]
    und = undirected_simple(adj)
    nbr = (
        und.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .union(und.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .persist()
    )
    idx, rank = _hb_init_exprs(F.col("node"))
    sk = node_universe(adj).select(
        "node",
        *[
            F.when(idx == j, rank).otherwise(0).cast("int").alias(f"h{j}")
            for j in range(HB_M)
        ],
    )
    if checkpoint:
        sk = sk.localCheckpoint()
    out: list[DataFrame] = []
    for _ in range(depth):
        contrib = sk.join(nbr, sk.node == nbr.u).select(
            F.col("v").alias("node"), *regs
        )
        sk = (
            contrib.unionByName(sk.select("node", *regs))
            .groupBy("node")
            .agg(*[F.max(c).alias(c) for c in regs])
        )
        if checkpoint:
            sk = sk.localCheckpoint()
        out.append(sk)
    nbr.unpersist()
    return out


def _hb_estimate(sk: DataFrame, est_col: str) -> DataFrame:
    """HLL cardinality estimate from a register sketch: raw =
    alpha_m * m^2 / Sigma 2^-r_j with the standard linear-counting
    small-range correction (E <= 2.5m and zero registers present ->
    m * ln(m / V)). The 2^-r_j terms and their 64-term sum are exact
    dyadic doubles (common denominator 2^-24, numerator < 2^53), so
    only the final division/ln are rounding steps — documented float
    output, property-tested at 1e-12 relative (ln ulps differ across
    runtimes; the registers underneath are bitwise)."""
    s = F.pow(F.lit(0.5), F.col("h0"))
    v = F.when(F.col("h0") == 0, 1).otherwise(0)
    for j in range(1, HB_M):
        s = s + F.pow(F.lit(0.5), F.col(f"h{j}"))
        v = v + F.when(F.col(f"h{j}") == 0, 1).otherwise(0)
    raw = F.lit(HB_ALPHA) * F.lit(float(HB_M * HB_M)) / s
    est = F.when(
        (raw <= F.lit(2.5 * HB_M)) & (v > 0),
        F.lit(float(HB_M)) * F.log(F.lit(float(HB_M)) / v.cast("double")),
    ).otherwise(raw)
    return sk.select("node", est.alias(est_col))


def hyperball_harmonic(
    adj: DataFrame, depth: int = HARMONIC_DEPTH
) -> DataFrame:
    """Approximate bounded-depth harmonic centrality via HyperBall
    (banked, unregistered — the exact X81 is the checked surface):
    H_D(v) ~ Sigma_d (|ball_d| - |ball_{d-1}|) / d with |ball_0| = 1
    exact and |ball_d| the per-depth HLL estimates. Estimate noise can
    make a shell difference negative (documented HyperBall behavior at
    m = 64); consumers ranking by the score are insensitive to it.
    Output: (node, est1..estD ball-size estimates, harmonic_est).
    Adjacency-level like `harmonic_centrality(adj)`, so the skew probe
    can drive both kernels over the same planted-hub graph."""
    sketches = hyperball_registers(adj, depth)
    out = None
    for d, sk in enumerate(sketches, start=1):
        est = _hb_estimate(sk, f"est{d}")
        out = est if out is None else out.join(est, "node")
    h = (F.col("est1") - F.lit(1.0)) / F.lit(1.0)
    for d in range(2, depth + 1):
        h = h + (F.col(f"est{d}") - F.col(f"est{d - 1}")) / F.lit(float(d))
    return out.select(
        "node",
        *[f"est{d}" for d in range(1, depth + 1)],
        h.alias("harmonic_est"),
    ).orderBy("node")


def harmonic_centrality_hyperball(
    spark: SparkSession, sf_dir: str, depth: int = HARMONIC_DEPTH
) -> DataFrame:
    """`hyperball_harmonic` over the derived adjacency — the sf-dir
    composition matching `q_harmonic_centrality`'s input."""
    return hyperball_harmonic(adjacency(spark, sf_dir), depth)


def _hb_dyadic_exprs(d: int):
    """(zeros, dsum, raw) column expressions over a depth-d register
    sketch — ONLY IEEE-determined arithmetic (the r13 NOTES ln-ulp-safe
    design): zeros = exact integer count of empty registers; dsum =
    Σ 2^-h_j built as 1.0 / (1L << h) per term (exact power-of-two
    division, no libm pow) summed over a common 2^-{HB_RANK_CAP}
    denominator with numerator ≤ 64·2^24 « 2^53, so the sum is an
    EXACT dyadic double in any association order; raw = α·m² / dsum
    where α·m² is the parsed 0.709 double scaled by the power of two
    m² (exact) — one correctly-rounded division, bit-identical in any
    IEEE engine. The ln small-range branch (`_hb_estimate`) is left to
    CONSUMERS precisely because ln ulps differ across runtimes."""
    def term(j: int):
        # SQL shiftleft takes column bit counts (the Python-API
        # F.shiftleft wants a literal int, hence F.expr here)
        return F.lit(1.0) / F.expr(
            f"CAST(shiftleft(CAST(1 AS BIGINT), h{j}) AS DOUBLE)"
        )

    s = term(0)
    z = F.when(F.col("h0") == 0, 1).otherwise(0)
    for j in range(1, HB_M):
        s = s + term(j)
        z = z + F.when(F.col(f"h{j}") == 0, 1).otherwise(0)
    alpha_m2 = F.lit(HB_ALPHA * HB_M * HB_M)  # exact power-of-2 scale
    return (
        z.cast("long").alias(f"zeros{d}"),
        s.alias(f"dsum{d}"),
        (alpha_m2 / s).alias(f"raw{d}"),
    )


def hyperball_sketch(
    spark: SparkSession, sf_dir: str, depth: int = HARMONIC_DEPTH
) -> DataFrame:
    """Oracle-safe HyperBall sketch report (r13 verdict #5 — the
    registrable surface for the banked approximate-centrality path):
    per node, for each depth d = 1..{depth}, the zero-register count
    `zeros{{d}}`, the exact dyadic register sum `dsum{{d}}`, and the
    raw HLL estimate `raw{{d}}` = α·m²/dsum — every column either
    exact integer arithmetic or a single correctly-rounded IEEE
    division, so the DuckDB twin `_hyperball_sketch_sql` matches
    BIT-EXACTLY (standing tri-SF test in test_oracle_generators.py).
    Consumers apply the linear-counting ln branch and the shell
    differences themselves (`_hb_estimate` / `hyperball_harmonic`);
    keeping ln out of the checked surface is what makes the value-hash
    viable.

    Registration one-liner when a window slot opens (NOTES
    "Window capacity" retirement-swap proposal):
    `@query("hyperball_sketch", oracle=_hyperball_sketch_sql())`.

    Scale shape: identical to `hyperball_registers` (its plan IS this
    plan — one equi-join contribution expansion + one 64-column max
    aggregation per round, N×64 ints of state); the report layer adds
    one projection per depth and a node-keyed join of the {depth}
    per-depth reports."""
    sketches = hyperball_registers(adjacency(spark, sf_dir), depth)
    out = None
    for d, sk in enumerate(sketches, start=1):
        per = sk.select("node", *_hb_dyadic_exprs(d))
        out = per if out is None else out.join(per, "node")
    return out.orderBy("node")


def _hyperball_sketch_sql(depth: int = HARMONIC_DEPTH) -> str:
    """DuckDB twin of `hyperball_sketch`: the SAME split-id pair hash
    (`//`/`%` on non-negative BIGINTs ≡ Spark's shiftright/% ≡
    Python's >>/%), the SAME trailing-zero CASE chain, {depth}
    unrolled max-merge rounds over the 64 register columns, and the
    SAME dyadic zeros/dsum/raw layer (1.0/(1<<h) terms, α·m² inlined
    via Python repr so strtod parses the identical double)."""
    m, cap = HB_M, HB_RANK_CAP
    regs = [f"h{j}" for j in range(m)]
    rank_arms = " ".join(
        f"WHEN h2 % {2 ** r} = {2 ** (r - 1)} THEN {r}"
        for r in range(1, cap)
    )
    init_cols = ", ".join(
        f"CASE WHEN idx = {j} THEN rnk ELSE 0 END AS h{j}" for j in range(m)
    )
    maxes = ", ".join(f"MAX({c}) AS {c}" for c in regs)
    allregs = ", ".join(regs)
    parts = [
        f"edges AS ({EDGES_SQL})",
        "adj AS (SELECT DISTINCT src, dst FROM edges)",
        """und AS (
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM adj WHERE src <> dst)""",
        "nbr AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und)",
        "nodes AS (SELECT src AS node FROM adj UNION SELECT dst FROM adj)",
        f"""hv AS (
        SELECT node,
               ((node // {_HB_SPLIT}) % {_HB_P}) AS hi,
               (node % {_HB_SPLIT}) AS lo
        FROM nodes)""",
        f"""hh AS (
        SELECT node,
               ((hi * {_HB_A1} + lo * {_HB_A2} + {_HB_SEED1}) % {_HB_P})
                   AS h1,
               ((hi * {_HB_A3} + lo * {_HB_A4} + {_HB_SEED2}) % {_HB_P})
                   AS h2
        FROM hv)""",
        f"""ir AS (
        SELECT node, h1 % {m} AS idx,
               CASE WHEN h2 = 0 THEN {cap} {rank_arms} ELSE {cap} END
                   AS rnk
        FROM hh)""",
        f"sk0 AS (SELECT node, {init_cols} FROM ir)",
    ]
    for d in range(1, depth + 1):
        parts.append(
            f"""sk{d} AS MATERIALIZED (
            SELECT node, {maxes}
            FROM (
                SELECT b.v AS node, {allregs}
                FROM sk{d - 1} s JOIN nbr b ON b.u = s.node
                UNION ALL
                SELECT node, {allregs} FROM sk{d - 1}
            )
            GROUP BY node)"""
        )
    alpha_m2 = repr(HB_ALPHA * HB_M * HB_M)
    out_cols = []
    joins = ""
    for d in range(1, depth + 1):
        zeros = " + ".join(
            f"CASE WHEN e{d}.{c} = 0 THEN 1 ELSE 0 END" for c in regs
        )
        dsum = " + ".join(
            f"1.0 / CAST(CAST(1 AS BIGINT) << e{d}.{c} AS DOUBLE)"
            for c in regs
        )
        out_cols.append(
            f"CAST({zeros} AS BIGINT) AS zeros{d}, "
            f"({dsum}) AS dsum{d}, "
            f"CAST({alpha_m2} AS DOUBLE) / ({dsum}) AS raw{d}"
        )
        joins += f" JOIN sk{d} e{d} ON e{d}.node = n.node"
    return (
        "WITH " + ",\n    ".join(parts)
        + f"""
    SELECT n.node, {", ".join(out_cols)}
    FROM nodes n{joins}
    ORDER BY n.node
    """
    )


@query(
    "triangle_count",
    oracle=f"""
    {_ADJ_CTE},
    {_UND_SQL}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM und e1
    JOIN und e2 ON e2.a = e1.b
    JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count on the undirected simple graph via DEGREE
    ORIENTATION (the r4-verdict refinement, implemented): every edge is
    oriented from its lower-(degree, node) endpoint to the higher one, so
    wedge generation pivots only at the LOW-order vertex of each triangle
    — oriented out-degree is O(√m), making total wedge work O(m^1.5)
    regardless of hubs (vs O(Σd²) for id-canonical orientation, which a
    single 10⁸-degree hub blows up at 100 TB). Each triangle u<v<w in
    orientation order is counted exactly once: the ordered wedge (v, w)
    at pivot u matches the oriented edge v→w, and the mirrored wedge
    (w, v) matches nothing. Two equi-joins + one node-sized degree join
    (strategy left to AQE — the degree relation is data-sized)."""
    adj = adjacency(spark, sf_dir)
    und = undirected_simple(adj)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    with_deg = und.join(
        deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a"
    ).join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )
    w1, w2, e3 = oriented.alias("w1"), oriented.alias("w2"), oriented.alias("e3")
    return (
        w1.join(
            w2,
            (F.col("w2.lo") == F.col("w1.lo"))
            & (F.col("w2.hi") != F.col("w1.hi")),
        )
        .join(
            e3,
            (F.col("e3.lo") == F.col("w1.hi"))
            & (F.col("e3.hi") == F.col("w2.hi")),
        )
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )


def damped_walk(
    state: DataFrame,
    trans: DataFrame,
    iters: int,
    tele_base,
    dang_apply,
    carry: tuple[str, ...] = (),
    damping: float = 0.85,
) -> DataFrame:
    """The ONE damped-walk power-iteration loop shared by the whole
    pagerank family (pagerank / pagerank_weighted / seeded_ppr /
    seeded_ppr_weighted) — r7 factoring: four near-identical 40-line
    loops collapsed into a single exactness-pinned kernel, so the
    decimal-quantization discipline cannot desynchronize between
    variants.

    Inputs:
      state  — persisted DataFrame(node, dangling:int, *carry, rank).
      trans  — transition relation (src, dst, num:double, den) giving
               per-edge share ``(rank_q · num) / den`` as a PINNED double
               chain: count-based walks pass num=1.0 (x·1.0 is
               IEEE-exact, so the chain equals rank_q/outdeg
               bit-for-bit), money-weighted walks pass num=w, den=ow.
      tele_base  — Column: the full (1−d)·teleport(v) term.
      dang_apply — Column → Column: how a node reabsorbs the global
               dangling mass (uniform walks divide by N, personalized
               walks multiply by the seed weight — division vs
               multiplication-by-reciprocal differ in floating point,
               so the exact expression stays with the caller).

    Per round (identical shape across variants, scale-clean): quantize
    rank to DECIMAL(18,12); dangling mass as a broadcast 1-row decimal
    aggregate (no driver collect); per-edge contributions re-quantized
    to DECIMAL(18,15) before the order-free SUM (one shuffle keyed on
    dst); pinned-order double update; localCheckpoint to truncate the
    doubling lineage (see pagerank's note — on a real cluster swap for
    checkpoint() if executor loss mid-computation matters). Returns the
    final state with (node, dangling, *carry, rank, prev_rank) where
    prev_rank is the previous round's quantized rank — the caller's
    zero-extra-shuffle convergence residual."""
    rq = F.col("rank").cast("decimal(18,12)")
    trans = trans.persist()
    for _ in range(iters):
        dang = state.filter(F.col("dangling") == 1).agg(
            F.coalesce(F.sum(rq), F.lit(0).cast("decimal(18,12)"))
            .cast("double")
            .alias("dmass")
        )
        contrib = (
            trans.join(state, trans.src == state.node)
            .select(
                F.col("dst").alias("node"),
                ((rq.cast("double") * F.col("num")) / F.col("den"))
                .cast("decimal(18,15)")
                .alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_rank"))
        )
        new_state = (
            state.select("node", "dangling", *carry, "rank")
            .join(contrib, "node", "left")
            .join(F.broadcast(dang))
            .select(
                "node",
                "dangling",
                *carry,
                (
                    tele_base
                    + F.lit(damping)
                    * (
                        F.coalesce(
                            F.col("in_rank"), F.lit(0).cast("decimal(18,15)")
                        ).cast("double")
                        + dang_apply(F.col("dmass"))
                    )
                ).alias("rank"),
                rq.cast("double").alias("prev_rank"),
            )
        ).localCheckpoint()
        state.unpersist()
        state = new_state
    trans.unpersist()
    return state


def pagerank(adj: DataFrame, iters: int = 10, damping: float = 0.85) -> DataFrame:
    """Power iteration as repeated join+aggregate: rank_{t+1}(v) =
    (1−d)/N + d·(Σ_{u→v} rank_t(u)/outdeg(u) + dangling_mass/N).
    Dangling (no-out-edge) mass is redistributed uniformly — ranks sum to
    1 every iteration. Out-degrees computed once and cached; each round
    shuffles only (node, contribution) pairs.

    Cross-engine-exact discipline (what makes the DuckDB oracle possible
    for an ITERATIVE float algorithm): each round quantizes the rank to
    DECIMAL(18,12) first, per-edge contributions are exact-rounded double
    divisions re-quantized to DECIMAL(18,15) before the SUM (decimal sums
    are order-independent), and the damping update runs in double with a
    pinned operation order — so every engine computes bit-identical
    ranks every round. Quantization error ≤1e-12/round, invisible at the
    8dp output (NumPy parity test unchanged).

    The r7 `residual` column (|rank − previous quantized rank|) needs at
    least one completed round, so `iters` < 1 is rejected loudly rather
    than failing with a missing-column AnalysisException (review r7)."""
    if iters < 1:
        raise ValueError(
            f"pagerank needs iters >= 1 (got {iters}) — the residual "
            "column compares the final two rounds"
        )
    nodes = node_universe(adj).persist()
    n = nodes.count()
    deg = adj.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("outdeg"))
    state = nodes.join(deg, "node", "left").select(
        "node",
        F.when(F.coalesce("outdeg", F.lit(0)) == 0, 1).otherwise(0).alias(
            "dangling"
        ),
        F.lit(1.0 / n).alias("rank"),
    ).persist()
    # count-based transition: share = rank_q / outdeg, expressed as the
    # helper's (rank_q · 1.0) / outdeg pinned chain (bit-identical)
    trans = adj.join(deg.withColumnRenamed("node", "src"), "src").select(
        "src", "dst", F.lit(1.0).alias("num"), F.col("outdeg").alias("den")
    )
    state = damped_walk(
        state,
        trans,
        iters,
        tele_base=F.lit((1.0 - damping) / n),
        dang_apply=lambda d: d / F.lit(float(n)),
        damping=damping,
    )
    nodes.unpersist()
    # residual = |rank_10 − rank_9| per node (rank_9 via its quantized
    # DECIMAL(18,12) form — deterministic cross-engine; intvals ≤ 1e12
    # stay far below the 2^53 decimal→double divergence class): lets a
    # user judge whether the fixed round count converged on THEIR graph
    return state.select(
        "node",
        F.round("rank", 8).alias("rank"),
        F.round(F.abs(F.col("rank") - F.col("prev_rank")), 8).alias(
            "residual"
        ),
    )


def _pagerank_sql(iters: int = 10) -> str:
    """Unrolled DuckDB twin: one (quantize, dangling, contrib, update)
    CTE quartet per iteration, mirroring `pagerank`'s exact-decimal
    discipline operation for operation. N is computed in SQL so the
    oracle is scale-factor-generic."""
    nn = "(SELECT n FROM nn)"
    # AS MATERIALIZED: DuckDB inlines plain CTEs per reference — adj is
    # referenced every round (re-opening the parquet each time → fd
    # exhaustion) and q{i} twice per round (exponential tree growth, the
    # same blowup Spark's lazy plans have). Materializing pins each to
    # one evaluation.
    parts = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        "adj AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges)",
        "nodes AS (SELECT src AS node FROM adj UNION SELECT dst FROM adj)",
        "deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM adj GROUP BY src)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        f"""s0 AS (
            SELECT nd.node, COALESCE(d.outdeg, 0) AS outdeg,
                   CAST(1.0 AS DOUBLE) / {nn} AS rank
            FROM nodes nd LEFT JOIN deg d USING (node))""",
    ]
    for i in range(iters):
        parts.append(
            f"q{i} AS MATERIALIZED (SELECT node, outdeg, "
            f"CAST(rank AS DECIMAL(18,12)) AS rq FROM s{i})"
        )
        parts.append(
            f"dg{i} AS (SELECT COALESCE(SUM(CASE WHEN outdeg = 0 THEN rq END),"
            f" 0) AS dmass FROM q{i})"
        )
        parts.append(
            f"""cn{i} AS (
            SELECT a.dst AS node,
                   SUM(CAST(CAST(q.rq AS DOUBLE) / q.outdeg
                            AS DECIMAL(18,15))) AS m
            FROM adj a JOIN q{i} q ON q.node = a.src
            GROUP BY a.dst)"""
        )
        parts.append(
            f"""s{i + 1} AS (
            SELECT q.node, q.outdeg,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / {nn}
                   + CAST(0.85 AS DOUBLE)
                     * (CAST(COALESCE(c.m, 0) AS DOUBLE)
                        + CAST((SELECT dmass FROM dg{i}) AS DOUBLE) / {nn})
                       AS rank,
                   CAST(q.rq AS DOUBLE) AS prev_rank
            FROM q{i} q LEFT JOIN cn{i} c USING (node))"""
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f""" SELECT node, ROUND(rank, 8) AS rank,
        ROUND(ABS(rank - prev_rank), 8) AS residual
        FROM s{iters} ORDER BY node"""
    )


@query("pagerank", oracle=_pagerank_sql())
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank(10 iters, d=0.85) on the derived adjacency, value-hash
    checked against a 10-round unrolled DuckDB twin — iterative float
    algorithms become oracle-able under the per-round decimal-
    quantization discipline (see `pagerank`)."""
    return pagerank(adjacency(spark, sf_dir)).orderBy("node")


#: HITS mutual-reinforcement rounds — enough for the 8dp output to sit
#: far inside the spectral-gap convergence envelope on the test graphs
#: (the residual column reports the actual final-round movement)
HITS_ITERS = 8


def hits_scores(adj: DataFrame, iters: int = HITS_ITERS) -> DataFrame:
    """HITS (Kleinberg hubs & authorities) as mutually-recursive
    join+aggregate rounds: a(v) = Σ_{u→v} h(u), h(u) = Σ_{u→v} a(v),
    each half-step L1-normalized (scores sum to 1 — HITS is defined up
    to scale; L1 keeps every quantity a plain sum, which is what makes
    the cross-engine decimal discipline work, where an L2 norm would
    inject a sqrt into the hot chain). For audit work the two scores
    split the flagship's degree view: high-hub accounts FAN MONEY OUT
    to well-collected accounts (smurf sources), high-authority accounts
    COLLECT from well-distributing ones (sinks) — the mutual
    reinforcement is exactly the A·Aᵀ / Aᵀ·A structure the reference's
    dense two-hop product probes one level of.

    Exactness discipline (damped_walk's, adapted to the two-phase
    round): scores quantize to DECIMAL(18,12) before each contribution
    sum; the sums are pure decimal additions (exact, order-free — no
    per-edge division here, unlike pagerank); each L1 total rides as a
    broadcast 1-row decimal aggregate; the normalizing division is one
    pinned decimal→double cast pair per node. Decimal→double casts stay
    exact while intvals < 2^53, i.e. per-round L1 totals < ~9×10³ —
    totals are bounded by the graph's max degree (post-normalization
    scores sum to 1), so the discipline holds to ~10⁹-edge graphs with
    hubs up to that bound; beyond it the oracle comparison (not the
    algorithm) would drift ulps.

    Per round: two contribution shuffles (by dst, then by src) + two
    broadcast 1-row totals; localCheckpoint truncates the doubling
    lineage. Scale shape identical to two pagerank rounds. The two
    per-round contribution aggregates (araw/hraw) are ALSO
    checkpointed: each feeds both its L1 total and the normalize join,
    and without materialization the second consumer re-runs the edge
    join — measured at sf0.1: 19.3 -> 15.4 s warm (checkpointing the
    cheap `half` join relation as well was measured SLOWER, 17.0 s,
    and reverted).

    r18 restructure (guide §2.4 — remove shuffles outright): the old
    loop joined each half-step's contributions back onto the FULL node
    universe (two node-keyed SortMergeJoins per round) before the next
    contribution join. Both are provably redundant inside the loop: a
    node absent from araw has a = coalesce(NULL,0)/at = 0, whose
    quantized contribution to every downstream sum is exactly 0 (and
    decimal sums are exact, so summing-in zeros equals omitting them);
    a node with no out-edges never matches the next a-contribution
    join at all. So each round now normalizes araw/hraw IN PLACE (a
    narrow projection over the already-grouped relation) and only the
    FINAL select left-joins the node universe to zero-fill — per-node
    expressions (coalesce(x,dec0)::double / tot::double) are
    UNCHANGED, so every emitted value is bit-identical (oracle-exact,
    A/B-verified at sf0.001/0.01/0.1). Two SMJs and the full-width
    state checkpoint per round become one out-edge-nodes-sized
    checkpoint per round."""
    if iters < 1:
        # r8 ADVICE: iters=0 would return the unnormalized init state
        # AND leak the persisted init_state handle (the unpersist lives
        # in the loop body) — reject loudly, harmonic's depth guard.
        raise ValueError("hits_scores needs iters >= 1")
    # adj is consumed TWICE PER ROUND (the a-contribution join by src and
    # the h-contribution join by dst) plus once for the node universe —
    # 2·iters+1 executions of the events-scan + distinct without this
    # persist (r18; damped_walk has persisted its `trans` twin since r7,
    # HITS was the outlier). Unpersisted with `nodes` at the end.
    adj = adj.persist()
    # node universe: checkpointed, not persisted — it is read by the
    # n-count here and ONCE more by the final zero-fill select, which
    # must stay valid after adj is unpersisted below
    nodes = node_universe(adj).localCheckpoint()
    n = nodes.count()
    dec0 = F.lit(0).cast("decimal(18,12)")
    # carried round state: the normalized hub relation restricted to
    # nodes WITH OUT-EDGES — the only rows the a-contribution join can
    # match. Initial h = 1/n uniform (the old full-universe init
    # restricted to the rows the first join consumed).
    hn = (
        adj.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.lit(1.0 / n).alias("h"))
        .localCheckpoint()
    )
    araw = atot = hraw = htot = None
    prev_araw = prev_atot = None
    for rnd in range(iters):
        last = rnd == iters - 1
        # the FINAL round's residual needs the previous round's
        # authority relation — keep the handles (already materialized
        # by that round's checkpoint job; no extra work)
        prev_araw, prev_atot = araw, atot
        hq = F.col("h").cast("decimal(18,12)")
        araw = (
            adj.join(hn, adj.src == hn.node)
            .select(F.col("dst").alias("node"), hq.alias("hq"))
            .groupBy("node")
            .agg(F.sum("hq").alias("ar"))
            # lazy (r17): materialized inside this round's eager
            # checkpoint job — both consumers (total + in-place
            # normalize) read one materialization
            .localCheckpoint(eager=False)
        )
        atot = araw.agg(
            F.coalesce(F.sum("ar"), dec0).alias("at")
        )
        # in-place normalize (r18): the same pinned decimal→double cast
        # pair per node as the old universe-joined `half`, minus the
        # SortMergeJoin — a node absent here carried an exact 0 there,
        # which cannot change any downstream decimal sum
        anorm = araw.join(F.broadcast(atot)).select(
            "node",
            (
                F.coalesce(F.col("ar"), dec0).cast("double")
                / F.col("at").cast("double")
            ).alias("a"),
        )
        aq = F.col("a").cast("decimal(18,12)")
        hraw = (
            adj.join(anorm, adj.dst == anorm.node)
            .select(F.col("src").alias("node"), aq.alias("aq"))
            .groupBy("node")
            .agg(F.sum("aq").alias("hr"))
            # eager on the last round (it is the round barrier then);
            # lazy otherwise — materialized by hn's checkpoint job
            .localCheckpoint(eager=last)
        )
        htot = hraw.agg(
            F.coalesce(F.sum("hr"), dec0).alias("ht")
        )
        if not last:
            hn = (
                hraw.join(F.broadcast(htot)).select(
                    "node",
                    (
                        F.coalesce(F.col("hr"), dec0).cast("double")
                        / F.col("ht").cast("double")
                    ).alias("h"),
                )
            ).localCheckpoint()
    adj.unpersist()
    # ONE zero-fill pass over the node universe replaces the two
    # per-round universe joins: a/h/prev_a for every node, absent
    # contribution rows coalesced to the exact-0 the old per-round
    # state carried
    res = (
        nodes.join(araw, "node", "left")
        .join(F.broadcast(atot))
        .join(hraw, "node", "left")
        .join(F.broadcast(htot))
    )
    if prev_araw is not None:
        res = res.join(
            prev_araw.withColumnRenamed("ar", "arp"), "node", "left"
        ).join(F.broadcast(prev_atot.withColumnRenamed("at", "atp")))
        prev_a = (
            F.coalesce(F.col("arp"), dec0).cast("double")
            / F.col("atp").cast("double")
        )
    else:
        # iters == 1: the residual compares against the all-zero init
        prev_a = F.lit(0.0)
    a_col = (
        F.coalesce(F.col("ar"), dec0).cast("double")
        / F.col("at").cast("double")
    )
    h_col = (
        F.coalesce(F.col("hr"), dec0).cast("double")
        / F.col("ht").cast("double")
    )
    return res.select(
        "node",
        F.round(a_col, 8).alias("authority"),
        F.round(h_col, 8).alias("hub"),
        F.round(F.abs(a_col - prev_a), 8).alias("residual"),
    )


def _hits_sql(iters: int = HITS_ITERS) -> str:
    """Unrolled DuckDB twin of `hits_scores`: one (quantize-h, sum-in,
    L1-total, normalize-a, quantize-a, sum-out, L1-total, normalize-h)
    CTE octet per round, mirroring the Spark op order cast for cast."""
    parts = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        "adj AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges)",
        "nodes AS (SELECT src AS node FROM adj UNION SELECT dst FROM adj)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        """s0 AS (
            SELECT node, CAST(0.0 AS DOUBLE) AS a,
                   CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS h,
                   CAST(0.0 AS DOUBLE) AS prev_a
            FROM nodes)""",
    ]
    for i in range(iters):
        parts.append(
            f"q{i} AS MATERIALIZED (SELECT node, a, "
            f"CAST(h AS DECIMAL(18,12)) AS hq FROM s{i})"
        )
        parts.append(
            f"""ar{i} AS (
            SELECT e.dst AS node, SUM(q.hq) AS ar
            FROM adj e JOIN q{i} q ON q.node = e.src
            GROUP BY e.dst)"""
        )
        parts.append(
            f"at{i} AS (SELECT COALESCE(SUM(ar), 0) AS at FROM ar{i})"
        )
        parts.append(
            f"""ha{i} AS MATERIALIZED (
            SELECT q.node, q.a AS pa,
                   CAST(COALESCE(r.ar, 0) AS DOUBLE)
                       / CAST((SELECT at FROM at{i}) AS DOUBLE) AS a,
                   CAST(CAST(COALESCE(r.ar, 0) AS DOUBLE)
                        / CAST((SELECT at FROM at{i}) AS DOUBLE)
                        AS DECIMAL(18,12)) AS aq
            FROM q{i} q LEFT JOIN ar{i} r USING (node))"""
        )
        parts.append(
            f"""hr{i} AS (
            SELECT e.src AS node, SUM(q.aq) AS hr
            FROM adj e JOIN ha{i} q ON q.node = e.dst
            GROUP BY e.src)"""
        )
        parts.append(
            f"ht{i} AS (SELECT COALESCE(SUM(hr), 0) AS ht FROM hr{i})"
        )
        parts.append(
            f"""s{i + 1} AS (
            SELECT q.node, q.a,
                   CAST(COALESCE(r.hr, 0) AS DOUBLE)
                       / CAST((SELECT ht FROM ht{i}) AS DOUBLE) AS h,
                   q.pa AS prev_a
            FROM ha{i} q LEFT JOIN hr{i} r USING (node))"""
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f""" SELECT node, ROUND(a, 8) AS authority, ROUND(h, 8) AS hub,
        ROUND(ABS(a - prev_a), 8) AS residual
        FROM s{iters} ORDER BY node"""
    )


@query("hits_scores", oracle=_hits_sql())
def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X70: HITS hubs & authorities on the derived payment graph,
    value-hash checked against an 8-round unrolled DuckDB twin (see
    `hits_scores` for the L1/decimal discipline that makes a
    mutually-recursive eigenvector algorithm bitwise oracle-able)."""
    return hits_scores(adjacency(spark, sf_dir)).orderBy("node")


PPR_ITERS = 6


def _seeded_ppr_sql(iters: int = PPR_ITERS) -> str:
    """Unrolled DuckDB twin of `seeded_ppr` — the `_pagerank_sql`
    discipline with the uniform teleport replaced by the seed
    distribution (and dangling mass returned to the seeds)."""
    kk = "(SELECT k FROM sn)"
    parts = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        "adj AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges)",
        "nodes AS (SELECT src AS node FROM adj UNION SELECT dst FROM adj)",
        "deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM adj GROUP BY src)",
        f"""cand AS (
            SELECT a.src FROM adj a JOIN adj b ON a.dst = b.src
            GROUP BY a.src, b.dst HAVING COUNT(*) >= {MIN_PATHS})""",
        "seeds AS (SELECT DISTINCT src AS node FROM cand)",
        "sn AS (SELECT COUNT(*) AS k FROM seeds)",
        f"""s0 AS (
            SELECT nd.node, COALESCE(d.outdeg, 0) AS outdeg,
                   CASE WHEN sd.node IS NULL THEN 0 ELSE 1 END AS seed,
                   CAST(CASE WHEN sd.node IS NULL THEN 0 ELSE 1 END AS DOUBLE)
                       / {kk} AS rank
            FROM nodes nd LEFT JOIN deg d USING (node)
            LEFT JOIN seeds sd USING (node))""",
    ]
    for i in range(iters):
        parts.append(
            f"q{i} AS MATERIALIZED (SELECT node, outdeg, seed, "
            f"CAST(rank AS DECIMAL(18,12)) AS rq FROM s{i})"
        )
        parts.append(
            f"dg{i} AS (SELECT COALESCE(SUM(CASE WHEN outdeg = 0 THEN rq END),"
            f" 0) AS dmass FROM q{i})"
        )
        parts.append(
            f"""cn{i} AS (
            SELECT a.dst AS node,
                   SUM(CAST(CAST(q.rq AS DOUBLE) / q.outdeg
                            AS DECIMAL(18,15))) AS m
            FROM adj a JOIN q{i} q ON q.node = a.src
            GROUP BY a.dst)"""
        )
        parts.append(
            f"""s{i + 1} AS (
            SELECT q.node, q.outdeg, q.seed,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
                       * (CAST(q.seed AS DOUBLE) / {kk})
                   + CAST(0.85 AS DOUBLE)
                     * (CAST(COALESCE(c.m, 0) AS DOUBLE)
                        + CAST((SELECT dmass FROM dg{i}) AS DOUBLE)
                          * (CAST(q.seed AS DOUBLE) / {kk}))
                       AS rank,
                   CAST(q.rq AS DOUBLE) AS prev_rank
            FROM q{i} q LEFT JOIN cn{i} c USING (node))"""
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f""" SELECT node, CAST(seed AS BIGINT) AS seed,
        ROUND(rank, 8) AS ppr,
        ROUND(ABS(rank - prev_rank), 8) AS residual
        FROM s{iters} ORDER BY ppr DESC, node"""
    )


@query("seeded_ppr", oracle=_seeded_ppr_sql())
def q_seeded_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: personalized PageRank from the FLAGSHIP's flagged accounts —
    guilt-by-association scoring. The teleport distribution is uniform
    over the smurf-candidate source set (the ≥{MIN_PATHS}-path srcs
    from `two_hop_candidates`), so suspicion mass flows out of the
    flagged ring through the payment graph; high-PPR NON-seed nodes
    are the accounts one audit would look at next. Dangling mass
    returns to the seeds (standard PPR with restart).

    Same cross-engine-exact discipline as `pagerank` (per-round
    DECIMAL(18,12) quantization, DECIMAL(18,15) contribution sums,
    pinned double op order), {PPR_ITERS} rounds against the unrolled
    CTE twin. Scale: identical per-round shape to pagerank — one
    contribution shuffle + a broadcast 1-row dangling aggregate; the
    seed relation is post-HAVING candidate-sized."""
    adj = adjacency(spark, sf_dir)
    seeds = (
        two_hop_counts(adj).select(F.col("src").alias("node")).distinct()
    ).persist()
    k = seeds.count()
    if k == 0:
        # a seedless teleport distribution is undefined (0/0 ranks) —
        # fail loudly rather than emit NaN suspicion scores
        raise ValueError(
            "seeded_ppr: no flagged smurf-candidate seeds in this dataset "
            f"(no source with >= {MIN_PATHS} two-hop paths to one sink)"
        )
    nodes = node_universe(adj).persist()
    deg = adj.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    state = (
        nodes.join(deg, "node", "left")
        .join(seeds.withColumn("s", F.lit(1)), "node", "left")
        .select(
            "node",
            F.when(F.coalesce("outdeg", F.lit(0)) == 0, 1)
            .otherwise(0)
            .alias("dangling"),
            F.coalesce("s", F.lit(0)).alias("seed"),
            (F.coalesce("s", F.lit(0)).cast("double") / k).alias("rank"),
        )
        .persist()
    )
    damping = 0.85
    seed_w = F.col("seed").cast("double") / F.lit(float(k))
    trans = adj.join(deg.withColumnRenamed("node", "src"), "src").select(
        "src", "dst", F.lit(1.0).alias("num"), F.col("outdeg").alias("den")
    )
    state = damped_walk(
        state,
        trans,
        PPR_ITERS,
        tele_base=F.lit(1.0 - damping) * seed_w,
        dang_apply=lambda d: d * seed_w,
        carry=("seed",),
        damping=damping,
    )
    nodes.unpersist()
    seeds.unpersist()
    return state.select(
        "node",
        F.col("seed").cast("long").alias("seed"),
        F.round("rank", 8).alias("ppr"),
        F.round(F.abs(F.col("rank") - F.col("prev_rank")), 8).alias(
            "residual"
        ),
    ).orderBy(F.col("ppr").desc(), "node")


def pair_weights(e: DataFrame) -> DataFrame:
    """Exact DECIMAL(18,2) money moved per (src, dst) pair — the shared
    transition-mass base of the money-weighted walks (seeded_ppr_weighted
    / pagerank_weighted). Cent-exact decimal sums are order-free, so the
    aggregate is deterministic under any shuffle."""
    return e.groupBy("src", "dst").agg(
        F.sum(F.col("weight").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("w")
    )


#: shared DuckDB CTE fragments for the money-weighted transition base —
#: the oracle twins of `pair_weights` + its out-weight rollup
_WT_SQL = """wt AS MATERIALIZED (
            SELECT src, dst,
                   CAST(SUM(CAST(weight AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) AS w
            FROM edges GROUP BY src, dst)"""
_OW_SQL = """ow AS (
            SELECT src, CAST(SUM(w) AS DECIMAL(18,2)) AS ow
            FROM wt GROUP BY src)"""


def _seeded_ppr_weighted_sql(iters: int = PPR_ITERS) -> str:
    """Unrolled DuckDB twin of `seeded_ppr_weighted`: `_seeded_ppr_sql`
    with transition mass proportional to the exact DECIMAL(18,2)
    pair-weight (money moved), not edge count. Nodes whose out-weight is
    NULL or 0 are dangling (a handful of zero-value events exist at
    sf0.1 — a 0/0 share would poison the round)."""
    kk = "(SELECT k FROM sn)"
    parts = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        _WT_SQL,
        _OW_SQL,
        "adj AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges)",
        "nodes AS (SELECT src AS node FROM adj UNION SELECT dst FROM adj)",
        f"""cand AS (
            SELECT a.src FROM adj a JOIN adj b ON a.dst = b.src
            GROUP BY a.src, b.dst HAVING COUNT(*) >= {MIN_PATHS})""",
        "seeds AS (SELECT DISTINCT src AS node FROM cand)",
        "sn AS (SELECT COUNT(*) AS k FROM seeds)",
        f"""s0 AS (
            SELECT nd.node,
                   CASE WHEN o.ow IS NULL OR o.ow = 0 THEN 1 ELSE 0 END
                       AS dangling,
                   CASE WHEN sd.node IS NULL THEN 0 ELSE 1 END AS seed,
                   CAST(CASE WHEN sd.node IS NULL THEN 0 ELSE 1 END AS DOUBLE)
                       / {kk} AS rank
            FROM nodes nd LEFT JOIN ow o ON o.src = nd.node
            LEFT JOIN seeds sd USING (node))""",
    ]
    for i in range(iters):
        parts.append(
            f"q{i} AS MATERIALIZED (SELECT node, dangling, seed, "
            f"CAST(rank AS DECIMAL(18,12)) AS rq FROM s{i})"
        )
        parts.append(
            f"dg{i} AS (SELECT COALESCE(SUM(CASE WHEN dangling = 1 THEN rq "
            f"END), 0) AS dmass FROM q{i})"
        )
        parts.append(
            f"""cn{i} AS (
            SELECT t.dst AS node,
                   SUM(CAST(CAST(q.rq AS DOUBLE) * CAST(t.w AS DOUBLE)
                            / CAST(o.ow AS DOUBLE)
                            AS DECIMAL(18,15))) AS m
            FROM wt t
            JOIN q{i} q ON q.node = t.src
            JOIN ow o ON o.src = t.src
            WHERE o.ow > 0
            GROUP BY t.dst)"""
        )
        parts.append(
            f"""s{i + 1} AS (
            SELECT q.node, q.dangling, q.seed,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
                       * (CAST(q.seed AS DOUBLE) / {kk})
                   + CAST(0.85 AS DOUBLE)
                     * (CAST(COALESCE(c.m, 0) AS DOUBLE)
                        + CAST((SELECT dmass FROM dg{i}) AS DOUBLE)
                          * (CAST(q.seed AS DOUBLE) / {kk}))
                       AS rank,
                   CAST(q.rq AS DOUBLE) AS prev_rank
            FROM q{i} q LEFT JOIN cn{i} c USING (node))"""
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f""" SELECT node, CAST(seed AS BIGINT) AS seed,
        ROUND(rank, 8) AS wppr,
        ROUND(ABS(rank - prev_rank), 8) AS residual
        FROM s{iters} ORDER BY wppr DESC, node"""
    )


@query("seeded_ppr_weighted", oracle=_seeded_ppr_weighted_sql())
def q_seeded_ppr_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X67 (r7): `seeded_ppr` with MONEY-weighted transitions — each
    round a node passes suspicion mass to counterparties in proportion
    to the exact DECIMAL(18,2) value transferred, not the edge count.
    For audit scoring this is the better physics: one 10⁶ transfer
    through an intermediary should carry more suspicion than a thousand
    cent-sized pings (the flagship's count view and this weighted view
    DISAGREEING is itself a signal worth surfacing).

    Exactness discipline on top of `seeded_ppr`'s: pair weights and
    out-weights are exact DECIMAL(18,2) cent sums; the per-edge share
    is the pinned double chain (rq·w)/ow — decimal→double conversions
    stay below the 2^53 divergence class at any test SF (cent intvals
    ≤ ~1e8) and the order is identical in both engines; contributions
    re-quantize to DECIMAL(18,15) before the order-free SUM. Nodes with
    NULL or ZERO out-weight are dangling (sf0.1 has zero-value events;
    a 0/0 share would poison the round) and return their mass to the
    seeds. Per-round shape: one contribution shuffle keyed on src +
    a broadcast 1-row dangling aggregate — identical to pagerank,
    scale-clean."""
    from ..sources import edges as edges_src

    e = edges_src(spark, sf_dir)
    wt = pair_weights(e).persist()
    ow = wt.groupBy("src").agg(
        F.sum("w").cast("decimal(18,2)").alias("ow")
    )
    adj = adjacency(spark, sf_dir)
    seeds = (
        two_hop_counts(adj).select(F.col("src").alias("node")).distinct()
    ).persist()
    k = seeds.count()
    if k == 0:
        raise ValueError(
            "seeded_ppr_weighted: no flagged smurf-candidate seeds "
            f"(no source with >= {MIN_PATHS} two-hop paths to one sink)"
        )
    nodes = node_universe(adj).persist()
    state = (
        nodes.join(ow.withColumnRenamed("src", "node"), "node", "left")
        .join(seeds.withColumn("s", F.lit(1)), "node", "left")
        .select(
            "node",
            F.when(
                F.col("ow").isNull() | (F.col("ow") == 0), 1
            ).otherwise(0).alias("dangling"),
            F.coalesce("s", F.lit(0)).alias("seed"),
            (F.coalesce("s", F.lit(0)).cast("double") / k).alias("rank"),
        )
        .persist()
    )
    damping = 0.85
    seed_w = F.col("seed").cast("double") / F.lit(float(k))
    # money-weighted transition: share = (rank_q · w) / ow, the same
    # pinned chain as the helper's (rank_q · num) / den
    trans = (
        wt.join(ow, "src")
        .filter(F.col("ow") > 0)
        .select(
            "src",
            "dst",
            F.col("w").cast("double").alias("num"),
            F.col("ow").cast("double").alias("den"),
        )
    )
    state = damped_walk(
        state,
        trans,
        PPR_ITERS,
        tele_base=F.lit(1.0 - damping) * seed_w,
        dang_apply=lambda d: d * seed_w,
        carry=("seed",),
        damping=damping,
    )
    nodes.unpersist()
    seeds.unpersist()
    wt.unpersist()
    return state.select(
        "node",
        F.col("seed").cast("long").alias("seed"),
        F.round("rank", 8).alias("wppr"),
        F.round(F.abs(F.col("rank") - F.col("prev_rank")), 8).alias(
            "residual"
        ),
    ).orderBy(F.col("wppr").desc(), "node")


def _pagerank_weighted_sql(iters: int = 10) -> str:
    """Unrolled DuckDB twin of `pagerank_weighted`: `_pagerank_sql`'s
    uniform-teleport discipline with `_seeded_ppr_weighted_sql`'s
    money-weighted transition CTEs."""
    nn = "(SELECT n FROM nn)"
    parts = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        _WT_SQL,
        _OW_SQL,
        "adj AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges)",
        "nodes AS (SELECT src AS node FROM adj UNION SELECT dst FROM adj)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        f"""s0 AS (
            SELECT nd.node,
                   CASE WHEN o.ow IS NULL OR o.ow = 0 THEN 1 ELSE 0 END
                       AS dangling,
                   CAST(1.0 AS DOUBLE) / {nn} AS rank
            FROM nodes nd LEFT JOIN ow o ON o.src = nd.node)""",
    ]
    for i in range(iters):
        parts.append(
            f"q{i} AS MATERIALIZED (SELECT node, dangling, "
            f"CAST(rank AS DECIMAL(18,12)) AS rq FROM s{i})"
        )
        parts.append(
            f"dg{i} AS (SELECT COALESCE(SUM(CASE WHEN dangling = 1 THEN rq "
            f"END), 0) AS dmass FROM q{i})"
        )
        parts.append(
            f"""cn{i} AS (
            SELECT t.dst AS node,
                   SUM(CAST(CAST(q.rq AS DOUBLE) * CAST(t.w AS DOUBLE)
                            / CAST(o.ow AS DOUBLE)
                            AS DECIMAL(18,15))) AS m
            FROM wt t
            JOIN q{i} q ON q.node = t.src
            JOIN ow o ON o.src = t.src
            WHERE o.ow > 0
            GROUP BY t.dst)"""
        )
        parts.append(
            f"""s{i + 1} AS (
            SELECT q.node, q.dangling,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / {nn}
                   + CAST(0.85 AS DOUBLE)
                     * (CAST(COALESCE(c.m, 0) AS DOUBLE)
                        + CAST((SELECT dmass FROM dg{i}) AS DOUBLE) / {nn})
                       AS rank,
                   CAST(q.rq AS DOUBLE) AS prev_rank
            FROM q{i} q LEFT JOIN cn{i} c USING (node))"""
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f""" SELECT node, ROUND(rank, 8) AS wrank,
        ROUND(ABS(rank - prev_rank), 8) AS residual
        FROM s{iters} ORDER BY node"""
    )


@query("pagerank_weighted", oracle=_pagerank_weighted_sql())
def q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X68 (r7): money-weighted GLOBAL PageRank — the X67 transition
    weighting (each node passes rank to counterparties in proportion to
    the exact DECIMAL(18,2) value transferred) applied to the plain
    uniform-teleport walk. Where `pagerank` ranks accounts by how many
    counterparties route TO them, this ranks by how much VALUE routes to
    them — the two orderings disagreeing on an account (high count-rank,
    low value-rank or vice versa) is the same audit signal X67 surfaces
    for the seeded walk, now corpus-wide rather than relative to the
    flagged ring.

    Exactness and plan shape are inherited wholesale from the shared
    `damped_walk` kernel (per-round DECIMAL(18,12) quantization, pinned
    (rq·w)/ow double chain, DECIMAL(18,15) order-free contribution sums,
    broadcast 1-row dangling aggregate, localCheckpoint lineage
    truncation): 10 rounds, each one contribution shuffle keyed on src —
    identical per-round cost to pagerank, scale-clean. NULL/zero
    out-weight nodes dangle (uniform redistribution, like pagerank)."""
    from ..sources import edges as edges_src

    e = edges_src(spark, sf_dir)
    wt = pair_weights(e).persist()
    ow = wt.groupBy("src").agg(
        F.sum("w").cast("decimal(18,2)").alias("ow")
    )
    adj = adjacency(spark, sf_dir)
    nodes = node_universe(adj).persist()
    n = nodes.count()
    damping = 0.85
    state = (
        nodes.join(ow.withColumnRenamed("src", "node"), "node", "left")
        .select(
            "node",
            F.when(
                F.col("ow").isNull() | (F.col("ow") == 0), 1
            ).otherwise(0).alias("dangling"),
            F.lit(1.0 / n).alias("rank"),
        )
        .persist()
    )
    trans = (
        wt.join(ow, "src")
        .filter(F.col("ow") > 0)
        .select(
            "src",
            "dst",
            F.col("w").cast("double").alias("num"),
            F.col("ow").cast("double").alias("den"),
        )
    )
    state = damped_walk(
        state,
        trans,
        10,
        tele_base=F.lit((1.0 - damping) / n),
        dang_apply=lambda d: d / F.lit(float(n)),
        damping=damping,
    )
    nodes.unpersist()
    wt.unpersist()
    return state.select(
        "node",
        F.round("rank", 8).alias("wrank"),
        F.round(F.abs(F.col("rank") - F.col("prev_rank")), 8).alias(
            "residual"
        ),
    ).orderBy("node")


_NODE_JACCARD_SQL = f"""
    {_ADJ_CTE},
    {_UND_SQL},
    nbr AS (SELECT a AS node, b AS nb FROM und UNION ALL SELECT b, a FROM und),
    deg AS (SELECT node, COUNT(*) AS d FROM nbr GROUP BY node),
    common AS (
        SELECT x.node AS u, y.node AS v, COUNT(*) AS c
        FROM nbr x JOIN nbr y ON x.nb = y.nb AND x.node < y.node
        GROUP BY x.node, y.node HAVING COUNT(*) >= {MIN_PATHS}
    )
    SELECT c.u, c.v, CAST(c.c AS BIGINT) AS n_common,
           CAST(c.c AS DOUBLE) / (du.d + dv.d - c.c) AS jaccard
    FROM common c JOIN deg du ON du.node = c.u JOIN deg dv ON dv.node = c.v
    ORDER BY jaccard DESC, u, v
    """


@query("node_jaccard", oracle=_NODE_JACCARD_SQL)
def q_node_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood Jaccard similarity over the undirected simple graph:
    |N(u)∩N(v)| / |N(u)∪N(v)| for pairs sharing ≥ {MIN_PATHS} neighbors
    — the graph-native near-duplicate detector (two accounts moving
    money through the same counterparties).

    Shape: wedge join on the shared neighbor (same skeleton as the
    two-hop flagship — only existing edges shuffle), HAVING-pruned
    BEFORE the degree joins so the pair relation entering them is
    already candidate-sized. The division is a single IEEE op on exact
    integers — bit-identical cross-engine. Same hub caveat as J1; the
    salted twin is REGISTERED as `node_jaccard_salted` (r6) and
    measured against this form on the hub fixture by
    tools/skewprobe.py — see BASELINE.md's wedge-skew table."""
    return _node_jaccard(spark, sf_dir, salted=False)


@query("node_jaccard_salted", oracle=_NODE_JACCARD_SQL)
def q_node_jaccard_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X17 under explicit wedge-key salting — same oracle as
    `node_jaccard` (the salted plan must be bit-identical in results),
    the wedge family's `two_hop_salted` analogue. The shared-neighbor
    key's reduce work is deg(nb)² (QUADRATIC hub skew, worse than the
    flagship's in×out), so side x scatters over hash(node, nb) pmod 8
    sub-keys and side y replicates ×8 — hot/median 2.11×→1.41× on the
    hub fixture (BASELINE.md r6 wedge-skew table)."""
    return _node_jaccard(spark, sf_dir, salted=True)


def _node_jaccard(spark: SparkSession, sf_dir: str, salted: bool) -> DataFrame:
    adj = adjacency(spark, sf_dir)
    und = undirected_simple(adj)
    nbr = und.select(F.col("a").alias("node"), F.col("b").alias("nb")).unionAll(
        und.select(F.col("b").alias("node"), F.col("a").alias("nb"))
    )
    deg = nbr.groupBy("node").agg(F.count("*").alias("d"))
    common = (
        wedge_common_counts_salted(nbr, MIN_PATHS)
        if salted
        else wedge_common_counts(nbr, MIN_PATHS)
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    return (
        common.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            F.col("c").cast("long").alias("n_common"),
            (
                F.col("c").cast("double")
                / (F.col("du") + F.col("dv") - F.col("c"))
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "u", "v")
    )


def wedge_common_counts(nbr: DataFrame, min_common: int = MIN_PATHS) -> DataFrame:
    """The unsalted wedge-join core of `node_jaccard`: common-neighbor
    counts for node pairs sharing ≥ min_common neighbors. `nbr` is the
    symmetric (node, nb) neighbor relation."""
    # fanout_pin: wedge reduce work is deg(nb)² from a tiny-bytes input
    x, y = fanout_pin(nbr, "nb").alias("x"), nbr.alias("y")
    return (
        x.join(
            y,
            (F.col("x.nb") == F.col("y.nb"))
            & (F.col("x.node") < F.col("y.node")),
        )
        .groupBy(F.col("x.node").alias("u"), F.col("y.node").alias("v"))
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= min_common)
    )


def wedge_common_counts_salted(
    nbr: DataFrame, min_common: int = MIN_PATHS, salt_buckets: int = 8
) -> DataFrame:
    """Skew-hardened twin of `wedge_common_counts` (r5 verdict, "What's
    missing" #5 — the wedge family's salting, previously documented
    only): the shared-neighbor key `nb` is hot at a hub (its reduce
    work is deg(nb)², squared skew), so side x scatters each row over
    `salt_buckets` sub-keys — salt = hash(node, nb) pmod buckets — and
    side y replicates across all buckets. The join key becomes
    (nb, salt); a hub's quadratic wedge work spreads over salt_buckets
    tasks at the cost of ×buckets replication of side y. Every
    (x-row, y-row) wedge still meets exactly once, in exactly one
    bucket, so counts are unchanged — asserted bit-identical by
    tools/skewprobe.py on the hub fixture."""
    x = fanout_pin(
        nbr.select(
            "node",
            "nb",
            F.pmod(F.hash("node", "nb"), F.lit(salt_buckets)).alias("salt"),
        ),
        "nb",
        "salt",
    ).alias("x")
    y = nbr.select(
        "node",
        "nb",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("salt"),
    ).alias("y")
    return (
        x.join(
            y,
            (F.col("x.nb") == F.col("y.nb"))
            & (F.col("x.salt") == F.col("y.salt"))
            & (F.col("x.node") < F.col("y.node")),
        )
        .groupBy(F.col("x.node").alias("u"), F.col("y.node").alias("v"))
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= min_common)
    )


K_CORE_K = 6
K_CORE_ROUNDS = 12
#: strong-tie threshold: only pairs with >= this many parallel edges
#: (repeated interactions) enter the core computation — the derived
#: graph is near-complete on DISTINCT pairs, which would make any small
#: k trivially keep everything
K_CORE_MIN_MULT = 3


@query(
    "k_core",
    oracle=f"""
    WITH RECURSIVE edges AS ({EDGES_SQL}),
    und AS (
        SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM edges WHERE src <> dst
        GROUP BY 1, 2 HAVING COUNT(*) >= {K_CORE_MIN_MULT}
    ),
    sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
    nodes AS (SELECT DISTINCT a AS node FROM sym),
    gen AS (
        SELECT 0 AS r, (SELECT LIST(node) FROM nodes) AS members
        UNION ALL
        SELECT r + 1,
               (SELECT COALESCE(LIST(n), []) FROM (
                    SELECT s.a AS n
                    FROM sym s
                    WHERE list_contains(g.members, s.a)
                      AND list_contains(g.members, s.b)
                    GROUP BY s.a
                    HAVING COUNT(*) >= {K_CORE_K}
               ))
        FROM gen g WHERE g.r < {K_CORE_ROUNDS}
    )
    SELECT UNNEST(members) AS node FROM gen WHERE r = {K_CORE_ROUNDS}
    ORDER BY node
    """,
)
def q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{K_CORE_K}-core of the undirected simple graph: iteratively peel
    nodes with in-core degree < k. Both engines run EXACTLY
    {K_CORE_ROUNDS} peel rounds (a converged set is a fixpoint, so
    extra rounds are no-ops — fixed rounds make the iterative operator
    value-hash comparable without a convergence side-channel; the
    peel count needed is bounded by graph degeneracy, far below
    {K_CORE_ROUNDS} here, asserted by a fixpoint test).

    Spark shape: per round, LEFT-SEMI joins of the symmetric edge list
    against the surviving node set on each endpoint, one degree
    aggregate, one filter; `localCheckpoint` truncates the iterative
    lineage exactly as pagerank does. The join strategy is left to AQE
    (r4-verdict fix: no forced broadcast — the surviving node set is
    node-sized, and at 10⁹-node scale a forced broadcast OOMs the
    executors; AQE still picks broadcast when the set is small).
    The Spark side EXITS EARLY at the fixpoint: peeling is monotone
    (core_{{t+1}} ⊆ core_t), so an unchanged COUNT proves an unchanged
    SET, and all remaining rounds are no-ops — the result is identical
    to running the full {K_CORE_ROUNDS}, which the oracle still does
    (the count is read off the already-materialized checkpoint, so the
    convergence test costs no recompute).
    The DuckDB twin carries the member
    set as a LIST through a recursive CTE (the standard single-recursive-
    reference restriction forbids joining the working table twice).
    The input is the STRONG-TIE graph (pairs with ≥ K_CORE_MIN_MULT
    parallel edges): the distinct-pair graph is near-complete at test
    SFs and every small k would trivially keep all nodes."""
    from ..sources import edges as edges_src

    e = edges_src(spark, sf_dir)
    und = (
        e.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("m"))
        .filter(F.col("m") >= K_CORE_MIN_MULT)
        .select("a", "b")
    )
    sym = und.unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    # lazy checkpoints (r17): each count() is the materializing action,
    # halving the per-round job count; see truss_peel's note
    core = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev_n = core.count()
    for _ in range(K_CORE_ROUNDS):
        core = k_core_peel(sym, core, K_CORE_K).localCheckpoint(eager=False)
        n = core.count()
        if n == prev_n:  # monotone shrink → equal count == fixpoint
            break
        prev_n = n
    sym.unpersist()
    return core.orderBy("node")


K_TRUSS = 3      # keep edges in ≥ K_TRUSS−2 triangles (3-truss: ≥ 1)
TRUSS_ROUNDS = 6  # fixpoint reached in ≤2 rounds on the testdata (measured)

_STRONG_UND_SQL = f"""und0 AS MATERIALIZED (
        SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM edges WHERE src <> dst
        GROUP BY 1, 2 HAVING COUNT(*) >= {K_CORE_MIN_MULT}
    )"""


def edge_support(e: DataFrame, keys: tuple[str, ...] = ()) -> DataFrame:
    """Per-edge triangle support on an (*keys, a < b) simple edge
    relation: enumerate triangles a<b<c via the two-equi-join form (the
    `triangle_count` skeleton), then credit each of the three edges.
    `keys` prepends extra equality columns to BOTH triangle joins and
    every group key (the windowed truss passes ("w",): triads only
    close inside one window, and all windows compute in the same two
    shuffles — no per-window loop). The middle-node join key carries
    hub skew exactly like the flagship two-hop (the salting analogue is
    `two_hop_salted`; a degree-oriented variant is the `triangle_count`
    refinement); with keys, per-key work only SHRINKS (Σ_w deg_w² ≤
    deg² — measured 4.0× split, BASELINE.md r9 wtruss probe)."""
    kl = list(keys)
    x, y, z = e.alias("x"), e.alias("y"), e.alias("z")
    ycond = F.col("y.a") == F.col("x.b")
    zcond = (F.col("z.a") == F.col("x.a")) & (F.col("z.b") == F.col("y.b"))
    for c in kl:
        ycond = (F.col(f"y.{c}") == F.col(f"x.{c}")) & ycond
        zcond = (F.col(f"z.{c}") == F.col(f"x.{c}")) & zcond
    t = (
        x.join(y, ycond)
        .join(z, zcond)
        .select(
            *[F.col(f"x.{c}").alias(c) for c in kl],
            F.col("x.a").alias("a"),
            F.col("x.b").alias("b"),
            F.col("y.b").alias("c"),
        )
    )
    credits = (
        t.select(*kl, "a", "b")
        .unionAll(
            t.select(*kl, F.col("b").alias("a"), F.col("c").alias("b"))
        )
        .unionAll(t.select(*kl, "a", F.col("c").alias("b")))
    )
    return credits.groupBy(*kl, "a", "b").agg(F.count("*").alias("s"))


def truss_peel(
    e: DataFrame,
    keys: tuple[str, ...] = (),
    k: int = K_TRUSS,
    rounds: int = TRUSS_ROUNDS,
) -> tuple[DataFrame, bool]:
    """Shared edge-support peel loop (r9 review: one implementation
    serves the global and windowed trusses). `e` is a checkpointed
    (*keys, a, b) relation; returns (relation, converged): converged →
    (*keys, a, b, s) whose supports WERE computed on a set equal to the
    output set (reusable — the r7-review no-redundant-enumeration
    point); round budget exhausted → (*keys, a, b) pre-fixpoint, caller
    recomputes supports like the oracle's final supf pass. The
    (total-)count early exit is sound in both shapes: edge sets shrink
    monotonically per key group, so an unchanged GLOBAL count proves
    every group hit its fixpoint simultaneously."""
    kl = list(keys)
    prev_n = e.count()
    for _ in range(rounds):
        # lazy checkpoint (r17, guide §1/§2: fewer job barriers): the
        # count() on the next line is the materializing action, so the
        # round runs as ONE job instead of an eager-checkpoint job plus
        # a count job. Identical results — the RDD is checkpoint-marked
        # and cached by that same count, and every later consumer reads
        # the cached blocks exactly as before.
        e_next = (
            e.join(edge_support(e, keys), kl + ["a", "b"])
            .filter(F.col("s") >= k - 2)
            .select(*kl, "a", "b", "s")
            .localCheckpoint(eager=False)
        )
        n = e_next.count()
        if n == prev_n:
            return e_next, True
        e = e_next.select(*kl, "a", "b")
        prev_n = n
    return e, False


def _truss_oracle_sql(
    k: int,
    rounds: int,
    und0: str,
    keys: tuple[str, ...] = (),
    key_out: tuple[tuple[str, str], ...] = (),
) -> str:
    """Shared unrolled-truss DuckDB generator (r9 review: one generator
    serves `_k_truss_oracle` and `_k_truss_windowed_oracle` — the
    global form is the keys=() instance, semantically identical to the
    pre-refactor string; the refactor safety check compared the two
    WHITESPACE-NORMALIZED, and the final SELECT/USING clauses do differ
    in line breaks). One (triangles, support, filter) CTE triple
    per round; e{{i}} and t{{i}} are MATERIALIZED — each is referenced
    3× per round, and plain-CTE inlining would grow the expression tree
    3^rounds (the pagerank oracle lesson). `und0` supplies the strong
    edge CTE (must define und0 with columns (*keys, a, b)); `keys`
    threads extra equality columns through every join and group;
    `key_out` maps each key to its output alias."""
    kp = "".join(f"{c}, " for c in keys)
    ksel = "".join(f"x.{c} AS {c}, " for c in keys)
    ycond = "".join(f"y.{c} = x.{c} AND " for c in keys)
    zcond = "".join(f"z.{c} = x.{c} AND " for c in keys)
    esel = "".join(f"e.{c}, " for c in keys)
    using = ", ".join([*keys, "a", "b"])
    parts = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        und0,
        f"e0 AS MATERIALIZED (SELECT {kp}a, b FROM und0)",
    ]
    tri = (
        f"SELECT {ksel}x.a AS a, x.b AS b, y.b AS c FROM e{{i}} x "
        f"JOIN e{{i}} y ON {ycond}y.a = x.b "
        f"JOIN e{{i}} z ON {zcond}z.a = x.a AND z.b = y.b"
    )
    sup = (
        f"SELECT {kp}a, b, COUNT(*) AS s FROM ("
        f"SELECT {kp}a, b FROM t{{i}} "
        f"UNION ALL SELECT {kp}b AS a, c AS b FROM t{{i}} "
        f"UNION ALL SELECT {kp}a, c AS b FROM t{{i}}) GROUP BY {kp}a, b"
    )
    for i in range(rounds):
        parts.append(f"t{i} AS MATERIALIZED ({tri.format(i=i)})")
        parts.append(f"sup{i} AS ({sup.format(i=i)})")
        parts.append(
            f"e{i + 1} AS MATERIALIZED ("
            f"SELECT {esel}e.a, e.b FROM e{i} e JOIN sup{i} s "
            f"USING ({using}) "
            f"WHERE s.s >= {k - 2})"
        )
    parts.append(f"tf AS MATERIALIZED ({tri.format(i=rounds)})")
    parts.append(f"supf AS ({sup.format(i=rounds)})".replace(
        f"t{rounds}", "tf"
    ))
    osel = "".join(f"e.{c} AS {alias},\n        " for c, alias in key_out)
    order = ", ".join([alias for _, alias in key_out] + ["a", "b"])
    return (
        "WITH "
        + ", ".join(parts)
        + f""" SELECT {osel}e.a, e.b,
        CAST(COALESCE(s.s, 0) AS BIGINT) AS support
        FROM e{rounds} e LEFT JOIN supf s USING ({using})
        ORDER BY {order}"""
    )


def _k_truss_oracle(k: int = K_TRUSS, rounds: int = TRUSS_ROUNDS) -> str:
    """Unrolled DuckDB twin of `q_k_truss` — the keys=() instance of
    `_truss_oracle_sql`."""
    return _truss_oracle_sql(k, rounds, _STRONG_UND_SQL)


@query("k_truss", oracle=_k_truss_oracle())
def q_k_truss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{K_TRUSS}-truss of the strong-tie graph (X65, r7): iteratively
    drop edges in fewer than {K_TRUSS}−2 triangles until stable — the
    EDGE-cohesion analogue of k_core's node peel, and the standard
    cohesive-subgraph detector one notch stronger than connectivity
    (every surviving relationship is embedded in a closed triad; for
    audit work: pairwise flows that are part of mutually-confirming
    rings). Same strong-tie base as k_core (distinct-pair density would
    trivialize any small k), same fixed-round discipline
    ({TRUSS_ROUNDS} rounds; fixpoint ≤ 2 on the testdata, asserted by a
    one-more-peel test), same monotone early exit (edge sets only
    shrink, so an unchanged count proves the fixpoint). Output: the
    surviving edges with their in-truss support.

    Scale: each round is one triangle enumeration (two equi-joins, the
    `triangle_count` skeleton) + a grouped count + a filter —
    O(rounds · triangle work); `localCheckpoint` truncates the
    iterative lineage per the pagerank discipline."""
    from ..sources import edges as edges_src

    e0 = edges_src(spark, sf_dir)
    e = (
        e0.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("m"))
        .filter(F.col("m") >= K_CORE_MIN_MULT)
        .select("a", "b")
        # lazy: truss_peel's opening count materializes it (r17)
        .localCheckpoint(eager=False)
    )
    e, converged = truss_peel(e, (), K_TRUSS, TRUSS_ROUNDS)
    if converged:
        return e.select(
            "a", "b", F.col("s").cast("long").alias("support")
        ).orderBy("a", "b")
    # round limit exhausted pre-fixpoint: the last filter's supports were
    # computed on the PREVIOUS (larger) set — recompute on the survivors,
    # exactly like the oracle's final supf pass
    return (
        e.join(edge_support(e), ["a", "b"], "left")
        .select(
            "a",
            "b",
            F.coalesce("s", F.lit(0)).cast("long").alias("support"),
        )
        .orderBy("a", "b")
    )


#: windowed-truss sliding windows: 28d/14d (NOT the feature family's
#: 14d/7d — measured on the testdata: at 14d the per-window repeated-
#: pair graph closes ZERO triads at any multiplicity ≥ 2, so the
#: operator would be vacuous; at 28d/multiplicity ≥ 2 it yields
#: 10 / 4269 / 16390 per-window triangles at sf0.001/0.01/0.1)
WT_WINDOW = "28 days"
WT_SLIDE = "14 days"
_WT_SLIDE_US = 14 * 86400 * 1_000_000
_WT_WINDOW_US = 28 * 86400 * 1_000_000
#: sliding windows each event falls in (= window/slide ratio; F.window
#: requires the window be a multiple of the slide for this alignment).
#: _WT_EDGES_SQL's VALUES list and _formation_sql's first-window bound
#: are both derived from this, so retuning WT_WINDOW/WT_SLIDE moves the
#: oracles in lockstep with Spark's F.window (r11 ADVICE).
_WT_N_WINDOWS = _WT_WINDOW_US // _WT_SLIDE_US
assert _WT_WINDOW_US % _WT_SLIDE_US == 0, "window must be a multiple of slide"
#: per-window strong-tie threshold (global truss uses ≥ 3 over the
#: whole month; a 28-day window sees roughly half each pair's events)
WT_MIN_MULT = 2
WT_ROUNDS = 6

#: DuckDB fragment assigning each edge to its 2 sliding 28d/14d windows
#: — the epoch-aligned arithmetic twin of F.window(ts, 28d, 14d),
#: same construction the feature family validated byte-identical for
#: 14d/7d (`operators/features.py` WINDOWED_EDGES_SQL).
_WT_EDGES_SQL = f"""
    SELECT make_timestamp(((epoch_us(ts) // {_WT_SLIDE_US}) - k.k)
               * {_WT_SLIDE_US}) AS w,
           src, dst
    FROM edges, (VALUES {", ".join(f"({i})" for i in range(_WT_N_WINDOWS))}) k(k)
"""


def _k_truss_windowed_oracle(
    k: int = K_TRUSS, rounds: int = WT_ROUNDS
) -> str:
    """Unrolled DuckDB twin of `q_k_truss_windowed` — the keys=("w",)
    instance of `_truss_oracle_sql`, with the windowed strong-tie base
    CTE and the window aliased to window_start in the output."""
    und0 = f"""und0 AS MATERIALIZED (
        SELECT w, LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM ({_WT_EDGES_SQL}) WHERE src <> dst
        GROUP BY 1, 2, 3 HAVING COUNT(*) >= {WT_MIN_MULT})"""
    return _truss_oracle_sql(
        k, rounds, und0, keys=("w",), key_out=(("w", "window_start"),)
    )


@query("k_truss_windowed", oracle=_k_truss_windowed_oracle())
def q_k_truss_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{K_TRUSS}-truss per 28d/14d sliding window (X82, r9 — the r7
    verdict's temporal-cohesion ask): edges are assigned to T1 sliding
    windows first, the strong-tie relation is derived per (window,
    pair), and the edge-support peel runs with the window threaded
    through every join and group key — cohesion that appears in one
    window and dissolves in the next is the laundering-ring LIFECYCLE
    signal the reference's time-evolving framing (`AA-AR.py` windowed
    features) wants but never computes on the graph side. Output: each
    window's surviving edges with their in-window support.

    One loop serves ALL windows: per-window edge sets shrink
    monotonically, so the GLOBAL count is monotone and an unchanged
    global count proves every window simultaneously hit its fixpoint —
    the same count-provable early exit as the global truss, no
    per-window loop or driver-side window enumeration. Round cost is
    one window-partitioned triangle enumeration (w on every join key —
    windows never interact, so skew spreads across (w, node) keys) +
    one grouped count + one filter; localCheckpoint truncates the
    iterative lineage (pagerank discipline). Window params are 28d/14d
    with per-window multiplicity ≥ {WT_MIN_MULT} — measured (r9): the
    feature family's 14d/7d windows close zero triads on this data at
    any multiplicity ≥ 2, and distinct pairs (mult 1) are near-complete
    and trivialize any small k, exactly the global truss's
    K_CORE_MIN_MULT rationale. The strong-tie base comes from the
    shared `windowed_strong_ties` helper (r11 re-gate — it was inlined
    at birth because the r10 window had no re-gate slot; the swap
    retires the last duplicate of the derivation, so a WT_MIN_MULT or
    canonization retune now reaches the truss, the core and the probe
    from one site)."""
    from ..sources import edges as edges_src

    # lazy: truss_peel's opening count materializes it (r17)
    e = windowed_strong_ties(edges_src(spark, sf_dir)).localCheckpoint(
        eager=False
    )
    e, converged = truss_peel(e, ("w",), K_TRUSS, WT_ROUNDS)
    if converged:
        out = e.select(
            F.col("w").alias("window_start"),
            "a",
            "b",
            F.col("s").cast("long").alias("support"),
        )
    else:
        # round limit exhausted pre-fixpoint: recompute supports on the
        # survivors (the oracle's final supf pass)
        out = e.join(edge_support(e, ("w",)), ["w", "a", "b"], "left").select(
            F.col("w").alias("window_start"),
            "a",
            "b",
            F.coalesce("s", F.lit(0)).cast("long").alias("support"),
        )
    return out.orderBy("window_start", "a", "b")


def k_core_peel(
    sym: DataFrame, core: DataFrame, k: int, keys: tuple[str, ...] = ()
) -> DataFrame:
    """One k-core peel round: restrict the symmetric edge list to edges
    with BOTH endpoints surviving (left-semi joins — no broadcast hint,
    AQE picks the strategy; the surviving node set is node-sized), then
    keep nodes whose in-core degree is ≥ k. Module-level so the plan
    test can assert the no-forced-broadcast property directly.

    `keys` prepends extra equality columns to both semi-joins and the
    degree group key (the `edge_support` convention, r10): the windowed
    core passes ("w",) — nodes only support each other inside one
    window, and every window peels in the same two joins."""
    kl = list(keys)

    def _renamed(tag: str) -> DataFrame:
        # fresh aliases on every column: the peel output preserves the
        # key attributes through groupBy, so next round's `core` would
        # otherwise share attribute ids with `sym` and trip the
        # ambiguous-self-join check
        return core.select(
            *[F.col(c).alias(f"_{tag}_{c}") for c in kl],
            F.col("node").alias(f"{tag}_node"),
        )

    def _cond(endpoint: str, tag: str):
        cond = F.col(endpoint) == F.col(f"{tag}_node")
        for c in kl:
            cond = (F.col(c) == F.col(f"_{tag}_{c}")) & cond
        return cond

    return (
        sym.join(_renamed("a"), _cond("a", "a"), "left_semi")
        .join(_renamed("b"), _cond("b", "b"), "left_semi")
        .groupBy(*kl, "a")
        .agg(F.count("*").alias("deg"))
        .filter(F.col("deg") >= k)
        .select(*kl, F.col("a").alias("node"))
    )


#: windowed k-core unroll budget: measured fixpoint (rounds including
#: the confirming one) is ≤ 4 at sf0.001/0.01/0.1 — 8 gives 2× margin;
#: both engines run the same fixed rounds (a converged set is a
#: fixpoint, so extra rounds are no-ops), the Spark side exits early on
#: the count-provable fixpoint exactly like the global core.
KCW_ROUNDS = 8


def windowed_strong_ties(e0: DataFrame) -> DataFrame:
    """Per-window strong-tie relation (w, a, b): edges assigned to
    28d/14d sliding windows (WT_WINDOW/WT_SLIDE), self-loops dropped,
    endpoints canonized a < b, pairs kept at per-window multiplicity
    ≥ WT_MIN_MULT — the X82 derivation (its rationale and the measured
    14d-closes-zero-triads param study live on `q_k_truss_windowed`).
    Single source of truth for the whole windowed-cohesion family
    since the r11 re-gate: the truss (X82), the core (X86) and the
    dissolution reports all derive their base relation here."""
    return (
        e0.filter(F.col("src") != F.col("dst"))
        .withColumn("w", F.window("ts", WT_WINDOW, WT_SLIDE)["start"])
        .select(
            "w",
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .groupBy("w", "a", "b")
        .agg(F.count("*").alias("m"))
        .filter(F.col("m") >= WT_MIN_MULT)
        .select("w", "a", "b")
    )


def _k_core_windowed_oracle(
    k: int = K_CORE_K, rounds: int = KCW_ROUNDS
) -> str:
    """Unrolled DuckDB twin of `q_k_core_windowed`: one peel CTE per
    round, each restricting the symmetric strong-tie relation to edges
    with both endpoints in the previous round's core (two equi-joins —
    a non-recursive unroll has no single-recursive-reference
    restriction, so it needs neither the global core oracle's LIST
    workaround nor its quadratic `list_contains` scans) and keeping
    nodes with per-window degree ≥ k. MATERIALIZED per the truss-oracle
    lesson: each c{{i}} is referenced twice per round and plain-CTE
    inlining would grow the tree 2^rounds."""
    parts = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"""und AS MATERIALIZED (
        SELECT w, LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM ({_WT_EDGES_SQL}) WHERE src <> dst
        GROUP BY 1, 2, 3 HAVING COUNT(*) >= {WT_MIN_MULT})""",
        """sym AS MATERIALIZED (
        SELECT w, a, b FROM und UNION ALL SELECT w, b, a FROM und)""",
        "c0 AS MATERIALIZED (SELECT DISTINCT w, a AS node FROM sym)",
    ]
    for i in range(rounds):
        parts.append(
            f"""c{i + 1} AS MATERIALIZED (
        SELECT s.w, s.a AS node FROM sym s
        JOIN c{i} x ON x.w = s.w AND x.node = s.a
        JOIN c{i} y ON y.w = s.w AND y.node = s.b
        GROUP BY s.w, s.a HAVING COUNT(*) >= {k})"""
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f""" SELECT w AS window_start, node FROM c{rounds}
        ORDER BY window_start, node"""
    )


@query("k_core_windowed", oracle=_k_core_windowed_oracle())
def q_k_core_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{K_CORE_K}-core per 28d/14d sliding window (X86, r10 — the X82
    recipe applied to the node peel, the r9 verdict's birth #1): edges
    are assigned to sliding windows, the strong-tie relation is derived
    per (window, pair), and the degree peel runs with the window
    threaded through both semi-joins and the group key — the NODE-side
    half of the laundering-ring lifecycle signal `k_truss_windowed`
    computes on the edge side (a dense cell of accounts that holds
    k-core strength in one window and dissolves in the next is a
    transient ring; the global `k_core` cannot see the transition).
    Output: (window_start, node) for every node in its window's core.

    Params MEASURED before building (the X82 lesson): k = K_CORE_K
    ({K_CORE_K}, the global core's strength) over the windowed
    strong-tie relation at WT_MIN_MULT ≥ {WT_MIN_MULT} (a 28-day window
    sees roughly half each pair's events — the X82 rationale; the
    global core's mult ≥ {K_CORE_MIN_MULT} leaves only the middle
    window populated). Yields 0 / 435 / 2005 core nodes at
    sf0.001/0.01/0.1 — nonvacuous at the driver scale with a visible
    per-window lifecycle (150/150/135 across the three sf0.01 windows);
    the sf0.001 graph is too sparse for any k ≥ 3 windowed core
    (measured: only k = 2 survives there), which the planted
    transient-core test covers instead. Fixpoint ≤ 4 rounds measured at
    all three SFs (unroll budget {KCW_ROUNDS}).

    One loop serves ALL windows (the X82 argument verbatim): per-window
    core sets shrink monotonically, so the GLOBAL count is monotone and
    an unchanged global count proves every window simultaneously hit
    its fixpoint. Round cost is two window-keyed left-semi joins + one
    grouped count (AQE picks the join strategy — the surviving set is
    node-sized, never force-broadcast); skew on a hub node spreads
    across its (w, node) keys, and per-key work only shrinks vs the
    global peel (the wtruss-probe subadditivity argument transfers:
    Σ_w deg_w ≤ deg)."""
    from ..sources import edges as edges_src

    return k_core_windowed(edges_src(spark, sf_dir))


def k_core_windowed(
    e0: DataFrame, k: int = K_CORE_K, rounds: int = KCW_ROUNDS
) -> DataFrame:
    """Parametric kernel behind `q_k_core_windowed` (the
    `harmonic_centrality(adj, depth)` convention): the property tests
    drive it off the registered k on random multigraphs whose max
    degree sits below K_CORE_K. Runs `rounds` windowed peels with the
    count-provable early exit; a budget exhausted pre-fixpoint still
    matches the oracle's c_rounds exactly — peel^rounds(c0) is the same
    relation in both engines, no truss-style final recompute needed."""
    und = windowed_strong_ties(e0)
    sym = und.unionAll(
        und.select("w", F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    # lazy checkpoints (r17): each count() materializes — one job per
    # round instead of two; see truss_peel's note
    core = (
        sym.select("w", F.col("a").alias("node"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev_n = core.count()
    for _ in range(rounds):
        core = k_core_peel(sym, core, k, keys=("w",)).localCheckpoint(
            eager=False
        )
        n = core.count()
        if n == prev_n:  # monotone shrink → equal count == fixpoint
            break
        prev_n = n
    sym.unpersist()
    return core.select(F.col("w").alias("window_start"), "node").orderBy(
        "window_start", "node"
    )


def _windowed_component_census_sql() -> str:
    """DuckDB twin of `windowed_component_census`: the CC closure
    oracle (`_CC_CLOSURE_PARTS`' algorithm-independent min-reachable-id
    recursion) with the window key threaded through the recursion, over
    the SAME windowed strong-tie base CTE the truss/core oracles share
    — a shared derivation bug in Spark and SQL could not agree because
    the labeling is closure, not a mirrored round simulation."""
    return f"""
    WITH RECURSIVE edges AS ({EDGES_SQL}),
    und0 AS (
        SELECT w, LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM ({_WT_EDGES_SQL}) WHERE src <> dst
        GROUP BY 1, 2, 3 HAVING COUNT(*) >= {WT_MIN_MULT}),
    und AS (SELECT w, a, b FROM und0 UNION SELECT w, b, a FROM und0),
    nodes AS (SELECT DISTINCT w, a AS node FROM und),
    reach AS (
        SELECT w, node, node AS label FROM nodes
        UNION
        SELECT u.w, u.b AS node, r.label
        FROM reach r JOIN und u ON u.w = r.w AND u.a = r.node
    ),
    comp AS (
        SELECT w, node, MIN(label) AS component
        FROM reach GROUP BY w, node
    )
    SELECT w AS window_start, component,
           CAST(COUNT(*) AS BIGINT) AS n_members
    FROM comp GROUP BY 1, 2 ORDER BY 1, 2
    """


def q_windowed_component_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-window connected-component census (pre-built r15;
    registration awaits a free window slot — NOTES "Window capacity"):
    hash-min components of each 28d/14d window's strong-tie graph,
    reported as (window_start, component, n_members) with component =
    min member id — the CONSOLIDATION timeline the per-entity
    lifecycle reports cannot express (formation/dissolution/persistence
    say which accounts and pairs enter, hold, and leave the dense
    cell; this says how the cell's CONNECTIVITY coalesces: many small
    fragments merging into one giant component across consecutive
    windows is the ring-assembly trajectory at graph granularity, the
    time-evolving view of the reference's static component framing —
    `AA-Smurf.py:102-111` scores within one static graph). Measured
    before building (the X82/X86 discipline): census rows 10 / 26 / 77
    at sf0.001/0.01/0.1 with an analytically rich shape — the first
    partial window is fragmented (1→23→74 components as SF grows) and
    later windows consolidate to ONE giant component (60→106, 150,
    ~1500 members); fixpoint ≤ 7 hash-min rounds at every SF.

    One loop serves ALL windows (the X82/X86 argument transposed to
    label propagation): hash-min labels are componentwise
    non-increasing in EVERY window, so a globally-unchanged round
    proves every window simultaneously hit its fixpoint; the safety
    bound raises rather than returning non-converged labels (the
    `connected_components` contract). Scale shape: each round is one
    (w, node)-keyed equi join + one grouped min + the least/coalesce
    merge, all JVM; hub skew spreads across a hub's (w, node) keys
    and per-key work only shrinks vs the global graph (Σ_w deg_w ≤
    deg, the wtruss-probe subadditivity argument)."""
    from ..sources import edges as edges_src

    return component_census_windowed(edges_src(spark, sf_dir))


def component_census_windowed(
    e0: DataFrame, max_iter: int = 50
) -> DataFrame:
    """Parametric kernel behind `q_windowed_component_census`: hash-min
    label propagation keyed by (w, node) over the shared
    `windowed_strong_ties` relation, then the per-(window, component)
    member count. `max_iter` is the `connected_components` SAFETY
    BOUND, not a truncation — non-convergence raises (measured
    fixpoints 7/5/7 at the three SFs; a chain-like window would want
    the pointer-doubling form)."""
    st = windowed_strong_ties(e0)
    und = (
        st.unionAll(
            st.select("w", F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .persist()
    )
    labels = (
        und.select("w", F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    for _ in range(max_iter):
        neigh = (
            und.alias("u")
            .join(
                labels.alias("l"),
                (F.col("u.w") == F.col("l.w"))
                & (F.col("u.a") == F.col("l.node")),
            )
            .groupBy(F.col("u.w").alias("w"), F.col("u.b").alias("node"))
            .agg(F.min("l.label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh, ["w", "node"], "left")
            .select(
                "w",
                "node",
                F.least(
                    F.col("label"), F.coalesce("nlabel", F.col("label"))
                ).alias("label"),
            )
            # lazy lineage truncation (r17): the changed-probe count
            # materializes — one job per round
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), ["w", "node"])
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        # frees round 0's persist(); for checkpointed rounds it is a
        # no-op and the superseded checkpoint blocks are freed by GC —
        # the family discipline (see connected_components_jump), a
        # known trade accepted at the measured ≤7-round fixpoints. The
        # converged final round pays one superfluous checkpoint
        # materialization; computing `changed` pre-checkpoint would
        # instead re-execute the join plan every round — worse.
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        und.unpersist()
        raise ValueError(
            "windowed hash-min did not converge within the safety bound "
            "(a window's diameter exceeds it) — raise max_iter or use a "
            "pointer-doubling formulation for chain-like windows"
        )
    und.unpersist()
    return (
        labels.groupBy(
            F.col("w").alias("window_start"),
            F.col("label").alias("component"),
        )
        .agg(F.count("*").cast("long").alias("n_members"))
        .orderBy("window_start", "component")
    )


def _dissolution_sql(
    base: str, keys: tuple[str, ...], extra_cols: tuple[str, ...] = ()
) -> str:
    """Keyed DuckDB builder for the dissolution-report family: `base`
    is a per-window oracle emitting (window_start, *keys, *extra_cols),
    anti-joined against itself one slide later on (window_start,
    *keys). The observability bound comes from the DATA's last window
    (the k=0 branch at MAX(ts)), NOT from the base output — the X89
    review lesson: a base-derived max would silently drop a TOTAL
    collapse of the last populated window, the flagship wind-down
    event. Both dissolution oracles delegate here since the r13
    re-gate (`_truss_dissolution_sql` held a literal twin through r12;
    the oracle-generator test pinned this builder's ("a", "b") +
    ("support",) instance whitespace-identical to it, proving the swap
    a no-op — the r9 truss-kernel-unification safety check, now
    standing with the literal inlined in the test)."""
    sel = ", ".join(f"b.{c}" for c in ("window_start",) + keys + extra_cols)
    match = " AND ".join(f"n.{k} = b.{k}" for k in keys)
    order = ", ".join(f"b.{c}" for c in ("window_start",) + keys)
    return f"""
    WITH base AS ({base}),
    mx AS (SELECT make_timestamp((epoch_us(MAX(ts)) // {_WT_SLIDE_US})
               * {_WT_SLIDE_US}) AS mx FROM events)
    SELECT {sel}
    FROM base b, mx
    WHERE b.window_start < mx.mx
      AND NOT EXISTS (
        SELECT 1 FROM base n
        WHERE {match}
          AND n.window_start = b.window_start + INTERVAL '{WT_SLIDE}')
    ORDER BY {order}
    """


def _k_core_dissolution_sql() -> str:
    """DuckDB twin of `q_k_core_dissolution`: the windowed-core oracle
    as a CTE through the keyed dissolution builder — pure composition,
    exactly like the Spark side."""
    return _dissolution_sql(_k_core_windowed_oracle(), ("node",))


@query("k_core_dissolution", oracle=_k_core_dissolution_sql())
def q_k_core_dissolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core dissolution events (r11 birth — the X89 recipe composed on
    X86's output, the r10 verdict's slot #1): nodes in window w's
    {K_CORE_K}-core that are GONE from window (w + slide)'s core — the
    NODE-side wind-down list completing the lifecycle family
    (`truss_dissolution` reports which mutual-confirmation EDGES
    stopped, this reports which ACCOUNTS dropped out of the dense
    cell; an account that leaves the core while the core persists is a
    member exiting a live ring — a signal the edge report dilutes
    across its incident pairs). Output: (window_start, node) — the
    dissolved node at its last in-core window. Reference anchor: the
    time-evolving framing at `AA-AR.py:97-121` windows the FEATURES
    but never computes graph-side lifecycle.

    Semantics: a node at w is dissolved iff w is strictly before the
    DATA's last window (the max sliding-window start any event falls
    in — later windows' dissolutions are unobservable) and
    (w + slide, node) is absent from the core. The bound deliberately
    comes from the EVENTS, not the core output (the X89 review
    lesson): a core-derived max would exclude the strongest signal the
    operator exists for — the last core-bearing window collapsing
    ENTIRELY. Core-empty successor windows need no special case:
    absent-from-empty is absent, in both engines identically.
    Measured nonvacuous before building (end-r10 probe): 0 / 15 / 1170
    dissolving nodes at sf0.001/0.01/0.1 — the sf0.001 zero is covered
    by the planted appear-then-dissolve test instead.

    Scale shape (the X89 plan verbatim): the windowed core is computed
    once and localCheckpoint'd — the peel loop already checkpoints
    every round, so the consumer-level checkpoint here only shares the
    final projection/sort across this report's two consumers (unlike
    the truss twin, whose budget-exhausted path would otherwise replay
    a support recompute per consumer); on top sit one events max
    aggregate reduced to a 1-row broadcast cross join
    (parameter-sized) and one equi anti-join on (window_start, node)
    over core-sized relations (the slide shift is a projection, not a
    join condition, so the anti-join stays pure equi and
    AQE-plannable). The slide constant feeds both engines from
    WT_SLIDE/_WT_SLIDE_US (the r9-review probe-desync lesson)."""
    from ..sources import edges as edges_src

    e0 = edges_src(spark, sf_dir)
    return core_dissolution(k_core_windowed(e0), e0)


def dissolution(
    rel: DataFrame, e0: DataFrame, keys: tuple[str, ...]
) -> DataFrame:
    """Keyed dissolution kernel (the `edge_support(e, keys)` /
    `k_core_peel(keys=...)` convention): `rel` is any per-window
    relation carrying (window_start, *keys, ...extra columns), `e0`
    the edges whose window coverage bounds observability; returns the
    rows of `rel` whose (window_start + slide, *keys) is absent from
    `rel` and whose window precedes the DATA's last. The
    localCheckpoint shares one materialization of `rel` across the
    report's two consumers (the filter path and the shifted anti-join
    side) — without it each consumer replays `rel`'s final
    projection/sort, and for `q_truss_dissolution`'s budget-exhausted
    truss path the full support recompute. Since the r13 re-gate BOTH
    registered dissolution reports run through this kernel
    (`q_truss_dissolution` as `dissolution(truss, e0, ("a", "b"))`);
    the planted-K4 parity test pins the kernel form against the
    former literal body, inlined there."""
    kl = list(keys)
    r = rel.localCheckpoint()
    mx = (
        e0.select(F.window("ts", WT_WINDOW, WT_SLIDE)["start"].alias("w"))
        .agg(F.max("w").alias("mx"))
    )
    nxt = r.select(
        (F.col("window_start") - F.expr(f"INTERVAL {WT_SLIDE}")).alias(
            "window_start"
        ),
        *kl,
    )
    return (
        r.crossJoin(F.broadcast(mx))
        .filter(F.col("window_start") < F.col("mx"))
        .drop("mx")
        .join(nxt, ["window_start", *kl], "left_anti")
        .orderBy("window_start", *kl)
    )


def core_dissolution(core: DataFrame, e0: DataFrame) -> DataFrame:
    """Parametric composition behind `q_k_core_dissolution` (the
    `k_core_windowed(e0, k, rounds)` convention): `core` is any
    (window_start, node) per-window relation, `e0` the edges whose
    window coverage bounds observability — the property tests drive it
    off a k=2 windowed core on random multigraphs whose max degree
    sits below K_CORE_K."""
    return dissolution(core, e0, ("node",))


def _truss_dissolution_sql() -> str:
    """DuckDB twin of `q_truss_dissolution`: the windowed-truss oracle
    through the keyed dissolution builder with the support column
    carried — pure composition since the r13 re-gate. The literal SQL
    this replaced was pinned whitespace-identical to exactly this
    builder instance by the standing identity test through r12, so the
    swap is a proven no-op; the test now holds the former literal
    inline and pins it against this delegation (direction flipped),
    keeping the drift guard alive."""
    return _dissolution_sql(
        _k_truss_windowed_oracle(), ("a", "b"), ("support",)
    )


@query("truss_dissolution", oracle=_truss_dissolution_sql())
def q_truss_dissolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truss dissolution events (X89, r10 — the r9 verdict's birth #4;
    re-gated onto the keyed `dissolution` kernel r13 per the r12
    verdict's slot #2): edges in window w's {K_TRUSS}-truss that are
    GONE from window (w + slide)'s truss — the dissolution-event list
    an investigator actually reads (a mutually-confirming ring that
    stops confirming is the wind-down signal; `k_truss_windowed` shows
    each window's rings, this shows the transitions). Output:
    (window_start, a, b, support) — the dissolved edge with its
    last-seen in-truss support.

    Semantics: an edge at w is dissolved iff w is strictly before the
    DATA's last window (the max sliding-window start any event falls
    in — later windows' dissolutions are unobservable: the data does
    not cover a w + slide report) and (w + slide, a, b) is absent from
    the truss. The bound deliberately comes from the EVENTS, not the
    truss output (r10 review): a truss-derived max would exclude the
    strongest signal the operator exists for — the last truss-bearing
    window collapsing ENTIRELY, leaving empty trusses under later
    data. Truss-empty successor windows need no special case:
    absent-from-empty is absent, in both engines identically.

    Pure composition: `dissolution(truss, e0, ("a", "b"))` — support
    flows through the anti-join untouched. The kernel keeps every
    scale property the literal body had (it was extracted from it):
    the truss localCheckpoint'd once (the budget-exhausted fallback
    path replays a support recompute per consumer otherwise), one
    events max aggregate reduced to a 1-row broadcast cross join,
    one pure-equi anti-join on (window_start, a, b) (the slide shift
    is a projection, not a join condition — AQE-plannable). The slide
    constant feeds both engines from WT_SLIDE/_WT_SLIDE_US (the
    r9-review probe-desync lesson). The r12 parity test planted a K4
    collapse and pinned kernel ≡ literal on it; since the re-gate the
    same test pins registered-kernel ≡ inlined-literal."""
    from ..sources import edges as edges_src

    e0 = edges_src(spark, sf_dir)
    return dissolution(q_k_truss_windowed(spark, sf_dir), e0, ("a", "b"))


def _formation_sql(
    base: str, keys: tuple[str, ...], extra_cols: tuple[str, ...] = ()
) -> str:
    """Keyed DuckDB builder for the FORMATION-report family — the
    dissolution builder's mirror: rows of `base` whose (window_start −
    slide, *keys) is absent from `base`, bounded BELOW by the DATA's
    FIRST window (the min sliding-window start any event falls in —
    at the first window there is no predecessor report to compare
    against, the X89 observability lesson with the sign flipped).
    Backs `core_formation` (pre-built end-r11, registered r13)."""
    sel = ", ".join(f"b.{c}" for c in ("window_start",) + keys + extra_cols)
    match = " AND ".join(f"n.{k} = b.{k}" for k in keys)
    order = ", ".join(f"b.{c}" for c in ("window_start",) + keys)
    return f"""
    WITH base AS ({base}),
    mn AS (SELECT make_timestamp(
               ((epoch_us(MIN(ts)) // {_WT_SLIDE_US}) - {_WT_N_WINDOWS - 1})
               * {_WT_SLIDE_US}) AS mn FROM events)
    SELECT {sel}
    FROM base b, mn
    WHERE b.window_start > mn.mn
      AND NOT EXISTS (
        SELECT 1 FROM base n
        WHERE {match}
          AND n.window_start = b.window_start - INTERVAL '{WT_SLIDE}')
    ORDER BY {order}
    """


def formation(
    rel: DataFrame, e0: DataFrame, keys: tuple[str, ...]
) -> DataFrame:
    """Keyed formation kernel — `dissolution`'s mirror: the rows of
    `rel` whose (window_start − slide, *keys) is absent from `rel`
    and whose window FOLLOWS the DATA's first (an event at time t
    falls in the sliding windows starting at slot(t) and
    slot(t) − slide, so the data's first window is
    slot(MIN(ts)) − slide — at that window no predecessor report is
    observable, the X89 bound with the sign flipped). With
    `dissolution` this completes the lifecycle delta pair: a ring
    FORMS (appears with no predecessor) and DISSOLVES (disappears
    with no successor); both reports share `rel`'s plan shape — a
    1-row broadcast bound + one pure-equi anti-join."""
    kl = list(keys)
    r = rel.localCheckpoint()
    mn = (
        e0.select(F.window("ts", WT_WINDOW, WT_SLIDE)["start"].alias("w"))
        .agg(F.min("w").alias("mn"))
    )
    prv = r.select(
        (F.col("window_start") + F.expr(f"INTERVAL {WT_SLIDE}")).alias(
            "window_start"
        ),
        *kl,
    )
    return (
        r.crossJoin(F.broadcast(mn))
        .filter(F.col("window_start") > F.col("mn"))
        .drop("mn")
        .join(prv, ["window_start", *kl], "left_anti")
        .orderBy("window_start", *kl)
    )


def _core_formation_sql() -> str:
    """DuckDB twin of `core_formation` — the windowed-core oracle
    through the keyed formation builder."""
    return _formation_sql(_k_core_windowed_oracle(), ("node",))


@query("core_formation", oracle=_core_formation_sql())
def core_formation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core FORMATION events (pre-built end-r11, registered r13 — the
    r12 verdict's slot #1, the birth mirror of `k_core_dissolution`):
    nodes in window w's {K_CORE_K}-core ABSENT
    from window (w − slide)'s core — the ring-assembly event list (a
    dense cell of accounts appearing where none existed is the
    laundering-ring SPIN-UP signal; the dissolution report shows the
    wind-down, this shows the onboarding — an investigator reads the
    two as the ring's lifetime brackets). Output: (window_start,
    node) at the node's first in-core window. Measured nonvacuous
    end-r11: 150 / 1373 formed nodes at sf0.01/sf0.1 (sf0.001's core
    is empty at k={K_CORE_K}; planted tests carry the semantics, the
    X86/X90 pattern).

    Semantics: a node at w is formed iff w strictly follows the
    DATA's first window (windows before coverage are unobservable —
    the first window's cores have no predecessor report, exactly the
    X89/X90 events-derived bound with MIN in place of MAX and the
    slide shift flipped) and (w − slide, node) is absent from the
    core. Core-empty predecessor windows need no special case:
    absent-from-empty is absent, in both engines identically.

    Scale shape: identical to `k_core_dissolution` (the `formation`
    kernel is `dissolution` with the shift sign and bound flipped) —
    one checkpointed windowed core, a 1-row broadcast bound, one
    pure-equi anti-join on (window_start, node)."""
    from ..sources import edges as edges_src

    e0 = edges_src(spark, sf_dir)
    return formation(k_core_windowed(e0), e0, ("node",))


def _persistence_sql(base: str, keys: tuple[str, ...]) -> str:
    """Keyed DuckDB builder for the PERSISTENCE-report family — the
    third lifecycle report after dissolution (wind-down) and formation
    (spin-up): maximal runs of CONSECUTIVE windows each keys-group
    stays in `base` (gaps-and-islands: window slot index minus
    per-group ROW_NUMBER is constant exactly along a slide-consecutive
    run; both engines truncate the positive epoch//slide identically).
    `base` must emit at most one row per (window_start, *keys) — every
    family member does (groupBy/HAVING or DISTINCT outputs); a
    duplicate would split island arithmetic in BOTH engines the same
    way, but the precondition is documented rather than paid for with
    a defensive DISTINCT. Backs `core_persistence` (pre-built r12,
    registered r14 when the window slot opened — NOTES "Window
    capacity")."""
    kl = ", ".join(keys)
    return f"""
    WITH base AS ({base}),
    isl AS (
        SELECT window_start, {kl},
               (epoch_us(window_start) // {_WT_SLIDE_US})
                   - ROW_NUMBER() OVER (
                         PARTITION BY {kl} ORDER BY window_start) AS grp
        FROM base
    )
    SELECT {kl}, MIN(window_start) AS run_start,
           MAX(window_start) AS run_end,
           CAST(COUNT(*) AS BIGINT) AS n_windows
    FROM isl
    GROUP BY {kl}, grp
    ORDER BY {kl}, run_start
    """


def persistence(rel: DataFrame, keys: tuple[str, ...]) -> DataFrame:
    """Keyed persistence kernel (the `dissolution`/`formation`
    convention): `rel` is any per-window relation carrying
    (window_start, *keys) with at most one row per pair; returns one
    row per maximal run of slide-consecutive windows the keys-group
    holds membership — (*keys, run_start, run_end, n_windows). The
    classic gaps-and-islands: slot = epoch_us(window_start) div slide
    (exact BIGINT — window starts are slide-aligned and positive, and
    Spark `div` / DuckDB `//` truncate identically there), rn = per-key
    ROW_NUMBER by window_start, and slot − rn is constant precisely
    along a consecutive run. Every column is integer or timestamp
    arithmetic — hash-stable cross-engine with no float discipline
    needed.

    Lifecycle algebra (asserted on real data by the cross-operator
    identity test): Σ n_windows = |rel|; runs with run_start AFTER the
    data's first window are exactly the formation events; runs with
    run_end BEFORE the data's last window are exactly the dissolution
    events — the three reports are views of one island decomposition,
    so an investigator can pivot between "when did it form", "how long
    did it hold", and "when did it dissolve" without reconciliation.

    Scale shape: one hash exchange partitions by *keys for the
    ROW_NUMBER (per-key sequences are window-count-bounded — ≤ a few
    hundred rows per key even at 100 TB, no skew surface), then one
    grouped aggregation on (*keys, grp); both operate on the
    report-sized relation, negligible next to the windowed peel that
    produces it."""
    from pyspark.sql.window import Window

    kl = list(keys)
    win = Window.partitionBy(*kl).orderBy("window_start")
    slot = F.expr(f"unix_micros(window_start) div {_WT_SLIDE_US}")
    return (
        rel.select("window_start", *kl)
        .withColumn("grp", slot - F.row_number().over(win))
        .groupBy(*kl, "grp")
        .agg(
            F.min("window_start").alias("run_start"),
            F.max("window_start").alias("run_end"),
            F.count("*").cast("long").alias("n_windows"),
        )
        .drop("grp")
        .orderBy(*kl, "run_start")
    )


def _core_persistence_sql() -> str:
    """DuckDB twin of `core_persistence` — the windowed-core oracle
    through the keyed persistence builder, pure composition like the
    dissolution/formation twins."""
    return _persistence_sql(_k_core_windowed_oracle(), ("node",))


@query("core_persistence", oracle=_core_persistence_sql())
def core_persistence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core PERSISTENCE report (pre-built r12, registered r14 — the
    r13 verdict's slot #1, completing the formation / dissolution /
    persistence lifecycle triple): for every node, the maximal runs of consecutive
    28d/14d windows it holds {K_CORE_K}-core strength — (node,
    run_start, run_end, n_windows). Formation says a ring spun up,
    dissolution says it wound down; persistence is the duration signal
    in between (a cell that holds core strength for many consecutive
    windows is an ESTABLISHED ring — a standing-infrastructure signal
    the two delta reports cannot express, and the reference's
    time-evolving framing (`AA-AR.py:97-121`) scores snapshots without
    ever computing tenure). Measured before building (the X82/X86
    discipline): run-length histogram {{2: 15, 3: 135}} at sf0.01 and
    {{1: 902, 2: 310, 3: 161}} at sf0.1 — a rich nonvacuous
    distribution at both driver scales (sf0.001's k={K_CORE_K} core is
    empty; the planted tests carry the semantics).

    Scale shape: the windowed core is computed once (no second
    consumer here — no checkpoint needed); on top sit one keys-hash
    exchange for the per-node ROW_NUMBER and one grouped aggregation,
    both on the core-sized relation."""
    from ..sources import edges as edges_src

    return persistence(k_core_windowed(edges_src(spark, sf_dir)), ("node",))


def _truss_formation_sql() -> str:
    """DuckDB twin of `truss_formation` — the windowed-truss oracle
    through the keyed formation builder with the support column
    carried, the exact mirror of `_truss_dissolution_sql`'s keyed
    form."""
    return _formation_sql(
        _k_truss_windowed_oracle(), ("a", "b"), ("support",)
    )


@query("truss_formation", oracle=_truss_formation_sql())
def truss_formation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truss FORMATION events (pre-built r12, registered r15 in the
    slot freed by retiring the rows-only `doc_fingerprint` driver row —
    the r14 verdict's swap ruling #1): edges in window w's
    {K_TRUSS}-truss ABSENT from window (w − slide)'s truss, with their
    first-seen in-truss support — the EDGE-side spin-up list
    completing the lifecycle bracket `truss_dissolution` opened on the
    wind-down side (a mutually-confirming pair appearing where none
    existed is the ring-assembly signal at edge granularity;
    `core_formation` reports which ACCOUNTS onboard, this reports
    which CONFIRMATION RELATIONSHIPS switch on). Measured before
    building: 2276 / 13209 formed edges at sf0.01 / sf0.1 —
    richly nonvacuous at both driver scales.

    Pure composition: `formation(truss, e0, ("a", "b"))` — the keyed
    kernel proven by the core-side planted/hypothesis/identity tests;
    support flows through the anti-join untouched exactly as it does
    through the dissolution kernel. Scale shape identical to
    `truss_dissolution`: one checkpointed windowed truss, a 1-row
    broadcast bound, one pure-equi anti-join."""
    from ..sources import edges as edges_src

    e0 = edges_src(spark, sf_dir)
    return formation(q_k_truss_windowed(spark, sf_dir), e0, ("a", "b"))


def _truss_persistence_sql() -> str:
    """DuckDB twin of `truss_persistence` — the windowed-truss oracle
    through the keyed persistence builder."""
    return _persistence_sql(_k_truss_windowed_oracle(), ("a", "b"))


def truss_persistence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truss PERSISTENCE report (pre-built r12; registration awaits a
    free window slot): for every edge, the maximal runs of consecutive
    28d/14d windows the pair holds {K_TRUSS}-truss strength — (a, b,
    run_start, run_end, n_windows), the edge-side tenure signal
    (`core_persistence` measures account tenure in the dense cell;
    this measures how long each mutual-confirmation RELATIONSHIP
    holds, the duration complement of the formation/dissolution delta
    pair). Support is per-window and varies along a run, so the run
    report drops it by design — the per-window `k_truss_windowed`
    carries it. Measured before building: run histogram
    {1: 1449, 2: 803, 3: 27} at sf0.01, {1: 10549, 2: 2634, 3: 26}
    at sf0.1.

    Pure composition: `persistence(truss, ("a", "b"))` — one keys-hash
    exchange for the per-pair ROW_NUMBER, one grouped aggregation,
    both on the report-sized relation."""
    return persistence(q_k_truss_windowed(spark, sf_dir), ("a", "b"))


@query(
    "clustering_coefficient",
    oracle=f"""
    {_ADJ_CTE},
    {_UND_SQL},
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
            SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
        GROUP BY node
    ),
    tri AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
            SELECT e1.a AS node FROM und e1
            JOIN und e2 ON e2.a = e1.b
            JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
            UNION ALL
            SELECT e1.b FROM und e1
            JOIN und e2 ON e2.a = e1.b
            JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
            UNION ALL
            SELECT e2.b FROM und e1
            JOIN und e2 ON e2.a = e1.b
            JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
        GROUP BY node
    )
    SELECT d.node, d.deg, COALESCE(t.triangles, 0) AS triangles,
           ROUND(2.0 * COALESCE(t.triangles, 0) / (d.deg * (d.deg - 1)), 6)
               AS coef
    FROM deg d LEFT JOIN tri t ON t.node = d.node
    WHERE d.deg >= 2
    ORDER BY d.node
    """,
)
def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient 2·T(v)/(deg·(deg−1)) on the
    undirected simple graph — the standard "how clique-like is this
    account's neighborhood" audit feature (fraud rings score high, smurf
    fan-out stars score ~0), complementing the global `triangle_count`.

    Same canonical a<b triangle enumeration (each triangle found once),
    then credited to all three vertices via a 3-way UNION ALL before the
    per-node count — no explode, no Python. Triangle-free nodes zero-fill
    through the left join. Scale: identical join shape to
    `triangle_count` (degree-orientation is the hub refinement there and
    applies unchanged here); the credit union triples rows pre-combine
    but map-side combine collapses them before the shuffle."""
    adj = adjacency(spark, sf_dir)
    und = undirected_simple(adj)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri_nodes = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z"))
    )
    credit = (
        tri_nodes.select(F.col("x").alias("node"))
        .unionAll(tri_nodes.select(F.col("y").alias("node")))
        .unionAll(tri_nodes.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("triangles"))
    )
    tri = F.coalesce(F.col("triangles"), F.lit(0)).cast("long")
    return (
        deg.join(credit, "node", "left")
        .filter(F.col("deg") >= 2)
        .select(
            "node",
            "deg",
            tri.alias("triangles"),
            F.round(
                F.lit(2.0) * tri / (F.col("deg") * (F.col("deg") - 1)), 6
            ).alias("coef"),
        )
        .orderBy("node")
    )


@query(
    "edge_reciprocity",
    oracle=f"""
    {_ADJ_CTE},
    dir AS (SELECT src, dst FROM adj WHERE src <> dst)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(CASE WHEN EXISTS (
               SELECT 1 FROM dir r WHERE r.src = d.dst AND r.dst = d.src)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_reciprocal,
           ROUND(CAST(SUM(CASE WHEN EXISTS (
               SELECT 1 FROM dir r WHERE r.src = d.dst AND r.dst = d.src)
               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS reciprocity
    FROM dir d
    """,
)
def q_edge_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed-edge reciprocity: the fraction of distinct edges u→v
    whose reverse v→u also exists — money flowing straight back is a
    laundering-loop primitive (the 2-cycle special case of
    `temporal_cycles`), and graph-level reciprocity is the audit
    baseline those flags are judged against.

    One self-equi-join on the swapped key (left-semi, so matched edges
    count once), then a global aggregate — two shuffles on edge keys,
    no explode, scales as the edge list."""
    adj = adjacency(spark, sf_dir)
    d = adj.filter(F.col("src") != F.col("dst"))
    rev = d.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = d.join(rev, ["src", "dst"], "left_semi")
    return (
        d.agg(F.count("*").cast("long").alias("n_edges"))
        .crossJoin(recip.agg(F.count("*").cast("long").alias("n_recip")))
        .select(
            "n_edges",
            F.col("n_recip").alias("n_reciprocal"),
            F.round(
                F.col("n_recip").cast("double") / F.col("n_edges"), 6
            ).alias("reciprocity"),
        )
    )


@query(
    "degree_assortativity",
    oracle=f"""
    {_ADJ_CTE},
    {_UND_SQL},
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
            SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
        GROUP BY node
    ),
    pairs AS (
        SELECT da.deg AS x, db.deg AS y
        FROM und e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b
        UNION ALL
        SELECT db.deg, da.deg
        FROM und e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sx2,
               CAST(SUM(y * y) AS BIGINT) AS sy2
        FROM pairs
    )
    SELECT n AS n_pairs,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sx2 - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * sy2
                           - CAST(sy AS DOUBLE) * sy)), 6) AS assortativity
    FROM s
    """,
)
def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002): Pearson correlation of
    endpoint degrees over every undirected edge counted in both
    orientations. Negative values — hubs attached to leaves — are the
    smurf-star signature at graph level, the aggregate counterpart of
    AutoAudit's per-pattern MDL blocks.

    Cross-engine-exact because every correlation input (n, Σx, Σy, Σxy,
    Σx², Σy²) is an exact integer sum; the final Pearson formula runs in
    double with a pinned operation order. Two broadcast-sized degree
    joins + one global aggregate; the pair relation is 2|E| rows,
    map-side-combined to six numbers."""
    adj = adjacency(spark, sf_dir)
    und = undirected_simple(adj)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    da = deg.withColumnsRenamed({"node": "a", "deg": "dx"})
    db = deg.withColumnsRenamed({"node": "b", "deg": "dy"})
    joined = und.join(da, "a").join(db, "b")
    pairs = joined.select(F.col("dx").alias("x"), F.col("dy").alias("y")).unionAll(
        joined.select(F.col("dy").alias("x"), F.col("dx").alias("y"))
    )
    s = pairs.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sx2"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("sy2"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = nd * F.col("sxy") - sxd * F.col("sy")
    den = F.sqrt(nd * F.col("sx2") - sxd * F.col("sx")) * F.sqrt(
        nd * F.col("sy2") - syd * F.col("sy")
    )
    return s.select(
        F.col("n").alias("n_pairs"),
        F.round(num / den, 6).alias("assortativity"),
    )


#: temporal-cycle report horizon: cycles completing within this many
#: microseconds of the first hop (fast round-trips are the suspicious ones)
CYCLE_SPAN_US = 2 * 86_400_000_000


@query(
    "temporal_cycles",
    oracle=f"""
    WITH edges AS ({EDGES_SQL}),
    fe AS (
        SELECT src, dst, min(ts) AS ts
        FROM edges WHERE src <> dst GROUP BY src, dst
    )
    SELECT e1.src AS a, e2.src AS b, e3.src AS c,
           e1.ts AS ts1, e3.ts AS ts3,
           epoch_us(e3.ts) - epoch_us(e1.ts) AS span_us
    FROM fe e1
    JOIN fe e2 ON e2.src = e1.dst AND e2.ts > e1.ts
    JOIN fe e3 ON e3.src = e2.dst AND e3.dst = e1.src AND e3.ts > e2.ts
    WHERE e1.src <> e2.dst
      AND epoch_us(e3.ts) - epoch_us(e1.ts) <= {CYCLE_SPAN_US}
    ORDER BY a, b, c
    """,
)
def q_temporal_cycles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-respecting 3-cycles a→b→c→a with strictly increasing first-
    transaction timestamps, completing within 2 days — the canonical
    round-tripping / layering pattern an auditor hunts for (money leaves
    and returns through two intermediaries). Strict ts ordering picks
    exactly ONE rotation per cycle (the one starting at the earliest
    edge), so no canonicalization dedup is needed.

    Edges are first collapsed to first-contact (src,dst,min ts) — the
    multigraph never enters the joins. Two equi-joins on node keys with
    the time predicates as cheap post-filters; the span bound prunes the
    third join's output. Same skeleton as `triangle_count`, so the
    degree-orientation hub refinement applies; at 100 TB the additional
    lever is partitioning fe by src (both joins key on it)."""
    from ..sources import edges as edges_src

    edges_df = edges_src(spark, sf_dir)
    fe = (
        edges_df.filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("ts").alias("ts"))
    )
    e1, e2, e3 = fe.alias("e1"), fe.alias("e2"), fe.alias("e3")
    span = F.unix_micros(F.col("e3.ts")) - F.unix_micros(F.col("e1.ts"))
    return (
        e1.join(
            e2,
            (F.col("e2.src") == F.col("e1.dst"))
            & (F.col("e2.ts") > F.col("e1.ts")),
        )
        .join(
            e3,
            (F.col("e3.src") == F.col("e2.dst"))
            & (F.col("e3.dst") == F.col("e1.src"))
            & (F.col("e3.ts") > F.col("e2.ts")),
        )
        .filter(
            (F.col("e1.src") != F.col("e2.dst")) & (span <= CYCLE_SPAN_US)
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e2.src").alias("b"),
            F.col("e3.src").alias("c"),
            F.col("e1.ts").alias("ts1"),
            F.col("e3.ts").alias("ts3"),
            span.alias("span_us"),
        )
        .orderBy("a", "b", "c")
    )


#: negative-sampling parameters: J candidate draws per node, K kept
NEG_DRAWS = 8
NEG_KEEP = 3
_NEG_SEED = 77


@query(
    "negative_edge_sample",
    oracle=f"""
    {_ADJ_CTE},
    nodes AS (
        SELECT DISTINCT node FROM (
            SELECT src AS node FROM adj UNION ALL SELECT dst FROM adj)
    ),
    cand AS (
        SELECT n.node AS src, j.j,
               (((n.node % 1000003) * 2654435761 + j.j * 97 + {_NEG_SEED})
                   % 1000003)
                   % (SELECT MAX(node) + 1 FROM nodes) AS dst
        FROM nodes n
        CROSS JOIN (SELECT UNNEST(range({NEG_DRAWS})) AS j) j
    ),
    valid AS (
        SELECT c.src, c.j, c.dst
        FROM cand c
        JOIN nodes v ON v.node = c.dst
        WHERE c.dst <> c.src
          AND NOT EXISTS (SELECT 1 FROM adj a
                          WHERE a.src = c.src AND a.dst = c.dst)
    ),
    dedup AS (
        SELECT src, j, dst FROM (
            SELECT src, j, dst,
                   ROW_NUMBER() OVER (PARTITION BY src, dst ORDER BY j) AS r1
            FROM valid) WHERE r1 = 1
    )
    SELECT src, dst, CAST(j AS BIGINT) AS draw
    FROM (
        SELECT src, dst, j,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY j) AS r2
        FROM dedup) WHERE r2 <= {NEG_KEEP}
    ORDER BY src, dst
    """,
)
def q_negative_edge_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative-edge sampling: up to K non-edges per node,
    drawn by modular hash over the data-derived id span — the training-data counterpart of the graph
    operators (link-prediction / GNN training needs negatives sampled
    reproducibly, not via rand()). Candidates are generated MAP-SIDE
    (node × J arithmetic, no N² cross join), validated against the node
    universe, and anti-joined against the real edge set; dedup and top-K
    are two windows over node-keyed, J-bounded relations.

    At 100 TB: candidate volume is |V|×J rows (linear), the anti-join
    hashes on the edge key, and nothing enumerates non-edges blindly —
    the standard trick for sampling the O(N²) complement in O(N·J)."""
    adj = adjacency(spark, sf_dir)
    nodes = (
        adj.select(F.col("src").alias("node"))
        .unionAll(adj.select(F.col("dst").alias("node")))
        .distinct()
    )
    j = spark.range(NEG_DRAWS).select(F.col("id").alias("j"))
    # candidate modulus = node-id span (max+1), derived from the DATA —
    # a fixture constant here would bias every negative into one id
    # block at larger scale factors (sf0.1's ~1500-node universe)
    mod_df = nodes.agg((F.max("node") + 1).alias("mod"))
    cand = (
        nodes.crossJoin(F.broadcast(j))
        .crossJoin(F.broadcast(mod_df))
        .select(
            F.col("node").alias("src"),
            "j",
            # node is reduced mod the prime BEFORE the multiply (ADVICE
            # r4): (node % p)·2654435761 stays under int64 for any id,
            # where node·2654435761 overflows past node ≈ 3.5e9 —
            # silently in non-ANSI Spark, loudly in DuckDB. Same residue
            # class → identical draws on non-overflowing inputs.
            (
                ((F.col("node") % 1000003) * 2654435761
                 + F.col("j") * 97 + _NEG_SEED)
                % 1000003
                % F.col("mod")
            ).alias("dst"),
        )
    )
    valid = (
        cand.filter(F.col("dst") != F.col("src"))
        .join(nodes.withColumnRenamed("node", "dst"), "dst", "left_semi")
        .join(adj, ["src", "dst"], "left_anti")
    )
    from pyspark.sql.window import Window

    w1 = Window.partitionBy("src", "dst").orderBy("j")
    dedup = (
        valid.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") == 1)
        .drop("r1")
    )
    w2 = Window.partitionBy("src").orderBy("j")
    return (
        dedup.withColumn("r2", F.row_number().over(w2))
        .filter(F.col("r2") <= NEG_KEEP)
        .select("src", "dst", F.col("j").cast("long").alias("draw"))
        .orderBy("src", "dst")
    )


#: synchronous label-propagation rounds (fixed — makes the iteration
#: hash-comparable, the k_core discipline)
LPA_ROUNDS = 3


def _lpa_oracle() -> str:
    parts = [
        f"edges AS ({EDGES_SQL})",
        "adj AS (SELECT DISTINCT src, dst FROM edges)",
        """und AS (
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM adj WHERE src <> dst)""",
        "sym AS (SELECT a AS node, b AS nbr FROM und "
        "UNION ALL SELECT b, a FROM und)",
        """l0 AS (
        SELECT node, node AS lbl FROM (
            SELECT DISTINCT node FROM (
                SELECT a AS node FROM und UNION ALL SELECT b FROM und)))""",
    ]
    for r in range(1, LPA_ROUNDS + 1):
        parts.append(
            f"""cnt{r} AS (
            SELECT s.node, l.lbl, COUNT(*) AS c
            FROM sym s JOIN l{r - 1} l ON l.node = s.nbr
            GROUP BY s.node, l.lbl)"""
        )
        parts.append(
            f"""pick{r} AS (
            SELECT node, lbl FROM (
                SELECT node, lbl,
                       ROW_NUMBER() OVER (PARTITION BY node
                           ORDER BY c DESC, lbl) AS rn
                FROM cnt{r}) WHERE rn = 1)"""
        )
        parts.append(
            f"l{r} AS (SELECT n.node, COALESCE(p.lbl, n.lbl) AS lbl, "
            f"n.lbl AS prev_lbl "
            f"FROM l{r - 1} n LEFT JOIN pick{r} p USING (node))"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f""" SELECT node, lbl AS label,
        CAST(CASE WHEN lbl <> prev_lbl THEN 1 ELSE 0 END AS BIGINT)
            AS changed
        FROM l{LPA_ROUNDS} ORDER BY node"""
    )


@query("label_propagation", oracle=_lpa_oracle())
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) on the
    undirected simple graph: every node adopts the MODE of its
    neighbors' labels each round (count desc, lowest-label tie-break —
    fully deterministic, unlike the randomized original), {LPA_ROUNDS}
    fixed rounds. The mode update finds dense communities that the
    min-label `connected_components` (which only finds connectivity)
    cannot — fraud rings separate from the giant component's hub mesh.

    Per round: one neighbor join + grouped count + per-node argmax
    window — all keyed on node, exchange-reusable; labels relation is
    localCheckpoint()ed per round so the iterative plan stays O(1)
    depth (the k_core/pagerank discipline). Fixed rounds keep the
    DuckDB twin an unrolled CTE chain."""
    from pyspark.sql.window import Window

    adj = adjacency(spark, sf_dir)
    und = undirected_simple(adj)
    sym = und.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionAll(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    ).localCheckpoint()
    labels = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
        .localCheckpoint()
    )
    w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("lbl"))
    for _ in range(LPA_ROUNDS):
        cnt = (
            sym.join(
                labels.withColumnsRenamed({"node": "nbr", "lbl": "lbl"}),
                "nbr",
            )
            .groupBy("node", "lbl")
            .agg(F.count("*").alias("c"))
        )
        pick = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", F.col("lbl").alias("new_lbl"))
        )
        labels = (
            labels.join(pick, "node", "left")
            .select(
                "node",
                F.coalesce("new_lbl", "lbl").alias("next_lbl"),
                # pre-update label rides along so the final round can
                # emit a convergence flag at zero extra shuffles
                # (r6 verdict #8); intermediate rounds drop it
                F.col("lbl").alias("prev_lbl"),
            )
            .withColumnsRenamed({"next_lbl": "lbl"})
            .localCheckpoint()
        )
    return labels.select(
        "node",
        F.col("lbl").alias("label"),
        # changed=1 ⇒ the fixed round count had not converged at this
        # node — Σ changed is the residual a user checks on THEIR graph
        (F.col("lbl") != F.col("prev_lbl")).cast("long").alias("changed"),
    ).orderBy("node")


@query(
    "two_hop_temporal",
    oracle=f"""
    WITH edges AS ({EDGES_SQL})
    SELECT a.src AS src, b.dst AS dst, CAST(COUNT(*) AS BIGINT) AS path_cnt
    FROM edges a JOIN edges b ON a.dst = b.src AND a.ts < b.ts
    WHERE a.src <> a.dst AND b.src <> b.dst
    GROUP BY a.src, b.dst
    HAVING COUNT(*) >= {MIN_PATHS}
    ORDER BY path_cnt DESC, src, dst
    """,
)
def q_two_hop_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-respecting flagship twin: only two-hop paths whose first hop
    STRICTLY PRECEDES the second count (money can't be forwarded before
    it arrives) — the temporally-plausible layering count, run on the
    full MULTIGRAPH (every transaction pair, not the distinct
    adjacency, because timing lives on individual transactions). The
    static flagship (`two_hop_candidates`) over-counts paths that are
    temporally impossible; the delta between the two relations is
    itself an audit signal.

    Same single equi-join shape as the flagship with the ts predicate
    as a cheap post-condition; hub salting (`two_hop_salted`) applies
    verbatim when the multigraph fan-out concentrates."""
    from ..sources import edges as edges_src

    e = edges_src(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.dst") == F.col("b.src"))
            & (F.col("a.ts") < F.col("b.ts")),
        )
        .groupBy(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        .agg(F.count("*").cast("long").alias("path_cnt"))
        .filter(F.col("path_cnt") >= MIN_PATHS)
        .orderBy(F.col("path_cnt").desc(), "src", "dst")
    )


@query(
    "two_hop_flow",
    oracle=f"""
    WITH edges AS ({EDGES_SQL})
    SELECT a.src AS src, b.dst AS dst,
           CAST(COUNT(*) AS BIGINT) AS path_cnt,
           CAST(ROUND(SUM(LEAST(CAST(a.weight AS DECIMAL(18,2)),
                                CAST(b.weight AS DECIMAL(18,2)))), 2)
                AS DOUBLE) AS flow_capacity
    FROM edges a JOIN edges b ON a.dst = b.src AND a.ts < b.ts
    WHERE a.src <> a.dst AND b.src <> b.dst
    GROUP BY a.src, b.dst
    HAVING COUNT(*) >= {MIN_PATHS}
    ORDER BY flow_capacity DESC, src, dst
    """,
)
def q_two_hop_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flow-weighted layering strength: per candidate pair, the summed
    BOTTLENECK capacity min(w₁, w₂) over its time-respecting two-hop
    paths — a pair moving real money through intermediaries ranks above
    one with many trivial paths, which pure path COUNTS (the reference's
    `AA-Smurf.py:102-111` criterion) cannot distinguish. DECIMAL money
    math end to end (LEAST on exact decimals, order-free decimal sum)."""
    from ..sources import edges as edges_src

    e = edges_src(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    a, b = e.alias("a"), e.alias("b")
    cap = F.least(
        F.col("a.weight").cast("decimal(18,2)"),
        F.col("b.weight").cast("decimal(18,2)"),
    )
    return (
        a.join(
            b,
            (F.col("a.dst") == F.col("b.src"))
            & (F.col("a.ts") < F.col("b.ts")),
        )
        .groupBy(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        .agg(
            F.count("*").cast("long").alias("path_cnt"),
            F.round(F.sum(cap), 2).cast("double").alias("flow_capacity"),
        )
        .filter(F.col("path_cnt") >= MIN_PATHS)
        .orderBy(F.col("flow_capacity").desc(), "src", "dst")
    )


#: butterfly pruning: a dst pair needs >= 2 common srcs to close any
#: 2x2 biclique at all.
MIN_BUTTERFLY_COMMON = 2

_BUTTERFLY_SQL = f"""
    {_ADJ_CTE},
    pairs AS (
        SELECT x.dst AS d1, y.dst AS d2, COUNT(*) AS c
        FROM adj x JOIN adj y ON x.src = y.src AND x.dst < y.dst
        GROUP BY x.dst, y.dst
        HAVING COUNT(*) >= {MIN_BUTTERFLY_COMMON}
    ),
    bf AS (SELECT d1, d2, (c * (c - 1)) // 2 AS nb FROM pairs)
    SELECT node, CAST(SUM(nb) AS BIGINT) AS butterflies
    FROM (SELECT d1 AS node, nb FROM bf
          UNION ALL SELECT d2 AS node, nb FROM bf)
    GROUP BY node
    ORDER BY butterflies DESC, node
    """


def _butterfly_counts(
    spark: SparkSession, sf_dir: str, salted: bool
) -> DataFrame:
    adj = adjacency(spark, sf_dir)
    nbr = adj.select(
        F.col("dst").alias("node"), F.col("src").alias("nb")
    )
    common = (
        wedge_common_counts_salted(nbr, MIN_BUTTERFLY_COMMON)
        if salted
        else wedge_common_counts(nbr, MIN_BUTTERFLY_COMMON)
    )
    pairs = common.withColumn("bfl", F.expr("c * (c - 1) div 2"))
    return (
        pairs.select(
            F.explode(F.array(F.col("u"), F.col("v"))).alias("node"),
            "bfl",
        )
        .groupBy("node")
        .agg(F.sum("bfl").alias("butterflies"))
        .orderBy(F.desc("butterflies"), "node")
    )


@query("butterfly_counts", oracle=_BUTTERFLY_SQL)
def q_butterfly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-destination butterfly (2x2 biclique) counts on the bipartite
    src->dst transfer graph (X72, r7): a butterfly is two accounts both
    paying the SAME two counterparties — the smallest fraud-ring motif
    (shared-mule evidence that degree or triangle counts on the
    projected graph cannot attribute back to the counterparty). For
    each dst, the number of butterflies it participates in.

    Shape (the side-choice argument from public butterfly-counting work,
    e.g. Sanei-Mehri et al. 2018): wedge on the SRC side — per-account
    distinct-counterparty fan-out is bounded by the counterparty
    catalog, so wedge volume is Sum_u C(fanout(u), 2), LINEAR in
    accounts; wedging on dst instead would cost C(accounts-per-dst, 2)
    on every hot counterparty — quadratic in accounts. The wedge core
    IS `wedge_common_counts` with (node=dst, shared key=src) — the same
    measured kernel as `node_jaccard`, so the whole wedge-skew story
    (tools/skewprobe.py, BASELINE.md) transfers: a super-source's
    quadratic work concentrates on its src key, and the REGISTERED
    salted twin `butterfly_counts_salted` spreads it ×8. The dst-pair
    relation out of the wedge aggregate is at most C(|catalog|, 2)
    rows, so everything downstream of the one wedge shuffle is
    catalog-sized. Both endpoint contributions come from ONE pass over
    that relation (explode, not a self-referencing union, so the wedge
    join is computed once — no cache needed). C(c,2) and the per-node
    sums are exact BIGINT; the oracle's `//` truncation equals floor
    here because c >= {MIN_BUTTERFLY_COMMON} keeps the product
    non-negative (the X45 signed-`//` caveat does not arise)."""
    return _butterfly_counts(spark, sf_dir, salted=False)


@query("butterfly_counts_salted", oracle=_BUTTERFLY_SQL)
def q_butterfly_counts_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-hardened butterfly twin (X72, r7): identical semantics and
    oracle as `butterfly_counts`, with the wedge core swapped for
    `wedge_common_counts_salted` — a super-source account's quadratic
    pair work scatters over 8 salt sub-keys (side x salt =
    hash(node, nb) pmod 8, side y replicated ×8; every wedge meets
    exactly once). The one-swap mitigation for the production case the
    unsalted docstring names: a src whose distinct-counterparty fan-out
    is itself huge (bulk payer / exchange wallet), where C(fanout,2)
    on one key dominates the stage. Measured on the hub fixture by
    tools/skewprobe.py (BASELINE.md wedge-skew table — same kernel)."""
    return _butterfly_counts(spark, sf_dir, salted=True)


_BUTTERFLY_SRC_SQL = f"""
    {_ADJ_CTE},
    wdg AS (
        SELECT x.src AS s, x.dst AS d1, y.dst AS d2
        FROM adj x JOIN adj y ON x.src = y.src AND x.dst < y.dst
    ),
    p AS (
        SELECT d1, d2, COUNT(*) AS c FROM wdg GROUP BY d1, d2
        HAVING COUNT(*) >= {MIN_BUTTERFLY_COMMON}
    )
    SELECT w.s AS node, CAST(SUM(p.c - 1) AS BIGINT) AS butterflies
    FROM wdg w JOIN p USING (d1, d2)
    GROUP BY w.s
    ORDER BY butterflies DESC, node
    """


@query("butterfly_counts_src", oracle=_BUTTERFLY_SRC_SQL)
def q_butterfly_counts_src(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE butterfly counts (X83, r9 — the symmetric X72 view):
    for each paying account, the number of 2×2 bicliques it sits in —
    the smurf-side reading of the shared-mule motif (two accounts both
    paying the same two counterparties; X72 credits the counterparties,
    this credits the payers).

    NOT the naive opposite-side wedge: wedging on the dst key costs
    C(accounts-per-counterparty, 2) on every hot counterparty —
    quadratic in ACCOUNTS, the exact blowup the X72 docstring rejects.
    Instead this keeps X72's cheap src-side wedge but RETAINS the
    wedge's src endpoint: for a dst pair (d1, d2) with c common
    sources, each of those sources sits in (c − 1) of its C(c, 2)
    butterflies, so per-src counts = Σ over the src's wedges of
    (c_{{d1,d2}} − 1). Shape: the wedge relation (one src-keyed
    self-join, volume Σ_u C(fanout(u), 2) — linear in accounts), one
    grouped count to the catalog-pair-sized c relation, one equi-join
    of the wedges back to it (AQE broadcasts it when small; never
    forced — C(|catalog|, 2) is data-sized), one per-src sum. Exact
    BIGINT throughout. Identity check: Σ_src butterflies =
    Σ_pairs c(c−1) = 2 × total butterflies = Σ_dst butterflies
    (asserted by the parity test against X72 on the planted K₂,₃).
    The wedge join key is src — the bulk-payer skew probe and ×8
    salting story transfer verbatim (BASELINE.md r7 butterfly table);
    the wedge is consumed twice (count + credit), so it is
    localCheckpoint()ed per the measured plan-sharing discipline
    (A/B at sf0.1 warm: 1.89–2.37 s checkpointed vs 1.95–2.80 s
    recomputed)."""
    adj = adjacency(spark, sf_dir)
    x, y = fanout_pin(adj, "src").alias("x"), adj.alias("y")
    wdg = (
        x.join(
            y,
            (F.col("y.src") == F.col("x.src"))
            & (F.col("x.dst") < F.col("y.dst")),
        )
        .select(
            F.col("x.src").alias("s"),
            F.col("x.dst").alias("d1"),
            F.col("y.dst").alias("d2"),
        )
        .localCheckpoint()
    )
    p = (
        wdg.groupBy("d1", "d2")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= MIN_BUTTERFLY_COMMON)
    )
    return (
        wdg.join(p, ["d1", "d2"])
        .groupBy(F.col("s").alias("node"))
        .agg(F.sum(F.col("c") - 1).cast("long").alias("butterflies"))
        .orderBy(F.desc("butterflies"), "node")
    )


_BUTTERFLY_W_SQL = f"""
    WITH edges AS MATERIALIZED ({EDGES_SQL}),
    wadj AS MATERIALIZED (
        SELECT DISTINCT w, src, dst FROM ({_WT_EDGES_SQL})),
    pairs AS (
        SELECT x.w AS w, x.dst AS d1, y.dst AS d2, COUNT(*) AS c
        FROM wadj x JOIN wadj y
          ON y.w = x.w AND y.src = x.src AND x.dst < y.dst
        GROUP BY 1, 2, 3
        HAVING COUNT(*) >= {MIN_BUTTERFLY_COMMON}
    ),
    bf AS MATERIALIZED (SELECT w, d1, d2, (c * (c - 1)) // 2 AS nb FROM pairs)
    SELECT w AS window_start, node, CAST(SUM(nb) AS BIGINT) AS butterflies
    FROM (SELECT w, d1 AS node, nb FROM bf
          UNION ALL SELECT w, d2 AS node, nb FROM bf)
    GROUP BY 1, 2
    ORDER BY window_start, butterflies DESC, node
    """


@query("butterfly_counts_windowed", oracle=_BUTTERFLY_W_SQL)
def q_butterfly_counts_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window butterfly counts (X88, r10 — the r9 verdict's birth
    #3): X72's per-destination 2×2-biclique report computed inside each
    28d/14d sliding window — the TEMPORAL reading of the strongest
    static motif the engine has. A counterparty whose butterflies
    appear in one window and dissolve in the next is a shared-mule cell
    forming and disbanding; the global `butterfly_counts` sums the
    lifecycle away. Output: (window_start, node, butterflies) per
    counterparty per window it closes any biclique in.

    Shape: X72's side-choice argument lifted by the X82 window
    convention — the distinct per-window adjacency (w, src, dst)
    wedges on the (w, src) key (fan-out per account per window is
    bounded by the counterparty catalog; per-key wedge volume only
    SHRINKS vs the global wedge since Σ_w C(fanout_w, 2) ≤ C(fanout, 2)
    — the wtruss-probe subadditivity argument), the (w, dst-pair)
    aggregate is at most |windows| × C(|catalog|, 2) rows, and both
    endpoint credits come from one explode pass over it. Exact BIGINT
    throughout; the oracle's `//` equals floor because
    c ≥ {MIN_BUTTERFLY_COMMON} keeps the product non-negative (the X45
    caveat does not arise). Measured (r10 param study): butterflies
    are abundant per window at every SF (14,160 / 1.80M summed
    C(c,2) at sf0.001/0.01), so no threshold retuning was needed —
    MIN_BUTTERFLY_COMMON transfers as-is. The bulk-payer skew story
    transfers from X72 per (w, src) key — MEASURED (r10,
    `tools/skewprobe.py … bfw`, BASELINE.md): a rotating-counterparty
    bulk payer's hottest windowed key carries 2.26× less wedge work
    than the global single-key envelope, and per-task load stays
    balanced (max/median 1.12), so no salted windowed twin is
    warranted; the one-swap (`butterfly_counts_salted`) remains the
    mitigation if a fixture ever shows otherwise."""
    from ..sources import edges as edges_src

    e0 = edges_src(spark, sf_dir)
    wadj = (
        e0.withColumn("w", F.window("ts", WT_WINDOW, WT_SLIDE)["start"])
        .select("w", "src", "dst")
        .distinct()
    )
    x, y = fanout_pin(wadj, "w", "src").alias("x"), wadj.alias("y")
    common = (
        x.join(
            y,
            (F.col("y.w") == F.col("x.w"))
            & (F.col("y.src") == F.col("x.src"))
            & (F.col("x.dst") < F.col("y.dst")),
        )
        .groupBy(
            F.col("x.w").alias("w"),
            F.col("x.dst").alias("d1"),
            F.col("y.dst").alias("d2"),
        )
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= MIN_BUTTERFLY_COMMON)
    )
    pairs = common.withColumn("bfl", F.expr("c * (c - 1) div 2"))
    return (
        pairs.select(
            "w", F.explode(F.array(F.col("d1"), F.col("d2"))).alias("node"),
            "bfl",
        )
        .groupBy("w", "node")
        .agg(F.sum("bfl").alias("butterflies"))
        .select(F.col("w").alias("window_start"), "node", "butterflies")
        .orderBy("window_start", F.desc("butterflies"), "node")
    )


#: succession report size — the top similarity pairs, annotated with
#: activity-span overlap, that an investigator reviews
SUCCESSION_TOPK = 100

_SUCCESSION_SQL = f"""
    {_ADJ_CTE},
    deg AS (SELECT src, COUNT(*) AS d FROM adj GROUP BY src),
    common AS (
        SELECT x.src AS u, y.src AS v, COUNT(*) AS c
        FROM adj x JOIN adj y ON x.dst = y.dst AND x.src < y.src
        GROUP BY x.src, y.src
        HAVING COUNT(*) >= {MIN_PATHS}
    ),
    spans AS (
        SELECT user_id AS src,
               CAST(epoch_us(MIN(ts)) AS BIGINT) AS f,
               CAST(epoch_us(MAX(ts)) AS BIGINT) AS l
        FROM events GROUP BY user_id
    ),
    pairs AS (
        SELECT c.u, c.v, CAST(c.c AS BIGINT) AS n_common,
               CAST(c.c AS DOUBLE) / (du.d + dv.d - c.c) AS jaccard,
               GREATEST(0, LEAST(su.l, sv.l) - GREATEST(su.f, sv.f))
                   AS ov,
               GREATEST(su.l, sv.l) - LEAST(su.f, sv.f) AS un,
               GREATEST(su.f, sv.f) - LEAST(su.l, sv.l) AS gap_us
        FROM common c
        JOIN deg du ON du.src = c.u
        JOIN deg dv ON dv.src = c.v
        JOIN spans su ON su.src = c.u
        JOIN spans sv ON sv.src = c.v
    )
    SELECT u, v, n_common, jaccard,
           CASE WHEN un > 0 THEN CAST(ov AS DOUBLE) / un
                ELSE CAST(0.0 AS DOUBLE) END AS overlap_frac,
           CAST(gap_us AS BIGINT) AS gap_us
    FROM pairs
    ORDER BY jaccard DESC, u, v
    LIMIT {SUCCESSION_TOPK}
    """


@query("account_succession", oracle=_SUCCESSION_SQL)
def q_account_succession(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-succession candidates (X79, r7): pairs of accounts with
    near-identical counterparty sets, annotated with how their ACTIVITY
    SPANS relate — the rotating-account pattern (a flagged smurf
    account is retired and a fresh one takes over the same mule
    network: high counterparty Jaccard, near-zero span overlap,
    positive gap). Top {SUCCESSION_TOPK} pairs by Jaccard; overlap_frac
    (intersection/union of the two activity intervals) and gap_us
    (positive = fully disjoint, negative = overlap amount) let the
    investigator sort the succession tail from mere co-membership.

    Shape: the `wedge_common_counts` kernel with (node=src, shared
    key=dst) — the OPPOSITE orientation from `butterfly_counts`, so
    here the quadratic hot key is a popular counterparty (deg² sender
    pairs); the measured wedge-skew mitigations (BASELINE.md — salted
    kernel one swap away, df-cap at source) apply verbatim. Span
    bounds are one user-keyed min/max aggregate in exact epoch MICROS
    (unix_micros / epoch_us — BIGINT in both engines; second-truncating
    extractions would diverge); jaccard and overlap_frac are single
    IEEE divisions on exact integers. The top-k cut has a total
    (jaccard DESC, u, v) order, so the LIMIT boundary is deterministic
    cross-engine."""
    from ..sources import edges as edges_src

    adj = adjacency(spark, sf_dir)
    nbr = adj.select(F.col("src").alias("node"), F.col("dst").alias("nb"))
    common = wedge_common_counts(nbr, MIN_PATHS)
    deg = adj.groupBy("src").agg(F.count("*").alias("d"))
    spans = (
        edges_src(spark, sf_dir)
        .groupBy(F.col("src"))
        .agg(
            F.unix_micros(F.min("ts")).alias("f"),
            F.unix_micros(F.max("ts")).alias("l"),
        )
    )
    du = deg.select(F.col("src").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("src").alias("v"), F.col("d").alias("dv"))
    su = spans.select(
        F.col("src").alias("u"), F.col("f").alias("fu"), F.col("l").alias("lu")
    )
    sv = spans.select(
        F.col("src").alias("v"), F.col("f").alias("fv"), F.col("l").alias("lv")
    )
    ov = F.greatest(
        F.lit(0).cast("long"),
        F.least("lu", "lv") - F.greatest("fu", "fv"),
    )
    un = F.greatest("lu", "lv") - F.least("fu", "fv")
    gap = F.greatest("fu", "fv") - F.least("lu", "lv")
    return (
        common.join(du, "u")
        .join(dv, "v")
        .join(su, "u")
        .join(sv, "v")
        .select(
            "u",
            "v",
            F.col("c").cast("long").alias("n_common"),
            (
                F.col("c").cast("double")
                / (F.col("du") + F.col("dv") - F.col("c"))
            ).alias("jaccard"),
            F.when(un > 0, ov.cast("double") / un)
            .otherwise(F.lit(0.0))
            .alias("overlap_frac"),
            gap.cast("long").alias("gap_us"),
        )
        .orderBy(F.desc("jaccard"), "u", "v")
        .limit(SUCCESSION_TOPK)
    )


# ---------------------------------------------------------------------------
# Banked (pre-built, unregistered): deterministic walk-corpus generation
# ---------------------------------------------------------------------------

#: walks started per out-edge-bearing node and fixed walk depth. Depth is
#: a PLAN constant (it sets the number of unrolled join stages in both
#: engines), not a data-dependent fixpoint — no convergence loop, no
#: checkpoint discipline needed (contrast the CC/peel family).
WALKS_PER_NODE = 2
WALK_DEPTH = 6
#: modulus for the engine-portable walk-step hash (llm.text.HASH_P's
#: twin): every intermediate stays < 2^63 in BIGINT math on both engines
_WALK_P = 1000000007
#: dst-packing radix: h * 2^31 + dst fits BIGINT (h < 1e9+7 < 2^30,
#: dst < 2^31), so MIN over the packed key is a deterministic argmin
#: with the dst recoverable by one modulo — no min_by/arg_min needed,
#: and the plain MIN aggregate is map-side combinable.
_WALK_RADIX = 2147483648


def _walk_radix_guard(adj: DataFrame) -> DataFrame:
    """Runtime radix guard (r16 advice): the packed argmin
    `MIN(h*2^31 + dst) % 2^31` decodes the WRONG node on both engines
    if dst ever reaches 2^31 — identically wrong, so the cross-engine
    oracle cannot detect the violation. Trip loudly instead:
    assert_true yields NULL for every conforming row (the filter passes
    everything, results unchanged) and raises mid-job on the first
    violating one. One JVM-side comparison per adjacency row; the
    DuckDB twin needs no counterpart because results are unaffected."""
    return adj.filter(
        F.assert_true(
            F.col("dst") < _WALK_RADIX,
            F.lit(
                "walk packed-argmin radix violated: dst >= 2^31; widen "
                "_WALK_RADIX (and the oracle twin) before trusting walks"
            ),
        ).isNull()
    )


def _walk_step_hash_sql(t: int) -> str:
    """The portable per-candidate hash at step `t`, as DuckDB SQL over
    columns (walk_id, dst) — byte-identical algebra to the Spark
    expression in `walk_corpus` (same multiply/add/mod sequence, fully
    parenthesized so both engines reduce identically)."""
    return (
        f"(((((walk_id * 1000003 + {t}) % {_WALK_P}) * 1000003 + dst) "
        f"% {_WALK_P}) * 131 + 17) % {_WALK_P}"
    )


def _walk_corpus_cte(
    walks_per_node: int = WALKS_PER_NODE, depth: int = WALK_DEPTH
) -> str:
    """The shared CTE chain: adj + one CTE per step + a `corpus` CTE
    unioning them — composed by both `_walk_corpus_sql` and
    `_walk_skipgram_sql` (the `_pq_train_cte_parts` dedup lesson)."""
    ctes = [
        f"""s0 AS (
        SELECT CAST(node * {walks_per_node} + k.k AS BIGINT) AS walk_id,
               node
        FROM (SELECT DISTINCT src AS node FROM adj)
        CROSS JOIN (SELECT UNNEST(range(0, {walks_per_node})) AS k) k
    )"""
    ]
    for t in range(1, depth + 1):
        ctes.append(
            f"""s{t} AS (
        SELECT walk_id,
               MIN(({_walk_step_hash_sql(t)}) * {_WALK_RADIX} + dst)
                   % {_WALK_RADIX} AS node
        FROM s{t - 1} JOIN adj ON s{t - 1}.node = adj.src
        GROUP BY walk_id
    )"""
        )
    selects = [
        f"SELECT walk_id, CAST({t} AS BIGINT) AS step, node FROM s{t}"
        for t in range(0, depth + 1)
    ]
    corpus = "corpus AS (\n        " + "\n        UNION ALL ".join(selects) + "\n    )"
    return f"{_ADJ_CTE},\n    " + ",\n    ".join(ctes + [corpus])


def _walk_corpus_sql(
    walks_per_node: int = WALKS_PER_NODE, depth: int = WALK_DEPTH
) -> str:
    """Unrolled DuckDB twin of `walk_corpus`: one CTE per step (the
    HITS/PPR unrolled-oracle pattern), each an equi-join + grouped
    packed-MIN argmin over the shared adjacency derivation."""
    return (
        _walk_corpus_cte(walks_per_node, depth)
        + "\n    SELECT walk_id, step, node FROM corpus"
        + "\n    ORDER BY walk_id, step"
    )


#: skip-gram context radius: pairs (center, context) with
#: 1 <= |step_center - step_context| <= window
SKIPGRAM_WINDOW = 2


def _walk_skipgram_sql(
    walks_per_node: int = WALKS_PER_NODE,
    depth: int = WALK_DEPTH,
    window: int = SKIPGRAM_WINDOW,
) -> str:
    """DuckDB twin of `walk_skipgram_pairs`: the corpus CTE chain + one
    within-walk banded self-join + grouped count."""
    return (
        _walk_corpus_cte(walks_per_node, depth)
        + f"""
    SELECT a.node AS center, b.node AS context,
           CAST(COUNT(*) AS BIGINT) AS pair_cnt
    FROM corpus a JOIN corpus b
      ON a.walk_id = b.walk_id
     AND b.step BETWEEN a.step - {window} AND a.step + {window}
     AND a.step <> b.step
    GROUP BY a.node, b.node
    ORDER BY center, context"""
    )


def walk_skipgram_pairs(
    spark: SparkSession,
    sf_dir: str,
    walks_per_node: int = WALKS_PER_NODE,
    depth: int = WALK_DEPTH,
    window: int = SKIPGRAM_WINDOW,
) -> DataFrame:
    """Skip-gram training-pair extraction (pre-built r16, banked with
    `walk_corpus` — together they are the full graph-embedding data
    prep: graph → walk corpus → (center, context, pair_cnt) co-occurrence
    counts, the exact input relation a distributed word2vec/DeepWalk
    trainer consumes). For every walk, every ordered pair of positions
    within `window` steps of each other contributes one count; the
    aggregated multiplicity (rather than one row per occurrence) is
    what a trainer with frequency-weighted sampling wants, and it
    collapses the output from corpus×window rows to the co-occurrence
    support.

    Scale posture (100 TB): the self-join keys on walk_id — walks are
    bounded at `depth`+1 rows each, so the per-key fan-out is at most
    (depth+1)·2·window regardless of graph size (no hub sensitivity:
    hot NODES spread over many distinct walk_ids and only meet again
    in the final grouped count, which combines map-side). One shuffle
    for the self-join, one for the (center, context) aggregation."""
    c = _walk_corpus_df(spark, sf_dir, walks_per_node, depth)
    a = c.select(
        "walk_id", F.col("step").alias("sa"), F.col("node").alias("center")
    )
    b = c.select(
        "walk_id", F.col("step").alias("sb"), F.col("node").alias("context")
    )
    return (
        a.join(b, "walk_id")
        .filter(
            (F.col("sb") >= F.col("sa") - window)
            & (F.col("sb") <= F.col("sa") + window)
            & (F.col("sa") != F.col("sb"))
        )
        .groupBy("center", "context")
        .agg(F.count("*").cast("long").alias("pair_cnt"))
        .orderBy("center", "context")
    )


def _walk_corpus_df(
    spark: SparkSession,
    sf_dir: str,
    walks_per_node: int,
    depth: int,
) -> DataFrame:
    """Unordered corpus plan — `walk_corpus` adds the presentation
    sort; `walk_skipgram_pairs` consumes this form directly so the
    self-join is not built over a wasted global sort. Full semantics
    documented on `walk_corpus` below."""
    adj = _walk_radix_guard(adjacency(spark, sf_dir))
    starts = adj.select(F.col("src").alias("node")).distinct()
    cur = starts.select(
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("k"),
        "node",
    ).select(
        (F.col("node") * walks_per_node + F.col("k"))
        .cast("long")
        .alias("walk_id"),
        "node",
    )
    steps = [cur.select("walk_id", F.lit(0).cast("long").alias("step"), "node")]
    for t in range(1, depth + 1):
        h = (F.col("walk_id") * 1000003 + F.lit(t)) % _WALK_P
        h = (h * 1000003 + F.col("dst")) % _WALK_P
        h = (h * 131 + 17) % _WALK_P
        cur = (
            cur.join(adj, cur["node"] == adj["src"])
            .groupBy("walk_id")
            .agg(
                (F.min(h * _WALK_RADIX + F.col("dst")) % _WALK_RADIX).alias(
                    "node"
                )
            )
        )
        steps.append(
            cur.select("walk_id", F.lit(t).cast("long").alias("step"), "node")
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out


def walk_corpus(
    spark: SparkSession,
    sf_dir: str,
    walks_per_node: int = WALKS_PER_NODE,
    depth: int = WALK_DEPTH,
) -> DataFrame:
    """Walk-corpus generation (pre-built r16; registration awaits a free
    window slot): DeepWalk/node2vec-style truncated walks over the
    transaction graph — (walk_id, step, node), `walks_per_node` walks
    from every out-edge-bearing node, each `depth` hops, next hop =
    argmin over out-neighbors of an engine-portable polynomial hash of
    (walk_id, step, candidate). The walk corpus is the input relation
    for skip-gram graph-embedding training — the graph-side analogue of
    the text pipeline's sequence prep (X58), and a capability the
    reference's dense-matrix design cannot express at all.

    Determinism IS the oracle story: the hash-guided next-hop is the
    seeded-RNG-free twin of uniform sampling (the P9/J6 hash-Bernoulli
    precedent), so the full corpus value-hashes against an unrolled
    DuckDB twin instead of a rows-only check. At production the
    polynomial mix swaps for xxhash64 (same plan, wider hash — the
    doc_fingerprint_hashed discipline) and `walks_per_node` scales the
    corpus linearly.

    Scale posture (100 TB): state is one (walk_id, node) row per live
    walk — O(N·walks_per_node), never the corpus × neighborhood
    product; each of the `depth` stages is ONE equi-join on the
    adjacency (shuffle keyed by node) + a grouped MIN that combines
    map-side before the walk_id exchange. A hub src fans a sitting walk
    out by its out-degree before the MIN collapses it — the standard
    salted-join discipline (two_hop_salted) applies if a hub dominates;
    walks on DISTINCT nodes never share work. Depth-bounded unrolled
    joins, so lineage is fixed at build time — no iterative checkpoint
    discipline needed (contrast `damped_walk`). Walks stop early at
    sink nodes (inner join), mirrored exactly by the oracle."""
    return _walk_corpus_df(spark, sf_dir, walks_per_node, depth).orderBy(
        "walk_id", "step"
    )
