"""M7 — seeded synthetic smurf injection for labeled evaluation
(`smurf_generator.py:12-40,62-64`).

Per (middle_num ∈ {10..50}, fold ∈ 0..9): pick 2 client accounts (src,
dst) and `middle_num` bank intermediaries; add the star-through edges
src→m→dst; then 1–5 noise patterns with middle_num+(5−r) intermediaries
and inter-intermediary edges added when d10 > r/2.5 + 6. RNG draw order
replicates the reference exactly (np.random re-seeded per middle_num —
`generate_eval_df(..., seed=seed)` at `:63` — so every middle_num uses
the same stream).

Output is the DELTA representation (SURVEY §1.1 A4): `injected_edges
(fold, middle_num, src, dst)` + `labels(fold, middle_num, src, dst)` —
the base graph is NOT duplicated per fold (at 100 TB the base is huge and
immutable; evaluation unions the delta with the base and dedups, U1).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import edges as edges_src

MIDDLE_NUMS = (10, 20, 30, 40, 50)
FOLDS = 10


def generate_fold_edges(
    bank_acc: np.ndarray,
    client_acc: np.ndarray,
    middle_num: int,
    folds: int = FOLDS,
    seed: int = 0,
) -> list[tuple[set[tuple[int, int]], tuple[int, int]]]:
    """[(injected edge set, (label_src, label_dst))] per fold — reference
    draw order (`smurf_generator.py:12-40`)."""
    rng = np.random
    rng.seed(seed)
    out = []
    for _ in range(folds):
        src, dst = rng.choice(client_acc, 2)
        middle_acc = rng.choice(bank_acc, middle_num)
        injected: set[tuple[int, int]] = set()
        for mcc in middle_acc:
            injected.add((int(src), int(mcc)))
            injected.add((int(mcc), int(dst)))
        noise_num = rng.randint(1, 6)
        for _ in range(noise_num):
            r = rng.randint(11)
            mn = middle_num + (5 - r)
            others = [ca for ca in client_acc if ca != src and ca != dst]
            n_src, n_dst = rng.choice(others, 2)
            n_middle = rng.choice(bank_acc, mn)
            for mcc in n_middle:
                injected.add((int(n_src), int(mcc)))
                injected.add((int(mcc), int(n_dst)))
                for c in n_middle:
                    if c != mcc and rng.randint(1, 11) > r / 2.5 + 6:
                        injected.add((int(mcc), int(c)))
        out.append((injected, (int(src), int(dst))))
    return out


def generate_eval_tables(
    spark: SparkSession,
    bank_acc: np.ndarray,
    client_acc: np.ndarray,
    middle_nums=MIDDLE_NUMS,
    folds: int = FOLDS,
    seed: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """(injected_edges, labels) DataFrames over the parameter grid."""
    edge_rows, label_rows = [], []
    for mn in middle_nums:
        for fold, (inj, (ls, ld)) in enumerate(
            generate_fold_edges(bank_acc, client_acc, mn, folds=folds, seed=seed)
        ):
            edge_rows.extend((fold, mn, s, d) for s, d in sorted(inj))
            label_rows.append((fold, mn, ls, ld))
    inj_df = spark.createDataFrame(
        edge_rows, "fold int, middle_num int, src long, dst long"
    )
    lab_df = spark.createDataFrame(
        label_rows, "fold int, middle_num int, src long, dst long"
    )
    return inj_df, lab_df


def _pair_keep_pred(src, dst, keep_ppm: int, seed: int):
    """Content-addressed Bernoulli: keep a (src, dst) pair iff an integer
    hash of the pair lands under keep_ppm per million. Pure BIGINT
    arithmetic (operands folded small enough that the Knuth multiply stays
    < 2^63), so the SAME predicate evaluates bit-identically in Spark and
    DuckDB — unlike `F.rand(seed)`, whose draw stream depends on
    partitioning and has no cross-engine twin."""
    h = (
        (src % 1000003) * 2654435761
        + (dst % 1000003) * 40503
        + seed * 97
    ) % 1000000007
    return (h % 1000000) < keep_ppm


def background_edges(
    banks: DataFrame, interact_prob: float = 0.9995, seed: int = 0
) -> DataFrame:
    """J6+P9: random background graph — every (bank, bank) pair kept with
    probability 1−interact_prob (`smurf_generator.py:57-60`). Expressed as
    a crossJoin + hash-Bernoulli filter: documented-expensive (O(|banks|²)
    pairs BEFORE the filter), acceptable because banks is a dimension
    (4.5k in the reference's Czech data), and gated behind this explicit
    function at scale — never applied to a fact-sized relation. The hash
    predicate is partition-count-independent, so the same seed reproduces
    the same edge set on any cluster layout."""
    keep_ppm = round((1.0 - interact_prob) * 1_000_000)
    b1 = banks.select(F.col("bank").alias("src"))
    b2 = banks.select(F.col("bank").alias("dst"))
    # broadcast the right side: a plain crossJoin of two M-partition
    # dimensions becomes an M×M-task CartesianProduct (measured 28 s for
    # 150×150 rows at local[32]); BroadcastNestedLoopJoin keeps it at M
    # tasks and is the correct plan at any scale for a dimension × dimension
    # expansion
    return b1.crossJoin(F.broadcast(b2)).filter(
        _pair_keep_pred(F.col("src"), F.col("dst"), keep_ppm, seed)
    )


@query(
    "background_edges",
    oracle=f"""
    WITH edges AS (SELECT user_id AS src,
                          CAST(event_id % 150 AS BIGINT) AS dst FROM events),
    banks AS (SELECT DISTINCT dst AS bank FROM edges)
    SELECT b1.bank AS src, b2.bank AS dst
    FROM banks b1 CROSS JOIN banks b2
    WHERE ((((b1.bank % 1000003) * 2654435761
             + (b2.bank % 1000003) * 40503) % 1000000007) % 1000000) < 500
    ORDER BY src, dst
    """,
)
def q_background_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 end-to-end on the derived bank universe, value-hash checked:
    the hash-Bernoulli keep-predicate is engine-independent integer
    arithmetic (seed 0, rate 1−0.9995 = 500 ppm)."""
    bank_acc, _ = _universes(spark, sf_dir)
    banks = spark.createDataFrame([(int(b),) for b in bank_acc], "bank long")
    return background_edges(banks).orderBy("src", "dst")


def union_with_base(base_adj: DataFrame, injected: DataFrame, fold: int, middle_num: int) -> DataFrame:
    """U1: base ∪ injected-delta for one fold, duplicates collapsed
    (`smurf_generator.py` set semantics)."""
    delta = injected.filter(
        (F.col("fold") == fold) & (F.col("middle_num") == middle_num)
    ).select("src", "dst")
    return base_adj.select("src", "dst").union(delta).distinct()


#: hard cap on the materialized node universe (distinct ids per side).
#: 20M int64 ids ≈ 160 MB on the driver — far beyond any plausible EVAL
#: graph (the injection protocol plants ~dozens of edges per fold), yet
#: a loud bound instead of a silent driver OOM at data scale.
UNIVERSE_LIMIT = 20_000_000


def _universes(spark: SparkSession, sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """client = src universe (user ids), bank = dst universe of the
    derived graph — both sorted ascending like pandas `.unique()` on the
    sorted source (determinism for the seeded choice).

    DELIBERATELY driver-collected (r6 verdict #6): `np.random.choice`
    parity with the reference's seeded generator (`smurf_generator.py:
    47-48`) requires a materialized ORDERED universe — the draw index
    depends on the full sorted array, which no per-partition scheme
    reproduces. This is an EVALUATION tool (inject → recover → score),
    not a production operator; the universe is distinct-node-sized, and
    `UNIVERSE_LIMIT` turns a pathological input into a clear error. The
    distributed seeded alternative, when parity is not required, is
    hash-Bernoulli selection over ids (`relational.py` `q_bernoulli_
    sample` / `graph.py` `negative_edge_sample`) — O(1) driver memory."""
    e = edges_src(spark, sf_dir)
    n_src = e.select("src").distinct().count()
    n_dst = e.select("dst").distinct().count()
    if max(n_src, n_dst) > UNIVERSE_LIMIT:
        raise ValueError(
            f"_universes: node universe ({max(n_src, n_dst):,} ids) exceeds "
            f"UNIVERSE_LIMIT ({UNIVERSE_LIMIT:,}) — the seeded-parity eval "
            "path materializes the ordered universe on the driver; for "
            "graphs this size use hash-Bernoulli selection "
            "(negative_edge_sample / bernoulli_sample) instead"
        )
    clients = np.array(
        sorted(r["src"] for r in e.select("src").distinct().collect()), dtype=np.int64
    )
    banks = np.array(
        sorted(r["dst"] for r in e.select("dst").distinct().collect()), dtype=np.int64
    )
    return banks, clients


@query("smurf_injection_edges")
def q_smurf_injection_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 delta edges over the full (middle_num × fold) grid. Rows-only
    (seeded RNG; determinism pinned by unit tests)."""
    banks, clients = _universes(spark, sf_dir)
    inj, _ = generate_eval_tables(spark, banks, clients)
    return inj.orderBy("middle_num", "fold", "src", "dst")


@query("smurf_injection_labels")
def q_smurf_injection_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 planted (src, dst) labels per fold (rows-only)."""
    banks, clients = _universes(spark, sf_dir)
    _, lab = generate_eval_tables(spark, banks, clients)
    return lab.orderBy("middle_num", "fold")


@query("injection_recovery_eval")
def q_injection_recovery_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end evaluation in the paper's protocol (SURVEY §5.1): inject
    labeled smurf patterns into the base graph, run the full AA-Smurf
    search on the union, report whether each fold's labeled endpoints were
    placed in detected blocks. Rows-only (greedy search over seeded
    injection); thresholds asserted in tests, the relation here is the
    evaluation evidence itself."""
    from .smurf import smurf_pipeline
    from ..sources import adjacency

    bank_acc, client_acc = _universes(spark, sf_dir)
    base = adjacency(spark, sf_dir)
    middle_num, n_folds = 30, 2
    folds = generate_fold_edges(bank_acc, client_acc, middle_num, folds=n_folds)
    rows = []
    for fold, (injected, (lsrc, ldst)) in enumerate(folds):
        inj_df = spark.createDataFrame(sorted(injected), "src long, dst long")
        unioned = base.union(inj_df).dropDuplicates(["src", "dst"])
        result, _ = smurf_pipeline(
            spark, unioned, max_iter=6, max_candidates=100, selection="final"
        )
        placed = set(result.order)
        rows.append(
            (
                middle_num,
                fold,
                int(lsrc),
                int(ldst),
                bool(lsrc in placed),
                bool(ldst in placed),
                len(result.start) - 1,
            )
        )
    return spark.createDataFrame(
        rows,
        "middle_num int, fold int, label_src long, label_dst long, "
        "src_recovered boolean, dst_recovered boolean, n_blocks int",
    )
