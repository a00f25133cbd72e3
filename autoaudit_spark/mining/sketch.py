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
    from .iforest import shared_maha_scores

    scores = shared_maha_scores(spark, sf_dir)
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
    permutation is RNG-generated driver-side, not SQL-expressible.
    Reference-parity path; `sketch_values_hashed` is the scale path."""
    vals, _, _ = build_sketches(spark, sf_dir, sketch_num=64)
    return vals.orderBy("window_start", "sketch_id")


# ---------------------------------------------------------------------------
# Scale path: hash-derived membership, fully declarative greedy
# ---------------------------------------------------------------------------
#: deterministic integer mixes, overflow-safe in int64 and computable
#: bit-identically in Spark and DuckDB (exact BIGINT arithmetic; the
#: account id is folded mod 100003 first so the Knuth multiply stays
#: < 2^63). Rates mirror the reference: 0.5% account rows per sketch
#: (s_rate .995), 20% candidate columns (d_rate .8).
_HSEED = 7

#: optional session conf: shuffle-partition count for ONLY the greedy
#: selection rounds of the hashed sketch pipeline (their relations are
#: parameter-sized — sketches×candidates — so task overhead, not data,
#: dominates at bench SFs). Unset ⇒ the session's scale-correct setting.
GREEDY_PARTITIONS_CONF = "spark.autoaudit.sketch.greedyShufflePartitions"


def _member_pred(account, sketch_id):
    return (
        ((account % 100003) * 2654435761 % 1000003 + sketch_id * 97 + _HSEED)
        % 1000003 % 1000
    ) < 5


def _cand_pred(pair_id, sketch_id):
    return (
        ((pair_id * 2654435761) % 1000003 + sketch_id * 193 + _HSEED) % 1000003 % 10
    ) < 2


# session-scoped cache, same contract as iforest.shared_maha_scores: the
# greedy rounds are eager (localCheckpoint) so two suite queries consuming
# the pipeline (sketch_values_hashed, attention_routing_hashed) would pay
# them twice; the dense values relation is W×sketch_num — tiny. Stored ON
# the session object (session_cache.session_bucket — a WeakKeyDictionary
# holding DataFrames can never clear its key).


def hashed_sketch_parts(
    spark: SparkSession, sf_dir: str, sketch_num: int = SKETCH_NUM
) -> tuple[DataFrame, DataFrame]:
    """The hashed-sketch pipeline's two reusable relations:
    (dense sketch values (window_start, sketch_id int, value double),
    chosen greedy columns (sketch_id, pair_id)). `sketch_values_hashed`
    returns the first ordered; `attention_routing_hashed` (mining.change)
    consumes both. Weak-keyed on the session (see iforest._MAHA_CACHE)."""
    from ..session_cache import session_bucket

    per_session = session_bucket(spark, "sketch_parts")
    key = (sf_dir, sketch_num)
    if key not in per_session:
        vals, chosen = _sketch_values_hashed_impl(spark, sf_dir, sketch_num)
        # localCheckpoint (r18): the dense relation is W×sketch_num rows —
        # tiny — and its consumers (this query's orderBy, the T3 skeleton,
        # attention_routing_hashed) get an RDD-leaf plan instead of the
        # full nested pipeline (guide §5 lineage / §3.3 plan cost)
        per_session[key] = (vals.localCheckpoint(), chosen)
    return per_session[key]


def sketch_values_hashed(
    spark: SparkSession, sf_dir: str, sketch_num: int = SKETCH_NUM
) -> DataFrame:
    vals, _ = hashed_sketch_parts(spark, sf_dir, sketch_num)
    return vals.orderBy("window_start", "sketch_id")


def _sketch_values_hashed_impl(
    spark: SparkSession, sf_dir: str, sketch_num: int = SKETCH_NUM
) -> tuple[DataFrame, DataFrame]:
    """M2 scale path: the ENTIRE pipeline — membership, greedy column
    selection, sketch sums — is one declarative DAG with NO driver-side
    structure (the RNG path collects an O(accounts × 66) matrix and draws
    per-account samples on the driver; this path replaces both):

    - membership/candidates come from an integer hash of (account,
      sketch) — content-addressed, partition-order-free, identical in
      both engines (no seeded `F.rand`, whose draws depend on
      partitioning);
    - the greedy max-coverage objective Σ_sid max_{d∈D} sum_graph[sid,d]
      is unrolled into `NUM_DST`=3 steps, each a join + grouped DECIMAL
      sum + per-sketch row_number argmax — all distributed, all exact
      (6dp-decimal addends ⇒ order-independent sums ⇒ cross-engine-
      identical argmax);
    - tie-breaks replicate the reference: strictly-positive gain
      required, first (lowest column) among equal gains, first remaining
      candidate when nothing scores positive (`AA-AR.py:136-146` and the
      documented crash-bug deviation at module docstring).

    Scores are Mahalanobis-d² (≥ 0), so max over a column set equals
    max(best-so-far, value) with best initialised to 0.

    This relation is also the pre-SVD skeleton the T3 change-detection
    stream consumes (windowed sketch sums)."""
    from .iforest import shared_maha_scores

    # scores come from the session-shared checkpointed relation (the same
    # one anomaly_scores_mahalanobis/focus_plot_sum materialize) — the
    # decimal projection on top is a cheap narrow map over the cache
    sc6 = shared_maha_scores(spark, sf_dir).withColumn(
        "sd", F.col("score").cast("decimal(18,6)")
    )
    zero = F.lit(0).cast("decimal(38,6)")
    # localCheckpoint, not persist (r18, guide §5/§3.3): sums/members are
    # read by every greedy round AND the final vals join; persisted they
    # keep the full maha-pipeline logical plan, so each of the 3 eager
    # greedy rounds re-analyzed a full nested tree and the final dense
    # plan ran 2048 explain lines (plans/r18/sketch_values_hashed_before).
    # The checkpoint truncates each to an RDD leaf — identical rows, same
    # MEMORY_AND_DISK level, round-local plans.
    sums = (
        sc6.groupBy("account", "pair_id")
        .agg(F.sum("sd").cast("decimal(38,6)").alias("s"))
        .localCheckpoint()
    )
    accounts = sums.select("account").distinct()
    sk = spark.range(sketch_num).select(F.col("id").alias("sketch_id"))
    cols = spark.range(PN).select(F.col("id").alias("pair_id"))
    members = (
        accounts.crossJoin(sk)
        .filter(_member_pred(F.col("account"), F.col("sketch_id")))
        .localCheckpoint()
    )
    cands = sk.crossJoin(cols).filter(
        _cand_pred(F.col("pair_id"), F.col("sketch_id"))
    )

    def argmax(gains: DataFrame) -> DataFrame:
        from pyspark.sql.window import Window

        w = Window.partitionBy("sketch_id").orderBy(
            (F.col("gain") > zero).desc(),
            F.when(F.col("gain") > zero, F.col("gain")).desc_nulls_last(),
            F.col("pair_id"),
        )
        return (
            gains.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("sketch_id", "pair_id")
        )

    # Greedy rounds — ZERO driver round-trips (no pick ever reaches the
    # driver; each round's 64-row pick is localCheckpoint()ed on the
    # executors). Each round's `best` state is recomputed from the
    # chosen-so-far picks as max over chosen columns of the persisted
    # `sums` relation; each round's pick is a window-filter argmax. Every
    # intermediate relation is O(sketches×cands) or O(members) — tiny at
    # any data scale (the data-sized inputs, sums/sc6, are persisted).
    #
    # The greedy rounds' reduce keys are members×sums-sized: at the bench
    # SFs the session's shuffle-partition count dominates their wall time
    # (3 sequential eager jobs × per-partition task overhead), while on a
    # real cluster the scale-correct session setting is the right one.
    # GREEDY_PARTITIONS_CONF (unset by default = session setting) lets a
    # small-SF harness shrink ONLY these rounds; result values are
    # partition-count-independent by construction (DECIMAL sums are
    # order-free, picks are argmax over exact values).
    gp = spark.conf.get(GREEDY_PARTITIONS_CONF, None)
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    if gp is not None:
        spark.conf.set("spark.sql.shuffle.partitions", gp)
    # try/finally: the narrowed setting must NEVER leak to the rest of
    # the session if a greedy-round job dies mid-loop (executor loss,
    # cancellation) — every later data-sized query would silently run
    # at the narrow width
    try:
        sums_cp = sums.select(
            "account", F.col("pair_id").alias("cp"), F.col("s").alias("cs")
        )
        # INCREMENTAL best state (r4 continuation): `best(sketch, account)`
        # carries max-over-chosen-columns forward round to round —
        # best_{t+1} = greatest(best_t, s[account, pick_t]) — instead of
        # recomputing max over ALL chosen picks from `members` each round.
        # Identical values (max is associative; DECIMAL comparisons exact —
        # A/B-verified bit-identical picks at sf0.1), and measured 5-6×
        # faster on the greedy rounds (16.3 s → 2.5 s at sf0.1 quiet): the
        # recompute form re-analyzed and re-ran a members⋈chosen⋈sums
        # groupBy per round, the incremental form is one broadcast-pick
        # lookup join. localCheckpoint bounds every round's plan at O(1)
        # depth; the materialized state is the accounts-sized `best`
        # relation — the same rows the recompute form shuffled per round
        # anyway, now written once per round instead of recomputed.
        remaining = cands
        chosen: DataFrame | None = None
        best = members.select(
            "sketch_id", "account", zero.alias("best")
        ).localCheckpoint()
        for rnd in range(NUM_DST):
            gains = (
                remaining.join(best, "sketch_id", "left")
                .join(sums, ["account", "pair_id"], "left")
                .groupBy("sketch_id", "pair_id")
                .agg(
                    F.coalesce(
                        F.sum(F.greatest(F.col("best"), F.coalesce(F.col("s"), zero))),
                        zero,
                    )
                    .cast("decimal(38,6)")
                    .alias("gain")
                )
            )
            # localCheckpoint truncates the LOGICAL plan at the 64-row pick
            # (persist only short-circuits execution — Catalyst still
            # re-analyzes the full nested tree per round, which cost ~7 s of
            # DRIVER time at any scale). Each round becomes one tiny eager
            # job over the persisted sums/members; the pick stays on the
            # executors (no collect).
            pick = argmax(gains).localCheckpoint()
            chosen = pick if chosen is None else chosen.unionByName(pick)
            remaining = remaining.join(
                pick, ["sketch_id", "pair_id"], "left_anti"
            )
            if rnd < NUM_DST - 1:
                # pick is 1 row per sketch → the join preserves best 1:1;
                # greatest(best, s[pick]) ≥ 0 holds inductively from the
                # zero-initialised state
                best = (
                    best.join(
                        F.broadcast(pick.withColumnRenamed("pair_id", "cp")),
                        "sketch_id",
                    )
                    .join(sums_cp, ["account", "cp"], "left")
                    .select(
                        "sketch_id",
                        "account",
                        F.greatest(F.col("best"), F.coalesce(F.col("cs"), zero))
                        .cast("decimal(38,6)")
                        .alias("best"),
                    )
                    .localCheckpoint()
                )
    finally:
        if gp is not None:
            # restore BEFORE the data-sized vals aggregation below — only
            # the parameter-sized greedy rounds may run narrow
            spark.conf.set("spark.sql.shuffle.partitions", old_sp)

    chosen = F.broadcast(chosen)

    grid = sc6.select("window_start").distinct().crossJoin(sk)
    vals = (
        sc6.join(members.select("sketch_id", "account"), "account")
        .join(chosen, ["sketch_id", "pair_id"])
        .groupBy("window_start", "sketch_id")
        .agg(F.sum("sd").alias("v"))
    )
    dense = grid.join(vals, ["window_start", "sketch_id"], "left").select(
        "window_start",
        F.col("sketch_id").cast("int").alias("sketch_id"),
        F.coalesce(F.col("v"), F.lit(0)).cast("double").alias("value"),
    )
    return dense, chosen


def _sketch_hashed_cte() -> str:
    """The WITH-chain of the DuckDB twin of :func:`sketch_values_hashed`
    (sketch_num=64), ending at `chosen`/`grid`/`vals` with no final
    SELECT — the greedy is unrolled into 3 CTE steps mirroring the Spark
    DAG; all sums in DECIMAL so the cross-engine argmax is exact. Shared
    by `sketch_values_hashed` and `attention_routing_hashed`."""
    from .iforest import _MAHA_SQL

    maha = _MAHA_SQL.replace("ORDER BY l.window_start, l.pair_id, l.account", "")
    z = "CAST(0 AS DECIMAL(38,6))"
    pick = (
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY sketch_id ORDER BY "
        "(gain > 0) DESC, CASE WHEN gain > 0 THEN gain END DESC NULLS LAST, "
        "pair_id) = 1"
    )
    return f"""
    WITH scored AS ({maha}),
    sc AS (SELECT window_start, account, pair_id,
                  CAST(score AS DECIMAL(18,6)) AS sd FROM scored),
    sums AS (SELECT account, pair_id, CAST(SUM(sd) AS DECIMAL(38,6)) AS s
             FROM sc GROUP BY account, pair_id),
    accts AS (SELECT DISTINCT account FROM sums),
    sk AS (SELECT UNNEST(range(64)) AS sketch_id),
    pcols AS (SELECT UNNEST(range({PN})) AS pair_id),
    members AS (
        SELECT a.account, k.sketch_id FROM accts a CROSS JOIN sk k
        WHERE ((((a.account % 100003) * 2654435761) % 1000003
                + k.sketch_id * 97 + {_HSEED}) % 1000003) % 1000 < 5
    ),
    cands AS (
        SELECT k.sketch_id, c.pair_id FROM sk k CROSS JOIN pcols c
        WHERE (((c.pair_id * 2654435761) % 1000003
                + k.sketch_id * 193 + {_HSEED}) % 1000003) % 10 < 2
    ),
    g1 AS (
        SELECT cd.sketch_id, cd.pair_id,
               CAST(COALESCE(SUM(GREATEST({z}, COALESCE(s.s, {z}))), 0)
                    AS DECIMAL(38,6)) AS gain
        FROM cands cd
        LEFT JOIN members m ON m.sketch_id = cd.sketch_id
        LEFT JOIN sums s ON s.account = m.account AND s.pair_id = cd.pair_id
        GROUP BY cd.sketch_id, cd.pair_id
    ),
    c1 AS (SELECT sketch_id, pair_id FROM g1 {pick}),
    best1 AS (
        SELECT m.account, m.sketch_id,
               CAST(GREATEST({z}, COALESCE(s.s, {z})) AS DECIMAL(38,6)) AS best
        FROM members m JOIN c1 ON c1.sketch_id = m.sketch_id
        LEFT JOIN sums s ON s.account = m.account AND s.pair_id = c1.pair_id
    ),
    r2 AS (SELECT c.sketch_id, c.pair_id FROM cands c
           WHERE NOT EXISTS (SELECT 1 FROM c1
                 WHERE c1.sketch_id = c.sketch_id AND c1.pair_id = c.pair_id)),
    g2 AS (
        SELECT cd.sketch_id, cd.pair_id,
               CAST(COALESCE(SUM(GREATEST(b.best, COALESCE(s.s, {z}))), 0)
                    AS DECIMAL(38,6)) AS gain
        FROM r2 cd
        LEFT JOIN best1 b ON b.sketch_id = cd.sketch_id
        LEFT JOIN sums s ON s.account = b.account AND s.pair_id = cd.pair_id
        GROUP BY cd.sketch_id, cd.pair_id
    ),
    c2 AS (SELECT sketch_id, pair_id FROM g2 {pick}),
    best2 AS (
        SELECT b.account, b.sketch_id,
               CAST(GREATEST(b.best, COALESCE(s.s, {z})) AS DECIMAL(38,6)) AS best
        FROM best1 b JOIN c2 ON c2.sketch_id = b.sketch_id
        LEFT JOIN sums s ON s.account = b.account AND s.pair_id = c2.pair_id
    ),
    r3 AS (SELECT c.sketch_id, c.pair_id FROM r2 c
           WHERE NOT EXISTS (SELECT 1 FROM c2
                 WHERE c2.sketch_id = c.sketch_id AND c2.pair_id = c.pair_id)),
    g3 AS (
        SELECT cd.sketch_id, cd.pair_id,
               CAST(COALESCE(SUM(GREATEST(b.best, COALESCE(s.s, {z}))), 0)
                    AS DECIMAL(38,6)) AS gain
        FROM r3 cd
        LEFT JOIN best2 b ON b.sketch_id = cd.sketch_id
        LEFT JOIN sums s ON s.account = b.account AND s.pair_id = cd.pair_id
        GROUP BY cd.sketch_id, cd.pair_id
    ),
    c3 AS (SELECT sketch_id, pair_id FROM g3 {pick}),
    chosen AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2
               UNION ALL SELECT * FROM c3),
    wins AS (SELECT DISTINCT window_start FROM sc),
    grid AS (SELECT w.window_start, k.sketch_id FROM wins w CROSS JOIN sk k),
    vals AS (
        SELECT sc.window_start, m.sketch_id, SUM(sc.sd) AS v
        FROM sc JOIN members m ON m.account = sc.account
                JOIN chosen ch ON ch.sketch_id = m.sketch_id
                             AND ch.pair_id = sc.pair_id
        GROUP BY sc.window_start, m.sketch_id
    ),
    sv AS (
        SELECT g.window_start, CAST(g.sketch_id AS INTEGER) AS sketch_id,
               CAST(COALESCE(v.v, 0) AS DOUBLE) AS value
        FROM grid g LEFT JOIN vals v ON v.window_start = g.window_start
                                   AND v.sketch_id = g.sketch_id
    )"""


def _sketch_hashed_sql() -> str:
    return _sketch_hashed_cte() + """
    SELECT window_start, sketch_id, value FROM sv
    ORDER BY window_start, sketch_id
    """


@query("sketch_values_hashed", oracle=_sketch_hashed_sql())
def q_sketch_values_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 scale path, fully oracle-backed: hash-membership sketches +
    declarative greedy (see :func:`sketch_values_hashed`)."""
    return sketch_values_hashed(spark, sf_dir, sketch_num=64)
