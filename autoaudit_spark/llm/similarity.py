"""X6 — similarity search over the embedding column (`embeddings.embedding`,
array<float> len 64).

Two plans, same results contract:
- brute-force cosine top-k (the correctness baseline): query-set ⋈ corpus
  with the dot product as a JVM higher-order expression
  (`aggregate(zip_with(...))` — no Python in the hot loop), window top-k.
  O(|Q|·N·d) — exact, oracle-checked against DuckDB list functions.
- random-hyperplane LSH buckets (the scale path): 16 seeded hyperplanes →
  sign-bit signature → candidates share a bucket → cosine only within
  buckets. O(N·d·planes + collisions·d). Recall < 1 by design; rows-only.

Cross-engine exactness for the oracle: both engines cast float32 → double
FIRST, then multiply-and-sum in element order — bit-identical; the final
round(6) only absorbs libm sqrt ulps.

Embedding-cosine near-dup (pairs ≥ τ) rides the same kernels.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources import load_table

TOP_K = 5
N_QUERIES = 20          # vec_id < 20 form the demo query set
LSH_PLANES = 16
#: tables × (PLANES/tables)-bit signatures. 4×4-bit tables measured best
#: on the near-isotropic testdata (recall@5 vs brute force: 2 tables 0.04,
#: 4 tables 0.29, 8 tables 0.82-but-nearly-exhaustive); tune per corpus.
LSH_TABLES = 4
# testdata embeddings are near-isotropic (max pairwise cos ≈ 0.51 at
# sf0.01), so a classic 0.8 dedup threshold matches nothing; 0.35 sits at
# the ~99.9th percentile of the pair distribution and exercises the operator
NEAR_DUP_COS = 0.35


def _dvec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


_DUCK_COS = (
    "list_dot_product(a.v, b.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
)


@query(
    "ann_cosine_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROUND({_DUCK_COS}, 6) AS cos_sim
        FROM e a JOIN e b ON a.vec_id < {N_QUERIES} AND a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
               ) AS rk
        FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rk
    FROM ranked WHERE rk <= {TOP_K}
    ORDER BY query_id, rk
    """,
)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 brute-force: exact cosine top-5 for each of the first 20
    vectors. Corpus side streams; only the query set broadcasts."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec("embedding").alias("v")
    )
    qs = emb.filter(F.col("vec_id") < N_QUERIES).withColumnsRenamed(
        {"vec_id": "query_id", "v": "qv"}
    )
    scored = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_sim(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOP_K)
        .orderBy("query_id", "rk")
    )


@query(
    "near_dup_embedding",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE vec_id < 500)
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           ROUND({_DUCK_COS}, 6) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE {_DUCK_COS} >= {NEAR_DUP_COS}
    ORDER BY id1, id2
    """,
)
def q_near_dup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: embedding-cosine near-dup pairs ≥ τ (bounded to the first 500
    vectors for the exact oracle; the LSH variant is the unbounded path)."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 500)
        .select("vec_id", _dvec("embedding").alias("v"))
    )
    a = emb.withColumnsRenamed({"vec_id": "id1", "v": "v1"})
    b = emb.withColumnsRenamed({"vec_id": "id2", "v": "v2"})
    cos = cosine_sim(F.col("v1"), F.col("v2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .filter(cos >= NEAR_DUP_COS)
        .select("id1", "id2", F.round(cos, 6).alias("cos_sim"))
        .orderBy("id1", "id2")
    )


def hyperplanes(dim: int = 64, planes: int = LSH_PLANES, seed: int = 7) -> np.ndarray:
    return np.random.RandomState(seed).normal(size=(planes, dim))


def sign_planes(dim: int = 64, planes: int = LSH_PLANES) -> np.ndarray:
    """Rademacher (±1) random-hyperplane matrix from the engine-portable
    integer hash — sign-projection LSH with ±1 entries is the standard
    sparse variant (Achlioptas-style), and deterministic integer signs
    make the whole bucketing pipeline expressible in ANSI SQL, so the
    LSH ANN path gets a value-hash oracle (the Gaussian variant
    `hyperplanes` stays available)."""
    return np.array(
        [
            [
                1.0 if ((p * 131 + d) * 2654435761) % 1000000007 % 2 else -1.0
                for d in range(dim)
            ]
            for p in range(planes)
        ]
    )


def lsh_bucket(emb: DataFrame, planes: np.ndarray, tables: int = LSH_TABLES) -> DataFrame:
    """(vec_id, v, table_id, bucket): sign-bit signatures over seeded
    hyperplanes, split into `tables` independent tables (planes/tables
    bits each — multiple shorter tables trade precision for recall, the
    standard random-hyperplane configuration). Plane matrix is compiled
    into the plan as literals (tiny)."""
    per = len(planes) // tables
    sigs = []
    for t in range(tables):
        sig = None
        for i in range(per):
            p = planes[t * per + i]
            plane = F.array(*[F.lit(float(x)) for x in p])
            bit = F.when(_dot(F.col("v"), plane) >= 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            term = F.shiftleft(bit, i)
            sig = term if sig is None else sig + term
        sigs.append(sig)
    return emb.select(
        "vec_id", "v", F.posexplode(F.array(*sigs)).alias("table_id", "bucket")
    )


def _lsh_sql(tables: int = LSH_TABLES) -> str:
    """DuckDB twin of the sign-plane LSH pipeline: per table, the bucket
    id is the sign-bit signature over the ±1 literal planes (identical
    element-order dot products), then candidates join on (table, bucket)
    and rank by the same rounded cosine."""
    mat = sign_planes()
    per = len(mat) // tables
    sigs = []
    for t in range(tables):
        bits = " + ".join(
            f"(CASE WHEN list_dot_product(v, [{', '.join(repr(float(x)) for x in mat[t * per + i])}]) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i in range(per)
        )
        sigs.append(
            f"SELECT vec_id, v, {t} AS table_id, CAST({bits} AS BIGINT) AS bucket FROM e"
        )
    buckets = " UNION ALL ".join(sigs)
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS ({buckets}),
    q AS (SELECT vec_id AS query_id, v AS qv, table_id, bucket
          FROM b WHERE vec_id < {N_QUERIES}),
    cand AS (
        SELECT DISTINCT q.query_id, b.vec_id AS neighbor_id,
               ROUND(list_dot_product(q.qv, b.v) /
                     (sqrt(list_dot_product(q.qv, q.qv)) *
                      sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
        FROM b JOIN q ON b.table_id = q.table_id AND b.bucket = q.bucket
                     AND b.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS rk
        FROM cand
    )
    SELECT query_id, neighbor_id, cos_sim, rk
    FROM ranked WHERE rk <= {TOP_K}
    ORDER BY query_id, rk
    """


@query("ann_lsh_topk", oracle=_lsh_sql())
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 scale path: cosine top-k within sign-plane LSH buckets only —
    approximate by design (recall vs brute force unit-tested), and since
    the ±1 planes are integer-hash-derived, the WHOLE pipeline is
    value-hash-checked against the DuckDB twin."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec("embedding").alias("v")
    )
    bucketed = lsh_bucket(emb, sign_planes()).persist()
    qs = bucketed.filter(F.col("vec_id") < N_QUERIES).withColumnsRenamed(
        {"vec_id": "query_id", "v": "qv", "bucket": "qbucket", "table_id": "qtable"}
    )
    scored = (
        bucketed.join(
            F.broadcast(qs),
            (F.col("table_id") == F.col("qtable"))
            & (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_sim(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
        .distinct()  # a pair may collide in several tables
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOP_K)
        .orderBy("query_id", "rk")
    )


# ---------------------------------------------------------------------------
# X6 scale path #2: IVF (inverted-file) ANN with seeded k-means centroids.
# Unlike the hash-based LSH variant this is exactly reproducible in ANSI
# SQL, so the whole pipeline — Lloyd training included — gets a value-hash
# oracle. Init = first K corpus vectors (deterministic); then
# IVF_KMEANS_ROUNDS Lloyd rounds where each centroid update is a grouped
# mean computed as an exact DECIMAL(18,6) sum divided by the count:
# order-independent, hence bit-identical across engines. Assignments rank
# by ROUND(cos, 6) with centroid-id tie-break (the same cross-engine
# discipline as every other cosine query here).
# ---------------------------------------------------------------------------
IVF_LISTS = 8
IVF_NPROBE = 2
IVF_KMEANS_ROUNDS = 2
EMB_DIM = 64

_IVF_COS_PA = (
    "list_dot_product(p.qv, a.v) / "
    "(sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.v, a.v)))"
)


def _centroid_rank_expr(cents: list[tuple[int, list[float]]]):
    """Array of struct(csim, negcid) per row, sorted so element 1 is the
    nearest centroid (csim desc, cid asc — negcid makes the lexicographic
    DESC sort break ties toward the LOWER cid, mirroring the oracle's
    `ORDER BY csim DESC, cid`). The centroid matrix is compiled into the
    plan as literals — assignment is a pure map stage, NO shuffle, which
    is the whole point of broadcast-style centroids at 100 TB."""
    entries = [
        F.struct(
            F.round(
                cosine_sim(F.col("v"), F.array(*[F.lit(float(x)) for x in cv])), 6
            ).alias("csim"),
            F.lit(-cid).cast("long").alias("negcid"),
        )
        for cid, cv in cents
    ]
    return F.sort_array(F.array(*entries), asc=False)


def kmeans_centroids(
    spark: SparkSession, emb: DataFrame, rounds: int = IVF_KMEANS_ROUNDS
) -> DataFrame:
    """Seeded Lloyd training over (vec_id, v) → (cid, cv) centroids.
    Init = first K corpus vectors. Per round: assignment is a shuffle-free
    map (centroids compiled as literals — `_centroid_rank_expr`); the only
    exchange is the exploded (cid, dim) partial-sum aggregate, which
    map-side combine reduces to K×dim rows. Centroid means are exact
    DECIMAL(18,6) sums over 6dp-quantized components divided by the count
    — order-independent, so the trained model is bit-identical to the
    DuckDB twin. The K×dim model is collected per round (legitimate driver
    state — model parameters, not data). Empty clusters keep their
    previous centroid."""
    cents = _collect_centroids(emb)
    for _ in range(rounds):
        cents = _lloyd_round(emb, cents)
    return spark.createDataFrame(cents, "cid long, cv array<double>")


def _collect_centroids(emb: DataFrame) -> list[tuple[int, list[float]]]:
    return [
        (int(r["vec_id"]), [float(x) for x in r["v"]])
        for r in emb.filter(F.col("vec_id") < IVF_LISTS)
        .orderBy("vec_id")
        .collect()
    ]


def _lloyd_round(
    emb: DataFrame, cents: list[tuple[int, list[float]]]
) -> list[tuple[int, list[float]]]:
    """One Lloyd round as ONE aggregation job: per cluster, 64 exact
    DECIMAL component sums + the count (all whole-stage-codegen — no
    posexplode row blowup, no second shuffle). The division to means
    happens driver-side on the collected K×(dim+1) numbers: float(exact
    decimal) / int is the same correctly-rounded double as the engines'
    CAST(sum AS DOUBLE)/COUNT, so cross-engine bit-equality holds.

    TRAINING assignment runs join-shaped against the broadcast centroid
    relation (same ROUND(cos,6) DESC, cid ordering as the literal rank
    expression and the oracle's ROW_NUMBER — identical cids): compiling
    K centroids into literal expressions costs seconds of DRIVER plan
    construction PER ROUND (the PQ lesson); the literal form stays for
    the final map-only assignment, where it is the scale feature."""
    spark = emb.sparkSession
    cents_df = spark.createDataFrame(
        [(cid, cv) for cid, cv in cents], "cid long, cv array<double>"
    )
    dim = len(cents[0][1])
    sim = F.round(cosine_sim(F.col("v"), F.col("cv")), 6)
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cid"))
    assigned = (
        emb.crossJoin(F.broadcast(cents_df))
        .withColumn("sim", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    aggs = [F.count("*").alias("n")] + [
        F.sum(F.element_at("v", d + 1).cast("decimal(18,6)")).alias(f"s{d}")
        for d in range(dim)
    ]
    rows = assigned.groupBy("cid").agg(*aggs).collect()
    new = {
        int(r["cid"]): [float(r[f"s{d}"]) / r["n"] for d in range(dim)]
        for r in rows
    }
    return [(cid, new.get(cid, cv)) for cid, cv in cents]



def _cached_train(spark, key, train_fn):
    """Session-bucketed training cache: IVF/PQ codebooks are
    deterministic pure functions of (sf_dir, variant) — a full suite
    sweep otherwise re-runs identical Lloyd trainings (collect +
    assignment joins + decimal-sum aggregates) up to three times."""
    from ..session_cache import session_bucket

    bucket = session_bucket(spark, "ann_models")
    if key not in bucket:
        bucket[key] = train_fn()
    return bucket[key]


def ivf_topk(
    spark: SparkSession, sf_dir: str, rounds: int = IVF_KMEANS_ROUNDS
) -> DataFrame:
    """IVF probe pipeline: assign every vector to its nearest trained
    centroid (literal-centroid map — the corpus never shuffles for
    assignment), probe the NPROBE nearest lists per query, rank only
    within probed lists. Search cost drops from O(N) to ~O(N·nprobe/K)
    per query; recall<1 by design (tested against brute force)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec("embedding").alias("v")
    )
    def _train():
        c = _collect_centroids(emb)
        for _ in range(rounds):
            c = _lloyd_round(emb, c)
        return c

    cents = _cached_train(spark, ("ivf", sf_dir, rounds), _train)
    ranked = _centroid_rank_expr(cents)
    assign = emb.select(
        "vec_id", "v", (-F.element_at(ranked, 1)["negcid"]).alias("cid")
    )
    probes = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.explode(
                F.transform(
                    F.slice(ranked, 1, IVF_NPROBE), lambda s: -s["negcid"]
                )
            ).alias("cid"),
        )
    )
    cand = (
        assign.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_sim(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rk", F.row_number().over(wk).cast("long"))
        .filter(F.col("rk") <= TOP_K)
        .orderBy("query_id", "rk")
    )


def _ivf_train_parts(rounds: int = IVF_KMEANS_ROUNDS) -> tuple[list, str]:
    """CTE parts list for the coarse k-means train + assign/probes —
    shared by the IVF oracle and the IVFPQ composition oracle."""

    def cos(a: str, c: str) -> str:
        return (
            f"list_dot_product({a}.v, {c}.cv) / "
            f"(sqrt(list_dot_product({a}.v, {a}.v)) * "
            f"sqrt(list_dot_product({c}.cv, {c}.cv)))"
        )

    parts = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {IVF_LISTS})",
    ]
    prev = "c0"
    for r in range(1, rounds + 1):
        parts.append(
            f"""a{r} AS (
            SELECT vec_id, v, cid FROM (
                SELECT a.vec_id, a.v, c.cid,
                       ROW_NUMBER() OVER (PARTITION BY a.vec_id
                           ORDER BY ROUND({cos('a', 'c')}, 6) DESC, c.cid) AS rn
                FROM e a CROSS JOIN {prev} c) WHERE rn = 1)"""
        )
        parts.append(
            f"""m{r} AS (
            SELECT cid, dd.d AS d,
                   CAST(SUM(CAST(a.v[dd.d + 1] AS DECIMAL(18,6))) AS DOUBLE)
                       / COUNT(*) AS m
            FROM a{r} a CROSS JOIN (SELECT UNNEST(range(0, {EMB_DIM})) AS d) dd
            GROUP BY cid, dd.d)"""
        )
        parts.append(
            f"cv{r} AS (SELECT cid, list(m ORDER BY d) AS mv "
            f"FROM m{r} GROUP BY cid)"
        )
        parts.append(
            f"c{r} AS (SELECT p.cid, COALESCE(n.mv, p.cv) AS cv "
            f"FROM {prev} p LEFT JOIN cv{r} n USING (cid))"
        )
        prev = f"c{r}"
    parts.append(
        f"""scored AS (
        SELECT a.vec_id, a.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                   ORDER BY ROUND({cos('a', 'c')}, 6) DESC, c.cid) AS rn
        FROM e a CROSS JOIN {prev} c)"""
    )
    parts.append("assign AS (SELECT vec_id, v, cid FROM scored WHERE rn = 1)")
    parts.append(
        f"probes AS (SELECT vec_id AS query_id, v AS qv, cid FROM scored "
        f"WHERE vec_id < {N_QUERIES} AND rn <= {IVF_NPROBE})"
    )
    return parts, prev


def _ivf_kmeans_sql(rounds: int = IVF_KMEANS_ROUNDS) -> str:
    """DuckDB twin of the full train+probe pipeline: one (assign, means,
    centroid) CTE triple per Lloyd round, then the probe/rank tail. Means
    are DECIMAL-exact sums over 6dp-quantized components — identical to
    the Spark side, so the trained centroids (and hence every downstream
    ranking) are bit-equal."""
    parts, _ = _ivf_train_parts(rounds)
    parts.append(
        f"""cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               ROUND({_IVF_COS_PA}, 6) AS cos_sim
        FROM probes p JOIN assign a USING (cid)
        WHERE a.vec_id <> p.query_id)"""
    )
    parts.append(
        """ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS rk
        FROM cand)"""
    )
    return (
        "WITH "
        + ", ".join(parts)
        + f""" SELECT query_id, neighbor_id, cos_sim, rk
        FROM ranked WHERE rk <= {TOP_K} ORDER BY query_id, rk"""
    )


@query("ann_ivf_topk", oracle=_ivf_kmeans_sql())
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 IVF with seeded k-means training (IVF_KMEANS_ROUNDS Lloyd
    rounds), fully value-hash checked against the DuckDB twin including
    the training iterations."""
    return ivf_topk(spark, sf_dir, rounds=IVF_KMEANS_ROUNDS)


def _semdedup_sql() -> str:
    """DuckDB twin of the cluster-bucketed near-dup: the shared
    `_ivf_train_parts` training CTEs, then within-cluster pairs ≥ τ."""
    parts, _ = _ivf_train_parts()
    cos = (
        "list_dot_product(a.v, b.v) / "
        "(sqrt(list_dot_product(a.v, a.v)) * "
        "sqrt(list_dot_product(b.v, b.v)))"
    )
    return (
        "WITH "
        + ", ".join(parts)
        + f""" SELECT a.vec_id AS id1, b.vec_id AS id2,
               CAST(a.cid AS BIGINT) AS cid, ROUND({cos}, 6) AS cos_sim
        FROM assign a JOIN assign b
          ON a.cid = b.cid AND a.vec_id < b.vec_id
        WHERE {cos} >= {NEAR_DUP_COS}
        ORDER BY id1, id2"""
    )


@query("near_dup_embedding_ivf", oracle=_semdedup_sql())
def q_near_dup_embedding_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 at the 100 TB shape (r6, SemDeDup-style): embedding-cosine
    near-dup pairs computed ONLY within IVF coarse clusters. The brute
    `near_dup_embedding` twin is O(N²) and oracle-bounded to 500
    vectors; here the trained coarse quantizer (same session-cached
    DECIMAL-exact Lloyd model as `ann_ivf_topk` — zero extra training
    in a sweep) assigns every vector to its nearest list in a pure MAP
    stage (literal centroids, no shuffle), and the quadratic compare
    runs per cluster: one shuffle on cid, Σ n_c² work instead of N².
    That is the semantic-dedup design for billion-document corpora —
    boundary pairs split across clusters are the documented recall
    trade (same as IVF probe pruning). Full-corpus exact value-hash
    against the shared training CTEs + within-cluster pair join."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec("embedding").alias("v")
    )

    def _train():
        c = _collect_centroids(emb)
        for _ in range(IVF_KMEANS_ROUNDS):
            c = _lloyd_round(emb, c)
        return c

    cents = _cached_train(
        spark, ("ivf", sf_dir, IVF_KMEANS_ROUNDS), _train
    )
    ranked = _centroid_rank_expr(cents)
    assign = emb.select(
        "vec_id", "v", (-F.element_at(ranked, 1)["negcid"]).alias("cid")
    )
    a = assign.withColumnsRenamed({"vec_id": "id1", "v": "v1"})
    b = assign.withColumnsRenamed({"vec_id": "id2", "v": "v2"})
    cos = cosine_sim(F.col("v1"), F.col("v2"))
    # explicit-N repartition (r17): the within-cluster pair join does
    # Σ n_c² cosine work from a tiny-by-bytes input — AQE's byte-based
    # coalescing would serialize the quadratic compare into 1-2 tasks
    # (measured +35% at sf0.1). REPARTITION_BY_NUM is exempt from
    # coalescing, so the compare keeps cluster-wide parallelism.
    n_parts = spark.sparkContext.defaultParallelism
    return (
        a.repartition(n_parts, "cid")
        .join(b, ["cid"])
        .filter(F.col("id1") < F.col("id2"))
        .filter(cos >= NEAR_DUP_COS)
        .select(
            "id1",
            "id2",
            F.col("cid").cast("long").alias("cid"),
            F.round(cos, 6).alias("cos_sim"),
        )
        .orderBy("id1", "id2")
    )


# ---------------------------------------------------------------------------
# X6: int8-quantized ANN — the 100 TB memory/bandwidth lever. Each vector
# is symmetric-quantized to int8 codes (scale = max|v|/127, the standard
# per-row scheme); the quantized cosine equals the cosine OF THE CODE
# VECTORS because the two per-row scales cancel in the normalization —
# so the whole scoring path is exact integer dot products (cross-engine
# bit-identical) with one final double division. A deployment stores the
# codes column (4× smaller than float32, 8× than float64) and never
# touches the float embeddings at query time.
# ---------------------------------------------------------------------------
def int8_codes(v: Column) -> Column:
    """Symmetric per-vector int8 quantization: round(x·127/max|x|), the
    all-zero vector mapping to all-zero codes."""
    m = F.array_max(F.transform(v, lambda x: F.abs(x)))
    return F.when(
        m > 0,
        F.transform(v, lambda x: F.round(x * 127 / m).cast("long")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("long")))


def _idot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


@query(
    "ann_int8_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (
        SELECT vec_id,
               CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
                    THEN list_transform(v, x -> CAST(ROUND(
                         x * 127 / list_max(list_transform(v, y -> abs(y))))
                         AS BIGINT))
                    ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
        FROM e
    ),
    n AS (
        SELECT vec_id, q, list_dot_product(q, q) AS nn FROM c
    ),
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROUND(list_dot_product(a.q, b.q)
                     / (sqrt(a.nn) * sqrt(b.nn)), 6) AS q_sim
        FROM n a JOIN n b
          ON a.vec_id < {N_QUERIES} AND a.vec_id <> b.vec_id
        WHERE a.nn > 0 AND b.nn > 0
    ),
    ranked AS (
        SELECT query_id, neighbor_id, q_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY q_sim DESC, neighbor_id
               ) AS rk
        FROM scored
    )
    SELECT query_id, neighbor_id, q_sim, rk
    FROM ranked WHERE rk <= {TOP_K}
    ORDER BY query_id, rk
    """,
)
def q_ann_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 int8-quantized top-k: integer code dot products (exact in both
    engines), query codes broadcast, corpus streamed — identical plan
    shape to the float brute force at a quarter of the bytes."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", int8_codes(_dvec("embedding")).alias("q")
    )
    emb = emb.withColumn("nn", _idot(F.col("q"), F.col("q"))).filter(
        F.col("nn") > 0
    )
    qs = emb.filter(F.col("vec_id") < N_QUERIES).withColumnsRenamed(
        {"vec_id": "query_id", "q": "qq", "nn": "qnn"}
    )
    scored = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _idot(F.col("qq"), F.col("q")).cast("double")
                / (F.sqrt(F.col("qnn").cast("double")) * F.sqrt(F.col("nn").cast("double"))),
                6,
            ).alias("q_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("q_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOP_K)
        .orderBy("query_id", "rk")
    )


@query(
    "embedding_centroids",
    oracle=f"""
    WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT label, dd.d AS d,
           CAST(SUM(CAST(v[dd.d + 1] AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS centroid
    FROM e CROSS JOIN (SELECT UNNEST(range(0, {EMB_DIM})) AS d) dd
    GROUP BY label, dd.d
    ORDER BY label, d
    """,
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped vector mean — per-label centroids over the embedding
    corpus, the building block for cluster summaries, class prototypes,
    and semantic-dedup partitioning. Same cross-engine-exact discipline
    as the IVF Lloyd update (`_lloyd_round`): component sums in
    DECIMAL(18,6) over 6dp-quantized floats (order-independent) divided
    by the group count, so centroids are bit-identical to the oracle.

    Plan shape: ONE aggregation with 64 decimal-sum columns (whole-stage
    codegen, map-side combine → |labels|×65 values per partition), then
    an explode of the tiny aggregated result to (label, d) rows — the
    explode happens AFTER the shuffle on ≤|labels| rows, never on the
    corpus. At 100 TB this is the canonical partial-agg shape: shuffle
    volume is labels × dim, independent of row count."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", _dvec("embedding").alias("v")
    )
    aggs = [F.count("*").alias("n")] + [
        F.sum(F.element_at("v", d + 1).cast("decimal(18,6)")).alias(f"s{d}")
        for d in range(EMB_DIM)
    ]
    wide = emb.groupBy("label").agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(d).cast("long").alias("d"),
                (F.col(f"s{d}").cast("double") / F.col("n")).alias("centroid"),
            )
            for d in range(EMB_DIM)
        ]
    )
    return (
        wide.select("label", F.explode(pairs).alias("p"))
        .select("label", F.col("p.d").alias("d"), F.col("p.centroid").alias("centroid"))
        .orderBy("label", "d")
    )


# ---------------------------------------------------------------------------
# X6 scale path #4: Product Quantization (PQ) ANN — the memory-bound
# regime's standard (IVF bounds WORK per query; PQ bounds BYTES per
# vector: 64 floats → PQ_M codes). Like IVF, the whole pipeline —
# per-subspace k-means training included — is exactly reproducible in
# ANSI SQL via the DECIMAL-mean discipline, so training, encoding, and
# ADC scoring all sit under one value-hash oracle.
# ---------------------------------------------------------------------------
PQ_M = 8        # subspaces
PQ_SUB = 8      # dims per subspace (PQ_M × PQ_SUB = EMB_DIM)
PQ_K = 16       # centroids per subspace (codes fit 4 bits)
PQ_ROUNDS = 1   # Lloyd rounds per subspace
PQ_TOPK = 5


def _pq_d2(x, c):
    """Squared L2 via the dot identity, pinned operation order
    ((x·x − 2(x·c)) + c·c) — mirrors the oracle's
    `list_dot_product(x,x) - 2*list_dot_product(x,c) +
    list_dot_product(c,c)` exactly."""
    return _dot(x, x) - F.lit(2.0) * _dot(x, c) + _dot(c, c)


def _pq_code_expr(sub, cents_m):
    """argmin centroid id for one subspace: sort 16 (round(d2,6), cid)
    structs ascending, take the first — ROUND+cid tie-break identical to
    the oracle's ROW_NUMBER ORDER BY."""
    entries = [
        F.struct(
            F.round(
                _pq_d2(sub, F.array(*[F.lit(float(x)) for x in cv])), 6
            ).alias("d2"),
            F.lit(cid).cast("long").alias("cid"),
        )
        for cid, cv in cents_m
    ]
    return F.element_at(F.array_sort(F.array(*entries)), 1)["cid"]


def _pq_sub(col, m):
    return F.slice(col, m * PQ_SUB + 1, PQ_SUB)


def pq_subrows(emb: DataFrame) -> DataFrame:
    """(vec_id, m, x): the corpus exploded to per-subspace slices — the
    join-shaped form of the pipeline (mirrors the oracle's `sub` CTE).
    Chosen over compiling centroids into literal expressions because a
    16-struct × 8-subspace × 3-aggregate literal tree costs ~10 s of
    DRIVER plan construction/analysis at ANY data scale; the join form
    has ONE d2 expression and a broadcast centroid relation instead
    (executor work is identical — a 16× row fan-out on parameter-sized
    keys that the window argmin immediately collapses)."""
    subs = F.array(*[_pq_sub(F.col("v"), m) for m in range(PQ_M)])
    return emb.select("vec_id", F.posexplode(subs).alias("m", "x"))


def _pq_cents_df(spark: SparkSession, cents) -> DataFrame:
    rows = [(m, cid, cv) for m in range(PQ_M) for cid, cv in cents[m]]
    return spark.createDataFrame(rows, "m int, cid long, cv array<double>")


def _pq_assign(sub: DataFrame, cents_df: DataFrame) -> DataFrame:
    """Nearest-codebook-entry per (vec_id, m): broadcast join + window
    argmin on (round(d2,6), cid) — the oracle's ROW_NUMBER shape."""
    from pyspark.sql.window import Window

    j = sub.join(F.broadcast(cents_df), "m").withColumn(
        "d2", F.round(_pq_d2(F.col("x"), F.col("cv")), 6)
    )
    w = Window.partitionBy("vec_id", "m").orderBy("d2", "cid")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", "cid", "x")
    )


def pq_train(spark: SparkSession, emb: DataFrame) -> list[list[tuple[int, list[float]]]]:
    """Per-subspace Lloyd training, model collected to the driver
    (PQ_M × PQ_K × PQ_SUB floats — parameters, not data). Init = the
    first PQ_K corpus vectors' subspace slices; each round is ONE
    assignment join + grouped DECIMAL(18,6) component sums / count
    (bit-identical means, the `_lloyd_round` discipline). Empty
    clusters keep their previous centroid."""
    first = emb.filter(F.col("vec_id") < PQ_K).orderBy("vec_id").collect()
    cents = [
        [
            (int(r["vec_id"]), [float(x) for x in r["v"]][m * PQ_SUB:(m + 1) * PQ_SUB])
            for r in first
        ]
        for m in range(PQ_M)
    ]
    sub = pq_subrows(emb)
    for _ in range(PQ_ROUNDS):
        a = _pq_assign(sub, _pq_cents_df(spark, cents))
        rows = (
            a.groupBy("m", "cid")
            .agg(
                F.count("*").alias("n"),
                *[
                    F.sum(
                        F.element_at("x", d + 1).cast("decimal(18,6)")
                    ).alias(f"s{d}")
                    for d in range(PQ_SUB)
                ],
            )
            .collect()
        )
        got = {
            (r["m"], r["cid"]): [
                float(r[f"s{d}"]) / r["n"] for d in range(PQ_SUB)
            ]
            for r in rows
        }
        cents = [
            [(cid, got.get((m, cid), cv)) for cid, cv in cents[m]]
            for m in range(PQ_M)
        ]
    return cents


def _pq_train_cte_parts(src: str) -> list[str]:
    """The PQ codebook-training CTE chain (init → assign → DECIMAL means
    → coalesce → final codes), parameterized on the subspace relation
    (`sub` for raw vectors, `rsub` for coarse residuals) — ONE text for
    all three oracles (`_pq_oracle`, `_ivfpq_oracle`,
    `_ivfpq_residual_oracle`), the `_ivf_train_parts` discipline."""
    d2 = (
        "list_dot_product(s.x, s.x) - 2*list_dot_product(s.x, c.cv) "
        "+ list_dot_product(c.cv, c.cv)"
    )
    assign = (
        "SELECT vec_id, m, cid FROM ("
        " SELECT s.vec_id, s.m, c.cid,"
        f"  ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m"
        f"   ORDER BY ROUND({d2}, 6), c.cid) AS rn"
        f" FROM {src} s JOIN {{cents}} c ON c.m = s.m) WHERE rn = 1"
    )
    return [
        f"p_c0 AS (SELECT m, vec_id AS cid, x AS cv FROM {src} "
        f"WHERE vec_id < {PQ_K})",
        f"p_a1 AS ({assign.format(cents='p_c0')})",
        f"""p_m1 AS (
        SELECT a.m, a.cid, dd.d,
               CAST(SUM(CAST(s.x[dd.d + 1] AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS mu
        FROM p_a1 a JOIN {src} s ON s.vec_id = a.vec_id AND s.m = a.m
        CROSS JOIN (SELECT UNNEST(range({PQ_SUB})) AS d) dd
        GROUP BY a.m, a.cid, dd.d)""",
        "p_cv1 AS (SELECT m, cid, list(mu ORDER BY d) AS mv "
        "FROM p_m1 GROUP BY m, cid)",
        "p_c1 AS (SELECT p.m, p.cid, COALESCE(n.mv, p.cv) AS cv "
        "FROM p_c0 p LEFT JOIN p_cv1 n ON n.m = p.m AND n.cid = p.cid)",
        f"p_codes AS ({assign.format(cents='p_c1')})",
    ]


def _pq_oracle() -> str:
    parts = [
        f"e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"ms AS (SELECT UNNEST(range({PQ_M})) AS m)",
        f"""sub AS (
        SELECT e.vec_id, ms.m,
               list_slice(e.v, ms.m * {PQ_SUB} + 1, ms.m * {PQ_SUB} + {PQ_SUB})
                   AS x
        FROM e CROSS JOIN ms)""",
        *_pq_train_cte_parts("sub"),
        f"""q_sub AS (
        SELECT vec_id AS query_id, m, x FROM sub
        WHERE vec_id < {N_QUERIES})""",
        """terms AS (
        SELECT q.query_id, k.vec_id,
               CAST(ROUND(list_dot_product(q.x, q.x)
                          - 2*list_dot_product(q.x, c.cv)
                          + list_dot_product(c.cv, c.cv), 6)
                    AS DECIMAL(18,6)) AS t
        FROM p_codes k
        JOIN p_c1 c ON c.m = k.m AND c.cid = k.cid
        JOIN q_sub q ON q.m = k.m
        WHERE k.vec_id <> q.query_id)""",
        """dists AS (
        SELECT query_id, vec_id, SUM(t) AS dist
        FROM terms GROUP BY query_id, vec_id)""",
    ]
    return (
        "WITH "
        + ", ".join(parts)
        + f""" SELECT query_id, CAST(rk AS INTEGER) AS rk, vec_id,
           CAST(dist AS DOUBLE) AS dist
    FROM (
        SELECT query_id, vec_id, dist,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY dist, vec_id) AS rk
        FROM dists)
    WHERE rk <= {PQ_TOPK}
    ORDER BY query_id, rk"""
    )


@query("ann_pq_topk", oracle=_pq_oracle())
def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 PQ: train per-subspace codebooks (DECIMAL-exact Lloyd), encode
    every vector as PQ_M 4-bit codes, score queries by asymmetric
    distance (exact query subvector vs the code's centroid, summed over
    subspaces as 6dp DECIMALs — order-free), rank top-k. Every stage is
    the JOIN form against the broadcast codebook relation (see
    `pq_subrows` for why literals lose).

    Scale story: the corpus side carries ONLY the codes (PQ_M bytes per
    vector vs 256 for raw floats — what makes billion-vector indexes
    RAM-resident); encode/score join a parameter-sized broadcast
    codebook (no shuffle until the per-query top-k); at 100 TB this
    composes with IVF (IVF picks the probe lists, PQ scores inside them
    — the standard IVFPQ pairing)."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec("embedding").alias("v")
    )
    # single-row-group local file -> 1-task scan; spread the fan-out
    emb = emb.repartition(spark.sparkContext.defaultParallelism, "vec_id")
    cents = _cached_train(
        spark, ("pq_raw", sf_dir), lambda: pq_train(spark, emb)
    )
    cents_df = _pq_cents_df(spark, cents)
    sub = pq_subrows(emb)
    codes = _pq_assign(sub, cents_df).select("vec_id", "m", "cid")
    qsub = sub.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "m", F.col("x").alias("qx")
    )
    terms = (
        codes.join(F.broadcast(cents_df), ["m", "cid"])
        .join(F.broadcast(qsub), "m")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(_pq_d2(F.col("qx"), F.col("cv")), 6)
            .cast("decimal(18,6)")
            .alias("t"),
        )
    )
    dists = terms.groupBy("query_id", "vec_id").agg(F.sum("t").alias("dist"))
    w = Window.partitionBy("query_id").orderBy("dist", "vec_id")
    return (
        dists.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= PQ_TOPK)
        .select(
            "query_id",
            F.col("rk").cast("int").alias("rk"),
            "vec_id",
            F.col("dist").cast("double").alias("dist"),
        )
        .orderBy("query_id", "rk")
    )


def _ivfpq_oracle() -> str:
    """IVF coarse train/assign/probe CTEs (shared builder) + the PQ
    codebook/code CTEs (p_-prefixed, raw-vector codes — same codebooks
    as `ann_pq_topk`), glued by ADC scoring over only the probed
    candidates."""
    parts, _ = _ivf_train_parts()
    parts += [
        f"ms AS (SELECT UNNEST(range({PQ_M})) AS m)",
        f"""sub AS (
        SELECT e.vec_id, ms.m,
               list_slice(e.v, ms.m * {PQ_SUB} + 1, ms.m * {PQ_SUB} + {PQ_SUB})
                   AS x
        FROM e CROSS JOIN ms)""",
        *_pq_train_cte_parts("sub"),
        f"""q_sub AS (
        SELECT vec_id AS query_id, m, x FROM sub
        WHERE vec_id < {N_QUERIES})""",
        """cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM probes p JOIN assign a USING (cid)
        WHERE a.vec_id <> p.query_id)""",
        """terms AS (
        SELECT cd.query_id, cd.neighbor_id,
               CAST(ROUND(list_dot_product(q.x, q.x)
                          - 2*list_dot_product(q.x, c.cv)
                          + list_dot_product(c.cv, c.cv), 6)
                    AS DECIMAL(18,6)) AS t
        FROM cand cd
        JOIN p_codes k ON k.vec_id = cd.neighbor_id
        JOIN p_c1 c ON c.m = k.m AND c.cid = k.cid
        JOIN q_sub q ON q.query_id = cd.query_id AND q.m = k.m)""",
        """dists AS (
        SELECT query_id, neighbor_id, SUM(t) AS dist
        FROM terms GROUP BY query_id, neighbor_id)""",
    ]
    return (
        "WITH "
        + ", ".join(parts)
        + f""" SELECT query_id, CAST(rk AS INTEGER) AS rk, neighbor_id,
               CAST(dist AS DOUBLE) AS dist
        FROM (
            SELECT query_id, neighbor_id, dist,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY dist, neighbor_id) AS rk
            FROM dists)
        WHERE rk <= {TOP_K} ORDER BY query_id, rk"""
    )


@query("ann_ivfpq_topk", oracle=_ivfpq_oracle())
def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 capstone — IVFPQ, the standard billion-scale pairing: the IVF
    coarse quantizer prunes each query's search to NPROBE inverted
    lists (~N·nprobe/K candidates), and PQ codes score those candidates
    by asymmetric distance (PQ_M bytes per vector in memory). Both
    trainings are the DECIMAL-exact pipelines already oracled standalone
    (`ann_ivf_topk`, `ann_pq_topk`); this query fuses them under one
    value-hash. Codes quantize RAW vectors (the memory-layout variant);
    residual encoding (v − coarse centroid) is the recall refinement at
    equal bytes, same plan shape.

    Plan: literal-centroid coarse assignment (map-only), broadcast
    probe/codebook joins, ADC terms summed as order-free DECIMALs, one
    per-query top-k window — the corpus never shuffles until top-k."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec("embedding").alias("v")
    )
    emb = emb.repartition(spark.sparkContext.defaultParallelism, "vec_id")

    # coarse quantizer (IVF) — literal-expression assignment
    def _coarse():
        c = _collect_centroids(emb)
        for _ in range(IVF_KMEANS_ROUNDS):
            c = _lloyd_round(emb, c)
        return c

    cents = _cached_train(spark, ("ivf", sf_dir, IVF_KMEANS_ROUNDS), _coarse)
    ranked = _centroid_rank_expr(cents)
    assign = emb.select(
        "vec_id", (-F.element_at(ranked, 1)["negcid"]).alias("cid")
    )
    probes = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.explode(
            F.transform(F.slice(ranked, 1, IVF_NPROBE), lambda s: -s["negcid"])
        ).alias("cid"),
    )
    # fine quantizer (PQ) — join-shaped codes over the broadcast codebook
    pq_cents_df = _pq_cents_df(
        spark,
        _cached_train(spark, ("pq_raw", sf_dir), lambda: pq_train(spark, emb)),
    )
    sub = pq_subrows(emb)
    codes = _pq_assign(sub, pq_cents_df).select(
        "vec_id", "m", F.col("cid").alias("pcid")
    )
    qsub = sub.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "m", F.col("x").alias("qx")
    )
    cand = (
        assign.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    terms = (
        cand.join(codes.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .join(
            F.broadcast(pq_cents_df.withColumnRenamed("cid", "pcid")),
            ["m", "pcid"],
        )
        .join(F.broadcast(qsub), ["query_id", "m"])
        .select(
            "query_id",
            "neighbor_id",
            F.round(_pq_d2(F.col("qx"), F.col("cv")), 6)
            .cast("decimal(18,6)")
            .alias("t"),
        )
    )
    dists = terms.groupBy("query_id", "neighbor_id").agg(
        F.sum("t").alias("dist")
    )
    w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    return (
        dists.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            F.col("rk").cast("int").alias("rk"),
            "neighbor_id",
            F.col("dist").cast("double").alias("dist"),
        )
        .orderBy("query_id", "rk")
    )


def _ivfpq_residual_oracle() -> str:
    """Residual variant: PQ codebooks train on (v − coarse centroid)
    and queries score against per-probed-list residuals — same bytes,
    tighter quantization cells (the production IVFPQ default)."""
    parts, prev = _ivf_train_parts()
    parts += [
        f"""res AS (
        SELECT a.vec_id,
               list_transform(generate_series(1, {EMB_DIM}),
                              i -> a.v[i] - cc.cv[i]) AS rv
        FROM assign a JOIN {prev} cc USING (cid))""",
        f"ms AS (SELECT UNNEST(range({PQ_M})) AS m)",
        f"""rsub AS (
        SELECT r.vec_id, ms.m,
               list_slice(r.rv, ms.m * {PQ_SUB} + 1,
                          ms.m * {PQ_SUB} + {PQ_SUB}) AS x
        FROM res r CROSS JOIN ms)""",
        *_pq_train_cte_parts("rsub"),
        f"""qres AS (
        SELECT p.query_id, p.cid,
               list_transform(generate_series(1, {EMB_DIM}),
                              i -> p.qv[i] - cc.cv[i]) AS rqv
        FROM probes p JOIN {prev} cc USING (cid))""",
        f"""qrsub AS (
        SELECT q.query_id, q.cid, ms.m,
               list_slice(q.rqv, ms.m * {PQ_SUB} + 1,
                          ms.m * {PQ_SUB} + {PQ_SUB}) AS x
        FROM qres q CROSS JOIN ms)""",
        """cand AS (
        SELECT p.query_id, p.cid, a.vec_id AS neighbor_id
        FROM probes p JOIN assign a USING (cid)
        WHERE a.vec_id <> p.query_id)""",
        """terms AS (
        SELECT cd.query_id, cd.neighbor_id,
               CAST(ROUND(list_dot_product(q.x, q.x)
                          - 2*list_dot_product(q.x, c.cv)
                          + list_dot_product(c.cv, c.cv), 6)
                    AS DECIMAL(18,6)) AS t
        FROM cand cd
        JOIN p_codes k ON k.vec_id = cd.neighbor_id
        JOIN p_c1 c ON c.m = k.m AND c.cid = k.cid
        JOIN qrsub q ON q.query_id = cd.query_id AND q.cid = cd.cid
                    AND q.m = k.m)""",
        """dists AS (
        SELECT query_id, neighbor_id, SUM(t) AS dist
        FROM terms GROUP BY query_id, neighbor_id)""",
    ]
    return (
        "WITH "
        + ", ".join(parts)
        + f""" SELECT query_id, CAST(rk AS INTEGER) AS rk, neighbor_id,
               CAST(dist AS DOUBLE) AS dist
        FROM (
            SELECT query_id, neighbor_id, dist,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY dist, neighbor_id) AS rk
            FROM dists)
        WHERE rk <= {TOP_K} ORDER BY query_id, rk"""
    )


@query("ann_ivfpq_residual_topk", oracle=_ivfpq_residual_oracle())
def q_ann_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: residual-encoded IVFPQ — the production default. PQ codebooks
    quantize the RESIDUAL (v − coarse centroid), whose spread is the
    within-list variance only, so each code cell is tighter than raw-PQ
    at identical bytes; queries score each probed list against their own
    per-list residual. Everything (coarse train, residuals, subspace
    train, ADC) under one value-hash oracle.

    Plan deltas vs `ann_ivfpq_topk`: one broadcast coarse-centroid join
    to form residuals (zip_with element subtraction — exact float), and
    ADC terms key on (query, probed-list, m) instead of (query, m)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec("embedding").alias("v")
    )
    emb = emb.repartition(spark.sparkContext.defaultParallelism, "vec_id")

    def _coarse():
        c = _collect_centroids(emb)
        for _ in range(IVF_KMEANS_ROUNDS):
            c = _lloyd_round(emb, c)
        return c

    cents = _cached_train(spark, ("ivf", sf_dir, IVF_KMEANS_ROUNDS), _coarse)
    coarse_df = spark.createDataFrame(
        [(cid, cv) for cid, cv in cents], "cid long, ccv array<double>"
    )
    ranked = _centroid_rank_expr(cents)
    assign = emb.select(
        "vec_id", "v", (-F.element_at(ranked, 1)["negcid"]).alias("cid")
    )
    res = assign.join(F.broadcast(coarse_df), "cid").select(
        "vec_id",
        F.zip_with("v", "ccv", lambda x, y: x - y).alias("v"),
    )
    pq_cents_df = _pq_cents_df(
        spark,
        _cached_train(spark, ("pq_res", sf_dir), lambda: pq_train(spark, res)),
    )
    codes = _pq_assign(pq_subrows(res), pq_cents_df).select(
        "vec_id", "m", F.col("cid").alias("pcid")
    )
    probes = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.explode(
            F.transform(F.slice(ranked, 1, IVF_NPROBE), lambda s: -s["negcid"])
        ).alias("cid"),
    )
    qres = probes.join(F.broadcast(coarse_df), "cid").select(
        "query_id", "cid", F.zip_with("qv", "ccv", lambda x, y: x - y).alias("rqv")
    )
    qrsub = qres.select(
        "query_id",
        "cid",
        F.posexplode(
            F.array(*[_pq_sub(F.col("rqv"), m) for m in range(PQ_M)])
        ).alias("m", "qx"),
    )
    cand = (
        assign.select("vec_id", "cid")
        .join(F.broadcast(probes.select("query_id", "cid")), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "cid", F.col("vec_id").alias("neighbor_id"))
    )
    terms = (
        cand.join(codes.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .join(
            F.broadcast(pq_cents_df.withColumnRenamed("cid", "pcid")),
            ["m", "pcid"],
        )
        .join(F.broadcast(qrsub), ["query_id", "cid", "m"])
        .select(
            "query_id",
            "neighbor_id",
            F.round(_pq_d2(F.col("qx"), F.col("cv")), 6)
            .cast("decimal(18,6)")
            .alias("t"),
        )
    )
    dists = terms.groupBy("query_id", "neighbor_id").agg(
        F.sum("t").alias("dist")
    )
    w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    return (
        dists.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            F.col("rk").cast("int").alias("rk"),
            "neighbor_id",
            F.col("dist").cast("double").alias("dist"),
        )
        .orderBy("query_id", "rk")
    )
