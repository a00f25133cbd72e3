"""X5/X6 — deduplication for large-scale training-data pipelines: exact
(content hash), MinHash+LSH, SimHash, and n-gram Jaccard near-dup.

Reference surface: the reference's only dedup is edge-set semantics
(`smurf_generator.py:50` — U1); these operators are the north-star
extensions (BASELINE.json) designed Spark-first for 100 TB:

- exact dedup: one hash-shuffle on the 256-bit content hash; no text
  comparison ever crosses the wire (hash first, group after).
- MinHash+LSH: shingle → 64 permuted min-hashes (pure JVM column
  expressions over `xxhash64` — no UDF) → band buckets → candidates join
  only within buckets (the quadratic blowup is confined to collisions)
  → exact-Jaccard verification of candidates only.
- SimHash: 64-bit signature via per-bit majority vote of token hashes,
  computed by explode + bit arithmetic + grouped sums; near-dups found by
  band-equality join + popcount(xor) ≤ k verification.
- n-gram Jaccard: exact pairwise set overlap via shingle explode +
  self-join + group count — the oracle-checkable ground truth the
  probabilistic variants approximate.

All tokenization is `split(trim(text), '\\s+')` — byte-identical in
DuckDB (`regexp_split_to_array`), so the Jaccard oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

JACCARD_THRESHOLD = 0.2
SHINGLE_K = 3

#: `dedup_components` CC gate: at or below this many near-dup pairs the
#: component labels come from a driver union-find over one bounded
#: collect (16 B/pair → ≤ ~16 MB, far under maxResultSize); above it the
#: distributed hash-min loop runs. Labels are algorithm-independent
#: (min reachable id), so the gate can never change results.
DEDUP_CC_DRIVER_MAX = 1_000_000
MINHASH_PERMS = 64
LSH_BANDS = 16            # 16 bands × 4 rows
SIMHASH_HAMMING_MAX = 3
#: LSH buckets larger than this are skipped (a bucket of k docs yields
#: k²/2 candidate pairs — one degenerate bucket, e.g. boilerplate-identical
#: bands, would dominate the whole join at 100 TB; real near-dup clusters
#: that big are caught by the other bands with overwhelming probability)
LSH_MAX_BUCKET = 500

# fixed affine permutation constants for MinHash (public textbook scheme:
# h_i(x) = (a_i * x + b_i) mod p). p = 2^31−1 keeps a_i·h < 2^62 — inside
# signed-64 range, so the expression survives Spark's ANSI overflow check.
_P = (1 << 31) - 1
_A = [((2 * i + 1) * 2654435761) % _P or 1 for i in range(MINHASH_PERMS)]
_B = [(i * 40503 + 2654435769) % _P for i in range(MINHASH_PERMS)]


def _tokens(col):
    return F.split(F.trim(col), r"\s+")


def shingles(
    docs: DataFrame, k: int = SHINGLE_K, key: str = "doc_id"
) -> DataFrame:
    """(key, shingle): word k-grams as space-joined strings; DISTINCT
    per key (set semantics). `key` defaults to the per-doc grain; the
    source-overlap family passes key="source" so the per-SOURCE set is
    derived in the same single pass (r9 review: carrying the column
    through the derivation replaces a second documents scan + a
    data-sized doc_id join)."""
    toks = docs.select(key, _tokens(F.col("text")).alias("t"))
    n = F.size("t")
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return (
        toks.filter(n >= k)
        .select(
            key,
            F.explode(
                F.transform(
                    idx, lambda i: F.concat_ws(" ", F.slice("t", i + 1, k))
                )
            ).alias("shingle"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# X5 exact dedup
# ---------------------------------------------------------------------------
@query(
    "dedup_exact",
    oracle="""
    SELECT sha256(text) AS content_hash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY sha256(text)
    ORDER BY content_hash
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: content-hash dedup — hash each doc (sha2-256), group on the
    hash, keep the smallest doc_id. At 100 TB only 32-byte hashes
    shuffle; the text column is pruned before the exchange."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.sha2("text", 256).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .orderBy("content_hash")
    )


# ---------------------------------------------------------------------------
# X6 exact n-gram Jaccard (ground truth for the probabilistic variants)
# ---------------------------------------------------------------------------

#: shared oracle CTE chain producing `pairs(doc1, doc2, jaccard)` — the
#: exact shingle-Jaccard pair graph (reused by near_dup_jaccard and
#: dedup_retention / corpus_filter).
_JACCARD_PAIRS_CTE = f"""
    toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(t[i : i + {SHINGLE_K} - 1], ' ') AS shingle
        FROM toks, UNNEST(range(1, len(t) - {SHINGLE_K} + 2)) AS u(i)
        WHERE len(t) >= {SHINGLE_K}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS both
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
        SELECT i.doc1, i.doc2,
               ROUND(CAST(i.both AS DOUBLE) / (s1.sz + s2.sz - i.both), 6)
                   AS jaccard
        FROM inter i
        JOIN sizes s1 ON i.doc1 = s1.doc_id
        JOIN sizes s2 ON i.doc2 = s2.doc_id
        WHERE CAST(i.both AS DOUBLE) / (s1.sz + s2.sz - i.both)
              >= {JACCARD_THRESHOLD}
    )
"""


def shingle_pair_counts(sh: DataFrame) -> DataFrame:
    """The unsalted shingle-self-join core of `jaccard_pairs`:
    shared-shingle counts per ordered doc pair. Work per shingle key is
    cnt(shingle)² — QUADRATIC in shingle frequency, the same squared-skew
    class as the wedge join (`graph.wedge_common_counts`): a boilerplate
    shingle shared by 10⁵ docs puts 10¹⁰ pairs on one reduce key."""
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count("*").alias("both"))
    )


def shingle_pair_counts_salted(
    sh: DataFrame, salt_buckets: int = 8
) -> DataFrame:
    """Skew-hardened twin (r6 verdict #5 applied to the r7 shape —
    `dedup_components` put this join on the bench path): side a scatters
    each (doc, shingle) row over `salt_buckets` sub-keys — salt =
    hash(doc_id, shingle) pmod buckets — and side b replicates across
    all buckets, so the join key becomes (shingle, salt) and a hot
    shingle's quadratic pair work spreads over salt_buckets tasks.
    Every (a-row, b-row) pair still meets exactly once, in exactly one
    bucket → counts bit-identical (asserted by tools/skewprobe.py on a
    boilerplate-shingle fixture). At 100 TB the OTHER standing
    mitigation is the LSH path's `LSH_MAX_BUCKET`-style frequency cap:
    a shingle in >N docs is boilerplate, not signal."""
    a = sh.select(
        "doc_id",
        "shingle",
        F.pmod(F.hash("doc_id", "shingle"), F.lit(salt_buckets)).alias(
            "salt"
        ),
    ).alias("a")
    b = sh.select(
        "doc_id",
        "shingle",
        F.explode(
            F.sequence(F.lit(0), F.lit(salt_buckets - 1))
        ).alias("salt"),
    ).alias("b")
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count("*").alias("both"))
    )


def jaccard_pairs(
    docs: DataFrame, salted: bool = False, df_cap: int | None = None
) -> DataFrame:
    """Exact shingle-set Jaccard pair graph: (doc1 < doc2, jaccard ≥ τ).
    Explode + equi-self-join on the shingle + group counts — quadratic
    only within identical shingles (at scale this is what LSH bounds;
    `salted=True` swaps in the skew-hardened bit-identical join).

    `df_cap` drops shingles whose document frequency exceeds the cap
    BEFORE sizes and intersections (Jaccard over the capped shingle
    space) — the production decontamination of the quadratic key:
    a shingle in many docs is boilerplate, not near-dup signal, and its
    cnt² pair work is exactly what melts the reducer (BASELINE.md r7
    shingle-skew table). Results CHANGE under the cap (documented
    recall trade: pairs similar ONLY through boilerplate disappear) —
    the capped query carries its own oracle."""
    # Exactly ONE relation is persisted per call — the final shingle
    # space the sizes/intersection branches share. Persisting the
    # pre-cap base AS WELL (the r7-review form) leaked a second
    # session-lifetime cache entry per capped call (r7 ADVICE): the
    # handle was overwritten and never unpersisted. The df filter's
    # agg + left-semi probe re-derive the tokenize/explode lineage
    # inside the one capped materialization job instead — a single
    # extra map-side pass, not a standing cache leak.
    #
    # Why persist() and not localCheckpoint() (r8 review): Spark's
    # CacheManager keys cache entries by ANALYZED PLAN, so the
    # identical shingles(docs) relation is one shared entry across the
    # plain/salted queries in a sweep (visible as "Asked to cache
    # already cached data" on the second call) — an eager checkpoint
    # would rematerialize per call and lose that reuse. The retained
    # entry is bounded by design: one per distinct (corpus plan,
    # df_cap) pair per session — capped calls cache the POST-cap
    # relation, so each distinct cap value pins its own entry (r8
    # ADVICE; callers sweeping many cap values should unpersist after
    # materializing) — not per invocation. The registered queries use
    # exactly two shapes (uncapped, cap=5), so the session holds at
    # most two entries per corpus.
    sh = shingles(docs)
    if df_cap is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= df_cap)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle", "left_semi")
    sh = sh.persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        shingle_pair_counts_salted(sh) if salted else shingle_pair_counts(sh)
    )
    s1 = sizes.withColumnsRenamed({"doc_id": "doc1", "sz": "sz1"})
    s2 = sizes.withColumnsRenamed({"doc_id": "doc2", "sz": "sz2"})
    jac = F.col("both").cast("double") / (F.col("sz1") + F.col("sz2") - F.col("both"))
    return (
        inter.join(s1, "doc1")
        .join(s2, "doc2")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc1", "doc2", F.round(jac, 6).alias("jaccard"))
    )


@query(
    "near_dup_jaccard",
    oracle=f"""
    WITH {_JACCARD_PAIRS_CTE}
    SELECT doc1, doc2, jaccard FROM pairs ORDER BY doc1, doc2
    """,
)
def q_near_dup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 exact: shingle-set Jaccard ≥ τ via explode + equi-self-join on
    the shingle + group counts. Quadratic only within identical shingles
    — at scale this is what LSH bounds; kept exact here as the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(docs).orderBy("doc1", "doc2")


@query(
    "near_dup_jaccard_salted",
    oracle=f"""
    WITH {_JACCARD_PAIRS_CTE}
    SELECT doc1, doc2, jaccard FROM pairs ORDER BY doc1, doc2
    """,
)
def q_near_dup_jaccard_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 under explicit shingle-key salting — SAME oracle as
    `near_dup_jaccard` (the salted plan must be bit-identical), the
    dedup family's `node_jaccard_salted` analogue (r7): the shingle
    key's reduce work is cnt(shingle)² — a boilerplate shingle is the
    hub — so side a scatters over hash(doc_id, shingle) pmod 8 and side
    b replicates ×8. Probe numbers in BASELINE.md (r7 shingle-skew
    table, tools/skewprobe.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(docs, salted=True).orderBy("doc1", "doc2")


#: document-frequency cap for the capped Jaccard variant: a shingle in
#: more docs than this is treated as boilerplate and dropped from the
#: shingle space (chosen to BITE on the testdata — max df there is 7-9,
#: p99 ≈ 4-5 — so the capped results measurably differ from the exact
#: form and the recall trade is visible, not vacuous)
SHINGLE_DF_CAP = 5


@query(
    "near_dup_jaccard_capped",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    ),
    sh0 AS (
        SELECT DISTINCT doc_id,
               array_to_string(t[i : i + {SHINGLE_K} - 1], ' ') AS shingle
        FROM toks, UNNEST(range(1, len(t) - {SHINGLE_K} + 2)) AS u(i)
        WHERE len(t) >= {SHINGLE_K}
    ),
    keep AS (
        SELECT shingle FROM sh0 GROUP BY shingle
        HAVING COUNT(*) <= {SHINGLE_DF_CAP}
    ),
    sh AS (SELECT s.* FROM sh0 s JOIN keep k USING (shingle)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS both
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc1, i.doc2,
           ROUND(CAST(i.both AS DOUBLE) / (s1.sz + s2.sz - i.both), 6)
               AS jaccard
    FROM inter i
    JOIN sizes s1 ON i.doc1 = s1.doc_id
    JOIN sizes s2 ON i.doc2 = s2.doc_id
    WHERE CAST(i.both AS DOUBLE) / (s1.sz + s2.sz - i.both)
          >= {JACCARD_THRESHOLD}
    ORDER BY doc1, doc2
    """,
)
def q_near_dup_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 with the PRODUCTION skew mitigation: shingles in more than
    {SHINGLE_DF_CAP} docs are boilerplate and leave the shingle space
    before sizes/intersections (Jaccard over the capped space — own
    oracle, since results legitimately change). This removes the cnt²
    hot key at the SOURCE rather than spreading it (the salted twin);
    at corpus scale the cap is what Gopher/SlimPajama-class dedup
    pipelines apply, with the salted form as the no-semantic-change
    fallback. The df filter is one aggregate + a left-semi join —
    same shuffle key the pair join needs anyway."""
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(docs, df_cap=SHINGLE_DF_CAP).orderBy("doc1", "doc2")


# ---------------------------------------------------------------------------
# X6 MinHash + LSH (scale path; JVM-only expressions)
# ---------------------------------------------------------------------------
def hashed_shingles(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, shash): shingles reduced to int64 BEFORE the distinct —
    the set shuffle moves 8-byte hashes instead of k-word strings (the
    scale form; xxhash64 collisions ~1e-9 are noise next to MinHash's own
    variance). The string form stays for the exact-Jaccard oracle query."""
    toks = docs.select("doc_id", _tokens(F.col("text")).alias("t"))
    n = F.size("t")
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return (
        toks.filter(n >= k)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice("t", i + 1, k)))
                )
            ).alias("shash"),
        )
        .distinct()
    )


def minhash_signatures(
    sh: DataFrame, perms: int = MINHASH_PERMS, with_size: bool = False
) -> DataFrame:
    """(doc_id, sig array<long>): min over shingles of (a_i·h + b_i) mod p,
    h = non-negative xxhash64 of the shingle (accepts either the string
    `shingle` column or the pre-hashed `shash`). Pure column expressions —
    one grouped aggregation computes all permutations. `with_size=True`
    appends an exact `sz` SET-size column from the SAME aggregation
    pass and applies the distinct ITSELF (COUNT is duplicate-sensitive
    where MIN is not — review catch: a docstring-only precondition
    would let a caller follow the recommended distinct=False MIN-only
    derivation and silently inflate every size); callers should feed
    the raw non-distinct stream, the X85 shape. The containment
    estimator needs both quantities and this keeps one corpus scan and
    one distinct exchange. The distinct is taken over the KEY columns
    only — (doc_id, shash|shingle) — projected first, so a caller
    passing extra payload columns (weights, metadata) cannot silently
    inflate `sz` while the signatures stay correct (r11 ADVICE)."""
    if with_size:
        key = "shash" if "shash" in sh.columns else "shingle"
        sh = sh.select("doc_id", key).distinct()
    h = (
        F.abs(F.col("shash")) % _P
        if "shash" in sh.columns
        else F.abs(F.xxhash64("shingle")) % _P
    )
    aggs = [
        F.min((F.lit(_A[i]) * h + F.lit(_B[i])) % _P).alias(f"m{i}")
        for i in range(perms)
    ]
    if with_size:
        aggs.append(F.count("*").cast("long").alias("sz"))
    wide = sh.groupBy("doc_id").agg(*aggs)
    cols = ["doc_id", F.array(*[f"m{i}" for i in range(perms)]).alias("sig")]
    if with_size:
        cols.append(F.col("sz"))
    return wide.select(*cols)


@query("near_dup_minhash_lsh")
def q_near_dup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 LSH: band the 64-perm signature into 16×4, bucket-join on
    (band_id, band hash), verify candidates with exact Jaccard. Only
    bucket collisions are compared — the 100 TB-safe plan. Rows-only
    (hash functions differ across engines); the Jaccard verifier is
    oracle-pinned separately."""
    docs = load_table(spark, sf_dir, "documents")
    # the local testdata ships documents as ONE parquet split, which
    # would serialize the CPU-heavy shingle derivation onto a single
    # task; hash-repartition by doc_id first (deterministic, value-free
    # — at 100 TB the scan already has thousands of splits and this
    # exchange is balance insurance, not a bottleneck)
    docs = docs.repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    sh = hashed_shingles(docs).persist()
    sig = minhash_signatures(sh)
    rows_per_band = MINHASH_PERMS // LSH_BANDS
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", i * rows_per_band + j + 1)
                                for j in range(rows_per_band)
                            ],
                        )
                    )
                    for i in range(LSH_BANDS)
                ]
            )
        ).alias("band_id", "band_hash"),
    )
    # document-frequency guard: drop degenerate buckets BEFORE the
    # quadratic candidate join (one extra agg over the tiny band relation)
    bad_buckets = (
        bands.groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("bsz"))
        .filter(F.col("bsz") > LSH_MAX_BUCKET)
        .drop("bsz")
    )
    # anti-join against the OVERSIZED list — it is the tiny side (a handful
    # of degenerate buckets), so it broadcasts at any corpus size, where
    # the ok-bucket list grows with the corpus
    bands = bands.join(F.broadcast(bad_buckets), ["band_id", "band_hash"], "left_anti")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )
    # exact verification of candidates only: candidate pairs × doc1's
    # shingles, then equi-join on (doc2, shingle) keeps intersection rows
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    s1 = sh.withColumnRenamed("doc_id", "doc1")
    s2 = sh.withColumnRenamed("doc_id", "doc2")
    inter = (
        cand.join(s1, "doc1")
        .join(s2, ["doc2", "shash"])
        .groupBy("doc1", "doc2")
        .agg(F.count("*").alias("both"))
    )
    z1 = sizes.withColumnsRenamed({"doc_id": "doc1", "sz": "sz1"})
    z2 = sizes.withColumnsRenamed({"doc_id": "doc2", "sz": "sz2"})
    jac = F.col("both").cast("double") / (F.col("sz1") + F.col("sz2") - F.col("both"))
    return (
        inter.join(z1, "doc1")
        .join(z2, "doc2")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc1", "doc2", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc1", "doc2")
    )


# ---------------------------------------------------------------------------
# X6 SimHash
# ---------------------------------------------------------------------------
def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash long): per-bit majority vote over token xxhash64s
    — explode + 64 conditional sums + bit reassembly, all JVM-side."""
    toks = docs.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    sig = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return votes.select("doc_id", sig.alias("simhash"))


def _minhash_mins_sql() -> str:
    """The 64 affine-permutation MIN columns over the portable shingle
    hash — the drift-sensitive permutation arithmetic, shared verbatim
    by every MinHash oracle (`_minhash_hashed_sql`,
    `_source_overlap_minhash_sql`, `_source_containment_minhash_sql`);
    the fragments were byte-identical copies before the r11 extraction,
    so the registered oracle strings are unchanged (verified by hash)."""
    return ", ".join(
        f"MIN(({_A[i]} * (shash % {_P}) + {_B[i]}) % {_P}) AS m{i}"
        for i in range(MINHASH_PERMS)
    )


def _minhash_match_sum_sql() -> str:
    """The quadratic per-perm signature match count (`a` vs `b` sigs) —
    shared by the source-pair oracles, same extraction rationale."""
    return " + ".join(
        f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)"
        for i in range(MINHASH_PERMS)
    )


def _minhash_hashed_sql() -> str:
    """DuckDB twin of the FULL MinHash+LSH pipeline over the
    engine-portable shingle hash: distinct shingle hashes → 64 affine-
    permutation minima → 16 arithmetic band folds → bucket join (with
    the same oversized-bucket guard) → exact-Jaccard verification of
    candidates only. Generated column-per-permutation like the Spark
    side."""
    from .text import _ARITH_TOK_SQL

    sh_hash = _ARITH_TOK_SQL.format(tok="shingle")
    mins = _minhash_mins_sql()
    rpb = MINHASH_PERMS // LSH_BANDS

    def fold(cols):
        acc = "CAST(0 AS BIGINT)"
        for c in cols:
            acc = f"((({acc}) * 2654435761 + {c}) % 1000000007)"
        return acc

    band_arms = " UNION ALL ".join(
        f"SELECT doc_id, {i} AS band_id, "
        f"{fold([f'm{i * rpb + j}' for j in range(rpb)])} AS band_val FROM sigs"
        for i in range(LSH_BANDS)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, {sh_hash} AS shash FROM (
            SELECT doc_id,
                   array_to_string(t[i : i + {SHINGLE_K} - 1], ' ') AS shingle
            FROM toks, UNNEST(range(1, len(t) - {SHINGLE_K} + 2)) AS u(i)
            WHERE len(t) >= {SHINGLE_K})
    ),
    sigs AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
    bands AS ({band_arms}),
    ok AS (
        SELECT doc_id, band_id, band_val FROM bands
        QUALIFY COUNT(*) OVER (PARTITION BY band_id, band_val)
                <= {LSH_MAX_BUCKET}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
        FROM ok a JOIN ok b
          ON a.band_id = b.band_id AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT c.doc1, c.doc2, COUNT(*) AS both
        FROM cand c
        JOIN sh s1 ON s1.doc_id = c.doc1
        JOIN sh s2 ON s2.doc_id = c.doc2 AND s2.shash = s1.shash
        GROUP BY c.doc1, c.doc2
    )
    SELECT i.doc1, i.doc2,
           ROUND(CAST(i.both AS DOUBLE) / (z1.sz + z2.sz - i.both), 6)
               AS jaccard
    FROM inter i
    JOIN sizes z1 ON i.doc1 = z1.doc_id
    JOIN sizes z2 ON i.doc2 = z2.doc_id
    WHERE CAST(i.both AS DOUBLE) / (z1.sz + z2.sz - i.both)
          >= {JACCARD_THRESHOLD}
    ORDER BY doc1, doc2
    """


def hashed_shingles_arith(
    docs: DataFrame,
    k: int = SHINGLE_K,
    key: str = "doc_id",
    distinct: bool = True,
) -> DataFrame:
    """(key, shash) with the engine-portable polynomial hash of the
    space-joined k-gram — the oracle-able twin of `hashed_shingles`
    (whose xxhash64 stays the scale default). `key`/`distinct` mirror
    `shingles` (r9 review): the MinHash source-overlap path passes
    key="source", distinct=False — MIN is duplicate-insensitive, so
    paying a distinct exchange just to feed a MIN aggregate is a
    wasted data-sized shuffle."""
    from .text import arith_token_hash

    toks = docs.select(key, _tokens(F.col("text")).alias("t"))
    n = F.size("t")
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    out = (
        toks.filter(n >= k)
        .select(
            key,
            F.explode(
                F.transform(
                    idx,
                    lambda i: arith_token_hash(
                        F.concat_ws(" ", F.slice("t", i + 1, k))
                    ),
                )
            ).alias("shash"),
        )
    )
    return out.distinct() if distinct else out


@query("near_dup_minhash_hashed", oracle=_minhash_hashed_sql())
def q_near_dup_minhash_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 MinHash+LSH with a FULL value-hash oracle — the same banded
    pipeline as `near_dup_minhash_lsh` (signatures → band buckets →
    guarded bucket join → exact-Jaccard verify) with every hash
    engine-portable: polynomial shingle hash, affine permutations,
    arithmetic band folds."""
    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    sh = hashed_shingles_arith(docs).persist()
    sig = minhash_signatures(sh)
    rpb = MINHASH_PERMS // LSH_BANDS

    def fold(cols):
        acc = F.lit(0).cast("long")
        for c in cols:
            acc = (acc * 2654435761 + c) % 1000000007
        return acc

    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    fold(
                        [
                            F.element_at("sig", i * rpb + j + 1)
                            for j in range(rpb)
                        ]
                    )
                    for i in range(LSH_BANDS)
                ]
            )
        ).alias("band_id", "band_val"),
    )
    bad = (
        bands.groupBy("band_id", "band_val")
        .agg(F.count("*").alias("bsz"))
        .filter(F.col("bsz") > LSH_MAX_BUCKET)
        .drop("bsz")
    )
    bands = bands.join(F.broadcast(bad), ["band_id", "band_val"], "left_anti")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    s1 = sh.withColumnRenamed("doc_id", "doc1")
    s2 = sh.withColumnRenamed("doc_id", "doc2")
    inter = (
        cand.join(s1, "doc1")
        .join(s2, ["doc2", "shash"])
        .groupBy("doc1", "doc2")
        .agg(F.count("*").alias("both"))
    )
    z1 = sizes.withColumnsRenamed({"doc_id": "doc1", "sz": "sz1"})
    z2 = sizes.withColumnsRenamed({"doc_id": "doc2", "sz": "sz2"})
    jac = F.col("both").cast("double") / (F.col("sz1") + F.col("sz2") - F.col("both"))
    return (
        inter.join(z1, "doc1")
        .join(z2, "doc2")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc1", "doc2", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc1", "doc2")
    )


SIMHASH_HB = 60  # bits in the oracle-portable signature (4 bands × 15;
#: 60 not 64 — DuckDB BIGINT arithmetic is overflow-CHECKED, so 1<<63
#: would error; 60 bits keeps every shift/sum comfortably in range)


def _simhash_hashed_sql() -> str:
    """DuckDB twin of the arithmetic simhash: same polynomial token hash
    (llm.text.arith_token_hash), same per-bit rehash, same majority vote
    and band join — generated column-per-bit like the Spark side."""
    from .text import _ARITH_TOK_SQL

    tok_h = _ARITH_TOK_SQL.format(tok="tok")
    sums = ", ".join(
        f"SUM(CASE WHEN ((th + {i} * 97) * 2654435761) % 1000000007 % 2 = 1 "
        f"THEN 1 ELSE -1 END) AS b{i}"
        for i in range(SIMHASH_HB)
    )
    sig = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(SIMHASH_HB)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
        FROM documents
    ),
    th AS (SELECT doc_id, {tok_h} AS th FROM toks WHERE tok <> ''),
    votes AS (SELECT doc_id, {sums} FROM th GROUP BY doc_id),
    sig AS (SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM votes),
    bands AS (
        SELECT doc_id, simhash, CAST(b.b AS INTEGER) AS band_id,
               (simhash >> (15 * CAST(b.b AS INTEGER))) & 32767 AS band_val
        FROM sig CROSS JOIN (SELECT UNNEST(range({SIMHASH_HB // 15})) AS b) b
    )
    SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_val = b.band_val
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_HAMMING_MAX}
    ORDER BY doc1, doc2
    """


def simhash_signatures_hashed(docs: DataFrame, bits: int = SIMHASH_HB) -> DataFrame:
    """(doc_id, simhash long) from the engine-portable polynomial token
    hash: bit i votes on the parity of a per-bit integer rehash of the
    token hash. Same explode + conditional-sum + bit-reassembly plan as
    the xxhash64 path — one shuffle on doc_id."""
    from .text import HASH_P, arith_token_hash

    toks = (
        docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
        .withColumn("th", arith_token_hash(F.col("tok")))
    )
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    ((F.col("th") + i * 97) * 2654435761) % HASH_P % 2 == 1, 1
                ).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return votes.select("doc_id", sig.alias("simhash"))


@query("near_dup_simhash_hashed", oracle=_simhash_hashed_sql())
def q_near_dup_simhash_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 SimHash with a FULL value-hash oracle: 60-bit arithmetic
    signature, 4×15-bit band join, popcount verify — the same plan shape
    as the xxhash64 path, every intermediate engine-portable. NOTE the
    synthetic corpus has a ~31-word vocabulary, so ANY unigram simhash
    collapses many docs to nearby signatures — pair counts here measure
    parity, not detector quality (see the shingle-based MinHash path for
    the discriminative detector)."""
    docs = load_table(spark, sf_dir, "documents")
    sig = simhash_signatures_hashed(docs).persist()
    bands = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", 15 * i).bitwiseAND(F.lit(0x7FFF))
                    for i in range(SIMHASH_HB // 15)
                ]
            )
        ).alias("band_id", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= SIMHASH_HAMMING_MAX)
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
        .orderBy("doc1", "doc2")
    )


@query("near_dup_simhash")
def q_near_dup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 SimHash: 4×16-bit band join, verify popcount(xor) ≤ 3.
    Rows-only (xxhash64 engine-specific)."""
    docs = load_table(spark, sf_dir, "documents")
    sig = simhash_signatures(docs).persist()
    bands = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("band_id", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= SIMHASH_HAMMING_MAX)
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            ham.alias("hamming"),
        )
        .distinct()
        .orderBy("doc1", "doc2")
    )


# ---------------------------------------------------------------------------
# Dedup clustering + retention, and the end-to-end pretraining corpus filter
# ---------------------------------------------------------------------------

#: recursive-closure CTE chain turning `pairs` (from _JACCARD_PAIRS_CTE)
#: into `comp(node, canonical)` — min-reachable-label connected components
#: over the near-dup pair graph (oracle twin of hash-min label propagation)
_COMPONENT_CTE = """
    und AS (
        SELECT doc1 AS a, doc2 AS b FROM pairs
        UNION SELECT doc2, doc1 FROM pairs
    ),
    reach AS (
        SELECT a AS node, a AS label FROM und
        UNION
        SELECT u.b AS node, r.label
        FROM reach r JOIN und u ON u.a = r.node
    ),
    comp AS (SELECT node, MIN(label) AS canonical FROM reach GROUP BY node)
"""

#: `corpus_filter` keeps documents with quality ≥ this
QUALITY_MIN = 0.6


def pair_graph_components(pairs: DataFrame) -> DataFrame:
    """(node, component) labels for a near-dup pair relation
    (src, dst), SIZE-GATED (r17, guide §1.2 — the distributed algorithm
    is the lever): component labels are algorithm-independent (min
    reachable id), and on the measured pair graphs (256 pairs at sf0.1)
    the distributed hash-min loop spent 4-6 s of per-round fixed cost
    labeling a relation that fits in one task. At or below
    DEDUP_CC_DRIVER_MAX pairs the labels come from a driver union-find
    over ONE bounded collect of the lazily-checkpointed pair relation
    (the smurf fixture-scale-branch precedent: explicit gate constant,
    distributed fallback); above it the hash-min loop runs unchanged —
    at 100 TB a near-dup pair graph easily exceeds the gate. Branch
    parity is pinned by test_dedup_components_gate_branches_agree."""
    import numpy as np
    import pandas as pd

    spark = pairs.sparkSession
    pairs = pairs.localCheckpoint(eager=False)
    if pairs.count() <= DEDUP_CC_DRIVER_MAX:
        # Arrow collect (r17 ADVICE): toPandas transfers two int64
        # columns (16 B/pair of driver heap, ~16 MB at the gate), where
        # collect() built a Python Row object per pair — hundreds of MB
        # at the gate boundary, unbounded by spark.driver.memory. The
        # remaining driver state is the union-find dict + the node
        # array: O(nodes) ints, ≤2M entries at the gate (~150 MB worst
        # case) — that, not the serialized pairs, is now the quantity
        # the gate bounds.
        pdf = pairs.select("src", "dst").toPandas()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for s, d in zip(pdf["src"].to_numpy(), pdf["dst"].to_numpy()):
            a, b = find(int(s)), find(int(d))
            if a != b:
                # larger root under smaller → every root stays its
                # component's minimum id, matching the hash-min labels
                parent[max(a, b)] = min(a, b)
        nodes = np.unique(
            np.concatenate([pdf["src"].to_numpy(), pdf["dst"].to_numpy()])
        )
        if len(nodes) == 0:
            return spark.createDataFrame([], "node long, component long")
        out = pd.DataFrame(
            {
                "node": nodes.astype("int64"),
                "component": np.array(
                    [find(int(x)) for x in nodes], dtype="int64"
                ),
            }
        )
        return spark.createDataFrame(out, "node long, component long")
    from ..operators.graph import connected_components

    return connected_components(pairs).select("node", "component")


def retention_components(docs: DataFrame) -> DataFrame:
    """(node, component) over the exact-Jaccard near-dup pair graph —
    the size-gated labeling (`pair_graph_components`)."""
    return pair_graph_components(
        jaccard_pairs(docs).select(
            F.col("doc1").alias("src"), F.col("doc2").alias("dst")
        )
    )


def shared_retention_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped cache of the retention-family component labels
    (r18, the r17 deferred item): dedup_components, dedup_retention and
    corpus_filter each rebuilt the identical jaccard pair graph (~2.3 s
    of shingle self-join per call at sf0.1) and re-labeled it. One
    labeling per (session, sf_dir), checkpointed (the labels relation is
    near-dup-bounded — tiny next to the corpus at any scale); the same
    `session_bucket` pattern as iforest.shared_points. The cache key
    also carries the CC size gate so the branch-parity test's gate flip
    (tests/test_llm.py::test_dedup_components_gate_branches_agree)
    still exercises both labeling branches instead of hitting the
    cache."""
    from ..session_cache import session_bucket

    per_session = session_bucket(spark, "retention_components")
    key = (sf_dir, DEDUP_CC_DRIVER_MAX)
    df = per_session.get(key)
    if df is None:
        docs = load_table(spark, sf_dir, "documents")
        df = retention_components(docs).localCheckpoint()
        per_session[key] = df
    return df


@query(
    "dedup_retention",
    oracle=f"""
    WITH RECURSIVE {_JACCARD_PAIRS_CTE},
    {_COMPONENT_CTE},
    csize AS (
        SELECT canonical, COUNT(*) AS cluster_size FROM comp GROUP BY canonical
    )
    SELECT d.doc_id,
           COALESCE(c.canonical, d.doc_id) AS canonical_doc_id,
           COALESCE(c.canonical, d.doc_id) = d.doc_id AS is_kept,
           CAST(COALESCE(s.cluster_size, 1) AS BIGINT) AS cluster_size
    FROM documents d
    LEFT JOIN comp c ON d.doc_id = c.node
    LEFT JOIN csize s ON COALESCE(c.canonical, d.doc_id) = s.canonical
    ORDER BY d.doc_id
    """,
)
def q_dedup_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5/X6 retention: cluster the near-dup pair graph with connected
    components (hash-min label propagation), keep the min doc_id per
    cluster as canonical, and emit a per-document retention decision —
    the step a real dedup pipeline runs AFTER pair discovery. At 100 TB
    only the pair graph (tiny vs the corpus) enters the iterative part;
    documents join it by one broadcast-size left join."""
    docs = load_table(spark, sf_dir, "documents")
    comp = shared_retention_components(spark, sf_dir).withColumnRenamed(
        "node", "doc_id"
    )
    csize = comp.groupBy(F.col("component").alias("canonical_doc_id")).agg(
        F.count("*").alias("csz")
    )
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .withColumn("canonical_doc_id", F.coalesce("component", "doc_id"))
        .join(csize, "canonical_doc_id", "left")
        .select(
            "doc_id",
            "canonical_doc_id",
            (F.col("doc_id") == F.col("canonical_doc_id")).alias("is_kept"),
            F.coalesce("csz", F.lit(1)).cast("long").alias("cluster_size"),
        )
        .orderBy("doc_id")
    )


def _corpus_filter_oracle() -> str:
    from .text import QUALITY_CTE

    return f"""
    WITH RECURSIVE {_JACCARD_PAIRS_CTE},
    {_COMPONENT_CTE},
    {QUALITY_CTE}
    SELECT q.doc_id, q.n_tokens, q.quality
    FROM quality q
    LEFT JOIN comp c ON q.doc_id = c.node
    WHERE COALESCE(c.canonical, q.doc_id) = q.doc_id
      AND q.quality >= {QUALITY_MIN}
    ORDER BY q.doc_id
    """


@query("corpus_filter", oracle=_corpus_filter_oracle())
def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end pretraining corpus filter: near-dup retention (keep the
    canonical document of every cluster) ∩ heuristic quality ≥ τ — the
    composition a training-data pipeline actually ships. One pass computes
    quality (projection, no shuffle); only the tiny pair graph iterates."""
    from .text import quality_metrics

    docs = load_table(spark, sf_dir, "documents")
    comp = shared_retention_components(spark, sf_dir).withColumnRenamed(
        "node", "doc_id"
    )
    return (
        quality_metrics(docs)
        .join(comp, "doc_id", "left")
        .filter(
            (F.coalesce("component", "doc_id") == F.col("doc_id"))
            & (F.col("quality") >= QUALITY_MIN)
        )
        .select("doc_id", "n_tokens", "quality")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# X6: edit-distance near-dup — the dedup family member for SMALL edits
# (typo-level) that shingle/minhash overweights and embedding-cosine
# underweights. Levenshtein is identical integer math in both engines.
# The Spark side prunes candidate pairs with the lossless length-band
# bound |len(a)−len(b)| ≤ k (an edit distance is at least the length
# difference) — at scale that plus a band join replaces the all-pairs
# form the oracle uses on its bounded scope.
# ---------------------------------------------------------------------------
LEV_MAX = 20
LEV_PREFIX = 80
LEV_SCOPE = 200


@query(
    "near_dup_levenshtein",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, substring(text, 1, {LEV_PREFIX}) AS t
        FROM documents WHERE doc_id < {LEV_SCOPE}
    )
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE levenshtein(a.t, b.t) <= {LEV_MAX}
    ORDER BY id1, id2
    """,
)
def q_near_dup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: prefix-Levenshtein near-dup pairs ≤ {LEV_MAX} on the first
    {LEV_SCOPE} docs. The lossless length-band bound
    |len(a)−len(b)| ≤ LEV_MAX is realised as an EQUI-join on a length
    bucket of width LEV_MAX: any in-band pair differs by ≤ 1 bucket, so
    exploding one side to buckets {b−1, b, b+1} and hash-joining on the
    bucket covers every band pair exactly once (the right side holds one
    bucket per row; the explode values are distinct). Catalyst plans a
    hash/sort-merge join — never a BroadcastNestedLoopJoin — so at 100 TB
    only same-or-adjacent-length-bucket rows ever meet; the abs() band and
    the Levenshtein threshold remain as post-join predicates."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < LEV_SCOPE)
        .select("doc_id", F.substring("text", 1, LEV_PREFIX).alias("t"))
        .withColumn("tl", F.length("t"))
        .withColumn("bkt", F.floor(F.col("tl") / LEV_MAX))
    )
    a = (
        d.withColumn(
            "jbkt",
            F.explode(
                F.array(F.col("bkt") - 1, F.col("bkt"), F.col("bkt") + 1)
            ),
        )
        .drop("bkt")
        .alias("a")
    )
    b = d.withColumnRenamed("bkt", "jbkt").alias("b")
    return (
        a.join(b, F.col("a.jbkt") == F.col("b.jbkt"))
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.abs(F.col("a.tl") - F.col("b.tl")) <= LEV_MAX)
        )
        .select(
            F.col("a.doc_id").alias("id1"),
            F.col("b.doc_id").alias("id2"),
            F.levenshtein(F.col("a.t"), F.col("b.t")).cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= LEV_MAX)
        .orderBy("id1", "id2")
    )


#: containment threshold — max-directional |A∩B|/min(|A|,|B|) cut
CONTAINMENT_THRESHOLD = 0.5


@query(
    "containment_dedup",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(t[i : i + {SHINGLE_K} - 1], ' ') AS shingle
        FROM toks, UNNEST(range(1, len(t) - {SHINGLE_K} + 2)) AS u(i)
        WHERE len(t) >= {SHINGLE_K}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS both
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc1, i.doc2,
           ROUND(CAST(i.both AS DOUBLE) / s1.sz, 6) AS c12,
           ROUND(CAST(i.both AS DOUBLE) / s2.sz, 6) AS c21
    FROM inter i
    JOIN sizes s1 ON i.doc1 = s1.doc_id
    JOIN sizes s2 ON i.doc2 = s2.doc_id
    WHERE CAST(i.both AS DOUBLE) / LEAST(s1.sz, s2.sz)
          >= {CONTAINMENT_THRESHOLD}
    ORDER BY doc1, doc2
    """,
)
def q_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 asymmetric variant: shingle CONTAINMENT C(A→B) = |A∩B|/|A| —
    the measure that catches a short document embedded inside a long one
    (quote farms, boilerplate wrappers), which symmetric Jaccard misses
    because the union is dominated by the larger doc. Reported in both
    directions; the pair qualifies when the max-directional containment
    (= intersection over the SMALLER set) clears the threshold.

    Same equi-join-on-shingle skeleton as `near_dup_jaccard` (this is
    the bounded oracle form; at scale the candidate pairs come from the
    MinHash-LSH buckets and this ratio is computed only on candidates)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.withColumnRenamed("doc_id", "doc1")
    b = sh.withColumnRenamed("doc_id", "doc2")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count("*").alias("both"))
    )
    s1 = sizes.withColumnsRenamed({"doc_id": "doc1", "sz": "sz1"})
    s2 = sizes.withColumnsRenamed({"doc_id": "doc2", "sz": "sz2"})
    both_d = F.col("both").cast("double")
    return (
        inter.join(s1, "doc1")
        .join(s2, "doc2")
        .filter(
            both_d / F.least("sz1", "sz2") >= CONTAINMENT_THRESHOLD
        )
        .select(
            "doc1",
            "doc2",
            F.round(both_d / F.col("sz1"), 6).alias("c12"),
            F.round(both_d / F.col("sz2"), 6).alias("c21"),
        )
        .orderBy("doc1", "doc2")
    )


# ---------------------------------------------------------------------------
# r7: dedup cluster resolution — the step between "near-dup PAIRS" and an
# actually deduplicated corpus: pairs form a graph, connected components
# are the duplicate clusters, one canonical representative survives per
# cluster (min doc_id — deterministic, and exactly what hash-min CC labels
# produce). This is how production pipelines (e.g. the MinHash-dedup
# described in the Gopher/RefinedWeb reports) turn pairwise similarity
# into delete lists. Scale: the pair graph is near-dup-bounded (tiny next
# to the corpus); the hash-min rounds converge in O(cluster diameter) ≈
# a handful of rounds on dup clusters.
# ---------------------------------------------------------------------------
@query(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE {_JACCARD_PAIRS_CTE},
    und AS (SELECT doc1 AS a, doc2 AS b FROM pairs
            UNION SELECT doc2, doc1 FROM pairs),
    nodes AS (SELECT DISTINCT a AS node FROM und),
    reach AS (
        SELECT node, node AS label FROM nodes
        UNION
        SELECT u.b AS node, r.label
        FROM reach r JOIN und u ON u.a = r.node
    ),
    comp AS (
        SELECT node AS doc_id, MIN(label) AS component
        FROM reach GROUP BY node
    ),
    csz AS (
        SELECT component, COUNT(*) AS csize FROM comp GROUP BY component
    )
    SELECT c.doc_id, c.component, CAST(s.csize AS BIGINT) AS csize,
           CAST(CASE WHEN c.doc_id = c.component THEN 1 ELSE 0 END
                AS BIGINT) AS keep
    FROM comp c JOIN csz s USING (component)
    ORDER BY c.doc_id
    """,
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters + canonical-representative selection: connected
    components over the exact-Jaccard pair graph; component = min doc_id
    in the cluster, so `keep` marks exactly one survivor per cluster.
    Docs with no near-dup partner don't appear (they trivially survive).
    The oracle walks the same pair graph with a recursive closure +
    MIN(label). Labeling is the size-gated `pair_graph_components`
    (r17): measured 5.9 → 2.2 s warm at sf0.1 for this query."""
    comp = shared_retention_components(spark, sf_dir)
    sizes = comp.groupBy("component").agg(
        F.count("*").cast("long").alias("csize")
    )
    return (
        comp.withColumnRenamed("node", "doc_id")
        .join(sizes, "component")
        .select(
            "doc_id",
            "component",
            "csize",
            (F.col("doc_id") == F.col("component")).cast("long").alias("keep"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# X84/X85 cross-source overlap matrix (r9 — the r7 verdict's
# corpus-contamination report between ingest sources)
# ---------------------------------------------------------------------------

_SOURCE_OVERLAP_SQL = f"""
    WITH toks AS (
        SELECT source, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT source,
               array_to_string(t[i : i + {SHINGLE_K} - 1], ' ') AS shingle
        FROM toks, UNNEST(range(1, len(t) - {SHINGLE_K} + 2)) AS u(i)
        WHERE len(t) >= {SHINGLE_K}
    ),
    sizes AS (SELECT source, COUNT(*) AS sz FROM sh GROUP BY source),
    inter AS (
        SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b
          ON a.shingle = b.shingle AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT i.src_a, i.src_b, CAST(i.n_common AS BIGINT) AS n_common,
           CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b,
           ROUND(CAST(i.n_common AS DOUBLE)
                 / (sa.sz + sb.sz - i.n_common), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.src_a
    JOIN sizes sb ON sb.source = i.src_b
    ORDER BY src_a, src_b
    """


@query("source_overlap_matrix", oracle=_SOURCE_OVERLAP_SQL)
def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source shingle-overlap matrix (X84, r9): per-source DISTINCT
    shingle sets -> pairwise intersection counts via ONE equi-join on the
    shingle -> exact Jaccard per (src_a < src_b) source pair. The standard
    corpus-contamination report between ingest sources: which pairs of
    crawls/dumps feed the training mix the same content (the
    source-level aggregate of what `near_dup_jaccard` reports per-doc,
    and what `contamination_ngram` reports vs a benchmark).

    Scale shape: the per-shingle join fan-out is (#sources carrying that
    shingle)^2 <= |sources|^2 — bounded by the SOURCE catalog, not by
    docs (the per-doc Jaccard's cnt^2-in-docs hot key does not exist at
    this granularity); aggregates land on a source-pair-sized relation
    (C(20,2) = 190 rows at sf0.01). The one data-sized exchange is the
    (source, shingle) distinct. Jaccard is the pinned single-division
    IEEE chain over exact BIGINTs, rounded 6dp like the doc-level
    family. The shared per-source shingle relation feeds sizes + both
    join sides -> persisted, the `jaccard_pairs` session-cache trade
    (one entry per corpus plan). The source column rides THROUGH the
    shingle derivation (shingles(key="source") — r9 review): one
    documents scan and one distinct, no second scan and no data-sized
    doc_id join to re-attach a column the row already had."""
    docs = load_table(spark, sf_dir, "documents")
    src_sh = shingles(docs, key="source").persist()
    sizes = src_sh.groupBy("source").agg(F.count("*").cast("long").alias("sz"))
    a, b = src_sh.alias("a"), src_sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("n_common")
    )
    return (
        inter.join(sizes.select(F.col("source").alias("src_a"),
                                F.col("sz").alias("sz_a")), "src_a")
        .join(sizes.select(F.col("source").alias("src_b"),
                           F.col("sz").alias("sz_b")), "src_b")
        .select("src_a", "src_b", "n_common", "sz_a", "sz_b",
                F.round(jac, 6).alias("jaccard"))
        .orderBy("src_a", "src_b")
    )


_SOURCE_CONTAINMENT_SQL = f"""
    WITH base AS ({_SOURCE_OVERLAP_SQL})
    SELECT src_a, src_b, n_common, sz_a, sz_b,
           ROUND(CAST(n_common AS DOUBLE) / sz_a, 6) AS containment_a_in_b,
           ROUND(CAST(n_common AS DOUBLE) / sz_b, 6) AS containment_b_in_a,
           jaccard
    FROM base
    ORDER BY src_a, src_b
    """


@query("source_containment_matrix", oracle=_SOURCE_CONTAINMENT_SQL)
def q_source_containment_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source CONTAINMENT matrix (X87, r10 — the r9 verdict's
    birth #2): for each source pair, |A∩B|/|A| and |A∩B|/|B| alongside
    the Jaccard — the ASYMMETRIC ingestion-direction signal Jaccard
    hides for unequal-size sources (a small dump fully swallowed by a
    big crawl has Jaccard ≈ |small|/|big| ≈ 0 but containment ≈ 1.0;
    an ingest pipeline should then drop the dump, and the direction
    says which side to drop — the X43 per-doc `containment_dedup`
    argument lifted to source level). Output: one row per
    (src_a < src_b) pair with both directions.

    Pure composition on X84 (`source_overlap_matrix`) in BOTH engines —
    every needed quantity (n_common, sz_a, sz_b) is already in its
    output, so this adds two pinned single divisions over exact BIGINTs
    (rounded 6dp, the X84 jaccard discipline; sz ≥ n_common ≥ 1 > 0 so
    no division guard is needed in either engine) and re-sorts. No
    second shingle pass: the X84 call persists its per-source shingle
    relation plan-keyed, so a sweep running both queries shares one
    cache entry (the `jaccard_pairs` session-cache trade). Scale
    posture is X84's unchanged — |sources|²-bounded join fan-out,
    source-pair-sized aggregates; the signature-only scale path is X85."""
    base = q_source_overlap_matrix(spark, sf_dir)
    return base.select(
        "src_a",
        "src_b",
        "n_common",
        "sz_a",
        "sz_b",
        F.round(
            F.col("n_common").cast("double") / F.col("sz_a"), 6
        ).alias("containment_a_in_b"),
        F.round(
            F.col("n_common").cast("double") / F.col("sz_b"), 6
        ).alias("containment_b_in_a"),
        "jaccard",
    ).orderBy("src_a", "src_b")


def _source_overlap_minhash_sql() -> str:
    """DuckDB twin of `q_source_overlap_minhash`: per-source MinHash
    signatures over the engine-portable polynomial shingle hash (the
    `_minhash_hashed_sql` scheme grouped by source — MIN is
    duplicate-insensitive, so no per-doc distinct is needed), then the
    per-perm match count per source pair. The oracle enumerates the
    source-pair matches with a quadratic CASE-sum over the 64 minima
    (source-count-sized — fine for SQL); the Spark side uses the
    scale-shaped posexplode + (perm, value) equi-join."""
    from .text import _ARITH_TOK_SQL

    sh_hash = _ARITH_TOK_SQL.format(tok="shingle")
    mins = _minhash_mins_sql()
    match_sum = _minhash_match_sum_sql()
    return f"""
    WITH toks AS (
        SELECT source, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    ),
    sh AS (
        SELECT source, {sh_hash} AS shash FROM (
            SELECT source,
                   array_to_string(t[i : i + {SHINGLE_K} - 1], ' ') AS shingle
            FROM toks, UNNEST(range(1, len(t) - {SHINGLE_K} + 2)) AS u(i)
            WHERE len(t) >= {SHINGLE_K})
    ),
    sigs AS (SELECT source, {mins} FROM sh GROUP BY source),
    pairs AS (
        SELECT a.source AS src_a, b.source AS src_b,
               ({match_sum}) AS n_match
        FROM sigs a JOIN sigs b ON a.source < b.source
    )
    SELECT src_a, src_b, CAST(n_match AS BIGINT) AS n_match,
           CAST(n_match AS DOUBLE) / {MINHASH_PERMS} AS est_jaccard
    FROM pairs WHERE n_match >= 1
    ORDER BY src_a, src_b
    """


@query("source_overlap_minhash", oracle=_source_overlap_minhash_sql())
def q_source_overlap_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-estimated cross-source overlap (X85, r9): the X84 report
    from the signatures alone — per-source 64-perm MinHash over the
    UNION of the source's shingles (MIN over (source, shingle-hash)
    rows; min-of-mins = min-over-union, so source-level signatures are
    exactly doc-level MinHash semantics lifted a level, and MIN's
    duplicate-insensitivity makes the per-doc distinct unnecessary),
    estimated Jaccard = matching perms / {MINHASH_PERMS}. This is the
    100 TB path: the exact X84 join scans the full (source, shingle)
    relation pairwise, while this one reduces each source to a 64-long
    signature and compares signatures — the per-pair estimate lands
    within the standard 1/sqrt(64) MinHash error of X84's exact value
    (asserted by a tolerance test, and the estimate is exact-dyadic
    c/64 so the value-hash is stable cross-engine).

    Spark shape: signature aggregation is one grouped MIN over the
    hashed-shingle relation (map-side partial); pair matching
    posexplodes the source-count x 64 signature relation and
    equi-joins on (perm index, minimum value) — only agreeing perms
    meet, no source x source loop, no cartesian (pairs with zero
    agreeing perms drop out, mirrored by the oracle's n_match >= 1)."""
    docs = load_table(spark, sf_dir, "documents")
    # source rides through the derivation (one scan, no doc_id
    # re-join) and the distinct exchange is skipped entirely — MIN is
    # duplicate-insensitive, so the signature aggregate consumes the
    # raw exploded stream map-side (r9 review, both fixes)
    src_sh = hashed_shingles_arith(
        docs, key="source", distinct=False
    ).select(F.col("source").alias("doc_id"), "shash")
    # materialize the source-count-sized signature relation before the
    # self-join: both join sides otherwise re-derive the full
    # corpus-scan → shingle → group lineage (r9 review; A/B at sf0.1
    # warm: 3.35–3.84 s checkpointed vs 4.01–4.52 s recomputed; with
    # the one-pass key="source", distinct=False derivation the warm
    # floor settles at ~2.3 s — the one unavoidable shingle pass)
    sig = minhash_signatures(src_sh).localCheckpoint()
    perms = sig.select(
        F.col("doc_id").alias("source"),
        F.posexplode("sig").alias("i", "m"),
    )
    a, b = perms.alias("a"), perms.alias("b")
    return (
        a.join(
            b,
            (F.col("a.i") == F.col("b.i"))
            & (F.col("a.m") == F.col("b.m"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count("*").cast("long").alias("n_match"))
        .select(
            "src_a", "src_b", "n_match",
            (F.col("n_match").cast("double") / MINHASH_PERMS)
            .alias("est_jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


def _source_containment_minhash_sql() -> str:
    """DuckDB twin of `source_containment_minhash` (registered r12 into
    the slot freed by the canary retirement — NOTES "Window capacity";
    the cross-engine unit test also drives this SQL directly): the X85
    signature scheme over a DISTINCT per-source shingle-hash relation
    (the distinct pays for the exact per-source set size COUNT needs —
    MIN alone would not need it), pair match counts via the quadratic
    CASE-sum, then the inclusion-exclusion containment estimate:
    est_J = n/{MINHASH_PERMS}; est_common = est_J·(sz_a+sz_b)/(1+est_J)
    = n·(sz_a+sz_b)/({MINHASH_PERMS}+n), CLAMPED to min(sz_a, sz_b) —
    an intersection can never exceed the smaller set, and the
    unclamped estimate can (review catch); est_containment(A in B) =
    est_common/sz_a. Exact-BIGINT numerators, the pinned
    division + LEAST + division chain identical in both engines."""
    from .text import _ARITH_TOK_SQL

    sh_hash = _ARITH_TOK_SQL.format(tok="shingle")
    mins = _minhash_mins_sql()
    match_sum = _minhash_match_sum_sql()
    return f"""
    WITH toks AS (
        SELECT source, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT source, {sh_hash} AS shash FROM (
            SELECT source,
                   array_to_string(t[i : i + {SHINGLE_K} - 1], ' ') AS shingle
            FROM toks, UNNEST(range(1, len(t) - {SHINGLE_K} + 2)) AS u(i)
            WHERE len(t) >= {SHINGLE_K})
    ),
    sigs AS (SELECT source, {mins},
                    CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY source),
    pairs AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(({match_sum}) AS BIGINT) AS n_match,
               a.sz AS sz_a, b.sz AS sz_b
        FROM sigs a JOIN sigs b ON a.source < b.source
    ),
    est AS (
        SELECT *, LEAST(CAST(n_match * (sz_a + sz_b) AS DOUBLE)
                            / ({MINHASH_PERMS} + n_match),
                        CAST(LEAST(sz_a, sz_b) AS DOUBLE)) AS est_common
        FROM pairs WHERE n_match >= 1
    )
    SELECT src_a, src_b, n_match, sz_a, sz_b,
           CAST(n_match AS DOUBLE) / {MINHASH_PERMS} AS est_jaccard,
           ROUND(est_common / sz_a, 6) AS est_containment_a_in_b,
           ROUND(est_common / sz_b, 6) AS est_containment_b_in_a
    FROM est
    ORDER BY src_a, src_b
    """


@query("source_containment_minhash", oracle=_source_containment_minhash_sql())
def source_containment_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-estimated cross-source CONTAINMENT matrix (X91, pre-built
    end-r11, REGISTERED r12 into the canary-retirement slot — see NOTES
    "Window capacity"): X87's asymmetric
    swallowed-source signal computed from signatures + exact set sizes
    alone, no shingle-pair join — the 100 TB path for the containment
    report exactly as X85 is for the Jaccard report. Estimate via
    inclusion-exclusion on the MinHash Jaccard: with J = c/(a+b−c),
    c = J·(a+b)/(1+J), so est_common = n·(sz_a+sz_b)/(perms+n) over
    exact BIGINTs, CLAMPED to min(sz_a, sz_b) — an intersection can
    never exceed the smaller set, and for very asymmetric pairs the
    raw estimate can blow far past it on a single chance permutation
    collision (review catch: sz 1000 vs 4 → raw containment 3.86);
    est_containment(A in B) = est_common/sz_a, rounded 6dp. All
    operands stay below 2^53 up to ~10^11 shingles per source pair,
    so the division + LEAST + division chain is correctly rounded and
    hash-stable cross-engine. MEASURED end-r10 (banked in NOTES): max
    |Δ| vs the exact X87 containment 0.115, median 0.016 over the 148
    estimate-covered source pairs at sf0.01 — inside the 1/sqrt(64)
    MinHash envelope, pinned by a 0.2 tolerance test.

    Spark shape: ONE distinct (source, shash) exchange (the distinct
    is what makes the COUNT an exact set size — X85 skips it because
    MIN alone is duplicate-insensitive, but containment needs |A|),
    then ONE grouped aggregation produces all 64 minima AND the size
    (`minhash_signatures(with_size=True)`), localCheckpoint'd at
    source-count size; the pair match is X85's posexplode +
    (perm, value) equi-join with sz carried through the group keys —
    no sizes re-join, no source×source loop, no second corpus scan.
    Reference anchor: `AA-AR.py` has no corpus tooling at all; this
    extends the X84/X85/X87 family the engine adds for training-data
    curation."""
    docs = load_table(spark, sf_dir, "documents")
    # raw non-distinct stream (the X85 shape) — with_size=True applies
    # the one distinct exchange itself, so the set size is exact
    src_sh = hashed_shingles_arith(docs, key="source", distinct=False).select(
        F.col("source").alias("doc_id"), "shash"
    )
    sig = minhash_signatures(src_sh, with_size=True).localCheckpoint()
    perms = sig.select(
        F.col("doc_id").alias("source"),
        "sz",
        F.posexplode("sig").alias("i", "m"),
    )
    a, b = perms.alias("a"), perms.alias("b")
    matched = (
        a.join(
            b,
            (F.col("a.i") == F.col("b.i"))
            & (F.col("a.m") == F.col("b.m"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .agg(F.count("*").cast("long").alias("n_match"))
    )
    num = (F.col("n_match") * (F.col("sz_a") + F.col("sz_b"))).cast("double")
    # est_common clamped to min(sz_a, sz_b): an intersection can never
    # exceed the smaller set, but the raw inclusion-exclusion estimate
    # can (review catch: sz_a=1000, sz_b=4, one chance perm collision →
    # raw containment_b_in_a 3.86 — semantically impossible and past
    # any swallowed-source threshold); the clamp only ever moves the
    # estimate TOWARD the truth, and LEAST of exact doubles is
    # hash-stable cross-engine like the divisions
    est_common = F.least(
        num / (F.lit(MINHASH_PERMS) + F.col("n_match")),
        F.least("sz_a", "sz_b").cast("double"),
    )
    return matched.select(
        "src_a",
        "src_b",
        "n_match",
        "sz_a",
        "sz_b",
        (F.col("n_match").cast("double") / MINHASH_PERMS)
        .alias("est_jaccard"),
        F.round(est_common / F.col("sz_a"), 6)
        .alias("est_containment_a_in_b"),
        F.round(est_common / F.col("sz_b"), 6)
        .alias("est_containment_b_in_a"),
    ).orderBy("src_a", "src_b")
