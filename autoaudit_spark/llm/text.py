"""X7 — text analysis over the `documents` table: token statistics, term
frequencies, quality scoring, n-gram language ID, fingerprinting.

Everything except the fingerprint is pure JVM column expressions with a
byte-identical DuckDB oracle (tokenizer: `split(trim(text), '\\s+')` ↔
`regexp_split_to_array`). The fingerprint uses xxhash64 (engine-specific
→ rows-only)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"

#: tiny per-language marker lists for the n-gram/stopword language-ID
#: heuristic (public-knowledge marker words)
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "von"),
    "es": ("el", "la", "de", "que", "es"),
    "fr": ("le", "la", "et", "est", "des"),
}


def _tokens(col):
    return F.split(F.trim(col), r"\s+")


@query(
    "token_stats",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    )
    SELECT doc_id, lang,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
           ROUND(CAST(len(array_to_string(t, '')) AS DOUBLE) / len(t), 6)
               AS mean_tok_len,
           CAST(len(list_filter(t, x -> list_contains({stop}, x))) AS BIGINT)
               AS n_stopwords
    FROM toks WHERE len(t) > 0
    ORDER BY doc_id
    """.format(stop=_STOP_SQL),
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: per-doc token counts, vocabulary, mean token length, stopword
    count — one projection, no shuffle (higher-order array functions)."""
    docs = load_table(spark, sf_dir, "documents")
    t = _tokens(F.col("text"))
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    d = docs.select("doc_id", "lang", t.alias("t")).filter(F.size("t") > 0)
    return d.select(
        "doc_id",
        "lang",
        F.size("t").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("t")).cast("long").alias("n_distinct"),
        F.round(
            F.length(F.array_join("t", "")).cast("double") / F.size("t"), 6
        ).alias("mean_tok_len"),
        F.size(F.filter("t", lambda x: F.array_contains(stop, x)))
        .cast("long")
        .alias("n_stopwords"),
    ).orderBy("doc_id")


@query(
    "term_frequencies",
    oracle="""
    WITH toks AS (
        SELECT lower(unnest(regexp_split_to_array(trim(text), '\\s+'))) AS term
        FROM documents
    )
    SELECT term, COUNT(*) AS freq
    FROM toks WHERE term <> ''
    GROUP BY term ORDER BY freq DESC, term LIMIT 50
    """,
)
def q_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: global top-50 terms — explode + hash agg + top-k (the
    HashingTF/IDF substrate; map-side combine keeps the shuffle tiny)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(_tokens(F.col("text"))).alias("term"))
        .select(F.lower("term").alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), "term")
        .limit(50)
    )


#: shared oracle CTE chain producing
#: `quality(doc_id, n_tokens, punct_ratio, stop_ratio, mean_wlen, quality)`
#: — reused by `quality_scores` and `corpus_filter` (llm/dedup.py).
QUALITY_CTE = """
    qtoks AS (
        SELECT doc_id, text,
               regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    ),
    qm AS (
        SELECT doc_id,
               CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))
                    AS DOUBLE) / length(text) AS punct_ratio,
               CAST(len(list_filter(t, x -> list_contains({stop}, lower(x))))
                    AS DOUBLE) / len(t) AS stop_ratio,
               CAST(length(array_to_string(t, '')) AS DOUBLE) / len(t) AS mean_wlen
        FROM qtoks WHERE len(t) > 0
    ),
    quality AS (
        SELECT doc_id, n_tokens, ROUND(punct_ratio, 6) AS punct_ratio,
               ROUND(stop_ratio, 6) AS stop_ratio,
               ROUND(mean_wlen, 6) AS mean_wlen,
               ROUND(CAST(
                   (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 0.4 ELSE 0.0 END)
                   + (CASE WHEN stop_ratio BETWEEN 0.05 AND 0.6 THEN 0.3 ELSE 0.0 END)
                   + (CASE WHEN mean_wlen BETWEEN 2 AND 12 THEN 0.2 ELSE 0.0 END)
                   + (CASE WHEN punct_ratio <= 0.2 THEN 0.1 ELSE 0.0 END)
               AS DOUBLE), 6) AS quality
        FROM qm
    )
""".format(stop=_STOP_SQL)


@query(
    "quality_scores",
    oracle=f"""
    WITH {QUALITY_CTE}
    SELECT doc_id, n_tokens, punct_ratio, stop_ratio, mean_wlen, quality
    FROM quality ORDER BY doc_id
    """,
)
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: heuristic quality score — length / stopword-ratio / word-length
    / punctuation band checks (the classic pretraining-filter recipe),
    pure arithmetic, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    return quality_metrics(docs).orderBy("doc_id")


def quality_metrics(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, punct_ratio, stop_ratio, mean_wlen, quality) —
    the pretraining-filter metrics behind `quality_scores`, one projection,
    no shuffle. Shared with `corpus_filter` (llm/dedup.py)."""
    t = _tokens(F.col("text"))
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    d = docs.select("doc_id", "text", t.alias("t")).filter(F.size("t") > 0)
    n_tokens = F.size("t").cast("long")
    punct_ratio = (
        F.length("text")
        - F.length(F.regexp_replace("text", r"[.!?,;:]", ""))
    ).cast("double") / F.length("text")
    stop_ratio = (
        F.size(F.filter("t", lambda x: F.array_contains(stop, F.lower(x)))).cast("double")
        / F.size("t")
    )
    mean_wlen = F.length(F.array_join("t", "")).cast("double") / F.size("t")
    quality = (
        F.when((n_tokens >= 20) & (n_tokens <= 1000), 0.4).otherwise(0.0)
        + F.when((stop_ratio >= 0.05) & (stop_ratio <= 0.6), 0.3).otherwise(0.0)
        + F.when((mean_wlen >= 2) & (mean_wlen <= 12), 0.2).otherwise(0.0)
        + F.when(punct_ratio <= 0.2, 0.1).otherwise(0.0)
    )
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(mean_wlen, 6).alias("mean_wlen"),
        F.round(quality, 6).alias("quality"),
    )


def _lang_score(tcol, markers):
    arr = F.array(*[F.lit(w) for w in markers])
    return F.size(F.filter(tcol, lambda x: F.array_contains(arr, F.lower(x)))).cast(
        "double"
    ) / F.size(tcol)


@query(
    "lang_id",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang AS labeled_lang,
               regexp_split_to_array(trim(lower(text)), '\\s+') AS t
        FROM documents
    ),
    scores AS (
        SELECT doc_id, labeled_lang,
               {scores}
        FROM toks WHERE len(t) > 0
    )
    SELECT doc_id, labeled_lang,
           CASE greatest({cols})
                {whens}
                ELSE 'unk' END AS predicted_lang
    FROM scores ORDER BY doc_id
    """.format(
        scores=", ".join(
            "CAST(len(list_filter(t, x -> list_contains(["
            + ", ".join(f"'{w}'" for w in ws)
            + "], x))) AS DOUBLE) / len(t) AS s_" + lang
            for lang, ws in LANG_MARKERS.items()
        ),
        cols=", ".join(f"s_{l}" for l in LANG_MARKERS),
        whens=" ".join(
            # ordered WHENs resolve ties by insertion order (en first)
            f"WHEN s_{l} THEN '{l}'" for l in LANG_MARKERS
        ),
    ),
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: marker-word language ID — per-language token-hit ratios, argmax
    via greatest + CASE (tie → first language in declaration order)."""
    docs = load_table(spark, sf_dir, "documents")
    t = _tokens(F.lower(F.trim(F.col("text"))))
    d = docs.select(
        "doc_id", F.col("lang").alias("labeled_lang"), t.alias("t")
    ).filter(F.size("t") > 0)
    scored = d.select(
        "doc_id",
        "labeled_lang",
        *[_lang_score(F.col("t"), ws).alias(f"s_{l}") for l, ws in LANG_MARKERS.items()],
    )
    best = F.greatest(*[F.col(f"s_{l}") for l in LANG_MARKERS])
    pred = F.lit("unk")
    # build CASE in reverse so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when(F.col(f"s_{lang}") == best, lang).otherwise(pred)
    return scored.select("doc_id", "labeled_lang", pred.alias("predicted_lang")).orderBy(
        "doc_id"
    )


CHUNK_SIZE, CHUNK_STRIDE = 200, 150  # 50-char overlap


@query(
    "chunk_documents",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, text, length(text) AS n FROM documents
        WHERE length(trim(text)) > 0
    ),
    ix AS (
        SELECT doc_id, text, n,
               UNNEST(range(0, ((GREATEST(n - {CHUNK_SIZE}, 0)
                                 + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE}) + 1))
                   AS i
        FROM d
    )
    SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
           CAST(i * {CHUNK_STRIDE} AS BIGINT) AS chunk_start,
           CAST(LEAST({CHUNK_SIZE}, n - i * {CHUNK_STRIDE}) AS BIGINT)
               AS chunk_len,
           substring(text, CAST(i * {CHUNK_STRIDE} + 1 AS INTEGER), {CHUNK_SIZE})
               AS chunk_text
    FROM ix ORDER BY doc_id, chunk_id
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pipeline chunking: fixed-size character chunks with overlap
    (size {0}, stride {1}) — start offsets via `sequence` + `explode`
    (pure JVM, no shuffle before the final sort), last chunk keeps the
    tail. Character semantics match DuckDB (both count codepoints).""".format(
        CHUNK_SIZE, CHUNK_STRIDE
    )
    docs = load_table(spark, sf_dir, "documents")
    n = F.length("text")
    k = (F.greatest(n - CHUNK_SIZE, F.lit(0)) + (CHUNK_STRIDE - 1)) / F.lit(
        CHUNK_STRIDE
    )
    d = docs.filter(F.length(F.trim("text")) > 0).select(
        "doc_id",
        "text",
        n.alias("n"),
        F.explode(F.sequence(F.lit(0), k.cast("int"))).alias("i"),
    )
    start = F.col("i") * CHUNK_STRIDE
    return d.select(
        "doc_id",
        F.col("i").cast("int").alias("chunk_id"),
        start.cast("long").alias("chunk_start"),
        F.least(F.lit(CHUNK_SIZE), F.col("n") - start).cast("long").alias("chunk_len"),
        F.substring("text", start + 1, CHUNK_SIZE).alias("chunk_text"),
    ).orderBy("doc_id", "chunk_id")


TFIDF_TOP = 3


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lower(unnest(regexp_split_to_array(trim(text), '\\s+')))
                   AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks
        WHERE term <> '' GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
    scored AS (
        SELECT t.doc_id, t.term, t.tf, d.df,
               ROUND(CAST(t.tf AS DOUBLE)
                     * ln(CAST((SELECT n FROM nd) AS DOUBLE) / d.df), 6)
                   AS tfidf
        FROM tf t JOIN df d USING (term)
    )
    SELECT doc_id, term, tf, df, tfidf, rk FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                      ORDER BY tfidf DESC, term) AS rk
        FROM scored
    ) WHERE rk <= {TFIDF_TOP}
    ORDER BY doc_id, rk
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: per-document TF-IDF top terms — tf and df as hash aggregates
    (map-side combined), document count broadcast, idf = ln(N/df), top-k
    per doc via analytic window. The df relation is the only reused
    intermediate; at scale both aggregations shuffle once on `term`."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id", F.explode(_tokens(F.col("text"))).alias("term")
        )
        .select("doc_id", F.lower("term").alias("term"))
        .filter(F.col("term") != "")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_rel = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = tf.select("doc_id").distinct().count()
    scored = tf.join(df_rel, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf").cast("double")
            * F.log(F.lit(float(n_docs)) / F.col("df")),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TFIDF_TOP)
        .select("doc_id", "term", "tf", "df", "tfidf", "rk")
        .orderBy("doc_id", "rk")
    )


#: per-stratum keep rates (ppm) — heavier downsampling of the dominant
#: language, the standard pretraining-mix rebalancing shape
SAMPLE_PPM = {"en": 200_000, "de": 500_000, "es": 500_000, "fr": 500_000}
SAMPLE_PPM_DEFAULT = 800_000


def _doc_keep_hash(doc_id):
    return ((doc_id % 1000003) * 2654435761 + 13 * 97) % 1000000007 % 1000000


@query(
    "sample_stratified",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    WHERE (((doc_id % 1000003) * 2654435761 + 13 * 97)
           % 1000000007) % 1000000
          < CASE lang WHEN 'en' THEN 200000 WHEN 'de' THEN 500000
                      WHEN 'es' THEN 500000 WHEN 'fr' THEN 500000
                      ELSE 800000 END
    ORDER BY doc_id
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pipeline stratified sampling: per-language keep rates applied
    through the content-addressed hash-Bernoulli predicate (the same
    discipline as `background_edges`) — partition-layout independent,
    reproducible on any cluster, and pushed down to the scan as a plain
    deterministic filter. No shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(SAMPLE_PPM_DEFAULT)
    for lang, ppm in SAMPLE_PPM.items():
        rate = F.when(F.col("lang") == lang, ppm).otherwise(rate)
    return (
        docs.filter(_doc_keep_hash(F.col("doc_id")) < rate)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


#: modulus for the engine-portable polynomial hashes (fits BIGINT math
#: in both engines: acc < 1e9+7, acc*131 + 127 < 2^63)
HASH_P = 1000000007


def arith_token_hash(tok):
    """Polynomial rolling hash over codepoints, mod 1e9+7 — the
    engine-portable twin of xxhash64 (DuckDB: list_reduce over
    string_split + ascii). Used where a value-hash oracle is wanted;
    xxhash64 remains the scale-path hash (wider, better avalanche)."""
    return F.aggregate(
        F.split(tok, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 131 + F.ascii(c)) % HASH_P,
    )


_ARITH_TOK_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split({tok}, ''), c -> CAST(ascii(c) AS BIGINT))), "
    "(a, c) -> (a * 131 + c) % 1000000007)"
)


@query(
    "doc_fingerprint_hashed",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    ),
    th AS (
        SELECT doc_id,
               list_transform(t, tok -> {_ARITH_TOK_SQL.format(tok='tok')})
                   AS hs
        FROM toks WHERE len(t) >= 5
    ),
    grams AS (
        SELECT doc_id,
               list_reduce(hs[i.i + 1 : i.i + 5],
                           (a, b) -> (a * 131 + b) % 1000000007) AS gh
        FROM th CROSS JOIN (SELECT UNNEST(range(0, 100000)) AS i) i
        WHERE i.i <= len(hs) - 5
    )
    SELECT doc_id, MIN(gh) AS min_hash, MAX(gh) AS max_hash,
           COUNT(DISTINCT gh) AS n_grams
    FROM grams GROUP BY doc_id ORDER BY doc_id
    """,
)
def q_doc_fingerprint_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 fingerprint with a full value-hash oracle: token 5-gram
    polynomial hashes (arith_token_hash folded again across the 5 token
    hashes), min/max/distinct-count per document — same plan shape as the
    xxhash64 path, engine-portable arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    t = _tokens(F.col("text"))
    k = 5
    n = F.size("t")
    idx = F.sequence(F.lit(0), n - k)
    hs = F.transform(F.col("t"), arith_token_hash)
    grams = (
        docs.select("doc_id", t.alias("t"))
        .filter(n >= k)
        .select("doc_id", hs.alias("hs"))
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("hs") - k),
                    lambda i: F.aggregate(
                        F.slice("hs", i + 1, k),
                        F.lit(0).cast("long"),
                        lambda a, b: (a * 131 + b) % HASH_P,
                    ),
                )
            ).alias("gh"),
        )
    )
    return (
        grams.groupBy("doc_id")
        .agg(
            F.min("gh").alias("min_hash"),
            F.max("gh").alias("max_hash"),
            F.countDistinct("gh").alias("n_grams"),
        )
        .orderBy("doc_id")
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: winnowing-style fingerprint — min/max/count over the doc's
    token-5-gram xxhash64 set (hash is engine-specific, so this form is
    not value-hash checkable). Driver row RETIRED r15 (the r14 verdict's
    swap ruling): `doc_fingerprint_hashed` above carries the full oracle
    for the identical plan shape, and the xxhash64 production kernel
    stays importable and structurally pinned against the hashed twin by
    `tests/test_llm.py` — retiring the rows-only row freed the window
    slot that registered `truss_formation`."""
    docs = load_table(spark, sf_dir, "documents")
    t = _tokens(F.col("text"))
    k = 5
    n = F.size("t")
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    grams = (
        docs.select("doc_id", t.alias("t"))
        .filter(n >= k)
        .select(
            "doc_id",
            F.explode(
                F.transform(idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice("t", i + 1, k))))
            ).alias("gh"),
        )
    )
    return (
        grams.groupBy("doc_id")
        .agg(
            F.min("gh").alias("min_hash"),
            F.max("gh").alias("max_hash"),
            F.countDistinct("gh").alias("n_grams"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# X7: text normalization — the first stage of every pretraining pipeline
# (case-fold, trim, whitespace collapse), pure JVM expressions with an
# exact oracle (the regex class is spelled byte-for-byte so Java regex and
# DuckDB RE2 agree).
# ---------------------------------------------------------------------------
@query(
    "text_normalize",
    oracle="""
    SELECT doc_id,
           regexp_replace(lower(trim(text)), '[ \t\r\n]+', ' ', 'g')
               AS norm_text,
           CAST(length(text) AS BIGINT) AS n_chars_raw,
           CAST(length(regexp_replace(lower(trim(text)), '[ \t\r\n]+', ' ', 'g'))
                AS BIGINT) AS n_chars_norm,
           regexp_replace(lower(trim(text)), '[ \t\r\n]+', ' ', 'g') <> text
               AS changed
    FROM documents ORDER BY doc_id
    """,
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: case-fold + trim + whitespace collapse, one shuffle-free
    projection. Unicode NFC/NFKC needs an ICU UDF (not in this container)
    — the ASCII-whitespace collapse here is the engine-portable core."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim("text")), "[ \t\r\n]+", " ")
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length("text").cast("long").alias("n_chars_raw"),
        F.length(norm).cast("long").alias("n_chars_norm"),
        (norm != F.col("text")).alias("changed"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# X7/pipeline composition: token-budget corpus cap — keep the
# highest-quality documents until a token budget is exhausted (the final
# "fill the training mix" step after dedup + quality filtering).
# ---------------------------------------------------------------------------
TOKEN_BUDGET = 5_000


@query(
    "corpus_token_budget",
    oracle=f"""
    WITH {QUALITY_CTE},
    ordered AS (
        SELECT doc_id, n_tokens, quality,
               CAST(SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        FROM quality
    )
    SELECT doc_id, n_tokens, quality, cum_tokens
    FROM ordered WHERE cum_tokens <= {TOKEN_BUDGET}
    ORDER BY quality DESC, doc_id
    """,
)
def q_corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget cap: documents in (quality DESC, doc_id) order until the
    cumulative token count exceeds TOKEN_BUDGET. The running sum is cast
    to BIGINT in the oracle (DuckDB windows SUM(int) as HUGEINT — the
    user_sessions lesson). The global-order window is fine here because
    the per-doc metric relation is small; a 100 TB corpus would replace
    the exact cutoff with a quality-quantile threshold (two aggregation
    passes, no global sort) — same selection semantics, approximate
    boundary."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.orderBy(F.col("quality").desc(), "doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        quality_metrics(docs)
        .select(
            "doc_id",
            "n_tokens",
            "quality",
            F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET)
        .orderBy(F.col("quality").desc(), "doc_id")
    )


# ---------------------------------------------------------------------------
# The 100 TB form of the token-budget cap (NOTES r3 §6): instead of a
# GLOBAL running sum over every document (one total-order window — the
# one thing that cannot scale), aggregate tokens per quality level,
# cumulate over the LEVELS (a parameter-sized relation: quality is a
# 6dp-rounded score with a handful of distinct values; a real pipeline
# buckets a continuous score the same way), and keep whole levels while
# the cumulative total fits. Two aggregation passes + a broadcast
# semi-join — no global sort of the corpus, same selection semantics at
# whole-level granularity (the boundary level is excluded, documented).
# ---------------------------------------------------------------------------
QUANTILE_BUDGET = 27_000


@query(
    "corpus_budget_quantile",
    oracle=f"""
    WITH {QUALITY_CTE},
    leveled AS (
        SELECT doc_id, n_tokens, quality,
               CAST(ROUND(quality * 1000, 0) AS BIGINT) AS qb
        FROM quality
    ),
    levels AS (
        SELECT qb, CAST(SUM(n_tokens) AS BIGINT) AS level_tokens
        FROM leveled GROUP BY qb
    ),
    kept AS (
        SELECT qb FROM (
            SELECT qb, CAST(SUM(level_tokens) OVER (ORDER BY qb DESC
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM levels
        ) WHERE cum <= {QUANTILE_BUDGET}
    )
    SELECT l.doc_id, l.n_tokens, l.quality
    FROM leveled l JOIN kept USING (qb)
    ORDER BY l.quality DESC, l.doc_id
    """,
)
def q_corpus_budget_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-threshold token-budget cap, scale path: per-level token
    sums (one shuffle over data), cumulative over the tiny level relation
    (window over ≤ #levels rows — parameter-sized, not data-sized),
    broadcast semi-join back. Selects whole quality levels while the
    running total fits QUANTILE_BUDGET; `corpus_token_budget` is the
    exact-boundary twin this replaces at 100 TB."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    leveled = quality_metrics(docs).select(
        "doc_id",
        "n_tokens",
        "quality",
        F.round(F.col("quality") * 1000, 0).cast("long").alias("qb"),
    )
    levels = leveled.groupBy("qb").agg(
        F.sum("n_tokens").cast("long").alias("level_tokens")
    )
    w = Window.orderBy(F.col("qb").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    kept = (
        levels.withColumn("cum", F.sum("level_tokens").over(w).cast("long"))
        .filter(F.col("cum") <= QUANTILE_BUDGET)
        .select("qb")
    )
    return (
        leveled.join(F.broadcast(kept), "qb")
        .select("doc_id", "n_tokens", "quality")
        .orderBy(F.col("quality").desc(), "doc_id")
    )


@query(
    "repetition_metrics",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    ), bg AS (
        SELECT doc_id, t,
               list_transform(generate_series(1, len(t) - 1),
                              i -> t[i] || ' ' || t[i + 1]) AS b
        FROM toks WHERE len(t) >= 2
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           ROUND(1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6)
               AS dup_token_frac,
           ROUND(CAST(list_max(list_transform(list_distinct(t),
                     x -> len(list_filter(t, y -> y = x)))) AS DOUBLE)
                 / len(t), 6) AS top_token_frac,
           ROUND(CAST(list_max(list_transform(list_distinct(b),
                     x -> len(list_filter(b, y -> y = x)))) AS DOUBLE)
                 / len(b), 6) AS top_bigram_frac
    FROM bg
    ORDER BY doc_id
    """,
)
def q_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021, §A1.1):
    duplicate-token fraction, most-frequent-token fraction, and
    most-frequent-bigram fraction — the standard "is this document
    degenerate boilerplate" filters an LLM corpus pipeline applies
    before training. (The paper's duplicate-LINE fractions collapse to
    these on this single-line synthetic corpus; the operator shape —
    n-gram construction + mode frequency, all array lambdas — is
    identical for any n.)

    Pure per-row JVM higher-order functions: zero shuffle, zero Python.
    Mode counting is O(distinct × n) per document — bounded by document
    length, embarrassingly parallel, the right trade at 100 TB versus
    an explode + per-doc groupBy (which would shuffle the whole token
    stream)."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("t")
    d = (
        docs.select("doc_id", _tokens(F.col("text")).alias("t"))
        .filter(F.size("t") >= 2)
        .withColumn(
            "b",
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
            ),
        )
    )

    def mode_count(arr):
        return F.array_max(
            F.transform(
                F.array_distinct(arr),
                lambda x: F.size(F.filter(arr, lambda y: y == x)),
            )
        )

    return d.select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(t)).cast("double") / F.size(t), 6
        ).alias("dup_token_frac"),
        F.round(mode_count(t).cast("double") / F.size(t), 6).alias(
            "top_token_frac"
        ),
        F.round(mode_count(F.col("b")).cast("double") / F.size("b"), 6).alias(
            "top_bigram_frac"
        ),
    ).orderBy("doc_id")


#: stand-in sensitive-term pattern — the synthetic corpus carries no real
#: PII, so the scrub targets two corpus words; a production deployment
#: swaps in email/phone/SSN regexes (same operator shape: alternation of
#: word-bounded patterns, global replace + match count). Kept to RE2-safe
#: syntax (no backrefs/lookaround) so Spark (Java regex) and DuckDB (RE2)
#: agree.
SCRUB_PATTERN = r"\b(spark|customer)\b"


@query(
    "text_scrub",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{SCRUB_PATTERN}'))
               AS BIGINT) AS n_redacted,
           regexp_replace(text, '{SCRUB_PATTERN}', '<REDACTED>', 'g')
               AS scrubbed
    FROM documents
    WHERE regexp_matches(text, '{SCRUB_PATTERN}')
    ORDER BY doc_id
    """,
)
def q_text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/sensitive-term redaction: global regex replace with a match
    count per document, keeping only touched documents — the scrub +
    audit-trail shape every training-data pipeline runs (how many
    redactions, which docs). Patterns constrained to the RE2 ∩ Java
    common subset so the oracle is exact.

    Per-row regex in the JVM (no Python): map-only, no shuffle; scales
    linearly and pushes the `regexp_matches` filter into the scan."""
    docs = load_table(spark, sf_dir, "documents")
    pat = SCRUB_PATTERN
    return (
        docs.filter(F.col("text").rlike(pat))
        .select(
            "doc_id",
            F.regexp_count(F.col("text"), F.lit(pat)).cast("long").alias(
                "n_redacted"
            ),
            F.regexp_replace("text", pat, "<REDACTED>").alias("scrubbed"),
        )
        .orderBy("doc_id")
    )


@query(
    "unigram_logprob",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lower(unnest(regexp_split_to_array(trim(text), '\\s+')))
               AS term
        FROM documents
    ), cnt AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY term
    ), tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cnt),
    perdoc AS (
        SELECT k.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(ROUND(log2(c.c), 6) AS DECIMAL(18,6))) AS slog
        FROM toks k JOIN cnt c USING (term)
        GROUP BY k.doc_id
    )
    SELECT p.doc_id, p.n,
           ROUND(log2(tot.t) - CAST(p.slog AS DOUBLE) / p.n, 6)
               AS mean_nll
    FROM perdoc p CROSS JOIN tot
    ORDER BY p.doc_id
    """,
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model perplexity proxy: per-document mean negative
    log-likelihood under the corpus's own unigram model — the classic
    "how surprising is this document" quality signal (KenLM-style
    filtering with the model degenerated to unigrams; rare-word salads
    score high, boilerplate scores low). mean_nll = log2(T) −
    Σlog2(C(w))/n, so only integer-argument log2 appears (bit-identical
    cross-engine — see `type_entropy`), with each Σ term 6dp-DECIMAL
    quantized for order-free summation.

    Two shuffles: term-count aggregate, then the token→count equi-join
    re-aggregated per doc. The global total T is a broadcast 1-row
    cross join. At 100 TB the count relation is vocabulary-sized —
    orders smaller than the token stream — and the join hashes on term
    with map-side combine on both aggregates."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.transform(_tokens(F.col("text")), F.lower)).alias("term"),
    )
    cnt = toks.groupBy("term").agg(F.count("*").cast("long").alias("c"))
    tot = cnt.agg(F.sum("c").cast("long").alias("t"))
    perdoc = (
        toks.join(cnt, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.log2("c"), 6).cast("decimal(18,6)")).alias("slog"),
        )
    )
    return (
        perdoc.crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n",
            F.round(
                F.log2("t") - F.col("slog").cast("double") / F.col("n"), 6
            ).alias("mean_nll"),
        )
        .orderBy("doc_id")
    )


@query(
    "bigram_surprise",
    oracle="""
    WITH doc AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr
        FROM documents
    ),
    bg AS (
        SELECT doc_id,
               lower(arr[i]) AS w1, lower(arr[i + 1]) AS w2
        FROM (
            SELECT doc_id, arr,
                   unnest(generate_series(1, len(arr) - 1)) AS i
            FROM doc WHERE len(arr) >= 2
        )
    ),
    c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
    occ AS (
        SELECT b.doc_id,
               (log2(c1.c1) - log2(c2.c2)) * 1000000.0 AS t
        FROM bg b
        JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
        JOIN c1 ON c1.w1 = b.w1
    ),
    agg AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               SUM(CAST(FLOOR(t) AS BIGINT)
                   + CASE WHEN t - FLOOR(t) >= 0.5 THEN 1 ELSE 0 END) AS s
        FROM occ GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams,
           CAST((2 * s + n_bigrams) // (2 * n_bigrams) AS DOUBLE)
               / 1000000.0 AS mean_nll
    FROM agg ORDER BY doc_id
    """,
)
def q_bigram_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X71 (r7): per-document mean bigram surprise — the `unigram_logprob`
    quality signal upgraded one Markov order: mean over a doc's adjacent
    word pairs of −log₂ P(w₂|w₁) = log₂ C(w₁·) − log₂ C(w₁w₂), under the
    corpus's own bigram counts. Scrambled or templated text separates far
    harder here than under unigrams (word-salad keeps plausible unigram
    frequencies but improbable transitions), which is why KenLM-style
    corpus filters score with context. Self-scoring means every observed
    bigram has C ≥ 1 — no smoothing needed, and only INTEGER-argument
    log₂ appears (bit-identical cross-engine, the `unigram_logprob`
    discipline).

    NO engine-native ROUND anywhere (the r7 lesson: a mean landed on a
    6dp half boundary at sf0.1 and DuckDB's ``std::round(x*1e6)/1e6``
    disagreed with Spark's BigDecimal HALF_UP by one ulp-at-6dp):
    each per-occurrence surprise is quantized to integer micro-nll by a
    PINNED half-up — ``floor(t) + (t − floor(t) ≥ 0.5)`` with
    t = x·10⁶, every op IEEE-deterministic on bit-identical doubles —
    summed as exact BIGINTs (order-free), and the per-doc mean is the
    exact integer half-up quotient ``(2s + n) div (2n)`` (s, n ≥ 0)
    converted once to double. Deterministic to the last bit in both
    engines at any scale.

    Plan shape: bigrams are built map-side with arrays_zip over two
    array slices — NO per-doc window, no shuffle to form pairs. Then one
    bigram-vocabulary aggregate, one context aggregate (both map-side
    combined), two vocabulary-sized equi-joins back onto the occurrence
    stream, one per-doc aggregate. Docs with < 2 tokens have no bigrams
    and drop out (both engines, by construction)."""
    docs = load_table(spark, sf_dir, "documents")
    bg = (
        docs.select(
            "doc_id", F.transform(_tokens(F.col("text")), F.lower).alias("arr")
        )
        .filter(F.size("arr") >= 2)
        .withColumn("w1s", F.expr("slice(arr, 1, size(arr) - 1)"))
        .withColumn("w2s", F.expr("slice(arr, 2, size(arr) - 1)"))
        .select("doc_id", F.explode(F.arrays_zip("w1s", "w2s")).alias("p"))
        .select(
            "doc_id",
            F.col("p.w1s").alias("w1"),
            F.col("p.w2s").alias("w2"),
        )
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    t = (F.log2("c1") - F.log2("c2")) * F.lit(1000000.0)
    micro = (
        F.floor(t)
        + F.when(t - F.floor(t) >= F.lit(0.5), F.lit(1)).otherwise(F.lit(0))
    ).cast("long")
    return (
        bg.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(micro).alias("s"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (
                F.expr(
                    "CAST((2 * s + n_bigrams) div (2 * n_bigrams) AS DOUBLE)"
                )
                / F.lit(1000000.0)
            ).alias("mean_nll"),
        )
        .orderBy("doc_id")
    )


#: feature-hashing dimensionality (HashingTF equivalent)
HTF_BUCKETS = 64


@query(
    "hashing_tf",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lower(unnest(regexp_split_to_array(trim(text), '\\s+')))
               AS term
        FROM documents
    )
    SELECT doc_id,
           CAST({_ARITH_TOK_SQL.format(tok='term')} % {HTF_BUCKETS}
               AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks
    GROUP BY doc_id, bucket
    ORDER BY doc_id, bucket
    """,
)
def q_hashing_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (HashingTF): terms fold into a fixed 64-bucket
    vocabulary by hash — the vocabulary-free featurization every
    large-scale text classifier uses (no dictionary to build, ship, or
    shuffle). Portable polynomial hash here so the oracle is exact;
    the scale default swaps xxhash64 (same plan, wider hash).

    Plan shape: term frequencies aggregate FIRST (docs×terms, map-side
    combined), the per-character polynomial hash then runs only on the
    DISTINCT terms (vocabulary-sized — orders smaller than the token
    stream) and joins back on term, and the final (doc_id, bucket) sum
    collapses to ≤64 rows per doc. Hash work scales with |vocab|, not
    corpus size — the same reason term dictionaries are built on
    distinct terms."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.transform(_tokens(F.col("text")), F.lower)).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("n"))
    vocab = tf.select("term").distinct().select(
        "term", (arith_token_hash(F.col("term")) % HTF_BUCKETS).alias("bucket")
    )
    return (
        tf.join(vocab, "term")
        .groupBy("doc_id", "bucket")
        .agg(F.sum("n").cast("long").alias("tf"))
        .orderBy("doc_id", "bucket")
    )


#: GPT-2-style pretokenizer, reduced to the RE2 ∩ Java common subset
#: (no lookahead — RE2 has none): word / number / punctuation runs with
#: leading-space absorption, plus whitespace runs.
BPE_PATTERN = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"


@query(
    "bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT)
               AS n_bpe,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_ws,
           ROUND(CAST(len(regexp_extract_all(text, '{BPE_PATTERN}'))
                      AS DOUBLE)
                 / len(regexp_split_to_array(trim(text), '\\s+')), 6)
               AS bpe_per_word
    FROM documents WHERE length(trim(text)) > 0
    ORDER BY doc_id
    """,
)
def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting under a BPE-ish pretokenizer (the GPT-2 regex
    family, reduced to the RE2∩Java-safe subset) alongside the
    whitespace count — the tokens-per-word ratio is the standard
    "how expensive is this document in model tokens" estimator a
    training-budget pipeline needs before it ever runs a real BPE
    merge table. Map-only per-row regex in the JVM; no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    bpe = F.size(F.expr(f"regexp_extract_all(text, '{BPE_PATTERN}', 0)"))
    ws = F.size(_tokens(F.col("text")))
    return (
        docs.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            bpe.cast("long").alias("n_bpe"),
            ws.cast("long").alias("n_ws"),
            F.round(bpe.cast("double") / ws, 6).alias("bpe_per_word"),
        )
        .orderBy("doc_id")
    )


#: md5-decile split bounds: [0,8) train, 8 val, 9 test
SPLIT_SEED = "s1"


@query(
    "dataset_split",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               CAST(('0x' || substring(md5('{SPLIT_SEED}' || CAST(doc_id
                    AS VARCHAR)), 1, 8)) AS BIGINT) % 10 AS dec
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN dec < 8 THEN 'train'
                WHEN dec = 8 THEN 'val' ELSE 'test' END AS split
    FROM d ORDER BY doc_id
    """,
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by seeded md5
    decile of the doc id — stable under reruns, re-partitioning, AND
    corpus growth (a doc's split never changes when other docs arrive,
    which rand()-based splitting cannot guarantee). The seed string
    versions the split. Map-only; the hex-prefix→int decile is the
    engine-portable uniform hash (md5 matches byte-for-byte)."""
    docs = load_table(spark, sf_dir, "documents")
    dec = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(SPLIT_SEED), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 10
    )
    return (
        docs.select(
            "doc_id",
            F.when(dec < 8, "train")
            .when(dec == 8, "val")
            .otherwise("test")
            .alias("split"),
        )
        .orderBy("doc_id")
    )


#: context-window capacity (tokens) for sequence packing
PACK_CAPACITY = 512

#: documents per packing shard: the global running sum decomposes into
#: per-shard cumsums (parallel) + a prefix-offset relation of one row per
#: shard. Shard count = id-range / span, so size the span to keep the
#: prefix relation at cluster-parallelism scale (thousands of rows): at
#: 100 TB derive it as ~(max_doc_id − min_doc_id) / 10_000 from the scan
#: statistics. The small test constant just exercises multiple shards at
#: sf0.01 (500 docs → 4 shards); results are span-invariant (exact BIGINT
#: sums regroup associatively).
PACK_SHARD_SPAN = 128


def _shard_cumsum(toks: DataFrame) -> DataFrame:
    """Shard-decomposed exact running sum of `n_tokens` in doc_id order
    (the r4-verdict scale fix, shared by `sequence_packing` and
    `pps_sample` — review r7 deduplicated the two verbatim copies):
    shard by floor(doc_id / PACK_SHARD_SPAN) (order-preserving: global
    doc_id order == (shard, doc_id) order), cumsum WITHIN each shard in
    parallel, then offset every shard by the sum of all earlier shards
    via a broadcast prefix relation — the only unpartitioned window
    runs over the shard relation, never the document stream. Exact
    BIGINT sums regroup associatively, so `cum` (the inclusive running
    total ending at each doc) is bit-identical to a single-window
    form."""
    from pyspark.sql.window import Window

    sharded = toks.withColumn(
        "shard", F.floor(F.col("doc_id") / PACK_SHARD_SPAN).cast("long")
    )
    inner_w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    inner = sharded.withColumn(
        "inner_end", F.sum("n_tokens").over(inner_w).cast("long")
    )
    totals = sharded.groupBy("shard").agg(
        F.sum("n_tokens").cast("long").alias("shard_total")
    )
    prefix_w = Window.orderBy("shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = totals.select(
        "shard",
        F.coalesce(F.sum("shard_total").over(prefix_w), F.lit(0))
        .cast("long")
        .alias("shard_prefix"),
    )
    return inner.join(F.broadcast(prefix), "shard").withColumn(
        "cum", (F.col("shard_prefix") + F.col("inner_end")).cast("long")
    )


@query(
    "sequence_packing",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents WHERE length(trim(text)) > 0
    ), cum AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum_end
        FROM toks
    )
    SELECT doc_id, n_tokens,
           CAST((cum_end - n_tokens) // {PACK_CAPACITY} AS BIGINT) AS bin,
           CAST((cum_end - n_tokens) % {PACK_CAPACITY} AS BIGINT)
               AS offset_in_bin
    FROM cum
    ORDER BY doc_id
    """,
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing assignment: documents laid end-to-end in
    deterministic doc_id order, each assigned to the PACK_CAPACITY-token
    bin its START offset falls in — the streaming-friendly packing an
    LLM data loader uses (a doc straddling a boundary stays with its
    start bin; bins overflow by < max_doc_len, absorbed by truncation
    downstream — exact first-fit packing is inherently sequential and
    buys little). Integer floor-div/mod are portable.

    Scale shape (the r4-verdict fix): the global running sum is
    DECOMPOSED — shard by ``floor(doc_id / PACK_SHARD_SPAN)`` (order-
    preserving: global doc_id order == (shard, doc_id) order), cumsum
    WITHIN each shard in parallel, then offset every shard by the sum of
    all earlier shards via a broadcast prefix relation (one row per
    shard — the only single-partition window runs over THAT, never over
    the document stream). Exact BIGINT sums regroup associatively, so
    the bins are bit-identical to the single-window form
    (`corpus_budget_quantile` is the same pattern for the budget cap)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.filter(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    start = F.col("cum") - F.col("n_tokens")
    return (
        _shard_cumsum(toks)
        .select(
            "doc_id",
            "n_tokens",
            F.floor(start / PACK_CAPACITY).cast("long").alias("bin"),
            (start % PACK_CAPACITY).cast("long").alias("offset_in_bin"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# r6: corpus-mix allocation — the data-mixing primitive of training-corpus
# assembly: apportion a fixed token budget across (lang, source) strata
# PROPORTIONALLY to their token mass, with largest-remainder (Hamilton)
# rounding so the integer allocations sum EXACTLY to the budget. All
# integer arithmetic (BUDGET·g // total and the modulo remainder), so the
# two engines agree bit-for-bit; the stratum relation is parameter-sized
# (langs × sources), so every window below runs over a handful of rows —
# the only data-sized stage is the per-stratum token-count aggregate.
# ---------------------------------------------------------------------------
MIX_BUDGET = 1_000_000

@query(
    "corpus_mix_allocation",
    oracle=f"""
    WITH grp AS (
        SELECT lang, source,
               CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+')))
                   AS BIGINT) AS g_tokens
        FROM documents GROUP BY lang, source
    ),
    tot AS (SELECT CAST(SUM(g_tokens) AS BIGINT) AS t FROM grp),
    base AS (
        SELECT lang, source, g_tokens,
               CAST({MIX_BUDGET} * g_tokens // t AS BIGINT) AS base_alloc,
               CAST({MIX_BUDGET} * g_tokens % t AS BIGINT) AS rem
        FROM grp CROSS JOIN tot
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (ORDER BY rem DESC, lang, source) AS rr,
               {MIX_BUDGET} - SUM(base_alloc) OVER () AS leftover
        FROM base
    )
    SELECT lang, source, g_tokens, base_alloc,
           CAST(CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)
               AS extra,
           CAST(base_alloc
                + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)
               AS alloc
    FROM ranked ORDER BY lang, source
    """,
)
def q_corpus_mix_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder apportionment of MIX_BUDGET tokens across
    (lang, source) strata: base = floor(budget·g/total) per stratum,
    then the leftover budget goes +1 each to the strata with the
    largest integer remainders (ties by stratum key). Exact integer
    quotient/modulo on BIGINTs — bit-identical cross-engine (token
    masses are non-negative, so DuckDB's truncating `//` and Spark's
    FLOOR agree — the r5 variant-decade divergence cannot arm here),
    and Σ alloc == budget by construction (unit-asserted).

    Scale: the token mass aggregate is the only data-sized stage (one
    shuffle, map-side combined); the apportionment windows run over the
    langs × sources stratum relation — parameter-sized, the documented
    unpartitioned-window exemption."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    grp = (
        docs.select("lang", "source", F.size(_tokens(F.col("text"))).alias("n"))
        .groupBy("lang", "source")
        .agg(F.sum("n").cast("long").alias("g_tokens"))
    )
    tot = grp.agg(F.sum("g_tokens").cast("long").alias("t"))
    base = grp.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "g_tokens",
        # Exact BIGINT quotient via `div` — long `/` in Spark is IEEE
        # DOUBLE division, so floor(double) can come out one low once
        # budget·g_tokens exceeds 2^53 (total corpus ≥ ~9e9 tokens at
        # this budget). `div` keeps quotient and the `%` remainder
        # below from the SAME exact integer operation, matching the
        # DuckDB oracle's `//` at all magnitudes (ADVICE r6; the X45
        # divergence class — masses are non-negative so trunc == floor).
        F.expr(f"(CAST({MIX_BUDGET} AS BIGINT) * g_tokens) div t")
        .cast("long")
        .alias("base_alloc"),
        ((F.lit(MIX_BUDGET) * F.col("g_tokens")) % F.col("t"))
        .cast("long")
        .alias("rem"),
    )
    w_rank = Window.orderBy(F.col("rem").desc(), "lang", "source")
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = base.select(
        "lang",
        "source",
        "g_tokens",
        "base_alloc",
        F.row_number().over(w_rank).alias("rr"),
        (F.lit(MIX_BUDGET) - F.sum("base_alloc").over(w_all)).alias(
            "leftover"
        ),
    )
    extra = F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
    return ranked.select(
        "lang",
        "source",
        "g_tokens",
        "base_alloc",
        extra.cast("long").alias("extra"),
        (F.col("base_alloc") + extra).cast("long").alias("alloc"),
    ).orderBy("lang", "source")


# ---------------------------------------------------------------------------
# r7: benchmark decontamination — the n-gram overlap screen every serious
# training pipeline runs before training (the GPT-3 appendix-C / PaLM
# 13-gram protocol, word-5-grams here to suit the synthetic corpus).
# Scale shape: the benchmark side collapses to a DISTINCT gram SET before
# the probe, so the overlap check is a LEFT SEMI join against that set —
# output ≤ 1 row per candidate gram, so no (bench-doc × cand-doc) blowup
# and no quadratic fan-out on a hot gram (the wedge-join hub class can't
# arm). At production scale the gram string would be xxhash64-reduced
# before the shuffle exactly like `hashed_shingles` (`dedup.py:182`);
# the string form is kept here for the cross-engine oracle.
# ---------------------------------------------------------------------------
CONTAM_K = 5           # words per gram
CONTAM_BENCH_MOD = 37  # doc_id % MOD == 0 → held-out "benchmark" doc
CONTAM_FRAC = 0.5      # flagged when ≥ this fraction of grams overlap


@query(
    "contamination_ngram",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    ),
    g AS (
        SELECT DISTINCT doc_id,
               array_to_string(t[i : i + {CONTAM_K} - 1], ' ') AS gram
        FROM toks, UNNEST(range(1, len(t) - {CONTAM_K} + 2)) AS u(i)
        WHERE len(t) >= {CONTAM_K}
    ),
    bench AS (
        SELECT DISTINCT gram FROM g WHERE doc_id % {CONTAM_BENCH_MOD} = 0
    ),
    cand AS (SELECT * FROM g WHERE doc_id % {CONTAM_BENCH_MOD} <> 0),
    tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM cand GROUP BY doc_id),
    sh AS (
        SELECT c.doc_id, COUNT(*) AS n_shared
        FROM cand c JOIN bench b USING (gram)
        GROUP BY c.doc_id
    )
    SELECT t.doc_id,
           CAST(t.n_grams AS BIGINT) AS n_grams,
           CAST(COALESCE(s.n_shared, 0) AS BIGINT) AS n_shared,
           ROUND(CAST(COALESCE(s.n_shared, 0) AS DOUBLE) / t.n_grams, 6)
               AS contam_frac,
           CAST(CASE WHEN CAST(COALESCE(s.n_shared, 0) AS DOUBLE)
                          / t.n_grams >= {CONTAM_FRAC}
                THEN 1 ELSE 0 END AS BIGINT) AS flagged
    FROM tot t LEFT JOIN sh s USING (doc_id)
    ORDER BY t.doc_id
    """,
)
def q_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: every CONTAM_BENCH_MOD-th doc is
    the held-out benchmark set; each remaining candidate doc reports how
    many of its distinct word-{CONTAM_K}-grams appear ANYWHERE in the
    benchmark gram set, and is flagged at ≥ {CONTAM_FRAC} overlap. The
    flag comparison runs on the same double division in both engines
    (identical int operands → identical double → identical compare)."""
    from .dedup import shingles

    docs = load_table(spark, sf_dir, "documents")
    # the gram space IS the dedup module's word-k-gram shingle space
    # (review r7: one tokenize/slice/explode/distinct pipeline, not two
    # that could silently diverge)
    grams = shingles(docs, k=CONTAM_K).withColumnRenamed("shingle", "gram")
    bench = (
        grams.filter(F.col("doc_id") % CONTAM_BENCH_MOD == 0)
        .select("gram")
        .distinct()
    )
    cand = grams.filter(F.col("doc_id") % CONTAM_BENCH_MOD != 0)
    tot = cand.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    shared = (
        cand.join(bench, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    ns = F.coalesce("n_shared", F.lit(0))
    frac = ns.cast("double") / F.col("n_grams")
    return (
        tot.join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            ns.cast("long").alias("n_shared"),
            F.round(frac, 6).alias("contam_frac"),
            (frac >= CONTAM_FRAC).cast("long").alias("flagged"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# r7: systematic PPS sampling — pick ~PPS_TARGET documents with inclusion
# probability proportional to token mass (the corpus-subsampling primitive:
# big documents must not be under-represented by uniform row sampling, and
# weighted reservoir tricks need transcendental priorities that no
# cross-engine hash survives). Pure BIGINT arithmetic: a doc is picked iff
# its token span crosses a stride boundary of the cumulative token line —
# the `stream_value_milestones` crossing trick applied to sampling.
# Scale: the cumulative sum is shard-decomposed exactly like
# `sequence_packing` (per-shard cumsum in parallel + broadcast prefix
# offsets); the only unpartitioned window runs over the shard relation.
# ---------------------------------------------------------------------------
PPS_TARGET = 100


@query(
    "pps_sample",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents WHERE len(trim(text)) > 0
    ),
    tot AS (
        SELECT GREATEST(1, CAST(SUM(n_tokens) AS BIGINT) // {PPS_TARGET})
            AS stride
        FROM toks
    ),
    seq AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM toks
    )
    SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum_tokens,
           CAST(cum // stride AS BIGINT) AS pick_bucket
    FROM seq CROSS JOIN tot
    WHERE cum // stride > (cum - n_tokens) // stride
    ORDER BY doc_id
    """,
)
def q_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size systematic sample: lay documents
    end-to-end on the cumulative token line (deterministic doc_id order),
    stride = max(1, total_tokens div {PPS_TARGET}); a doc is picked iff
    it crosses a stride boundary — P(pick) ≈ n_tokens/stride, every
    stride-sized span yields exactly one pick (docs longer than the
    stride are picked once, so the sample size is ≈, not ==, the
    target). All quotients are exact BIGINT `div` on non-negative values
    (truncation == floor; the X45/corpus-mix discipline)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.filter(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    stride = toks.agg(
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"CAST(sum(n_tokens) AS BIGINT) div {PPS_TARGET}"),
        ).alias("stride")
    )
    return (
        _shard_cumsum(toks)
        .join(F.broadcast(stride))
        .filter(
            F.expr("cum div stride") > F.expr("(cum - n_tokens) div stride")
        )
        .select(
            "doc_id",
            "n_tokens",
            F.col("cum").alias("cum_tokens"),
            F.expr("cum div stride").cast("long").alias("pick_bucket"),
        )
        .orderBy("doc_id")
    )


#: DSIR target domain: importance weights select raw data resembling
#: the English slice (Xie et al. 2023, "Data Selection for Language
#: Models via Importance Resampling" — public).
DSIR_TARGET_LANG = "en"

_DSIR_SQL = f"""
    WITH toks AS (
        SELECT doc_id, lower(unnest(regexp_split_to_array(trim(text), '\\s+')))
               AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS n
        FROM toks GROUP BY doc_id, term
    ),
    vb AS (
        SELECT term, CAST({_ARITH_TOK_SQL.format(tok='term')} % {HTF_BUCKETS}
            AS BIGINT) AS bucket
        FROM (SELECT DISTINCT term FROM tf)
    ),
    db AS (
        SELECT tf.doc_id, vb.bucket, CAST(SUM(tf.n) AS BIGINT) AS n
        FROM tf JOIN vb USING (term) GROUP BY tf.doc_id, vb.bucket
    ),
    raw AS (SELECT bucket, CAST(SUM(n) AS BIGINT) AS cr FROM db GROUP BY bucket),
    tgt AS (
        SELECT db.bucket, CAST(SUM(db.n) AS BIGINT) AS ct
        FROM db JOIN documents d ON d.doc_id = db.doc_id
        WHERE d.lang = '{DSIR_TARGET_LANG}'
        GROUP BY db.bucket
    ),
    ratio AS (
        SELECT r.bucket, r.cr, COALESCE(t.ct, 0) AS ct,
               CAST(ROUND(LOG2(COALESCE(t.ct, 0) + 1), 6) AS DECIMAL(18,6))
               - CAST(ROUND(LOG2(r.cr + 1), 6) AS DECIMAL(18,6)) AS lr
        FROM raw r LEFT JOIN tgt t USING (bucket)
    ),
    tot AS (
        SELECT CAST(SUM(cr) AS BIGINT) AS tr, CAST(SUM(ct) AS BIGINT) AS tt
        FROM ratio
    ),
    perdoc AS (
        SELECT db.doc_id, CAST(SUM(db.n) AS BIGINT) AS n_toks,
               SUM(CAST(db.n * ratio.lr AS DECIMAL(28,6))) AS s
        FROM db JOIN ratio USING (bucket)
        GROUP BY db.doc_id
    )
    SELECT p.doc_id, p.n_toks,
           ROUND(CAST(p.s AS DOUBLE)
                 + p.n_toks * (ROUND(LOG2(tr + {HTF_BUCKETS}), 6)
                               - ROUND(LOG2(tt + {HTF_BUCKETS}), 6)),
                 6) AS log_weight
    FROM perdoc p CROSS JOIN tot
    ORDER BY p.doc_id
    """


@query("dsir_importance", oracle=_DSIR_SQL)
def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (X76, r7): per-document
    log importance weight log(p_target(d)/p_raw(d)) under hashed
    unigram bag-of-words models with add-one smoothing — the standard
    importance-resampling data-selection signal (Xie et al. 2023,
    public): score raw web data by how much it resembles a target
    domain (here the '{DSIR_TARGET_LANG}' slice), then sample
    proportionally. Pairs with `pps_sample`/`sample_stratified` as the
    selection stage of the corpus pipeline.

    Exactness: every probability is (count+1)/(total+B), so each log
    term is an INTEGER-argument log2 (bit-identical cross-engine, the
    `unigram_logprob` discipline), 6dp-quantized to DECIMAL for the
    order-free per-doc sum; the doc-length term n_d·(log2(Tr+B) −
    log2(Tt+B)) is a pinned scalar chain on the broadcast 1-row
    totals.

    Scale: the per-char hash runs on DISTINCT terms (vocabulary-sized);
    bucket models are {HTF_BUCKETS} rows (broadcast); the only
    data-sized stages are the tf aggregate and the per-doc sum —
    two user-keyed shuffles with map-side combine, no Python. The
    compact (doc, bucket) relation is localCheckpoint-ed so its THREE
    consumers (raw model, target model, per-doc scorer) read the
    materialized partitions instead of each re-running the token
    explosion + tf aggregate (measured: 24 parquet scans / 20 explode
    nodes in the static plan collapse to 4 / 0)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.transform(_tokens(F.col("text")), F.lower)).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("n")
    )
    vb = tf.select("term").distinct().select(
        "term",
        (arith_token_hash(F.col("term")) % HTF_BUCKETS).alias("bucket"),
    )
    db = (
        tf.join(vb, "term")
        .groupBy("doc_id", "bucket")
        .agg(F.sum("n").cast("long").alias("n"))
        .localCheckpoint()
    )
    raw = db.groupBy("bucket").agg(F.sum("n").cast("long").alias("cr"))
    tgt = (
        db.join(
            docs.filter(F.col("lang") == DSIR_TARGET_LANG).select("doc_id"),
            "doc_id",
        )
        .groupBy("bucket")
        .agg(F.sum("n").cast("long").alias("ct"))
    )
    ratio = (
        raw.join(tgt, "bucket", "left")
        .select(
            "bucket",
            "cr",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            (
                F.round(F.log2(F.coalesce("ct", F.lit(0)) + 1), 6).cast(
                    "decimal(18,6)"
                )
                - F.round(F.log2(F.col("cr") + 1), 6).cast("decimal(18,6)")
            ).alias("lr"),
        )
    )
    tot = ratio.agg(
        F.sum("cr").cast("long").alias("tr"),
        F.sum("ct").cast("long").alias("tt"),
    )
    perdoc = (
        db.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_toks"),
            F.sum(
                (F.col("n") * F.col("lr")).cast("decimal(28,6)")
            ).alias("s"),
        )
    )
    k_term = F.round(F.log2(F.col("tr") + HTF_BUCKETS), 6) - F.round(
        F.log2(F.col("tt") + HTF_BUCKETS), 6
    )
    return (
        perdoc.crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n_toks",
            F.round(
                F.col("s").cast("double") + F.col("n_toks") * k_term, 6
            ).alias("log_weight"),
        )
        .orderBy("doc_id")
    )


#: repeated-passage gram width (word n-grams; Lee et al. 2022's exact
#: substring dedup uses 50-token spans — 5 here so the testdata's short
#: docs exercise the merge logic)
PASSAGE_GRAM = 5


def _passage_gram_sql() -> str:
    parts = " || ' ' || ".join(
        f"lower(arr[i + {k}])" for k in range(PASSAGE_GRAM)
    )
    return f"""
    WITH doc AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr
        FROM documents
    ),
    g AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos, {parts} AS gram
        FROM (
            SELECT doc_id, arr,
                   unnest(generate_series(1, len(arr) - {PASSAGE_GRAM - 1}))
                       AS i
            FROM doc WHERE len(arr) >= {PASSAGE_GRAM}
        )
    ),
    rep AS (
        SELECT gram FROM (
            SELECT gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gram
        ) WHERE df >= 2
    ),
    dup AS (SELECT g.doc_id, g.pos FROM g JOIN rep USING (gram)),
    lagged AS (
        SELECT doc_id, pos,
               LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM dup
    ),
    isl AS (
        SELECT doc_id, pos,
               SUM(CASE WHEN prev IS NULL OR pos - prev > {PASSAGE_GRAM}
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS island
        FROM lagged
    )
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS start_pos,
           CAST(MAX(pos) + {PASSAGE_GRAM - 1} AS BIGINT) AS end_pos,
           CAST(MAX(pos) + {PASSAGE_GRAM} - MIN(pos) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_dup_grams
    FROM isl GROUP BY doc_id, island
    ORDER BY doc_id, start_pos
    """


@query("repeated_passages", oracle=_passage_gram_sql())
def q_repeated_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-passage extraction (X77, r7): the
    within-corpus half of exact substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" —
    public): mark every word-{PASSAGE_GRAM}-gram that occurs in >= 2
    distinct documents, then merge each doc's duplicated gram starts
    into maximal contiguous passages (gaps-and-islands with gap =
    {PASSAGE_GRAM}, so overlapping AND back-to-back covered spans
    fuse). Output: (doc, token span, length, dup-gram count) — the
    actionable span list a passage-level deduper cuts, where doc-level
    MinHash (`near_dup_minhash_lsh`) only says "similar somewhere".

    Scale: no pair join anywhere — the df filter is a grouped
    COUNT(DISTINCT doc) on the gram key (two-level hash agg), the
    dup-position recovery is one equi-join back on gram, and the merge
    is per-doc ordered windows on integer positions. Linear in corpus
    token count; the gram stream's two consumers (df aggregate,
    position-recovery join) each re-derive it from the scan — measured
    at sf0.1: checkpoint-materializing it instead is a wash (2.92 vs
    2.93 s), so the simpler declarative form stands; a boilerplate gram adds join fan-out only at its own
    true multiplicity (every copy IS a real passage row), never
    quadratic pair work. Production swap: xxhash64 the gram string
    before the df aggregate so the shuffle key is 8 bytes (the
    `hashing_tf` discipline); kept as the raw string here for the
    exact oracle."""
    docs = load_table(spark, sf_dir, "documents")
    arr = F.transform(_tokens(F.col("text")), F.lower)
    base = docs.select("doc_id", arr.alias("arr")).filter(
        F.size("arr") >= PASSAGE_GRAM
    )
    gram = F.concat_ws(
        " ",
        *[
            F.element_at("arr", F.col("pos") + k)
            for k in range(PASSAGE_GRAM)
        ],
    )
    g = base.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.size("arr") - (PASSAGE_GRAM - 1))
        ).alias("pos"),
        "arr",
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), gram.alias("gram"))
    rep = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= 2)
        .select("gram")
    )
    dup = g.join(rep, "gram").select("doc_id", "pos")
    wl = Window.partitionBy("doc_id").orderBy("pos")
    wc = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    isl = dup.withColumn("prev", F.lag("pos").over(wl)).withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev").isNull()
                | (F.col("pos") - F.col("prev") > PASSAGE_GRAM),
                1,
            ).otherwise(0)
        ).over(wc),
    )
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("start_pos"),
            (F.max("pos") + (PASSAGE_GRAM - 1)).alias("end_pos"),
            (F.max("pos") + PASSAGE_GRAM - F.min("pos")).alias("n_tokens"),
            F.count("*").cast("long").alias("n_dup_grams"),
        )
        .drop("island")
        .orderBy("doc_id", "start_pos")
    )
