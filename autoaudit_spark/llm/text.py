"""X7 — text analysis over the `documents` table: token statistics, term
frequencies, quality scoring, n-gram language ID, fingerprinting.

Everything except the fingerprint is pure JVM column expressions with a
byte-identical DuckDB oracle (tokenizer: `split(trim(text), '\\s+')` ↔
`regexp_split_to_array`). The fingerprint uses xxhash64 (engine-specific
→ rows-only)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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


@query(
    "quality_scores",
    oracle="""
    WITH toks AS (
        SELECT doc_id, n_chars, text,
               regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))
                    AS DOUBLE) / length(text) AS punct_ratio,
               CAST(len(list_filter(t, x -> list_contains({stop}, lower(x))))
                    AS DOUBLE) / len(t) AS stop_ratio,
               CAST(length(array_to_string(t, '')) AS DOUBLE) / len(t) AS mean_wlen
        FROM toks WHERE len(t) > 0
    )
    SELECT doc_id, n_tokens, ROUND(punct_ratio, 6) AS punct_ratio,
           ROUND(stop_ratio, 6) AS stop_ratio, ROUND(mean_wlen, 6) AS mean_wlen,
           ROUND(CAST(
               (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 0.4 ELSE 0.0 END)
               + (CASE WHEN stop_ratio BETWEEN 0.05 AND 0.6 THEN 0.3 ELSE 0.0 END)
               + (CASE WHEN mean_wlen BETWEEN 2 AND 12 THEN 0.2 ELSE 0.0 END)
               + (CASE WHEN punct_ratio <= 0.2 THEN 0.1 ELSE 0.0 END)
           AS DOUBLE), 6) AS quality
    FROM m ORDER BY doc_id
    """.format(stop=_STOP_SQL),
)
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: heuristic quality score — length / stopword-ratio / word-length
    / punctuation band checks (the classic pretraining-filter recipe),
    pure arithmetic, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
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
    ).orderBy("doc_id")


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


@query("doc_fingerprint")
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: winnowing-style fingerprint — min/max/count over the doc's
    token-5-gram xxhash64 set (rows-only: hash is engine-specific)."""
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
