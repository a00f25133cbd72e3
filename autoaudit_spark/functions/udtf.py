"""X4 — a REAL Python UDTF (Spark 3.5+ `@udtf`) on the engine surface.

The reference has no UDF surface at all (SURVEY §2.11); the engine's
production table-generating path is JVM `explode`/`posexplode` over
array expressions (`chunk_documents`, shingles — zero Python). This
module registers ONE genuine Python UDTF so the API tier is covered and
tested: a deterministic word exploder (the posexplode twin) whose
semantics a DuckDB oracle can replicate exactly.

Scale note (why the production path is the explode form): a Python UDTF
evaluates row-at-a-time through the Python worker — fine for low-volume
enrichment, 10-100× slower than vectorized JVM explode in a hot path.
This query exists to pin the API's correctness, not to recommend it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from ..registry import query
from ..sources import load_table

#: split on whitespace runs — spelled identically in Python re and
#: DuckDB regexp_split_to_array
WORD_RE = r"\s+"
UDTF_SCOPE = 100  # doc_id bound: row-at-a-time Python stays bounded


@udtf(returnType="word_idx int, word string")
class SplitWords:
    """Yield (index, word) per non-empty whitespace-separated token."""

    def eval(self, text: str):
        import re

        if text is None:
            return
        for i, s in enumerate(
            s.strip() for s in re.split(WORD_RE, text) if s.strip()
        ):
            yield i, s


@query(
    "udtf_word_explode",
    oracle=f"""
    WITH split AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(text, '{WORD_RE}')) AS raw,
               generate_subscripts(regexp_split_to_array(text, '{WORD_RE}'), 1)
                   AS ord
        FROM documents
        WHERE doc_id < {UDTF_SCOPE}
    ),
    kept AS (
        SELECT doc_id, trim(raw) AS word,
               CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY ord) - 1
                    AS INT) AS word_idx
        FROM split WHERE trim(raw) <> ''
    )
    SELECT doc_id, word_idx, word FROM kept
    ORDER BY doc_id, word_idx
    """,
)
def q_udtf_word_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word explosion through the registered Python UDTF, joined
    lateral-style per document row."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < UDTF_SCOPE)
        .select("doc_id", "text")
    )
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("split_words", SplitWords)
    return spark.sql(
        """
        SELECT d.doc_id, s.word_idx, s.word
        FROM udtf_docs d, LATERAL split_words(d.text) s
        ORDER BY d.doc_id, s.word_idx
        """
    )
