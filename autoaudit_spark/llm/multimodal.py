"""X8 — multimodal columns: opaque binary payloads + typed metadata
traveling with text and embeddings in one DataFrame.

Design (BASELINE.json north star): media are `binary` columns with a
struct of typed metadata; decode / feature-extract / resize / frame-
sample run as Arrow-batched `mapInPandas` stages. The image/audio codec
libraries are NOT in this container, so the decode kernel is STUBBED:
`decode_image_real` raises NotImplementedError, and the pipeline runs a
clearly-marked deterministic fake (payload-hash-derived dimensions) so
the Spark-side plumbing — schema, partitioning, UDF signature, batch
shape — is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


def multimodal_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ⋈ embeddings → one row per doc with text, embedding,
    a binary payload (utf-8 of the text — stands in for image bytes),
    and a typed metadata struct."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        docs.join(emb, docs.doc_id == emb.vec_id, "left")
        .select(
            "doc_id",
            "text",
            F.col("embedding"),
            F.encode("text", "utf-8").alias("payload"),
            F.struct(
                F.col("lang").alias("lang"),
                F.col("source").alias("source"),
                F.col("n_chars").alias("n_chars"),
                F.lit("image/fake").alias("mime"),
            ).alias("meta"),
        )
    )


def decode_image_real(payload: bytes) -> tuple[int, int, str]:
    """The real decode kernel (PIL/ffmpeg) — NOT AVAILABLE in this
    container. Wire a codec here on a cluster with the libs installed."""
    raise NotImplementedError(
        "image/audio codecs are not installed in this environment; "
        "the pipeline uses decode_image_fake (deterministic) instead"
    )


def decode_image_fake(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in: dimensions derived from the payload's
    sha1 — stable across runs/engines, exercises the full data path."""
    h = hashlib.sha1(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, "fake"


def extract_media_features(mm: DataFrame, batch_decode=decode_image_fake) -> DataFrame:
    """mapInPandas media feature extraction: decode each payload, emit
    (doc_id, width, height, format, payload_bytes). Arrow batches in and
    out; the decode kernel is per-row CPU work inside the batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, fmt = [], [], []
            for payload in pdf["payload"]:
                a, b, c = batch_decode(bytes(payload))
                w.append(a)
                h.append(b)
                fmt.append(c)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "format": fmt,
                    "payload_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return mm.select("doc_id", "payload").mapInPandas(
        run, "doc_id long, width int, height int, format string, payload_bytes long"
    )


@query(
    "multimodal_assemble",
    oracle="""
    SELECT d.doc_id, d.lang, d.source, d.n_chars,
           CAST(octet_length(encode(d.text)) AS BIGINT) AS payload_bytes,
           CAST(len(e.embedding) AS INTEGER) AS emb_dim
    FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
    ORDER BY d.doc_id
    """,
)
def q_multimodal_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8: the joined multimodal row — metadata + payload size + embedding
    dim (oracle checks the plumbing; raw bytes compared by length since
    blob hashing differs per engine)."""
    mm = multimodal_table(spark, sf_dir)
    return mm.select(
        "doc_id",
        F.col("meta.lang").alias("lang"),
        F.col("meta.source").alias("source"),
        F.col("meta.n_chars").alias("n_chars"),
        F.length("payload").cast("long").alias("payload_bytes"),
        F.size("embedding").alias("emb_dim"),
    ).orderBy("doc_id")


@query("media_features")
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8: mapInPandas decode + feature extraction over the binary
    payload column (deterministic fake decoder — see module docstring).
    Rows-only (hash-derived fakes aren't SQL-expressible)."""
    mm = multimodal_table(spark, sf_dir)
    return extract_media_features(mm).orderBy("doc_id")
