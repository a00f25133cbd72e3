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


def decode_image_fake256(payload: bytes) -> tuple[int, int, str]:
    """sha256 variant of the deterministic stand-in: DuckDB exposes
    sha256(VARCHAR), so a pipeline built on THIS fake gets a full
    value-hash oracle — the mapInPandas decode plumbing is then
    driver-checked end to end, not just unit-tested."""
    h = hashlib.sha256(payload).digest()
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


@query(
    "media_features_hashed",
    oracle="""
    SELECT doc_id,
           CAST(16 + CAST(('0x' || substring(sha256(text), 1, 2)) AS INTEGER)
                     % 240 AS INTEGER) AS width,
           CAST(16 + CAST(('0x' || substring(sha256(text), 3, 2)) AS INTEGER)
                     % 240 AS INTEGER) AS height,
           'fake' AS format,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
    FROM documents ORDER BY doc_id
    """,
)
def q_media_features_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 decode + feature extraction with the sha256 fake kernel — the
    SAME Arrow mapInPandas plumbing as `media_features`, now value-hash
    checked against DuckDB's sha256 (payload = utf-8 of text, so the
    digests agree byte for byte). Swapping `batch_decode` for a real
    codec changes nothing upstream of the kernel."""
    mm = multimodal_table(spark, sf_dir)
    return extract_media_features(mm, batch_decode=decode_image_fake256).orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# X8: frame sampling + resize — the remaining two stages of the
# decode / feature-extract / resize / frame-sample quartet. Both run as
# Arrow-batched mapInPandas (real schema, partitioning, batch shape);
# frame sampling is pure byte arithmetic so it ALSO gets an exact DuckDB
# oracle, while resize sits on the stubbed decode kernel (rows-only).
# ---------------------------------------------------------------------------
FRAME_MAX, FRAME_BYTES_PER, FRAME_PREVIEW = 4, 256, 64


def sample_frames(mm: DataFrame) -> DataFrame:
    """mapInPandas frame sampler: treat the payload as a frame container
    (1 frame per FRAME_BYTES_PER bytes, max FRAME_MAX sampled), emit one
    row per sampled frame with its byte offset, length, and preview
    slice. Evenly-spaced deterministic offsets — the strategy a real
    video sampler uses, with byte slices standing in for decoded frames."""

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                n_frames = min(FRAME_MAX, 1 + n // FRAME_BYTES_PER)
                step = n // n_frames if n_frames else 0
                for f in range(n_frames):
                    off = f * step
                    flen = min(FRAME_PREVIEW, n - off)
                    rows.append(
                        (int(doc_id), f, off, flen, b[off : off + flen])
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "frame_off", "frame_len",
                    "frame_bytes",
                ],
            )

    return mm.select("doc_id", "payload").mapInPandas(
        run,
        "doc_id long, frame_idx int, frame_off long, frame_len long,"
        " frame_bytes binary",
    )


@query(
    "media_frame_sample",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, encode(text) AS payload,
               octet_length(encode(text)) AS n
        FROM documents
    ),
    fr AS (
        SELECT doc_id, payload, n,
               LEAST({FRAME_MAX}, 1 + n // {FRAME_BYTES_PER}) AS n_frames
        FROM p
    ),
    ix AS (
        SELECT doc_id, payload, n, n_frames,
               UNNEST(range(0, n_frames)) AS f
        FROM fr
    )
    SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
           CAST(f * (n // n_frames) AS BIGINT) AS frame_off,
           CAST(LEAST({FRAME_PREVIEW}, n - f * (n // n_frames)) AS BIGINT)
               AS frame_len,
           substring(hex(payload),
                     CAST(f * (n // n_frames) * 2 + 1 AS BIGINT),
                     CAST(LEAST({FRAME_PREVIEW}, n - f * (n // n_frames)) * 2
                          AS BIGINT)) AS frame_hex
    FROM ix ORDER BY doc_id, frame_idx
    """,
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 frame-sample through the REAL Arrow/mapInPandas plumbing, with
    an exact byte-level oracle: offsets, lengths, and the sliced frame
    bytes (hex-encoded — DuckDB cannot slice BLOBs, but hex(blob) is a
    sliceable VARCHAR with identical uppercase form in both engines)."""
    mm = multimodal_table(spark, sf_dir)
    return sample_frames(mm).select(
        "doc_id",
        "frame_idx",
        "frame_off",
        "frame_len",
        F.hex("frame_bytes").alias("frame_hex"),
    ).orderBy("doc_id", "frame_idx")


RESIZE_BOX = 64


def resize_media(mm: DataFrame, batch_decode=decode_image_fake) -> DataFrame:
    """mapInPandas resize: decode (stub kernel), fit the decoded
    dimensions into a RESIZE_BOX square preserving aspect ratio
    (integer arithmetic, floor semantics, min 1px), emit the output
    geometry and RGB byte size. A real deployment swaps `batch_decode`
    for the PIL kernel; everything else is unchanged."""

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _ = batch_decode(bytes(payload))
                scale_num, scale_den = RESIZE_BOX, max(w, h)
                if scale_den <= RESIZE_BOX:
                    ow, oh = w, h
                else:
                    ow = max(1, (w * scale_num) // scale_den)
                    oh = max(1, (h * scale_num) // scale_den)
                rows.append((int(doc_id), w, h, ow, oh, ow * oh * 3))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "out_w", "out_h",
                    "out_bytes",
                ],
            )

    return mm.select("doc_id", "payload").mapInPandas(
        run,
        "doc_id long, width int, height int, out_w int, out_h int,"
        " out_bytes long",
    )


@query("media_resize")
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 resize stage (rows-only: sits on the stubbed decode kernel;
    geometry arithmetic unit-tested)."""
    mm = multimodal_table(spark, sf_dir)
    return resize_media(mm).orderBy("doc_id")
