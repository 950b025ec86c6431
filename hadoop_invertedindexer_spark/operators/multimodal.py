"""Multimodal column handling (EXT, SURVEY §2B).

Images/audio/video are opaque ``binary`` columns plus typed metadata.
The container has no decode libraries (PIL/ffmpeg/torchaudio), so the
decode step is STUBBED — ``decode_image_meta`` raises
``NotImplementedError`` unless given ``fake=True``, which produces a
deterministic fake decode (dimensions derived from the bytes) so the
Spark-side plumbing — schema, Arrow batch shape, ``mapInPandas``
signature, partitioning — is real and tested end-to-end.

The testdata has no binary table, so ``binary_docs`` manufactures one
from ``documents.text`` (utf-8 bytes as the opaque payload) — the
plumbing is payload-agnostic by design.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def binary_docs(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, payload: binary, media_type, n_bytes).
    At 100 TB the payload column dominates I/O: keep it in its own parquet
    column (never in row-group stats), partition by media_type, and prune
    it from every query that only needs metadata — column pruning makes
    metadata-only scans free."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(F.encode("text", "utf-8")).cast("bigint").alias("n_bytes"),
    )


def decode_image_meta(binary_df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode step over the opaque payload via ``mapInPandas``.

    Real decode needs an image library that is not in this container —
    ``fake=False`` raises ``NotImplementedError`` *inside the task* the
    way a missing codec would. ``fake=True`` derives deterministic
    pseudo-dimensions from the payload bytes, exercising the identical
    Arrow batch path, schema, and partition behavior.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL/libvips; not available in this "
                    "container — run with fake=True for the plumbing path"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    "width": payloads.map(lambda b: 16 + (len(b) % 64)),
                    "height": payloads.map(lambda b: 16 + (sum(b[:8]) % 64)),
                    "n_frames": payloads.map(lambda b: 1 + (len(b) % 4)),
                }
            )

    return binary_df.mapInPandas(decode, DECODED_SCHEMA)


def media_metadata_summary(binary_df: DataFrame) -> DataFrame:
    """Metadata-only aggregate over the binary table — must never touch the
    payload column (verify: ReadSchema in .explain excludes it when the
    source is parquet)."""
    return binary_df.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )


def payload_digest(binary_df: DataFrame) -> DataFrame:
    """Integrity digest of the opaque payload (binary-safe md5)."""
    return binary_df.select(
        "doc_id",
        F.md5("payload").alias("digest"),
        F.col("n_bytes"),
    )
