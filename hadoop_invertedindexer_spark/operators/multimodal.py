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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def resize_image(
    binary_df: DataFrame, width: int = 64, height: int = 64, fake: bool = False
) -> DataFrame:
    """Resize step (stubbed like decode — no image libs in container).

    The fake path truncates/pads the payload to width*height bytes, which
    keeps the contract real: output payload size is a function of the
    requested dimensions, batches flow through Arrow, and the schema is
    what a real resizer would produce.
    """

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires PIL/libvips; run with fake=True "
                    "for the plumbing path"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(
                        lambda b: bytes(b[:target]).ljust(target, b"\0")
                    ),
                }
            )

    return binary_df.mapInPandas(work, RESIZED_SCHEMA)


def frame_sample(
    binary_df: DataFrame, every: int = 4, frame_bytes: int = 32, fake: bool = False
) -> DataFrame:
    """Frame sampling for video payloads: emit every ``every``-th fixed-size
    chunk as a frame (fake path chunks the byte stream; a real
    implementation would call the decoder's keyframe iterator). One input
    row fans out to N output rows — the mapInPandas shape that matters."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decode requires ffmpeg; run with fake=True for "
                    "the plumbing path"
                )
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                frames = [
                    b[i : i + frame_bytes]
                    for i in range(0, len(b), frame_bytes)
                ]
                for idx in range(0, len(frames), every):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame"].append(frames[idx])
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(work, FRAMES_SCHEMA)


def feature_extract(binary_df: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction stub: a deterministic byte-histogram 'embedding'
    (a real pipeline would run a vision/audio model here — this keeps the
    output schema array<float> and the Arrow batching identical)."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(b % dim, minlength=dim).astype("float32")
                norm = float(hist.sum()) or 1.0
                feats.append((hist / norm).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return binary_df.mapInPandas(work, FEATURES_SCHEMA)


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
