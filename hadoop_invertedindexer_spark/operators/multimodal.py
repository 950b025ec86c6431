"""Multimodal column handling (EXT, SURVEY §2B).

Images/audio/video are opaque ``binary`` columns plus typed metadata.
The container has no decode libraries (PIL/ffmpeg/torchaudio), so the
engine defines its own self-describing raster container
(``functions/media_codec.py``: SBM1 still images / SVD1 multi-frame
videos, 11-byte header + raw uint8 pixels) and implements the REAL
decode / resize / frame-sample paths against it in pure numpy. A payload
whose magic is not recognized raises ``ValueError`` inside the task, the
way a production decoder rejects a foreign codec. The legacy
``fake=True`` path survives for arbitrary (non-media) payloads so the
plumbing stays testable on any binary column.

``synthesize_media`` renders ``documents.text`` into media payloads with
SQL-expressible geometry, which is what lets the driver oracle-check the
decode/resize/frame-sample output end-to-end (DuckDB recomputes the
expected metadata from ``doc_id`` + ``octet_length(text)``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hadoop_invertedindexer_spark.caching import tracked_persist

from hadoop_invertedindexer_spark.functions import media_codec

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


def synthesize_media(docs: DataFrame) -> DataFrame:
    """documents -> a real binary media table: every doc rendered into an
    SBM1/SVD1 payload (``media_codec.synth_payload``), with media_type and
    n_bytes derived from the payload itself. The encode is a Pandas batch
    over Arrow — the same shape a real transcode step would take."""

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                media_codec.synth_payload(int(i), t)
                for i, t in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": [
                        "image/sbm1" if p[:4] == media_codec.MAGIC_IMAGE
                        else "video/svd1"
                        for p in payloads
                    ],
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    from hadoop_invertedindexer_spark.sources.tables import spread_if_narrow

    # spread a narrow-provenance source (r14): mapInPandas parallelism
    # is the input's partition count — a one-split source runs the whole
    # codec in ONE Python worker
    return spread_if_narrow(docs, "doc_id").select(
        "doc_id", "text"
    ).mapInPandas(encode, schema)


def decode_image_meta(binary_df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode step over the opaque payload via ``mapInPandas``.

    ``fake=False`` (default, the real path) parses the SBM1/SVD1 container
    header and validates the payload length; an unrecognized magic raises
    ``ValueError`` *inside the task*, exactly where a missing/unknown codec
    fails in production. ``fake=True`` derives deterministic
    pseudo-dimensions from arbitrary bytes, exercising the identical Arrow
    batch path, schema, and partition behavior for non-media payloads.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if not fake:
                metas = [
                    media_codec.decode_header(bytes(b))[1:] for b in payloads
                ]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "n_bytes": payloads.map(len),
                        "width": [m[0] for m in metas],
                        "height": [m[1] for m in metas],
                        "n_frames": [m[3] for m in metas],
                    }
                )
                continue
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
    """Resize step. The real path (``fake=False``) decodes the SBM1/SVD1
    container, nearest-neighbor-resizes every frame in numpy
    (``media_codec.resize_nearest``), and re-encodes — output payload size
    is exactly ``header + n_frames*height*width*channels``. The fake path
    truncates/pads arbitrary payloads to width*height bytes, keeping the
    plumbing testable on non-media binaries."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not fake:
                payloads = [
                    media_codec.encode_media(
                        media_codec.resize_nearest(
                            media_codec.decode_media(bytes(b)), width, height
                        )
                    )
                    for b in pdf["payload"]
                ]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "width": width,
                        "height": height,
                        "payload": payloads,
                    }
                )
                continue
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
    """Frame sampling for video payloads: one input row fans out to N
    output rows — the mapInPandas shape that matters. The real path
    (``fake=False``) decodes the SVD1/SBM1 container and emits every
    ``every``-th decoded frame re-encoded as a standalone SBM1 still (what
    a keyframe extractor hands downstream); ``frame_bytes`` only applies
    to the fake path, which chunks arbitrary bytes instead."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if not fake:
                    pixels = media_codec.decode_media(b)
                    for idx in range(0, pixels.shape[0], every):
                        out["doc_id"].append(doc_id)
                        out["frame_idx"].append(idx)
                        out["frame"].append(
                            media_codec.encode_media(pixels[idx : idx + 1])
                        )
                    continue
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


def feature_extract(
    binary_df: DataFrame, dim: int = 16, decode: bool = False
) -> DataFrame:
    """Feature extraction: a deterministic normalized histogram 'embedding'
    (a real pipeline would run a vision/audio model here — this keeps the
    output schema array<float> and the Arrow batching identical). With
    ``decode=True`` the histogram runs over DECODED pixel values of an
    SBM1/SVD1 payload (header excluded) instead of raw container bytes."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if decode:
                    b = media_codec.decode_media(bytes(payload)).ravel()
                else:
                    b = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(b % dim, minlength=dim).astype("float32")
                norm = float(hist.sum()) or 1.0
                feats.append((hist / norm).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return binary_df.mapInPandas(work, FEATURES_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ahash", T.LongType()),
    ]
)


def media_dedup_exact(binary_df: DataFrame) -> DataFrame:
    """Exact media dedup: group by a binary-safe md5 of the raw payload,
    keep the smallest doc_id. Entirely JVM-side over the opaque column —
    no decode — so at 100 TB this is one shuffle of (16-byte digest, id)
    while the payload bytes never leave their scan partitions. Same
    output shape as the text-side :func:`~.dedup.dedup_exact`:
    (keep_id, n_dups)."""
    return (
        binary_df.groupBy(F.md5("payload").alias("h"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .select("keep_id", "n_dups")
    )


def media_ahash(binary_df: DataFrame) -> DataFrame:
    """Perceptual average-hash of frame 0 of each SBM1/SVD1 payload:
    8x8 floor-scaled nearest-neighbor downsample (the same index
    arithmetic as ``media_codec.resize_nearest``), per-sample channel
    SUM as the gray value, then a 64-bit mean-threshold bitmap — bit k
    (row-major, MSB first) is set iff ``64*g_k > sum(g)``. Keeping the
    threshold as an integer cross-multiplication (not a fp mean) makes
    the hash bit-exact across engines, which is what lets the SQL
    oracle recompute it from the codec's text-cycling geometry.

    Decode runs in the real codec path over ``mapInPandas`` (the
    documented Python extension point for media, like decode/resize).
    Output: (doc_id, ahash: bigint signed two's-complement)."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            hashes = []
            for payload in pdf["payload"]:
                f0 = media_codec.decode_media(bytes(payload))[0].astype(np.int64)
                h, w, _ = f0.shape
                rows = (np.arange(8) * h) // 8
                cols = (np.arange(8) * w) // 8
                g = f0[rows[:, None], cols, :].sum(axis=2)  # 8x8 channel sums
                s = int(g.sum())
                bits = (64 * g.ravel() > s).astype(np.uint8)
                fp = int.from_bytes(np.packbits(bits).tobytes(), "big")
                hashes.append(fp - (1 << 64) if fp >= (1 << 63) else fp)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "ahash": hashes})

    return binary_df.mapInPandas(work, AHASH_SCHEMA)


def media_near_dup_pairs(binary_df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Perceptual media near-dup pairs: payloads whose average-hashes are
    within ``max_hamming`` bits — catches re-encodes and small pixel
    edits that defeat the exact payload digest. Candidates via the same
    pigeonhole band join as SimHash (``dedup.hamming_band_pairs``), so
    the pair search is a bounded-fanout equi-join, never all-pairs.
    Output: (id_a, id_b, hamming)."""
    from hadoop_invertedindexer_spark.operators.dedup import hamming_band_pairs

    fps = (
        media_ahash(binary_df)
        .select(F.col("doc_id").alias("id"), F.col("ahash").alias("fp"))
        .transform(tracked_persist)  # both band-join sides; avoids re-decoding payloads
    )
    return hamming_band_pairs(fps, max_hamming)


HIST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("hist", T.ArrayType(T.LongType())),
    ]
)


def pixel_histogram(binary_df: DataFrame, dim: int = 16) -> DataFrame:
    """Integer pixel-value histogram of the decoded payload (all frames,
    header excluded): the exact counting core of :func:`feature_extract`
    WITHOUT the float32 normalization — which is what makes it the
    oracle-checkable twin of ``multimodal_features`` (bin counts are pure
    integers the SQL restatement reproduces from the text-cycling
    geometry; the normalized variant's float32 division has no clean SQL
    equivalent). Output: (doc_id, hist: array<bigint>[dim])."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            hists = []
            for payload in pdf["payload"]:
                b = media_codec.decode_media(bytes(payload)).ravel()
                hists.append(
                    np.bincount(b % dim, minlength=dim).astype("int64").tolist()
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "hist": hists})

    return binary_df.mapInPandas(work, HIST_SCHEMA)


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


# ------------------------------------------------------------- audio

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("energy", T.LongType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def synthesize_audio(docs: DataFrame) -> DataFrame:
    """documents -> a real binary audio table: every doc rendered into an
    SAU1 payload (``media_codec.synth_audio_payload``). Completes the
    image/video/audio modality triple with the same Arrow-batched encode
    shape as ``synthesize_media``."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                media_codec.synth_audio_payload(int(i), t)
                for i, t in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": ["audio/sau1"] * len(payloads),
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    from hadoop_invertedindexer_spark.sources.tables import spread_if_narrow

    # spread a narrow-provenance source (r14): mapInPandas parallelism
    # is the input's partition count — a one-split source runs the whole
    # codec in ONE Python worker
    return spread_if_narrow(docs, "doc_id").select(
        "doc_id", "text"
    ).mapInPandas(encode, schema)


def decode_audio_meta(binary_df: DataFrame) -> DataFrame:
    """REAL audio decode: parse + validate the SAU1 header per payload;
    a foreign magic raises ValueError inside the task, same contract as
    ``decode_image_meta(fake=False)``."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                media_codec.decode_audio_header(bytes(b)) for b in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": [m[0] for m in metas],
                    "channels": [m[1] for m in metas],
                    "n_samples": [m[2] for m in metas],
                    "n_bytes": pdf["payload"].map(len),
                }
            )

    return binary_df.mapInPandas(decode, AUDIO_META_SCHEMA)


def audio_features(binary_df: DataFrame) -> DataFrame:
    """Per-payload signal statistics over the decoded int16 PCM — the
    audio analog of ``feature_extract``: total |amplitude| energy, peak,
    per-channel zero-crossing count (sign flips between consecutive
    samples of the SAME channel), and integer milliseconds of duration.
    All metrics are integer-exact, which is what lets the oracle
    recompute them from the synthesis geometry without decoding.

    Vectorized numpy over Arrow batches; at 100 TB the payload column is
    the I/O bound and this is one linear pass per payload — the same
    cost shape as a real MFCC/VAD pass, minus the DSP library."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for i, b in zip(pdf["doc_id"], pdf["payload"]):
                sr, samples = media_codec.decode_audio(bytes(b))
                s64 = samples.astype(np.int64)
                neg = samples < 0
                rows.append(
                    (
                        int(i),
                        samples.shape[0] * 1000 // sr,
                        int(np.abs(s64).sum()),
                        int(np.abs(s64).max()) if s64.size else 0,
                        int((neg[1:] != neg[:-1]).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "duration_ms", "energy", "peak", "zero_crossings"
                ],
            )

    return binary_df.mapInPandas(work, AUDIO_FEATURES_SCHEMA)
