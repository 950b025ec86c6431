"""Sinks.

Reference: ``TextOutputFormat`` with a NullWritable value writes key-only
lines to a single ``part-r-00000`` (single reduce task is the Hadoop
default; ``/root/reference/src/InvertedIndexer.java:260`` + golden
artifact ``output/part-r-00000``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def sink_text(df: DataFrame, path: str, single_file: bool = False, line_col: str | None = None) -> None:
    """Op `sink_text` (SURVEY §2A #18).

    ``single_file=True`` reproduces the reference's one-sorted-file layout
    via ``coalesce(1)`` — a compat flag for golden parity only. At scale
    the engine writes one file per partition (the default): a global sort
    with range partitioning already yields globally ordered part files,
    so readers that need total order concatenate in partition order.
    """
    if line_col is not None:
        df = df.select(line_col)
    if len(df.columns) != 1:
        raise ValueError(f"text sink needs exactly one column, got {df.columns}")
    if single_file:
        df = df.coalesce(1)
    df.write.mode("overwrite").text(path)


def sink_bucketed_table(
    df: DataFrame, name: str, bucket_key: str, n_buckets: int = 8
) -> None:
    """Persist as a bucketed+sorted catalog table.

    Bucketing pre-shuffles the data once at write time: two tables
    bucketed on the same key with the same bucket count join with NO
    exchange on either side (verified in tests/test_plan_quality.py) —
    the amortization that makes repeated big-big joins viable at 100 TB.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key)
        .format("parquet")
        .saveAsTable(name)
    )


def sink_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Engine-native columnar sink; ``partition_by`` enables partition
    pruning for downstream readers."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a fragmented parquet directory into
    ~``target_file_bytes`` files. Streaming ingestion and per-trigger
    micro-batch sinks leave thousands of KB-sized files; at 100 TB the
    resulting task-per-file scheduling and footer-read overhead dominate
    scan time, so periodic compaction is part of the engine's write path.

    File count = ceil(input_bytes / target), measured from the source
    files themselves (no data pass); the rewrite is one repartition —
    a single round-robin shuffle, no skew by construction. Returns the
    number of files written."""
    import math
    import os

    if os.path.abspath(src_path) == os.path.abspath(dst_path):
        raise ValueError(
            "compact_parquet cannot compact in place: overwrite would "
            "delete the source mid-read; write to a new path and swap"
        )
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = p.getFileSystem(conf)
    total = fs.getContentSummary(p).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_path)
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return n_files


def write_dataset_manifest(df: DataFrame, table_dir: str, fmt: str = "parquet") -> dict:
    """Write ``_MANIFEST.json`` next to a dataset: row count, schema, an
    ORDER-INDEPENDENT content checksum, and the storage format. The
    integrity handshake between pipeline stages: a re-read that lost,
    duplicated, or mutated rows fails verification no matter how the
    data was repartitioned.

    Checksum design (see :func:`compute_manifest_stats`): every cell is
    canonicalized to a prefixed string before hashing, so (a) type drift
    from a write/read round trip (partition-column inference turning a
    bigint into an int) does not change the checksum of identical
    values, and (b) NULLs participate — Spark's hash skips null struct
    fields, which would otherwise let a value silently migrate between
    same-typed columns undetected.

    Returns the manifest dict. Written via the Hadoop FS API so it works
    on any supported filesystem.
    """
    import json

    manifest = compute_manifest_stats(df)
    manifest["format"] = fmt
    spark = df.sparkSession
    jvm = spark.sparkContext._jvm
    path = jvm.org.apache.hadoop.fs.Path(f"{table_dir}/_MANIFEST.json")
    fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    out = fs.create(path, True)
    try:
        out.write(bytearray(json.dumps(manifest, sort_keys=True).encode()))
    finally:
        out.close()
    return manifest


def verify_dataset_manifest(spark, table_dir: str, df: DataFrame | None = None) -> dict:
    """Recompute the manifest over the dataset at ``table_dir`` and
    compare with the stored ``_MANIFEST.json``; raises ValueError naming
    every mismatched field. Returns the stored manifest on success.

    The dataset is re-read with the format recorded at write time
    (parquet/orc/json); pass ``df`` to verify a frame you already hold
    (or a format needing reader options, e.g. CSV with headers)."""
    import json

    jvm = spark.sparkContext._jvm
    path = jvm.org.apache.hadoop.fs.Path(f"{table_dir}/_MANIFEST.json")
    fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    stream = fs.open(path)
    try:
        stored = json.loads(bytes(stream.readAllBytes()).decode())
    finally:
        stream.close()
    if df is None:
        df = spark.read.format(stored.get("format", "parquet")).load(table_dir)
    actual = compute_manifest_stats(df)
    bad = [k for k in ("rows", "checksum", "columns") if stored[k] != actual[k]]
    if bad:
        raise ValueError(
            f"manifest mismatch at {table_dir}: "
            + ", ".join(f"{k} stored={stored[k]} actual={actual[k]}" for k in bad)
        )
    return stored


def compute_manifest_stats(df: DataFrame) -> dict:
    """The manifest's computed fields only (no write) — shared by writer
    and verifier so they can never drift. Cells are canonicalized to
    'v<string form>' (or 'n' for NULL) before hashing: type-drift-proof
    and null-visible (struct-hash skips null fields)."""
    from pyspark.sql import functions as F

    canon = [
        F.coalesce(
            F.concat(F.lit("v"), F.col(c).cast("string")), F.lit("n")
        ).alias(c)
        for c in sorted(df.columns)
    ]
    row = df.select(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.xxhash64(F.struct(*canon)).cast("decimal(38,0)")).alias("checksum"),
    ).first()
    return {
        "rows": row["rows"],
        "checksum": str(row["checksum"] if row["checksum"] is not None else 0),
        "columns": sorted(df.columns),
    }
