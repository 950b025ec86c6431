"""Corpus maintenance: MERGE-style upsert and tombstone delete over a
partitioned parquet table, rewriting only the partitions the change
touches.

The reference rebuilds its whole index from scratch on every run
(``/root/reference/src/InvertedIndexer.java:259-261`` — one job, full
input directory). A 100 TB corpus can't do that: ingesting a batch of
updated documents or honoring deletion requests must cost O(touched
partitions), not O(corpus). These operators are the parquet-native
approximation of a table format's MERGE/DELETE:

* the change set's partition values select which partitions to rewrite
  (everything else is untouched on disk — asserted byte-level in tests);
* the rewrite is ``existing ⟕anti changes ∪ changes`` (upsert) or
  ``existing ⟕anti tombstones`` (delete) over a partition-pruned scan;
* the write uses dynamic partition overwrite, so only the selected
  partitions' directories are replaced.

Scale posture: the read side is partition-pruned by a dynamic-partition-
pruning broadcast semi join on the partition column — the touched-
partition list never lands on the driver; the anti-join's right side is
the change batch (small → broadcast). The known parquet-level gap vs a real
table format — no snapshot isolation for concurrent readers mid-rewrite —
is a property of the storage layer, not of this plan shape; the same
DataFrames drive a Delta/Iceberg MERGE unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _affected_partitions(changes: DataFrame, partition_col: str) -> DataFrame:
    """Distinct partition values of the change batch as an eagerly
    materialized frame (never a driver-side list — the touched-partition
    set scales with the batch, and the scan pruning consumes it as a
    broadcast join, not an ``isin`` literal). Eager localCheckpoint
    matters twice: the frame is re-read AFTER the rewrite replaces the
    files a lazy plan might depend on, and DPP's broadcast reuses the
    materialized relation."""
    return (
        changes.select(partition_col).distinct().localCheckpoint(eager=True)
    )


def _dpp_selective_marker(partition_col: str):
    """A vacuously-true comparison on the partition column. Catalyst's
    ``PartitionPruning`` rule only inserts a dynamic-pruning subquery
    when the build side contains an ``isLikelySelective`` predicate
    (BinaryComparison / In / string predicate …); a distinct'd change
    batch is selective in fact but not in form, so without this marker
    the semi join scans every partition. ``coalesce`` keeps the
    predicate non-null so no row is dropped. The resulting
    ``dynamicpruningexpression`` partition filter is asserted in tests."""
    col = F.col(partition_col)
    return F.coalesce(F.length(col.cast("string")), F.lit(0)) >= 0


def _pruned_existing(
    spark: SparkSession, table_dir: str, partition_col: str, parts_df: DataFrame
) -> DataFrame:
    """The rewrite's read side: the table scanned with the touched
    partitions as a partition filter (the plan-level guarantee that a
    rewrite never reads untouched partitions — asserted on THIS function
    in tests).

    Non-null partition values prune via a dynamic-partition-pruning
    broadcast semi join — the partition list never lands on the driver.
    A null partition value can't match any equi join, so that single
    partition is unioned in behind an O(1) emptiness probe with a
    statically-pruned ``IsNull`` scan (this also fixes the latent
    ``isin``-era hazard where a null-partition change batch overwrote
    the null partition dir without having scanned its existing rows)."""
    table = spark.read.parquet(table_dir)
    build = F.broadcast(
        parts_df.where(F.col(partition_col).isNotNull()).where(
            _dpp_selective_marker(partition_col)
        )
    )
    pruned = table.join(build, partition_col, "left_semi")
    if not parts_df.where(F.col(partition_col).isNull()).isEmpty():
        pruned = pruned.unionByName(table.where(F.col(partition_col).isNull()))
    return pruned


def _rewrite_partitions(
    merged: DataFrame, table_dir: str, partition_col: str
) -> DataFrame:
    # localCheckpoint materializes the merged rows so the writer no longer
    # reads from the path it is about to overwrite (Spark rejects that
    # lineage otherwise); eager + small because the scan was pruned to the
    # touched partitions only.
    ckpt = merged.localCheckpoint(eager=True)
    ckpt.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy(partition_col).parquet(table_dir)
    # drop the session's cached file listing for the path — later reads
    # would otherwise try the replaced part files (FileStatusCache has no
    # TTL by default)
    ckpt.sparkSession.catalog.refreshByPath(table_dir)
    return ckpt


def _drop_partition_dirs(
    spark: SparkSession, table_dir: str, partition_col: str, values: list
) -> None:
    """Remove partition directories via the Hadoop FileSystem API (works
    on any supported filesystem, not just local paths). Needed because
    dynamic partition overwrite only replaces partitions PRESENT in the
    written data — a partition whose rows were all deleted produces no
    output and would otherwise keep its stale files.

    Directory names use Spark's own Hive-style escaping (special chars
    percent-encoded, NULL as the default-partition sentinel) so values
    like ``a:b`` or None target the directory the writer actually
    created, not a raw-interpolated near-miss."""
    sc = spark.sparkContext
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    escape = jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    for v in values:
        # getPartitionPathString escapes specials and maps null/empty to
        # the __HIVE_DEFAULT_PARTITION__ sentinel, matching the writer
        part = escape.getPartitionPathString(
            partition_col, "" if v is None else str(v)
        )
        p = jvm.org.apache.hadoop.fs.Path(f"{table_dir}/{part}")
        fs = p.getFileSystem(conf)
        if fs.exists(p):
            fs.delete(p, True)


def upsert_partitioned(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> None:
    """Upsert ``updates`` into the partitioned table at ``table_dir``:
    rows matching on ``key_cols`` are replaced, new keys are inserted,
    and only partitions present in ``updates`` are rewritten.

    ``updates`` must carry ``partition_col``; a key that moves partitions
    is handled iff the update row lists its NEW partition (the old row is
    only removed when its old partition is also in the batch — same
    contract as Hive-style dynamic partition overwrite)."""
    parts_df = _affected_partitions(updates, partition_col)
    if parts_df.isEmpty():
        return
    existing = _pruned_existing(spark, table_dir, partition_col, parts_df)
    merged = existing.join(
        F.broadcast(updates.select(key_cols).distinct()), key_cols, "left_anti"
    ).unionByName(updates)
    _rewrite_partitions(merged, table_dir, partition_col)


def delete_keys(
    spark: SparkSession,
    table_dir: str,
    tombstones: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> None:
    """Tombstone delete (the GDPR/right-to-erasure path): remove every row
    whose ``key_cols`` appear in ``tombstones``, rewriting only the
    partitions that actually contain those keys.

    Unlike upsert, the touched-partition set is discovered by probing the
    table (tombstones carry keys, not partitions): one partition-column
    projection joined against the tombstone keys — a metadata-cheap scan
    that reads only ``key_cols`` + the partition value."""
    table = spark.read.parquet(table_dir)
    probe = (
        table.select(partition_col, *key_cols)
        .join(F.broadcast(tombstones.select(key_cols).distinct()), key_cols)
    )
    parts_df = _affected_partitions(probe, partition_col)
    if parts_df.isEmpty():
        return
    existing = _pruned_existing(spark, table_dir, partition_col, parts_df)
    merged = existing.join(
        F.broadcast(tombstones.select(key_cols).distinct()), key_cols, "left_anti"
    )
    ckpt = _rewrite_partitions(merged, table_dir, partition_col)
    # emptied = touched partitions with no surviving rows, computed as a
    # null-safe anti join (null is a real partition value here). The
    # values stream to the driver only to issue the FS deletes — the
    # same metadata-bounded commit-time work a table format's driver
    # does; cardinality is bounded by the touched set, not the table.
    survived = ckpt.select(partition_col).distinct()
    emptied_df = parts_df.join(
        survived,
        parts_df[partition_col].eqNullSafe(survived[partition_col]),
        "left_anti",
    )
    emptied = [row[0] for row in emptied_df.toLocalIterator()]
    _drop_partition_dirs(spark, table_dir, partition_col, emptied)
    if emptied:
        spark.catalog.refreshByPath(table_dir)
        _drop_table_dir_if_empty(spark, table_dir, partition_col)


def _drop_table_dir_if_empty(
    spark: SparkSession, table_dir: str, partition_col: str
) -> None:
    """If a delete emptied EVERY partition, remove the table directory
    itself: a directory holding only commit markers is unreadable as
    parquet and would wedge every later merge — removing it restores the
    'table does not exist yet' state the bootstrap path handles."""
    jvm = spark.sparkContext._jvm
    root = jvm.org.apache.hadoop.fs.Path(table_dir)
    fs = root.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return
    for status in fs.listStatus(root):
        if status.getPath().getName().startswith(f"{partition_col}="):
            return  # data remains
    fs.delete(root, True)
    spark.catalog.refreshByPath(table_dir)


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """Snapshot diff between two corpus versions — the audit report
    behind every dataset release note ("v2.1: +1.2M docs, 40k changed,
    3k removed") and the precondition check before an incremental
    maintenance run (``upsert_partitioned`` / the persisted-index
    ``append_*`` paths should see exactly the 'added'+'changed' rows).

    Rows match on ``id_col``; content identity is the md5 of the
    ``cols`` projection, so TEXT NEVER SHUFFLES — each side reduces to
    (id, 16-byte fingerprint) before the join. Each column is encoded
    injectively before joining into the digest input: NULL maps to a
    token no value can produce and every value is length-prefixed, so
    NULL vs '' cannot collide and a delimiter character inside one
    column cannot shift a boundary into the next (a bare
    ``concat_ws`` SKIPS nulls and would report both as 'unchanged').
    Returns one row per id present in either version:
    (``id_col``, status ∈ {'added', 'removed', 'changed', 'unchanged'}).

    Scale shape: two projections + ONE full-outer sort-merge/hash join
    co-partitioned on the id — the same single-exchange shape as
    ``full_outer_reconcile``; no window, no collect. At 100 TB both
    sides prune to two columns at the parquet scan."""
    def encoded(c: str):
        s = F.col(c).cast("string")
        # 'v<len>:<value>' for values, 'n' for NULL: injective per
        # column, so the joined stream decodes unambiguously
        return F.coalesce(
            F.concat(F.lit("v"), F.length(s).cast("string"), F.lit(":"), s),
            F.lit("n"),
        )

    def fingerprint(df: DataFrame, alias: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("_id"),
            F.md5(F.concat_ws("\x1f", *[encoded(c) for c in cols])).alias(
                alias
            ),
        )

    o = fingerprint(old, "_fp_old")
    n = fingerprint(new, "_fp_new")
    joined = o.join(n, "_id", "full_outer")
    status = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        F.col("_id").alias(id_col), status.alias("status")
    )
