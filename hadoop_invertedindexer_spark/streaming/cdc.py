"""Streaming CDC ingestion: apply a change stream (upserts + deletes)
onto a partitioned parquet table with MERGE semantics, one micro-batch
at a time.

This is the streaming face of ``operators/maintenance.py`` the same way
``maintain_hourly_tier`` is the streaming face of the batch rollup: each
micro-batch resolves a single winner per key (latest ``order_col``),
optionally rejects updates staler than what the table already holds, and
then MERGEs via the partition-pruned upsert/delete — so per-batch cost is
O(batch + touched partitions), never O(table).

Idempotency under foreachBatch's at-least-once contract: the apply is a
deterministic function of (batch rows, table state at batch start) whose
result is itself — replaying a batch after a crash-between-write-and-
checkpoint re-merges rows the table already contains, leaving it
unchanged (pinned in tests by re-running a batch by hand).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_invertedindexer_spark.operators.maintenance import (
    delete_keys,
    upsert_partitioned,
)

DELETE_OP = "D"


def _table_exists(spark: SparkSession, table_dir: str) -> bool:
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(table_dir)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def apply_cdc_batch(
    spark: SparkSession,
    table_dir: str,
    batch_df: DataFrame,
    key_cols: list[str],
    partition_col: str,
    order_col: str,
    op_col: str = "op",
    version_guard: bool = False,
) -> None:
    """Apply one CDC micro-batch. ``op_col`` distinguishes deletes
    (value ``'D'``) from upserts (anything else); ``order_col`` resolves
    multiple changes to one key within the batch (latest wins, ties by
    the key itself are impossible post-winner). With ``version_guard``,
    changes older than the table's current ``order_col`` for that key are
    dropped — out-of-order replay protection at the cost of one
    column-pruned probe of the table.

    Ties on ``order_col`` (same key, same version — CDC sources can emit
    an update and a delete with one timestamp) resolve deterministically:
    the delete wins, then a content hash breaks any remaining tie. A
    nondeterministic pick would let a foreachBatch replay converge on a
    different winner than the original run."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(order_col),
        F.desc(F.col(op_col) == DELETE_OP),
        F.xxhash64(F.struct(*batch_df.columns)),
    )
    latest = (
        batch_df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    if version_guard and _table_exists(spark, table_dir):
        current = spark.read.parquet(table_dir).select(
            *key_cols, F.col(order_col).alias("_cur")
        )
        latest = (
            latest.join(current, key_cols, "left")
            .where(F.col("_cur").isNull() | (F.col(order_col) >= F.col("_cur")))
            .drop("_cur")
            # sever lineage from the table files the guard just read —
            # the upsert below replaces them, and the delete step would
            # otherwise re-evaluate this frame against vanished files
            .localCheckpoint(eager=True)
        )
    upserts = latest.where(F.col(op_col) != DELETE_OP).drop(op_col)
    deletes = latest.where(F.col(op_col) == DELETE_OP)

    if not _table_exists(spark, table_dir):
        if upserts.isEmpty():
            # a delete-only first batch (replay starting mid-history) must
            # not bootstrap: writing an empty frame would create a
            # parquet-less directory that wedges every later read
            return
        upserts.write.partitionBy(partition_col).parquet(table_dir)
    else:
        upsert_partitioned(spark, table_dir, upserts, key_cols, partition_col)
    delete_keys(
        spark, table_dir, deletes.select(key_cols), key_cols, partition_col
    )


def run_streaming_cdc(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    table_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    partition_col: str,
    order_col: str,
    op_col: str = "op",
    version_guard: bool = False,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain the change stream with availableNow, merging each micro-batch
    into the table. File order is the CDC order; ``version_guard`` adds
    per-key protection when the source can replay out of order."""
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_cdc_batch(
            spark,
            table_dir,
            batch_df,
            key_cols,
            partition_col,
            order_col,
            op_col,
            version_guard,
        )

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
