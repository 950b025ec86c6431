"""Streaming CDC merge onto a partitioned table: end-to-end availableNow
run, within-batch winner resolution, delete handling, replay idempotency,
and the version guard."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from hadoop_invertedindexer_spark.streaming.cdc import (
    apply_cdc_batch,
    run_streaming_cdc,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("p", StringType()),
        StructField("payload", StringType()),
        StructField("version", LongType()),
        StructField("op", StringType()),
    ]
)
DDL = "id long, p string, payload string, version long, op string"


def _rows(spark, path):
    return {
        (r.id, r.p, r.payload, r.version)
        for r in spark.read.parquet(path).collect()
    }


def test_streaming_cdc_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    # batch files are consumed one per trigger, in order
    b1 = [(1, "a", "one", 1, "U"), (2, "a", "two", 1, "U"), (3, "b", "three", 1, "U")]
    b2 = [
        (2, "a", "two v2", 2, "U"),
        (2, "a", "two v3", 3, "U"),  # same key twice in batch: v3 wins
        (3, "b", None, 2, "D"),      # delete empties partition b
        (4, "c", "four", 1, "U"),
    ]
    spark.createDataFrame(b1, DDL).coalesce(1).write.parquet(f"{src}/f=1")
    spark.createDataFrame(b2, DDL).coalesce(1).write.parquet(f"{src}/f=2")

    run_streaming_cdc(
        spark, src, SCHEMA, table, ckpt, ["id"], "p", "version",
    )
    assert _rows(spark, table) == {
        (1, "a", "one", 1),
        (2, "a", "two v3", 3),
        (4, "c", "four", 1),
    }
    # partition b was emptied and its directory dropped
    assert not (tmp_path / "table" / "p=b").exists()

    # restart with same checkpoint: nothing new, table unchanged
    run_streaming_cdc(
        spark, src, SCHEMA, table, ckpt, ["id"], "p", "version",
    )
    assert _rows(spark, table) == {
        (1, "a", "one", 1),
        (2, "a", "two v3", 3),
        (4, "c", "four", 1),
    }


def test_cdc_batch_replay_is_idempotent(spark, tmp_path):
    table = str(tmp_path / "table")
    batch = spark.createDataFrame(
        [(1, "a", "one", 1, "U"), (2, "a", "two", 1, "U")], DDL
    )
    apply_cdc_batch(spark, table, batch, ["id"], "p", "version")
    once = _rows(spark, table)
    # simulate foreachBatch replay after crash-before-checkpoint
    apply_cdc_batch(spark, table, batch, ["id"], "p", "version")
    assert _rows(spark, table) == once


def test_cdc_version_guard_rejects_stale_updates(spark, tmp_path):
    table = str(tmp_path / "table")
    apply_cdc_batch(
        spark,
        table,
        spark.createDataFrame([(1, "a", "fresh", 5, "U")], DDL),
        ["id"], "p", "version",
    )
    stale = spark.createDataFrame(
        [(1, "a", "stale replay", 2, "U"), (2, "a", "new key", 1, "U")], DDL
    )
    apply_cdc_batch(
        spark, table, stale, ["id"], "p", "version", version_guard=True
    )
    assert _rows(spark, table) == {
        (1, "a", "fresh", 5),
        (2, "a", "new key", 1),
    }
    # without the guard, source order wins (documented CDC default)
    apply_cdc_batch(spark, table, stale.where(F.col("id") == 1), ["id"], "p", "version")
    assert (1, "a", "stale replay", 2) in _rows(spark, table)


def test_delete_only_first_batch_does_not_wedge(spark, tmp_path):
    """A delete-only batch before the table exists must be a no-op, not a
    parquet-less bootstrap directory that breaks every later read."""
    table = str(tmp_path / "table")
    only_deletes = spark.createDataFrame([(9, "a", None, 1, "D")], DDL)
    apply_cdc_batch(spark, table, only_deletes, ["id"], "p", "version")
    import os

    assert not os.path.exists(table)
    # the pipeline proceeds normally afterwards
    apply_cdc_batch(
        spark, table,
        spark.createDataFrame([(1, "a", "one", 1, "U")], DDL),
        ["id"], "p", "version",
    )
    assert _rows(spark, table) == {(1, "a", "one", 1)}


def test_same_version_update_and_delete_resolves_to_delete(spark, tmp_path):
    """order_col ties resolve deterministically with delete winning, so a
    foreachBatch replay converges on the same table state."""
    table = str(tmp_path / "table")
    apply_cdc_batch(
        spark, table,
        spark.createDataFrame([(1, "a", "v1", 1, "U")], DDL),
        ["id"], "p", "version",
    )
    tied = spark.createDataFrame(
        [(1, "a", "update at 2", 2, "U"), (1, "a", None, 2, "D")], DDL
    )
    import os

    for _ in range(2):  # apply + replay
        apply_cdc_batch(spark, table, tied, ["id"], "p", "version")
        # the delete emptied the whole table -> directory removed, so the
        # next batch bootstraps cleanly instead of wedging on a
        # parquet-less dir
        assert not os.path.exists(table)
    apply_cdc_batch(
        spark, table,
        spark.createDataFrame([(3, "b", "back", 1, "U")], DDL),
        ["id"], "p", "version",
    )
    assert _rows(spark, table) == {(3, "b", "back", 1)}
