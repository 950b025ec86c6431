"""Partition-pruned upsert/delete maintenance: correctness of the merge
semantics AND the only-touched-partitions-rewritten guarantee (asserted
on the untouched partition's actual files)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from hadoop_invertedindexer_spark.operators.maintenance import (
    delete_keys,
    upsert_partitioned,
)


def _seed_table(spark, path: str) -> None:
    rows = [
        (1, "a", "one"), (2, "a", "two"),
        (3, "b", "three"), (4, "b", "four"),
        (5, "c", "five"),
    ]
    spark.createDataFrame(rows, "id long, p string, payload string").write.mode(
        "overwrite"
    ).partitionBy("p").parquet(path)


def _files(path: str, part: str) -> dict[str, float]:
    return {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/p={part}/*.parquet")
    }


def _rows(spark, path: str) -> set[tuple]:
    return {
        (r.id, r.p, r.payload)
        for r in spark.read.parquet(path).collect()
    }


def test_upsert_replaces_inserts_and_prunes_rewrite(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _seed_table(spark, path)
    before_b = _files(path, "b")
    before_c = _files(path, "c")

    updates = spark.createDataFrame(
        [(2, "a", "TWO v2"), (6, "a", "six new")],
        "id long, p string, payload string",
    )
    upsert_partitioned(spark, path, updates, ["id"], "p")

    assert _rows(spark, path) == {
        (1, "a", "one"), (2, "a", "TWO v2"), (6, "a", "six new"),
        (3, "b", "three"), (4, "b", "four"), (5, "c", "five"),
    }
    # untouched partitions were not rewritten: same files, same mtimes
    assert _files(path, "b") == before_b
    assert _files(path, "c") == before_c


def test_upsert_empty_batch_is_noop(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _seed_table(spark, path)
    before = {p: _files(path, p) for p in ("a", "b", "c")}
    empty = spark.createDataFrame([], "id long, p string, payload string")
    upsert_partitioned(spark, path, empty, ["id"], "p")
    assert {p: _files(path, p) for p in ("a", "b", "c")} == before


def test_delete_discovers_partitions_from_keys(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _seed_table(spark, path)
    before_a = _files(path, "a")

    # tombstones carry only keys — partition membership is probed
    tombs = spark.createDataFrame([(3,), (5,), (99,)], "id long")
    delete_keys(spark, path, tombs, ["id"], "p")

    assert _rows(spark, path) == {
        (1, "a", "one"), (2, "a", "two"), (4, "b", "four"),
    }
    assert _files(path, "a") == before_a  # id 99 absent, a untouched


def test_rewrite_read_side_is_partition_pruned(spark, tmp_path):
    from hadoop_invertedindexer_spark.operators.maintenance import (
        _affected_partitions,
        _pruned_existing,
    )

    path = str(tmp_path / "tbl")
    _seed_table(spark, path)
    # the exact frame upsert/delete rewrites from must carry a
    # dynamic-partition-pruning filter, not a full scan — the touched
    # partition list must never be collected to the driver
    changes = spark.createDataFrame([(9, "b", "x")], "id long, p string, payload string")
    parts_df = _affected_partitions(changes, "p")
    plan = (
        _pruned_existing(spark, path, "p", parts_df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "dynamicpruning" in plan.lower(), plan


def test_upsert_preserves_null_partition_rows(spark, tmp_path):
    """A change batch touching the null partition must not drop the null
    partition's existing rows (the isin-era scan skipped them while the
    dynamic overwrite still replaced the directory)."""
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, None, "null-old"), (2, "a", "a-old")],
        "id long, p string, payload string",
    ).write.partitionBy("p").parquet(path)

    updates = spark.createDataFrame(
        [(3, None, "null-new")], "id long, p string, payload string"
    )
    upsert_partitioned(spark, path, updates, ["id"], "p")
    assert _rows(spark, path) == {
        (1, None, "null-old"), (3, None, "null-new"), (2, "a", "a-old"),
    }


def test_delete_empties_null_partition(spark, tmp_path):
    """Tombstoning every row of the null partition must drop its
    __HIVE_DEFAULT_PARTITION__ directory like any other emptied one."""
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, None, "null-doomed"), (2, "a", "a-keep")],
        "id long, p string, payload string",
    ).write.partitionBy("p").parquet(path)
    assert (tmp_path / "tbl" / "p=__HIVE_DEFAULT_PARTITION__").exists()

    delete_keys(spark, path, spark.createDataFrame([(1,)], "id long"), ["id"], "p")
    assert _rows(spark, path) == {(2, "a", "a-keep")}
    assert not (tmp_path / "tbl" / "p=__HIVE_DEFAULT_PARTITION__").exists()


def test_delete_empties_partition_with_escaped_value(spark, tmp_path):
    """Partition values Hive escapes in dir names (here ':') must still
    have their emptied directories dropped."""
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a:b", "colon"), (2, "ok", "plain")],
        "id long, p string, payload string",
    ).write.partitionBy("p").parquet(path)
    assert (tmp_path / "tbl" / "p=a%3Ab").exists()

    delete_keys(spark, path, spark.createDataFrame([(1,)], "id long"), ["id"], "p")
    assert _rows(spark, path) == {(2, "ok", "plain")}
    assert not (tmp_path / "tbl" / "p=a%3Ab").exists()


class TestDatasetDiff:
    def test_all_four_statuses(self, spark):
        from hadoop_invertedindexer_spark.operators.maintenance import (
            dataset_diff,
        )

        old = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], ["doc_id", "text"]
        )
        new = spark.createDataFrame(
            [(2, "b"), (3, "c2"), (4, "d")], ["doc_id", "text"]
        )
        got = {
            r.doc_id: r.status for r in dataset_diff(old, new).collect()
        }
        assert got == {
            1: "removed",
            2: "unchanged",
            3: "changed",
            4: "added",
        }

    def test_multi_column_fingerprint(self, spark):
        from hadoop_invertedindexer_spark.operators.maintenance import (
            dataset_diff,
        )

        old = spark.createDataFrame(
            [(1, "a", "en"), (2, "b", "en")], ["doc_id", "text", "lang"]
        )
        new = spark.createDataFrame(
            [(1, "a", "de"), (2, "b", "en")], ["doc_id", "text", "lang"]
        )
        got = {
            r.doc_id: r.status
            for r in dataset_diff(
                old, new, cols=("text", "lang")
            ).collect()
        }
        # lang flip is a change only when lang is fingerprinted
        assert got == {1: "changed", 2: "unchanged"}
        text_only = {
            r.doc_id: r.status
            for r in dataset_diff(old, new).collect()
        }
        assert text_only == {1: "unchanged", 2: "unchanged"}

    def test_null_empty_and_delimiter_boundaries_distinct(self, spark):
        # ADVICE r10: concat_ws SKIPS nulls, so NULL->'' flips and
        # delimiter-bearing values shifting across column boundaries
        # both used to fingerprint 'unchanged'. The injective per-column
        # encoding must report all of them as 'changed'.
        from hadoop_invertedindexer_spark.operators.maintenance import (
            dataset_diff,
        )

        schema = "doc_id long, text string, lang string"
        old = spark.createDataFrame(
            [(1, None, "en"), (2, "a\x1f", "b"), (3, "same", "x")], schema
        )
        new = spark.createDataFrame(
            [(1, "", "en"), (2, "a", "\x1fb"), (3, "same", "x")], schema
        )
        got = {
            r.doc_id: r.status
            for r in dataset_diff(old, new, cols=("text", "lang")).collect()
        }
        assert got == {1: "changed", 2: "changed", 3: "unchanged"}
