"""r13: storage-path identity for rotation guards — the r12 watch item
(realpath-only guards treat two spellings of one remote URI as
different strings) closed via Hadoop FileSystem qualification."""

from __future__ import annotations

import os

import pytest

from hadoop_invertedindexer_spark.fsutil import guard_rotation, same_storage_path


def test_identical_and_distinct_paths(spark, tmp_path):
    a = str(tmp_path / "idx")
    assert same_storage_path(spark, a, a)
    assert not same_storage_path(spark, a, str(tmp_path / "idx_rot"))


def test_local_symlink_spellings_match(spark, tmp_path):
    real = tmp_path / "real"
    real.mkdir()
    link = tmp_path / "alias"
    os.symlink(real, link)
    assert same_storage_path(spark, str(link), str(real))


def test_file_uri_vs_bare_path_match(spark, tmp_path):
    # the case realpath alone cannot see: a scheme-qualified spelling
    # of the same directory — makeQualified resolves both to one URI
    bare = str(tmp_path / "idx")
    assert same_storage_path(spark, f"file:{bare}", bare)
    assert same_storage_path(spark, f"file://{bare}", bare)
    assert not same_storage_path(
        spark, f"file:{bare}", str(tmp_path / "other")
    )


def test_relative_segments_normalize(spark, tmp_path):
    a = str(tmp_path / "idx")
    dotted = str(tmp_path / "sub" / ".." / "idx")
    assert same_storage_path(spark, a, dotted)


def test_guard_rotation_raises_on_aliases_only(spark, tmp_path):
    a = str(tmp_path / "idx")
    with pytest.raises(ValueError, match="in place"):
        guard_rotation(spark, a, f"file:{a}", "index compaction")
    guard_rotation(spark, a, str(tmp_path / "idx_rot"), "ok")  # no raise
