"""Multimodal plumbing: binary column schema, mapInPandas decode path
(stubbed), and the NotImplementedError gate for the real decode."""

from __future__ import annotations

import pytest
from pyspark.sql.utils import PythonException

from hadoop_invertedindexer_spark.operators import multimodal
from hadoop_invertedindexer_spark.sources.tables import read_table


def test_binary_docs_schema(spark, sf_dir):
    b = multimodal.binary_docs(read_table(spark, sf_dir, "documents"))
    assert dict(b.dtypes) == {
        "doc_id": "bigint",
        "payload": "binary",
        "media_type": "string",
        "n_bytes": "bigint",
    }


def test_fake_decode_values_deterministic(spark):
    docs = spark.createDataFrame([(7, "abcd")], ["doc_id", "text"])
    row = multimodal.decode_image_meta(multimodal.binary_docs(docs), fake=True).first()
    payload = b"abcd"
    assert row.doc_id == 7
    assert row.n_bytes == 4
    assert row.width == 16 + (len(payload) % 64)
    assert row.height == 16 + (sum(payload[:8]) % 64)
    assert row.n_frames == 1 + (len(payload) % 4)


def test_real_decode_raises_not_implemented(spark):
    docs = spark.createDataFrame([(1, "xyz")], ["doc_id", "text"])
    df = multimodal.decode_image_meta(multimodal.binary_docs(docs), fake=False)
    with pytest.raises(PythonException, match="NotImplementedError"):
        df.collect()


def test_resize_produces_requested_dimensions(spark):
    docs = spark.createDataFrame([(1, "x" * 100), (2, "y")], ["doc_id", "text"])
    out = multimodal.resize_image(
        multimodal.binary_docs(docs), width=8, height=4, fake=True
    ).collect()
    assert all(len(r.payload) == 32 and r.width == 8 and r.height == 4 for r in out)


def test_frame_sample_fans_out(spark):
    docs = spark.createDataFrame([(1, "a" * 256)], ["doc_id", "text"])
    frames = multimodal.frame_sample(
        multimodal.binary_docs(docs), every=2, frame_bytes=32, fake=True
    ).collect()
    # 256 bytes / 32 = 8 frames, every 2nd -> indices 0,2,4,6
    assert [r.frame_idx for r in frames] == [0, 2, 4, 6]
    assert all(len(r.frame) == 32 for r in frames)


def test_feature_extract_schema_and_norm(spark):
    docs = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    row = multimodal.feature_extract(multimodal.binary_docs(docs), dim=8).first()
    assert len(row.features) == 8
    assert abs(sum(row.features) - 1.0) < 1e-6  # normalized histogram


def test_decode_matches_input_cardinality(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    decoded = multimodal.decode_image_meta(multimodal.binary_docs(docs), fake=True)
    assert decoded.count() == docs.count()
