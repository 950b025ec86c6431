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


def test_decode_matches_input_cardinality(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    decoded = multimodal.decode_image_meta(multimodal.binary_docs(docs), fake=True)
    assert decoded.count() == docs.count()
