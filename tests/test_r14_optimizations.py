"""Focused tests for the r14 optimization-round internals changes.

Each test pins an equivalence the optimization relies on:

* outer-generators replaced inner ones across the text family — the
  row sets must be IDENTICAL, including for documents whose token
  stream is empty (the isNotNull-on-generated-attribute pattern);
* ``classifier_features`` sharing — predict/train fed the shared
  counted-feature frame must equal the hash-it-yourself path bit for
  bit;
* ``spread_if_narrow`` — spreads a one-file source, leaves derived
  frames and already-wide inputs alone (the scale-adaptive guard).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_invertedindexer_spark.functions import textstats
from hadoop_invertedindexer_spark.operators import dedup
from hadoop_invertedindexer_spark.sources.tables import spread_if_narrow


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_winnow_fingerprints_handles_empty_and_short_docs(spark):
    # empty text and sub-k docs still fingerprint (the word_ngrams
    # 1-element fallback) — outer posexplode must not add NULL rows
    docs = spark.createDataFrame(
        [(1, ""), (2, "a b"), (3, "a b c d e f g h i j")],
        "doc_id long, text string",
    )
    out = dedup.winnow_fingerprints(docs, k=5, w=4).collect()
    ids = {r.doc_id for r in out}
    assert ids == {1, 2, 3}
    assert all(r.fp is not None and r.pos is not None for r in out)


def test_hashed_gram_features_drops_empty_docs_exactly(spark):
    # a doc normalizing to zero tokens contributes NO feature rows —
    # the explode_outer + isNotNull pattern must not leak a NULL gram
    docs = spark.createDataFrame(
        [(1, "...!!!"), (2, "hello world hello")],
        "doc_id long, text string",
    )
    feats = textstats.classifier_features(docs, n_features=64, label_col=None)
    rows = feats.collect()
    assert {r.doc_id for r in rows} == {2}
    assert all(r.feature is not None for r in rows)
    # unigram+dedup: 'hello' (cnt 2) + 'world' (cnt 1)
    assert sorted(r.cnt for r in rows) in ([1, 2], [3])  # [3] iff md5 collision at 64 buckets


def test_classifier_predict_features_path_is_bit_identical(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma qualitymarker", 1),
            (2, "delta epsilon junkmarker", -1),
            (3, "alpha alpha beta junkmarker", -1),
            (4, "", 1),
        ],
        "doc_id long, text string, y int",
    )
    feats = textstats.classifier_features(docs, n_features=128, label_col="y")
    w = textstats.classifier_train(
        docs, n_iters=3, n_features=128, features=feats
    )
    w_direct = textstats.classifier_train(docs, n_iters=3, n_features=128)
    assert _rows(w) == _rows(w_direct)
    p_shared = textstats.classifier_predict(
        docs, w, n_features=128, features=feats
    )
    p_direct = textstats.classifier_predict(docs, w, n_features=128)
    assert _rows(p_shared) == _rows(p_direct)


def test_spread_if_narrow_guard(spark, tmp_path):
    # one-file source -> spread to default parallelism
    p = str(tmp_path / "one")
    spark.range(100).withColumnRenamed("id", "k").coalesce(1).write.parquet(p)
    one = spark.read.parquet(p)
    spread = spread_if_narrow(one, "k")
    assert (
        spread.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # frame with no file provenance at all (range) -> untouched
    derived = spark.range(10).withColumnRenamed("id", "k")
    assert spread_if_narrow(derived, "k") is derived
    # rows unchanged either way
    assert sorted(r.k for r in spread.collect()) == list(range(100))
