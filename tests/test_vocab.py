"""Vocabulary build + token-id encoding fixtures."""

from __future__ import annotations

from hadoop_invertedindexer_spark.operators import vocab


def test_vocab_rank_order_and_ties(spark):
    docs = spark.createDataFrame(
        [(1, "bb aa bb cc aa bb"), (2, "aa cc dd")], ["doc_id", "text"]
    )
    v = {r.token: (r.token_id, r.n_occurrences) for r in vocab.build_vocab(docs).collect()}
    # bb:3  aa:3  cc:2  dd:1 — tie bb/aa broken by token asc => aa first
    assert v["aa"] == (1, 3) and v["bb"] == (2, 3)
    assert v["cc"] == (3, 2) and v["dd"] == (4, 1)


def test_vocab_max_size_caps(spark):
    docs = spark.createDataFrame([(1, "a b c d e f g h")], ["doc_id", "text"])
    assert vocab.build_vocab(docs, max_size=3).count() == 3


def test_encode_roundtrip_and_oov(spark):
    docs = spark.createDataFrame(
        [(1, "bb aa zz bb"), (2, "")], ["doc_id", "text"]
    )
    train = spark.createDataFrame([(9, "aa bb aa bb bb")], ["doc_id", "text"])
    v = vocab.build_vocab(train)  # bb=1 (3x), aa=2 (2x); zz OOV
    out = {r.doc_id: r for r in vocab.encode_tokens(docs, v).collect()}
    assert out[1].ids_str == "1,2,0,1"
    assert out[1].n_tokens == 4 and out[1].n_oov == 1
    assert 2 not in out  # empty text has no tokens -> no row


def test_encode_deterministic_under_repartition(spark):
    rows = [(i, f"tok{i % 5} tok{i % 3} shared words here") for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    v = vocab.build_vocab(docs, max_size=6)
    a = sorted((r.doc_id, r.ids_str) for r in vocab.encode_tokens(docs, v).collect())
    b = sorted(
        (r.doc_id, r.ids_str)
        for r in vocab.encode_tokens(docs.repartition(13), v).collect()
    )
    assert a == b
