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


def test_incremental_vocab_merge_equals_rebuild(spark):
    """Batch-vs-rebuild equality: merging two batches' counts then
    ranking == building the vocab over the concatenated corpus."""
    a = spark.createDataFrame(
        [(1, "aa bb aa cc"), (2, "bb dd")], ["doc_id", "text"]
    )
    b = spark.createDataFrame(
        [(3, "aa ee bb"), (4, "cc cc ff")], ["doc_id", "text"]
    )
    counts_a = (
        vocab.build_vocab(a, max_size=10 ** 6).select("token", "n_occurrences")
    )
    merged = vocab.rank_vocab(vocab.merge_vocab_counts(counts_a, b), max_size=100)
    rebuilt = vocab.build_vocab(a.unionAll(b), max_size=100)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )


def test_incremental_vocab_merge_idempotent_empty_batch(spark):
    a = spark.createDataFrame([(1, "aa bb aa")], ["doc_id", "text"])
    empty = spark.createDataFrame([], "doc_id long, text string")
    counts = vocab.build_vocab(a, max_size=100).select("token", "n_occurrences")
    merged = vocab.rank_vocab(vocab.merge_vocab_counts(counts, empty), 100)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, vocab.build_vocab(a, max_size=100).collect())
    )


def test_rank_uses_distributed_topk_not_global_window(spark):
    """ADVICE r5: the rank must not be a bare Window.orderBy over the
    full (Heaps-law-growing) count table. The physical plan must show
    TakeOrderedAndProject (per-partition bounded heaps + k-row merge)
    feeding the window, so the single-partition sort touches exactly
    max_size rows."""
    docs = spark.createDataFrame(
        [(i, f"w{i % 7} w{i % 11} common") for i in range(50)],
        ["doc_id", "text"],
    )
    plan = (
        vocab.build_vocab(docs, max_size=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
