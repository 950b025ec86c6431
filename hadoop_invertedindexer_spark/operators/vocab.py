"""Vocabulary building + token-id encoding (EXT, SURVEY §2B north star).

The tokenizer step of an LLM data pipeline, word-level: build a
frequency-ranked vocabulary over the corpus, then encode every document
as its ordered token-id sequence. (Subword/BPE merges are a training
procedure, not a dataflow op; the dataflow shape — global frequency
rank, broadcast vocab join, order-preserving reassembly — is identical,
and ``textstats.n_bpe_tokens`` covers the BPE-ish counting heuristic.)

Scale design:

* the vocabulary is CAPPED (``max_size``), so the encode join is always
  a broadcast — the token stream never shuffles to meet the vocab;
* ranking ties are broken (count desc, token asc): the id assignment is
  a total order, deterministic across partitionings and engines;
* the only full-width shuffles are the token-frequency aggregation
  (8-byte-ish token keys) and the per-doc reassembly groupBy, both
  pre-aggregated map-side by Catalyst;
* id 0 is reserved for OOV/<unk>, ids start at 1 in rank order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from hadoop_invertedindexer_spark.operators.dedup import token_array


def build_vocab(
    docs: DataFrame,
    max_size: int = 1024,
    text_col: str = "text",
) -> DataFrame:
    """(token, token_id, n_occurrences): the ``max_size`` most frequent
    normalized tokens, id = rank by (count desc, token asc) starting at
    1. See :func:`rank_vocab` for why the top-k happens BEFORE the rank
    window."""
    counts = (
        docs.select(F.explode(token_array(text_col)).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return rank_vocab(counts, max_size=max_size)


def encode_tokens(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode each document as its ordered token-id sequence against a
    vocabulary from :func:`build_vocab`; out-of-vocabulary tokens map to
    id 0. Returns (doc_id, n_tokens, n_oov, ids_str) with the sequence
    comma-joined (portable to the oracle's string_agg).

    The vocab side is broadcast (bounded by max_size); the token stream
    is exploded with positions, mapped, and reassembled with ONE
    exchange on ``id_col``."""
    tok = docs.select(
        F.col(id_col),
        F.posexplode(token_array(text_col)).alias("pos", "token"),
    ).where(F.col("token") != "")
    mapped = tok.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    ).select(
        id_col,
        "pos",
        F.coalesce(F.col("token_id"), F.lit(0)).cast("int").alias("tid"),
    )
    return mapped.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum((F.col("tid") == 0).cast("long")).alias("n_oov"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                lambda s: s["tid"].cast("string"),
            ),
        ).alias("ids_str"),
    )


def merge_vocab_counts(
    existing_counts: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Incremental vocabulary maintenance: fold a new document batch's
    token frequencies into a persisted (token, n_occurrences) count
    table — the same append-only-partials tier pattern as the index and
    rollup maintenance (`streaming/index_maintenance.py`): counts are
    associative, so merged counts == counts of the concatenated corpus
    (fixture-proven), and the batch cost is O(batch) + one merge
    aggregation over (existing ∪ batch) keyed on the token. Ranking into
    ids stays a VIEW over the counts (:func:`rank_vocab`), recomputed
    after each merge — ids are positional, so any append can shift them;
    a stable-id variant would persist assigned ids and only extend,
    trading rank fidelity for id stability (documented, not needed by
    the encode path which re-joins by token)."""
    batch = (
        new_docs.select(F.explode(token_array(text_col)).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        existing_counts.select("token", "n_occurrences")
        .unionAll(batch)
        .groupBy("token")
        .agg(F.sum("n_occurrences").alias("n_occurrences"))
    )


def rank_vocab(counts: DataFrame, max_size: int = 1024) -> DataFrame:
    """(token, n_occurrences) -> ranked ids, by (count desc, token asc).

    Scale note (ADVICE r5): ranking with a bare ``Window.orderBy`` over
    the full count table executes in ONE task over the whole corpus
    vocabulary, which grows with corpus size (Heaps' law) — a one-task
    bottleneck at 100 TB. Instead the top-``max_size`` rows are selected
    first with ``orderBy().limit()``, which Catalyst compiles to
    TakeOrderedAndProject — a distributed two-phase top-k (per-partition
    bounded heaps, then a k-row merge). Only then does the row_number
    window run, over exactly ``max_size`` rows regardless of corpus
    size. The (count desc, token asc) total order makes the two plans
    bit-identical."""
    top = counts.select("token", "n_occurrences").orderBy(
        F.col("n_occurrences").desc(), F.col("token")
    ).limit(max_size)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token"))
    return top.withColumn(
        "token_id", F.row_number().over(w).cast("int")
    ).select("token", "token_id", "n_occurrences")


def pack_tokens(
    docs: DataFrame,
    vocab: DataFrame,
    block_size: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
    eos_id: int = -1,
    bucket_size: int = 1024,
) -> DataFrame:
    """GPT-style sequence packing — the step that turns a deduplicated,
    filtered corpus into fixed-length training blocks: every document's
    token-id sequence (OOV → 0) gets an ``eos_id`` separator appended,
    the sequences concatenate in ``id_col`` order into one global token
    stream, and the stream is cut into ``block_size`` blocks. Returns
    (block_id, n_tokens, ids_str) — one row per block, the final block
    possibly partial, ids comma-joined in stream order (portable to the
    oracle's string_agg). Empty documents contribute just their
    separator, so every document is represented and total stream length
    is Σ(doc_tokens + 1) — asserted in tests.

    The global concatenation needs every document's starting OFFSET — a
    prefix sum over doc order. A bare ``sum() over (order by id)``
    window would exchange every doc-count row into ONE task (the
    Heaps'-law mistake the r5 vocab rank had); instead the offsets are a
    TWO-LEVEL prefix sum: docs hash into ``bucket_size``-wide id ranges,
    per-bucket totals aggregate (tiny frame: D/bucket_size rows), the
    bucket-level prefix runs over that tiny frame only, and the
    within-bucket prefix is a window PARTITIONED by bucket — so no task
    ever sees more than one bucket of doc-level rows or the bucket
    summary frame. At 1 B docs / bucket_size 1024 the single-task frame
    is ~1 M summary rows (bytes per row — metadata scale); raise
    ``bucket_size`` to push it down further. The token stream itself
    shuffles ONCE, on block_id, for the final reassembly.

    Determinism: offsets depend only on (id order, token counts); block
    contents are a pure function of the corpus — the same blocks on any
    partitioning, hash-checked by the oracle."""
    tok = docs.select(
        F.col(id_col),
        F.posexplode(token_array(text_col)).alias("pos", "token"),
    ).where(F.col("token") != "")
    mapped = tok.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    ).select(
        id_col,
        "pos",
        F.coalesce(F.col("token_id"), F.lit(0)).cast("int").alias("tid"),
    )
    seqs = mapped.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tid"))),
            lambda s: s["tid"],
        ).alias("_ids")
    )
    # every doc (empty ones included) carries ids + the eos separator
    with_eos = (
        docs.select(id_col)
        .join(seqs, id_col, "left")
        .select(
            id_col,
            F.concat(
                F.coalesce(F.col("_ids"), F.expr("cast(array() as array<int>)")),
                F.array(F.lit(eos_id).cast("int")),
            ).alias("ids"),
        )
        .withColumn("len", F.size("ids").cast("long"))
        .withColumn("_bkt", F.floor(F.col(id_col) / bucket_size))
    )
    bucket_totals = with_eos.groupBy("_bkt").agg(F.sum("len").alias("_bt"))
    bw = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    bucket_offsets = bucket_totals.select(
        "_bkt", F.coalesce(F.sum("_bt").over(bw), F.lit(0)).alias("_boff")
    )
    dw = (
        Window.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset_docs = (
        with_eos.join(F.broadcast(bucket_offsets), "_bkt")
        .withColumn(
            "_off",
            F.col("_boff") + F.coalesce(F.sum("len").over(dw), F.lit(0)),
        )
    )
    stream = offset_docs.select(
        "_off", F.posexplode("ids").alias("i", "tid")
    ).select("tid", (F.col("_off") + F.col("i")).alias("gpos"))
    return (
        stream.withColumn(
            "block_id", F.floor(F.col("gpos") / block_size).cast("long")
        )
        .groupBy("block_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("gpos", "tid"))),
                    lambda s: s["tid"].cast("string"),
                ),
            ).alias("ids_str"),
        )
    )
