"""Vocabulary building + token-id encoding (EXT, SURVEY §2B north star).

The tokenizer step of an LLM data pipeline: build a frequency-ranked
word vocabulary over the corpus and encode every document as its
ordered token-id sequence; plus REAL subword training —
:func:`bpe_train` learns a BPE merge table on the word-frequency
dictionary (r8) and :func:`bpe_encode` replays it.

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

import pandas

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from hadoop_invertedindexer_spark.operators.dedup import token_array
from hadoop_invertedindexer_spark.sources.tables import spread_if_narrow


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
        docs.select(F.explode_outer(token_array(text_col)).alias("token"))
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
        F.posexplode_outer(token_array(text_col)).alias("pos", "token"),
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
        new_docs.select(F.explode_outer(token_array(text_col)).alias("token"))
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
    output: str = "str",
) -> DataFrame:
    """GPT-style sequence packing — the step that turns a deduplicated,
    filtered corpus into fixed-length training blocks: every document's
    token-id sequence (OOV → 0) gets an ``eos_id`` separator appended,
    the sequences concatenate in ``id_col`` order into one global token
    stream, and the stream is cut into ``block_size`` blocks. Returns
    (block_id, n_tokens, ids_str) — one row per block, the final block
    possibly partial, ids comma-joined in stream order (portable to the
    oracle's string_agg). ``output='array'`` (r8) returns the ids as a
    real ``array<int>`` column named ``ids`` instead — the shape a
    training loader consumes directly (and what a parquet sink should
    store); identical content, pinned by test to split(ids_str). Empty documents contribute just their
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
        F.posexplode_outer(token_array(text_col)).alias("pos", "token"),
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
    # posexplode_OUTER + null guard on the generated attribute (r15):
    # the non-outer form made Catalyst infer `size(ids) > 0` into a
    # Filter evaluated right below the Generate (visible in the r15
    # pipeline_capstone before-plan); the guard restores the exact
    # inner-explode row set if an ids array were ever empty/null.
    stream = (
        offset_docs.select(
            "_off", F.posexplode_outer("ids").alias("i", "tid")
        )
        .where(F.col("i").isNotNull())
        .select("tid", (F.col("_off") + F.col("i")).alias("gpos"))
    )
    ordered_ids = F.transform(
        F.array_sort(F.collect_list(F.struct("gpos", "tid"))),
        lambda s: s["tid"],
    )
    out_col = (
        ordered_ids.alias("ids")
        if output == "array"
        else F.concat_ws(
            ",", F.transform(ordered_ids, lambda t: t.cast("string"))
        ).alias("ids_str")
    )
    return (
        stream.withColumn(
            "block_id", F.floor(F.col("gpos") / block_size).cast("long")
        )
        .groupBy("block_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"), out_col)
    )


# Symbol-boundary sentinels for BPE merge application (r10, ADVICE
# high): a merge must rewrite exactly one ADJACENT SYMBOL PAIR, but a
# literal replace over the bare space-joined symbol string can fire
# across symbol boundaries — with symbols 't'+'he', the pattern 't h'
# matches inside 't he' and produces 'the' via a merge (t,h) that was
# never learned, diverging from Sennrich 2016 and corrupting subsequent
# pair counts. Fix: apply every merge in a WRAPPED representation where
# each symbol is bracketed as \x02sym\x03 — the pattern
# \x02lhs\x03\x02rhs\x03 can then only ever match two whole adjacent
# symbols, and adjacent matches share no delimiter (a single-space
# sentinel would: the first replacement consumes the shared space and
# greedy 'a b a b' -> 'ab a b' instead of 'ab ab'). Left-to-right
# non-overlapping replace in the wrapped space IS exact greedy BPE, and
# the same chr(2)/chr(3) construction runs verbatim in the DuckDB
# oracle (_sql_bpe_ctes). Assumption (holds by construction): tokens
# come out of token_array's normalization, which never yields the STX/
# ETX control characters, so symbols cannot contain the sentinels.
_SYM_OPEN = "\x02"
_SYM_CLOSE = "\x03"


def _sym_wrap(col):
    """space-joined symbol string -> sentinel-wrapped: 't he' ->
    '\\x02t\\x03\\x02he\\x03'."""
    return F.concat(
        F.lit(_SYM_OPEN),
        F.replace(col, F.lit(" "), F.lit(_SYM_CLOSE + _SYM_OPEN)),
        F.lit(_SYM_CLOSE),
    )


def _sym_unwrap(col):
    """Inverse of :func:`_sym_wrap`: boundaries back to single spaces,
    then the lone leading/trailing sentinels dropped."""
    out = F.replace(col, F.lit(_SYM_CLOSE + _SYM_OPEN), F.lit(" "))
    out = F.replace(out, F.lit(_SYM_OPEN), F.lit(""))
    return F.replace(out, F.lit(_SYM_CLOSE), F.lit(""))


def _merge_pattern(lhs: str, rhs: str) -> str:
    return _SYM_OPEN + lhs + _SYM_CLOSE + _SYM_OPEN + rhs + _SYM_CLOSE


def _merge_replacement(merged: str) -> str:
    return _SYM_OPEN + merged + _SYM_CLOSE


def bpe_train(
    docs: DataFrame,
    num_merges: int = 32,
    text_col: str = "text",
    min_freq: int = 1,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Distributed BPE merge training (Sennrich et al. 2016) — the real
    subword-tokenizer training step (VERDICT r7 ask 3; supersedes this
    module's earlier 'training procedure, not a dataflow op' carve-out).

    Classic BPE trains on the WORD-FREQUENCY DICTIONARY, not the raw
    corpus: the corpus is shuffled exactly once (the word count), and
    every training iteration runs on the vocab-sized frame — each word a
    space-joined symbol string, initially its characters. Per merge:
    count adjacent symbol pairs weighted by word frequency (pairs built
    array-side off the materialized symbol array — overlapping
    occurrences all count, the reference get_stats semantics), pick the
    argmax under the total order (freq desc, pair asc), and apply it
    with a literal ``replace`` over the SENTINEL-WRAPPED symbol string
    (see ``_SYM_OPEN``) — whose left-to-right non-overlapping
    substitution on whole bracketed symbols IS the BPE greedy merge
    ('a a a' + (a,a) -> 'aa a', and never across symbol boundaries),
    identical in Spark and ANSI SQL, which keeps the whole training loop
    oracle-checkable.

    Returns the merge table — (merge_rank, lhs, rhs, merged, freq), one
    row per learned merge in order, fewer than ``num_merges`` rows if
    pairs run out or the best pair falls below ``min_freq``.

    Scale shape: iterations touch only the dictionary (|vocab| rows —
    millions at 100 TB, distributed, never the token stream); each
    iteration is one vocab-scale job plus a ONE-ROW collect (the argmax
    — index-metadata scale, same class as pagerank's residual probe).
    ``localCheckpoint`` every ``checkpoint_every`` merges truncates the
    growing replace lineage, so iteration r costs O(|vocab|), not
    O(r * |vocab|) (the sql_api_recursive lesson)."""
    spark = docs.sparkSession
    cur = _bpe_word_dict(docs, text_col).localCheckpoint(eager=True)
    merges = _bpe_loop(cur, 0, num_merges, min_freq, checkpoint_every)
    schema = (
        "merge_rank long, lhs string, rhs string, merged string, freq long"
    )
    return spark.createDataFrame(merges, schema)


def _bpe_word_dict(docs: DataFrame, text_col: str) -> DataFrame:
    """(ws, cnt): the char-symbol word-frequency dictionary — the ONE
    corpus-scale shuffle of BPE training. A narrow-provenance source
    spreads first (r14) so the tokenize+explode map side runs at full
    width."""
    return (
        spread_if_narrow(docs, text_col).select(
            # explode_OUTER + null filter (r14): stops the inferred
            # size()>0 pushdown from re-tokenizing every doc twice at
            # the scan; empty-token docs drop via the isNotNull
            F.explode_outer(
                F.filter(token_array(text_col), lambda t: t != "")
            ).alias("word")
        )
        .where(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.concat_ws(" ", F.split("word", "")).alias("ws"), "cnt")
    )


def _bpe_loop(
    cur: DataFrame,
    start_rank: int,
    num_merges: int,
    min_freq: int,
    checkpoint_every: int,
) -> list[tuple[int, str, str, str, int]]:
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(start_rank + 1, start_rank + num_merges + 1):
        # the symbol array is MATERIALIZED in a child projection and the
        # shifted lookup reads element_at off that attribute (r14):
        # element_at(F.split(...), i) inside the lambda re-ran the split
        # per element — the O(L²) interpreted-HOF trap this module's own
        # _gram_stream comment warns about, paid once per merge round
        pair_arr = F.transform(
            F.col("_sy"),
            lambda s, i: F.when(
                i >= 1,
                F.concat(F.element_at(F.col("_sy"), i), F.lit(" "), s),
            ),
        )
        top = (
            cur.select(F.split("ws", " ").alias("_sy"), "cnt")
            .select(
                F.explode_outer(
                    F.filter(pair_arr, lambda p: p.isNotNull())
                ).alias("pair"),
                "cnt",
            )
            .where(F.col("pair").isNotNull())
            .groupBy("pair")
            .agg(F.sum("cnt").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top or top[0].freq < min_freq:
            break
        pair, freq = top[0].pair, int(top[0].freq)
        lhs, rhs = pair.split(" ")
        merged = lhs + rhs
        merges.append((r, lhs, rhs, merged, freq))
        cur = cur.select(
            _sym_unwrap(
                F.replace(
                    _sym_wrap(F.col("ws")),
                    F.lit(_merge_pattern(lhs, rhs)),
                    F.lit(_merge_replacement(merged)),
                )
            ).alias("ws"),
            "cnt",
        )
        if (r - start_rank) % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)
    return merges


def bpe_train_continue(
    docs: DataFrame,
    merges: DataFrame,
    num_merges: int = 32,
    text_col: str = "text",
    min_freq: int = 1,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Warm-start BPE training (r8 — the incremental-maintenance posture
    of build/append elsewhere in the engine, applied to the tokenizer):
    replay an existing merge table over the fresh word dictionary, then
    learn ``num_merges`` MORE merges continuing the rank sequence.
    Returns ONLY the new merges (append them to the prior table for the
    full model).

    BPE's training state is fully captured by (dictionary, merge list),
    so on an unchanged corpus ``continue(train(c, k), c, m)`` equals the
    last ``m`` rows of ``train(c, k + m)`` exactly — pinned by test.
    With a GROWN corpus this is the honest daily-vocab-growth move: the
    existing merges stay frozen (ids stable for every already-encoded
    shard) and only new merges reflect the new data.

    Cost: the replay is |prior| literal replace projections over the
    vocab-sized dictionary (localCheckpoint every ``checkpoint_every``
    to keep lineage flat), then the normal per-merge loop — the corpus
    still shuffles exactly once."""
    spark = docs.sparkSession
    prior = [
        (int(r.merge_rank), r.lhs, r.rhs)
        for r in merges.orderBy("merge_rank").collect()
    ]
    cur = _bpe_word_dict(docs, text_col).localCheckpoint(eager=True)
    for i, (_, lhs, rhs) in enumerate(prior, 1):
        cur = cur.select(
            _sym_unwrap(
                F.replace(
                    _sym_wrap(F.col("ws")),
                    F.lit(_merge_pattern(lhs, rhs)),
                    F.lit(_merge_replacement(lhs + rhs)),
                )
            ).alias("ws"),
            "cnt",
        )
        if i % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)
    cur = cur.localCheckpoint(eager=True)
    start = prior[-1][0] if prior else 0
    out = _bpe_loop(cur, start, num_merges, min_freq, checkpoint_every)
    schema = (
        "merge_rank long, lhs string, rhs string, merged string, freq long"
    )
    return spark.createDataFrame(out, schema)


def build_bpe_model(
    docs: DataFrame,
    path: str,
    num_merges: int = 32,
    text_col: str = "text",
    min_freq: int = 1,
    checkpoint_every: int = 8,
) -> None:
    """Train and PERSIST a BPE model (r10, VERDICT r9 ask 5) — the
    tokenizer's member of the engine's stored-model pattern
    (``build_dsir_model``, the classifier weight table, the
    MinHash/window/paragraph indexes): the training corpus is paid
    once, and every future ingest batch encodes against the stored
    merge table without re-reading it. Layout: ``merges/`` holds the
    (merge_rank, lhs, rhs, merged, freq) table — with the
    boundary-aware merges of :func:`bpe_train`, so the artifact can
    never contain a cross-symbol merge — and ``params/`` pins
    (num_merges, min_freq) for provenance and for
    :func:`extend_bpe_model`'s rank continuation."""
    merges = bpe_train(docs, num_merges, text_col, min_freq, checkpoint_every)
    merges.write.mode("overwrite").parquet(f"{path}/merges")
    docs.sparkSession.createDataFrame(
        [(int(num_merges), int(min_freq))], "num_merges int, min_freq int"
    ).write.mode("overwrite").parquet(f"{path}/params")


def extend_bpe_model(
    docs: DataFrame,
    path: str,
    num_merges: int = 32,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> None:
    """Grow a persisted BPE model in place: replay the stored merges
    over the (possibly grown) corpus via :func:`bpe_train_continue`,
    learn ``num_merges`` more, and APPEND only the new rows — existing
    merges stay frozen (every already-encoded shard keeps its pieces),
    exactly the daily-vocab-growth posture the continue path was built
    for. min_freq comes from the stored params (an extension that
    suddenly admitted rarer pairs would silently change model
    quality)."""
    spark = docs.sparkSession
    p = spark.read.parquet(f"{path}/params").head()
    prior = spark.read.parquet(f"{path}/merges")
    new = bpe_train_continue(
        docs,
        prior,
        num_merges=num_merges,
        text_col=text_col,
        min_freq=int(p.min_freq),
        checkpoint_every=checkpoint_every,
    )
    new.write.mode("append").parquet(f"{path}/merges")


def maintain_bpe_model(
    docs: DataFrame,
    path: str,
    max_fertility_mils: int = 2500,
    extra_merges: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Fertility-triggered model growth (r12) — the tokenizer's member
    of the engine's maintenance-loop pattern (``maintain_index_tier``
    for the dedup tiers, ``maintain_ivf_index`` for ANN):
    :func:`bpe_fertility` is the trigger, :func:`extend_bpe_model` the
    remediation. Probes the given docs' corpus-wide fertility against
    the STORED merges; when pieces-per-word exceeds
    ``max_fertility_mils``/1000 (the model fragments what it is being
    asked to encode — undertrained, or the corpus drifted), learns
    ``extra_merges`` more from the probe docs via rank continuation.
    One row:

        (n_docs, n_words, n_chars, n_pieces, fertility_mils,
         pieces_per_kchar, extended, merges_before, merges_after)

    Unlike the compaction/rebuild loops this one extends IN PLACE — no
    rotation dir — because append-only rank continuation is reader-safe
    by construction (existing merges are frozen; every already-encoded
    shard keeps its pieces — the :func:`extend_bpe_model` contract).
    An empty probe (fertility NULL) never triggers: no evidence, no
    training run.

    Scale shape: the probe is one encode projection + a one-row rollup
    (bounded collect); the extension is :func:`bpe_train_continue`'s
    dictionary-space training — corpus shuffles once, per-merge cost
    O(|vocab|)."""
    import collections

    spark = docs.sparkSession
    merges = spark.read.parquet(f"{path}/merges")
    probe = bpe_fertility(
        docs.withColumn("_all", F.lit("all")),
        merges,
        group_col="_all",
        id_col=id_col,
        text_col=text_col,
    ).head()
    if probe is None:  # empty probe frame: zero evidence, zero-row rollup
        probe = collections.namedtuple(
            "P", "n_docs n_words n_chars n_pieces fertility_mils"
            " pieces_per_kchar"
        )(0, 0, 0, 0, None, None)
    n_before = merges.count()
    extended = (
        probe.fertility_mils is not None
        and probe.fertility_mils > max_fertility_mils
    )
    if extended:
        extend_bpe_model(
            docs,
            path,
            num_merges=extra_merges,
            text_col=text_col,
            checkpoint_every=checkpoint_every,
        )
    n_after = (
        spark.read.parquet(f"{path}/merges").count() if extended else n_before
    )
    return spark.createDataFrame(
        [
            (
                probe.n_docs,
                probe.n_words,
                probe.n_chars,
                probe.n_pieces,
                probe.fertility_mils,
                probe.pieces_per_kchar,
                extended,
                n_before,
                n_after,
            )
        ],
        "n_docs BIGINT, n_words BIGINT, n_chars BIGINT, n_pieces BIGINT,"
        " fertility_mils BIGINT, pieces_per_kchar BIGINT,"
        " extended BOOLEAN, merges_before BIGINT, merges_after BIGINT",
    )


def bpe_encode_incremental(
    spark,
    batch: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_expr_merges: int = 64,
) -> DataFrame:
    """Encode an ingest batch against a PERSISTED BPE model — identical
    output to :func:`bpe_encode` with the stored merge table (pinned by
    test and by the shared contract oracle). Per-batch cost is O(batch):
    the model read is the |merges|-row parquet (model scale — the same
    class as the DSIR table), it compiles into the same literal-replace
    plan, and no training corpus is ever touched — at 100 TB the stored
    ``merges/`` dir IS the tokenizer you ship to every encode job."""
    merges = spark.read.parquet(f"{path}/merges")
    return bpe_encode(batch, merges, id_col, text_col, max_expr_merges)


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_expr_merges: int = 64,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Apply a trained BPE merge table: every document's normalized
    words become character-symbol strings, and the merges replay in rank
    order over the whole document at once — words separated by a ``|``
    sentinel symbol (stripped by normalization from real text, so no
    trained pair ever spans it, and cross-word merges cannot happen).
    The document is wrapped into the symbol-bracketed form ONCE, all
    merges replay as whole-symbol replaces in that space (see
    ``_SYM_OPEN`` — boundary-aware by construction), and the result
    unwraps once at the end. Returns (id_col, n_pieces, pieces_str)
    with pieces space-joined in order.

    The merge table is MODEL-sized: it collects to the driver (the
    persisted-ANN-params pattern) and compiles into the plan. Up to
    ``max_expr_merges`` merges become a chain of JVM-side literal
    ``replace`` expressions (whole-stage codegen, zero Python); larger
    tables fall back to an Arrow-batched pandas UDF replaying the same
    replaces per batch — same semantics, documented slow path (real
    tokenizers use a trie; a 30k-merge replay is the honest relational
    equivalent, not the hot path).

    ``carry_cols`` names extra ``docs`` columns to thread through to the
    output unchanged (so rollups like :func:`bpe_fertility` ride the
    single encode pass instead of re-joining the corpus on the id)."""
    ordered = [
        (_merge_pattern(m.lhs, m.rhs), _merge_replacement(m.merged))
        for m in merges.orderBy("merge_rank").collect()
    ]
    carries = [F.col(c) for c in carry_cols]
    # the per-document replace chain is the heaviest string CPU in the
    # module — spread a narrow-provenance source first (r14) so it runs
    # at full width instead of inside a one-split scan stage
    docs = spread_if_narrow(docs, id_col)
    base = docs.select(
        F.col(id_col),
        *carries,
        F.concat_ws(
            " | ",
            F.transform(
                F.filter(token_array(text_col), lambda t: t != ""),
                lambda w: F.concat_ws(" ", F.split(w, "")),
            ),
        ).alias("ws"),
    )
    if len(ordered) <= max_expr_merges:
        expr = _sym_wrap(F.col("ws"))
        for pat, rep in ordered:
            expr = F.replace(expr, F.lit(pat), F.lit(rep))
        enc = base.select(
            F.col(id_col), *carries, _sym_unwrap(expr).alias("ws")
        )
    else:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _apply(ws: pandas.Series) -> pandas.Series:
            ws = (
                _SYM_OPEN
                + ws.str.replace(" ", _SYM_CLOSE + _SYM_OPEN, regex=False)
                + _SYM_CLOSE
            )
            for pat, rep in ordered:
                ws = ws.str.replace(pat, rep, regex=False)
            return (
                ws.str.replace(_SYM_CLOSE + _SYM_OPEN, " ", regex=False)
                .str.replace(_SYM_OPEN, "", regex=False)
                .str.replace(_SYM_CLOSE, "", regex=False)
            )

        enc = base.select(
            F.col(id_col), *carries, _apply("ws").alias("ws")
        )
    pieces = F.filter(F.split("ws", " "), lambda p: p != F.lit("|"))
    return enc.select(
        F.col(id_col),
        *carries,
        F.size(pieces).cast("long").alias("n_pieces"),
        F.concat_ws(" ", pieces).alias("pieces_str"),
    )


def bpe_fertility(
    docs: DataFrame,
    merges: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer FERTILITY report — pieces-per-word and pieces-per-char
    by corpus stratum, the diagnostic every tokenizer choice is judged
    on (a vocab trained on English fragments a new language into
    near-character pieces; fertility per ``group_col`` is how you see
    it before burning a training run). One row per group:
    (group, n_docs, n_words, n_chars, n_pieces, fertility_mils,
    pieces_per_kchar) — fertility = pieces·1000/words, pieces_per_kchar
    = pieces·1000/chars (1000 = character-level, lower = more
    compression), both integer thousandths, NULL on empty strata
    rather than a fake ratio.

    Scale shape: word/char masses ride the encode projection via
    ``carry_cols`` (the corpus is scanned ONCE, never re-joined on the
    id), the merge replay is the same JVM replace chain as
    ``bpe_encode``, and the rollup is one metadata-scale groupBy to
    ≤ |strata| rows."""
    words = F.filter(token_array(text_col), lambda t: t != "")
    staged = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.col(group_col),
        F.size(words).cast("long").alias("_nw"),
        F.length(F.array_join(words, "")).cast("long").alias("_nc"),
    )
    enc = bpe_encode(
        staged,
        merges,
        id_col=id_col,
        text_col=text_col,
        carry_cols=(group_col, "_nw", "_nc"),
    )
    g = enc.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_nw").cast("long").alias("n_words"),
        F.sum("_nc").cast("long").alias("n_chars"),
        F.sum("n_pieces").cast("long").alias("n_pieces"),
    )
    return g.select(
        group_col,
        "n_docs",
        "n_words",
        "n_chars",
        "n_pieces",
        F.expr(
            "CASE WHEN n_words = 0 THEN NULL"
            " ELSE n_pieces * 1000 DIV n_words END"
        ).alias("fertility_mils"),
        F.expr(
            "CASE WHEN n_chars = 0 THEN NULL"
            " ELSE n_pieces * 1000 DIV n_chars END"
        ).alias("pieces_per_kchar"),
    )


def vocab_coverage(
    docs: DataFrame,
    vocab: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary COVERAGE report — OOV rate by corpus stratum for a
    capped vocabulary, the companion diagnostic to
    :func:`bpe_fertility` (fertility asks "how many pieces per word";
    coverage asks "how many words the id space can represent at all"
    — a vocab built on one language's corpus quietly maps another's
    tokens to <unk>, and this is the one-pass report that shows it
    before training). One row per group: (group, n_tokens, n_oov,
    oov_mils, coverage_mils), integer thousandths.

    Scale shape: one corpus token explode, ONE broadcast join against
    the ≤ max_size vocab (the token stream never shuffles to meet the
    vocab — same contract as ``encode_tokens``), then a metadata-scale
    groupBy to ≤ |strata| rows with partial aggregation."""
    tok = docs.select(
        F.col(group_col),
        F.explode_outer(token_array(text_col)).alias("token"),
    ).where(F.col("token") != "")
    # distinct BEFORE the broadcast join: a vocab frame with duplicate
    # token rows would fan out the join and inflate n_tokens, skewing
    # oov_mils/coverage_mils (ADVICE r10); the vocab is <= max_size so
    # the distinct is metadata-scale
    inv = vocab.select("token").distinct().withColumn("_inv", F.lit(True))
    mapped = tok.join(F.broadcast(inv), "token", "left")
    g = mapped.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("_inv").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
    )
    return g.select(
        group_col,
        "n_tokens",
        "n_oov",
        F.expr("n_oov * 1000 DIV n_tokens").alias("oov_mils"),
        F.expr("(n_tokens - n_oov) * 1000 DIV n_tokens").alias(
            "coverage_mils"
        ),
    )
