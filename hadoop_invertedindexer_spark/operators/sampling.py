"""Deterministic sampling / splitting / n-gram mining for training-data
pipelines (EXT, SURVEY §2B north-star rows).

A 100 TB corpus is split, subsampled, and mixture-balanced *by content
hash*, never by ``rand()``: the assignment must be reproducible across
reruns, engines, and partitionings, and must not require a global sort or
any coordination. All three operators here are narrow per-row projections
plus one aggregation — no shuffle beyond what the aggregation itself
needs — and every formula has an exact DuckDB twin (md5 is identical
everywhere), so the contract checks them value-for-value.

Reference cite: the reference has no sampling surface (its only dataset
is the full corpus, src/InvertedIndexer.java:259); these are the
north-star extension rows from BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def md5_hex(col: Column) -> Column:
    """Portable deterministic content hash: lowercase hex md5 of the
    value's canonical string form. Identical in Spark and DuckDB, unlike
    xxhash64/murmur — this is what makes split assignment oracle-checkable
    and stable across engine versions."""
    return F.md5(F.encode(col.cast("string"), "UTF-8"))


def hash_bucket16(col: Column) -> Column:
    """First hex nibble of md5 → 16 uniform buckets ('0'..'f')."""
    return F.substring(md5_hex(col), 1, 1)


HASH60_MAX = 1 << 60


def hash_uniform60(col: Column) -> Column:
    """60-bit uniform integer from the md5 hash (first 15 hex chars) —
    portable exactly: Spark ``conv(hex,16,10)`` and DuckDB
    ``('0x'||hex)::BIGINT`` parse the same value, and 60 bits fits a
    BIGINT with headroom for the cross-multiplication below."""
    return F.conv(F.substring(md5_hex(col), 1, 15), 16, 10).cast("decimal(38,0)")


def weighted_sample(
    df: DataFrame,
    weight_col: str = "n_chars",
    denom: int = 700,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted Bernoulli sample: each row is kept with
    probability ``min(1, weight/denom)`` — e.g. length-weighted document
    sampling where a ``denom``-char doc is always kept and shorter docs
    proportionally less often.

    The decision is the exact integer cross-multiplication
    ``h * denom < 2^60 * min(weight, denom)`` in DECIMAL — never the
    double division ``h/2^60 < w/denom`` whose last-ulp rounding could
    flip a row between engines or releases. Like :func:`hash_split`,
    inclusion is a pure function of the id: reruns, repartitions, and
    incremental re-ingestions keep exactly the same rows, and the filter
    is a shuffle-free projection that pushes to the scan.
    """
    dec = "decimal(38,0)"
    h = hash_uniform60(F.col(id_col))
    w = F.least(F.col(weight_col).cast(dec), F.lit(denom).cast(dec))
    return df.where(
        h * F.lit(denom).cast(dec) < F.lit(HASH60_MAX).cast(dec) * w
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_nibbles: int = 12,
    val_nibbles: int = 2,
) -> DataFrame:
    """Deterministic train/val/test split on the id's md5 nibble:
    first ``train_nibbles`` of the 16 buckets → train, next
    ``val_nibbles`` → val, rest → test (default 75/12.5/12.5).

    Properties relied on downstream: (a) assignment is a pure function of
    the id — re-ingesting a document never migrates it between splits, so
    no test-set leakage across pipeline runs; (b) no shuffle — the label
    is a projection."""
    hexchars = "0123456789abcdef"
    train_set = list(hexchars[:train_nibbles])
    val_set = list(hexchars[train_nibbles : train_nibbles + val_nibbles])
    nib = hash_bucket16(F.col(id_col))
    return df.withColumn(
        "split",
        F.when(nib.isin(train_set), F.lit("train"))
        .when(nib.isin(val_set), F.lit("val"))
        .otherwise(F.lit("test")),
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train_nibbles: int = 12,
    val_nibbles: int = 2,
) -> DataFrame:
    """Train/val/test split that near-duplicates cannot straddle.

    A per-document hash split leaks: a near-duplicate pair split across
    train and test inflates eval scores (the model has effectively seen
    the test doc). Here the split key is the near-dup CLUSTER's
    canonical id (``dedup_clusters`` min-id label), so every member of a
    cluster — and every exact re-ingest of one — lands in the same
    split. Singletons degrade to the plain per-doc hash (keep_id ==
    their own id). Same md5-nibble assignment as :func:`hash_split`,
    so the whole composition stays exactly oracle-checkable.
    Output: (doc_id, keep_id, split)."""
    from hadoop_invertedindexer_spark.operators.clusters import dedup_clusters

    comps = dedup_clusters(pairs, docs, id_col)
    return hash_split(
        comps, id_col="keep_id", train_nibbles=train_nibbles,
        val_nibbles=val_nibbles,
    ).select(id_col, "keep_id", "split")


def split_leakage_report(
    split_df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    split_col: str = "split",
    method: str | None = None,
) -> DataFrame:
    """Split-quality EVAL — how many near-duplicate pairs STRADDLE the
    split boundary (a near-dup of a test doc sitting in train is the
    leakage that inflates eval scores; this is the number
    :func:`leakage_safe_split` exists to drive to zero, and the audit a
    per-doc hash split fails). One row: (method, n_pairs, n_straddle,
    straddle_mils) — integer thousandths, NULL rate on an empty pair
    set rather than a fake zero.

    Scale shape: the pair list (already bounded by the dedup op's
    max_df fanout cap) joins the (id, split) projection twice on the
    doc id and folds to one row — the corpus text never enters; cost is
    O(pairs + 2 id-keyed exchanges)."""
    a = split_df.select(
        F.col(id_col).alias("id_a"), F.col(split_col).alias("_sa")
    )
    b = split_df.select(
        F.col(id_col).alias("id_b"), F.col(split_col).alias("_sb")
    )
    j = pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
    g = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum((F.col("_sa") != F.col("_sb")).cast("int"))
        .cast("long")
        .alias("n_straddle"),
    )
    return g.select(
        F.lit(method if method is not None else "split").alias("method"),
        "n_pairs",
        F.coalesce("n_straddle", F.lit(0)).cast("long").alias("n_straddle"),
        F.expr(
            "CASE WHEN n_pairs = 0 THEN NULL"
            " ELSE coalesce(n_straddle, 0) * 1000 DIV n_pairs END"
        ).alias("straddle_mils"),
    )


def stratified_take(
    df: DataFrame,
    strata_col: str = "source",
    n_per_stratum: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sample: the ``n_per_stratum`` rows of each
    stratum that sort first by (md5(id), id). Equivalent to a uniform
    per-stratum random sample, but reproducible — this is how a training
    mixture takes "N documents per source" without ``rand()``.

    One hash-partitioned window per stratum; no stratum ever needs more
    than its own partition's memory, and skewed strata parallelize with
    AQE because the rank filter drops rows before any downstream join."""
    w = Window.partitionBy(strata_col).orderBy(
        md5_hex(F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= n_per_stratum)
    )


def mixture_plan(
    docs: DataFrame,
    weights: dict[str, int],
    token_budget: int,
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Mixture PLANNING — the step before :func:`upsample_corpus` /
    :func:`temperature_mix` runs: given target mixture weights in
    thousandths (the ``upsample_corpus`` convention) and a total token
    budget, compute per stratum how many tokens the corpus HAS, how many
    the mixture WANTS, and the sampling rate in thousandths that closes
    the gap — > 1000 means the stratum must be upsampled (epochs), <
    1000 downsampled, 0 dropped (weight 0 or absent). This is the
    arithmetic behind every published data-mixture table (e.g. the
    GPT-3/Llama per-source "epochs over the dataset" column).

    Returns (``stratum``, ``n_docs``, ``avail_tokens``,
    ``target_tokens``, ``rate_mils``), one row per stratum present in
    the corpus. All integer arithmetic (floor at each step), so the
    plan is bit-reproducible and feeds ``upsample_corpus``'s
    integer-thousandths contract directly.

    Scale shape: one corpus pass aggregating to ≤ |strata| rows (token
    counts ride the partial agg), then a broadcast join against the
    literal weight table — the plan itself is metadata-scale."""
    from hadoop_invertedindexer_spark.operators.dedup import token_array

    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        sorted(weights.items()), f"{strata_col} string, _wm long"
    )
    avail = (
        docs.select(
            F.col(strata_col),
            F.size(F.filter(token_array(text_col), lambda t: t != ""))
            .cast("long")
            .alias("_nt"),
        )
        .groupBy(strata_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_nt").alias("avail_tokens"),
        )
    )
    target = F.floor(
        F.lit(int(token_budget)) * F.coalesce("_wm", F.lit(0)) / F.lit(1000)
    ).cast("long")
    return (
        avail.join(F.broadcast(wdf), strata_col, "left")
        .withColumn("target_tokens", target)
        .select(
            F.col(strata_col).alias("stratum"),
            "n_docs",
            "avail_tokens",
            "target_tokens",
            F.when(
                F.col("avail_tokens") > 0,
                F.floor(
                    F.col("target_tokens") * F.lit(1000)
                    / F.col("avail_tokens")
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rate_mils"),
        )
    )


def data_card(
    docs: DataFrame,
    stopwords: list[str],
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_cut: float = 0.5,
    dup_col: str | None = None,
) -> DataFrame:
    """Corpus DATA-CARD report (r10, VERDICT r9 ask 9) — the
    per-(source, lang, quality-bucket) summary every dataset card /
    mixture decision starts from (the "composition" table of the Pile /
    Dolma / FineWeb writeups), computed in ONE corpus pass: doc and
    token counts, exact-duplicate counts and rates, and the net (post-
    dedup) masses that feed :func:`mixture_plan` directly.

    Cell key: ``source`` (the column), ``lang`` (the marker-profile
    heuristic of ``textstats.lang_id``), and ``quality_bucket`` —
    'hi'/'lo' on ``textstats.quality_score`` against ``quality_cut``.
    Duplicate = a doc whose dedup-normalized text already occurred at a
    smaller ``id_col`` ANYWHERE in the corpus (the ``dedup_exact``
    first-occurrence convention, decided corpus-wide, not per cell — a
    copy in another source still counts). Token counts use the same
    normalized-token counting as ``mixture_plan``, so per-stratum
    ``net_tokens`` here EQUALS ``mixture_plan(deduped).avail_tokens``
    — the conservation link pinned by the e2e test.

    Returns one row per non-empty cell: (source, lang, quality_bucket,
    n_docs, n_tokens, n_dup_docs, dup_tokens, net_docs, net_tokens,
    dup_rate_mils) — rates in integer thousandths, everything else
    exact integers, so the report is bit-reproducible and feeds the
    integer-thousandths contracts downstream.

    ``dup_col`` (r10) names a precomputed boolean duplicate flag and
    skips the corpus-wide window — the hook
    :func:`data_card_incremental` uses to substitute its
    index-membership flag.

    Scale shape: one corpus projection (lang/quality/token expressions
    are pure codegen), ONE exchange on the high-cardinality normalized
    text for the duplicate window, and one metadata-scale groupBy to
    ≤ |sources|·|langs|·2 rows — partial aggregation everywhere, no
    broadcast of anything corpus-sized."""
    from pyspark.sql import Window

    from hadoop_invertedindexer_spark.functions.textstats import (
        lang_id,
        quality_score,
    )
    from hadoop_invertedindexer_spark.operators.dedup import (
        normalized_text,
        token_array,
    )

    if dup_col is not None:
        flagged = docs.withColumn("_dup", F.col(dup_col))
    else:
        flagged = docs.withColumn(
            "_dup",
            F.row_number().over(
                Window.partitionBy(normalized_text(text_col)).orderBy(id_col)
            )
            > 1,
        )
    base = flagged.select(
        F.col(source_col).alias("source"),
        lang_id(F.col(text_col)).alias("lang"),
        F.when(
            quality_score(F.col(text_col), stopwords) >= F.lit(quality_cut),
            F.lit("hi"),
        ).otherwise(F.lit("lo")).alias("quality_bucket"),
        F.size(F.filter(token_array(text_col), lambda t: t != ""))
        .cast("long")
        .alias("_nt"),
        "_dup",
    )
    dup_docs = F.sum(F.col("_dup").cast("long"))
    dup_toks = F.sum(F.when(F.col("_dup"), F.col("_nt")).otherwise(F.lit(0)))
    g = base.groupBy("source", "lang", "quality_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_nt").cast("long").alias("n_tokens"),
        dup_docs.cast("long").alias("n_dup_docs"),
        dup_toks.cast("long").alias("dup_tokens"),
        (F.count(F.lit(1)) - dup_docs).cast("long").alias("net_docs"),
        (F.sum("_nt") - dup_toks).cast("long").alias("net_tokens"),
    )
    # integer DIV, not floor(x*1000/y): at counts beyond ~2^53/1000 the
    # double product rounds before the floor and can flip the mil — the
    # sibling *_mils reports all use DIV and the DuckDB oracle uses //
    return g.withColumn(
        "dup_rate_mils",
        F.expr("n_dup_docs * 1000 DIV n_docs").cast("long"),
    )


def data_card_incremental(
    spark,
    batch: DataFrame,
    index_path: str,
    stopwords: list[str],
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_cut: float = 0.5,
) -> DataFrame:
    """Data-card report of an INGEST BATCH against a published corpus —
    O(batch) card maintenance: the corpus-wide duplicate flag comes
    from the persisted exact-dedup index (``dedup.build_exact_index``)
    instead of a window over corpus ∪ batch, so published text is never
    re-read. A batch doc is a duplicate iff its normalized text is
    already published (index membership) OR occurred earlier in the
    batch (the in-batch window) — exactly the corpus-wide
    first-occurrence rule when published ids precede batch ids, which
    is what makes ``merge_data_cards(card(old), this)`` EQUAL the
    direct ``data_card(old ∪ batch)`` (pinned by the shared contract
    oracle).

    Scale shape: one anti-style membership join on the 32-byte hash
    (``shuffle_hash`` pinned — the index side is unbounded), the
    in-batch window on the same key, then :func:`data_card`'s
    metadata-scale rollup. Per-day cost is O(batch + one index-hash
    scan)."""
    idx = spark.read.parquet(f"{index_path}/hashes")
    return _data_card_against_hashes(
        batch, idx, stopwords, source_col, id_col, text_col, quality_cut
    )


def _data_card_against_hashes(
    batch: DataFrame,
    hashes: DataFrame,
    stopwords: list[str],
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_cut: float = 0.5,
) -> DataFrame:
    """The index-frame core of :func:`data_card_incremental` — takes
    the published-hash frame directly (any superset of columns with
    ``h``; may be empty), so callers like the streaming maintainer can
    pre-filter tiers (e.g. ``batch < batch_id`` for replay
    idempotency) before flagging."""
    from pyspark.sql import Window

    from hadoop_invertedindexer_spark.operators.dedup import (
        normalized_text,
    )

    idx = (
        hashes.select("h").distinct().withColumn("_pub", F.lit(True))
    )
    keyed = batch.withColumn(
        "_h", F.sha2(normalized_text(text_col), 256)
    )
    flagged = (
        keyed.join(
            idx.hint("shuffle_hash"),
            keyed["_h"] == idx["h"],
            "left",
        )
        .withColumn(
            "_idup",
            F.coalesce(F.col("_pub"), F.lit(False))
            | (
                F.row_number().over(
                    Window.partitionBy("_h").orderBy(id_col)
                )
                > 1
            ),
        )
        .drop("h", "_pub", "_h")
    )
    return data_card(
        flagged,
        stopwords,
        source_col=source_col,
        id_col=id_col,
        text_col=text_col,
        quality_cut=quality_cut,
        dup_col="_idup",
    )


def merge_data_cards(*cards: DataFrame) -> DataFrame:
    """Fold data-card reports into one — every mass column is an exact
    integer sum, so cards are ASSOCIATIVE: card(old) ⊕
    card_incremental(batch vs index(old)) == card(old ∪ batch), the
    identity the contract oracle pins. Derived columns (net masses,
    dup_rate_mils) are recomputed from the merged sums, never averaged.
    The fold is one metadata-scale groupBy over ≤ Σ|cells| rows."""
    merged = cards[0]
    for c in cards[1:]:
        merged = merged.unionByName(c)
    g = merged.groupBy("source", "lang", "quality_bucket").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("n_dup_docs").cast("long").alias("n_dup_docs"),
        F.sum("dup_tokens").cast("long").alias("dup_tokens"),
    )
    return g.select(
        "source",
        "lang",
        "quality_bucket",
        "n_docs",
        "n_tokens",
        "n_dup_docs",
        "dup_tokens",
        (F.col("n_docs") - F.col("n_dup_docs"))
        .cast("long")
        .alias("net_docs"),
        (F.col("n_tokens") - F.col("dup_tokens"))
        .cast("long")
        .alias("net_tokens"),
        # integer DIV for the same bit-reproducibility reason as
        # data_card: no double product ahead of the floor
        F.expr("n_dup_docs * 1000 DIV n_docs")
        .cast("long")
        .alias("dup_rate_mils"),
    )


def epoch_shuffle(
    df: DataFrame,
    n_shards: int = 64,
    epoch: int = 0,
    id_col: str = "doc_id",
    order_col: str | None = None,
) -> DataFrame:
    """Deterministic per-epoch global shuffle into training shards —
    the last-mile ordering step of a training-data pipeline: trainers
    read shard files in ``seq`` order, and re-running the pipeline (or
    re-ingesting a doc) reproduces the exact same order, unlike
    ``rand()``-keyed shuffles. Bumping ``epoch`` re-keys the hash, so
    each epoch is a fresh, equally reproducible permutation ("reshuffle
    every epoch" semantics without state).

    Output: ``df`` plus ``shard`` (md5-60bit of ``'ep{epoch}|id'`` mod
    ``n_shards``) and ``seq`` (1-based position within the shard,
    ordered by the same hash with the id as tie-break).

    ``order_col`` prepends a CURRICULUM key to the within-shard order
    (e.g. a quality/difficulty score, or a length column to batch
    similar lengths together and cut padding waste): rows sort by
    (``order_col``, hash, id) inside each shard, so every shard streams
    the curriculum while shard ASSIGNMENT — and therefore cross-shard
    balance — stays the pure hash permutation.

    Scale shape: one shuffle, keyed by ``shard`` — exactly the physical
    layout the written artifact needs, so the sort is per-shard
    (``n_shards`` independent tasks, each sorting corpus/n_shards rows),
    never a global order. Pick ``n_shards`` so a shard fits a task
    (at 100 TB: tens of thousands), then write with
    :func:`write_epoch_shards` to keep the layout on disk."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"ep{epoch}|"), F.col(id_col).cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    out = df.withColumn("_h", h).withColumn(
        "shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int")
    )
    order = [F.col("_h"), F.col(id_col)]
    if order_col is not None:
        order.insert(0, F.col(order_col))
    w = Window.partitionBy("shard").orderBy(*order)
    return out.withColumn(
        "seq", F.row_number().over(w).cast("bigint")
    ).drop("_h")


def write_epoch_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 64,
    epoch: int = 0,
    id_col: str = "doc_id",
) -> None:
    """Materialize :func:`epoch_shuffle` as the on-disk training layout:
    parquet partitioned by ``shard``, rows within each shard file in
    ``seq`` order (``repartition(shard)`` + ``sortWithinPartitions`` —
    parquet preserves row order within a file, so a trainer streaming
    one shard directory reads the epoch's sequence with zero further
    sorting)."""
    shuffled = epoch_shuffle(df, n_shards=n_shards, epoch=epoch, id_col=id_col)
    (
        shuffled.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "seq")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def temperature_mix(
    df: DataFrame,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    docs_per_sqrt: int = 3,
) -> DataFrame:
    """Temperature-weighted corpus mixing at T=0.5: each stratum's quota
    is ``docs_per_sqrt * floor(sqrt(n_stratum))`` (capped at the stratum
    size), so over-represented strata are down-weighted relative to rare
    ones — the multilingual-training rebalancing move, made reproducible.

    Integer-exact on purpose: ``floor(sqrt(n))`` of an integer-valued
    double is deterministic across engines (IEEE sqrt is correctly
    rounded, and the floor boundary only lands on perfect squares, where
    sqrt is exact) — no normalized-probability double whose last-ulp
    difference could flip a quota. Selection within a stratum reuses the
    (md5(id), id) order of :func:`stratified_take`; the per-stratum
    stats side is tiny (|strata| rows) and broadcasts."""
    quotas = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_stratum"),
        F.least(
            F.count(F.lit(1)),
            (
                F.floor(F.sqrt(F.count(F.lit(1)).cast("double")))
                * docs_per_sqrt
            ).cast("bigint"),
        ).alias("quota"),
    )
    w = Window.partitionBy(strata_col).orderBy(md5_hex(F.col(id_col)), F.col(id_col))
    return (
        df.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .join(F.broadcast(quotas), strata_col)
        .where(F.col("rk") <= F.col("quota"))
        .select(id_col, strata_col, "rk", "quota")
    )


def table_profile(
    df: DataFrame,
    cols: list[str] | None = None,
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """Single-pass data-quality profile: row count plus per-column null
    and distinct counts — the validation gate a training pipeline runs
    before accepting an ingestion batch. ``extra_aggs`` lets callers ride
    their own checks on the same scan. One aggregation job; distinct
    counts expand to Catalyst's multi-distinct rewrite (still one pass
    over the data, no per-column scans)."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("int")).cast("bigint").alias(f"{c}_nulls")
        )
        aggs.append(F.countDistinct(c).alias(f"{c}_distinct"))
    return df.agg(*aggs, *(extra_aggs or []))


def pack_sequences(
    df: DataFrame,
    weight_col: str = "n_chars",
    budget: int = 2000,
    strata_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing: assign documents to fixed-budget bins (training
    batches) by next-fit over a deterministic order — pack boundaries fall
    where the exclusive running weight crosses a budget multiple.

    ``pack_id = floor(exclusive_cumsum(weight) / budget)`` per stratum:
    a pure window cumsum, so packing parallelizes per stratum and is
    reproducible across reruns/partitionings (same property as
    ``hash_split``). A bin can exceed budget by at most one document —
    the standard next-fit bound; callers that need hard caps split
    oversized docs upstream. Adds ``pack_id``."""
    w = (
        Window.partitionBy(strata_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    excl_cumsum = F.sum(weight_col).over(w) - F.col(weight_col)
    return df.withColumn(
        "pack_id", F.floor(excl_cumsum / F.lit(budget)).cast("bigint")
    )


def pack_fill_report(
    df: DataFrame,
    weight_col: str = "n_chars",
    budget: int = 2000,
    strata_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Packing-efficiency report over :func:`pack_sequences` bins — the
    batch-assembly diagnostic a trainer reads before committing to a
    budget (underfilled bins are padding = wasted FLOPs; the next-fit
    overshoot bound shows up as max_pack above budget). One row per
    stratum: (stratum, n_packs, n_docs, total_weight, fill_mils,
    min_pack, max_pack) — fill_mils = total·1000 // (n_packs·budget),
    integer thousandths.

    Scale shape: pack_sequences' per-stratum window (never a global
    sort), one (stratum, pack) aggregate, then a metadata-scale
    groupBy to ≤ |strata| rows."""
    packed = pack_sequences(df, weight_col, budget, strata_col, order_col)
    per_pack = packed.groupBy(strata_col, "pack_id").agg(
        F.count(F.lit(1)).cast("long").alias("_docs"),
        F.sum(weight_col).cast("long").alias("_w"),
    )
    g = per_pack.groupBy(strata_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_packs"),
        F.sum("_docs").cast("long").alias("n_docs"),
        F.sum("_w").cast("long").alias("total_weight"),
        F.min("_w").cast("long").alias("min_pack"),
        F.max("_w").cast("long").alias("max_pack"),
    )
    return g.select(
        strata_col,
        "n_packs",
        "n_docs",
        "total_weight",
        F.expr(f"total_weight * 1000 DIV (n_packs * {int(budget)})").alias(
            "fill_mils"
        ),
        "min_pack",
        "max_pack",
    )


def chunk_text(
    df: DataFrame,
    chunk_chars: int = 200,
    overlap: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-size overlapping character chunks
    (the embedding-pipeline windowing step). ``n_chunks = max(1,
    ceil((len - overlap) / stride))`` with ``stride = chunk_chars -
    overlap``; chunk *i* covers ``[i*stride, i*stride + chunk_chars)``,
    so consecutive chunks share ``overlap`` chars and the tail chunk may
    run short. Pure sequence + substr projection — per-row fanout with
    no shuffle; a 100 TB corpus chunks map-side."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    stride = chunk_chars - overlap
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.length(F.col(text_col)) - F.lit(overlap)) / F.lit(float(stride))),
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.col(text_col).substr(i * stride + 1, F.lit(chunk_chars)),
    )
    return df.select(
        F.col(id_col),
        # outer: n_chunks >= 1 always, and the non-outer form's inferred
        # size()>0 filter re-ran the whole chunk transform at the scan
        F.posexplode_outer(chunks).alias("chunk_id", "chunk"),
    ).select(
        id_col,
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        "chunk",
        F.length("chunk").cast("bigint").alias("n_chars"),
    )


def bigram_counts(
    df: DataFrame,
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """(bigram, n) counts over space-separated text — the n-gram mining
    primitive under phrase heavy-hitters and contamination checks.

    The adjacent-pair construction is a single JVM-side array expression:
    zip_with over the array against its own 1-shifted slice. (The
    index-sequence form — transform(sequence(1, n-1), i ->
    element_at(toks, i) ...) — inlines the split per element access and
    measured 2.5× slower; the slice form touches the array a constant
    number of times per row.) No posexplode self-join, so the only
    shuffle is the final count aggregation, which Catalyst runs
    partial-then-final (the 100 TB-safe shape: map-side combine shrinks
    the exchange to the distinct-bigram cardinality)."""
    toks = F.split(F.col(text_col), sep)
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.explode_outer(pairs).alias("bigram"))
        .where(F.col("bigram").isNotNull())
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def topk_bigrams(df: DataFrame, k: int = 20, text_col: str = "text") -> DataFrame:
    """Global top-k bigrams with deterministic (n desc, bigram asc)
    tiebreak — TakeOrderedAndProject at scale, never a full sort."""
    return bigram_counts(df, text_col).orderBy(
        F.desc("n"), F.asc("bigram")
    ).limit(k)


def upsample_corpus(
    df: DataFrame,
    weights_milli: dict[str, int],
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic FRACTIONAL upsampling to hit mixture weights — the
    repeat-rare-sources move of a training-data mix (e.g. weight 2.5 ⇒
    every row twice, half the rows a third time). ``weights_milli`` maps
    stratum → weight in thousandths (2500 = 2.5×); strata absent from
    the map pass through at weight 1.0.

    Each row's copy count is ``floor(w) + (h·1000 < 2^60·frac)`` with h
    the row's 60-bit md5 hash — the exact-integer cross-multiplication
    of :func:`weighted_sample`, so the fractional extra copy is a
    reproducible per-row property (same rows get the extra epoch on any
    rerun, engine, or partitioning — no rand(), no coordination), and
    expected stratum volume is exactly n·w/1000. Returns the id/stratum
    with ``epoch`` = 1..copies (``posexplode`` of a ``sequence`` — the
    only cost is the output's own size; nothing shuffles).
    """
    w_map = F.create_map(
        *[
            x
            for k, v in sorted(weights_milli.items())
            for x in (F.lit(k), F.lit(int(v)))
        ]
    ) if weights_milli else F.create_map()
    wm = F.coalesce(
        w_map[F.col(strata_col)] if weights_milli else F.lit(None),
        F.lit(1000),
    ).cast("bigint")
    frac = wm % 1000
    h = hash_uniform60(F.col(id_col))
    extra = (
        (h * F.lit(1000).cast("decimal(38,0)"))
        < (F.lit(HASH60_MAX).cast("decimal(38,0)") * frac)
    ).cast("bigint")
    copies = F.floor(wm / 1000).cast("bigint") + extra
    # weight < 1.0 downsamples: copies can be 0, and Spark's sequence(1, 0)
    # would DESCEND ([1, 0]) — guard with an empty array so the row drops
    seq = F.when(
        copies >= 1, F.sequence(F.lit(1).cast("bigint"), copies)
    ).otherwise(F.expr("cast(array() as array<bigint>)"))
    return df.select(
        id_col, strata_col, F.explode(seq).alias("epoch")
    )


# ------------------------------------------------------------------ DSIR


def _hashed_gram_features(
    df: DataFrame, n_buckets: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, feature) — one row per non-empty unigram AND adjacent
    bigram, hashed into ``n_buckets`` via the portable md5-60bit trick
    (the classifier_score feature map, extended with the paper's bigram
    stream). Bigrams are the zip-against-own-shifted-slice expression of
    :func:`bigram_counts` — a constant number of array touches per row,
    never the per-element re-split HOF."""
    from hadoop_invertedindexer_spark.operators.dedup import token_array
    from hadoop_invertedindexer_spark.sources.tables import spread_partitions

    base = spread_partitions(df, id_col).select(
        F.col(id_col),
        F.filter(token_array(text_col), lambda t: t != "").alias("_tk"),
    )
    n = F.size(F.col("_tk"))
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(F.col("_tk"), 1, n - 1),
            F.slice(F.col("_tk"), 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.expr("cast(array() as array<string>)"))
    return base.select(
        id_col, F.explode_outer(F.concat(F.col("_tk"), bigrams)).alias("g")
    ).where(F.col("g").isNotNull()).select(
        id_col,
        F.pmod(
            F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("bigint"),
            F.lit(n_buckets),
        )
        .cast("int")
        .alias("feature"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int = 100,
    n_buckets: int = 1024,
    seed: str = "dsir",
    gumbel: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
    pick the ``k`` raw-pool documents that look most like a small target
    corpus, using hashed-n-gram bag-of-words importance weights. This is
    the data-SELECTION family next to the quality scorers: corpus_filter
    drops garbage, classifier_score ranks by a trained quality model,
    DSIR matches a *distribution* (e.g. "select web pages that look like
    Wikipedia") without training anything.

    Math, exactly the paper's feature-space estimator: unigram+bigram
    features hashed into ``n_buckets``; bucket probabilities with
    Laplace smoothing ``p(b) = (c_b + 1) / (total + n_buckets)`` on each
    side; a document's log importance weight is ``Σ_b c_b·(ln p_tgt(b) −
    ln p_raw(b))``. Selection is the paper's Gumbel top-k trick
    (sampling without replacement ∝ exp(logw)): per-doc Gumbel noise
    ``−ln(−ln u)`` with ``u`` derived from the 60-bit md5 of
    ``seed|id`` — fully deterministic given ``seed``, reproducible on
    any partitioning, and exactly restatable in ANSI SQL.
    ``gumbel=False`` degrades to plain top-k by weight. Returns
    (id, n_grams, logw, sel_key), both floats round(6), ordered by
    (sel_key desc, id asc) — the rank key is part of the output so the
    cut is auditable.

    Scale shape: BOTH bucket-count tables are capped at ``n_buckets``
    rows — the model (a ``lr`` log-ratio vector) is built from two
    partial-aggregated groupBys plus one-row totals, then BROADCAST into
    the scoring join, so the raw corpus pays one gram explode (persisted
    — it feeds both the raw-side counts and the per-doc features), one
    (doc, feature) groupBy, one per-doc sum, and a TakeOrderedAndProject
    top-k. No global sort, no doc×doc or doc×vocab join; the target side
    is typically tiny and pays the same capped pipeline.
    """
    from hadoop_invertedindexer_spark.caching import tracked_persist

    spark = raw.sparkSession
    nb = int(n_buckets)
    tf = _hashed_gram_features(target, nb, id_col, text_col)
    rf = tracked_persist(
        _hashed_gram_features(raw, nb, id_col, text_col)
    )  # two consumers: raw-side bucket counts + per-doc features
    tc = tf.groupBy("feature").agg(F.count(F.lit(1)).alias("ct"))
    rc = rf.groupBy("feature").agg(F.count(F.lit(1)).alias("cr"))
    buckets = spark.range(nb).select(F.col("id").cast("int").alias("feature"))
    model = tracked_persist(
        buckets.join(tc, "feature", "left")
        .join(rc, "feature", "left")
        .select(
            "feature",
            F.coalesce("ct", F.lit(0)).cast("bigint").alias("ct"),
            F.coalesce("cr", F.lit(0)).cast("bigint").alias("cr"),
        )
    )  # n_buckets rows, two consumers (totals + log-ratio projection):
    # unpersisted, each would re-run the TARGET-side gram pipeline
    tots = model.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )  # one-row aggregate of an n_buckets-row frame
    lrm = model.crossJoin(F.broadcast(tots)).select(
        "feature",
        (
            F.log((F.col("ct") + F.lit(1.0)) / (F.col("tt") + F.lit(float(nb))))
            - F.log((F.col("cr") + F.lit(1.0)) / (F.col("tr") + F.lit(float(nb))))
        ).alias("lr"),
    )
    return _dsir_score(rf, lrm, k, seed, gumbel, id_col)


def _dsir_score(
    feats: DataFrame,
    lrm: DataFrame,
    k: int,
    seed: str,
    gumbel: bool,
    id_col: str,
) -> DataFrame:
    """Score a (id, feature) stream against a log-ratio model and take
    the Gumbel (or plain) top-k — the shared tail of the direct and
    persisted-model DSIR paths."""
    docf = feats.groupBy(id_col, "feature").agg(F.count(F.lit(1)).alias("c"))
    scored = docf.join(F.broadcast(lrm), "feature").groupBy(id_col).agg(
        F.sum("c").cast("bigint").alias("n_grams"),
        F.sum(F.col("c") * F.col("lr")).alias("_logw"),
    )
    if gumbel:
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed + "|"), F.col(id_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        u = (h.cast("double") + F.lit(0.5)) / F.lit(float(HASH60_MAX))
        key = F.col("_logw") + (-F.log(-F.log(u)))
    else:
        key = F.col("_logw")
    return (
        scored.select(
            id_col,
            "n_grams",
            F.round("_logw", 6).alias("logw"),
            F.round(key, 6).alias("sel_key"),
        )
        .orderBy(F.desc("sel_key"), F.asc(id_col))
        .limit(int(k))
    )


def build_dsir_model(
    raw: DataFrame,
    target: DataFrame,
    path: str,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the DSIR log-ratio model — the selection family's member
    of the engine's persisted-index trio pattern: both distributions are
    estimated ONCE (one pass over each corpus), and every future ingest
    batch is scored against the stored ``n_buckets``-row table without
    re-reading either estimation corpus. Layout: ``model/`` holds
    (feature, lr), ``params/`` pins n_buckets so batch features can
    never be hashed into a different space than the stored model."""
    from hadoop_invertedindexer_spark.caching import tracked_persist

    spark = raw.sparkSession
    nb = int(n_buckets)
    tf = _hashed_gram_features(target, nb, id_col, text_col)
    rf = _hashed_gram_features(raw, nb, id_col, text_col)
    tc = tf.groupBy("feature").agg(F.count(F.lit(1)).alias("ct"))
    rc = rf.groupBy("feature").agg(F.count(F.lit(1)).alias("cr"))
    buckets = spark.range(nb).select(F.col("id").cast("int").alias("feature"))
    model = tracked_persist(
        buckets.join(tc, "feature", "left")
        .join(rc, "feature", "left")
        .select(
            "feature",
            F.coalesce("ct", F.lit(0)).cast("bigint").alias("ct"),
            F.coalesce("cr", F.lit(0)).cast("bigint").alias("cr"),
        )
    )
    tots = model.agg(F.sum("ct").alias("tt"), F.sum("cr").alias("tr"))
    # counts ride along with lr: the health metrics
    # (dsir_model_divergence) read them back without ever touching the
    # estimation corpora again
    model.crossJoin(F.broadcast(tots)).select(
        "feature",
        "ct",
        "cr",
        (
            F.log((F.col("ct") + F.lit(1.0)) / (F.col("tt") + F.lit(float(nb))))
            - F.log((F.col("cr") + F.lit(1.0)) / (F.col("tr") + F.lit(float(nb))))
        ).alias("lr"),
    ).write.mode("overwrite").parquet(f"{path}/model")
    spark.createDataFrame([(nb,)], "n_buckets int").write.mode(
        "overwrite"
    ).parquet(f"{path}/params")


def dsir_select_incremental(
    spark,
    batch: DataFrame,
    path: str,
    k: int = 100,
    seed: str = "dsir",
    gumbel: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score an ingest batch against a PERSISTED DSIR model and take
    the top-k — the daily-ingest posture of :func:`dsir_select`: the
    stored log-ratio table (``n_buckets`` rows, broadcast) is the whole
    model, so per-batch cost is one gram explode + one (doc, feature)
    groupBy + one per-doc sum + TakeOrderedAndProject; neither
    estimation corpus is ever re-read. Scoring the model's own raw pool
    reproduces :func:`dsir_select` exactly (pinned by test and by the
    shared contract oracle). Note the k-cut is batch-LOCAL — selection
    quotas across batches are the caller's mixture policy."""
    p = spark.read.parquet(f"{path}/params").head()
    lrm = spark.read.parquet(f"{path}/model")
    feats = _hashed_gram_features(batch, p.n_buckets, id_col, text_col)
    return _dsir_score(feats, lrm, k, seed, gumbel, id_col)


def maintain_dsir_model(
    spark,
    path: str,
    dest_path: str,
    batch: DataFrame,
    target: DataFrame,
    raw: DataFrame | None = None,
    max_kl_batch_mils: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Staleness-triggered model rebuild (r12) — the selection family's
    member of the maintenance-loop pattern (``maintain_index_tier``,
    ``maintain_ivf_index``, ``maintain_bpe_model``):
    :func:`dsir_model_divergence` is the trigger,
    :func:`build_dsir_model` the remediation. Reads the stored model's
    one-row health report with today's ``batch`` attached; when the
    smoothed KL(batch‖raw) crosses ``max_kl_batch_mils``/1000 — the
    stored raw distribution no longer describes what is being scored —
    rebuilds the model into ``dest_path`` from ``raw`` (default: the
    batch itself, i.e. re-estimate the raw side from today's stream)
    against the caller's ``target``, at the STORED n_buckets (a rebuild
    that silently re-sized the hash space would orphan every cached
    feature). One row: the divergence report as measured (the evidence)
    + a ``rebuilt`` flag —

        (n_buckets, n_target_buckets, n_raw_buckets, kl_target_raw,
         max_abs_lr, kl_batch_raw, rebuilt)

    Below threshold NOTHING is written (``dest_path`` stays absent);
    after a triggered rotation the caller swaps its pointer, the same
    contract as every other tier. In-place guard: realpath for local
    symlinks plus Hadoop FileSystem qualification for remote URIs
    (``fsutil.guard_rotation``, r13).

    Scale shape: the decision reads one metadata-scale row (model is
    ``n_buckets`` rows; the only corpus-sized work is the batch's gram
    pass the divergence probe already pays); the rebuild is
    :func:`build_dsir_model`'s one pass over each estimation corpus."""
    from hadoop_invertedindexer_spark.fsutil import guard_rotation

    guard_rotation(spark, path, dest_path, "DSIR model rebuild")
    stats = dsir_model_divergence(spark, path, batch, id_col, text_col).head()
    # NULL staleness (empty batch / degenerate model) is no evidence of
    # drift — report rebuilt=False instead of TypeError (ADVICE r12),
    # matching maintain_ivf_index and maintain_bpe_model's empty probes.
    rebuilt = (
        stats.kl_batch_raw is not None
        and stats.kl_batch_raw * 1000 > max_kl_batch_mils
    )
    if rebuilt:
        p = spark.read.parquet(f"{path}/params").head()
        build_dsir_model(
            raw if raw is not None else batch,
            target,
            dest_path,
            n_buckets=int(p.n_buckets),
            id_col=id_col,
            text_col=text_col,
        )
    return spark.createDataFrame(
        [
            (
                stats.n_buckets,
                stats.n_target_buckets,
                stats.n_raw_buckets,
                stats.kl_target_raw,
                stats.max_abs_lr,
                stats.kl_batch_raw,
                rebuilt,
            )
        ],
        "n_buckets INT, n_target_buckets BIGINT, n_raw_buckets BIGINT,"
        " kl_target_raw DOUBLE, max_abs_lr DOUBLE, kl_batch_raw DOUBLE,"
        " rebuilt BOOLEAN",
    )


def dsir_model_divergence(
    spark,
    path: str,
    batch: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One-row health report of a persisted DSIR model — the selection
    family's analogue of ``ivf_index_drift``: everything derives from
    the STORED (feature, ct, cr) table (plus one batch pass when
    ``batch`` is given); the estimation corpora are never re-read.

    Columns: bucket coverage on each side (``n_target_buckets`` /
    ``n_raw_buckets`` — collapsing coverage means the hash space is too
    big or an estimation corpus was thin), ``kl_target_raw`` — the
    smoothed KL(target‖raw) the importance weights are worth (≈0 means
    DSIR has nothing to select on), and ``max_abs_lr`` — the clipping
    radar for extreme per-bucket weights. With ``batch``,
    ``kl_batch_raw`` adds the staleness signal: the smoothed
    KL(batch‖raw) between today's ingest and the stored raw
    distribution — when it climbs, the stored model no longer describes
    what is being scored, and ``build_dsir_model`` should be re-run (the
    rebuild-trigger pattern of the IVF drift probe). Floats round(6).
    """
    p = spark.read.parquet(f"{path}/params").head()
    nb = int(p.n_buckets)
    m = spark.read.parquet(f"{path}/model")
    if batch is not None:
        bc = (
            _hashed_gram_features(batch, nb, id_col, text_col)
            .groupBy("feature")
            .agg(F.count(F.lit(1)).alias("cb"))
        )
        m = m.join(bc, "feature", "left").withColumn(
            "cb", F.coalesce("cb", F.lit(0)).cast("bigint")
        )
    tots = m.agg(
        F.sum("ct").alias("tt"),
        F.sum("cr").alias("tr"),
        *([F.sum("cb").alias("tb")] if batch is not None else []),
    )
    j = m.crossJoin(F.broadcast(tots))
    pt = (F.col("ct") + F.lit(1.0)) / (F.col("tt") + F.lit(float(nb)))
    pr = (F.col("cr") + F.lit(1.0)) / (F.col("tr") + F.lit(float(nb)))
    cols = [
        F.lit(nb).cast("int").alias("n_buckets"),
        F.sum((F.col("ct") > 0).cast("int")).cast("bigint").alias(
            "n_target_buckets"
        ),
        F.sum((F.col("cr") > 0).cast("int")).cast("bigint").alias(
            "n_raw_buckets"
        ),
        F.round(F.sum(pt * (F.log(pt) - F.log(pr))), 6).alias(
            "kl_target_raw"
        ),
        F.round(F.max(F.abs("lr")), 6).alias("max_abs_lr"),
    ]
    if batch is not None:
        pb = (F.col("cb") + F.lit(1.0)) / (F.col("tb") + F.lit(float(nb)))
        cols.append(
            F.round(F.sum(pb * (F.log(pb) - F.log(pr))), 6).alias(
                "kl_batch_raw"
            )
        )
    return j.agg(*cols)
