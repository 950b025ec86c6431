"""Incremental maintenance of the inverted index itself.

The reference recomputes its index with one full batch job per run
(``/root/reference/src/InvertedIndexer.java:259-261``). Because the
index's aggregate — count per (word, doc) — is associative, the engine
maintains it as a streaming materialized view instead: each arriving
document batch is tokenized with the exact reference pipeline
(``functions/textprep.py``) and its PARTIAL counts appended to a
batch-keyed tier; readers re-sum. Ingesting a batch costs O(batch),
never O(corpus) — the same partial/merge design as
``streaming/events.py:maintain_hourly_tier`` and the batch-side
``operators/index.py:merge_term_doc_counts``, applied to the flagship.

Idempotency: overwriting ``batch=<id>`` makes foreachBatch's
at-least-once replay replace its own partials instead of double
counting. Compaction (``sources/sinks.py:compact_parquet``) bounds the
partial count; a full re-sort/re-bucket (``retrieval.build_term_index``)
turns the tier into the serving index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_invertedindexer_spark.functions.textprep import prepare_tokens
from hadoop_invertedindexer_spark.operators.index import term_doc_counts


def maintain_term_index(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    tier_path: str,
    checkpoint_dir: str,
    stopwords: list[str] | None = None,
    doc_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 1,
) -> None:
    """Drain new document files with availableNow; append each batch's
    partial (word, doc, count) aggregate under ``batch=<id>``. Stream
    scaffolding shared with the event tiers
    (:func:`~hadoop_invertedindexer_spark.streaming.events.run_tier_maintenance`)."""
    from hadoop_invertedindexer_spark.streaming.events import run_tier_maintenance

    def _append_partials(batch_df: DataFrame, batch_id: int) -> None:
        toks = prepare_tokens(
            batch_df.select(doc_col, F.col(text_col).alias("line")),
            stopwords=stopwords,
        )
        counts = term_doc_counts(toks, word_col="word", doc_col=doc_col)
        counts.write.mode("overwrite").parquet(f"{tier_path}/batch={batch_id}")

    run_tier_maintenance(
        spark, source_dir, source_schema, checkpoint_dir,
        _append_partials, max_files_per_trigger,
    )


def retract_documents(
    spark: SparkSession,
    docs: DataFrame,
    tier_path: str,
    batch_key: str,
    stopwords: list[str] | None = None,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Remove documents from the index WITHOUT touching existing
    partials: append their counts NEGATED under ``batch=<batch_key>``.
    Re-summing then nets the doc's postings to zero and the reader drops
    them — deletion stays O(deleted docs), append-only, and idempotent
    per batch key (overwrite replaces a replayed retraction).

    Requires the retracted text verbatim (the tier stores aggregates,
    not text); re-tokenizing it with the same pipeline guarantees the
    negation matches the original insertion exactly."""
    toks = prepare_tokens(
        docs.select(doc_col, F.col(text_col).alias("line")), stopwords=stopwords
    )
    counts = term_doc_counts(toks, word_col="word", doc_col=doc_col)
    counts.withColumn("count", -F.col("count")).write.mode("overwrite").parquet(
        f"{tier_path}/batch={batch_key}"
    )


def compact_term_index_tier(
    spark: SparkSession, tier_path: str, doc_col: str = "doc_id"
) -> None:
    """Fold all accumulated partials (including retractions) into one
    ``batch=compacted`` partition, bounding tier growth. The fold is the
    same re-sum the reader does, so serving is unchanged before/after
    (asserted in tests); zero-net postings are dropped for good. Runs as
    a maintenance job between ingest drains — not concurrently with one
    (parquet has no snapshot isolation; same caveat as
    ``operators/maintenance.py``).

    Crash-safe ordering: the folded result is written DURABLY to a
    staging directory while the old tier is still intact; only then is
    the tier swapped (delete + rename). A crash before the swap leaves
    the tier untouched (orphan staging is overwritten on retry); a crash
    between delete and rename loses no data — the full fold sits in
    ``<tier>.compacting`` for manual rename. Deleting the tier first and
    writing after would destroy the only copy on any mid-write failure."""
    staging = f"{tier_path.rstrip('/')}.compacting"
    read_term_index_tier(spark, tier_path, doc_col).write.mode(
        "overwrite"
    ).parquet(f"{staging}/batch=compacted")
    swap_tier_dir(spark, staging, tier_path)


def swap_tier_dir(spark: SparkSession, staging: str, tier_path: str) -> None:
    """Crash-safe tier swap via the Hadoop FileSystem API (so the
    semantics hold for hdfs://s3a:// URIs, not just local paths):
    delete the live tier, rename the durably-written staging dir into
    its place, refresh the catalog. Shared by every streaming-side
    compactor (term-index fold, window-hash fold)."""
    jvm = spark.sparkContext._jvm
    root = jvm.org.apache.hadoop.fs.Path(tier_path)
    fs = root.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    # Hadoop FileSystem reports many failures via a false return instead of
    # an exception; an unchecked false here would leave the tier silently
    # missing (data intact only in the staging dir). Fail loudly, naming
    # the staging path so an operator can finish the swap by hand.
    if not fs.delete(root, True) and fs.exists(root):
        raise IOError(
            f"swap_tier_dir: delete({tier_path}) returned false; "
            f"folded tier preserved at {staging}"
        )
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(staging), root):
        raise IOError(
            f"swap_tier_dir: rename({staging} -> {tier_path}) "
            f"returned false; folded tier preserved at {staging}"
        )
    spark.catalog.refreshByPath(tier_path)


def read_term_index_tier(
    spark: SparkSession, tier_path: str, doc_col: str = "doc_id"
) -> DataFrame:
    """Serve the index from the tier: re-sum the partials (associative, so
    equal to a from-scratch build — asserted in tests). Postings netted
    to zero by retractions are dropped; a negative net (double retract /
    retract-before-insert misuse) raises on read rather than serving a
    corrupt index."""
    summed = (
        spark.read.parquet(tier_path)
        .groupBy("word", doc_col)
        .agg(F.sum("count").alias("count"))
    )
    assert_ok = F.when(
        F.col("count") < 0, F.raise_error(F.lit("negative net posting count"))
    ).otherwise(F.col("count"))
    return summed.where(F.col("count") != 0).select(
        "word", doc_col, assert_ok.cast("bigint").alias("count")
    )


_CARD_COLS = [
    "source", "lang", "quality_bucket", "n_docs", "n_tokens",
    "n_dup_docs", "dup_tokens", "net_docs", "net_tokens",
    "dup_rate_mils",
]


def maintain_data_card(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    card_path: str,
    checkpoint_dir: str,
    stopwords: list[str],
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_cut: float = 0.5,
    max_files_per_trigger: int = 1,
) -> None:
    """Streaming data-card maintenance (r10) — the e2e composition of
    the exact-hash index tiers and the O(batch) incremental card: each
    micro-batch of newly published documents (1) cards itself against
    the hashes of everything published in EARLIER batches, (2) writes
    that card as an idempotent ``cards/batch=<id>`` tier, and
    (3) appends its own distinct hashes as a ``hashes/batch=<id>``
    tier. :func:`read_data_card` folds the card tiers into the exact
    full-corpus card (``merge_data_cards`` associativity), equal to a
    one-shot ``data_card`` over everything published when files arrive
    in id order — pinned by test.

    Replay idempotency: the card computation filters the hash tiers to
    ``batch < batch_id``, so a re-run after a crash BETWEEN the two
    writes still computes the same card (its own possibly-landed hash
    tier is invisible to it), and both writes overwrite their own tier.
    The ``hashes/`` layout is byte-compatible with
    ``dedup.dedup_exact_incremental`` / ``maintain_exact_index`` — one
    artifact can serve both the dedup probe and the card."""
    from pyspark.sql.utils import AnalysisException

    from hadoop_invertedindexer_spark.operators.dedup import (
        normalized_text,
    )
    from hadoop_invertedindexer_spark.operators.sampling import (
        _data_card_against_hashes,
    )
    from hadoop_invertedindexer_spark.streaming.events import (
        run_tier_maintenance,
    )

    def _per_batch(batch_df: DataFrame, batch_id: int) -> None:
        try:
            idx = spark.read.parquet(f"{card_path}/hashes").where(
                F.col("batch") < batch_id
            )
        except AnalysisException:  # first batch: no tiers yet
            idx = spark.createDataFrame([], "h string")
        card = _data_card_against_hashes(
            batch_df, idx, stopwords,
            source_col=source_col, id_col=id_col,
            text_col=text_col, quality_cut=quality_cut,
        )
        card.write.mode("overwrite").parquet(
            f"{card_path}/cards/batch={batch_id}"
        )
        batch_df.select(
            F.sha2(normalized_text(text_col), 256).alias("h")
        ).distinct().write.mode("overwrite").parquet(
            f"{card_path}/hashes/batch={batch_id}"
        )

    run_tier_maintenance(
        spark, source_dir, source_schema, checkpoint_dir,
        _per_batch, max_files_per_trigger,
    )


def read_data_card(spark: SparkSession, card_path: str) -> DataFrame:
    """Fold the maintained ``cards/batch=<id>`` tiers into the current
    full-corpus data card — one metadata-scale groupBy over ≤ Σ|cells|
    rows (``merge_data_cards``; the ``batch`` partition column is
    dropped by the projection)."""
    from hadoop_invertedindexer_spark.operators.sampling import (
        merge_data_cards,
    )

    tiers = spark.read.parquet(f"{card_path}/cards").select(*_CARD_COLS)
    return merge_data_cards(tiers)
