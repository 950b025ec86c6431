"""Streaming ingestion for the persisted MinHash near-dup index.

The batch path (``operators/dedup.py:build_minhash_index`` /
``append_minhash_index``) assumes someone calls it per ingest day; this
module is the continuous form: a document file stream drained with
``availableNow``, each micro-batch's signatures and banded keys written
as an idempotent ``batch=<id>`` tier — the same
overwrite-your-own-batch contract as the inverted-index tier
(``streaming/index_maintenance.py``) and the hourly rollups, applied to
the dedup signature store. ``minhash_index_pairs`` reads the tiered
layout unchanged (it selects columns, not layouts), so a nightly dedup
pass queries the same index the stream maintains.

At 100 TB: per micro-batch cost is O(batch) signature work + one tier
write; nothing ever rescans the corpus, and a foreachBatch replay
overwrites its own tier instead of double-inserting signatures. An
index root is maintained by ONE path — either the flat batch
build/append or this tiered stream — never both (mixing flat files and
``batch=`` directories under one root breaks partition discovery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadoop_invertedindexer_spark.operators.dedup import (
    _banded_signatures,
    minhash_signatures,
)


def init_minhash_index(
    spark: SparkSession,
    path: str,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    portable: bool = False,
) -> None:
    """Write the pinned params table of a (possibly still empty) MinHash
    index — the streaming maintainer derives every batch's hashing from
    it, so signatures can never drift from the index contract."""
    spark.createDataFrame(
        [(num_perm, bands, n, portable)],
        "num_perm int, bands int, n int, portable boolean",
    ).write.mode("overwrite").parquet(f"{path}/params")


def maintain_minhash_signatures(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 1,
) -> None:
    """Drain new document files with availableNow; write each batch's
    (id, sig) signatures and (id, band, bh) banded keys under
    ``batch=<id>`` tiers of the index. Stream scaffolding shared with
    the event/index tiers (``streaming/events.py:run_tier_maintenance``)."""
    from hadoop_invertedindexer_spark.streaming.events import run_tier_maintenance

    p = spark.read.parquet(f"{index_path}/params").head()

    def _append_tier(batch_df: DataFrame, batch_id: int) -> None:
        sig = minhash_signatures(
            batch_df, p.num_perm, p.n, id_col, text_col, portable=p.portable
        ).persist()  # feeds both tier writes
        sig.write.mode("overwrite").parquet(
            f"{index_path}/signatures/batch={batch_id}"
        )
        _banded_signatures(
            sig, p.bands, p.num_perm // p.bands, p.portable
        ).write.mode("overwrite").parquet(f"{index_path}/banded/batch={batch_id}")
        sig.unpersist()

    run_tier_maintenance(
        spark, source_dir, source_schema, checkpoint_dir,
        _append_tier, max_files_per_trigger,
    )


def init_window_index(
    spark: SparkSession,
    path: str,
    n: int = 8,
) -> None:
    """Pinned params table of a (possibly still empty) window-hash
    index (r8): the streaming maintainer derives every batch's window
    length from it, so stored hashes can never drift from the
    decontamination contract."""
    spark.createDataFrame([(n,)], "n int").write.mode("overwrite").parquet(
        f"{path}/params"
    )


def maintain_stream_tier(
    spark: SparkSession,
    index_path: str,
    sub: str,
    key_col: str | list[str],
    max_dup_mils: int = 100,
) -> DataFrame:
    """The streaming tiers' maintenance loop (r13, VERDICT r12 ask 6)
    — ``operators/dedup.py:maintain_index_tier``'s two-phase shape
    (one metadata-scale trigger read → bulk rewrite + rotation)
    adapted to the tiered ``<sub>/batch=<id>`` layout every
    key-table stream maintainer writes (windows/sh, sentences/h,
    paragraphs/h, hashes/h, fps/(id, fp) — multi-column keys count
    and fold as whole rows), with the SAME report row:

        (tier_table, n_rows, n_distinct, dup_rows, dup_mils,
         compacted, reclaimed_rows)

    Two deliberate differences from the flat-path maintainer, both
    forced by the layout: (1) the trigger counts the KEY column only —
    the ``batch`` partition column is layout, not key, and a
    whole-row distinct would hide exactly the cross-tier duplicate
    keys this loop exists to reclaim; (2) the rotation folds the
    distinct keys into one ``batch=compacted`` tier and swaps it into
    place with the crash-safe staging order of
    ``compact_term_index_tier`` (durable staging write → delete →
    rename, via :func:`swap_tier_dir`) — the stream maintainer OWNS
    the root, so the pointer swap the flat contract leaves to the
    caller happens here, between tier writes. Probes read the swapped
    layout unchanged (they select the key column and ignore
    ``batch``); subsequent stream batches keep appending
    ``batch=<id>`` tiers beside the compacted one. External readers
    share the compact_term_index_tier caveat: parquet has no snapshot
    isolation, so don't race a probe against the swap itself."""
    from pyspark.sql import functions as F

    from hadoop_invertedindexer_spark.streaming.index_maintenance import (
        swap_tier_dir,
    )

    cols = [key_col] if isinstance(key_col, str) else list(key_col)
    tier = f"{index_path}/{sub}"
    keys = spark.read.parquet(tier).select(*cols)
    s = keys.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count_distinct(*[F.col(c) for c in cols])
        .cast("long")
        .alias("n_distinct"),
    ).head()
    dup_rows = int(s.n_rows - s.n_distinct)
    dup_mils = dup_rows * 1000 // s.n_rows if s.n_rows else 0
    compacted = dup_mils > max_dup_mils
    if compacted:
        staging = f"{tier}.compacting"
        keys.distinct().write.mode("overwrite").parquet(
            f"{staging}/batch=compacted"
        )
        swap_tier_dir(spark, staging, tier)
    return spark.createDataFrame(
        [
            (
                sub,
                s.n_rows,
                s.n_distinct,
                dup_rows,
                dup_mils,
                compacted,
                dup_rows if compacted else 0,
            )
        ],
        "tier_table STRING, n_rows BIGINT, n_distinct BIGINT,"
        " dup_rows BIGINT, dup_mils BIGINT, compacted BOOLEAN,"
        " reclaimed_rows BIGINT",
    )


def maintain_window_tier(
    spark: SparkSession,
    index_path: str,
    max_dup_mils: int = 100,
) -> DataFrame:
    """:func:`maintain_stream_tier` over the window-hash tier — the
    r13 exemplar wiring (see maintain_window_index's ``max_dup_mils``)."""
    return maintain_stream_tier(
        spark, index_path, "windows", "sh", max_dup_mils
    )


def maintain_window_index(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 1,
    max_dup_mils: int | None = None,
) -> None:
    """Continuous form of ``append_window_index`` (r8): drain new
    REFERENCE-corpus files (the eval/benchmark side) with availableNow
    and write each micro-batch's distinct window hashes as an
    idempotent ``batch=<id>`` tier under ``windows/``.
    ``decontaminate_substrings_incremental`` reads the tiered layout
    unchanged — partition discovery adds a ``batch`` column the semi
    join never looks at, and duplicate hashes across tiers are harmless
    to a semi probe. Same single-maintainer rule as the MinHash tiers:
    one root is maintained by EITHER the flat batch build/append OR
    this stream, never both.

    ``max_dup_mils`` (r13) closes the maintenance loop INSIDE the
    ingest path: after each tier write, :func:`maintain_window_tier`
    reads the one-row duplicate-mass trigger and — only over threshold
    — folds the distinct keys into a compacted tier and swaps it in
    before the next micro-batch lands. foreachBatch serializes the
    swap against subsequent appends, so ingest answers identically
    across an in-flight rotation (pinned by test). ``None`` (default)
    keeps the pre-r13 behavior: append-only, compaction left to an
    external schedule."""
    from hadoop_invertedindexer_spark.operators.dedup import _window_hashes
    from hadoop_invertedindexer_spark.streaming.events import run_tier_maintenance

    p = spark.read.parquet(f"{index_path}/params").head()

    def _append_tier(batch_df: DataFrame, batch_id: int) -> None:
        _window_hashes(batch_df, p.n, id_col, text_col).select(
            "sh"
        ).distinct().write.mode("overwrite").parquet(
            f"{index_path}/windows/batch={batch_id}"
        )
        if max_dup_mils is not None:
            maintain_window_tier(spark, index_path, max_dup_mils)

    run_tier_maintenance(
        spark, source_dir, source_schema, checkpoint_dir,
        _append_tier, max_files_per_trigger,
    )


def init_sentence_index(
    spark: SparkSession,
    path: str,
    span: int = 3,
) -> None:
    """Pinned params table of a (possibly still empty) sentence-span
    index (r10): the streaming maintainer derives every batch's span
    width from it, so stored keys can never drift from the dedup
    contract — the same drift guard the batch build writes."""
    spark.createDataFrame([(span,)], "span int").write.mode(
        "overwrite"
    ).parquet(f"{path}/params")


def maintain_sentence_index(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 1,
    max_dup_mils: int | None = None,
) -> None:
    """Continuous form of ``append_sentence_index`` (r10): drain newly
    PUBLISHED document files with availableNow and write each
    micro-batch's distinct sentence-span keys as an idempotent
    ``batch=<id>`` tier under ``sentences/``.
    ``dedup_sentences_incremental`` reads the tiered layout unchanged —
    partition discovery adds a ``batch`` column the probes never look
    at, and duplicate keys across tiers are harmless to semi/anti
    probes. Same single-maintainer rule as the other index tiers: one
    root is maintained by EITHER the flat batch build/append OR this
    stream, never both. ``max_dup_mils`` (r13) wires
    :func:`maintain_stream_tier`'s trigger→fold→swap loop into the
    drain, same contract as ``maintain_window_index``."""
    from pyspark.sql import functions as F

    from hadoop_invertedindexer_spark.operators.dedup import (
        _sentence_frame,
        _sentence_spans,
    )
    from hadoop_invertedindexer_spark.streaming.events import run_tier_maintenance

    p = spark.read.parquet(f"{index_path}/params").head()

    def _append_tier(batch_df: DataFrame, batch_id: int) -> None:
        keyed = _sentence_spans(
            _sentence_frame(batch_df, id_col, text_col), int(p.span)
        )
        keyed.where(
            F.replace(F.col("sp"), F.lit("\x02"), F.lit("")) != ""
        ).select(F.md5("sp").alias("h")).distinct().write.mode(
            "overwrite"
        ).parquet(f"{index_path}/sentences/batch={batch_id}")
        if max_dup_mils is not None:
            maintain_stream_tier(
                spark, index_path, "sentences", "h", max_dup_mils
            )

    run_tier_maintenance(
        spark, source_dir, source_schema, checkpoint_dir,
        _append_tier, max_files_per_trigger,
    )


def maintain_paragraph_index(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 1,
    max_dup_mils: int | None = None,
) -> None:
    """Continuous form of ``append_paragraph_index`` (r8): drain newly
    PUBLISHED document files with availableNow and write each
    micro-batch's distinct normalized-paragraph hashes as an idempotent
    ``batch=<id>`` tier under ``paragraphs/``.
    ``dedup_paragraphs_incremental`` reads the tiered layout unchanged —
    partition discovery adds a ``batch`` column the anti join never
    looks at, and duplicate hashes across tiers are harmless to an anti
    probe. Same single-maintainer rule as the MinHash and window-hash
    tiers: one root is maintained by EITHER the flat batch build/append
    OR this stream, never both. ``max_dup_mils`` (r13) wires
    :func:`maintain_stream_tier`'s trigger→fold→swap loop into the
    drain, same contract as ``maintain_window_index``."""
    from pyspark.sql import functions as F

    from hadoop_invertedindexer_spark.operators.dedup import _paragraph_keyed
    from hadoop_invertedindexer_spark.streaming.events import run_tier_maintenance

    def _append_tier(batch_df: DataFrame, batch_id: int) -> None:
        _paragraph_keyed(batch_df, id_col, text_col).where(
            ~F.col("_h").startswith("u|")
        ).select(F.col("_h").alias("h")).distinct().write.mode(
            "overwrite"
        ).parquet(f"{index_path}/paragraphs/batch={batch_id}")
        if max_dup_mils is not None:
            maintain_stream_tier(
                spark, index_path, "paragraphs", "h", max_dup_mils
            )

    run_tier_maintenance(
        spark, source_dir, source_schema, checkpoint_dir,
        _append_tier, max_files_per_trigger,
    )


def maintain_exact_index(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    index_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    max_files_per_trigger: int = 1,
    max_dup_mils: int | None = None,
) -> None:
    """Continuous form of ``append_exact_index`` (r10): drain newly
    PUBLISHED document files with availableNow and write each
    micro-batch's distinct normalized-text hashes as an idempotent
    ``batch=<id>`` tier under ``hashes/``. ``dedup_exact_incremental``
    reads the tiered layout unchanged — partition discovery adds a
    ``batch`` column the anti join never looks at, and duplicate hashes
    across tiers are harmless to an anti probe. Same single-maintainer
    rule as every other index tier: one root is maintained by EITHER
    the flat batch build/append OR this stream, never both.
    ``max_dup_mils`` (r13) wires :func:`maintain_stream_tier`'s
    trigger→fold→swap loop into the drain, same contract as
    ``maintain_window_index``."""
    from pyspark.sql import functions as F

    from hadoop_invertedindexer_spark.operators.dedup import normalized_text
    from hadoop_invertedindexer_spark.streaming.events import run_tier_maintenance

    def _append_tier(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.select(
            F.sha2(normalized_text(text_col), 256).alias("h")
        ).distinct().write.mode("overwrite").parquet(
            f"{index_path}/hashes/batch={batch_id}"
        )
        if max_dup_mils is not None:
            maintain_stream_tier(
                spark, index_path, "hashes", "h", max_dup_mils
            )

    run_tier_maintenance(
        spark, source_dir, source_schema, checkpoint_dir,
        _append_tier, max_files_per_trigger,
    )


def init_winnow_index(
    spark: SparkSession,
    path: str,
    k: int = 5,
    w: int = 4,
) -> None:
    """Pinned (k, w) params table of a (possibly still empty) winnow
    fingerprint index (r13): the streaming maintainer derives every
    batch's selection from it, so stored postings can never drift from
    the index contract — the same drift guard the batch build writes."""
    spark.createDataFrame([(k, w)], "k int, w int").write.mode(
        "overwrite"
    ).parquet(f"{path}/params")


def maintain_winnow_index(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 1,
    max_dup_mils: int | None = None,
) -> None:
    """Continuous form of ``append_winnow_index`` (r13): drain newly
    PUBLISHED document files with availableNow and write each
    micro-batch's distinct winnowed (id, fp) postings — selected at
    the index's STORED (k, w) — as an idempotent ``batch=<id>`` tier
    under ``fps/``. ``winnow_index_pairs`` reads the tiered layout
    unchanged (explicit column projection). Same single-maintainer
    rule as every other tier; ``max_dup_mils`` wires
    :func:`maintain_stream_tier`'s trigger→fold→swap loop into the
    drain over the two-column (id, fp) key."""
    from pyspark.sql import functions as F

    from hadoop_invertedindexer_spark.operators.dedup import (
        winnow_fingerprints,
    )
    from hadoop_invertedindexer_spark.streaming.events import run_tier_maintenance

    p = spark.read.parquet(f"{index_path}/params").head()

    def _append_tier(batch_df: DataFrame, batch_id: int) -> None:
        winnow_fingerprints(
            batch_df, int(p.k), int(p.w), id_col, text_col
        ).select(F.col(id_col).alias("id"), "fp").distinct().write.mode(
            "overwrite"
        ).parquet(f"{index_path}/fps/batch={batch_id}")
        if max_dup_mils is not None:
            maintain_stream_tier(
                spark, index_path, "fps", ["id", "fp"], max_dup_mils
            )

    run_tier_maintenance(
        spark, source_dir, source_schema, checkpoint_dir,
        _append_tier, max_files_per_trigger,
    )
