"""Streaming ingest for the persisted ANN tier (r13 session 2).

The dedup index tiers got their streaming maintainers in r13 session 1
(``dedup_ingest.py`` — availableNow drain, idempotent ``batch=<id>``
tiers, in-drain trigger→fold→swap); this module gives the ANN side the
same closed loop over the IVF-PQ codes tier:

* :func:`init_ivfpq_stream_index` pins the MODELS (centroids,
  codebooks, (m, dim) params) before any data arrives — every batch's
  assignment and encoding derive from the index contract, the winnow
  (k, w) params lesson applied to the ANN family;
* :func:`maintain_ivfpq_ingest` drains newly published embedding files
  and writes each micro-batch's codes as an idempotent
  ``codes/batch=<id>`` tier, cid-partitioned WITHIN the batch dir so
  probed reads still prune at the directory level (uniform two-level
  partitioning — every batch dir has the same depth, which Spark's
  partition discovery requires);
* with ``max_imbalance_mils`` set, each batch closes the maintenance
  loop in-drain: occupancy trigger (metadata-scale — the codes tier
  keeps no raw floats) → full-model rebuild from the PUBLISHED source
  directory (the raw source of truth a lossy tier cannot be) → whole-
  index swap via the crash-safe staging order of ``swap_tier_dir``.

Replay safety across an in-drain fold (ADVICE r13): folding
``batch=<id>`` tiers into ``batch=compacted`` and then crashing before
the checkpoint commits would make the replay REWRITE ``batch=<id>``
whose rows already live inside the compacted tier — and duplicated
(id, cid, codes) rows double those vectors' summed ADC distances in
``query_ivfpq_index`` (the groupBy sums 2m lookups instead of m),
corrupting rankings. Unlike the dedup tiers (distinct-key sets, replay-
safe by value), the codes tier is NOT a set, so the fold records the
batch ids it swallowed in a ``folded`` table inside the swapped index;
a replayed batch whose id is on that list is skipped entirely — the
overwrite-own-batch idempotency contract extends through the fold.

``query_ivfpq_index`` serves the stream layout unchanged: it projects
(id, cid, codes) explicitly, so the extra ``batch`` partition column is
invisible, and DPP prunes on cid exactly as on the batch-built layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def init_ivfpq_stream_index(
    spark: SparkSession,
    path: str,
    centroids: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    dim: int = 64,
) -> None:
    """Pin the model tables of a (possibly still empty) stream-
    maintained IVF-PQ index: centroids + codebooks + (m, dim) params,
    plus an empty ``folded`` ledger (the batch ids an in-drain fold has
    swallowed — see module docstring; empty until the first fold).
    No codes are written — all data arrives as ``codes/batch=<id>``
    tiers from the drain, so the layout stays uniform-depth."""
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    codebooks.write.mode("overwrite").parquet(f"{path}/codebooks")
    spark.createDataFrame([(m, dim)], "m int, dim int").write.mode(
        "overwrite"
    ).parquet(f"{path}/params")
    spark.createDataFrame([], "batch string").write.mode(
        "overwrite"
    ).parquet(f"{path}/folded")


def _folded_batches(spark: SparkSession, index_path: str) -> set[str]:
    """The set of batch ids already folded into ``batch=compacted`` —
    bounded by the number of drains ever folded (metadata-scale).
    Absent ledger (index inited before the ledger existed, or built by
    the batch-side builder) reads as empty: those indexes have never
    folded in-drain, so nothing can be double-counted."""
    try:
        return {
            str(r.batch)
            for r in spark.read.parquet(f"{index_path}/folded").collect()
        }
    except Exception:
        return set()


def maintain_ivfpq_stream_tier(
    spark: SparkSession,
    index_path: str,
    corpus_dir: str,
    max_imbalance_mils: int = 4000,
    sample_mult: int = 4,
    refine_iters: int = 2,
    portable: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The IVF-PQ stream tier's trigger→rebuild→swap loop — the ANN
    member of the ``maintain_stream_tier`` family, with the two
    differences the compressed tier forces: (1) the trigger is
    occupancy-only (``ivfpq_index_drift`` off the stored cid column);
    (2) the rebuild re-derives BOTH models from the raw vectors under
    ``corpus_dir`` — the published source directory the drain reads,
    which IS the tier's source of truth (the lossy codes cannot
    recenter themselves). The rebuilt index (fresh centroids, fresh
    codebooks, same (m, dim) contract, k preserved at the current
    centroid count, all codes folded into one ``batch=compacted``
    tier) swaps into place with the crash-safe staging order; the
    report row mirrors ``maintain_ivfpq_index``:

        (n_vectors, n_centroids, n_empty_buckets, max_bucket,
         imbalance, rebuilt)

    Same parquet caveat as every streaming-side swap: no snapshot
    isolation — don't race a probe against the swap itself."""
    from hadoop_invertedindexer_spark.operators.similarity import (
        bounded_centroids_refined,
        ivf_assign,
        ivfpq_encode,
        ivfpq_index_drift,
        pq_codebooks,
    )
    from hadoop_invertedindexer_spark.streaming.index_maintenance import (
        swap_tier_dir,
    )

    stats = ivfpq_index_drift(spark, index_path).head()
    rebuilt = (
        stats.imbalance is not None
        and stats.imbalance * 1000 > max_imbalance_mils
    )
    if rebuilt:
        p = spark.read.parquet(f"{index_path}/params").head()
        ksub = int(
            spark.read.parquet(f"{index_path}/codebooks")
            .agg(F.max("c"))
            .head()[0]
        ) + 1
        # fold exactly what the index currently stores: mid-drain,
        # corpus_dir already contains files the checkpoint has NOT yet
        # drained — rebuilding from the whole directory would fold
        # those rows now AND again when their batch arrives. The
        # semi-join against the stored ids keeps the rebuild's content
        # identical to the tier it replaces (the maintain_stream_tier
        # fold semantics), and the un-drained files append afterwards
        # against the freshly swapped models.
        stored = (
            spark.read.parquet(f"{index_path}/codes")
            .select(id_col)
            .distinct()
        )
        corpus = (
            spark.read.parquet(corpus_dir)
            .select(id_col, vec_col)
            .join(stored, id_col, "left_semi")
        )
        cents = bounded_centroids_refined(
            corpus, int(stats.n_centroids), sample_mult, refine_iters,
            portable, id_col, vec_col,
        )
        cb = pq_codebooks(corpus, int(p.m), ksub, id_col, vec_col, int(p.dim))
        staging = f"{index_path}.rebuilding"
        ivfpq_encode(
            ivf_assign(corpus, cents, id_col, vec_col, int(p.dim)),
            cb, int(p.m), id_col, vec_col, int(p.dim),
        ).write.mode("overwrite").partitionBy("cid").parquet(
            f"{staging}/codes/batch=compacted"
        )
        cents.write.mode("overwrite").parquet(f"{staging}/centroids")
        cb.write.mode("overwrite").parquet(f"{staging}/codebooks")
        spark.createDataFrame(
            [(int(p.m), int(p.dim))], "m int, dim int"
        ).write.mode("overwrite").parquet(f"{staging}/params")
        # record every batch id the fold swallowed (plus all previously
        # folded ids): a checkpoint replay of one of these batches must
        # SKIP its rewrite, or its rows exist twice — once inside
        # batch=compacted, once in the rewritten batch=<id> — and
        # query_ivfpq_index's groupBy would sum 2m ADC lookups for
        # those vectors (ADVICE r13). The ledger rides the same
        # crash-safe swap as the tier it protects.
        swallowed = {
            str(r.batch)
            for r in spark.read.parquet(f"{index_path}/codes")
            .select("batch")
            .distinct()
            .collect()
            if str(r.batch) != "compacted"
        } | _folded_batches(spark, index_path)
        spark.createDataFrame(
            [(b,) for b in sorted(swallowed)], "batch string"
        ).write.mode("overwrite").parquet(f"{staging}/folded")
        swap_tier_dir(spark, staging, index_path)
    return spark.createDataFrame(
        [
            (
                stats.n_vectors,
                stats.n_centroids,
                stats.n_empty_buckets,
                stats.max_bucket,
                stats.imbalance,
                rebuilt,
            )
        ],
        "n_vectors BIGINT, n_centroids BIGINT, n_empty_buckets BIGINT,"
        " max_bucket BIGINT, imbalance DOUBLE, rebuilt BOOLEAN",
    )


def maintain_ivfpq_ingest(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_files_per_trigger: int = 1,
    max_imbalance_mils: int | None = None,
) -> None:
    """Continuous form of ``append_ivfpq_index``: drain newly PUBLISHED
    embedding files with availableNow; each micro-batch assigns and
    encodes at the index's STORED centroids/codebooks/params and writes
    an idempotent ``codes/batch=<id>`` tier (overwrite-own-batch, so a
    checkpoint replay rewrites rather than duplicates — the dedup
    maintainers' contract; the flat ``append_ivfpq_index`` path instead
    appends rows, which is why the stream owns its own layout). Replays
    of batches an in-drain fold already swallowed are SKIPPED via the
    ``folded`` ledger (see module docstring — rewriting them would
    duplicate rows inside ``batch=compacted``), and empty micro-batches
    write nothing (an empty ``batch=<id>`` dir has no parquet footers
    and breaks later schema inference of the codes tier — ADVICE r13).
    Same single-maintainer rule as every tier; ``max_imbalance_mils``
    wires :func:`maintain_ivfpq_stream_tier`'s loop into the drain,
    with the published ``source_dir`` as the rebuild's raw-vector
    source of truth."""
    from hadoop_invertedindexer_spark.operators.similarity import (
        ivf_assign,
        ivfpq_encode,
    )
    from hadoop_invertedindexer_spark.streaming.events import (
        run_tier_maintenance,
    )

    p = spark.read.parquet(f"{index_path}/params").head()

    def _append_tier(batch_df: DataFrame, batch_id: int) -> None:
        # a replayed batch the fold already swallowed: its rows live in
        # batch=compacted — rewriting batch=<id> would double them
        if str(batch_id) in _folded_batches(spark, index_path):
            return
        # an empty micro-batch (e.g. the source's first listed file has
        # no rows): writing produces a footer-less batch dir that later
        # schema inference of {index_path}/codes chokes on — and there
        # is no occupancy evidence to maintain on either
        if batch_df.isEmpty():
            return
        # model tables re-read per batch (tiny, broadcast anyway): an
        # in-drain rebuild swaps them mid-stream, and a file index
        # captured before the drain would encode later batches against
        # the pre-swap centroids
        centroids = spark.read.parquet(f"{index_path}/centroids")
        codebooks = spark.read.parquet(f"{index_path}/codebooks")
        ivfpq_encode(
            ivf_assign(batch_df, centroids, id_col, vec_col, int(p.dim)),
            codebooks, int(p.m), id_col, vec_col, int(p.dim),
        ).write.mode("overwrite").partitionBy("cid").parquet(
            f"{index_path}/codes/batch={batch_id}"
        )
        if max_imbalance_mils is not None:
            maintain_ivfpq_stream_tier(
                spark, index_path, source_dir, max_imbalance_mils,
                id_col=id_col, vec_col=vec_col,
            )

    run_tier_maintenance(
        spark, source_dir, source_schema, checkpoint_dir,
        _append_tier, max_files_per_trigger,
    )
