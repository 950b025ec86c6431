"""Windowed aggregates over the events table — batch and streaming twins.

The reference is pure batch (SURVEY §2B: no streaming surface), so this is
EXT. Design: every streaming aggregate has a batch twin using the same
``F.window``/``F.session_window`` expressions, so correctness is
oracle-checked in batch (DuckDB ``time_bucket`` / gaps-and-islands) and
the streaming run is checked for batch-equivalence + watermark behavior.

Scale: windowed groupBy shuffles on (window, keys) — bounded state; with
watermarks Spark evicts closed windows, so state size is O(open windows x
keys), independent of stream length.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _windowed(df: DataFrame, window_col) -> DataFrame:
    return (
        df.groupBy(window_col.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def tumbling_window_agg(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling windows: (ws, we, event_type, n, sum_value)."""
    return _windowed(events, F.window("ts", width))


def sliding_window_agg(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding windows (each event lands in width/slide windows)."""
    return _windowed(events, F.window("ts", width, slide))


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows with an inactivity gap: a new session opens
    when an event arrives >= gap after the previous one (half-open window
    semantics). Output: (user_id, session_start, session_end, n, sum_value)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
            "sum_value",
        )
    )


_STAGE_CACHE: dict[str, str] = {}


def _staged_events_stream(spark: SparkSession, sf_dir: str):
    """File-stream over the events parquet (staged into a dir — the
    FileStreamSource wants directories), with the ns→µs ts conversion.
    Stage dirs are cached per sf_dir and removed at exit, so repeated
    contract/test runs don't accumulate temp directories."""
    from hadoop_invertedindexer_spark.sources.tables import ensure_session_conf

    ensure_session_conf(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stage = _STAGE_CACHE.get(sf_dir)
    if stage is None or not os.path.isdir(stage):
        import atexit
        import shutil

        stage = tempfile.mkdtemp(prefix="hii_stream_src_")
        os.symlink(f"{sf_dir}/events.parquet", f"{stage}/events.parquet")
        _STAGE_CACHE[sf_dir] = stage
        atexit.register(shutil.rmtree, stage, ignore_errors=True)
    stream = spark.readStream.schema(raw_schema).parquet(stage)
    ts_type = {f.name: f.dataType.simpleString() for f in raw_schema}["ts"]
    if ts_type == "bigint":  # TIMESTAMP(NANOS) read as long, as in read_table
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def run_streaming_session(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    query_name: str = "stream_session",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
):
    """Structured-streaming twin of :func:`session_window_agg` — session
    windows are merge-on-arrival stateful aggregation, the canonical
    'needs a watermark to finalize' operator."""
    stream = _staged_events_stream(spark, sf_dir)
    agg = session_window_agg(stream.withWatermark("ts", watermark), gap=gap)
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def streaming_dedup(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    query_name: str = "stream_dedup",
    watermark: str = "1 hour",
):
    """Streaming exact dedup: first occurrence of each (user_id, event_type)
    within the watermark horizon. dropDuplicatesWithinWatermark keeps
    state only for the horizon — bounded regardless of stream length
    (the streaming face of the dedup surface)."""
    stream = _staged_events_stream(spark, sf_dir)
    # project to the dedup key only: WHICH physical row survives within a
    # batch is nondeterministic, the surviving key set is deterministic
    deduped = (
        stream.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def hourly_rollup_exact(events: DataFrame) -> DataFrame:
    """Hour-grain base rollup with exact (decimal) partial sums — the
    materialized tier of a hypertable-style continuous aggregate. Kept
    unrounded so coarser tiers re-aggregate from it without drift."""
    return events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value_exact"),
    )


def daily_from_hourly(hourly: DataFrame) -> DataFrame:
    """Day tier re-aggregated from the hour tier (counts and sums are
    associative), so the daily view costs O(hours), not O(events) — at
    100 TB the raw stream is touched once, every coarser grain reads the
    tier below. Must equal direct daily aggregation; the contract oracle
    checks exactly that."""
    return (
        hourly.groupBy(
            F.date_trunc("day", F.col("w.start")).alias("day"), "event_type"
        )
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("sum_value_exact"), 2).cast("double").alias("sum_value"),
        )
    )


def hourly_user_sketches(events: DataFrame) -> DataFrame:
    """Hour-grain HLL sketches of distinct users — the tier for distinct
    counts, which (unlike counts and sums) are NOT associative exactly:
    a day's distinct users can't be summed from hourly distincts. HLL
    sketches ARE mergeable, so the hourly tier stores a ~KB sketch per
    (hour, type) and every coarser grain merges sketches instead of
    rescanning raw events."""
    return events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.hll_sketch_agg("user_id").alias("users_sketch"),
        F.count(F.lit(1)).alias("n"),
    )


def daily_distinct_users_from_sketches(hourly: DataFrame) -> DataFrame:
    """Day-grain distinct-user estimates by merging the hourly sketches
    (hll_union_agg) — O(hours) work, ±~2% standard HLL error, bounded in
    tests against the exact distinct."""
    return (
        hourly.groupBy(
            F.date_trunc("day", F.col("w.start")).alias("day"), "event_type"
        )
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("users_sketch")).alias(
                "approx_users"
            ),
            F.sum("n").alias("n_events"),
        )
    )


def daily_distinct_users_exact(events: DataFrame) -> DataFrame:
    """Exact twin of the sketch tier: two-level distinct — pre-collapse to
    one row per (day, event_type, user), then count. Same shuffle count as
    ``count(DISTINCT)`` (Catalyst expands that to exactly this two-phase
    aggregate), but stated explicitly because the first level is the
    re-usable tier: the (day, type, user) frame also serves retention and
    funnel queries without rescanning raw events. This is the
    oracle-checkable ground the ±2% sketch estimate is bounded against."""
    return (
        events.select(
            F.date_trunc("day", "ts").alias("day"), "event_type", "user_id"
        )
        .distinct()
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def maintain_hourly_tier(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    tier_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Incremental materialized-rollup maintenance: each micro-batch
    writes its *partial* hourly aggregates into a batch-keyed partition
    of the tier. Because counts and decimal sums are associative, the
    tier never needs read-modify-write, so maintenance cost is O(batch)
    — the streaming face of :func:`merge_term_doc_counts`'s batch merge.
    foreachBatch is at-least-once: overwriting ``batch=<id>`` (instead of
    a blind append) makes a retried micro-batch idempotent — a replay
    after a crash-between-write-and-checkpoint replaces its own partials
    rather than double-counting them. Readers re-sum partials
    (:func:`read_hourly_tier`); a periodic
    :func:`~hadoop_invertedindexer_spark.sources.sinks.compact_parquet`
    pass bounds the partial count."""

    def _append_partials(batch_df: DataFrame, batch_id: int) -> None:
        hourly_rollup_exact(batch_df).write.mode("overwrite").parquet(
            f"{tier_path}/batch={batch_id}"
        )

    run_tier_maintenance(
        spark, source_dir, source_schema, checkpoint_dir,
        _append_partials, max_files_per_trigger,
    )


def run_tier_maintenance(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    checkpoint_dir: str,
    per_batch,
    max_files_per_trigger: int = 1,
) -> None:
    """Shared scaffolding for every foreachBatch tier maintainer
    (hourly rollup, user sketches, the inverted-index tier): availableNow
    drain of a schema'd file stream, ns→µs ``ts`` normalization when the
    source stores nano-longs, checkpointed exactly-once batch ids.
    ``per_batch(batch_df, batch_id)`` owns the overwrite-own-batch
    idempotency contract."""
    from hadoop_invertedindexer_spark.sources.tables import ensure_session_conf

    ensure_session_conf(spark)
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    ts_types = {f.name: f.dataType.simpleString() for f in source_schema}
    if ts_types.get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    q = (
        stream.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_hourly_tier(spark: SparkSession, tier_path: str) -> DataFrame:
    """Merge the tier's per-batch partials into final hourly aggregates
    (associative re-sum — exact, any number of partials per window; the
    hive-style ``batch=N`` partition column is ignored by the re-sum)."""
    return (
        spark.read.parquet(tier_path)
        .groupBy("w", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value_exact").alias("sum_value_exact"),
        )
    )


def enrich_by_dim(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Dimension enrichment: events joined to the customer dim on
    user_id, rolled up per market segment. The dim side broadcasts —
    in streaming form this is the canonical stream-static join, where
    the static side is re-read per micro-batch and never holds state."""
    return (
        events.join(F.broadcast(dim), events.user_id == dim.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def run_streaming_enrich(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    query_name: str = "stream_enrich",
) -> DataFrame:
    """Structured-streaming twin of :func:`enrich_by_dim`: file-stream
    events, static customer dim. Must equal the batch twin on one
    availableNow pass — the contract reuses the batch oracle."""
    from hadoop_invertedindexer_spark.sources.tables import read_table

    stream = _staged_events_stream(spark, sf_dir)
    dim = read_table(spark, sf_dir, "customer")
    agg = enrich_by_dim(stream, dim)
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def purchase_error_pairs(purchases: DataFrame, errors: DataFrame) -> DataFrame:
    """Interval equi-join: for each purchase, the same user's errors
    within ±1 hour — (p_id, e_id) pairs. In streaming form this is a
    stream-stream join: the time bound plus both watermarks lets Spark
    evict buffered rows once they can no longer match, so state is
    O(watermark horizon), not O(stream)."""
    p = purchases.select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    e = errors.select(
        F.col("event_id").alias("e_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    return p.join(
        e,
        (p.user_id == e.e_user)
        & (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("e_ts") <= F.col("p_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("p_id", "e_id")


def run_streaming_interval_join(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    query_name: str = "stream_interval_join",
    watermark: str = "2 hours",
) -> DataFrame:
    """Structured-streaming twin of :func:`purchase_error_pairs`: both
    sides are watermarked streams over the same staged source; append
    mode emits each matched pair exactly once."""
    stream = _staged_events_stream(spark, sf_dir)
    purchases = stream.where(F.col("event_type") == "purchase").withWatermark(
        "ts", watermark
    )
    errors = stream.where(F.col("event_type") == "error").withWatermark(
        "ts", watermark
    )
    pairs = purchase_error_pairs(purchases, errors)
    q = (
        pairs.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def run_streaming_tumbling(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    query_name: str = "stream_tumbling",
    width: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Structured-streaming twin of :func:`tumbling_window_agg`.

    Reads the events parquet as a file stream (one-shot via availableNow),
    applies a watermark, and aggregates into an in-memory sink. On static
    data processed in a single trigger the result must equal the batch
    twin — which is exactly how the contract checks it.
    """
    stream = _staged_events_stream(spark, sf_dir)
    agg = _windowed(stream.withWatermark("ts", watermark), F.window("ts", width))
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def resample_hourly_gapfill(events: DataFrame) -> DataFrame:
    """Gap-filled hourly resample per event_type: every hour between the
    type's first and last event appears exactly once, with n = 0 for
    silent hours — the densification step before window/lag analytics
    that assume a regular grid (a LAG over sparse hours silently spans
    gaps).

    The dense grid is generated with ``sequence()`` + explode from each
    type's (min, max) hour — |types| rows explode to |types x hours|,
    never a shuffle of the events — and the sparse rollup left-joins
    onto it. At 100 TB the rollup side is the already-tiny hourly tier,
    so the join is broadcast. Output: (event_type, hour, n)."""
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    spans = hourly.groupBy("event_type").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = spans.select(
        "event_type",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    return grid.join(hourly, ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
    )


def cohort_retention(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week;
    retention(cohort, k) = share of the cohort active in week k after.
    Two aggregations of (user, week) pairs — the fact stream collapses
    to per-user-week rows before any join, so the joins move |users x
    active-weeks|, not events. Output: (cohort, week_n, n_active,
    retention)."""
    first = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort")
    )
    active = events.select(
        user_col, F.date_trunc("week", ts_col).alias("week")
    ).distinct()
    sizes = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_users"))
    return (
        active.join(first, user_col)
        .groupBy(
            "cohort",
            (F.datediff("week", "cohort") / 7).cast("bigint").alias("week_n"),
        )
        .agg(F.countDistinct(user_col).alias("n_active"))
        .join(sizes, "cohort")
        .select(
            "cohort",
            "week_n",
            "n_active",
            F.round(F.col("n_active") / F.col("n_users"), 6).alias("retention"),
        )
    )


def hourly_anomalies(events: DataFrame, z: float = 3.0) -> DataFrame:
    """Volume anomalies per event_type: hours whose count deviates more
    than ``z`` sample standard deviations from the trailing 24 gap-FILLED
    hours (without densification a LAG/frame would silently span silent
    periods and under-estimate variance).

    The trailing moment sums (Σn, Σn²) are EXACT integer window
    aggregates — variance and the z-score derive from them in one double
    expression, so the flag is bit-deterministic across engines and
    partitionings, unlike a windowed stddev whose double accumulation
    order varies. Output: (event_type, hour, n, zscore)."""
    from pyspark.sql import Window

    grid = resample_hourly_gapfill(events)
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-24, -1)
    )
    cnt = F.count(F.lit(1)).over(w)
    s1 = F.sum("n").over(w)
    s2 = F.sum(F.col("n") * F.col("n")).over(w)
    windowed = grid.select(
        "event_type", "hour", "n",
        cnt.alias("m"), s1.alias("s1"), s2.alias("s2"),
    ).where(F.col("m") == 24)  # full trailing day only
    mean = F.col("s1") / F.col("m")
    # s1 is a bigint window sum; squaring it in bigint overflows once the
    # trailing-day total passes ~3e9 events. Square in double — still a
    # deterministic single multiply of one exactly-summed value.
    s1d = F.col("s1").cast("double")
    var = (F.col("s2") - s1d * s1d / F.col("m")) / (F.col("m") - 1)
    zscore = (F.col("n") - mean) / F.sqrt(F.greatest(var, F.lit(1e-12)))
    return (
        windowed.withColumn("zscore", F.round(zscore, 6))
        .where(F.abs(F.col("zscore")) > z)
        .select("event_type", "hour", "n", "zscore")
    )


def maintain_user_sketch_tier(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    tier_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Streaming maintenance of the distinct-users tier: each micro-batch
    appends its hour-grain HLL sketches under ``batch=<id>``. HLL
    register-merge is exact and order-independent (element-wise max), so
    the tier's merged sketches equal the sketches of the full stream no
    matter how batches split it — asserted estimate-for-estimate in
    tests. Same idempotent overwrite-own-batch contract as
    :func:`maintain_hourly_tier` (scaffolding shared via
    :func:`run_tier_maintenance`)."""

    def _append_sketches(batch_df: DataFrame, batch_id: int) -> None:
        hourly_user_sketches(batch_df).select(
            F.col("w.start").alias("hour"), "event_type", "users_sketch", "n"
        ).write.mode("overwrite").parquet(f"{tier_path}/batch={batch_id}")

    run_tier_maintenance(
        spark, source_dir, source_schema, checkpoint_dir,
        _append_sketches, max_files_per_trigger,
    )


def read_user_sketch_tier(spark: SparkSession, tier_path: str) -> DataFrame:
    """Merge the tier's per-batch sketch partials back to one sketch per
    (hour, event_type) — shaped like :func:`hourly_user_sketches` output
    (full ``w.start``/``w.end`` window struct, reconstructed since the
    tier stores only the start) so every sketch consumer works on either
    path."""
    merged = (
        spark.read.parquet(tier_path)
        .groupBy("hour", "event_type")
        .agg(
            F.hll_union_agg("users_sketch").alias("users_sketch"),
            F.sum("n").alias("n"),
        )
    )
    return merged.select(
        F.struct(
            F.col("hour").alias("start"),
            (F.col("hour") + F.expr("INTERVAL 1 HOUR")).alias("end"),
        ).alias("w"),
        "event_type",
        "users_sketch",
        "n",
    )


# ---------------------------------------------- histogram quantile tier

HIST_LO, HIST_HI, HIST_BINS = 0.0, 512.0, 64  # fixed grid: bin width 8.0


def hourly_value_histograms(events: DataFrame) -> DataFrame:
    """Hour-grain fixed-bin histograms of ``value`` — the mergeable tier
    for QUANTILES, which (like distinct counts) are not associative: a
    day's p95 cannot be combined from hourly p95s. Fixed-grid integer
    bin counts ARE associative, and unlike t-digest/KLL sketches their
    merge is bit-exact and engine-portable, so the whole tier (and any
    percentile read off it) is oracle-checkable. Estimate error is
    bounded by one bin width by construction. Out-of-range values clamp
    to the edge bins (the grid is a config contract, like any fixed
    histogram monitoring system)."""
    width = (HIST_HI - HIST_LO) / HIST_BINS
    b = F.least(
        F.greatest(F.floor((F.col("value") - F.lit(HIST_LO)) / F.lit(width)), F.lit(0)),
        F.lit(HIST_BINS - 1),
    ).cast("int")
    return events.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type", b.alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"))


def daily_percentile_from_histograms(hourly: DataFrame, q: float = 0.95) -> DataFrame:
    """Day-grain percentile estimate by merging the hourly histograms:
    O(hours x bins) work, never a rescan of raw events. The estimate is
    the UPPER EDGE of the first bin whose cumulative count reaches
    ceil(q * total) — deterministic integer math over the merged counts,
    within one bin width of the exact discrete percentile (bounded in
    tests against :func:`daily_percentile_exact`)."""
    from pyspark.sql import Window

    width = (HIST_HI - HIST_LO) / HIST_BINS
    daily = hourly.groupBy(
        F.date_trunc("day", F.col("w.start")).alias("day"), "event_type", "bin"
    ).agg(F.sum("n").alias("n"))
    part = Window.partitionBy("day", "event_type")
    cum_w = part.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    hit = (
        daily.withColumn("cum", F.sum("n").over(cum_w))
        .withColumn("total", F.sum("n").over(part))
        .withColumn("target", F.ceil(F.lit(q) * F.col("total")))
        .where(F.col("cum") >= F.col("target"))
    )
    return hit.groupBy("day", "event_type").agg(
        F.max("total").alias("n_events"),
        (F.lit(HIST_LO) + (F.min("bin") + 1) * F.lit(width)).alias("p_est"),
    )


def daily_percentile_exact(events: DataFrame, q: float = 0.95) -> DataFrame:
    """Exact twin: the actual data value at rank ceil(q * n) per (day,
    event_type) — discrete percentile via row_number, no interpolation
    arithmetic, so both engines select the bit-identical double."""
    from pyspark.sql import Window

    keyed = events.select(
        F.date_trunc("day", "ts").alias("day"), "event_type", "value"
    )
    part = Window.partitionBy("day", "event_type")
    ranked = (
        keyed.withColumn("rn", F.row_number().over(part.orderBy("value")))
        .withColumn("total", F.count(F.lit(1)).over(part))
        .withColumn("target", F.ceil(F.lit(q) * F.col("total")))
    )
    return (
        ranked.where(F.col("rn") == F.col("target"))
        .select(
            "day",
            "event_type",
            F.col("total").alias("n_events"),
            F.col("value").alias("p_exact"),
        )
    )


def maintain_value_hist_tier(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    tier_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Streaming maintenance of the histogram quantile tier: each
    micro-batch appends its hour-grain fixed-bin counts under
    ``batch=<id>``. Integer bin counts merge associatively (plain sums),
    so the tier equals the full-stream histograms no matter how batches
    split the data — and unlike the HLL tier, bit-exactly. Same
    idempotent overwrite-own-batch contract via
    :func:`run_tier_maintenance`."""

    def _append_hists(batch_df: DataFrame, batch_id: int) -> None:
        hourly_value_histograms(batch_df).select(
            F.col("w.start").alias("hour"), "event_type", "bin", "n"
        ).write.mode("overwrite").parquet(f"{tier_path}/batch={batch_id}")

    run_tier_maintenance(
        spark, source_dir, source_schema, checkpoint_dir,
        _append_hists, max_files_per_trigger,
    )


def read_value_hist_tier(spark: SparkSession, tier_path: str) -> DataFrame:
    """Re-sum the tier's per-batch partials to one count per (hour,
    event_type, bin), reshaped like :func:`hourly_value_histograms`
    output so :func:`daily_percentile_from_histograms` runs unchanged on
    either path."""
    merged = (
        spark.read.parquet(tier_path)
        .groupBy("hour", "event_type", "bin")
        .agg(F.sum("n").alias("n"))
    )
    return merged.select(
        F.struct(
            F.col("hour").alias("start"),
            (F.col("hour") + F.expr("INTERVAL 1 HOUR")).alias("end"),
        ).alias("w"),
        "event_type",
        "bin",
        "n",
    )
