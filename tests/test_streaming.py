"""Streaming semantics the batch oracle cannot check: watermark advance and
late-data dropping across micro-batches (hand-computed micro-fixture,
SURVEY §5 'non-SQL-expressible ops')."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.LongType()),
    ]
)


def _write_batch(spark, path: str, rows: list[tuple[str, int]]) -> None:
    data = [(dt.datetime.fromisoformat(ts), v) for ts, v in rows]
    spark.createDataFrame(data, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run_once(spark, src: str, ckpt: str, out: str):
    """One availableNow pass appending closed windows to a parquet sink
    (the memory sink cannot resume from a checkpoint). Returns the
    cumulative {window_start: (n, sum_v)} contents of the sink."""
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
        .select(F.col("w.start").alias("ws"), "n", "sum_v")
    )
    q = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {str(r.ws): (r.n, r.sum_v) for r in spark.read.parquet(out).collect()}


@pytest.mark.slow
def test_watermark_closes_windows_and_drops_late_rows(spark, tmp_path):
    src, ckpt, out = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "out")

    # batch 1: events in [10:00, 12:00]; watermark delay 1h
    _write_batch(
        spark,
        src,
        [("2024-01-01 10:00:00", 1), ("2024-01-01 10:30:00", 2), ("2024-01-01 12:00:00", 4)],
    )
    out1 = _run_once(spark, src, ckpt, out)
    # availableNow drains then runs a final commit batch: watermark = 12:00
    # - 1h = 11:00, so window [10:00, 11:00) is closed and emitted.
    assert out1 == {"2024-01-01 10:00:00": (2, 3)}

    # batch 2: one LATE row at 10:15 (window already closed — must be
    # dropped) and one new row at 13:30. The watermark advances to 12:30
    # only at the END of this batch, so nothing new emits until the next
    # trigger — but the late row must not reopen the closed window.
    _write_batch(spark, src, [("2024-01-01 10:15:00", 100), ("2024-01-01 13:30:00", 8)])
    out2 = _run_once(spark, src, ckpt, out)
    assert out2 == {"2024-01-01 10:00:00": (2, 3)}  # late row dropped, no reopen

    # batch 3: watermark restored as 12:30 closes [12:00,13:00); new data
    # at 16:00 advances it to 15:00, closing [13:00,14:00) as well. The
    # late row's v=100 must appear nowhere in any window.
    _write_batch(spark, src, [("2024-01-01 16:00:00", 16)])
    out3 = _run_once(spark, src, ckpt, out)
    assert out3 == {
        "2024-01-01 10:00:00": (2, 3),
        "2024-01-01 12:00:00": (1, 4),
        "2024-01-01 13:00:00": (1, 8),
    }
    assert all(s != 100 and s != 103 for _, s in out3.values()), "late row leaked"


def test_stream_enrich_equals_batch_twin(spark, sf_dir, tmp_path):
    """Stream-static join on one availableNow pass == the batch twin."""
    from hadoop_invertedindexer_spark.sources.tables import read_table
    from hadoop_invertedindexer_spark.streaming.events import (
        enrich_by_dim,
        run_streaming_enrich,
    )

    batch = enrich_by_dim(
        read_table(spark, sf_dir, "events"), read_table(spark, sf_dir, "customer")
    )
    streamed = run_streaming_enrich(
        spark, sf_dir, str(tmp_path / "ckpt_enrich"), query_name="t_enrich"
    )
    assert batch.exceptAll(streamed).count() == 0
    assert streamed.exceptAll(batch).count() == 0


def test_stream_interval_join_equals_batch_twin(spark, sf_dir, tmp_path):
    """Stream-stream interval join emits exactly the batch pair set."""
    from hadoop_invertedindexer_spark.sources.tables import read_table
    from hadoop_invertedindexer_spark.streaming.events import (
        purchase_error_pairs,
        run_streaming_interval_join,
    )

    ev = read_table(spark, sf_dir, "events")
    batch = purchase_error_pairs(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "error"),
    )
    streamed = run_streaming_interval_join(
        spark, sf_dir, str(tmp_path / "ckpt_ssj"), query_name="t_ssj"
    )
    assert batch.exceptAll(streamed).count() == 0
    assert streamed.exceptAll(batch).count() == 0


def test_daily_tier_equals_direct_daily(spark, sf_dir):
    """Continuous-aggregate tiering: daily-from-hourly must equal daily
    computed directly from raw events."""
    from hadoop_invertedindexer_spark.sources.tables import read_table
    from hadoop_invertedindexer_spark.streaming.events import (
        daily_from_hourly,
        hourly_rollup_exact,
    )

    ev = read_table(spark, sf_dir, "events")
    tiered = daily_from_hourly(hourly_rollup_exact(ev))
    direct = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
    )
    assert tiered.exceptAll(direct).count() == 0
    assert direct.exceptAll(tiered).count() == 0


def test_incremental_hourly_tier_maintenance(spark, sf_dir, tmp_path):
    """foreachBatch appends per-batch hourly partials; the re-summed tier
    re-aggregated to daily must equal direct daily over all events —
    across MULTIPLE micro-batches (two staged source files)."""
    from hadoop_invertedindexer_spark.sources.tables import read_table
    from hadoop_invertedindexer_spark.streaming.events import (
        daily_from_hourly,
        maintain_hourly_tier,
        read_hourly_tier,
    )

    ev = read_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    # two disjoint halves as separate files -> two micro-batches
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(src + "/a")
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(src + "/b")
    stage = str(tmp_path / "stage")
    import glob as g
    import os

    os.makedirs(stage)
    for i, f in enumerate(sorted(g.glob(src + "/*/part-*.parquet"))):
        os.symlink(f, f"{stage}/batch{i}.parquet")

    tier = str(tmp_path / "tier")
    maintain_hourly_tier(
        spark, stage, spark.read.parquet(stage).schema, tier,
        str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    # at least two partial files appended (one per micro-batch)
    n_partial_rows = spark.read.parquet(tier).count()
    merged = read_hourly_tier(spark, tier)
    assert n_partial_rows > merged.count()  # partials really were split

    tiered_daily = daily_from_hourly(merged)
    direct_daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
    )
    assert tiered_daily.exceptAll(direct_daily).count() == 0
    assert direct_daily.exceptAll(tiered_daily).count() == 0

    # exactly-once: re-running against the same checkpoint sees no new
    # source files and must append nothing to the tier
    maintain_hourly_tier(
        spark, stage, spark.read.parquet(stage).schema, tier,
        str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    assert spark.read.parquet(tier).count() == n_partial_rows


def test_daily_sketch_distinct_within_hll_error(spark, sf_dir):
    from hadoop_invertedindexer_spark.sources.tables import read_table
    from hadoop_invertedindexer_spark.streaming.events import (
        daily_distinct_users_from_sketches,
        hourly_user_sketches,
    )

    ev = read_table(spark, sf_dir, "events")
    est = {
        (r.day, r.event_type): r.approx_users
        for r in daily_distinct_users_from_sketches(hourly_user_sketches(ev)).collect()
    }
    exact = {
        (r.day, r.event_type): r.exact
        for r in ev.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(est) == set(exact)
    for key, e in exact.items():
        assert abs(est[key] - e) <= max(2, 0.05 * e), (key, est[key], e)


def test_incremental_index_equals_batch_rebuild(spark, sf_dir, tmp_path):
    """The flagship as a streaming materialized view: documents arriving
    in two batches produce, after partial re-sum, exactly the index a
    from-scratch batch build computes over the full corpus."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from hadoop_invertedindexer_spark.functions.textprep import prepare_tokens
    from hadoop_invertedindexer_spark.operators.index import term_doc_counts
    from hadoop_invertedindexer_spark.plans.contract import STOPWORDS_DEMO
    from hadoop_invertedindexer_spark.sources.tables import read_table
    from hadoop_invertedindexer_spark.streaming.index_maintenance import (
        maintain_term_index,
        read_term_index_tier,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "src")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(f"{src}/even")
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(f"{src}/odd")
    import glob as g
    import os

    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    for i, f in enumerate(sorted(g.glob(f"{src}/*/part-*.parquet"))):
        os.symlink(f, f"{stage}/batch{i}.parquet")

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    tier = str(tmp_path / "tier")
    maintain_term_index(
        spark, stage, schema, tier, str(tmp_path / "ckpt"), stopwords=STOPWORDS_DEMO
    )
    # two batch partitions were written (one per file trigger)
    assert spark.read.parquet(tier).select("batch").distinct().count() == 2

    served = {
        (r.word, r.doc_id, r["count"])
        for r in read_term_index_tier(spark, tier).collect()
    }
    scratch = {
        (r.word, r.doc_id, r["count"])
        for r in term_doc_counts(
            prepare_tokens(
                docs.select("doc_id", F.col("text").alias("line")),
                stopwords=STOPWORDS_DEMO,
            ),
            doc_col="doc_id",
        ).collect()
    }
    assert served == scratch and served


def test_index_retraction_nets_out_deleted_docs(spark, sf_dir, tmp_path):
    """Deleting documents = appending negated partials: the served index
    equals a from-scratch build over the surviving corpus; a replayed
    retraction (same batch key) is idempotent; a double retraction under
    a new key is caught on read instead of serving a corrupt index."""
    import pytest as _pytest

    from hadoop_invertedindexer_spark.functions.textprep import prepare_tokens
    from hadoop_invertedindexer_spark.operators.index import term_doc_counts
    from hadoop_invertedindexer_spark.plans.contract import STOPWORDS_DEMO
    from hadoop_invertedindexer_spark.sources.tables import read_table
    from hadoop_invertedindexer_spark.streaming.index_maintenance import (
        read_term_index_tier,
        retract_documents,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    tier = str(tmp_path / "tier")
    # seed the tier with a full-corpus partial (batch 0)
    toks = prepare_tokens(
        docs.select("doc_id", F.col("text").alias("line")), stopwords=STOPWORDS_DEMO
    )
    term_doc_counts(toks, doc_col="doc_id").write.parquet(f"{tier}/batch=0")

    gone = docs.where(F.col("doc_id") % 2 == 1)
    retract_documents(spark, gone, tier, "retract1", stopwords=STOPWORDS_DEMO)
    retract_documents(spark, gone, tier, "retract1", stopwords=STOPWORDS_DEMO)  # replay

    served = {
        (r.word, r.doc_id, r["count"])
        for r in read_term_index_tier(spark, tier).collect()
    }
    survivors = docs.where(F.col("doc_id") % 2 == 0)
    scratch = {
        (r.word, r.doc_id, r["count"])
        for r in term_doc_counts(
            prepare_tokens(
                survivors.select("doc_id", F.col("text").alias("line")),
                stopwords=STOPWORDS_DEMO,
            ),
            doc_col="doc_id",
        ).collect()
    }
    assert served == scratch and served

    # double retraction under a DIFFERENT key -> negative net -> read fails
    retract_documents(spark, gone, tier, "retract2", stopwords=STOPWORDS_DEMO)
    with _pytest.raises(Exception, match="negative net posting count"):
        read_term_index_tier(spark, tier).collect()


def test_tier_compaction_preserves_served_index(spark, sf_dir, tmp_path):
    """Compacting the partial tier (insertions + a retraction) changes
    neither the served postings nor their counts, and leaves one batch."""
    from hadoop_invertedindexer_spark.functions.textprep import prepare_tokens
    from hadoop_invertedindexer_spark.operators.index import term_doc_counts
    from hadoop_invertedindexer_spark.plans.contract import STOPWORDS_DEMO
    from hadoop_invertedindexer_spark.sources.tables import read_table
    from hadoop_invertedindexer_spark.streaming.index_maintenance import (
        compact_term_index_tier,
        read_term_index_tier,
        retract_documents,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    tier = str(tmp_path / "tier")
    for i, half in enumerate((docs.where(F.col("doc_id") % 2 == 0),
                              docs.where(F.col("doc_id") % 2 == 1))):
        toks = prepare_tokens(
            half.select("doc_id", F.col("text").alias("line")),
            stopwords=STOPWORDS_DEMO,
        )
        term_doc_counts(toks, doc_col="doc_id").write.parquet(f"{tier}/batch={i}")
    retract_documents(
        spark, docs.where(F.col("doc_id") < 5), tier, "r1", stopwords=STOPWORDS_DEMO
    )

    before = {
        (r.word, r.doc_id, r["count"])
        for r in read_term_index_tier(spark, tier).collect()
    }
    compact_term_index_tier(spark, tier)
    after = {
        (r.word, r.doc_id, r["count"])
        for r in read_term_index_tier(spark, tier).collect()
    }
    assert after == before and after
    assert spark.read.parquet(tier).select("batch").distinct().count() == 1


def test_hourly_anomalies_flags_planted_spike(spark):
    """Constant 5-events/hour background with one 60-event spike: the
    spike (and only hours near it whose baseline it inflates) is
    flagged; in particular the spike hour itself must be flagged."""
    import datetime as dtt

    from hadoop_invertedindexer_spark.streaming.events import hourly_anomalies

    base = dtt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(72):
        n = 60 if h == 48 else 5
        for i in range(n):
            rows.append((eid, "click", 7, base + dtt.timedelta(hours=h, minutes=i % 60)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, event_type string, user_id long, ts timestamp")
    got = {r.hour for r in hourly_anomalies(ev, z=3.0).collect()}
    assert base + dtt.timedelta(hours=48) in got
    # quiet hours before the spike are never flagged
    assert not any(h < base + dtt.timedelta(hours=48) for h in got)


def test_cohort_retention_hand_computed(spark):
    """Two users: user 10 starts week 0 and returns week 1; user 20
    starts week 1 -> retention(w0,0)=1.0, (w0,1)=1.0, (w1,0)=1.0."""
    import datetime as dtt

    from hadoop_invertedindexer_spark.streaming.events import cohort_retention

    w0 = dtt.datetime(2024, 1, 1)  # a Monday
    w1 = w0 + dtt.timedelta(days=7)
    ev = spark.createDataFrame(
        [(1, 10, w0), (2, 10, w0 + dtt.timedelta(days=2)),
         (3, 10, w1 + dtt.timedelta(days=1)), (4, 20, w1)],
        "event_id long, user_id long, ts timestamp",
    ).selectExpr("event_id", "user_id % 100 as user_id", "ts")
    # user 10: weeks 0 and 1; user 20: week 1 only
    got = {(str(r.cohort.date()), r.week_n): (r.n_active, r.retention)
           for r in cohort_retention(ev).collect()}
    assert got == {
        ("2024-01-01", 0): (1, 1.0),
        ("2024-01-01", 1): (1, 1.0),
        ("2024-01-08", 0): (1, 1.0),
    }


def test_sketch_tier_estimates_equal_batch_path(spark, sf_dir, tmp_path):
    """HLL register-merge is exact: daily distinct-user estimates from
    the streamed two-batch sketch tier equal the single-pass batch
    estimates, value for value."""
    import glob as g
    import os

    from hadoop_invertedindexer_spark.sources.tables import read_table
    from hadoop_invertedindexer_spark.streaming.events import (
        daily_distinct_users_from_sketches,
        hourly_user_sketches,
        maintain_user_sketch_tier,
        read_user_sketch_tier,
    )

    ev = read_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(src + "/a")
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(src + "/b")
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    for i, f in enumerate(sorted(g.glob(src + "/*/part-*.parquet"))):
        os.symlink(f, f"{stage}/batch{i}.parquet")

    tier = str(tmp_path / "tier")
    maintain_user_sketch_tier(
        spark, stage, spark.read.parquet(stage).schema, tier,
        str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    assert spark.read.parquet(tier).select("batch").distinct().count() == 2

    streamed = {
        (r.day, r.event_type): (r.approx_users, r.n_events)
        for r in daily_distinct_users_from_sketches(
            read_user_sketch_tier(spark, tier)
        ).collect()
    }
    direct = {
        (r.day, r.event_type): (r.approx_users, r.n_events)
        for r in daily_distinct_users_from_sketches(
            hourly_user_sketches(ev)
        ).collect()
    }
    assert streamed == direct and streamed


def test_histogram_p95_within_one_bin_of_exact(spark, sf_dir):
    """The histogram-tier estimate must bound the exact discrete p95
    from above by at most one bin width, for every (day, type)."""
    from hadoop_invertedindexer_spark.streaming.events import (
        HIST_BINS,
        HIST_HI,
        HIST_LO,
        daily_percentile_exact,
        daily_percentile_from_histograms,
        hourly_value_histograms,
    )
    from hadoop_invertedindexer_spark.sources.tables import read_table

    ev = read_table(spark, sf_dir, "events")
    width = (HIST_HI - HIST_LO) / HIST_BINS
    est = {
        (r.day, r.event_type): r.p_est
        for r in daily_percentile_from_histograms(
            hourly_value_histograms(ev), q=0.95
        ).collect()
    }
    exact = {
        (r.day, r.event_type): r.p_exact
        for r in daily_percentile_exact(ev, q=0.95).collect()
    }
    assert est.keys() == exact.keys() and len(est) > 0
    for k, e in exact.items():
        assert e <= est[k] <= e + width, (k, e, est[k])


def test_histogram_tier_merge_equals_direct_daily(spark, sf_dir):
    """Associativity: merging hourly histograms to daily equals binning
    the raw events directly at day grain."""
    from pyspark.sql import functions as F

    from hadoop_invertedindexer_spark.streaming.events import (
        HIST_BINS,
        HIST_HI,
        HIST_LO,
        hourly_value_histograms,
    )
    from hadoop_invertedindexer_spark.sources.tables import read_table

    ev = read_table(spark, sf_dir, "events")
    width = (HIST_HI - HIST_LO) / HIST_BINS
    hourly = hourly_value_histograms(ev)
    merged = sorted(
        map(
            tuple,
            hourly.groupBy(
                F.date_trunc("day", F.col("w.start")).alias("day"),
                "event_type",
                "bin",
            )
            .agg(F.sum("n").alias("n"))
            .collect(),
        )
    )
    b = F.least(
        F.greatest(F.floor((F.col("value") - F.lit(HIST_LO)) / F.lit(width)), F.lit(0)),
        F.lit(HIST_BINS - 1),
    ).cast("int")
    direct = sorted(
        map(
            tuple,
            ev.groupBy(
                F.date_trunc("day", "ts").alias("day"), "event_type", b.alias("bin")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect(),
        )
    )
    assert merged == direct


def test_hist_tier_streamed_equals_batch_bit_exact(spark, sf_dir, tmp_path):
    """Integer bin counts merge associatively, so the streamed two-batch
    histogram tier equals the single-pass batch histograms BIT-EXACTLY
    (stronger than the HLL tier's estimate-equality), and the p95 read
    off either path is identical."""
    import glob as g
    import os

    from hadoop_invertedindexer_spark.sources.tables import read_table
    from hadoop_invertedindexer_spark.streaming.events import (
        daily_percentile_from_histograms,
        hourly_value_histograms,
        maintain_value_hist_tier,
        read_value_hist_tier,
    )

    ev = read_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(src + "/a")
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(src + "/b")
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    for i, f in enumerate(sorted(g.glob(src + "/*/part-*.parquet"))):
        os.symlink(f, f"{stage}/batch{i}.parquet")

    tier = str(tmp_path / "tier")
    maintain_value_hist_tier(
        spark, stage, spark.read.parquet(stage).schema, tier,
        str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    assert spark.read.parquet(tier).select("batch").distinct().count() == 2

    streamed_hist = sorted(
        (r.w.start, r.event_type, r.bin, r.n)
        for r in read_value_hist_tier(spark, tier).collect()
    )
    direct_hist = sorted(
        (r.w.start, r.event_type, r.bin, r.n)
        for r in hourly_value_histograms(ev).collect()
    )
    assert streamed_hist == direct_hist and streamed_hist

    streamed_p95 = sorted(
        map(
            tuple,
            daily_percentile_from_histograms(
                read_value_hist_tier(spark, tier), q=0.95
            ).collect(),
        )
    )
    direct_p95 = sorted(
        map(
            tuple,
            daily_percentile_from_histograms(
                hourly_value_histograms(ev), q=0.95
            ).collect(),
        )
    )
    assert streamed_p95 == direct_p95
