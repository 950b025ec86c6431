"""The driver harness builds its OWN SparkSession without the engine's
session.py defaults. Every contract query must self-provision what it
needs (nanos parquet handling, UTC alignment) — simulated here with a
newSession() whose confs are deliberately broken."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_events_queries_survive_unconfigured_session(spark):
    ns = spark.newSession()
    ns.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    ns.conf.set("spark.sql.session.timeZone", "America/New_York")
    qs = entrymod.queries()
    # events-reading queries must fix the session themselves
    assert qs["events_tumbling"](ns, "/root/testdata/sf0.01").count() > 0
    assert ns.conf.get("spark.sql.session.timeZone") == "UTC"


def test_events_queries_survive_ntz_inference(spark):
    """Spark 4's driver-default session infers parquet TIMESTAMP(MICROS,
    isAdjustedToUTC=false) as TIMESTAMP_NTZ (``inferTimestampNTZ`` is on by
    default) — the round-3 regression: ``unix_micros(ts)`` throws
    DATATYPE_MISMATCH on an NTZ column. Every ``ts`` consumer must come out
    of read_table with a plain TIMESTAMP regardless of the host session."""
    ns = spark.newSession()
    ns.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    ns.conf.set("spark.sql.session.timeZone", "America/New_York")
    qs = entrymod.queries()
    sf = "/root/testdata/sf0.01"
    for name in (
        "funnel_conversion",      # unix_micros in agg — the r3 red row
        "window_trailing_range",  # unix_micros in projection — the r3 red row
        "asof_join",              # unix_timestamp consumer
        "range_join",             # unix_timestamp consumer
        "events_tumbling",        # window() consumer
    ):
        assert qs[name](ns, sf).count() > 0, name


def test_read_table_normalizes_preexisting_ntz_schema(spark):
    """Even when the conf flip comes too late (host already cached an NTZ
    schema for the file), read_table's per-field rewrite must still hand
    back a plain TIMESTAMP ts."""
    from hadoop_invertedindexer_spark.sources.tables import read_table

    ns = spark.newSession()
    ns.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    # force an NTZ read, then confirm read_table normalizes the dtype
    raw = ns.read.parquet("/root/testdata/sf0.01/events.parquet")
    df = read_table(ns, "/root/testdata/sf0.01", "events")
    ts_type = dict(df.dtypes)["ts"]
    assert ts_type == "timestamp", (raw.schema["ts"].dataType, ts_type)


def test_entry_survives_unconfigured_session(spark):
    ns = spark.newSession()
    ns.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    assert entrymod.entry(ns).count() > 0


def test_r8_queries_survive_unconfigured_session(spark):
    """Round-8 tripwire currency (VERDICT r7 ask 8): the new operators
    must run under the driver's own un-tuned session too — none read
    events, so this pins that they self-provision everything they need
    (spread, persists, broadcast thresholds) without session.py."""
    ns = spark.newSession()
    ns.conf.set("spark.sql.session.timeZone", "America/New_York")
    qs = entrymod.queries()
    sf = "/root/testdata/sf0.001"
    for name in ("dedup_substrings", "ngram_nll", "bpe_train", "ivf_drift"):
        assert qs[name](ns, sf).count() > 0, name
