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


def test_entry_survives_unconfigured_session(spark):
    ns = spark.newSession()
    ns.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    assert entrymod.entry(ns).count() > 0
