"""Contract queries for the streaming surface (batch/streaming twins).

The batch twins are oracle-checked against DuckDB (``time_bucket`` for
tumbling, a two-bucket union for sliding, gaps-and-islands for sessions).
The structured-streaming run processes the same static parquet in one
availableNow trigger, so its result must equal the batch twin — it reuses
the tumbling oracle, giving the streaming path a full value check instead
of the weaker rows-only one.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hadoop_invertedindexer_spark.sources.tables import read_table
from hadoop_invertedindexer_spark.streaming.events import (
    cohort_retention,
    daily_distinct_users_exact,
    daily_distinct_users_from_sketches,
    daily_from_hourly,
    enrich_by_dim,
    hourly_anomalies,
    hourly_rollup_exact,
    hourly_user_sketches,
    purchase_error_pairs,
    resample_hourly_gapfill,
    run_streaming_enrich,
    run_streaming_interval_join,
    run_streaming_session,
    run_streaming_tumbling,
    session_window_agg,
    sliding_window_agg,
    streaming_dedup,
    tumbling_window_agg,
)


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_window_agg(read_table(spark, sf_dir, "events"))


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_window_agg(read_table(spark, sf_dir, "events"))


def q_events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_window_agg(read_table(spark, sf_dir, "events"))


def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ckpt = tempfile.mkdtemp(prefix="hii_stream_ckpt_")
    return run_streaming_tumbling(spark, sf_dir, ckpt)


def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ckpt = tempfile.mkdtemp(prefix="hii_stream_ckpt_")
    return run_streaming_session(spark, sf_dir, ckpt)


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ckpt = tempfile.mkdtemp(prefix="hii_stream_ckpt_")
    return streaming_dedup(spark, sf_dir, ckpt)


def q_events_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate tiering: daily re-aggregated from the hourly
    tier; the oracle computes daily directly from raw events, proving the
    tiers compose without drift."""
    return daily_from_hourly(hourly_rollup_exact(read_table(spark, sf_dir, "events")))


def q_events_daily_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (inherent: DuckDB's HLL is a different sketch
    implementation, estimates differ): daily distinct users by merging
    hourly HLL sketches. The ±2% estimate-vs-exact bound is pinned in
    tests/test_streaming.py; the exact oracle-checked ground is
    ``events_daily_distinct_users_exact``."""
    ev = read_table(spark, sf_dir, "events")
    return daily_distinct_users_from_sketches(hourly_user_sketches(ev))


def q_events_daily_distinct_users_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-level distinct twin of the sketch tier (oracle-paired)."""
    return daily_distinct_users_exact(read_table(spark, sf_dir, "events"))


def q_events_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly grid per event_type (n = 0 on silent hours) —
    densification before grid-assuming window analytics."""
    return resample_hourly_gapfill(read_table(spark, sf_dir, "events"))


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix over events."""
    return cohort_retention(read_table(spark, sf_dir, "events"))


def q_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours whose volume deviates > 2σ from the trailing gap-filled day
    (integer-exact moment sums → deterministic z-scores)."""
    return hourly_anomalies(read_table(spark, sf_dir, "events"), z=2.0)


def q_events_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F  # noqa: F401

    return enrich_by_dim(
        read_table(spark, sf_dir, "events"), read_table(spark, sf_dir, "customer")
    )


def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    ckpt = tempfile.mkdtemp(prefix="hii_stream_ckpt_")
    return run_streaming_enrich(spark, sf_dir, ckpt)


def q_events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = read_table(spark, sf_dir, "events")
    return purchase_error_pairs(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "error"),
    )


def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ckpt = tempfile.mkdtemp(prefix="hii_stream_ckpt_")
    return run_streaming_interval_join(spark, sf_dir, ckpt)


def q_events_daily_p95_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily p95 of value read off the merged hourly fixed-bin histogram
    tier — mergeable quantiles with bit-exact integer counts (unlike
    t-digest/KLL internals), fully oracle-checkable, error bounded by
    one bin width against the exact twin."""
    from hadoop_invertedindexer_spark.streaming.events import (
        daily_percentile_from_histograms,
        hourly_value_histograms,
    )

    ev = read_table(spark, sf_dir, "events")
    return daily_percentile_from_histograms(hourly_value_histograms(ev), q=0.95)


def q_events_daily_p95_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete-percentile twin: the data value at rank
    ceil(0.95 n) — no interpolation arithmetic, bit-identical selection
    in both engines."""
    from hadoop_invertedindexer_spark.streaming.events import daily_percentile_exact

    return daily_percentile_exact(read_table(spark, sf_dir, "events"), q=0.95)


STREAMING_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_tumbling": q_events_tumbling,
    "events_sliding": q_events_sliding,
    "events_session": q_events_session,
    "stream_tumbling": q_stream_tumbling,
    "stream_session": q_stream_session,
    "stream_dedup": q_stream_dedup,
    "events_daily_rollup": q_events_daily_rollup,
    "events_resample": q_events_resample,
    "cohort_retention": q_cohort_retention,
    "hourly_anomalies": q_hourly_anomalies,
    "events_daily_distinct_users": q_events_daily_distinct_users,
    "events_daily_distinct_users_exact": q_events_daily_distinct_users_exact,
    "events_enrich": q_events_enrich,
    "stream_enrich": q_stream_enrich,
    "events_interval_join": q_events_interval_join,
    "stream_interval_join": q_stream_interval_join,
    "events_daily_p95_hist": q_events_daily_p95_hist,
    "events_daily_p95_exact": q_events_daily_p95_exact,
}

_TUMBLING_SQL = """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS ws,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS we,
           event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2, 3"""

# Sliding 1h/30m: every event belongs to exactly 2 windows — the one
# starting at its 30-min bucket and the one 30 min earlier.
_SLIDING_SQL = """
    SELECT ws, ws + INTERVAL '1 hour' AS we, event_type,
           count(*) AS n, round(sum(value), 2) AS sum_value
    FROM (
        SELECT time_bucket(INTERVAL '30 minutes', ts)
                   - k.k * INTERVAL '30 minutes' AS ws,
               event_type, value
        FROM events, (SELECT unnest([0, 1]) AS k) k
    ) t
    GROUP BY 1, 2, 3"""

# Sessions: new session when the gap from the previous event is >= 30 min
# (Spark session windows are half-open [start, last + gap)).
_SESSION_SQL = """
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL '30 minutes'
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           count(*) AS n, round(sum(value), 2) AS sum_value
    FROM numbered GROUP BY user_id, session_id"""

_ENRICH_SQL = """
    SELECT c_mktsegment, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment"""

_INTERVAL_JOIN_SQL = """
    SELECT a.event_id AS p_id, b.event_id AS e_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'purchase' AND b.event_type = 'error'
     AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts + INTERVAL 1 HOUR"""

STREAMING_ORACLE_SQL: dict[str, str] = {
    "events_tumbling": _TUMBLING_SQL,
    "events_sliding": _SLIDING_SQL,
    "events_session": _SESSION_SQL,
    # the streaming twins must reproduce their batch results exactly
    "stream_tumbling": _TUMBLING_SQL,
    "stream_session": _SESSION_SQL,
    # which physical row survives streaming dedup is nondeterministic;
    # the surviving KEY SET equals plain DISTINCT
    "stream_dedup": "SELECT DISTINCT user_id, event_type FROM events",
    # histogram quantile tier: fixed grid [0, 512) x 64 bins restated
    # verbatim — integer counts make every merge and the percentile
    # read-off bit-exact (lockstep with events.hourly_value_histograms /
    # daily_percentile_from_histograms)
    "events_daily_p95_hist": """
        WITH hourly AS (
            SELECT time_bucket(INTERVAL '1 hour', ts) AS h, event_type,
                   least(greatest(floor((value - 0.0) / 8.0), 0), 63)::INT AS bin,
                   count(*) AS n
            FROM events GROUP BY 1, 2, 3),
        daily AS (
            SELECT date_trunc('day', h) AS day, event_type, bin, sum(n) AS n
            FROM hourly GROUP BY 1, 2, 3),
        c AS (
            SELECT day, event_type, bin, n,
                   sum(n) OVER (PARTITION BY day, event_type ORDER BY bin
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cum,
                   sum(n) OVER (PARTITION BY day, event_type) AS total
            FROM daily)
        SELECT day, event_type, max(total)::BIGINT AS n_events,
               (0.0 + (min(bin) + 1) * 8.0) AS p_est
        FROM c WHERE cum >= ceil(0.95 * total)
        GROUP BY day, event_type""",
    # exact discrete percentile: the value at rank ceil(0.95 n) — no
    # interpolation, both engines select the identical stored double
    "events_daily_p95_exact": """
        WITH ranked AS (
            SELECT date_trunc('day', ts) AS day, event_type, value,
                   row_number() OVER (PARTITION BY date_trunc('day', ts),
                                      event_type ORDER BY value) AS rn,
                   count(*) OVER (PARTITION BY date_trunc('day', ts),
                                  event_type) AS total
            FROM events)
        SELECT day, event_type, total::BIGINT AS n_events, value AS p_exact
        FROM ranked WHERE rn = ceil(0.95 * total)""",
    "cohort_retention": """
        WITH first AS (
            SELECT user_id, date_trunc('week', min(ts)) AS cohort
            FROM events GROUP BY user_id),
        active AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS week
            FROM events),
        sizes AS (SELECT cohort, count(*) AS n_users FROM first GROUP BY cohort),
        ret AS (
            SELECT f.cohort,
                   (date_diff('day', f.cohort, a.week) / 7)::BIGINT AS week_n,
                   count(DISTINCT a.user_id) AS n_active
            FROM active a JOIN first f ON a.user_id = f.user_id
            GROUP BY 1, 2)
        SELECT r.cohort, r.week_n, r.n_active,
               round(r.n_active / s.n_users::DOUBLE, 6) AS retention
        FROM ret r JOIN sizes s ON r.cohort = s.cohort""",
    "hourly_anomalies": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
            FROM events GROUP BY 1, 2),
        spans AS (
            SELECT event_type, min(hour) AS h0, max(hour) AS h1
            FROM hourly GROUP BY 1),
        grid AS (
            SELECT s.event_type,
                   unnest(generate_series(s.h0, s.h1, INTERVAL 1 HOUR)) AS hour
            FROM spans s),
        dense AS (
            SELECT g.event_type, g.hour, coalesce(h.n, 0)::BIGINT AS n
            FROM grid g
            LEFT JOIN hourly h
              ON h.event_type = g.event_type AND h.hour = g.hour),
        windowed AS (
            SELECT event_type, hour, n,
                   count(*) OVER w AS m,
                   sum(n) OVER w AS s1,
                   sum(n * n) OVER w AS s2
            FROM dense
            WINDOW w AS (PARTITION BY event_type ORDER BY hour
                         ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        SELECT event_type, hour, n, zscore FROM (
            SELECT event_type, hour, n,
                   round((n - s1 / m::DOUBLE)
                         / sqrt(greatest((s2 - s1 * s1 / m::DOUBLE)
                                         / (m - 1)::DOUBLE, 1e-12)), 6)
                       AS zscore
            FROM windowed WHERE m = 24) t
        WHERE abs(zscore) > 2.0""",
    "events_resample": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
            FROM events GROUP BY 1, 2),
        spans AS (
            SELECT event_type, min(hour) AS h0, max(hour) AS h1
            FROM hourly GROUP BY 1),
        grid AS (
            SELECT event_type,
                   unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
            FROM spans)
        SELECT g.event_type, g.hour, coalesce(h.n, 0)::BIGINT AS n
        FROM grid g
        LEFT JOIN hourly h
          ON h.event_type = g.event_type AND h.hour = g.hour""",
    "events_daily_rollup": """
        SELECT time_bucket(INTERVAL '1 day', ts) AS day, event_type,
               count(*) AS n,
               round(sum(value::DECIMAL(18,6)), 2)::DOUBLE AS sum_value
        FROM events GROUP BY 1, 2""",
    "events_daily_distinct_users_exact": """
        SELECT date_trunc('day', ts) AS day, event_type,
               count(DISTINCT user_id)::BIGINT AS n_users
        FROM events GROUP BY 1, 2""",
    "events_enrich": _ENRICH_SQL,
    # stream-static join on one availableNow pass == the batch twin
    "stream_enrich": _ENRICH_SQL,
    "events_interval_join": _INTERVAL_JOIN_SQL,
    # stream-stream append emits each matched pair exactly once
    "stream_interval_join": _INTERVAL_JOIN_SQL,
}
