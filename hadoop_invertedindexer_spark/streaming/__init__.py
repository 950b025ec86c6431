"""Streaming surface: batch/streaming twin windowed aggregates over events."""

from hadoop_invertedindexer_spark.streaming.events import (  # noqa: F401
    tumbling_window_agg,
    sliding_window_agg,
    session_window_agg,
    run_streaming_tumbling,
)
