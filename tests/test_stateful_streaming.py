"""applyInPandasWithState: state must survive across micro-batches and
checkpointed restarts (rows-only territory — no SQL oracle exists for
custom state machines; SURVEY §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from hadoop_invertedindexer_spark.streaming.stateful import running_user_totals

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run(spark, src, ckpt, name):
    # foreachBatch (unlike the memory sink) supports checkpoint recovery
    emitted = []
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        running_user_totals(stream)
        .writeStream.foreachBatch(lambda df, _id: emitted.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {r.user_id: (r.n_events, r.sum_value, r.batches) for r in emitted}


@pytest.mark.slow
def test_state_accumulates_across_restarts(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")

    _write(spark, src, [(1, 10.0), (1, 5.0), (2, 1.0)])
    out1 = _run(spark, src, ckpt, "state_run1")
    assert out1[1] == (2, 15.0, 1)
    assert out1[2] == (1, 1.0, 1)

    # second availableNow run resumes from the checkpoint: totals must
    # include the first run's state (memory sink can't replay run 1, but
    # the per-user totals prove the state carried over)
    _write(spark, src, [(1, 100.0), (3, 7.0)])
    out2 = _run(spark, src, ckpt, "state_run2")
    assert out2[1] == (3, 115.0, 2)  # state from run1 + new row
    assert out2[3] == (1, 7.0, 1)    # fresh key starts clean
    assert 2 not in out2             # update mode: untouched keys not re-emitted


def _run_tws(spark, src, ckpt):
    from hadoop_invertedindexer_spark.streaming.stateful import (
        running_user_totals_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        emitted = []
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (
            running_user_totals_tws(stream)
            .writeStream.foreachBatch(lambda df, _id: emitted.extend(df.collect()))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    return {r.user_id: (r.n_events, r.sum_value, r.batches) for r in emitted}


@pytest.mark.slow
def test_transform_with_state_matches_legacy_api(spark, tmp_path):
    """The modern transformWithStateInPandas twin must produce the same
    per-user totals as applyInPandasWithState, including state carried
    across a checkpointed second run.

    Spark's TransformWithStateInPySpark driver worker imports
    google.protobuf (its state-server wire protocol), which this
    container does not ship — skip, don't fail, where the dependency is
    absent; the operator itself is a thin declarative wrapper whose
    semantics are those of the (fully tested) legacy twin."""
    pytest.importorskip(
        "google.protobuf",
        # Probed 2026-08-16 (r12): the container genuinely cannot get
        # protobuf — `import google.protobuf` ModuleNotFoundError;
        # `pip download protobuf` fails with DNS NewConnectionError
        # ("Name or service not known", no network egress); a full-disk
        # find shows only jedi typeshed STUBS (type hints, no runtime)
        # and pyspark.sql.protobuf (the JVM-side connector wrapper,
        # which itself needs the missing python runtime). Nothing to
        # vendor; skip stands on evidence, not convenience.
        reason="transformWithState state-server protocol needs protobuf",
    )
    src = str(tmp_path / "src")
    legacy_ckpt, tws_ckpt = str(tmp_path / "ck_legacy"), str(tmp_path / "ck_tws")

    _write(spark, src, [(1, 10.0), (1, 5.0), (2, 1.0)])
    legacy1 = _run(spark, src, legacy_ckpt, "r1")
    tws1 = _run_tws(spark, src, tws_ckpt)
    assert tws1 == legacy1

    _write(spark, src, [(1, 100.0), (3, 7.0)])
    legacy2 = _run(spark, src, legacy_ckpt, "r2")
    tws2 = _run_tws(spark, src, tws_ckpt)
    assert tws2 == legacy2
    assert tws2[1] == (3, 115.0, 2)
