"""AQE skew-join handling, demonstrated on a planted hot key.

The session defaults turn on ``spark.sql.adaptive.skewJoin.enabled``
(session.py) — this test proves the knob actually fires: a sort-merge
join whose left side has one pathological key must show split skew
partitions (``skew=true`` on the SMJ node) in the final adaptive plan.
At 100 TB this is the difference between one straggler task owning the
hot key's entire partition and N parallel splits of it; the thresholds
here are shrunk only because the fixture is MBs, not TBs.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_planted_skewed_join(spark):
    confs = {
        # shrink the skew thresholds so a few-MB hot partition qualifies
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # no broadcast, no demotion: force a genuine shuffle join
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # left: 400k rows on hot key 0, 100k spread over 1k keys; the
        # payload is a sha2 hex digest so the hot shuffle partition stays
        # multi-MB AFTER lz4 compression (a repetitive payload compresses
        # under the skew threshold and the demo silently vanishes)
        left = spark.range(500_000).select(
            F.when(F.col("id") < 400_000, F.lit(0))
            .otherwise(F.col("id") % 1_000)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pay"),
        )
        right = spark.range(1_000).select(
            F.col("id").alias("k"), F.col("id").alias("rv")
        )
        # NOTE: the consumer must NOT re-require the join's hash
        # partitioning (e.g. groupBy("k")) — AQE refuses to split a skewed
        # partition when a downstream operator would need the original
        # distribution back. A global aggregate keeps the join output
        # distribution-free, which is where OptimizeSkewedJoin applies.
        # max("pay") keeps the wide payload column alive through the
        # shuffle — without a consumer, column pruning strips it and the
        # hot partition shrinks below any skew threshold
        joined = left.join(right, "k").agg(
            F.count(F.lit(1)).alias("n"), F.max("pay").alias("mp")
        )
        row = joined.collect()[0]
        assert row.n == 500_000  # every left row matches exactly one right row
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # the SMJ node prints skew=true once AQE replaced the hot
        # partition with parallel splits
        smj = [ln for ln in plan.splitlines() if "SortMergeJoin" in ln]
        assert smj and any("skew=true" in ln for ln in smj), plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
