"""Contract queries for the temporal join operators (as-of, range) and the
dedup-cluster resolution.

The as-of oracle uses DuckDB's native ASOF JOIN — strong evidence the
union-merge window composition implements the standard semantics. The
range-join oracle is the naive inequality join — proving the bucketed
rewrite changes the plan, not the answer.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_invertedindexer_spark.operators.clusters import dedup_clusters
from hadoop_invertedindexer_spark.operators.dedup import ngram_jaccard_pairs
from hadoop_invertedindexer_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
)
from hadoop_invertedindexer_spark.sources.tables import read_table


def _orders_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One order row per (custkey, orderdate): keep the max-orderkey row —
    the as-of right side must be unique per (key, time)."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey", "o_orderdate")
        .agg(F.max(F.struct("o_orderkey", "o_totalprice")).alias("m"))
        .select(
            "o_custkey",
            "o_orderdate",
            F.col("m.o_orderkey").alias("o_orderkey"),
            F.round("m.o_totalprice", 2).alias("o_totalprice"),
        )
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event paired with the user's most recent order at event time."""
    e = read_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _orders_unique(spark, sf_dir).withColumnRenamed("o_custkey", "user_id")
    out = asof_join(
        e, o, key="user_id", left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
    )
    return out.select("event_id", "user_id", "o_orderkey", "o_totalprice")


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events within 7 days after each order of the same user, aggregated
    per order — via the bucketed range join."""
    e = read_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"), "ts", "value"
    )
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"), "o_orderkey", "o_orderdate"
    )
    joined = range_join_bucketed(
        e, o, key="k", left_ts="ts", right_start="o_orderdate",
        width_expr="INTERVAL 7 DAYS",
    )
    return joined.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: iterative connected components over jaccard near-dup
    edges (no SQL for the fixpoint loop); fixture-tested in
    tests/test_clusters.py."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.6, max_df=100)
    return dedup_clusters(pairs, docs)


TEMPORAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "dedup_clusters": q_dedup_clusters,
}

TEMPORAL_ORACLE_SQL: dict[str, str] = {
    "asof_join": """
        WITH o AS (
            SELECT o_custkey AS user_id, o_orderdate,
                   max_by(o_orderkey, o_orderkey) AS o_orderkey,
                   round(max_by(o_totalprice, o_orderkey), 2) AS o_totalprice
            FROM orders GROUP BY o_custkey, o_orderdate
        )
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
        FROM events e
        ASOF LEFT JOIN o ON e.user_id = o.user_id AND e.ts >= o.o_orderdate""",
    "range_join": """
        SELECT o_orderkey, count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events e JOIN orders o
          ON e.user_id = o.o_custkey
         AND e.ts >= o.o_orderdate
         AND e.ts < o.o_orderdate + INTERVAL 7 DAYS
        GROUP BY o_orderkey""",
}
