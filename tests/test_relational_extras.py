"""Cross-checks for front-door SQL features whose oracle is the same
ANSI text on both engines — plus an engine-internal invariant the text
itself can't assert."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_invertedindexer_spark.operators.relational import q_sql_api_recursive
from hadoop_invertedindexer_spark.sources.tables import read_table


def test_recursive_chain_length_equals_order_count(spark, sf_dir):
    """The linked-list traversal's depth per customer must equal the
    plain COUNT(*) of their orders — a recursion-free invariant that
    catches a silently truncated fixpoint."""
    got = {
        r.o_custkey: r.chain_len
        for r in q_sql_api_recursive(spark, sf_dir).collect()
    }
    want = {
        r.o_custkey: r.n
        for r in read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0
