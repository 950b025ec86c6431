"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``hadoop_invertedindexer_spark``; this module
only assembles the contract dicts.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_invertedindexer_spark.operators import relational  # noqa: E402
from hadoop_invertedindexer_spark.plans import contract  # noqa: E402
from hadoop_invertedindexer_spark.plans import contract_llm  # noqa: E402
from hadoop_invertedindexer_spark.plans import contract_pipeline  # noqa: E402
from hadoop_invertedindexer_spark.plans import contract_retrieval  # noqa: E402
from hadoop_invertedindexer_spark.plans import contract_streaming  # noqa: E402
from hadoop_invertedindexer_spark.plans import contract_temporal  # noqa: E402
from hadoop_invertedindexer_spark.plans.flagship import (  # noqa: E402
    inverted_index_over_documents,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's full inverted-index pipeline,
    re-targeted at the sf0.001 documents table (SURVEY §3.3)."""
    return inverted_index_over_documents(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(contract.REFERENCE_QUERIES)
    out.update(relational.RELATIONAL_QUERIES)
    out.update(contract_streaming.STREAMING_QUERIES)
    out.update(contract_llm.LLM_QUERIES)
    out.update(contract_pipeline.PIPELINE_QUERIES)
    out.update(contract_retrieval.RETRIEVAL_QUERIES)
    out.update(contract_temporal.TEMPORAL_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted entries get
    the driver's weaker rows-only check)."""
    out: dict[str, str] = {}
    out.update(contract.REFERENCE_ORACLE_SQL)
    out.update(relational.RELATIONAL_ORACLE_SQL)
    out.update(contract_streaming.STREAMING_ORACLE_SQL)
    out.update(contract_llm.LLM_ORACLE_SQL)
    out.update(contract_pipeline.PIPELINE_ORACLE_SQL)
    out.update(contract_retrieval.RETRIEVAL_ORACLE_SQL)
    out.update(contract_temporal.TEMPORAL_ORACLE_SQL)
    return out
