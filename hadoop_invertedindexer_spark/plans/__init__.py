"""End-to-end pipelines (composed plans)."""

from hadoop_invertedindexer_spark.plans.flagship import (  # noqa: F401
    inverted_index_lines,
    build_inverted_index,
    inverted_index_over_documents,
)
