"""Dataflow operators (DataFrame -> DataFrame transforms)."""

from hadoop_invertedindexer_spark.operators.index import (  # noqa: F401
    term_doc_counts,
    postings,
    format_index,
)
