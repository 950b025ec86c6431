"""Flagship pipeline: the reference's entire job as one declarative plan.

Job equivalent of ``hadoop jar invertedindexer.jar InvertedIndexer <in>
<out> -skip <stop> <punct>`` (``/root/reference/README.md:54``,
``src/InvertedIndexer.java:226-262``):

``read.text → +filename → lower → strip punct → tokenize → len/numeric/
stopword filters → groupBy(word,doc).count → groupBy(word).sort_array(
collect_list) → format → orderBy(word) → write.text``

Catalyst plans two exchanges (one per grouping change) plus the final
range exchange for the global sort — matching the reference's one shuffle
+ framework sort, with map-side partial aggregation inserted
automatically (its hand-written combiner, ref :139-151).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_invertedindexer_spark.functions.textprep import prepare_tokens
from hadoop_invertedindexer_spark.operators.index import (
    format_index,
    postings,
    term_doc_counts,
)
from hadoop_invertedindexer_spark.sources.sinks import sink_text
from hadoop_invertedindexer_spark.sources.tables import spread_partitions
from hadoop_invertedindexer_spark.sources.text import (
    load_stopwords,
    scan_text,
)


def inverted_index_lines(
    spark: SparkSession,
    input_dir: str,
    stopwords: list[str],
    lexicographic: bool = True,
    with_observe: bool = False,
) -> DataFrame:
    """input dir -> sorted DataFrame[line] of ``word: doc#cnt, ...``.

    ``with_observe=True`` attaches an ``observe`` metric named
    ``accepted_tokens`` (the reference's INPUT_WORDS counter, ref
    :37,130-133) retrievable via a DataFrame observation listener; exposed
    through :func:`build_inverted_index`.
    """
    lines = scan_text(spark, input_dir)
    toks = prepare_tokens(lines, text_col="line", stopwords=stopwords)
    if with_observe:
        toks = toks.observe("index_metrics", F.count(F.lit(1)).alias("accepted_tokens"))
    counts = term_doc_counts(toks)
    post = postings(counts, lexicographic=lexicographic)
    # Global order is by WORD ascending (binary/UTF-8 order), not by the
    # rendered line: ':' (0x3A) sorts above digits, so a line-sort would
    # misplace digit-bearing words sharing a prefix. Sort before the final
    # projection — the narrow select preserves order.
    return format_index(post.orderBy("word"))


def build_inverted_index(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    stop_file: str,
    single_file: bool = True,
) -> None:
    """Full job: read corpus + side inputs, index, write sorted text."""
    sw = load_stopwords(stop_file)
    df = inverted_index_lines(spark, input_dir, sw)
    sink_text(df, output_dir, single_file=single_file)


def inverted_index_over_documents(
    spark: SparkSession, sf_dir: str, stopwords: list[str] | None = None
) -> DataFrame:
    """The flagship re-targeted at the driver's ``documents`` table
    (doc identity = ``doc_id`` instead of file basename). Used by
    ``__spark_entry__.entry``."""
    docs = spread_partitions(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id"
    ).select(
        F.col("doc_id").cast("string").alias("filename"), F.col("text").alias("line")
    )
    toks = prepare_tokens(docs, text_col="line", stopwords=stopwords or [])
    counts = term_doc_counts(toks)
    post = postings(counts, lexicographic=True)
    return format_index(post.orderBy("word"))
