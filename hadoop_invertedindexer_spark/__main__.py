"""CLI entry point — op `cli_args` (SURVEY §2A #19).

Mirrors the reference's argument contract
(``/root/reference/src/InvertedIndexer.java:226-257``, usage
``InvertedIndexer <in> <out> -skip <stopfile> <punctfile>``) on the
engine:

    python -m hadoop_invertedindexer_spark <in> <out> \
        [-skip <stopfile> <punctfile>] [--multi-file] [--numeric-postings]

Without ``-skip`` no stop-word/punctuation filtering happens — matching
the reference's conf-flag-gated setup (ref :53-63). ``--multi-file``
disables the single-sorted-file compat mode for scale runs.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F

from hadoop_invertedindexer_spark.functions import textprep
from hadoop_invertedindexer_spark.operators.index import (
    format_index,
    postings,
    term_doc_counts,
)
from hadoop_invertedindexer_spark.session import get_spark
from hadoop_invertedindexer_spark.sources.sinks import sink_text
from hadoop_invertedindexer_spark.sources.text import (
    load_punctuation_class,
    load_stopwords,
    scan_text,
)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="hadoop_invertedindexer_spark",
        description="Build a frequency-ranked inverted index over a text dir.",
    )
    ap.add_argument("input_dir")
    ap.add_argument("output_dir")
    ap.add_argument(
        "-skip",
        nargs=2,
        metavar=("STOPFILE", "PUNCTFILE"),
        help="stop-word list and punctuation pattern file (reference order)",
    )
    ap.add_argument(
        "--multi-file",
        action="store_true",
        help="write one file per partition instead of the single-file compat mode",
    )
    ap.add_argument(
        "--numeric-postings",
        action="store_true",
        help="rank postings numerically by count (sane mode) instead of the "
        "reference's reverse-lexicographic string sort",
    )
    args = ap.parse_args(argv)

    spark = get_spark(app_name="inverted-indexer-cli")
    try:
        lines = scan_text(spark, args.input_dir)
        if args.skip:
            stopwords = load_stopwords(args.skip[0])
            punct_class = load_punctuation_class(args.skip[1])
            cleaned = lines.withColumn(
                "line",
                F.regexp_replace(textprep.lowercase("line"), punct_class, " "),
            )
        else:
            stopwords = []
            cleaned = lines.withColumn("line", textprep.lowercase("line"))
        toks = textprep.tokenize(cleaned, col="line", out="word").drop("line")
        toks = toks.where(textprep.filter_len("word")).where(
            textprep.filter_numeric("word")
        )
        if stopwords:
            toks = textprep.filter_stopwords(toks, stopwords)
        counts = term_doc_counts(toks)
        post = postings(counts, lexicographic=not args.numeric_postings)
        out = format_index(post.orderBy("word"))
        sink_text(out, args.output_dir, single_file=not args.multi_file)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
