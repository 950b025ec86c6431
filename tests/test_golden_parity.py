"""Golden-file parity: flagship pipeline vs the reference's committed run.

The reference's correctness story is its committed output
(``/root/reference/output/part-r-00000``, 23,596 lines) produced from
``input/`` + both skip files (SURVEY §5). This test reruns the same
workload through the Spark pipeline and byte-compares.
"""

from __future__ import annotations

import pytest

from hadoop_invertedindexer_spark.plans.flagship import inverted_index_lines
from hadoop_invertedindexer_spark.sources.text import (
    load_punctuation_class,
    load_stopwords,
)
from hadoop_invertedindexer_spark.functions import textprep

REF = "/root/reference"
GOLDEN = f"{REF}/output/part-r-00000"

pytestmark = pytest.mark.golden


@pytest.fixture(scope="module")
def golden_lines() -> list[str]:
    with open(GOLDEN, encoding="utf-8") as f:
        return [line.rstrip("\n") for line in f]


def test_punctuation_class_matches_committed_constant():
    # the file-derived class must equal the hardcoded fast-path constant
    derived = load_punctuation_class(f"{REF}/skip/punctuation.txt")
    assert sorted(set(derived)) == sorted(set(textprep.PUNCT_CHAR_CLASS))


def test_stopwords_verbatim():
    sw = load_stopwords(f"{REF}/skip/stop-word-list.txt")
    assert len(sw) == 319
    assert 'herse"' in sw  # quirk entries loaded verbatim, not "fixed"


def test_side_inputs_crlf_line_endings(tmp_path):
    # BufferedReader.readLine strips \r\n as well as \n — a CRLF-saved
    # file must yield identical entries, with no trailing \r (ADVICE r1).
    crlf_sw = tmp_path / "stop.txt"
    crlf_sw.write_bytes(b"the\r\nof\r\nherse\"\r\n")
    assert load_stopwords(str(crlf_sw)) == ["the", "of", 'herse"']
    crlf_punct = tmp_path / "punct.txt"
    crlf_punct.write_bytes(b"\\!\r\n\\.\r\n\\-\r\n")
    assert load_punctuation_class(str(crlf_punct)) == "[!.-]"


def test_golden_byte_parity(spark, golden_lines):
    sw = load_stopwords(f"{REF}/skip/stop-word-list.txt")
    df = inverted_index_lines(spark, f"{REF}/input", sw)
    got = [r.line for r in df.collect()]
    assert len(got) == 23596
    # compare contents first for a useful diff on failure
    assert set(got) == set(golden_lines)
    # then exact global order
    assert got == golden_lines


def test_workload_invariants(spark):
    """SURVEY §5: counter + posting invariants of the golden corpus."""
    from hadoop_invertedindexer_spark.functions.textprep import prepare_tokens
    from hadoop_invertedindexer_spark.operators.index import term_doc_counts
    from hadoop_invertedindexer_spark.sources.text import scan_text
    import pyspark.sql.functions as F

    sw = load_stopwords(f"{REF}/skip/stop-word-list.txt")
    toks = prepare_tokens(scan_text(spark, f"{REF}/input"), stopwords=sw)
    counts = term_doc_counts(toks).cache()
    try:
        stats = counts.agg(
            F.sum("count").alias("tokens"),
            F.count(F.lit(1)).alias("postings"),
            F.countDistinct("word").alias("terms"),
            F.max("count").alias("max_count"),
        ).first()
        assert stats.tokens == 422310  # INPUT_WORDS counter
        assert stats.postings == 122919
        assert stats.terms == 23596
        assert stats.max_count == 494
    finally:
        counts.unpersist()


def test_golden_parity_many_file_scale_path(spark, golden_lines, tmp_path):
    """The 100 TB layout claim, byte-proven: with ``single_file=False``
    the sink writes one file per RANGE partition of the global sort, so
    concatenating the part files in filename (= partition) order must
    reproduce the golden file byte-for-byte — total order preserved
    across many files with no driver-side coalesce."""
    import glob

    from hadoop_invertedindexer_spark.plans.flagship import build_inverted_index

    out = str(tmp_path / "idx")
    # at 4.8 MiB AQE's partition coalescing collapses the range sort to
    # one partition (correct at this size); pin it off so the many-file
    # layout the claim is about actually materializes
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        build_inverted_index(
            spark,
            f"{REF}/input",
            out,
            f"{REF}/skip/stop-word-list.txt",
            single_file=False,
        )
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    parts = sorted(glob.glob(out + "/part-*"))
    assert len(parts) > 1  # genuinely many files, not a hidden coalesce
    data = b"".join(open(p, "rb").read() for p in parts)
    assert data == open(GOLDEN, "rb").read()
