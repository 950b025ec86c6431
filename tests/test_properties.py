"""Property checks from SURVEY §5: structural invariants of the index that
must hold for ANY corpus, plus the observe-based INPUT_WORDS counter and
order-independence under re-partitioning."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hadoop_invertedindexer_spark.functions.textprep import prepare_tokens
from hadoop_invertedindexer_spark.operators.index import (
    format_index,
    postings,
    postings_via_window,
    term_doc_counts,
)
from hadoop_invertedindexer_spark.plans.flagship import inverted_index_lines
from hadoop_invertedindexer_spark.sources.text import load_stopwords, scan_text

REF = "/root/reference"


@pytest.fixture(scope="module")
def corpus_counts(spark):
    sw = load_stopwords(f"{REF}/skip/stop-word-list.txt")
    toks = prepare_tokens(scan_text(spark, f"{REF}/input"), stopwords=sw)
    return term_doc_counts(toks).persist()


def test_posting_counts_positive_and_sum_to_corpus(spark, corpus_counts):
    stats = corpus_counts.agg(
        F.min("count").alias("min_c"), F.sum("count").alias("total")
    ).first()
    assert stats.min_c >= 1
    assert stats.total == 422310


def test_no_filtered_token_survives(spark, corpus_counts):
    sw = load_stopwords(f"{REF}/skip/stop-word-list.txt")
    bad = corpus_counts.where(
        (F.length("word") < 3)
        | F.col("word").rlike("^[-+]?[0-9]*$")
        | F.col("word").isin(sw)
    )
    assert bad.count() == 0


def test_observe_counter_matches_reference_input_words(spark):
    """The reference's INPUT_WORDS counter (ref :37,130-133) via observe."""
    from pyspark.sql import Observation

    sw = load_stopwords(f"{REF}/skip/stop-word-list.txt")
    toks = prepare_tokens(scan_text(spark, f"{REF}/input"), stopwords=sw)
    obs = Observation("metrics")
    observed = toks.observe(obs, F.count(F.lit(1)).alias("accepted_tokens"))
    observed.write.format("noop").mode("overwrite").save()
    assert obs.get["accepted_tokens"] == 422310


def test_index_is_order_independent(spark):
    """Rebuilding from a shuffled/re-partitioned corpus yields the
    identical index (SURVEY §5) — no hidden order dependence like the
    reference's control-break reducer."""
    sw = load_stopwords(f"{REF}/skip/stop-word-list.txt")
    lines = scan_text(spark, f"{REF}/input")
    base = term_doc_counts(prepare_tokens(lines, stopwords=sw))
    shuffled = term_doc_counts(
        prepare_tokens(lines.repartition(13), stopwords=sw)
    )
    assert base.exceptAll(shuffled).count() == 0
    assert shuffled.exceptAll(base).count() == 0


def test_window_and_array_posting_paths_agree(spark, corpus_counts):
    """The scale fallback (window ranking) must produce the same posting
    order as the array path."""
    arr = postings(corpus_counts).select(
        "word", F.explode("postings").alias("p")
    ).withColumn(
        "posting",
        F.concat_ws(
            "#",
            F.element_at(F.split("p", "#", 2), 2),
            F.element_at(F.split("p", "#", 2), 1),
        ),
    ).select("word", "posting")
    win = postings_via_window(corpus_counts).select("word", "posting")
    assert arr.exceptAll(win).count() == 0
    assert win.exceptAll(arr).count() == 0


def test_incremental_merge_equals_full_rebuild(spark):
    """Index maintenance: tokenize two corpus halves separately, merge the
    aggregates — must equal a full rebuild (associativity of the sum)."""
    sw = load_stopwords(f"{REF}/skip/stop-word-list.txt")
    lines = scan_text(spark, f"{REF}/input").persist()
    full = term_doc_counts(prepare_tokens(lines, stopwords=sw))
    half_a = lines.where(F.substring("filename", 13, 1) < "m")
    half_b = lines.where(F.substring("filename", 13, 1) >= "m")
    from hadoop_invertedindexer_spark.operators.index import merge_term_doc_counts

    merged = merge_term_doc_counts(
        term_doc_counts(prepare_tokens(half_a, stopwords=sw)),
        term_doc_counts(prepare_tokens(half_b, stopwords=sw)),
    )
    assert full.exceptAll(merged).count() == 0
    assert merged.exceptAll(full).count() == 0
    lines.unpersist()


def test_format_round_trip_parses_back(spark, corpus_counts):
    """Every formatted line parses back to (word, postings) with counts
    summing to the term's corpus frequency."""
    lines = format_index(postings(corpus_counts))
    parsed = lines.select(
        F.split("line", ": ", 2)[0].alias("word"),
        F.explode(F.split(F.split("line", ": ", 2)[1], ", ")).alias("p"),
    ).select(
        "word",
        F.element_at(F.split("p", "#"), -1).cast("long").alias("cnt"),
    )
    re_summed = parsed.groupBy("word").agg(F.sum("cnt").alias("total"))
    direct = corpus_counts.groupBy("word").agg(F.sum("count").alias("total"))
    assert re_summed.exceptAll(direct).count() == 0


def test_null_key_semantics_pinned(spark):
    """Engine-level null contracts: equi-joins drop null keys on both
    sides, eqNullSafe matches them, and groupBy collects nulls into one
    group — the semantics every maintenance/dedup op here relies on."""
    import pyspark.sql.functions as F

    left = spark.createDataFrame([(1, "a"), (None, "b"), (None, "c")], "k int, v string")
    right = spark.createDataFrame([(1, "x"), (None, "y")], "k int, w string")

    assert left.join(right, "k").count() == 1  # null keys never equi-match
    null_safe = left.join(right, left.k.eqNullSafe(right.k)).count()
    assert null_safe == 1 + 2 * 1  # (1,x) plus both null rows x (None,y)
    groups = {r.k: r.n for r in left.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert groups == {1: 1, None: 2}  # one combined null group
