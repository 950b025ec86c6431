"""Hypothesis property tests for retrieval: phrase and boolean results
must equal a pure-Python reference on arbitrary word-soup corpora, not
just the planted fixtures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from hadoop_invertedindexer_spark.operators.retrieval import (
    boolean_or_search,
    phrase_search,
    positional_tokens,
)

HSETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

VOCAB = ["ant", "bee", "cat", "dog"]
docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


def _py_phrase_count(words: list[str], phrase: list[str]) -> int:
    n = len(phrase)
    return sum(
        1
        for i in range(len(words) - n + 1)
        if words[i : i + n] == phrase
    )


@HSETTINGS
@given(docs=docs_strategy, p0=st.sampled_from(VOCAB), p1=st.sampled_from(VOCAB))
def test_phrase_search_matches_python_reference(spark, docs, p0, p1):
    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n_matches
        for r in phrase_search(positional_tokens(df), [p0, p1]).collect()
    }
    want = {
        i: c
        for i, words in enumerate(docs)
        if (c := _py_phrase_count(words, [p0, p1])) > 0
    }
    assert got == want


@HSETTINGS
@given(docs=docs_strategy, m=st.integers(min_value=1, max_value=3))
def test_boolean_or_matches_python_reference(spark, docs, m):
    terms = VOCAB[:3]
    counts_rows = []
    for i, words in enumerate(docs):
        for w in set(words):
            counts_rows.append((w, str(i), words.count(w)))
    if not counts_rows:
        return
    counts = spark.createDataFrame(counts_rows, "word string, doc string, count long")
    got = {
        r.doc: (r.matched, r.occurrences)
        for r in boolean_or_search(counts, terms, m).collect()
    }
    want = {}
    for i, words in enumerate(docs):
        matched = sum(1 for t in terms if t in words)
        occ = sum(words.count(t) for t in terms)
        if matched >= m:
            want[str(i)] = (matched, occ)
    assert got == want
