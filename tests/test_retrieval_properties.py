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


# --------------------------------------------------------- RRF + ranking


def _py_rrf(lex: list[tuple[int, int]], vec: list[tuple[int, int]], k: int,
            k0: int = 60) -> list[tuple[int, int, int, int]]:
    """Pure-Python reciprocal-rank fusion in exact integer ppb."""
    fused: dict[int, list[int]] = {}
    for doc, r in list(lex) + list(vec):
        fused.setdefault(doc, []).append(1_000_000_000 // (k0 + r))
    rows = sorted(
        ((doc, sum(ps), len(ps)) for doc, ps in fused.items()),
        key=lambda t: (-t[1], t[0]),
    )
    return [
        (doc, ppb, n, i + 1) for i, (doc, ppb, n) in enumerate(rows[:k])
    ]


ranked_list = st.lists(
    st.integers(min_value=0, max_value=20), min_size=0, max_size=8,
    unique=True,
)


@HSETTINGS
@given(lex_docs=ranked_list, vec_docs=ranked_list,
       k=st.integers(min_value=1, max_value=6))
def test_hybrid_rrf_matches_python_reference(spark, lex_docs, vec_docs, k):
    """Fusion of arbitrary disjoint-or-overlapping ranked lists equals
    the pure-Python integer reference — order, ppb, n_lists, and the
    k-truncation all exact."""
    from hadoop_invertedindexer_spark.operators.retrieval import (
        hybrid_search_rrf,
    )

    lex = [(d, i + 1) for i, d in enumerate(lex_docs)]
    vec = [(d, i + 1) for i, d in enumerate(vec_docs)]
    lex_df = spark.createDataFrame(lex or [(None, None)], "doc long, rank long")
    vec_df = spark.createDataFrame(
        vec or [(None, None)], "vec_id long, rank long"
    )
    if not lex:
        lex_df = lex_df.where("doc IS NOT NULL")
    if not vec:
        vec_df = vec_df.where("vec_id IS NOT NULL")
    got = [
        (r.doc, r.rrf_ppb, r.n_lists, r.rank)
        for r in hybrid_search_rrf(lex_df, vec_df, k=k)
        .orderBy("rank")
        .collect()
    ]
    assert got == _py_rrf(lex, vec, k)


@HSETTINGS
@given(
    ranked_docs=ranked_list,
    rels=st.dictionaries(
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=1, max_value=3),
        max_size=8,
    ),
    k=st.integers(min_value=1, max_value=6),
)
def test_ranking_eval_matches_python_reference(spark, ranked_docs, rels, k):
    """MRR / precision@k / DCG / IDCG / nDCG on arbitrary rankings and
    graded relevance equal the pure-Python formulas (round 6)."""
    import math

    from hadoop_invertedindexer_spark.operators.retrieval import ranking_eval

    ranked = [(d, i + 1) for i, d in enumerate(ranked_docs)]
    ranked_df = spark.createDataFrame(
        ranked or [(None, None)], "doc long, rank long"
    )
    if not ranked:
        ranked_df = ranked_df.where("doc IS NOT NULL")
    rel_rows = sorted(rels.items())
    rel_df = spark.createDataFrame(
        rel_rows or [(None, None)], "doc long, rel int"
    )
    if not rel_rows:
        rel_df = rel_df.where("doc IS NOT NULL")
    r = ranking_eval(ranked_df, rel_df, k=k).head()

    top = [(d, rk) for d, rk in ranked if rk <= k]
    hits = [(d, rk) for d, rk in top if rels.get(d, 0) > 0]
    mrr = max((1.0 / rk for _, rk in hits), default=0.0)
    prec = len(hits) / float(k)
    dcg = sum(
        (2.0 ** rels.get(d, 0) - 1.0) / math.log2(rk + 1.0) for d, rk in top
    )
    ideal = sorted(((rel, doc) for doc, rel in rels.items()), key=lambda t: (-t[0], t[1]))
    idcg = sum(
        (2.0 ** rel - 1.0) / math.log2(i + 2.0)
        for i, (rel, _) in enumerate(ideal[:k])
    )
    ndcg = dcg / idcg if idcg > 0 else 0.0
    assert r.n_ranked == len(top)
    assert r.mrr == round(mrr, 6)
    assert r.precision_at_k == round(prec, 6)
    assert r.dcg_at_k == round(dcg, 6)
    assert r.idcg_at_k == round(idcg, 6)
    assert r.ndcg_at_k == round(ndcg, 6)
