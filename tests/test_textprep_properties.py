"""Hypothesis property tests for the token pipeline and the posting sort:
the semantics must hold for arbitrary inputs, not just the fixtures.

The posting-sort model here is an independent reimplementation of the
§1 quirk (reverse string sort of 'count#doc'), cross-checked against the
Spark expression on random inputs.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings, strategies as st

from hadoop_invertedindexer_spark.functions.textprep import (
    NUMERIC_TOKEN_REGEX,
    prepare_tokens,
)
from hadoop_invertedindexer_spark.operators.index import postings

PUNCT_CHARS = "`~!@#$%^&*()_+=[]{}\\|;':\",./<>?-"

text_strategy = st.text(
    alphabet=st.sampled_from(
        list("abcdefghij XYZ0123456789") + list(PUNCT_CHARS) + ["\t"]
    ),
    max_size=80,
)

HSETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@HSETTINGS
@given(lines=st.lists(text_strategy, min_size=1, max_size=5))
def test_tokens_are_clean(spark, lines):
    df = spark.createDataFrame([(i, l) for i, l in enumerate(lines)], ["doc", "line"])
    toks = [
        r.word
        for r in prepare_tokens(df, text_col="line", stopwords=["the"]).collect()
    ]
    for t in toks:
        assert len(t) >= 3
        assert not re.fullmatch(NUMERIC_TOKEN_REGEX, t)
        assert t == t.lower()
        assert not any(c in t for c in PUNCT_CHARS)
        assert not any(c.isspace() for c in t)
        assert t != "the"


@HSETTINGS
@given(
    counts=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=1500),
            st.text(alphabet="abcxyz0123456789.-", min_size=1, max_size=12),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[1],
    )
)
def test_posting_sort_matches_reference_model(spark, counts):
    """Spark's sort_array(desc) over 'count#doc' strings == Python's
    reverse sort of the same strings (the reference comparator)."""
    df = spark.createDataFrame(
        [("w", doc, cnt) for cnt, doc in counts], ["word", "filename", "count"]
    )
    got = postings(df).first().postings
    expected = sorted((f"{c}#{d}" for c, d in counts), reverse=True)
    assert list(got) == expected


class TestStripHtml:
    """Planted-page fixtures for the crawl-preprocessing HTML stripper."""

    def _strip(self, spark, s):
        from hadoop_invertedindexer_spark.functions.textprep import strip_html

        return (
            spark.createDataFrame([(s,)], ["raw"])
            .select(strip_html("raw").alias("t"))
            .head()
            .t
        )

    def test_script_style_comment_dropped_wholesale(self, spark):
        got = self._strip(
            spark,
            "<style>body red</style>keep"
            "<script>var x = 1 < 2; if (x) beep();</script>"
            "<!-- secret --> this",
        )
        assert got == "keep this"

    def test_block_tags_become_paragraphs(self, spark):
        got = self._strip(
            spark, "<h1>Title</h1><p>one</p><p>two</p><div>three</div>"
        )
        assert got == "Title\none\ntwo\nthree"

    def test_entity_decode_order_amp_last(self, spark):
        # '&amp;lt;' must decode to the literal '&lt;' exactly once,
        # never cascade to '<'
        got = self._strip(spark, "<p>a &amp; b &amp;lt; c &nbsp; d</p>")
        assert got == 'a & b &lt; c d'

    def test_plain_text_with_newlines_passes_through(self, spark):
        assert self._strip(spark, "plain one\nplain two") == (
            "plain one\nplain two"
        )

    def test_unclosed_tag_is_stripped_not_swallowed(self, spark):
        got = self._strip(spark, "before <em>emph after")
        assert got == "before emph after"

    def test_feeds_paragraph_dedup(self, spark):
        """The stripper's newline structure is exactly what
        dedup_paragraphs consumes: a shared banner paragraph across two
        stripped pages dedups away."""
        from hadoop_invertedindexer_spark.functions.textprep import strip_html
        from hadoop_invertedindexer_spark.operators import dedup

        pages = spark.createDataFrame(
            [
                (1, "<p>cookie banner</p><p>alpha prose</p>"),
                (2, "<p>cookie banner</p><p>beta prose</p>"),
            ],
            ["doc_id", "raw"],
        )
        stripped = pages.select("doc_id", strip_html("raw").alias("text"))
        out = {r.doc_id: r.text for r in dedup.dedup_paragraphs(stripped).collect()}
        assert out[1] == "cookie banner\nalpha prose"
        assert out[2] == "beta prose"


class TestSplitSentences:
    def _sents(self, spark, s):
        from hadoop_invertedindexer_spark.functions.textprep import (
            split_sentences,
        )

        rows = split_sentences(
            spark.createDataFrame([(1, s)], ["doc_id", "text"])
        ).collect()
        return [r.sentence for r in sorted(rows, key=lambda r: r.sent_id)]

    def test_consecutive_short_sentences_all_split(self, spark):
        assert self._sents(spark, "Hi. OK. Go.") == ["Hi.", "OK.", "Go."]

    def test_terminators_and_closing_quote(self, spark):
        got = self._sents(spark, 'He said "stop." Then left! Really? Yes.')
        assert got == ['He said "stop."', "Then left!", "Really?", "Yes."]

    def test_no_boundary_without_capital_opener(self, spark):
        # lowercase continuation and decimals never split
        assert self._sents(spark, "pi is 3.14 and that. is that") == [
            "pi is 3.14 and that. is that"
        ]

    def test_abbreviation_limit_is_documented_behavior(self, spark):
        # the known heuristic limit: an abbreviation before a capital
        # splits early (punkt-style vocabularies fix this, not the plan)
        assert self._sents(spark, "Dr. Smith arrived.") == [
            "Dr.",
            "Smith arrived.",
        ]

    def test_empty_doc_yields_one_empty_sentence(self, spark):
        assert self._sents(spark, "") == [""]


class TestSplitLongDocs:
    def _chunks(self, spark, s, max_tokens):
        from hadoop_invertedindexer_spark.functions.textprep import (
            split_long_docs,
        )

        rows = split_long_docs(
            spark.createDataFrame([(1, s)], ["doc_id", "text"]),
            max_tokens=max_tokens,
        ).collect()
        return [
            (r.text, r.n_sentences, r.n_tokens)
            for r in sorted(rows, key=lambda r: r.chunk_id)
        ]

    def test_next_fit_at_sentence_boundaries(self, spark):
        # 3 sentences of 2/3/2 tokens, budget 4: chunk closes when the
        # NEXT sentence would start past the budget
        got = self._chunks(spark, "Aa bb. Cc dd ee. Ff gg.", 4)
        assert got == [("Aa bb. Cc dd ee.", 2, 5), ("Ff gg.", 1, 2)]

    def test_short_doc_comes_back_whole(self, spark):
        assert self._chunks(spark, "One tiny doc here", 512) == [
            ("One tiny doc here", 1, 4)
        ]

    def test_oversized_sentence_is_its_own_chunk(self, spark):
        # first sentence fills the budget exactly, so the 30-token
        # sentence starts a fresh chunk — and stays WHOLE in it
        s = (
            "Aa bb cc dd ee. W0 "
            + " ".join(f"w{i}" for i in range(1, 30))
            + ". Tail here."
        )
        got = self._chunks(spark, s, 5)
        assert len(got) == 3
        assert got[1][1] == 1 and got[1][2] == 30  # alone, never split

    def test_rejoin_conserves_original_text(self, spark):
        s = 'He said "stop." Then left! Really? Yes. And 3.14 held.'
        got = self._chunks(spark, s, 3)
        assert " ".join(t for t, _, _ in got) == s
        # token mass conserved across chunks
        assert sum(n for _, _, n in got) == len(s.split())
