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
