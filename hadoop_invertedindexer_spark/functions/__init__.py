"""Scalar/column function library (all JVM-side built-ins unless noted)."""

from hadoop_invertedindexer_spark.functions.textprep import (  # noqa: F401
    PUNCT_CHAR_CLASS,
    TOKEN_DELIM_CLASS,
    NUMERIC_TOKEN_REGEX,
    lowercase,
    strip_punct,
    tokenize,
    filter_len,
    filter_numeric,
    filter_stopwords,
    prepare_tokens,
)
