"""Python UDTF surface (PySpark 4 table-valued functions).

The engine's policy is built-ins first — every reference operator and
nearly every EXT op stays in whole-stage codegen (SURVEY §2A maps the
reference's mapper/reducer bodies to built-ins; the bigram hot path is
``zip_with`` over slices). This module is the documented extension point
for shapes that genuinely need per-row Python fan-out: a UDTF yields any
number of output rows per input row and composes with SQL ``LATERAL``.

The demo op mirrors the reference's token pipeline (lowercase → punct
class → StringTokenizer delimiters, ``src/InvertedIndexer.java:107-113``)
in the Java∩RE2∩Python-safe regex subset, so its output is
oracle-checkable against the same DuckDB CTE as the codegen paths.
"""

from __future__ import annotations

import re

from pyspark.sql.types import LongType, StringType, StructField, StructType

# Python-compiled twins of functions/textprep.py's class strings.
_PUNCT_RE = re.compile("[`~!@#$%^&*()_+=\\[\\]{}\\\\|;':\",./<>?-]")
_DELIM_RE = re.compile("[ \t\n\r\f]+")

NGRAM_SCHEMA = StructType(
    [StructField("ngram", StringType()), StructField("pos", LongType())]
)


class NgramTokens:
    """Yield every n-gram of the cleaned token stream with its 0-based
    start ordinal. One input row fans out to len(tokens)-n+1 rows."""

    def eval(self, text: str | None, n: int):  # noqa: ANN201 - UDTF contract
        if text is None or n is None or n < 1:
            return
        toks = [t for t in _DELIM_RE.split(_PUNCT_RE.sub(" ", text.lower())) if t]
        for i in range(len(toks) - n + 1):
            yield " ".join(toks[i : i + n]), i


def ngram_udtf():
    """Build the UDTF (deferred: returnType construction is safe at
    import, but the udtf wrapper itself is created lazily per session)."""
    from pyspark.sql.functions import udtf

    return udtf(NgramTokens, returnType=NGRAM_SCHEMA)
