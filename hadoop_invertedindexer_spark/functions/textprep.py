"""Text preparation: the reference's map-side token pipeline, DataFrame-native.

Reference semantics (``/root/reference/src/InvertedIndexer.java``):

* lowercase the whole line (``:107``),
* replace each of 33 single-char punctuation regexes with a space
  (``:108-110``; patterns from ``skip/punctuation.txt`` — each pattern is
  one escaped ASCII char, so one character class is exactly equivalent to
  33 sequential ``replaceAll`` passes),
* ``StringTokenizer`` split — delimiters exactly ``" \\t\\n\\r\\f"``
  (``:111-113``),
* drop tokens with length < 3 (``:116-118``),
* drop tokens matching ``^[-\\+]?[\\d]*$`` (``:120-122``; Java ``\\d`` is
  ASCII-only by default, hence ``[0-9]`` here — do NOT use Spark's ``\\d``
  which could be affected by regex dialect differences),
* drop tokens present verbatim in the stop-word file (``:124-126``).

Everything here is a built-in column expression — stays inside
whole-stage codegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The 32 distinct chars from skip/punctuation.txt (apostrophe listed twice
# there). '-' placed last so the class needs no range-escape gymnastics.
PUNCT_CHAR_CLASS = '[`~!@#$%^&*()_+=\\[\\]{}\\\\|;\':",./<>?-]'

# StringTokenizer's exact default delimiter set (" \t\n\r\f") — NOT \s,
# which also matches \x0B and unicode spaces.
TOKEN_DELIM_CLASS = "[ \\t\\n\\r\\f]+"

NUMERIC_TOKEN_REGEX = "^[-+]?[0-9]*$"

DEFAULT_MIN_TOKEN_LEN = 3


def lowercase(col: Column | str) -> Column:
    """Op `lowercase` (SURVEY §2A #4; ref :107)."""
    return F.lower(F.col(col) if isinstance(col, str) else col)


def strip_punct(col: Column | str, replacement: str = " ") -> Column:
    """Op `strip_punct` (SURVEY §2A #5; ref :108-110).

    One regexp_replace over a character class == the reference's 33
    independent single-char passes (chars are independent, replacement has
    no punctuation), but a single codegen'd pass instead of 33.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, PUNCT_CHAR_CLASS, replacement)


def tokenize(df: DataFrame, col: str = "line", out: str = "word") -> DataFrame:
    """Op `tokenize` (SURVEY §2A #6; ref :111-113).

    explode(split(...)) emits empty strings where StringTokenizer emits
    nothing (leading/trailing/repeated delimiters) — filter them out.
    explode_OUTER (r14): the non-outer form makes Catalyst infer
    `size(split(line)) > 0` and push it to the scan, re-running the
    split per line twice more in the scan stage; split() never returns
    an empty/null array for a non-null line, and the existing
    empty-token filter also drops the outer form's NULL row, so the
    output is identical.
    """
    return df.withColumn(
        out, F.explode_outer(F.split(F.col(col), TOKEN_DELIM_CLASS))
    ).where(F.col(out) != "")


def filter_len(col: Column | str, min_len: int = DEFAULT_MIN_TOKEN_LEN) -> Column:
    """Op `filter_len` predicate (SURVEY §2A #7; ref :116-118): keep len >= 3."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) >= min_len


def filter_numeric(col: Column | str) -> Column:
    """Op `filter_numeric` predicate (SURVEY §2A #8; ref :120-122): keep non-numeric."""
    c = F.col(col) if isinstance(col, str) else col
    return ~c.rlike(NUMERIC_TOKEN_REGEX)


def filter_stopwords(
    df: DataFrame, stopwords: DataFrame | list[str], col: str = "word"
) -> DataFrame:
    """Op `filter_stopwords` (SURVEY §2A #9; ref :124-126).

    Exact post-lowercase match against the stop list. With a DataFrame
    argument this is a broadcast hash ANTI join (Spark broadcasts the tiny
    side automatically); with a list it is an ``isin`` literal — both stay
    JVM-side. The anti-join form is the scale path: the stop list ships
    once per executor, not once per task like DistributedCache.
    """
    if isinstance(stopwords, DataFrame):
        sw = stopwords
        if sw.columns != [col]:
            sw = sw.toDF(col)
        return df.join(F.broadcast(sw), on=col, how="left_anti")
    return df.where(~F.col(col).isin(stopwords))


def prepare_tokens(
    df: DataFrame,
    text_col: str = "line",
    stopwords: DataFrame | list[str] | None = None,
    min_len: int = DEFAULT_MIN_TOKEN_LEN,
    out: str = "word",
) -> DataFrame:
    """Full map-side pipeline: lowercase → strip punct → tokenize → 3 filters.

    Filter order (len → numeric → stopword) preserved from ref :116-126;
    order is semantically irrelevant (pure predicates) but kept for
    auditability. Returns the input rows exploded to one row per accepted
    token in column ``out``; all other input columns are preserved.
    """
    cleaned = df.withColumn(text_col, strip_punct(lowercase(text_col)))
    toks = tokenize(cleaned, col=text_col, out=out).drop(text_col)
    toks = toks.where(filter_len(out, min_len)).where(filter_numeric(out))
    if stopwords is not None:
        toks = filter_stopwords(toks, stopwords, col=out)
    return toks


# HTML patterns share one shape: (?is) flags and lazy bodies parse
# identically under Java regex (Spark) and RE2 (DuckDB), and none uses
# a backreference (RE2 has none) — script/style pairing is expanded
# into two literal patterns instead.
_HTML_COMMENT_RE = r"(?s)<!--.*?-->"
_HTML_NEWLINE_RE = (
    r"(?i)<br\s*/?>|</p\s*>|</div\s*>|</h[1-6]\s*>|</li\s*>|</tr\s*>"
    r"|</blockquote\s*>|</section\s*>|</article\s*>"
)
_HTML_TAG_RE = r"(?s)<[^>]+>"


def strip_html(col: Column | str) -> Column:
    """HTML → text for crawl preprocessing (EXT; the step BEFORE every
    filter/dedup operator in a CCNet / RefinedWeb-style web pipeline —
    the reference only ever sees plain text, ref
    src/InvertedIndexer.java:96):

    1. ``<script>``/``<style>`` blocks and comments drop wholesale
       (their contents are code, not prose);
    2. block-level closing tags and ``<br>`` become newlines, so
       document structure survives as PARAGRAPHS — the downstream
       contract :func:`..operators.dedup.dedup_paragraphs` needs;
    3. remaining tags strip;
    4. the named entities that dominate real crawl text decode
       (``&lt; &gt; &quot; &#39; &apos; &nbsp;`` then ``&amp;`` LAST so
       ``&amp;lt;`` becomes the literal ``&lt;`` exactly once —
       numeric ``&#NN;`` forms beyond ``&#39;`` are left as-is, a
       documented subset, not a silent one);
    5. spaces/tabs collapse, 3+ newlines collapse to a paragraph
       break, edges trim.

    Every step is a ``regexp_replace`` — whole-stage codegen, zero
    Python — and every pattern parses identically under Java regex and
    RE2 (no backreferences anywhere), so the whole chain is
    oracle-restatable.
    """
    c = F.col(col) if isinstance(col, str) else col
    # RE2 (DuckDB) has no backreferences: expand the script|style pair
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script\s*>", "")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style\s*>", "")
    c = F.regexp_replace(c, _HTML_COMMENT_RE, "")
    c = F.regexp_replace(c, _HTML_NEWLINE_RE, "\n")
    c = F.regexp_replace(c, _HTML_TAG_RE, " ")
    for ent, rep in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&apos;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    # trim() strips only spaces (both engines); edge newlines — e.g. a
    # trailing </p> — need their own pass
    return F.regexp_replace(F.trim(c), "^\n+|\n+$", "")


# sentence boundary: sentence-final punctuation (optional closing
# quote/bracket) + one space + an upper-case/digit opener. Expressed as
# sentinel INSERTION (capture groups re-emitted around \x01) rather than
# a lookaround split: RE2 (the oracle engine) has no lookbehind, but
# both engines replace with capture groups — Spark spells them $1,
# DuckDB \1 — and the sentinel split is then a plain string_split.
_SENT_BOUNDARY_RE = "([.!?][\"')\\]]?) ([A-Z0-9])"


def split_sentences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, sent_id, sentence): regex sentence segmentation (EXT) — the
    unit under sentence-level chunking, embedding, and decontamination.
    A document splits after ``[.!?]`` (with an optional closing
    quote/bracket) when the next character starts a new sentence
    (capital or digit). The scanner is non-overlapping but re-emits the
    consumed opener, so consecutive short sentences all split
    ("Hi. OK. Go." → 3). Known heuristic limits, by design:
    abbreviations ("Dr. Smith") and decimal-free initials split a
    sentence early — the punkt-style model fix is a vocabulary, not a
    different plan shape. Empty docs yield one empty sentence
    (positional fidelity: every doc appears).

    Scale shape: one regexp_replace + split + posexplode — a pure
    projection; the only cost is the output's own row count."""
    marked = F.regexp_replace(
        F.col(text_col), _SENT_BOUNDARY_RE, "$1\x01$2"
    )
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(marked, "\x01")).alias("sent_id", "sentence"),
    )


def split_long_docs(
    df: DataFrame,
    max_tokens: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Segment long documents into context-window-sized sub-documents at
    SENTENCE boundaries — the standard preprocessing step between
    cleaning and packing (a 50k-token doc must become ~max_tokens pieces
    that never cut a sentence in half; cutting mid-sentence is what
    char-window chunking like ``chunk_text`` does, which is right for
    embeddings but wrong for training examples).

    Sentences come from :func:`split_sentences`; a sub-doc closes when
    the NEXT sentence would start past ``max_tokens`` (the next-fit
    ``floor((cum − nt)/max)`` rule :func:`pack_sequences` uses, keyed by
    the running whitespace-token count) — so a sub-doc exceeds the
    budget only by the tail of its last sentence, and a single oversized
    sentence becomes its own sub-doc rather than being split. Rejoining
    with one space restores the exact original text (the boundary regex
    consumed exactly the one inter-sentence space), proven by the
    conservation fixture.

    Returns (``id_col``, ``chunk_id``, ``text``, ``n_sentences``,
    ``n_tokens``); short docs come back whole as chunk 0.

    Scale shape: a pure sentence-explode projection, ONE doc-keyed
    window cumsum, one (doc, chunk) groupBy whose reassembly sorts only
    each chunk's own sentences — nothing corpus-wide ever sorts, and
    chunk counts are data-bounded by total tokens / max_tokens."""
    from pyspark.sql import Window

    sent = split_sentences(df, id_col, text_col)
    trimmed = F.trim(F.col("sentence"))
    nt = F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, "\\s+"))
    ).cast("long")
    w = (
        Window.partitionBy(id_col)
        .orderBy("sent_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    keyed = sent.withColumn("_nt", nt).withColumn(
        "chunk_id",
        F.floor(
            (F.sum("_nt").over(w) - F.col("_nt")) / F.lit(int(max_tokens))
        ).cast("bigint"),
    )
    return keyed.groupBy(id_col, "chunk_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("sent_id").alias("i"),
                            F.col("sentence").alias("s"),
                        )
                    )
                ),
                lambda st: st["s"],
            ),
            " ",
        ).alias("text"),
        F.count(F.lit(1)).cast("long").alias("n_sentences"),
        F.sum("_nt").alias("n_tokens"),
    )
