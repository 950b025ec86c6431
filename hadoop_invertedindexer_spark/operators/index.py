"""Inverted-index operators.

The reference's reduce side (``/root/reference/src/InvertedIndexer.java``):
sum 1s per ``word#filename`` (``:170-178``), control-break collect + sort
per word (``:179-201``), format ``word: doc#cnt, ...`` (``:181-196``),
flush-last-group cleanup (``:204-223``). All of that collapses to two
``groupBy``s here; Catalyst plans the partial+final HashAggregate pair
that the reference hand-wires as its combiner (``:139-151``), and the
second exchange hashes on ``word`` — exactly what the custom partitioner
(``:154-160``) achieves.

Load-bearing quirk (SURVEY §1): postings are ordered by reverse
*lexicographic string* comparison of ``"count#filename"`` — ``"4" > "3" >
"10" > "1"`` — not numeric descending. ``lexicographic=True`` (default)
replicates that byte-for-byte; ``lexicographic=False`` gives the sane
numeric-desc ranking for engine-native use.

Scale note: ``collect_list`` per term bounds memory by the largest posting
list — fine for natural-language vocabularies (max |docs| per term here is
40); for adversarial keys use the window-function formatting path
(``postings_via_window``) which never materializes a per-key array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def term_doc_counts(
    tokens: DataFrame, word_col: str = "word", doc_col: str = "filename"
) -> DataFrame:
    """Ops `emit_pairs`+`combine_sum`+`agg_term_doc` (SURVEY §2A #10,11,14).

    One groupBy == emit (word,doc,1) + map-side partial sum + final sum.
    Output: (word, doc, count).
    """
    return tokens.groupBy(word_col, doc_col).agg(F.count(F.lit(1)).alias("count"))


def _posting_sort_key(word_col: str, doc_col: str):
    # the reference's composite string: "count#filename" (ref :178)
    return F.concat_ws("#", F.col("count").cast("string"), F.col(doc_col))


def postings(
    counts: DataFrame,
    word_col: str = "word",
    doc_col: str = "filename",
    lexicographic: bool = True,
) -> DataFrame:
    """Op `postings_collect` (SURVEY §2A #15; ref :179-201).

    Output: (word, postings: array<string "count#doc">), array ordered
    reverse-lexicographically (default) or by count desc / doc desc.
    The groupBy has no first/last-group hazard, so the reference's
    `flush_last_group` cleanup (§2A #17) has no equivalent here.
    """
    if lexicographic:
        elem = _posting_sort_key(word_col, doc_col)
        return counts.groupBy(word_col).agg(
            F.sort_array(F.collect_list(elem), asc=False).alias("postings")
        )
    # engine-native: numeric count desc, doc desc tiebreak — sort structs
    # then strip the struct wrapper
    elem = F.struct(F.col("count"), F.col(doc_col).alias("doc"))
    return counts.groupBy(word_col).agg(
        F.transform(
            F.reverse(F.array_sort(F.collect_list(elem))),
            lambda s: F.concat_ws("#", s["count"].cast("string"), s["doc"]),
        ).alias("postings")
    )


def format_index(
    post: DataFrame, word_col: str = "word", postings_col: str = "postings"
) -> DataFrame:
    """Op `format_line` (SURVEY §2A #16; ref :181-196).

    Renders ``word: doc#cnt, doc#cnt, ...`` — note the flip: the sort key
    is ``cnt#doc`` but the rendered posting is ``doc#cnt`` (ref :186-189).
    Output: one string column ``line``.
    """
    flip = F.transform(
        F.col(postings_col),
        lambda p: F.concat_ws(
            "#",
            F.element_at(F.split(p, "#", 2), 2),
            F.element_at(F.split(p, "#", 2), 1),
        ),
    )
    return post.select(
        F.concat(F.col(word_col), F.lit(": "), F.concat_ws(", ", flip)).alias("line")
    )


def merge_term_doc_counts(*counts: DataFrame) -> DataFrame:
    """Incremental index maintenance: merge (word, doc, count) aggregates
    from separate corpus batches — union + re-sum, associative, so a 100 TB
    index is maintained by aggregating only the new batch and merging,
    never re-tokenizing the full corpus. Identical columns required.
    Group keys are the non-'count' columns BY NAME (a positional pick
    would silently mis-group a frame selected in a different order)."""
    if not counts:
        raise ValueError("need at least one counts frame")
    merged = counts[0]
    for c in counts[1:]:
        merged = merged.unionByName(c)
    if "count" not in merged.columns:
        raise ValueError(f"expected a 'count' column, got {merged.columns}")
    group_cols = [c for c in merged.columns if c != "count"]
    return merged.groupBy(*group_cols).agg(F.sum("count").alias("count"))


def postings_via_window(
    counts: DataFrame,
    word_col: str = "word",
    doc_col: str = "filename",
) -> DataFrame:
    """Adversarial-key fallback for `postings_collect`: rank postings with a
    window instead of collecting an array, so no single key's postings must
    fit in one task's memory until the final (already-aggregated) concat.

    Output: (word, posting, rank) — callers can cap with rank <= k for
    top-k truncation, which the array path cannot do before materializing.
    """
    key = _posting_sort_key(word_col, doc_col)
    w = Window.partitionBy(word_col).orderBy(F.desc("sort_key"))
    return (
        counts.withColumn("sort_key", key)
        .withColumn("rank", F.row_number().over(w))
        .select(
            word_col,
            F.concat_ws("#", F.col(doc_col), F.col("count").cast("string")).alias("posting"),
            "rank",
        )
    )
