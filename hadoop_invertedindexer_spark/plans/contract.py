"""Driver-contract queries for the reference operator inventory (SURVEY §2A).

Each operator ID from SURVEY §2A gets a ``(spark, sf_dir) -> DataFrame``
callable plus a DuckDB oracle SQL string computing the same result over
the pre-registered views. The reference pipeline is re-targeted at the
driver's ``documents`` table (doc identity = ``doc_id``; the file-based
original is exercised by the golden-parity test instead).

Type discipline: DuckDB's natural output types are mirrored explicitly
(``count(*)`` -> BIGINT == Spark long; DuckDB ``sum(int)`` is HUGEINT so
oracles cast ``::BIGINT``; Spark ``length()`` is INT so it is cast to
long). Every computed column is aliased identically on both sides —
the driver's compare hashes values under sorted column names.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_invertedindexer_spark.functions.textprep import (
    NUMERIC_TOKEN_REGEX,
    PUNCT_CHAR_CLASS,
    TOKEN_DELIM_CLASS,
    filter_len,
    filter_numeric,
    filter_stopwords,
    lowercase,
    strip_punct,
    tokenize,
)
from hadoop_invertedindexer_spark.operators.index import (
    format_index,
    postings,
    postings_via_window,
    term_doc_counts,
)
from hadoop_invertedindexer_spark.sources.tables import read_table, spread_partitions

# Demo stop list for the documents corpus (the reference's 319-word file
# belongs to its own corpus; the contract needs a deterministic list that
# exists identically on both sides, so it is inlined here and in the SQL).
STOPWORDS_DEMO = ["the", "and", "for", "with", "that", "this", "from", "are", "was", "big"]

_SQL_PUNCT = "[`~!@#$%^&*()_+=\\[\\]{}\\\\|;'':\",./<>?-]"  # '' = escaped quote in SQL
_SQL_DELIM = "[ \\t\\n\\r\\f]+"
_SQL_NUMERIC = "^[-+]?[0-9]*$"
_SQL_STOPS = ", ".join(f"'{w}'" for w in STOPWORDS_DEMO)

# All-token CTE (cleaned + split, pre-filter) and accepted-token CTE
# (len >= 3, non-numeric, non-stopword) — the §3.2 map-task record path.
SQL_TOKS_ALL = f"""
toks_all AS (
    SELECT d.doc_id, t.tok AS word
    FROM documents d,
         unnest(string_split_regex(
             regexp_replace(lower(d.text), '{_SQL_PUNCT}', ' ', 'g'),
             '{_SQL_DELIM}')) AS t(tok)
    WHERE t.tok <> ''
)
"""

SQL_TOKS_ACCEPTED = f"""
toks AS (
    SELECT doc_id, word FROM ({{base}} SELECT * FROM toks_all) base_toks
    WHERE length(word) >= 3
      AND NOT regexp_matches(word, '{_SQL_NUMERIC}')
      AND word NOT IN ({_SQL_STOPS})
)
""".format(base=f"WITH {SQL_TOKS_ALL}")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents")


def tokens_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaned + tokenized, pre-filter: (doc_id, word). Spread across the
    session parallelism first — a small single-file table otherwise
    tokenizes on one core."""
    d = spread_partitions(_docs(spark, sf_dir), "doc_id").select(
        "doc_id", strip_punct(lowercase("text")).alias("line")
    )
    return tokenize(d, col="line", out="word").select("doc_id", "word")


def tokens_accepted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-filter tokens: the §3.2 pipeline on the documents table."""
    t = tokens_all(spark, sf_dir)
    t = t.where(filter_len("word")).where(filter_numeric("word"))
    return filter_stopwords(t, STOPWORDS_DEMO)


def _doc_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return term_doc_counts(
        tokens_accepted(spark, sf_dir).withColumn(
            "doc", F.col("doc_id").cast("string")
        ),
        doc_col="doc",
    )


# ---------------------------------------------------------------- queries


def q_scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2A #1: source scan (projection pruned to the scan)."""
    return _docs(spark, sf_dir).select("doc_id", "text")


def q_doc_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2A #2: provenance column (synthetic analogue of input_file_name)."""
    return _docs(spark, sf_dir).select("doc_id", "source")


def q_side_input_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2A #3: broadcast side input — occurrences of each stop word."""
    t = tokens_all(spark, sf_dir)
    return (
        t.where(F.col("word").isin(STOPWORDS_DEMO))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_lowercase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2A #4."""
    return _docs(spark, sf_dir).select(
        "doc_id", lowercase("text").alias("text_lower")
    )


def q_strip_punct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2A #5: one char-class pass == the reference's 33 replaceAll passes."""
    return _docs(spark, sf_dir).select(
        "doc_id", strip_punct("text").alias("text_clean")
    )


def q_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2A #6: explode+split with empty-token drop; corpus term frequencies."""
    return tokens_all(spark, sf_dir).groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def q_filter_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2A #7."""
    t = tokens_all(spark, sf_dir).where(filter_len("word"))
    return t.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


def q_filter_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2A #8 (applied after #7, preserving reference filter order)."""
    t = tokens_all(spark, sf_dir).where(filter_len("word")).where(
        filter_numeric("word")
    )
    return t.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


def q_filter_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2A #9: broadcast hash anti-join against the stop list."""
    return tokens_accepted(spark, sf_dir).groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def q_emit_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2A #10: the (word, doc, 1) KV emission."""
    return tokens_accepted(spark, sf_dir).select(
        "word", "doc_id", F.lit(1).cast("bigint").alias("n")
    )


def q_combine_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2A #11: partial+final sum of the 1s (Catalyst inserts the map-side
    partial HashAggregate the reference hand-writes as its combiner)."""
    return (
        q_emit_pairs(spark, sf_dir)
        .groupBy("word", "doc_id")
        .agg(F.sum("n").alias("cnt"))
    )


def q_partition_by_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2A #12: routing by a word-derived key. The engine's real routing is
    the hash exchange of groupBy('word'); this contract query checks the
    derived-key semantics with a deterministic bucket fn (portable across
    Spark/DuckDB, unlike their internal hashes)."""
    t = q_combine_sum(spark, sf_dir)
    return (
        t.withColumn("bucket", (F.length("word") % F.lit(8)).cast("bigint"))
        .groupBy("bucket")
        .agg(
            F.countDistinct("word").alias("n_terms"),
            F.sum("cnt").alias("n_tokens"),
        )
    )


def q_sort_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2A #13: global ascending word order, materialized as a rank so the
    order-insensitive compare still verifies it."""
    w = Window.orderBy("word")
    return (
        tokens_accepted(spark, sf_dir)
        .select("word")
        .distinct()
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )


def q_agg_term_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2A #14: final per-(word, doc) counts."""
    return _doc_counts(spark, sf_dir).select(
        "word", "doc", F.col("count").alias("cnt")
    )


def q_postings_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2A #15: per-word posting list, reverse-lexicographic on 'cnt#doc'
    (the load-bearing string-sort quirk, SURVEY §1)."""
    p = postings(_doc_counts(spark, sf_dir), doc_col="doc")
    return p.select("word", F.concat_ws(", ", "postings").alias("postings_str"))


def q_postings_compressed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-encoded posting storage (EXT): doc ids gap-encoded over the
    ascending numeric order, counts positional — the classic
    inverted-index layout, arrays rendered as csv for the portable
    value hash. Round-trip equality with the raw postings is proven in
    tests/test_retrieval.py."""
    from hadoop_invertedindexer_spark.operators.retrieval import compress_postings

    counts = term_doc_counts(
        tokens_accepted(spark, sf_dir).withColumn("doc", F.col("doc_id")),
        doc_col="doc",
    )
    comp = compress_postings(counts, doc_col="doc", count_col="count")
    return comp.select(
        "word",
        "n_docs",
        "total_count",
        F.concat_ws(
            ",", F.transform("doc_gaps", lambda x: x.cast("string"))
        ).alias("gaps_str"),
        F.concat_ws(
            ",", F.transform("counts", lambda x: x.cast("string"))
        ).alias("counts_str"),
    )


def q_format_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2A #16: rendered index lines (sort key cnt#doc, rendered doc#cnt)."""
    return format_index(postings(_doc_counts(spark, sf_dir), doc_col="doc"))


def q_flush_last_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2A #17: the reference's cleanup() exists only to flush the final
    control-break group; the declarative equivalent is simply 'the line for
    max(word)' — verified here so the boundary group is provably emitted."""
    dc = _doc_counts(spark, sf_dir)
    last = dc.groupBy().agg(F.max("word").alias("word"))
    return format_index(postings(dc.join(last, "word"), doc_col="doc"))


def q_sink_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2A #18: the exact single-column DataFrame the text sink writes."""
    return format_index(postings(_doc_counts(spark, sf_dir), doc_col="doc"))


def q_postings_via_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale fallback for #15 (SURVEY §7): ranked postings via window, no
    per-key array materialization."""
    return postings_via_window(_doc_counts(spark, sf_dir), doc_col="doc").select(
        "word", "posting", F.col("rank").cast("bigint").alias("rank")
    )


def q_tf_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: TF-IDF from the (word, doc, count) aggregate (SURVEY §7.4)."""
    from hadoop_invertedindexer_spark.operators.index_ext import tf_idf

    return tf_idf(_doc_counts(spark, sf_dir))


def q_top_terms_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: top-5 terms per document via ranking window."""
    from hadoop_invertedindexer_spark.operators.index_ext import top_k_terms_per_doc

    return top_k_terms_per_doc(_doc_counts(spark, sf_dir), k=5)


REFERENCE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "scan_text": q_scan_text,
    "doc_provenance": q_doc_provenance,
    "side_input_load": q_side_input_load,
    "lowercase": q_lowercase,
    "strip_punct": q_strip_punct,
    "tokenize": q_tokenize,
    "filter_len": q_filter_len,
    "filter_numeric": q_filter_numeric,
    "filter_stopwords": q_filter_stopwords,
    "emit_pairs": q_emit_pairs,
    "combine_sum": q_combine_sum,
    "partition_by_term": q_partition_by_term,
    "sort_by_key": q_sort_by_key,
    "agg_term_doc": q_agg_term_doc,
    "postings_collect": q_postings_collect,
    "postings_compressed": q_postings_compressed,
    "format_line": q_format_line,
    "flush_last_group": q_flush_last_group,
    "sink_text": q_sink_text,
    "postings_via_window": q_postings_via_window,
    "tf_idf": q_tf_idf,
    "top_terms_per_doc": q_top_terms_per_doc,
}

_POSTING_ELEM = "cnt::VARCHAR || '#' || doc"
_RENDERED_ELEM = "doc || '#' || cnt::VARCHAR"
_SQL_DOC_COUNTS = (
    SQL_TOKS_ACCEPTED
    + ", doc_counts AS (SELECT word, doc_id::VARCHAR AS doc, count(*) AS cnt"
    " FROM toks GROUP BY word, doc_id)"
)

REFERENCE_ORACLE_SQL: dict[str, str] = {
    "scan_text": "SELECT doc_id, text FROM documents",
    "doc_provenance": "SELECT doc_id, source FROM documents",
    "side_input_load": f"""
        WITH {SQL_TOKS_ALL}
        SELECT word, count(*) AS cnt FROM toks_all
        WHERE word IN ({_SQL_STOPS}) GROUP BY word""",
    "lowercase": "SELECT doc_id, lower(text) AS text_lower FROM documents",
    "strip_punct": f"""
        SELECT doc_id, regexp_replace(text, '{_SQL_PUNCT}', ' ', 'g')
               AS text_clean FROM documents""",
    "tokenize": f"WITH {SQL_TOKS_ALL} SELECT word, count(*) AS cnt FROM toks_all GROUP BY word",
    "filter_len": f"""
        WITH {SQL_TOKS_ALL}
        SELECT word, count(*) AS cnt FROM toks_all
        WHERE length(word) >= 3 GROUP BY word""",
    "filter_numeric": f"""
        WITH {SQL_TOKS_ALL}
        SELECT word, count(*) AS cnt FROM toks_all
        WHERE length(word) >= 3
          AND NOT regexp_matches(word, '{_SQL_NUMERIC}')
        GROUP BY word""",
    "filter_stopwords": f"WITH {SQL_TOKS_ACCEPTED} SELECT word, count(*) AS cnt FROM toks GROUP BY word",
    "emit_pairs": f"WITH {SQL_TOKS_ACCEPTED} SELECT word, doc_id, 1::BIGINT AS n FROM toks",
    "combine_sum": f"""
        WITH {SQL_TOKS_ACCEPTED}
        SELECT word, doc_id, count(*)::BIGINT AS cnt FROM toks
        GROUP BY word, doc_id""",
    "partition_by_term": f"""
        WITH {SQL_TOKS_ACCEPTED},
        doc_counts AS (SELECT word, count(*) AS cnt FROM toks GROUP BY word, doc_id)
        SELECT (length(word) % 8)::BIGINT AS bucket,
               count(DISTINCT word) AS n_terms,
               sum(cnt)::BIGINT AS n_tokens
        FROM doc_counts GROUP BY 1""",
    "sort_by_key": f"""
        WITH {SQL_TOKS_ACCEPTED}
        SELECT word, row_number() OVER (ORDER BY word)::BIGINT AS rank
        FROM (SELECT DISTINCT word FROM toks) d""",
    "agg_term_doc": f"""
        WITH {_SQL_DOC_COUNTS}
        SELECT word, doc, cnt FROM doc_counts""",
    "postings_collect": f"""
        WITH {_SQL_DOC_COUNTS}
        SELECT word,
               string_agg({_POSTING_ELEM}, ', ' ORDER BY {_POSTING_ELEM} DESC)
                   AS postings_str
        FROM doc_counts GROUP BY word""",
    # delta-encoded storage twin: gaps via lag over the ascending
    # numeric doc order (lockstep with retrieval.compress_postings)
    "postings_compressed": f"""
        WITH {SQL_TOKS_ACCEPTED},
        dc AS (SELECT word, doc_id AS doc, count(*) AS cnt
               FROM toks GROUP BY word, doc_id),
        g AS (SELECT word, doc, cnt,
                     doc - coalesce(lag(doc) OVER (PARTITION BY word
                                                   ORDER BY doc), 0) AS gap
              FROM dc)
        SELECT word, count(*)::BIGINT AS n_docs, sum(cnt)::BIGINT AS total_count,
               string_agg(gap::VARCHAR, ',' ORDER BY doc) AS gaps_str,
               string_agg(cnt::VARCHAR, ',' ORDER BY doc) AS counts_str
        FROM g GROUP BY word""",
    "format_line": f"""
        WITH {_SQL_DOC_COUNTS}
        SELECT word || ': ' ||
               string_agg({_RENDERED_ELEM}, ', ' ORDER BY {_POSTING_ELEM} DESC)
                   AS line
        FROM doc_counts GROUP BY word""",
    "flush_last_group": f"""
        WITH {_SQL_DOC_COUNTS}
        SELECT word || ': ' ||
               string_agg({_RENDERED_ELEM}, ', ' ORDER BY {_POSTING_ELEM} DESC)
                   AS line
        FROM doc_counts WHERE word = (SELECT max(word) FROM doc_counts)
        GROUP BY word""",
    "sink_text": f"""
        WITH {_SQL_DOC_COUNTS}
        SELECT word || ': ' ||
               string_agg({_RENDERED_ELEM}, ', ' ORDER BY {_POSTING_ELEM} DESC)
                   AS line
        FROM doc_counts GROUP BY word""",
    "postings_via_window": f"""
        WITH {_SQL_DOC_COUNTS}
        SELECT word, {_RENDERED_ELEM} AS posting,
               row_number() OVER (PARTITION BY word ORDER BY {_POSTING_ELEM} DESC)::BIGINT
                   AS rank
        FROM doc_counts""",
    "tf_idf": f"""
        WITH {_SQL_DOC_COUNTS},
        doc_totals AS (SELECT doc, sum(cnt) AS doc_total FROM doc_counts GROUP BY doc),
        dfreq AS (SELECT word, count(*) AS df FROM doc_counts GROUP BY word),
        n AS (SELECT count(DISTINCT doc) AS n_docs FROM doc_counts)
        SELECT c.word, c.doc,
               round((c.cnt / dt.doc_total::DOUBLE)
                     * (ln((n.n_docs + 1) / (f.df + 1)::DOUBLE) + 1), 6) AS tfidf
        FROM doc_counts c
        JOIN doc_totals dt ON c.doc = dt.doc
        JOIN dfreq f ON c.word = f.word
        CROSS JOIN n""",
    "top_terms_per_doc": f"""
        WITH {_SQL_DOC_COUNTS}
        SELECT doc, word, cnt, rank FROM (
            SELECT doc, word, cnt,
                   row_number() OVER (PARTITION BY doc
                                      ORDER BY cnt DESC, word)::BIGINT AS rank
            FROM doc_counts) t
        WHERE rank <= 5""",
}
