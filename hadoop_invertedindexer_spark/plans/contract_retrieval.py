"""Driver-contract queries for the retrieval surface (read side of the
inverted index): BM25 scoring/ranking, boolean search, positional phrase
search.  Spark implementations in ``operators/retrieval.py``; every float
literal in the oracle SQL is cast ``::DOUBLE`` so DuckDB does not promote
the expression into DECIMAL arithmetic (which rounds differently from the
IEEE-double math Spark does).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_invertedindexer_spark.operators.similarity import (
    cosine_topk_bruteforce,
)

from hadoop_invertedindexer_spark.operators.retrieval import (
    bm25_scores,
    bm25_search,
    boolean_or_search,
    boolean_search,
    phrase_search,
    positional_tokens,
    prefix_search,
    proximity_search,
    suggest_terms,
)
from hadoop_invertedindexer_spark.plans.contract import (
    _SQL_DELIM,
    _SQL_DOC_COUNTS,
    _SQL_PUNCT,
    _doc_counts,
    _docs,
)

QUERY_TERMS = ["hash", "join", "spark"]
EXCLUDE_TERMS = ["vector"]
PHRASE = ["sort", "merge"]
TOP_K = 10


def q_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: BM25 per (word, doc) over the accepted-token counts."""
    return bm25_scores(_doc_counts(spark, sf_dir))


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: top-10 docs for a bag-of-words query by summed BM25
    (DECIMAL-exact sum, TakeOrderedAndProject top-k)."""
    return bm25_search(_doc_counts(spark, sf_dir), QUERY_TERMS, k=TOP_K)


def q_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: conjunctive boolean retrieval with exclusion."""
    return boolean_search(_doc_counts(spark, sf_dir), QUERY_TERMS, EXCLUDE_TERMS)


def q_positional_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: positional index — (doc_id, pos, word) token ordinals."""
    return positional_tokens(_docs(spark, sf_dir))


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: exact-phrase match counts via positional intersection."""
    return phrase_search(positional_tokens(_docs(spark, sf_dir)), PHRASE)


def q_boolean_or_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: disjunctive retrieval, at least 2 of the 3 query terms."""
    return boolean_or_search(
        _doc_counts(spark, sf_dir), QUERY_TERMS, min_should_match=2
    )


def q_prefix_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: wildcard-right term lookup (mer* — merge and friends)."""
    return prefix_search(_doc_counts(spark, sf_dir), "mer")


def q_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: unordered proximity — 'sort' within 3 tokens of 'merge'."""
    return proximity_search(
        positional_tokens(_docs(spark, sf_dir)), "sort", "merge", max_distance=3
    )


def q_suggest_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: did-you-mean for a misspelled query term ('mergw')."""
    return suggest_terms(_doc_counts(spark, sf_dir), "mergw")


def q_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: the Python UDTF extension point — trigram table function via
    SQL LATERAL, token semantics identical to the codegen paths (so the
    same DuckDB CTE oracles it)."""
    from hadoop_invertedindexer_spark.functions.udtfs import ngram_udtf

    spark.udtf.register("ngrams_tf", ngram_udtf())
    _docs(spark, sf_dir).createOrReplaceTempView("documents_udtf_v")
    return spark.sql(
        "SELECT d.doc_id, n.ngram, n.pos "
        "FROM documents_udtf_v d, LATERAL ngrams_tf(d.text, 3) n"
    )


def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r13): hybrid lexical+vector retrieval via reciprocal-rank
    fusion — the BM25 top-10 for the bag-of-words query fused with the
    exact cosine top-10 around document 0's embedding (query-by-example;
    the embeddings table's vec_id IS doc_id). ``exclude_self=True``
    matches the IVF-PQ composite in :func:`q_hybrid_search_rrf_ann`, so
    the two hybrid entries fuse the SAME candidate universe and read as
    'same fusion, different backend' (ADVICE r13). Fused contribution
    is exact integer ppb, so the whole composite value-hashes."""
    from hadoop_invertedindexer_spark.operators.retrieval import (
        hybrid_search_rrf,
    )

    lex = bm25_search(_doc_counts(spark, sf_dir), QUERY_TERMS, k=TOP_K)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("qid"), F.col("embedding").alias("qvec")
    )
    vec = cosine_topk_bruteforce(emb, qv, k=TOP_K, exclude_self=True)
    return hybrid_search_rrf(lex, vec, k=TOP_K)


def q_hybrid_search_rrf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r13): the same RRF fusion with the VECTOR side served by
    the IVF-PQ composite instead of exact cosine — the end-to-end
    100 TB read path: a bucket-pruned BM25 posting scan fused with a
    DPP-pruned probe over m-byte codes, the fusion itself metadata-
    scale. Document 0's ranked list is sliced out of the multi-query
    composite, so the oracle reuses the similarity_ivfpq SQL verbatim
    as a subquery."""
    from hadoop_invertedindexer_spark.operators.retrieval import (
        hybrid_search_rrf,
    )
    from hadoop_invertedindexer_spark.plans.contract_llm import (
        q_similarity_ivfpq,
    )

    lex = bm25_search(_doc_counts(spark, sf_dir), QUERY_TERMS, k=TOP_K)
    vec = q_similarity_ivfpq(spark, sf_dir).where(F.col("qid") == 0)
    return hybrid_search_rrf(lex, vec, k=TOP_K)


def _batch_query_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24 deterministic 2-term queries from the top-48-df vocabulary
    words: vocab ranked by (df desc, word asc), qid = (rank−1) % 24 —
    query i pairs word i+1 with word i+25. The top-48 selection is an
    orderBy().limit() (TakeOrderedAndProject — per-partition heap,
    never a global sort); the rank window then runs on 48 rows. Stated
    identically in the SQL twins."""
    counts = _doc_counts(spark, sf_dir)
    vocab = counts.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    top = vocab.orderBy(F.desc("df"), F.asc("word")).limit(48)
    w = Window.orderBy(F.desc("df"), F.asc("word"))
    return top.withColumn("rn", F.row_number().over(w)).select(
        ((F.col("rn") - 1) % 24).cast("long").alias("qid"), "word"
    )


def q_bm25_search_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r14, VERDICT r13 ask 2): per-qid BM25 top-10 over a 24-query
    batch — one scoring pass, broadcast query table, qid-partitioned
    rank window (WindowGroupLimit, plan-asserted)."""
    from hadoop_invertedindexer_spark.operators.retrieval import (
        bm25_search_batch,
    )

    return bm25_search_batch(
        _doc_counts(spark, sf_dir),
        _batch_query_terms(spark, sf_dir),
        k=TOP_K,
    )


def q_hybrid_search_rrf_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r14, VERDICT r13 ask 2): the hybrid RRF fusion BATCHED over
    24 qids — lexical side = the 24-query BM25 batch, vector side = the
    exact-cosine top-10 for embeddings 0..23 (qid = vec_id, self
    excluded, matching the single-query entries' universe). The fusion
    window is PARTITIONED BY qid (plan-asserted — the single-query
    window would funnel all 24 queries through one partition)."""
    from hadoop_invertedindexer_spark.operators.retrieval import (
        bm25_search_batch,
        hybrid_search_rrf_batch,
    )

    lex = bm25_search_batch(
        _doc_counts(spark, sf_dir), _batch_query_terms(spark, sf_dir), k=TOP_K
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 24).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    vec = cosine_topk_bruteforce(emb, queries, k=TOP_K, exclude_self=True)
    return hybrid_search_rrf_batch(lex, vec, k=TOP_K)


def q_retrieval_eval_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r14, VERDICT r13 ask 2): per-qid MRR / precision@10 /
    nDCG@10 of the 24-query hybrid batch against a per-qid graded
    relevance table (a doc's grade for qid = how many of THAT query's
    terms it contains) — one metrics row per qid, ideal rankings inside
    a qid-partitioned window."""
    from hadoop_invertedindexer_spark.operators.retrieval import (
        ranking_eval_batch,
    )

    ranked = q_hybrid_search_rrf_batch(spark, sf_dir)
    rel = (
        _doc_counts(spark, sf_dir)
        .join(F.broadcast(_batch_query_terms(spark, sf_dir)), "word")
        .groupBy("qid", "doc")
        .agg(F.count_distinct("word").alias("rel"))
    )
    return ranking_eval_batch(ranked, rel, k=TOP_K)


def q_retrieval_eval_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r13): MRR / precision@10 / nDCG@10 of the hybrid RRF
    ranking against a graded relevance table derived from the corpus
    itself — a document's grade is how many of the query's terms it
    actually contains (0–3). The eval that closes the retrieval loop:
    before a schedule swaps ranking backends, this row prices the swap
    in ranking quality, the `ann_recall` of the lexical side."""
    from hadoop_invertedindexer_spark.operators.retrieval import (
        ranking_eval,
    )

    ranked = q_hybrid_search_rrf(spark, sf_dir)
    rel = (
        _doc_counts(spark, sf_dir)
        .where(F.col("word").isin([t.lower() for t in QUERY_TERMS]))
        .groupBy("doc")
        .agg(F.count_distinct("word").alias("rel"))
    )
    return ranking_eval(ranked, rel, k=TOP_K)


RETRIEVAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "bm25_score": q_bm25_score,
    "bm25_search": q_bm25_search,
    "hybrid_search_rrf": q_hybrid_search_rrf,
    "hybrid_search_rrf_ann": q_hybrid_search_rrf_ann,
    "retrieval_eval_hybrid": q_retrieval_eval_hybrid,
    "bm25_search_batch": q_bm25_search_batch,
    "hybrid_search_rrf_batch": q_hybrid_search_rrf_batch,
    "retrieval_eval_batch": q_retrieval_eval_batch,
    "boolean_search": q_boolean_search,
    "positional_index": q_positional_index,
    "phrase_search": q_phrase_search,
    "boolean_or_search": q_boolean_or_search,
    "prefix_search": q_prefix_search,
    "proximity_search": q_proximity_search,
    "suggest_terms": q_suggest_terms,
    "udtf_ngrams": q_udtf_ngrams,
}

_SQL_TERMS = ", ".join(f"'{t}'" for t in QUERY_TERMS)

from hadoop_invertedindexer_spark.plans.contract_llm import (  # noqa: E402
    LLM_ORACLE_SQL,
    _sql_cosine,
)
_SQL_EXCLUDE = ", ".join(f"'{t}'" for t in EXCLUDE_TERMS)

# BM25 building blocks over doc_counts(word, doc, cnt).  avgdl is one
# double division of two exact integers (see operators/retrieval.py).
_SQL_BM25_STATS = """
dls AS (SELECT doc, sum(cnt)::BIGINT AS dl FROM doc_counts GROUP BY doc),
dfreq AS (SELECT word, count(*) AS df FROM doc_counts GROUP BY word),
stats AS (SELECT count(DISTINCT doc) AS n_docs,
                 sum(cnt)::BIGINT::DOUBLE / count(DISTINCT doc) AS avgdl
          FROM doc_counts)
"""

_SQL_BM25_EXPR = (
    "round(ln(1.0::DOUBLE + (s.n_docs - f.df + 0.5::DOUBLE)"
    " / (f.df + 0.5::DOUBLE))"
    " * (c.cnt * 2.2::DOUBLE)"
    " / (c.cnt + 1.2::DOUBLE"
    "    * (0.25::DOUBLE + 0.75::DOUBLE * d.dl / s.avgdl)), 6)"
)

_SQL_BM25_SCORES = f"""
scores AS (
    SELECT c.word, c.doc, {_SQL_BM25_EXPR} AS bm25
    FROM doc_counts c
    JOIN dls d ON c.doc = d.doc
    JOIN dfreq f ON c.word = f.word
    CROSS JOIN stats s)
"""

# 24 deterministic 2-term queries from the top-48-df vocab words —
# keep in lockstep with _batch_query_terms
_SQL_QTERMS = """
vocab AS (SELECT word, count(*) AS df FROM doc_counts GROUP BY word),
qterms AS (
    SELECT (rn - 1) % 24 AS qid, word FROM (
        SELECT word, row_number() OVER (ORDER BY df DESC, word) AS rn
        FROM vocab) t
    WHERE rn <= 48)
"""

# per-qid BM25 chain over the query table — shared by the three batch
# entries (keep in lockstep with operators/retrieval.py
# bm25_search_batch)
_SQL_BM25_BATCH = f"""
perq AS (
    SELECT q.qid, s.doc, sum(s.bm25::DECIMAL(18,6)) AS score_dec
    FROM scores s JOIN qterms q ON s.word = q.word
    GROUP BY q.qid, s.doc),
lexb AS (
    SELECT qid, doc, score_dec, rank FROM (
        SELECT qid, doc, score_dec,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY score_dec DESC, doc)::BIGINT
                   AS rank
        FROM perq) t
    WHERE rank <= {TOP_K})
"""

# the 24-query exact-cosine ranked lists (qid = vec_id < 24, self
# excluded) + the qid-keyed fusion — lockstep with
# hybrid_search_rrf_batch
_SQL_HYBRID_BATCH_TAIL = f"""
vecb AS (
    SELECT qid, doc, rank FROM (
        SELECT q.vec_id AS qid, c.vec_id AS doc,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round({_sql_cosine('c.embedding',
                                               'q.embedding')}, 6) DESC,
                            c.vec_id)::BIGINT AS rank
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 24) t
    WHERE rank <= {TOP_K}),
fusedb AS (
    SELECT qid, doc, sum(1000000000 // (60 + rank))::BIGINT AS rrf_ppb,
           count(*)::BIGINT AS n_lists
    FROM (SELECT qid, doc::BIGINT AS doc, rank FROM lexb
          UNION ALL SELECT qid, doc, rank FROM vecb) u
    GROUP BY qid, doc)
SELECT qid, doc, rrf_ppb, n_lists, rank FROM (
    SELECT qid, doc, rrf_ppb, n_lists,
           row_number() OVER (PARTITION BY qid
                              ORDER BY rrf_ppb DESC, doc)::BIGINT AS rank
    FROM fusedb) t
WHERE rank <= {TOP_K}"""

# Positional token stream: list_filter keeps StringTokenizer semantics
# (no empty tokens); the positional unnest-zip is order-preserving.
_SQL_CLEANED = f"""
cleaned AS (
    SELECT doc_id,
           list_filter(string_split_regex(
               regexp_replace(lower(text), '{_SQL_PUNCT}', ' ', 'g'),
               '{_SQL_DELIM}'), t -> t <> '') AS toks
    FROM documents)
"""

_SQL_POS = f"""
{_SQL_CLEANED},
pos AS (
    SELECT doc_id, unnest(toks) AS word, unnest(range(len(toks))) AS pos
    FROM cleaned)
"""

RETRIEVAL_ORACLE_SQL: dict[str, str] = {
    "bm25_score": f"""
        WITH {_SQL_DOC_COUNTS}, {_SQL_BM25_STATS}, {_SQL_BM25_SCORES}
        SELECT word, doc, bm25 FROM scores""",
    "bm25_search": f"""
        WITH {_SQL_DOC_COUNTS}, {_SQL_BM25_STATS}, {_SQL_BM25_SCORES},
        perdoc AS (
            SELECT doc, sum(bm25::DECIMAL(18,6)) AS score_dec
            FROM scores WHERE word IN ({_SQL_TERMS}) GROUP BY doc)
        SELECT doc, score, rank FROM (
            SELECT doc, score_dec::DOUBLE AS score,
                   row_number() OVER (ORDER BY score_dec DESC, doc)::BIGINT
                       AS rank
            FROM perdoc) t
        WHERE rank <= {TOP_K}""",
    # hybrid RRF (r13): the bm25_search chain + a one-query exact-cosine
    # ranking (document 0's embedding, query-by-example, self EXCLUDED —
    # aligned with the IVF-PQ composite's universe, ADVICE r13),
    # fused as exact integer ppb — 1e9 // (60 + rank) — and re-ranked.
    # The lexical doc key is VARCHAR in the counts CTEs (string rank
    # tie-break matches Spark's, both string) and casts to BIGINT only
    # at fusion, exactly like the Spark side.
    "hybrid_search_rrf": f"""
        WITH {_SQL_DOC_COUNTS}, {_SQL_BM25_STATS}, {_SQL_BM25_SCORES},
        perdoc AS (
            SELECT doc, sum(bm25::DECIMAL(18,6)) AS score_dec
            FROM scores WHERE word IN ({_SQL_TERMS}) GROUP BY doc),
        lex AS (
            SELECT doc::BIGINT AS doc, rank FROM (
                SELECT doc,
                       row_number() OVER (ORDER BY score_dec DESC, doc)::BIGINT
                           AS rank
                FROM perdoc) t
            WHERE rank <= {TOP_K}),
        qv AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
        vecr AS (
            SELECT doc, rank FROM (
                SELECT c.vec_id AS doc,
                       row_number() OVER (
                           ORDER BY round({_sql_cosine('c.embedding',
                                                       'qv.qvec')}, 6) DESC,
                                    c.vec_id)::BIGINT AS rank
                FROM embeddings c, qv WHERE c.vec_id <> 0) t
            WHERE rank <= {TOP_K}),
        fused AS (
            SELECT doc, sum(1000000000 // (60 + rank))::BIGINT AS rrf_ppb,
                   count(*)::BIGINT AS n_lists
            FROM (SELECT * FROM lex UNION ALL SELECT * FROM vecr) u
            GROUP BY doc)
        SELECT doc, rrf_ppb, n_lists, rank FROM (
            SELECT doc, rrf_ppb, n_lists,
                   row_number() OVER (ORDER BY rrf_ppb DESC, doc)::BIGINT
                       AS rank
            FROM fused) t
        WHERE rank <= {TOP_K}""",
    # hybrid RRF with the IVF-PQ vector backend (r13): the lexical CTEs
    # shared with hybrid_search_rrf; the vector list is the
    # similarity_ivfpq composite (reused verbatim as a subquery) sliced
    # to document 0's ranked list
    "hybrid_search_rrf_ann": f"""
        WITH {_SQL_DOC_COUNTS}, {_SQL_BM25_STATS}, {_SQL_BM25_SCORES},
        perdoc AS (
            SELECT doc, sum(bm25::DECIMAL(18,6)) AS score_dec
            FROM scores WHERE word IN ({_SQL_TERMS}) GROUP BY doc),
        lex AS (
            SELECT doc::BIGINT AS doc, rank FROM (
                SELECT doc,
                       row_number() OVER (ORDER BY score_dec DESC, doc)::BIGINT
                           AS rank
                FROM perdoc) t
            WHERE rank <= {TOP_K}),
        vecr AS (
            SELECT vec_id AS doc, rank
            FROM ({LLM_ORACLE_SQL["similarity_ivfpq"]}) iv
            WHERE qid = 0),
        fused AS (
            SELECT doc, sum(1000000000 // (60 + rank))::BIGINT AS rrf_ppb,
                   count(*)::BIGINT AS n_lists
            FROM (SELECT * FROM lex UNION ALL SELECT * FROM vecr) u
            GROUP BY doc)
        SELECT doc, rrf_ppb, n_lists, rank FROM (
            SELECT doc, rrf_ppb, n_lists,
                   row_number() OVER (ORDER BY rrf_ppb DESC, doc)::BIGINT
                       AS rank
            FROM fused) t
        WHERE rank <= {TOP_K}""",
    # ranking-quality eval of the hybrid list (r13): the hybrid SQL as
    # a subquery, relevance = distinct query terms per doc (0-3), the
    # standard graded-gain formulas — doubles round(6) at the edge
    "retrieval_eval_hybrid": f"""
        WITH ranked AS (
            SELECT doc, rank
            FROM ({{HYBRID_SQL}}) h),
        relv AS (
            WITH {_SQL_DOC_COUNTS}
            SELECT doc::BIGINT AS doc, count(DISTINCT word) AS rel
            FROM doc_counts WHERE word IN ({_SQL_TERMS}) GROUP BY doc),
        top AS (
            SELECT r.doc, r.rank AS rk, coalesce(v.rel, 0) AS rel
            FROM ranked r LEFT JOIN relv v USING (doc)
            WHERE r.rank <= {TOP_K}),
        g AS (
            SELECT count(*)::BIGINT AS n_ranked,
                   round(coalesce(
                       max(CASE WHEN rel > 0 THEN 1.0 / rk END), 0.0), 6)
                       AS mrr,
                   round(coalesce(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END),
                                  0)
                         / {float(TOP_K)}, 6) AS precision_at_k,
                   sum((pow(2.0, rel) - 1.0) / log2(rk + 1.0)) AS dcg
            FROM top),
        i AS (
            SELECT sum((pow(2.0, rel) - 1.0) / log2(rn + 1.0)) AS idcg
            FROM (SELECT rel, doc,
                         row_number() OVER (ORDER BY rel DESC, doc) AS rn
                  FROM relv WHERE rel > 0) t
            WHERE rn <= {TOP_K})
        SELECT g.n_ranked, g.mrr, g.precision_at_k,
               round(coalesce(g.dcg, 0.0), 6) AS dcg_at_k,
               round(coalesce(i.idcg, 0.0), 6) AS idcg_at_k,
               round(CASE WHEN coalesce(i.idcg, 0.0) > 0
                          THEN coalesce(g.dcg, 0.0) / i.idcg
                          ELSE 0.0 END, 6) AS ndcg_at_k
        FROM g, i""",
    # per-qid BM25 top-10 over the 24-query batch (r14) — the shared
    # lexb chain, scores computed once for the whole batch
    "bm25_search_batch": f"""
        WITH {_SQL_DOC_COUNTS}, {_SQL_BM25_STATS}, {_SQL_BM25_SCORES},
        {_SQL_QTERMS}, {_SQL_BM25_BATCH}
        SELECT qid, doc, score_dec::DOUBLE AS score, rank FROM lexb""",
    # 24-qid hybrid RRF (r14): the batched BM25 chain fused with the
    # 24-query exact-cosine lists, every window PARTITIONED BY qid
    "hybrid_search_rrf_batch": f"""
        WITH {_SQL_DOC_COUNTS}, {_SQL_BM25_STATS}, {_SQL_BM25_SCORES},
        {_SQL_QTERMS}, {_SQL_BM25_BATCH}, {_SQL_HYBRID_BATCH_TAIL}""",
    # per-qid ranking-quality rows for the hybrid batch (r14): the
    # batch hybrid SQL as a subquery, per-qid relevance = distinct
    # query terms of THAT qid per doc, ideal rankings per qid
    "retrieval_eval_batch": f"""
        WITH rankedb AS (
            SELECT qid, doc, rank FROM ({{HYBRID_BATCH_SQL}}) h),
        relvb AS (
            WITH {_SQL_DOC_COUNTS}, {_SQL_QTERMS}
            SELECT q.qid, c.doc::BIGINT AS doc,
                   count(DISTINCT c.word) AS rel
            FROM doc_counts c JOIN qterms q ON c.word = q.word
            GROUP BY q.qid, c.doc),
        topb AS (
            SELECT r.qid, r.rank AS rk, coalesce(v.rel, 0) AS rel
            FROM rankedb r LEFT JOIN relvb v
              ON r.qid = v.qid AND r.doc = v.doc
            WHERE r.rank <= {TOP_K}),
        g AS (
            SELECT qid, count(*)::BIGINT AS n_ranked,
                   round(coalesce(
                       max(CASE WHEN rel > 0 THEN 1.0 / rk END), 0.0), 6)
                       AS mrr,
                   round(coalesce(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END),
                                  0)
                         / {float(TOP_K)}, 6) AS precision_at_k,
                   sum((pow(2.0, rel) - 1.0) / log2(rk + 1.0)) AS dcg
            FROM topb GROUP BY qid),
        i AS (
            SELECT qid, sum((pow(2.0, rel) - 1.0) / log2(rn + 1.0)) AS idcg
            FROM (SELECT qid, rel, doc,
                         row_number() OVER (PARTITION BY qid
                                            ORDER BY rel DESC, doc) AS rn
                  FROM relvb WHERE rel > 0) t
            WHERE rn <= {TOP_K} GROUP BY qid)
        SELECT g.qid, g.n_ranked, g.mrr, g.precision_at_k,
               round(coalesce(g.dcg, 0.0), 6) AS dcg_at_k,
               round(coalesce(i.idcg, 0.0), 6) AS idcg_at_k,
               round(CASE WHEN coalesce(i.idcg, 0.0) > 0
                          THEN coalesce(g.dcg, 0.0) / i.idcg
                          ELSE 0.0 END, 6) AS ndcg_at_k
        FROM g LEFT JOIN i ON g.qid = i.qid""",
    "boolean_search": f"""
        WITH {_SQL_DOC_COUNTS}
        SELECT doc, occurrences FROM (
            SELECT doc, count(DISTINCT word) AS matched,
                   sum(cnt)::BIGINT AS occurrences
            FROM doc_counts WHERE word IN ({_SQL_TERMS}) GROUP BY doc) h
        WHERE matched = {len(QUERY_TERMS)}
          AND doc NOT IN (
              SELECT doc FROM doc_counts WHERE word IN ({_SQL_EXCLUDE}))""",
    "positional_index": f"""
        WITH {_SQL_POS}
        SELECT doc_id, pos, word FROM pos""",
    "phrase_search": f"""
        WITH {_SQL_POS}
        SELECT a.doc_id, count(*)::BIGINT AS n_matches
        FROM pos a
        JOIN pos b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                  AND b.word = '{PHRASE[1]}'
        WHERE a.word = '{PHRASE[0]}'
        GROUP BY a.doc_id""",
    "boolean_or_search": f"""
        WITH {_SQL_DOC_COUNTS}
        SELECT doc, matched, occurrences FROM (
            SELECT doc, count(DISTINCT word) AS matched,
                   sum(cnt)::BIGINT AS occurrences
            FROM doc_counts WHERE word IN ({_SQL_TERMS}) GROUP BY doc) h
        WHERE matched >= 2""",
    "prefix_search": f"""
        WITH {_SQL_DOC_COUNTS}
        SELECT doc, count(DISTINCT word) AS n_terms,
               sum(cnt)::BIGINT AS occurrences
        FROM doc_counts WHERE word LIKE 'mer%' GROUP BY doc""",
    "proximity_search": f"""
        WITH {_SQL_POS}
        SELECT a.doc_id, count(*)::BIGINT AS n_pairs
        FROM pos a
        JOIN pos b ON b.doc_id = a.doc_id
                  AND abs(a.pos - b.pos) <= 3 AND a.pos <> b.pos
                  AND b.word = '{PHRASE[1]}'
        WHERE a.word = '{PHRASE[0]}'
        GROUP BY a.doc_id""",
    "suggest_terms": f"""
        WITH {_SQL_DOC_COUNTS},
        vocab AS (SELECT word, count(*) AS df FROM doc_counts GROUP BY word),
        cand AS (
            SELECT word, df, levenshtein(word, 'mergw')::BIGINT AS dist
            FROM vocab
            WHERE abs(length(word) - 5) <= 2
              AND levenshtein(word, 'mergw') <= 2)
        SELECT word AS term, df, dist, rank FROM (
            SELECT word, df, dist,
                   row_number() OVER (ORDER BY dist, df DESC, word)::BIGINT
                       AS rank
            FROM cand) t
        WHERE rank <= 5""",
    "udtf_ngrams": f"""
        WITH {_SQL_CLEANED}
        SELECT doc_id,
               unnest(list_transform(range(len(toks) - 2),
                      i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]))
                   AS ngram,
               unnest(range(len(toks) - 2)) AS pos
        FROM cleaned WHERE len(toks) >= 3""",
}

# the eval entries embed the hybrid chains as their ranked-list
# subqueries — substituted post-hoc because both live in the same dict
# literal
RETRIEVAL_ORACLE_SQL["retrieval_eval_hybrid"] = RETRIEVAL_ORACLE_SQL[
    "retrieval_eval_hybrid"
].replace("{HYBRID_SQL}", RETRIEVAL_ORACLE_SQL["hybrid_search_rrf"])
RETRIEVAL_ORACLE_SQL["retrieval_eval_batch"] = RETRIEVAL_ORACLE_SQL[
    "retrieval_eval_batch"
].replace(
    "{HYBRID_BATCH_SQL}", RETRIEVAL_ORACLE_SQL["hybrid_search_rrf_batch"]
)
