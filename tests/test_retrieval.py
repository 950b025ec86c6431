"""Planted-fixture tests for the retrieval surface (BM25, boolean,
positional phrase search).  Oracle parity at sf0.01 is covered by
test_contract_reference.py; these pin the semantics on hand-computed
inputs."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hadoop_invertedindexer_spark.operators.retrieval import (
    bm25_scores,
    bm25_search,
    boolean_search,
    phrase_search,
    positional_tokens,
)


def _counts(spark, rows):
    return spark.createDataFrame(rows, "word string, doc string, count long")


def test_bm25_matches_hand_computation(spark):
    # 2 docs: d1 = {cat:2, dog:1} (dl=3), d2 = {cat:1} (dl=1)
    # N=2, avgdl=2.0; df(cat)=2, df(dog)=1
    counts = _counts(
        spark, [("cat", "d1", 2), ("dog", "d1", 1), ("cat", "d2", 1)]
    )
    got = {
        (r.word, r.doc): r.bm25 for r in bm25_scores(counts).collect()
    }

    def expected(cnt, df, dl, n=2, avgdl=2.0, k1=1.2, b=0.75):
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return round(idf * (cnt * (k1 + 1.0)) / (cnt + k1 * (1 - b + b * dl / avgdl)), 6)

    assert got[("cat", "d1")] == pytest.approx(expected(2, 2, 3), abs=1e-6)
    assert got[("dog", "d1")] == pytest.approx(expected(1, 1, 3), abs=1e-6)
    assert got[("cat", "d2")] == pytest.approx(expected(1, 2, 1), abs=1e-6)
    # rarer term outranks common term at equal tf and dl
    assert got[("dog", "d1")] > got[("cat", "d1")] / 2  # idf(dog) > idf(cat)


def test_bm25_search_ranks_and_caps(spark):
    counts = _counts(
        spark,
        [("cat", "d1", 5), ("dog", "d1", 5), ("cat", "d2", 1), ("emu", "d3", 9)],
    )
    rows = bm25_search(counts, ["cat", "dog"], k=2).collect()
    assert [r.doc for r in rows] == ["d1", "d2"]  # d3 has no query term
    assert [r.rank for r in rows] == [1, 2]
    assert rows[0].score > rows[1].score


def test_boolean_search_conjunction_and_exclusion(spark):
    counts = _counts(
        spark,
        [
            ("cat", "d1", 2), ("dog", "d1", 1),
            ("cat", "d2", 1),                      # missing dog
            ("cat", "d3", 1), ("dog", "d3", 4), ("bad", "d3", 1),
        ],
    )
    got = {r.doc: r.occurrences for r in
           boolean_search(counts, ["cat", "dog"], ["bad"]).collect()}
    assert got == {"d1": 3}  # d2 fails AND; d3 excluded by NOT


def test_phrase_search_counts_every_start_and_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma, alpha beta!"),  # 2 matches; punct stripped
            (2, "beta alpha"),                     # wrong order: 0
            (3, "go go go"),                       # overlapping starts
        ],
        "doc_id long, text string",
    )
    pos = positional_tokens(docs)
    got = {r.doc_id: r.n_matches for r in phrase_search(pos, ["alpha", "beta"]).collect()}
    assert got == {1: 2}
    overlap = {r.doc_id: r.n_matches for r in phrase_search(pos, ["go", "go"]).collect()}
    assert overlap == {3: 2}  # positions (0,1) and (1,2)


def test_positional_tokens_ordinals_ignore_row_and_filter_noise(spark):
    docs = spark.createDataFrame(
        [(7, "  One,  two   THREE ")], "doc_id long, text string"
    )
    rows = sorted(
        positional_tokens(docs).select("pos", "word").collect(),
        key=lambda r: r.pos,
    )
    assert [(r.pos, r.word) for r in rows] == [(0, "one"), (1, "two"), (2, "three")]


def test_bm25_search_topk_plan_is_take_ordered(spark):
    counts = _counts(spark, [("cat", "d1", 1)])
    plan = bm25_search(counts, ["cat"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_persisted_term_index_bucket_prunes(spark, sf_dir):
    from hadoop_invertedindexer_spark.operators.retrieval import (
        build_term_index,
        query_term_index,
    )
    from hadoop_invertedindexer_spark.plans.contract import _doc_counts

    counts = _doc_counts(spark, sf_dir)
    build_term_index(counts, "term_idx_test", n_buckets=16)
    q = query_term_index(spark, "term_idx_test", ["hash", "JOIN"])
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the scan reads only the buckets the two terms hash to
    assert "SelectedBucketsCount" in plan, plan
    n_sel = int(plan.split("SelectedBucketsCount: ")[1].split(" ")[0])
    assert n_sel < 16
    # pruned read ≡ unbucketed filter (lowercasing included)
    got = {(r.word, r.doc, r["count"]) for r in q.collect()}
    want = {
        (r.word, r.doc, r["count"])
        for r in counts.where(F.col("word").isin(["hash", "join"])).collect()
    }
    assert got == want and got


def test_bm25_served_from_persisted_index_matches_direct(spark, sf_dir):
    """The documented serving path — bm25_search over the persisted term
    table with materialize=False — returns exactly the direct result."""
    from hadoop_invertedindexer_spark.operators.retrieval import build_term_index
    from hadoop_invertedindexer_spark.plans.contract import _doc_counts

    counts = _doc_counts(spark, sf_dir)
    build_term_index(counts, "term_idx_serve", n_buckets=8)
    direct = bm25_search(counts, ["hash", "join"], k=5).collect()
    served = bm25_search(
        spark.table("term_idx_serve"), ["hash", "join"], k=5, materialize=False
    ).collect()
    assert [(r.doc, r.score, r.rank) for r in direct] == [
        (r.doc, r.score, r.rank) for r in served
    ]


def test_boolean_or_min_should_match_semantics(spark):
    counts = _counts(
        spark,
        [("cat", "d1", 1), ("dog", "d1", 1),
         ("cat", "d2", 4),
         ("emu", "d3", 1)],
    )
    from hadoop_invertedindexer_spark.operators.retrieval import boolean_or_search

    got = {r.doc: (r.matched, r.occurrences)
           for r in boolean_or_search(counts, ["cat", "dog"], 2).collect()}
    assert got == {"d1": (2, 2)}
    any_match = {r.doc for r in boolean_or_search(counts, ["cat", "dog"], 1).collect()}
    assert any_match == {"d1", "d2"}


def test_proximity_counts_pairs_within_band(spark):
    from hadoop_invertedindexer_spark.operators.retrieval import (
        positional_tokens,
        proximity_search,
    )

    docs = spark.createDataFrame(
        [(1, "alpha x x beta"),     # distance 3: in band
         (2, "alpha x x x beta"),   # distance 4: out
         (3, "beta alpha beta")],   # distances 1 and 1: two pairs
        "doc_id long, text string",
    )
    pos = positional_tokens(docs)
    got = {r.doc_id: r.n_pairs
           for r in proximity_search(pos, "alpha", "beta", 3).collect()}
    assert got == {1: 1, 3: 2}


def test_boolean_or_validates_min_should_match(spark):
    import pytest

    from hadoop_invertedindexer_spark.operators.retrieval import boolean_or_search

    counts = _counts(spark, [("cat", "d1", 1)])
    with pytest.raises(ValueError, match="outside"):
        boolean_or_search(counts, ["cat", "dog"], 0)
    with pytest.raises(ValueError, match="outside"):
        boolean_or_search(counts, ["cat", "dog"], 3)


def test_proximity_rejects_same_term(spark):
    import pytest

    from hadoop_invertedindexer_spark.operators.retrieval import (
        positional_tokens,
        proximity_search,
    )

    pos = positional_tokens(
        spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    )
    with pytest.raises(ValueError, match="twice"):
        proximity_search(pos, "a", "A", 2)


def test_postings_compression_roundtrip_exact(spark, sf_dir):
    """compress -> decompress must reproduce the raw (word, doc, count)
    set exactly, including single-posting terms and id gaps."""
    from pyspark.sql import functions as F

    from hadoop_invertedindexer_spark.operators.retrieval import (
        compress_postings,
        decompress_postings,
    )

    counts = spark.createDataFrame(
        [
            ("apple", 3, 2),
            ("apple", 10, 1),
            ("apple", 11, 7),
            ("pear", 1000000007, 4),  # big ids: gaps stay long-safe
            ("plum", 0, 1),
        ],
        ["word", "doc", "count"],
    )
    comp = compress_postings(counts)
    back = decompress_postings(comp)
    assert sorted(map(tuple, back.collect())) == sorted(
        (r.word, r.doc, r["count"]) for r in counts.collect()
    )
    rows = {r.word: r for r in comp.collect()}
    assert list(rows["apple"].doc_gaps) == [3, 7, 1]  # first raw, then gaps
    assert list(rows["apple"].counts) == [2, 1, 7]
    assert rows["pear"].doc_gaps == [1000000007]


def test_postings_compression_real_corpus_roundtrip(spark, sf_dir):
    from pyspark.sql import functions as F

    from hadoop_invertedindexer_spark.operators.retrieval import (
        compress_postings,
        decompress_postings,
    )
    from hadoop_invertedindexer_spark.plans.contract import tokens_accepted
    from hadoop_invertedindexer_spark.operators.index import term_doc_counts

    counts = term_doc_counts(
        tokens_accepted(spark, sf_dir).withColumn("doc", F.col("doc_id")),
        doc_col="doc",
    )
    back = decompress_postings(compress_postings(counts, doc_col="doc"))
    raw = sorted((r.word, r.doc, r["count"]) for r in counts.collect())
    got = sorted((r.word, r.doc, r["count"]) for r in back.collect())
    assert got == raw and len(raw) > 100


class TestHybridSearchRrf:
    """Reciprocal-rank fusion (r13): hand-computed fixture + structural
    guarantees; the oracle pins the full BM25+cosine composite."""

    def _fused(self, spark, lex_rows, vec_rows, k=10, k0=60):
        from hadoop_invertedindexer_spark.operators.retrieval import (
            hybrid_search_rrf,
        )

        lex = spark.createDataFrame(lex_rows, "doc long, rank long")
        vec = spark.createDataFrame(vec_rows, "vec_id long, rank long")
        return hybrid_search_rrf(lex, vec, k=k, k0=k0).collect()

    def test_hand_computed_fusion(self, spark):
        """lex [A=1, B=2], vec [B=1, C=2] at k0=60: B gets
        1e9//61 + 1e9//62 = 32_522_474 ppb and must outrank A
        (1e9//61 = 16_393_442) and C (1e9//62 = 16_129_032)."""
        rows = self._fused(spark, [(1, 1), (2, 2)], [(2, 1), (3, 2)])
        got = [(r.doc, r.rrf_ppb, r.n_lists, r.rank) for r in rows]
        assert got == [
            (2, 16_393_442 + 16_129_032, 2, 1),
            (1, 16_393_442, 1, 2),
            (3, 16_129_032, 1, 3),
        ]

    def test_tie_breaks_to_lowest_doc(self, spark):
        """Two docs each ranked 1 by exactly one list fuse to the same
        ppb — rank order must fall back to doc asc, deterministically."""
        rows = self._fused(spark, [(7, 1)], [(3, 1)])
        assert [(r.doc, r.rank) for r in rows] == [(3, 1), (7, 2)]

    def test_fused_is_union_and_k_truncates(self, spark):
        lex = [(i, i) for i in range(1, 8)]
        vec = [(i + 100, i) for i in range(1, 8)]
        rows = self._fused(spark, lex, vec, k=5)
        assert len(rows) == 5
        universe = {d for d, _ in lex} | {v for v, _ in vec}
        assert all(r.doc in universe for r in rows)

    def test_both_signals_beat_single_at_same_depth(self, spark):
        """A doc ranked r by BOTH lists always outranks a doc ranked r
        by one list — the property that makes RRF a consensus vote."""
        rows = self._fused(spark, [(1, 3), (2, 3)], [(1, 3)])
        assert [(r.doc, r.n_lists) for r in rows][:1] == [(1, 2)]

    def test_non_numeric_doc_ids_dropped_not_null_fused(self, spark):
        """ADVICE r13: a lexical backend with non-numeric doc ids casts
        to NULL — those rows must be DROPPED, never fused into a single
        NULL group that sums its way into a top-k slot."""
        from hadoop_invertedindexer_spark.operators.retrieval import (
            hybrid_search_rrf,
        )

        lex = spark.createDataFrame(
            [("urn:a", 1), ("urn:b", 2), ("7", 3)], "doc string, rank long"
        )
        vec = spark.createDataFrame([(7, 1)], "vec_id long, rank long")
        rows = hybrid_search_rrf(lex, vec, k=10).collect()
        assert all(r.doc is not None for r in rows)
        assert [(r.doc, r.n_lists) for r in rows] == [(7, 2)]


class TestHybridBatch:
    """r14 (VERDICT r13 ask 2): the qid-batched fusion/eval path — per-
    qid slices must equal the single-query operators, and the fusion
    window must be qid-partitioned (no single-partition global sort)."""

    LEX = [(0, 1, 1), (0, 2, 2), (1, 3, 1), (1, 1, 2), (2, 9, 1)]
    VEC = [(0, 2, 1), (0, 5, 2), (1, 3, 1), (2, 9, 1), (2, 8, 2)]

    def _frames(self, spark):
        lex = spark.createDataFrame(self.LEX, "qid long, doc long, rank long")
        vec = spark.createDataFrame(
            self.VEC, "qid long, vec_id long, rank long"
        )
        return lex, vec

    def test_batch_slices_equal_single_query_fusion(self, spark):
        from hadoop_invertedindexer_spark.operators.retrieval import (
            hybrid_search_rrf,
            hybrid_search_rrf_batch,
        )

        lex, vec = self._frames(spark)
        batch = hybrid_search_rrf_batch(lex, vec, k=5)
        for q in range(3):
            got = sorted(
                (r.doc, r.rrf_ppb, r.n_lists, r.rank)
                for r in batch.where(F.col("qid") == q).collect()
            )
            want = sorted(
                (r.doc, r.rrf_ppb, r.n_lists, r.rank)
                for r in hybrid_search_rrf(
                    lex.where(F.col("qid") == q).drop("qid"),
                    vec.where(F.col("qid") == q).drop("qid"),
                    k=5,
                ).collect()
            )
            assert got == want and got

    def test_fusion_window_is_qid_partitioned(self, spark):
        """Every window in the batch fusion plan partitions by qid and
        the rank filter compiles to WindowGroupLimit — a naive multi-
        query union through the single-query window would funnel all
        queries through ONE partition."""
        import re

        from hadoop_invertedindexer_spark.operators.retrieval import (
            hybrid_search_rrf_batch,
        )

        lex, vec = self._frames(spark)
        plan = (
            hybrid_search_rrf_batch(lex, vec, k=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "WindowGroupLimit" in plan
        specs = re.findall(r"windowspecdefinition\((\w+)", plan)
        assert specs and all(s.startswith("qid") for s in specs)

    def test_bm25_batch_window_is_qid_partitioned(self, spark):
        import re

        from hadoop_invertedindexer_spark.operators.retrieval import (
            bm25_search_batch,
        )

        counts = spark.createDataFrame(
            [("spark", "1", 3), ("join", "1", 1), ("spark", "2", 1)],
            ["word", "doc", "count"],
        )
        qs = spark.createDataFrame(
            [(0, "spark"), (1, "join")], "qid long, word string"
        )
        plan = (
            bm25_search_batch(counts, qs, k=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "WindowGroupLimit" in plan
        specs = re.findall(r"windowspecdefinition\((\w+)", plan)
        assert specs and all(s.startswith("qid") for s in specs)

    def test_bm25_batch_single_qid_matches_single_query(self, spark):
        from hadoop_invertedindexer_spark.operators.retrieval import (
            bm25_search,
            bm25_search_batch,
        )

        counts = spark.createDataFrame(
            [
                ("spark", "1", 3),
                ("join", "1", 1),
                ("spark", "2", 1),
                ("hash", "2", 4),
                ("join", "3", 2),
                ("hash", "3", 1),
            ],
            ["word", "doc", "count"],
        )
        qs = spark.createDataFrame(
            [(7, "spark"), (7, "join")], "qid long, word string"
        )
        got = sorted(
            (r.doc, r.score, r.rank)
            for r in bm25_search_batch(counts, qs, k=3).collect()
        )
        want = sorted(
            (r.doc, r.score, r.rank)
            for r in bm25_search(counts, ["spark", "join"], k=3).collect()
        )
        assert got == want and got

    def test_eval_batch_slices_equal_single_query_eval(self, spark):
        from hadoop_invertedindexer_spark.operators.retrieval import (
            ranking_eval,
            ranking_eval_batch,
        )

        ranked = spark.createDataFrame(
            [(0, 1, 1), (0, 2, 2), (0, 3, 3), (1, 9, 1), (1, 8, 2)],
            "qid long, doc long, rank long",
        )
        rel = spark.createDataFrame(
            [(0, 2, 2), (0, 3, 1), (1, 8, 3), (1, 7, 1)],
            "qid long, doc long, rel int",
        )
        batch = {
            r.qid: (
                r.n_ranked, r.mrr, r.precision_at_k,
                r.dcg_at_k, r.idcg_at_k, r.ndcg_at_k,
            )
            for r in ranking_eval_batch(ranked, rel, k=3).collect()
        }
        assert set(batch) == {0, 1}
        for q in (0, 1):
            s = ranking_eval(
                ranked.where(F.col("qid") == q).drop("qid"),
                rel.where(F.col("qid") == q).drop("qid"),
                k=3,
            ).head()
            assert batch[q] == (
                s.n_ranked, s.mrr, s.precision_at_k,
                s.dcg_at_k, s.idcg_at_k, s.ndcg_at_k,
            )

    def test_eval_batch_no_relevant_docs_scores_zero(self, spark):
        """A qid whose relevance slice is empty still gets a row (it
        HAS a ranking) with all-zero quality — never NULL."""
        from hadoop_invertedindexer_spark.operators.retrieval import (
            ranking_eval_batch,
        )

        ranked = spark.createDataFrame(
            [(5, 1, 1), (5, 2, 2)], "qid long, doc long, rank long"
        )
        rel = spark.createDataFrame([], "qid long, doc long, rel int")
        r = ranking_eval_batch(ranked, rel, k=3).head()
        assert r.qid == 5 and r.n_ranked == 2
        assert (r.mrr, r.precision_at_k, r.dcg_at_k, r.idcg_at_k,
                r.ndcg_at_k) == (0.0, 0.0, 0.0, 0.0, 0.0)


class TestRankingEval:
    """ranking_eval (r13): hand-computed IR metrics + degenerate cases;
    the oracle pins the full hybrid-ranking composite."""

    def _eval(self, spark, ranked_rows, rel_rows, k=3):
        from hadoop_invertedindexer_spark.operators.retrieval import (
            ranking_eval,
        )

        ranked = spark.createDataFrame(ranked_rows, "doc long, rank long")
        rel = spark.createDataFrame(rel_rows, "doc long, rel int")
        return ranking_eval(ranked, rel, k=k).head()

    def test_hand_computed_metrics(self, spark):
        """ranked [1, 2, 3]; rel 2@doc2, 1@doc3:
        mrr = 1/2; p@3 = 2/3;
        dcg = 3/log2(3) + 1/log2(4) = 2.392789...;
        idcg = 3/log2(2) + 1/log2(3) = 3.630930...;
        ndcg = dcg/idcg = 0.659002..."""
        import math

        r = self._eval(
            spark, [(1, 1), (2, 2), (3, 3)], [(2, 2), (3, 1)]
        )
        dcg = 3 / math.log2(3) + 1 / math.log2(4)
        idcg = 3 / math.log2(2) + 1 / math.log2(3)
        assert r.n_ranked == 3
        assert r.mrr == 0.5
        assert r.precision_at_k == round(2 / 3, 6)
        assert r.dcg_at_k == round(dcg, 6)
        assert r.idcg_at_k == round(idcg, 6)
        assert r.ndcg_at_k == round(dcg / idcg, 6)

    def test_perfect_ranking_gets_ndcg_one(self, spark):
        r = self._eval(
            spark, [(9, 1), (8, 2)], [(9, 3), (8, 1)], k=2
        )
        assert r.ndcg_at_k == 1.0 and r.mrr == 1.0
        assert r.precision_at_k == 1.0

    def test_nothing_relevant_is_all_zero(self, spark):
        r = self._eval(spark, [(1, 1), (2, 2)], [(99, 3)], k=2)
        assert (r.mrr, r.precision_at_k, r.dcg_at_k, r.ndcg_at_k) == (
            0.0, 0.0, 0.0, 0.0,
        )
        assert r.idcg_at_k > 0  # the ideal existed; this ranking missed it

    def test_cutoff_ignores_below_k(self, spark):
        """A relevant doc ranked past k contributes nothing."""
        r = self._eval(spark, [(1, 1), (2, 4)], [(2, 2)], k=3)
        assert r.mrr == 0.0 and r.dcg_at_k == 0.0
