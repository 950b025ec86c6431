"""Planted-fixture verification for the dedup ops whose hashing has no
DuckDB twin (MinHash-LSH, SimHash, embedding-LSH) + property checks."""

from __future__ import annotations

import os

import pytest
import pyspark.sql.functions as F

from hadoop_invertedindexer_spark.operators import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the hunter watches "
    "from a distance and the river flows quietly past the old stone bridge "
    "near the village where children play every single afternoon in summer"
)
NEAR = BASE.replace("quietly", "slowly").replace("children", "kids")
OTHER = (
    "completely different content about spark query engines and columnar "
    "execution with vectorized readers shuffling partitions across a large "
    "cluster of machines running adaptive plans for analytic workloads"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, NEAR),       # near-dup of 1
        (3, BASE),       # exact dup of 1
        (4, OTHER),
        (5, "tiny doc"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dedup_exact_groups_exact_copies(spark, docs):
    out = {r.keep_id: r.n_dups for r in dedup.dedup_exact(docs).collect()}
    assert out[1] == 2  # docs 1 and 3 collapse
    assert out[2] == 1 and out[4] == 1 and out[5] == 1


def test_minhash_lsh_finds_planted_near_dup(spark, docs):
    pairs = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.3).collect()
    }
    assert (1, 3) in pairs and pairs[(1, 3)] == 1.0  # exact dup: all sigs equal
    assert (1, 2) in pairs  # near dup caught
    assert all(4 not in p and 5 not in p for p in pairs)  # no false positives


def test_minhash_estimate_tracks_true_jaccard(spark, docs):
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.0, max_df=1000).collect()
    }
    est = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.0).collect()
    }
    j, e = exact[(1, 2)], est[(1, 2)]
    assert abs(j - e) < 0.25, f"minhash estimate {e} far from true jaccard {j}"


def test_minhash_band_report_prices_the_candidate_join(spark, docs):
    """r12 banding observability: candidate_pairs must equal exactly
    what the pair search generates (= pairs at threshold 0.0 — every
    candidate passes est >= 0), and the bucket stats must reflect the
    planted exact-dup clique (docs 1 and 3 share all 16 band keys)."""
    r = dedup.minhash_band_report(docs).collect()[0]
    n_cand = dedup.minhash_lsh_pairs(docs, threshold=0.0).count()
    assert r.candidate_pairs == n_cand
    assert r.n_docs == 5 and r.num_perm == 64 and r.bands == 16
    assert r.max_bucket >= 2  # the exact-dup clique
    assert r.colliding_keys >= 16  # all 16 bands of docs 1/3 collide
    assert r.band_collisions >= r.candidate_pairs  # fanout >= distinct
    assert r.candidates_per_doc_mils == r.candidate_pairs * 1000 // 5


def test_minhash_band_report_portable_matches_fast_shape(spark, docs):
    """The portable (md5) report prices the portable pair search the
    same way the fast report prices the xxhash64 one."""
    r = dedup.minhash_band_report(docs, portable=True).collect()[0]
    n_cand = dedup.minhash_lsh_pairs(
        docs, threshold=0.0, portable=True
    ).count()
    assert r.candidate_pairs == n_cand


def test_minhash_band_report_empty_corpus_zero_not_null(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    r = dedup.minhash_band_report(empty).collect()[0]
    assert (
        r.n_docs, r.n_band_keys, r.colliding_keys, r.max_bucket,
        r.band_collisions, r.candidate_pairs, r.candidates_per_doc_mils,
    ) == (0, 0, 0, 0, 0, 0, 0)


def test_simhash_near_dup(spark, docs):
    fps = {r.id: r.fp for r in dedup.simhash_fingerprints(docs).collect()}
    assert fps[1] == fps[3]  # identical text, identical fingerprint
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_near_dup_pairs(docs, max_hamming=10).collect()
    }
    assert pairs[(1, 3)] == 0
    assert (1, 2) in pairs and pairs[(1, 2)] <= 10
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_embedding_near_dup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # near-parallel to 1
        (3, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
        (4, [-1.0, 0.0, 0.0, 0.0]),     # opposite
        (5, [1.0, 0.0, 0.0, 0.0]),      # identical to 1
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    pairs = {
        (r.id_a, r.id_b): r.cosine
        for r in dedup.embedding_near_dup_pairs(emb, threshold=0.95, nbits=8).collect()
    }
    assert (1, 5) in pairs and pairs[(1, 5)] == 1.0
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.99
    assert all(3 not in p and 4 not in p for p in pairs)


def test_ngram_jaccard_pair_symmetry_and_bounds(spark, docs):
    out = dedup.ngram_jaccard_pairs(docs, threshold=0.0, max_df=1000).collect()
    for r in out:
        assert r.id_a < r.id_b
        assert 0.0 <= r.jaccard <= 1.0


def test_dedup_incremental_admits_only_fresh_unique(spark):
    """New batch vs existing corpus: corpus dups dropped (even with
    formatting differences), within-batch dups keep the smallest id,
    genuinely new docs admitted."""
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "hello world")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [
            (10, "The quick brown FOX!!"),   # dup of corpus 1 after normalize
            (11, "fresh document one"),       # new
            (12, "fresh document one"),       # within-batch dup of 11
            (13, "another new doc"),          # new
            (14, "Hello,   world"),           # dup of corpus 2 after normalize
        ],
        ["doc_id", "text"],
    )
    admitted = sorted(
        r["doc_id"] for r in dedup.dedup_incremental(new, corpus).collect()
    )
    assert admitted == [11, 13]


def test_contamination_flags_planted_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),        # shares 3-grams with eval
            (2, "completely different words here"),
            (3, "ends with alpha beta gamma"),    # shares one 3-gram
        ],
        ["doc_id", "text"],
    )
    evalset = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    out = {r.doc_id: r.n_shared for r in dedup.contamination(train, evalset).collect()}
    # doc 1: shingles {abg, bgd} both in eval; doc 3: {ewa, wab, abg} -> abg only
    assert out == {1: 2, 3: 1}


def test_contamination_clean_train_empty(spark):
    train = spark.createDataFrame([(1, "x y z w")], ["doc_id", "text"])
    evalset = spark.createDataFrame([(2, "p q r s")], ["doc_id", "text"])
    assert dedup.contamination(train, evalset).count() == 0


def _pairset(df):
    return {(r.id_a, r.id_b): r.est_jaccard for r in df.collect()}


def test_minhash_index_pairs_match_rebuild(spark, tmp_path):
    """Incremental batch-vs-index pairs must equal the full rebuild's
    pairs restricted to pairs with >= 1 batch member — the property that
    makes daily near-dup dedup affordable without a corpus rescan."""
    corpus = spark.createDataFrame(
        [(1, BASE), (2, OTHER), (3, "some unrelated corpus text entirely")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            (10, NEAR),   # near-dup of corpus 1
            (11, BASE),   # exact dup of corpus 1
            (12, NEAR),   # exact dup of batch 10 (within-batch pair)
            (13, "genuinely new content nothing like the others at all"),
        ],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "mh")
    dedup.build_minhash_index(corpus, path, portable=False)
    inc = _pairset(
        dedup.minhash_index_pairs(spark, batch, path, threshold=0.3)
    )

    full = _pairset(
        dedup.minhash_lsh_pairs(corpus.union(batch), threshold=0.3)
    )
    batch_ids = {10, 11, 12, 13}
    expected = {
        p: v for p, v in full.items() if p[0] in batch_ids or p[1] in batch_ids
    }
    assert inc == expected
    assert (1, 11) in inc and inc[(1, 11)] == 1.0   # cross exact dup
    assert (10, 12) in inc and inc[(10, 12)] == 1.0  # within-batch dup
    assert all(13 not in p for p in inc)


def test_minhash_index_append_then_second_batch(spark, tmp_path):
    """After append_minhash_index admits batch 1, a second batch's pairs
    against the grown index must equal the rebuild-from-scratch result —
    replay equivalence across ingest days."""
    corpus = spark.createDataFrame([(1, BASE), (2, OTHER)], ["doc_id", "text"])
    day1 = spark.createDataFrame(
        [(10, "totally novel first day content about gardens and rivers")],
        ["doc_id", "text"],
    )
    day2 = spark.createDataFrame(
        [
            (20, NEAR),  # near-dup of corpus 1
            (21, "totally novel first day content about gardens and rivers"),
        ],  # exact dup of day1's 10
        ["doc_id", "text"],
    )
    path = str(tmp_path / "mh2")
    dedup.build_minhash_index(corpus, path)
    dedup.append_minhash_index(day1, path)
    inc = _pairset(dedup.minhash_index_pairs(spark, day2, path, threshold=0.3))

    full = _pairset(
        dedup.minhash_lsh_pairs(corpus.union(day1).union(day2), threshold=0.3)
    )
    expected = {p: v for p, v in full.items() if p[0] in {20, 21} or p[1] in {20, 21}}
    assert inc == expected
    assert (10, 21) in inc and inc[(10, 21)] == 1.0
    assert any(p in inc for p in [(1, 20)])


def test_streaming_minhash_index_matches_batch_build(spark, tmp_path):
    """The stream-maintained tiered index must answer minhash_index_pairs
    identically to a one-shot batch build over the same corpus, and a
    replay (fresh checkpoint, same files) must leave the answer unchanged
    — the overwrite-your-own-batch idempotency contract."""
    from pyspark.sql import types as T

    from hadoop_invertedindexer_spark.streaming import dedup_ingest

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stage = str(tmp_path / "stage")
    src = str(tmp_path / "src")
    day1 = spark.createDataFrame([(1, BASE), (2, OTHER)], schema)
    day2 = spark.createDataFrame(
        [(3, "some unrelated corpus text entirely")], schema
    )
    day1.coalesce(1).write.mode("overwrite").parquet(f"{stage}/d1")
    day2.coalesce(1).write.mode("overwrite").parquet(f"{stage}/d2")
    # flatten into the stream dir: exactly one file per day, nothing else
    # (one file -> one micro-batch with maxFilesPerTrigger=1)
    import glob
    import os
    import shutil

    os.makedirs(src, exist_ok=True)
    for i, d in enumerate(sorted(glob.glob(f"{stage}/d*/part-*.parquet"))):
        shutil.copyfile(d, f"{src}/day{i}.parquet")

    stream_path = str(tmp_path / "mh_stream")
    dedup_ingest.init_minhash_index(spark, stream_path)
    dedup_ingest.maintain_minhash_signatures(
        spark, src, schema, stream_path, str(tmp_path / "ck1")
    )

    batch_path = str(tmp_path / "mh_batch")
    corpus = day1.union(day2)
    dedup.build_minhash_index(corpus, batch_path)

    probe = spark.createDataFrame(
        [(10, NEAR), (11, BASE)], schema  # near-dup + exact dup of corpus 1
    )
    stream_pairs = _pairset(
        dedup.minhash_index_pairs(spark, probe, stream_path, threshold=0.3)
    )
    batch_pairs = _pairset(
        dedup.minhash_index_pairs(spark, probe, batch_path, threshold=0.3)
    )
    assert stream_pairs == batch_pairs
    assert (1, 11) in stream_pairs and stream_pairs[(1, 11)] == 1.0

    # replay: fresh checkpoint re-drains every file; overwrite-by-batch
    # must converge to the same state, not double signatures
    dedup_ingest.maintain_minhash_signatures(
        spark, src, schema, stream_path, str(tmp_path / "ck2")
    )
    replay_pairs = _pairset(
        dedup.minhash_index_pairs(spark, probe, stream_path, threshold=0.3)
    )
    assert replay_pairs == stream_pairs


def test_content_chunks_align_across_offsets(spark):
    """A passage repeated in two docs at different offsets must split
    into identical interior chunks (content-defined boundaries), and
    boilerplate_removal at max_df=2 must drop exactly those shared
    chunks while leaving an unrelated doc untouched."""
    passage = (
        "the quick brown fox jumps over the lazy dog while rain falls "
        "on the quiet empty harbor town at night"
    )
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + passage + " gamma delta"),
            (2, "one two three four " + passage),
            (3, "totally unrelated words live here peacefully"),
        ],
        ["doc_id", "text"],
    )
    chunks = {
        (r.doc_id, r.chunk_id): r.chunk
        for r in dedup.content_chunks(docs).collect()
    }
    shared = {
        c for (d, _), c in chunks.items() if d == 1
    } & {c for (d, _), c in chunks.items() if d == 2}
    assert shared, "no aligned chunks between offset-shifted copies"

    out = {
        r.doc_id: r for r in dedup.boilerplate_removal(docs, max_df=2).collect()
    }
    assert out[1].n_dropped >= 1 and out[2].n_dropped >= 1
    assert out[3].n_dropped == 0
    assert out[3].clean_text == "totally unrelated words live here peacefully"
    # reassembly preserves original token order of the kept chunks
    for d in (1, 2):
        kept_tokens = out[d].clean_text.split(" ")
        orig = [r for r in docs.collect() if r.doc_id == d][0].text.split(" ")
        it = iter(orig)
        assert all(t in it for t in kept_tokens), "kept tokens out of order"


def test_boilerplate_contract_drops_planted_template(spark):
    """At sf0.01 with the 17-token template planted into every 3rd doc,
    planted docs must lose at least one chunk (the aligned template
    interior) — and lose strictly more than the same doc loses without
    the plant (natural short-chunk drops exist in the tiny-vocab
    corpus)."""
    from hadoop_invertedindexer_spark.plans import contract_llm

    out = contract_llm.q_boilerplate_removal(spark, "/root/testdata/sf0.01")
    planted = out.where(F.col("doc_id") % 3 == 0)
    n_planted = planted.count()
    assert planted.where(F.col("n_dropped") >= 1).count() == n_planted


# ------------------------------------------- Bloom-filter decontamination


def test_bloom_decontaminate_contains_exact_answer(spark):
    """Bloom membership can only ADD docs (false positives) relative to
    the exact broadcast-set contamination — never miss one, and never
    report fewer shared shingles for a flagged doc."""
    train = spark.createDataFrame(
        [(1, BASE), (2, OTHER), (3, "nothing shared here at all today")],
        ["doc_id", "text"],
    )
    evalset = spark.createDataFrame([(100, BASE)], ["doc_id", "text"])
    exact = {
        r.doc_id: r.n_shared
        for r in dedup.contamination(train, evalset, n=3).collect()
    }
    bloom = {
        r.doc_id: r.n_flagged
        for r in dedup.bloom_decontaminate(train, evalset, n=3).collect()
    }
    assert set(exact) <= set(bloom)
    for d, n_shared in exact.items():
        assert bloom[d] >= n_shared
    assert 1 in bloom  # the planted full-copy contamination is caught


def test_bloom_decontaminate_clean_train_mostly_empty(spark):
    """With 2^17 bits and a one-doc eval set, a disjoint train side has
    ~zero false-positive shingles (expected FP rate ~(k*s/m)^k ~ 1e-12
    here) — the fixture is deterministic, so exact emptiness is stable."""
    train = spark.createDataFrame([(1, OTHER)], ["doc_id", "text"])
    evalset = spark.createDataFrame([(100, BASE)], ["doc_id", "text"])
    assert dedup.bloom_decontaminate(train, evalset, n=3).count() == 0


def test_bloom_prebuilt_filter_reused(spark):
    """Passing a prebuilt (persistable) bitmap gives the same answer as
    building inline — the daily-batch amortization path."""
    train = spark.createDataFrame([(1, BASE), (2, OTHER)], ["doc_id", "text"])
    evalset = spark.createDataFrame([(100, BASE)], ["doc_id", "text"])
    bloom = dedup.build_bloom_filter(evalset, n=3).persist()
    inline = sorted(
        (r.doc_id, r.n_flagged)
        for r in dedup.bloom_decontaminate(train, evalset, n=3).collect()
    )
    reused = sorted(
        (r.doc_id, r.n_flagged)
        for r in dedup.bloom_decontaminate(train, evalset, n=3, bloom=bloom).collect()
    )
    assert inline == reused and len(inline) == 1


def test_bloom_filter_is_fixed_size_one_row(spark):
    row = dedup.build_bloom_filter(
        spark.createDataFrame([(1, BASE), (2, OTHER)], ["doc_id", "text"]), n=3
    ).collect()
    assert len(row) == 1 and len(row[0].bloom) == dedup.BLOOM_M_BITS // 64


# ------------------------------------------ duplicate-passage detection


PASSAGE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa"
)  # 16 tokens


def test_duplicate_passages_merges_offset_spans(spark):
    """The same 16-token passage planted at different offsets in two docs
    must come back as ONE maximal span per doc, with the correct 0-based
    start and the full 16-token length."""
    docs = spark.createDataFrame(
        [
            (1, PASSAGE + " unique tail one after the borrowed part ends"),
            (2, "totally fresh preamble of five tokens " + PASSAGE),
            (3, OTHER),
        ],
        ["doc_id", "text"],
    )
    spans = {
        r.doc_id: (r.span_start, r.span_len)
        for r in dedup.duplicate_passages(docs, n=8, min_docs=2).collect()
    }
    assert spans[1] == (0, 16)
    assert spans[2] == (6, 16)  # preamble is 6 tokens once normalized
    assert 3 not in spans


def test_duplicate_passages_disjoint_spans_stay_separate(spark):
    """Two shared passages separated by unique middles must NOT merge."""
    p2 = "quebec romeo sierra tango uniform victor whiskey xray yankee zulu"
    mid1 = "own words here that nobody else repeats in any other document"
    mid2 = "different filler text unique to the second document entirely ok"
    docs = spark.createDataFrame(
        [(1, PASSAGE + " " + mid1 + " " + p2), (2, PASSAGE + " " + mid2 + " " + p2)],
        ["doc_id", "text"],
    )
    out = dedup.duplicate_passages(docs, n=8, min_docs=2).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_len))
    for d in (1, 2):
        assert sorted(per_doc[d])[0] == (0, 16)
        assert len(per_doc[d]) == 2  # passage and p2 as separate islands


def test_duplicate_passages_no_dups_empty(spark):
    docs = spark.createDataFrame([(1, BASE), (2, OTHER)], ["doc_id", "text"])
    assert dedup.duplicate_passages(docs, n=8, min_docs=2).count() == 0


class TestDedupSubstrings:
    """ExactSubstr rewrite (r8): keep-one-copy semantics, including the
    within-doc repeats that duplicate_passages' distinct-doc frequency
    intentionally ignores."""

    def _run(self, spark, rows, n=8):
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        return {
            r.doc_id: (r.text, r.removed_tokens)
            for r in dedup.dedup_substrings(docs, n=n).collect()
        }

    def test_exact_copy_fully_removed_canonical_untouched(self, spark):
        base = "alpha beta gamma delta epsilon zeta eta theta unique tail"
        out = self._run(spark, [(1, base), (2, base)])
        assert out[1] == (base, 0)  # canonical (min doc_id) keeps all
        assert out[2] == ("", 10)  # the copy goes entirely

    def test_copied_passage_excised_unique_parts_kept(self, spark):
        base = "alpha beta gamma delta epsilon zeta eta theta unique tail"
        out = self._run(
            spark,
            [
                (1, base),
                (2, "prefix words here alpha beta gamma delta epsilon"
                    " zeta eta theta suffix bits"),
            ],
        )
        assert out[1] == (base, 0)
        assert out[2] == ("prefix words here suffix bits", 8)

    def test_periodic_text_keeps_exactly_one_window(self, spark):
        # every window of 'x '*20 has the same value; the canonical
        # (pos 0) window's coverage PROTECTS its own tokens, so the
        # rewrite keeps exactly n tokens, not just the first one
        out = self._run(spark, [(3, "x " * 20)])
        assert out[3] == ("x x x x x x x x", 12)

    def test_within_doc_repeat_counts_as_duplicate(self, spark):
        rep = "repeat me please one two three four five"
        out = self._run(spark, [(5, rep + " MID " + rep)])
        assert out[5] == (rep.lower() + " mid", 8)

    def test_no_duplication_is_identity_normalized(self, spark):
        t = "Totally distinct sentence, with no duplication at all!"
        out = self._run(spark, [(4, t)])
        assert out[4] == (
            "totally distinct sentence with no duplication at all", 0
        )

    def test_every_input_doc_appears_once(self, spark):
        rows = [(i, f"doc number {i} some words alpha beta gamma delta"
                    f" epsilon zeta eta theta") for i in range(6)]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        out = dedup.dedup_substrings(docs, n=8)
        assert out.count() == 6
        assert out.select("doc_id").distinct().count() == 6


class TestDedupSentences:
    """C4 three-sentence-span dedup (r10): keep-one-copy at sentence
    granularity, composing split_sentences' boundaries with the
    ExactSubstr keeper machinery."""

    def _run(self, spark, rows, span=3):
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        return {
            r.doc_id: (r.text, r.removed_sentences)
            for r in dedup.dedup_sentences(docs, span=span).collect()
        }

    def test_shared_span_removed_canonical_untouched(self, spark):
        shared = "Aaa shared one. Bbb shared two. Ccc shared three."
        out = self._run(
            spark,
            [
                (1, f"intro zero here. {shared} And tail zero"),
                (2, f"different intro x. {shared} And tail two"),
            ],
        )
        assert out[1] == (
            f"intro zero here. {shared} And tail zero", 0
        )
        assert out[2] == ("different intro x. And tail two", 3)

    def test_within_doc_repeat_counts(self, spark):
        run = "Wda own xq. Wdb own rep. Wdc own rep."
        out = self._run(spark, [(5, f"start words here. {run} {run} Tail end")])
        assert out[5] == (f"start words here. {run} Tail end", 3)

    def test_short_docs_dedup_as_whole(self, spark):
        # < span sentences: the whole doc is one span (the short-doc
        # convention), so exact-copy two-sentence docs still dedup
        t = "Only two here. Second sentence now."
        out = self._run(spark, [(1, t), (2, t)])
        assert out[1] == (t, 0)
        assert out[2] == ("", 2)

    def test_normalization_defeats_formatting_differences(self, spark):
        a = "Aaa shared one. Bbb shared two. Ccc shared three."
        b = "AAA shared, one. BBB shared two! CCC shared; three."
        out = self._run(
            spark,
            [(1, f"intro alpha beta. {a} Tail gamma one"),
             (2, f"intro delta eps. {b} Tail gamma two")],
        )
        assert out[1][1] == 0  # canonical
        assert out[2] == ("intro delta eps. Tail gamma two", 3)

    def test_no_duplication_is_identity(self, spark):
        # unlike the token-granular rewrite, the sentence rewrite keeps
        # ORIGINAL sentence text (punctuation, case) — only the keys
        # normalize. Space-rejoin restores the exact input.
        t = "First unique one. Second unique two! Third unique three?"
        out = self._run(spark, [(9, t)])
        assert out[9] == (t, 0)

    def test_every_input_doc_appears_once(self, spark):
        rows = [
            (i, f"doc number {i} words. More doc {i} text. Final {i} bit.")
            for i in range(5)
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        out = dedup.dedup_sentences(docs)
        assert out.count() == 5
        assert out.select("doc_id").distinct().count() == 5


class TestDecontaminateSentences:
    """Sentence-span eval scrub (r10): dedup_sentences minus keeper
    protection, oriented train-vs-eval."""

    CANARY = "Canary alpha one. Canary bravo two. Canary charlie three."

    def _run(self, spark, train_rows, eval_rows, span=3):
        tr = spark.createDataFrame(train_rows, ["doc_id", "text"])
        ev = spark.createDataFrame(eval_rows, ["doc_id", "text"])
        return {
            r.doc_id: (r.text, r.removed_sentences)
            for r in dedup.decontaminate_sentences(tr, ev, span=span).collect()
        }

    def test_canary_spans_excised(self, spark):
        out = self._run(
            spark,
            [
                (1, f"own intro here. {self.CANARY} And my tail"),
                (2, "clean doc alpha. Clean doc beta. Clean doc gamma."),
            ],
            [(100, f"eval intro differs. {self.CANARY} Eval tail x")],
        )
        assert out[1] == ("own intro here. And my tail", 3)
        assert out[2][1] == 0

    def test_no_keeper_protection_even_first_copy_goes(self, spark):
        # unlike dedup_sentences, the train side has no canonical copy:
        # EVERY matching occurrence is scrubbed, including a repeat
        rep = f"{self.CANARY}"
        out = self._run(
            spark,
            [(1, f"intro sentence here. {rep} Middle words now. {rep} Tail")],
            [(100, f"e intro. {rep} E tail")],
        )
        # both canary runs excised (6 sentences), everything else kept
        assert out[1][1] == 6
        assert "Canary" not in out[1][0]
        assert out[1][0].startswith("intro sentence here.")

    def test_whole_short_eval_doc_matches_short_train_doc(self, spark):
        t = "Only two here. Second sentence now."
        out = self._run(spark, [(1, t)], [(100, t)])
        assert out[1] == ("", 2)

    def test_clean_train_is_identity(self, spark):
        t = "First unique one. Second unique two! Third unique three?"
        out = self._run(spark, [(9, t)], [(100, "Nothing shared at all.")])
        assert out[9] == (t, 0)

    def test_every_train_doc_appears(self, spark):
        rows = [
            (i, f"doc number {i} words. More doc {i} text. Final {i} bit.")
            for i in range(5)
        ]
        tr = spark.createDataFrame(rows, ["doc_id", "text"])
        ev = spark.createDataFrame([(100, "Eval only.")], ["doc_id", "text"])
        out = dedup.decontaminate_sentences(tr, ev)
        assert out.count() == 5


class TestDecontaminateSubstrings:
    """Substring-level decontamination (r8): eval windows excised from
    train at span granularity."""

    def _run(self, spark, train_rows, eval_rows, n=8):
        train = spark.createDataFrame(train_rows, ["doc_id", "text"])
        ev = spark.createDataFrame(eval_rows, ["doc_id", "text"])
        return {
            r.doc_id: (r.text, r.removed_tokens)
            for r in dedup.decontaminate_substrings(train, ev, n=n).collect()
        }

    EVAL = [(100, "prefix alpha beta gamma delta epsilon zeta eta theta suffix")]

    def test_quoted_span_excised_own_text_kept(self, spark):
        out = self._run(
            spark,
            [(1, "own words here alpha beta gamma delta epsilon zeta"
                 " eta theta tail bits")],
            self.EVAL,
        )
        assert out[1] == ("own words here tail bits", 8)

    def test_pure_quote_fully_removed(self, spark):
        out = self._run(
            spark,
            [(3, "alpha beta gamma delta epsilon zeta eta theta")],
            self.EVAL,
        )
        assert out[3] == ("", 8)

    def test_clean_train_untouched(self, spark):
        t = "completely clean document with nothing shared at all here"
        out = self._run(spark, [(2, t)], self.EVAL)
        assert out[2] == (t, 0)

    def test_every_train_doc_returned_eval_never(self, spark):
        out = self._run(
            spark,
            [(i, f"clean doc {i} words alpha beta") for i in range(4)],
            self.EVAL,
        )
        assert set(out) == {0, 1, 2, 3}

    def test_two_disjoint_quotes_two_spans(self, spark):
        ev = [(100, "one two three four five six seven eight"),
              (101, "red orange yellow green blue indigo violet ultra")]
        out = self._run(
            spark,
            [(7, "one two three four five six seven eight MID words"
                 " red orange yellow green blue indigo violet ultra END")],
            ev,
        )
        assert out[7] == ("mid words end", 16)


class TestSourceOverlap:
    def _overlap(self, spark, rows, **kw):
        from hadoop_invertedindexer_spark.operators import dedup as D

        docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        return {
            (r.source_a, r.source_b): r.est_jaccard
            for r in D.source_overlap(docs, **kw).collect()
        }

    def test_identical_and_disjoint_sources(self, spark):
        shared = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [
            (1, shared, "sA"),
            (2, shared, "sB"),          # sB shingles == sA shingles
            (3, "one two three four five six seven", "sC"),  # disjoint
        ]
        for portable in (False, True):
            est = self._overlap(spark, rows, portable=portable)
            assert est[("sA", "sB")] == 1.0, portable
            assert est[("sA", "sC")] == 0.0 and est[("sB", "sC")] == 0.0

    def test_partial_overlap_tracks_truth(self, spark):
        # sA: shingles of one long doc; sB shares its first half
        words = [f"w{i}" for i in range(40)]
        rows = [
            (1, " ".join(words), "sA"),
            (2, " ".join(words[:20]), "sB"),
        ]
        est = self._overlap(spark, rows, portable=True)
        # true Jaccard = 18 shared 3-grams / 38 union ≈ 0.47; the 64-perm
        # estimate is within classic MinHash error (±~0.13 at 95%)
        assert 0.2 < est[("sA", "sB")] < 0.75

    def test_one_row_per_unordered_pair(self, spark):
        rows = [(i, f"text body number {i} with words", f"s{i % 4}") for i in range(12)]
        est = self._overlap(spark, rows)
        assert len(est) == 6  # C(4,2)
        assert all(a < b for a, b in est)


class TestDedupUrls:
    """URL-level dedup (r8): canonical-form grouping, min-id keeper."""

    def test_collapse_only_after_canonicalization(self, spark):
        rows = [
            (1, "https://WWW.Example.COM/a?utm_source=x&q=1#f"),
            (2, "https://www.example.com/a?q=1&ref=feed"),
            (3, "https://www.example.com/b?q=1"),  # different path
            (4, "https://www.example.com/a?q=2"),  # different real param
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "url"])
        out = {
            r.canon_url: (r.keep_id, r.n_dups)
            for r in dedup.dedup_urls(docs).collect()
        }
        assert out["https://www.example.com/a?q=1"] == (1, 2)
        assert out["https://www.example.com/b?q=1"] == (3, 1)
        assert out["https://www.example.com/a?q=2"] == (4, 1)

    def test_keeper_is_min_id_and_partition_invariant(self, spark):
        rows = [(i, f"https://Ex.com/p?utm_medium=m&k={i % 3}") for i in
                range(9, 0, -1)]
        docs = spark.createDataFrame(rows, ["doc_id", "url"])
        a = sorted(map(tuple, dedup.dedup_urls(docs).collect()))
        b = sorted(map(tuple, dedup.dedup_urls(docs.repartition(5)).collect()))
        assert a == b
        keepers = {r[1] for r in a}
        assert keepers == {1, 2, 3}  # min id per k residue


class TestContaminationReport:
    """Eval-side contamination measurement (r8): the mirror of
    decontaminate_substrings — per eval doc, union token coverage of
    windows shared with train."""

    def _run(self, spark, train_rows, eval_rows, n=8):
        train = spark.createDataFrame(train_rows, ["doc_id", "text"])
        ev = spark.createDataFrame(eval_rows, ["doc_id", "text"])
        return {
            r.doc_id: (r.n_tokens, r.contaminated_tokens, r.contaminated_frac)
            for r in dedup.contamination_report(train, ev, n=n).collect()
        }

    TRAIN = [
        (1, "own words here alpha beta gamma delta epsilon zeta"
            " eta theta tail bits")
    ]

    def test_quoted_span_counted_once(self, spark):
        # eval doc quotes an 8-token train passage with 2 own tokens on
        # each side: three overlapping 8-windows match, union = 8 tokens
        out = self._run(
            spark,
            self.TRAIN,
            [(100, "prefix words alpha beta gamma delta epsilon zeta"
                   " eta theta suffix end")],
        )
        assert out[100] == (12, 8, round(8 / 12, 6))

    def test_clean_eval_zero(self, spark):
        out = self._run(
            spark, self.TRAIN,
            [(101, "completely unrelated benchmark question text here ok")],
        )
        assert out[101] == (7, 0, 0.0)

    def test_eval_subset_of_train_fully_contaminated(self, spark):
        out = self._run(
            spark, self.TRAIN,
            [(102, "alpha beta gamma delta epsilon zeta eta theta")],
        )
        assert out[102] == (8, 8, 1.0)

    def test_disjoint_quotes_union_not_double_count(self, spark):
        train = [
            (1, "one two three four five six seven eight"),
            (2, "red orange yellow green blue indigo violet ultra"),
        ]
        ev = [(200, "one two three four five six seven eight MID words"
                    " red orange yellow green blue indigo violet ultra END")]
        out = self._run(spark, train, ev)
        assert out[200] == (19, 16, round(16 / 19, 6))

    def test_every_eval_doc_reported(self, spark):
        ev = [(i, f"unique eval words {i} nothing shared") for i in range(3)]
        out = self._run(spark, self.TRAIN, ev)
        assert set(out) == {0, 1, 2}
        assert all(v[1] == 0 for v in out.values())


class TestContaminationReportIncremental:
    def test_incremental_equals_direct(self, spark, tmp_path):
        train = spark.createDataFrame(
            [(1, "own words here alpha beta gamma delta epsilon zeta"
                 " eta theta tail bits"),
             (2, "one two three four five six seven eight nine")],
            ["doc_id", "text"],
        )
        ev = spark.createDataFrame(
            [(100, "prefix words alpha beta gamma delta epsilon zeta"
                   " eta theta suffix end"),
             (101, "completely unrelated benchmark question text here")],
            ["doc_id", "text"],
        )
        direct = sorted(
            map(tuple, dedup.contamination_report(train, ev, n=8).collect())
        )
        path = str(tmp_path / "tidx")
        dedup.build_window_index(train, path, n=8)
        inc = sorted(
            map(tuple, dedup.contamination_report_incremental(
                spark, ev, path, n=8
            ).collect())
        )
        assert inc == direct

    def test_append_extends_the_measured_corpus(self, spark, tmp_path):
        t1 = spark.createDataFrame(
            [(1, "one two three four five six seven eight nine")],
            ["doc_id", "text"],
        )
        t2 = spark.createDataFrame(
            [(2, "red orange yellow green blue indigo violet ultra")],
            ["doc_id", "text"],
        )
        ev = spark.createDataFrame(
            [(100, "red orange yellow green blue indigo violet ultra")],
            ["doc_id", "text"],
        )
        path = str(tmp_path / "tidx")
        dedup.build_window_index(t1, path, n=8)
        before = dedup.contamination_report_incremental(
            spark, ev, path, n=8
        ).collect()[0]
        assert before.contaminated_tokens == 0
        dedup.append_window_index(t2, path, n=8)
        after = dedup.contamination_report_incremental(
            spark, ev, path, n=8
        ).collect()[0]
        assert (after.contaminated_tokens, after.contaminated_frac) == (8, 1.0)


class TestWindowIndexIncremental:
    """Persisted window-hash index (r8): the substring family's member
    of the build/append/query incremental trio."""

    TRAIN = [
        (1, "own words here alpha beta gamma delta epsilon zeta"
            " eta theta tail bits"),
        (2, "completely clean document with nothing shared at all here"),
    ]
    EVAL = [(100, "prefix alpha beta gamma delta epsilon zeta eta theta suffix")]

    def test_incremental_equals_direct(self, spark, tmp_path):
        train = spark.createDataFrame(self.TRAIN, ["doc_id", "text"])
        ev = spark.createDataFrame(self.EVAL, ["doc_id", "text"])
        path = str(tmp_path / "widx")
        dedup.build_window_index(ev, path, n=8)
        inc = {
            r.doc_id: (r.text, r.removed_tokens)
            for r in dedup.decontaminate_substrings_incremental(
                spark, train, path, n=8
            ).collect()
        }
        direct = {
            r.doc_id: (r.text, r.removed_tokens)
            for r in dedup.decontaminate_substrings(train, ev, n=8).collect()
        }
        assert inc == direct

    def test_append_extends_coverage(self, spark, tmp_path):
        train = spark.createDataFrame(
            [(7, "red orange yellow green blue indigo violet ultra plus own")],
            ["doc_id", "text"],
        )
        ev1 = spark.createDataFrame(self.EVAL, ["doc_id", "text"])
        ev2 = spark.createDataFrame(
            [(101, "red orange yellow green blue indigo violet ultra")],
            ["doc_id", "text"],
        )
        path = str(tmp_path / "widx")
        dedup.build_window_index(ev1, path, n=8)
        before = dedup.decontaminate_substrings_incremental(
            spark, train, path, n=8
        ).collect()[0]
        assert before.removed_tokens == 0
        dedup.append_window_index(ev2, path, n=8)
        after = dedup.decontaminate_substrings_incremental(
            spark, train, path, n=8
        ).collect()[0]
        assert after.removed_tokens == 8 and after.text == "plus own"

    def test_duplicate_append_is_idempotent(self, spark, tmp_path):
        train = spark.createDataFrame(self.TRAIN, ["doc_id", "text"])
        ev = spark.createDataFrame(self.EVAL, ["doc_id", "text"])
        path = str(tmp_path / "widx")
        dedup.build_window_index(ev, path, n=8)
        once = sorted(
            tuple(r)
            for r in dedup.decontaminate_substrings_incremental(
                spark, train, path, n=8
            ).collect()
        )
        dedup.append_window_index(ev, path, n=8)  # replay the same batch
        twice = sorted(
            tuple(r)
            for r in dedup.decontaminate_substrings_incremental(
                spark, train, path, n=8
            ).collect()
        )
        assert once == twice

    def test_mismatched_n_fails_loudly(self, spark, tmp_path):
        """ADVICE r9: window hashes of different widths never match, so
        querying an n=8 index with n=4 would silently report zero
        contamination. The persisted params table turns that into a
        loud error on every reader AND the appender."""
        import pytest

        train = spark.createDataFrame(self.TRAIN, ["doc_id", "text"])
        ev = spark.createDataFrame(self.EVAL, ["doc_id", "text"])
        path = str(tmp_path / "widx")
        dedup.build_window_index(ev, path, n=8)
        with pytest.raises(ValueError, match="built with n=8"):
            dedup.decontaminate_substrings_incremental(
                spark, train, path, n=4
            )
        with pytest.raises(ValueError, match="built with n=8"):
            dedup.contamination_report_incremental(spark, train, path, n=4)
        with pytest.raises(ValueError, match="built with n=8"):
            dedup.append_window_index(ev, path, n=4)
        # the matching n still works end-to-end
        assert (
            dedup.contamination_report_incremental(spark, ev, path, n=8)
            .collect()[0]
            .contaminated_frac
            == 1.0
        )


def test_streaming_window_index_matches_batch_build(spark, tmp_path):
    """The stream-maintained window-hash tiers must decontaminate
    identically to a one-shot batch build over the same reference
    corpus, and a fresh-checkpoint replay must leave the answer
    unchanged (overwrite-your-own-batch idempotency)."""
    import glob
    import os
    import shutil

    from pyspark.sql import types as T

    from hadoop_invertedindexer_spark.streaming import dedup_ingest

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    ev1 = spark.createDataFrame(
        [(100, "prefix alpha beta gamma delta epsilon zeta eta theta suffix")],
        schema,
    )
    ev2 = spark.createDataFrame(
        [(101, "red orange yellow green blue indigo violet ultra")], schema
    )
    stage, src = str(tmp_path / "stage"), str(tmp_path / "src")
    ev1.coalesce(1).write.mode("overwrite").parquet(f"{stage}/d1")
    ev2.coalesce(1).write.mode("overwrite").parquet(f"{stage}/d2")
    os.makedirs(src, exist_ok=True)
    for i, d in enumerate(sorted(glob.glob(f"{stage}/d*/part-*.parquet"))):
        shutil.copyfile(d, f"{src}/day{i}.parquet")

    stream_path = str(tmp_path / "w_stream")
    dedup_ingest.init_window_index(spark, stream_path, n=8)
    dedup_ingest.maintain_window_index(
        spark, src, schema, stream_path, str(tmp_path / "ck1")
    )

    batch_path = str(tmp_path / "w_batch")
    dedup.build_window_index(ev1.union(ev2), batch_path, n=8)

    train = spark.createDataFrame(
        [
            (1, "own words alpha beta gamma delta epsilon zeta eta theta tail"),
            (2, "red orange yellow green blue indigo violet ultra plus bits"),
            (3, "a clean document with none of the reference content"),
        ],
        schema,
    )

    def result(path):
        return sorted(
            tuple(r)
            for r in dedup.decontaminate_substrings_incremental(
                spark, train, path, n=8
            ).collect()
        )

    assert result(stream_path) == result(batch_path)
    # replay with a fresh checkpoint: converges, never double-inserts
    dedup_ingest.maintain_window_index(
        spark, src, schema, stream_path, str(tmp_path / "ck2")
    )
    assert result(stream_path) == result(batch_path)


def test_streaming_window_index_rotation_in_flight(spark, tmp_path):
    """r13 (VERDICT r12 ask 6): the maintenance loop wired INTO the
    ingest foreachBatch — overlapping day files accumulate cross-tier
    duplicate hashes, the dup_mils trigger fires MID-DRAIN, the
    compacted fold swaps in, later batches keep appending beside it,
    and the decontamination probe answers identically to a one-shot
    batch build throughout."""
    import glob
    import os
    import shutil

    from pyspark.sql import types as T

    from hadoop_invertedindexer_spark.streaming import dedup_ingest

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    days = [
        spark.createDataFrame([(100, f"prefix {shared} suffix")], schema),
        # day 2 re-publishes day 1's doc (the crash-retry/dup case)
        # plus a fresh one — cross-tier dup mass the trigger must see
        spark.createDataFrame(
            [
                (100, f"prefix {shared} suffix"),
                (101, "red orange yellow green blue indigo violet ultra"),
            ],
            schema,
        ),
        spark.createDataFrame(
            [(102, "one two three four five six seven eight nine")], schema
        ),
    ]
    stage, src = str(tmp_path / "stage"), str(tmp_path / "src")
    for i, d in enumerate(days):
        d.coalesce(1).write.mode("overwrite").parquet(f"{stage}/d{i}")
    os.makedirs(src, exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(f"{stage}/d*/part-*.parquet"))):
        shutil.copyfile(f, f"{src}/day{i}.parquet")

    stream_path = str(tmp_path / "w_stream")
    dedup_ingest.init_window_index(spark, stream_path, n=8)
    # max_dup_mils=100: day 2's replayed hashes push dup share far
    # over 10%, so the rotation fires inside the drain, BETWEEN the
    # day-2 and day-3 tier writes
    dedup_ingest.maintain_window_index(
        spark, src, schema, stream_path, str(tmp_path / "ck1"),
        max_dup_mils=100,
    )
    # the fold happened: a compacted tier exists and no key is stored
    # twice (day 3 landed after the swap, beside the compacted tier)
    tiers = {
        os.path.basename(p)
        for p in glob.glob(f"{stream_path}/windows/batch=*")
    }
    assert "batch=compacted" in tiers
    keys = spark.read.parquet(f"{stream_path}/windows").select("sh")
    assert keys.count() == keys.distinct().count()

    batch_path = str(tmp_path / "w_batch")
    dedup.build_window_index(
        days[0].union(days[1]).union(days[2]).distinct(), batch_path, n=8
    )
    train = spark.createDataFrame(
        [
            (1, f"own words {shared} tail"),
            (2, "red orange yellow green blue indigo violet ultra plus"),
            (3, "a clean document with none of the reference content"),
        ],
        schema,
    )

    def result(path):
        return sorted(
            tuple(r)
            for r in dedup.decontaminate_substrings_incremental(
                spark, train, path, n=8
            ).collect()
        )

    assert result(stream_path) == result(batch_path)
    # a second drain over the same files is a no-op (checkpointed) and
    # the explicit maintainer on an already-compacted root reads
    # dup_mils = 0 and skips — idempotent, nothing rewritten
    r = dedup_ingest.maintain_window_tier(
        spark, stream_path, max_dup_mils=100
    ).first()
    assert r.compacted is False and r.dup_mils == 0
    assert result(stream_path) == result(batch_path)


def test_streaming_exact_tier_rotation_generic(spark, tmp_path):
    """r13: maintain_stream_tier is the GENERIC loop — the same
    trigger→fold→swap over the exact tier's hashes/h, wired through
    maintain_exact_index's max_dup_mils; the incremental probe answers
    identically to a flat batch build after the in-flight rotation."""
    import glob
    import os
    import shutil

    from pyspark.sql import types as T

    from hadoop_invertedindexer_spark.streaming import dedup_ingest

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    days = [
        spark.createDataFrame([(100, "published doc one")], schema),
        # replayed publication: pure cross-tier dup hash mass
        spark.createDataFrame(
            [(100, "published doc one"), (101, "published doc two")],
            schema,
        ),
        spark.createDataFrame([(102, "published doc three")], schema),
    ]
    stage, src = str(tmp_path / "stage"), str(tmp_path / "src")
    for i, d in enumerate(days):
        d.coalesce(1).write.mode("overwrite").parquet(f"{stage}/d{i}")
    os.makedirs(src, exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(f"{stage}/d*/part-*.parquet"))):
        shutil.copyfile(f, f"{src}/day{i}.parquet")

    stream_path = str(tmp_path / "x_stream")
    dedup_ingest.maintain_exact_index(
        spark, src, schema, stream_path, str(tmp_path / "ck"),
        max_dup_mils=100,
    )
    assert os.path.isdir(f"{stream_path}/hashes/batch=compacted")
    keys = spark.read.parquet(f"{stream_path}/hashes").select("h")
    assert keys.count() == keys.distinct().count()

    batch_path = str(tmp_path / "x_batch")
    dedup.build_exact_index(
        days[0].union(days[1]).union(days[2]).distinct(), batch_path
    )
    probe = spark.createDataFrame(
        [
            (1, "published doc one"),      # already published: drops
            (2, "a genuinely fresh doc"),  # fresh: keeps
            (3, "a genuinely fresh doc"),  # batch dup of 2
        ],
        schema,
    )

    def result(path):
        return sorted(
            tuple(r)
            for r in dedup.dedup_exact_incremental(
                spark, probe, path
            ).collect()
        )

    assert result(stream_path) == result(batch_path)
    assert result(stream_path) == [(2, 2)]  # keep_id=2, n_dups=2


class TestSentenceIndex:
    """Persisted sentence-span index trio (r10): incremental == direct
    over (corpus ∪ batch), index side always wins, append extends,
    replay idempotent, span param asserted."""

    CORPUS = [
        (1, "published intro one. Shared pub alpha. Shared pub bravo."
            " Shared pub charlie. Pub tail one"),
    ]
    BATCH = [
        (10, "fresh intro here. Shared pub alpha. Shared pub bravo."
             " Shared pub charlie. Fresh tail x"),
        (11, "batch own text. Batch dup one. Batch dup two."
             " Batch dup three. Middle bit."),
        (12, "other intro y. Batch dup one. Batch dup two."
             " Batch dup three. Other tail z"),
    ]

    def test_incremental_equals_direct_over_union(self, spark, tmp_path):
        corpus = spark.createDataFrame(self.CORPUS, ["doc_id", "text"])
        batch = spark.createDataFrame(self.BATCH, ["doc_id", "text"])
        path = str(tmp_path / "sidx")
        dedup.build_sentence_index(corpus, path)
        inc = {
            r.doc_id: (r.text, r.removed_sentences)
            for r in dedup.dedup_sentences_incremental(
                spark, batch, path
            ).collect()
        }
        direct = {
            r.doc_id: (r.text, r.removed_sentences)
            for r in dedup.dedup_sentences(corpus.union(batch)).collect()
            if r.doc_id >= 10
        }
        assert inc == direct
        # index side won: the published span is gone from doc 10, and
        # the batch-internal dup kept exactly one copy (doc 11)
        assert inc[10] == ("fresh intro here. Fresh tail x", 3)
        assert inc[11][1] == 0 and inc[12][1] == 3

    def test_append_extends_then_idempotent(self, spark, tmp_path):
        corpus = spark.createDataFrame(self.CORPUS, ["doc_id", "text"])
        batch = spark.createDataFrame(self.BATCH[:1], ["doc_id", "text"])
        extra = spark.createDataFrame(
            [(2, "second pub doc. Fresh tail x was published. More here.")],
            ["doc_id", "text"],
        )
        path = str(tmp_path / "sidx")
        dedup.build_sentence_index(corpus, path)
        before = dedup.dedup_sentences_incremental(
            spark, batch, path
        ).collect()[0]
        assert before.removed_sentences == 3
        dedup.append_sentence_index(extra, path)
        dedup.append_sentence_index(extra, path)  # replay: harmless
        after = dedup.dedup_sentences_incremental(
            spark, batch, path
        ).collect()[0]
        assert after.removed_sentences == before.removed_sentences

    def test_mismatched_span_fails_loudly(self, spark, tmp_path):
        import pytest as _pytest

        corpus = spark.createDataFrame(self.CORPUS, ["doc_id", "text"])
        batch = spark.createDataFrame(self.BATCH, ["doc_id", "text"])
        path = str(tmp_path / "sidx")
        dedup.build_sentence_index(corpus, path, span=3)
        with _pytest.raises(ValueError, match="built with span=3"):
            dedup.dedup_sentences_incremental(spark, batch, path, span=2)
        with _pytest.raises(ValueError, match="built with span=3"):
            dedup.append_sentence_index(batch, path, span=2)


def test_streaming_sentence_index_matches_batch_build(spark, tmp_path):
    """The stream-maintained sentence-span tiers must dedup identically
    to a one-shot batch build over the same published corpus, and a
    fresh-checkpoint replay must leave the answer unchanged."""
    import glob
    import os
    import shutil

    from pyspark.sql import types as T

    from hadoop_invertedindexer_spark.streaming import dedup_ingest

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    p1 = spark.createDataFrame(TestSentenceIndex.CORPUS, schema)
    p2 = spark.createDataFrame(
        [(2, "second pub doc. Other tail z was here. More published.")],
        schema,
    )
    stage, src = str(tmp_path / "stage"), str(tmp_path / "src")
    p1.coalesce(1).write.mode("overwrite").parquet(f"{stage}/d1")
    p2.coalesce(1).write.mode("overwrite").parquet(f"{stage}/d2")
    os.makedirs(src, exist_ok=True)
    for i, d in enumerate(sorted(glob.glob(f"{stage}/d*/part-*.parquet"))):
        shutil.copyfile(d, f"{src}/day{i}.parquet")

    stream_path = str(tmp_path / "s_stream")
    dedup_ingest.init_sentence_index(spark, stream_path, span=3)
    dedup_ingest.maintain_sentence_index(
        spark, src, schema, stream_path, str(tmp_path / "ck1")
    )
    batch_path = str(tmp_path / "s_batch")
    dedup.build_sentence_index(p1.union(p2), batch_path)

    batch = spark.createDataFrame(TestSentenceIndex.BATCH, schema)

    def result(path):
        return sorted(
            tuple(r)
            for r in dedup.dedup_sentences_incremental(
                spark, batch, path
            ).collect()
        )

    assert result(stream_path) == result(batch_path)
    dedup_ingest.maintain_sentence_index(
        spark, src, schema, stream_path, str(tmp_path / "ck2")
    )
    assert result(stream_path) == result(batch_path)


class TestDedupParagraphs:
    """Planted-paragraph fixtures for the CCNet paragraph-level dedup:
    first-occurrence-wins across and within documents, empty paragraphs
    kept verbatim, fully-boilerplate docs vanish."""

    @pytest.fixture(scope="class")
    def pdocs(self, spark):
        rows = [
            (1, "alpha one\nshared banner\nalpha tail"),
            (2, "beta one\nshared banner\nbeta tail"),     # banner dup of 1
            (3, "gamma one\ngamma one\ngamma tail"),       # within-doc repeat
            (4, "shared banner"),                          # pure boilerplate
            (5, "delta one\n\ndelta tail"),                # empty middle para
            (6, "Shared  Banner!"),                        # dup modulo norm
        ]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_first_occurrence_wins_cross_doc(self, spark, pdocs):
        out = {r.doc_id: r for r in dedup.dedup_paragraphs(pdocs).collect()}
        assert out[1].text == "alpha one\nshared banner\nalpha tail"
        assert out[1].n_kept == 3 and out[1].n_dropped == 0
        # doc 2 loses only the banner, prose order preserved
        assert out[2].text == "beta one\nbeta tail"
        assert out[2].n_kept == 2 and out[2].n_dropped == 1

    def test_within_doc_repeat_dropped(self, spark, pdocs):
        out = {r.doc_id: r for r in dedup.dedup_paragraphs(pdocs).collect()}
        assert out[3].text == "gamma one\ngamma tail"
        assert out[3].n_dropped == 1

    def test_pure_boilerplate_doc_vanishes(self, spark, pdocs):
        out = {r.doc_id: r for r in dedup.dedup_paragraphs(pdocs).collect()}
        assert 4 not in out
        # normalization-equivalent casing/punctuation also dedups away
        assert 6 not in out

    def test_empty_paragraphs_kept_verbatim(self, spark, pdocs):
        out = {r.doc_id: r for r in dedup.dedup_paragraphs(pdocs).collect()}
        assert out[5].text == "delta one\n\ndelta tail"
        assert out[5].n_kept == 3

    def test_multiple_empty_paragraphs_not_collapsed(self, spark):
        d = spark.createDataFrame(
            [(1, "a\n\nb\n\nc"), (2, "x\n\ny")], ["doc_id", "text"]
        )
        out = {r.doc_id: r for r in dedup.dedup_paragraphs(d).collect()}
        # 2 empties in doc 1 + 1 in doc 2 all survive (unique keys)
        assert out[1].text == "a\n\nb\n\nc"
        assert out[2].text == "x\n\ny"


class TestParagraphIndex:
    """Persisted paragraph-hash index: incremental ≡ direct restricted
    to the batch, O(batch) appends extend it, replay is idempotent, and
    the index side wins regardless of id ordering."""

    @pytest.fixture()
    def corpus_batch(self, spark):
        corpus = spark.createDataFrame(
            [
                (1, "alpha one\nshared banner\nalpha tail"),
                (2, "beta one\nshared banner\nbeta tail"),
            ],
            ["doc_id", "text"],
        )
        batch = spark.createDataFrame(
            [
                (10, "new prose\nshared banner\nnew tail"),
                (11, "late copy\nnew prose\nlate tail"),  # batch-internal dup
                (12, "shared banner"),                    # vanishes entirely
            ],
            ["doc_id", "text"],
        )
        return corpus, batch

    def _direct_restricted(self, corpus, batch, min_id):
        full = dedup.dedup_paragraphs(corpus.unionByName(batch))
        return {
            r.doc_id: (r.text, r.n_kept, r.n_dropped)
            for r in full.collect()
            if r.doc_id >= min_id
        }

    def test_incremental_equals_direct_restricted(
        self, spark, corpus_batch, tmp_path
    ):
        corpus, batch = corpus_batch
        path = str(tmp_path / "pidx")
        dedup.build_paragraph_index(corpus, path)
        got = {
            r.doc_id: (r.text, r.n_kept, r.n_dropped)
            for r in dedup.dedup_paragraphs_incremental(
                spark, batch, path
            ).collect()
        }
        assert got == self._direct_restricted(corpus, batch, 10)
        assert 12 not in got  # pure-boilerplate batch doc vanishes
        # batch-internal first occurrence of 'new prose' (doc 10) wins
        assert got[11][0] == "late copy\nlate tail"

    def test_append_extends_and_replay_idempotent(
        self, spark, corpus_batch, tmp_path
    ):
        corpus, batch = corpus_batch
        extra = spark.createDataFrame(
            [(5, "middle wave\nfresh paragraph here")], ["doc_id", "text"]
        )
        path = str(tmp_path / "pidx")
        dedup.build_paragraph_index(corpus, path)
        dedup.append_paragraph_index(extra, path)
        got = {
            r.doc_id: (r.text, r.n_kept, r.n_dropped)
            for r in dedup.dedup_paragraphs_incremental(
                spark, batch.unionByName(
                    spark.createDataFrame(
                        [(13, "fresh paragraph here\nunique coda")],
                        ["doc_id", "text"],
                    )
                ), path
            ).collect()
        }
        want = self._direct_restricted(
            corpus.unionByName(extra),
            batch.unionByName(
                spark.createDataFrame(
                    [(13, "fresh paragraph here\nunique coda")],
                    ["doc_id", "text"],
                )
            ),
            10,
        )
        assert got == want
        assert got[13][0] == "unique coda"  # appended hash suppressed it
        # replaying the same append changes nothing
        dedup.append_paragraph_index(extra, path)
        again = {
            r.doc_id: (r.text, r.n_kept, r.n_dropped)
            for r in dedup.dedup_paragraphs_incremental(
                spark, batch, path
            ).collect()
        }
        assert again == self._direct_restricted(
            corpus.unionByName(extra), batch, 10
        )

    def test_index_wins_regardless_of_id_order(self, spark, tmp_path):
        corpus = spark.createDataFrame(
            [(100, "published paragraph\npublished tail")], ["doc_id", "text"]
        )
        batch = spark.createDataFrame(
            [(1, "published paragraph\nbrand new")], ["doc_id", "text"]
        )
        path = str(tmp_path / "pidx")
        dedup.build_paragraph_index(corpus, path)
        got = dedup.dedup_paragraphs_incremental(spark, batch, path).collect()
        # batch id 1 < corpus id 100, but the INDEX still wins
        assert got[0].text == "brand new" and got[0].n_dropped == 1


def test_streaming_paragraph_index_matches_batch_build(spark, tmp_path):
    """The stream-maintained paragraph-hash tiers must dedup an ingest
    batch identically to a one-shot batch build over the same published
    corpus, and a fresh-checkpoint replay must leave the answer
    unchanged (overwrite-your-own-batch idempotency)."""
    import glob
    import os
    import shutil

    from pyspark.sql import types as T

    from hadoop_invertedindexer_spark.streaming import dedup_ingest

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    pub1 = spark.createDataFrame(
        [(100, "first banner\nday one prose")], schema
    )
    pub2 = spark.createDataFrame(
        [(101, "second banner\nday two prose")], schema
    )
    stage, src = str(tmp_path / "stage"), str(tmp_path / "src")
    pub1.coalesce(1).write.mode("overwrite").parquet(f"{stage}/d1")
    pub2.coalesce(1).write.mode("overwrite").parquet(f"{stage}/d2")
    os.makedirs(src, exist_ok=True)
    for i, d in enumerate(sorted(glob.glob(f"{stage}/d*/part-*.parquet"))):
        shutil.copyfile(d, f"{src}/day{i}.parquet")

    stream_path = str(tmp_path / "p_stream")
    dedup_ingest.maintain_paragraph_index(
        spark, src, schema, stream_path, str(tmp_path / "ck1")
    )
    batch_path = str(tmp_path / "p_batch")
    dedup.build_paragraph_index(pub1.union(pub2), batch_path)

    batch = spark.createDataFrame(
        [
            (200, "first banner\nnew material\nsecond banner"),
            (201, "entirely novel document text"),
        ],
        schema,
    )

    def result(path):
        return sorted(
            tuple(r)
            for r in dedup.dedup_paragraphs_incremental(
                spark, batch, path
            ).collect()
        )

    got = result(stream_path)
    assert got == result(batch_path)
    assert got[0][1:] == ("new material", 1, 2)  # both banners scrubbed
    # replay with a fresh checkpoint: converges, never double-inserts
    dedup_ingest.maintain_paragraph_index(
        spark, src, schema, stream_path, str(tmp_path / "ck2")
    )
    assert result(stream_path) == result(batch_path)


class TestExactIndex:
    """Persisted document-hash index: incremental ≡ direct restricted to
    batch-side keepers, O(batch) appends extend it, replay is
    idempotent, and the index side wins regardless of id ordering."""

    @pytest.fixture()
    def corpus_batch(self, spark):
        corpus = spark.createDataFrame(
            [(1, "alpha doc"), (2, "Beta,  DOC!"), (3, "alpha doc")],
            ["doc_id", "text"],
        )
        batch = spark.createDataFrame(
            [
                (10, "beta doc"),        # published (normalization collides)
                (11, "fresh text"),
                (12, "fresh  TEXT."),    # batch-internal dup of 11
                (13, "lonely new doc"),
            ],
            ["doc_id", "text"],
        )
        return corpus, batch

    def _direct_restricted(self, corpus, batch, min_id):
        full = dedup.dedup_exact(corpus.unionByName(batch))
        return {
            r.keep_id: r.n_dups
            for r in full.collect()
            if r.keep_id >= min_id
        }

    def test_incremental_equals_direct_restricted(
        self, spark, corpus_batch, tmp_path
    ):
        corpus, batch = corpus_batch
        path = str(tmp_path / "exidx")
        dedup.build_exact_index(corpus, path)
        got = {
            r.keep_id: r.n_dups
            for r in dedup.dedup_exact_incremental(
                spark, batch, path
            ).collect()
        }
        assert got == self._direct_restricted(corpus, batch, 10)
        assert got == {11: 2, 13: 1}  # 10 vanished: published wins

    def test_append_extends_and_replay_idempotent(
        self, spark, corpus_batch, tmp_path
    ):
        corpus, batch = corpus_batch
        extra = spark.createDataFrame(
            [(5, "lonely new doc")], ["doc_id", "text"]
        )
        path = str(tmp_path / "exidx")
        dedup.build_exact_index(corpus, path)
        dedup.append_exact_index(extra, path)
        got = {
            r.keep_id: r.n_dups
            for r in dedup.dedup_exact_incremental(
                spark, batch, path
            ).collect()
        }
        # the appended hash suppressed doc 13
        assert got == {11: 2}
        dedup.append_exact_index(extra, path)  # replay: no change
        again = {
            r.keep_id: r.n_dups
            for r in dedup.dedup_exact_incremental(
                spark, batch, path
            ).collect()
        }
        assert again == got

    def test_index_wins_regardless_of_id_order(self, spark, tmp_path):
        corpus = spark.createDataFrame(
            [(100, "published text")], ["doc_id", "text"]
        )
        batch = spark.createDataFrame(
            [(1, "published text"), (2, "novel")], ["doc_id", "text"]
        )
        path = str(tmp_path / "exidx")
        dedup.build_exact_index(corpus, path)
        got = {
            r.keep_id: r.n_dups
            for r in dedup.dedup_exact_incremental(
                spark, batch, path
            ).collect()
        }
        # batch id 1 < corpus id 100, but the INDEX still wins
        assert got == {2: 1}


def test_streaming_exact_index_matches_batch_build(spark, tmp_path):
    """The stream-maintained document-hash tiers must dedup an ingest
    batch identically to a one-shot batch build over the same published
    corpus, and a fresh-checkpoint replay must leave the answer
    unchanged (overwrite-your-own-batch idempotency)."""
    import glob
    import os
    import shutil

    from pyspark.sql import types as T

    from hadoop_invertedindexer_spark.streaming import dedup_ingest

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    pub1 = spark.createDataFrame([(100, "day one prose")], schema)
    pub2 = spark.createDataFrame([(101, "day two prose")], schema)
    stage, src = str(tmp_path / "stage"), str(tmp_path / "src")
    pub1.coalesce(1).write.mode("overwrite").parquet(f"{stage}/d1")
    pub2.coalesce(1).write.mode("overwrite").parquet(f"{stage}/d2")
    os.makedirs(src, exist_ok=True)
    for i, d in enumerate(sorted(glob.glob(f"{stage}/d*/part-*.parquet"))):
        shutil.copyfile(d, f"{src}/day{i}.parquet")

    stream_path = str(tmp_path / "x_stream")
    dedup_ingest.maintain_exact_index(
        spark, src, schema, stream_path, str(tmp_path / "ck1")
    )
    batch_path = str(tmp_path / "x_batch")
    dedup.build_exact_index(pub1.union(pub2), batch_path)

    batch = spark.createDataFrame(
        [(200, "Day One  PROSE!"), (201, "entirely novel")], schema
    )

    def result(path):
        return sorted(
            tuple(r)
            for r in dedup.dedup_exact_incremental(
                spark, batch, path
            ).collect()
        )

    got = result(stream_path)
    assert got == result(batch_path) == [(201, 1)]
    # replay with a fresh checkpoint: converges, never double-inserts
    dedup_ingest.maintain_exact_index(
        spark, src, schema, stream_path, str(tmp_path / "ck2")
    )
    assert result(stream_path) == result(batch_path)


class TestContaminationReportSentences:
    """Sentence-granular eval-side contamination (r10): union coverage
    over matched 3-sentence runs, never double-counted."""

    def _report(self, spark, train_rows, eval_rows):
        train = spark.createDataFrame(train_rows, ["doc_id", "text"])
        ev = spark.createDataFrame(eval_rows, ["doc_id", "text"])
        return {
            r.doc_id: r
            for r in dedup.contamination_report_sentences(
                train, ev
            ).collect()
        }

    def test_shared_run_counts_and_clean_doc_is_zero(self, spark):
        got = self._report(
            spark,
            [(1, "Shared one. Shared two. Shared three. Train tail here.")],
            [
                (100, "Eval head. Shared one. Shared two. Shared three. Eval tail."),
                (101, "Totally clean. Nothing here. Matches nothing. At all."),
            ],
        )
        hit = got[100]
        assert hit.n_sentences == 5
        assert hit.contaminated_sentences == 3  # the shared triple only
        assert hit.contaminated_frac == 0.6
        clean = got[101]
        assert (clean.contaminated_sentences, clean.contaminated_frac) == (
            0, 0.0,
        )

    def test_overlapping_matches_union_not_double_count(self, spark):
        got = self._report(
            spark,
            [(1, "S1 alpha. S2 bravo. S3 charlie. S4 delta.")],
            [(100, "S1 alpha. S2 bravo. S3 charlie. S4 delta.")],
        )
        r = got[100]
        # spans 0-2 and 1-3 both match: union = 4 sentences, not 6
        assert (r.n_sentences, r.contaminated_sentences) == (4, 4)
        assert r.contaminated_frac == 1.0

    def test_short_doc_whole_span_matches(self, spark):
        got = self._report(
            spark,
            [(1, "Tiny doc here.")],
            [(100, "Tiny doc here."), (101, "Different tiny.")],
        )
        assert got[100].contaminated_frac == 1.0
        assert got[101].contaminated_frac == 0.0


def test_contamination_report_sentences_incremental_matches_direct(
    spark, tmp_path
):
    """The persisted-index sentence report must equal the direct path
    with the index's corpus as train, and refuse a mismatched span."""
    train = spark.createDataFrame(
        [(1, "Shared one. Shared two. Shared three. Train tail here.")],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "Eval head. Shared one. Shared two. Shared three. Eval tail.")],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "sidx")
    dedup.build_sentence_index(train, path)
    inc = sorted(
        tuple(r)
        for r in dedup.contamination_report_sentences_incremental(
            spark, ev, path
        ).collect()
    )
    direct = sorted(
        tuple(r)
        for r in dedup.contamination_report_sentences(train, ev).collect()
    )
    assert inc == direct
    assert inc[0][1:] == (5, 3, 0.6)
    with pytest.raises(ValueError, match="span"):
        dedup.contamination_report_sentences_incremental(
            spark, ev, path, span=5
        )


class TestContainmentPairs:
    def test_subset_fires_directionally(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "alpha bravo charlie delta echo"),
                (2, "alpha bravo charlie delta echo foxtrot golf hotel"
                    " india juliet kilo lima mike november oscar papa"),
                (3, "totally unrelated words live here quietly"),
            ],
            ["doc_id", "text"],
        )
        got = {
            (r.id_sub, r.id_super): r.containment
            for r in dedup.containment_pairs(
                docs, n=3, threshold=0.8
            ).collect()
        }
        # doc 1's 3 shingles are all inside doc 2 -> containment 1.0
        assert got == {(1, 2): 1.0}
        # ...while Jaccard on the same pair is 3/14 — invisible at 0.6
        jac = dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.6
        ).collect()
        assert jac == []

    def test_identical_docs_fire_both_directions(self, spark):
        docs = spark.createDataFrame(
            [(1, "same words in this doc"), (2, "same words in this doc")],
            ["doc_id", "text"],
        )
        got = {
            (r.id_sub, r.id_super): r.containment
            for r in dedup.containment_pairs(docs, threshold=0.8).collect()
        }
        assert got == {(1, 2): 1.0, (2, 1): 1.0}

    def test_max_df_cap_drops_stop_shingles(self, spark):
        # the shared shingle appears in every doc; with max_df=2 it is
        # a stop-shingle and no pair survives
        docs = spark.createDataFrame(
            [(i, "common phrase here") for i in range(1, 5)],
            ["doc_id", "text"],
        )
        assert (
            dedup.containment_pairs(docs, threshold=0.8, max_df=2).count()
            == 0
        )


class TestCapReportsAndEscalation:
    def _saturating_docs(self, spark):
        # 30 docs share a 6-token passage (shingle df = 30 >> cap 10);
        # 20 clean docs are untouched — the r11 30x-soak saturation
        # shape in miniature: at max_df=10 every shared shingle caps
        # and the pair detectors go silently blind
        rows = [(i, "shared alpha bravo charlie delta echo") for i in range(30)]
        rows += [
            (100 + i, f"unique text number {i} plus extra filler words")
            for i in range(20)
        ]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_shingle_cap_report_counts_the_bite(self, spark):
        docs = self._saturating_docs(spark)
        r = dedup.shingle_cap_report(docs, n=3, max_df=10).first()
        assert r.max_df == 10
        # the 4 passage shingles (6 tokens, n=3) are each in 30 docs;
        # the filler docs also share 3 invariant trigrams across all 20
        assert r.capped_keys == 7
        assert r.dropped_postings == 4 * 30 + 3 * 20
        assert r.n_keys > r.capped_keys
        assert 0 < r.dropped_mass_mils < 1000
        assert r.capped_key_mils == r.capped_keys * 1000 // r.n_keys
        # the blind detector the report warns about
        assert dedup.containment_pairs(docs, max_df=10).count() == 0

    def test_winnow_cap_report_counts_the_bite(self, spark):
        docs = self._saturating_docs(spark)
        r = dedup.winnow_cap_report(docs, k=5, w=4, max_df=10).first()
        assert r.capped_keys >= 1 and r.dropped_postings >= 30
        assert 0 < r.dropped_mass_mils < 1000

    def test_clean_corpus_reports_zero(self, spark):
        docs = spark.createDataFrame(
            [(i, f"every document number {i} is fully distinct")
             for i in range(8)],
            ["doc_id", "text"],
        )
        r = dedup.shingle_cap_report(docs, n=3, max_df=10).first()
        assert (r.capped_keys, r.dropped_postings, r.dropped_mass_mils) \
            == (0, 0, 0)

    def test_escalation_recovers_the_saturated_clique(self, spark):
        docs = self._saturating_docs(spark)
        esc = dedup.containment_pairs(
            docs, max_df=10, max_df_tiers=(10, 50), max_dropped_mils=10
        )
        # 30 identical docs -> C(30,2) pairs in BOTH directions
        assert esc.count() == 30 * 29
        wesc = dedup.winnow_overlap_pairs(
            docs, min_shared=1, max_df=10,
            max_df_tiers=(10, 50), max_dropped_mils=10,
        )
        assert wesc.count() == 30 * 29 // 2

    def test_escalation_is_a_superset_of_plain(self, spark):
        # when tier 0 == the fixed cap already satisfies the dropped-
        # mass budget, escalation chooses tier 0 and the output is
        # IDENTICAL to the plain run (no spurious extra pairs)
        docs = spark.createDataFrame(
            [
                (1, "alpha bravo charlie delta echo"),
                (2, "alpha bravo charlie delta echo foxtrot golf hotel"
                    " india juliet kilo lima mike november oscar papa"),
                (3, "totally unrelated words live here quietly"),
            ],
            ["doc_id", "text"],
        )
        plain = sorted(
            tuple(r)
            for r in dedup.containment_pairs(docs, max_df=100).collect()
        )
        esc = sorted(
            tuple(r)
            for r in dedup.containment_pairs(
                docs, max_df=100, max_df_tiers=(100, 400),
                max_dropped_mils=1000,
            ).collect()
        )
        assert plain == esc and len(plain) > 0

    def test_last_tier_is_still_a_hard_bound(self, spark):
        # dropped mass never reaches the budget -> the LAST tier is
        # chosen, and keys over it stay capped (bounded escalation,
        # not an unbounded retry loop)
        docs = self._saturating_docs(spark)
        esc = dedup.containment_pairs(
            docs, max_df=10, max_df_tiers=(10, 20), max_dropped_mils=0
        )
        # passage shingles have df=30 > 20: still dropped at the last
        # tier; the clean docs share nothing -> no pairs at all
        assert esc.count() == 0


class TestWinnowOverlapPairs:
    def test_verbatim_overlap_detected_clean_pair_not(self, spark):
        shared = (
            "alpha bravo charlie delta echo foxtrot golf hotel india"
            " juliet kilo lima"
        )
        docs = spark.createDataFrame(
            [
                (1, f"{shared} own tail words here"),
                (2, f"front matter first {shared}"),
                (3, "completely unrelated document text lives here now"),
            ],
            ["doc_id", "text"],
        )
        got = {
            (r.id_a, r.id_b): r.n_shared
            for r in dedup.winnow_overlap_pairs(
                docs, min_shared=2
            ).collect()
        }
        assert set(got) == {(1, 2)}
        assert got[(1, 2)] >= 2

    def test_max_df_cap_silences_boilerplate_fingerprints(self, spark):
        docs = spark.createDataFrame(
            [(i, "common boilerplate phrase repeated everywhere today")
             for i in range(1, 6)],
            ["doc_id", "text"],
        )
        # every fingerprint appears in all 5 docs; with max_df=2 they
        # are stop-fingerprints and no pair survives
        assert (
            dedup.winnow_overlap_pairs(docs, max_df=2).count() == 0
        )


class TestWinnowPositionCap:
    def test_over_cap_doc_fails_loudly(self, spark):
        # ADVICE r10: the 2^pos_bits cap was documented but unenforced —
        # an over-cap doc corrupted the packed min key silently. With
        # pos_bits=3 (space=8) a 13-token doc has 9 grams > 8 and the
        # job must raise, naming split_long_docs.
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import SparkRuntimeException

        docs = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(13)))],
            ["doc_id", "text"],
        )
        with pytest.raises(
            (SparkRuntimeException, Py4JJavaError),
            match="split_long_docs",
        ):
            dedup.winnow_fingerprints(docs, k=5, w=4, pos_bits=3).collect()

    def test_at_cap_boundary_matches_default_packing(self, spark):
        # exactly space grams (max pos = space-1, packed offset 0) is
        # legal and must select the identical (pos, fp) set as the
        # default 2^20 packing
        docs = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(12)))],  # 8 grams = 2^3
            ["doc_id", "text"],
        )
        tight = sorted(
            (r.pos, r.fp)
            for r in dedup.winnow_fingerprints(
                docs, k=5, w=4, pos_bits=3
            ).collect()
        )
        wide = sorted(
            (r.pos, r.fp)
            for r in dedup.winnow_fingerprints(docs, k=5, w=4).collect()
        )
        assert tight == wide and len(tight) > 0

    def test_pos_bits_over_64bit_budget_rejected(self, spark):
        docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="pos_bits"):
            dedup.winnow_fingerprints(docs, pos_bits=24)


class TestWinnowPairsBounded:
    """r13 (VERDICT r12 ask 2): the declarative per-doc top-k bound on
    the winnow pair stream, plus its truncation-pricing report."""

    CLIQUE_TEXT = (
        "alpha bravo charlie delta echo foxtrot golf hotel india"
        " juliet kilo lima"
    )

    def _clique(self, spark, m: int = 6):
        return spark.createDataFrame(
            [(i, self.CLIQUE_TEXT) for i in range(1, m + 1)],
            ["doc_id", "text"],
        )

    def test_union_keep_on_a_clique(self, spark):
        # 6 identical docs -> 15 true pairs, all with equal n_shared.
        # per_doc_k=2 keeps each doc's 2 smallest-id neighbors; a pair
        # survives when EITHER side ranks it, so the survivor set is
        # exactly {(a,b): b<=3 or a<=2} — 9 pairs, fully deterministic.
        docs = self._clique(spark)
        full = dedup.winnow_overlap_pairs(docs, min_shared=2)
        assert full.count() == 15
        got = {
            (r.id_a, r.id_b)
            for r in dedup.winnow_pairs_bounded(
                docs, min_shared=2, per_doc_k=2
            ).collect()
        }
        want = {
            (a, b)
            for a in range(1, 7)
            for b in range(a + 1, 7)
            if b <= 3 or a <= 2
        }
        assert got == want and len(got) == 9

    def test_bounded_is_subset_with_identical_scores(self, spark):
        docs = self._clique(spark, 5)
        full = {
            (r.id_a, r.id_b): r.n_shared
            for r in dedup.winnow_overlap_pairs(
                docs, min_shared=2
            ).collect()
        }
        for r in dedup.winnow_pairs_bounded(
            docs, min_shared=2, per_doc_k=1
        ).collect():
            assert full[(r.id_a, r.id_b)] == r.n_shared

    def test_large_k_is_identity(self, spark):
        docs = self._clique(spark, 4)
        full = {
            (r.id_a, r.id_b, r.n_shared)
            for r in dedup.winnow_overlap_pairs(
                docs, min_shared=2
            ).collect()
        }
        got = {
            (r.id_a, r.id_b, r.n_shared)
            for r in dedup.winnow_pairs_bounded(
                docs, min_shared=2, per_doc_k=100
            ).collect()
        }
        assert got == full and len(full) == 6

    def test_report_prices_the_truncation(self, spark):
        docs = self._clique(spark)
        r = dedup.winnow_bounded_report(
            docs, min_shared=2, per_doc_k=2
        ).first()
        assert r.per_doc_k == 2
        assert r.n_pairs_full == 15 and r.n_pairs_kept == 9
        assert r.truncated_pairs == 6
        assert r.truncated_mils == 6 * 1000 // 15  # = 400
        assert r.n_docs_paired == 6
        assert r.docs_truncated == 6  # every member's degree 5 > 2
        assert r.max_degree == 5

    def test_report_zero_pairs_all_zero_not_null(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "completely unrelated document text lives here now"),
                (2, "another entirely different body of words sits here"),
            ],
            ["doc_id", "text"],
        )
        r = dedup.winnow_bounded_report(docs, per_doc_k=3).first()
        assert (
            r.n_pairs_full,
            r.n_pairs_kept,
            r.truncated_pairs,
            r.truncated_mils,
            r.n_docs_paired,
            r.docs_truncated,
            r.max_degree,
        ) == (0, 0, 0, 0, 0, 0, 0)

    def test_estimate_identities_at_sample_inv_one(self, spark):
        """sample_inv=1 makes the estimator census-exact: every doc is
        sampled, so est_n_pairs_full = Σdeg/2 = the exact n_pairs_full
        and est_truncated_pairs = Σmax(deg−k,0)/2 — on a clique (fully
        symmetric truncation, zero exactly-one-unranked... pairs where
        exactly one endpoint ranks them DO exist, so the estimate sits
        at the documented upper bound: here 6 members, k=2 → exact
        truncated 6, over-k slots 6·3/2 = 9."""
        docs = self._clique(spark)
        exact = dedup.winnow_bounded_report(
            docs, min_shared=2, per_doc_k=2
        ).first()
        est = dedup.winnow_bounded_report_estimate(
            docs, min_shared=2, per_doc_k=2, sample_inv=1
        ).first()
        assert est.est_n_pairs_full == exact.n_pairs_full == 15
        assert est.sampled_docs_paired == exact.n_docs_paired == 6
        assert est.est_docs_truncated == exact.docs_truncated == 6
        assert est.sampled_max_degree == exact.max_degree == 5
        # the upper bound: est >= exact truncated, excess = half the
        # exactly-one-ranked pairs ((15-9=6 dropped)·2 + 3·1 = 15... on
        # this clique each member unranks 3 of its 5 neighbors: Σ=18,
        # /2 = 9 >= 6
        assert est.est_truncated_pairs == 9 >= exact.truncated_pairs == 6
        assert est.est_truncated_mils >= exact.truncated_mils

    def test_estimate_zero_pairs_all_zero_not_null(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "completely unrelated document text lives here now"),
                (2, "another entirely different body of words sits here"),
            ],
            ["doc_id", "text"],
        )
        r = dedup.winnow_bounded_report_estimate(docs, per_doc_k=3).first()
        assert (
            r.sampled_docs_paired,
            r.sampled_deg_sum,
            r.est_n_pairs_full,
            r.est_truncated_pairs,
            r.est_truncated_mils,
        ) == (0, 0, 0, 0, 0)

    def test_bound_pushed_before_the_exchange(self, spark):
        # the rank<=k filter must compile to WindowGroupLimit partial
        # limits so hub docs never materialize their full neighbor
        # list on one task — the property that makes the bound safe at
        # 100x, not just smaller output
        plan = (
            dedup.winnow_pairs_bounded(self._clique(spark), per_doc_k=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "WindowGroupLimit" in plan


class TestWinnowIndexIncremental:
    """r13: the persisted winnow-fingerprint index — the last dedup
    family without an incremental path. Contract: winnow_index_pairs
    == direct winnow_overlap_pairs over corpus ∪ batch restricted to
    batch-touching pairs."""

    SHARED = (
        "alpha bravo charlie delta echo foxtrot golf hotel india"
        " juliet kilo lima"
    )

    def _split(self, spark):
        corpus = spark.createDataFrame(
            [
                (1, f"{self.SHARED} corpus tail words"),
                (2, "a completely unrelated published document body"),
                (3, f"front matter {self.SHARED}"),
            ],
            ["doc_id", "text"],
        )
        batch = spark.createDataFrame(
            [
                (10, f"{self.SHARED} fresh ingest tail"),
                (11, "another clean unrelated ingest document text"),
            ],
            ["doc_id", "text"],
        )
        return corpus, batch

    def _direct_restricted(self, spark, corpus, batch, **kw):
        full = dedup.winnow_overlap_pairs(corpus.union(batch), **kw)
        return {
            (r.id_a, r.id_b, r.n_shared)
            for r in full.collect()
            if r.id_a >= 10 or r.id_b >= 10
        }

    def test_incremental_equals_direct(self, spark, tmp_path):
        corpus, batch = self._split(spark)
        path = str(tmp_path / "wfidx")
        dedup.build_winnow_index(corpus, path, k=5, w=4)
        got = {
            (r.id_a, r.id_b, r.n_shared)
            for r in dedup.winnow_index_pairs(
                spark, batch, path, min_shared=2
            ).collect()
        }
        want = self._direct_restricted(
            spark, corpus, batch, k=5, w=4, min_shared=2
        )
        assert got == want
        # cross-boundary pairs exist (1,10), (3,10); corpus-only (1,3)
        # is correctly absent; batch doc 10 pairs with both
        assert (1, 10) in {(a, b) for a, b, _ in got}
        assert (1, 3) not in {(a, b) for a, b, _ in got}

    def test_query_uses_stored_params(self, spark, tmp_path):
        # build at non-default (k=4, w=3): the query derives selection
        # from the params table, so it must equal the direct chain at
        # THOSE params, not the defaults
        corpus, batch = self._split(spark)
        path = str(tmp_path / "wfidx")
        dedup.build_winnow_index(corpus, path, k=4, w=3)
        got = {
            (r.id_a, r.id_b, r.n_shared)
            for r in dedup.winnow_index_pairs(
                spark, batch, path, min_shared=2
            ).collect()
        }
        assert got == self._direct_restricted(
            spark, corpus, batch, k=4, w=3, min_shared=2
        )

    def test_append_extends_and_replay_is_idempotent(
        self, spark, tmp_path
    ):
        corpus, batch = self._split(spark)
        path = str(tmp_path / "wfidx")
        dedup.build_winnow_index(corpus, path)
        dedup.append_winnow_index(batch, path)
        probe = spark.createDataFrame(
            [(20, f"{self.SHARED} second day ingest")],
            ["doc_id", "text"],
        )
        want = {
            (r.id_a, r.id_b, r.n_shared)
            for r in dedup.winnow_overlap_pairs(
                corpus.union(batch).union(probe), min_shared=2
            ).collect()
            if r.id_a == 20 or r.id_b == 20
        }
        got1 = {
            (r.id_a, r.id_b, r.n_shared)
            for r in dedup.winnow_index_pairs(
                spark, probe, path, min_shared=2
            ).collect()
        }
        assert got1 == want and any(b == 10 or a == 10 for a, b, _ in got1)
        # crash-retry: the SAME append replayed — duplicate stored rows
        # must not inflate df or n_shared (the query distincts the set)
        dedup.append_winnow_index(batch, path)
        got2 = {
            (r.id_a, r.id_b, r.n_shared)
            for r in dedup.winnow_index_pairs(
                spark, probe, path, min_shared=2
            ).collect()
        }
        assert got2 == got1

    def test_maintain_winnow_tier_rotation(self, spark, tmp_path):
        import os

        corpus, batch = self._split(spark)
        path = str(tmp_path / "wfidx")
        dedup.build_winnow_index(corpus, path)
        for _ in range(3):  # replayed appends: the reclaimable mass
            dedup.append_winnow_index(batch, path)
        rot = str(tmp_path / "wfidx_rot")
        maint = dedup.maintain_index_tier(
            spark, path, rot, "winnow", max_dup_mils=10
        ).collect()
        assert maint[0].tier_table == "fps" and maint[0].compacted
        assert maint[0].reclaimed_rows > 0
        assert os.path.isdir(f"{rot}/fps")
        # params travel with the copy; the probe answers identically
        p = spark.read.parquet(f"{rot}/params").head()
        assert (p.k, p.w) == (5, 4)
        probe = spark.createDataFrame(
            [(20, f"{self.SHARED} probe text here")], ["doc_id", "text"]
        )
        before = sorted(
            tuple(r)
            for r in dedup.winnow_index_pairs(spark, probe, path).collect()
        )
        after = sorted(
            tuple(r)
            for r in dedup.winnow_index_pairs(spark, probe, rot).collect()
        )
        assert before == after and len(after) > 0


def test_streaming_winnow_index_matches_batch_and_rotates(spark, tmp_path):
    """r13: the stream-maintained winnow index — tiers written at the
    STORED (k, w), two-column (id, fp) key folded by the in-drain
    maintenance loop — must answer winnow_index_pairs identically to a
    one-shot batch build over the same published corpus."""
    import glob
    import os
    import shutil

    from pyspark.sql import types as T

    from hadoop_invertedindexer_spark.streaming import dedup_ingest

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    shared = (
        "alpha bravo charlie delta echo foxtrot golf hotel india"
        " juliet kilo"
    )
    days = [
        spark.createDataFrame([(100, f"{shared} first day tail")], schema),
        # replayed publication: cross-tier dup (id, fp) mass
        spark.createDataFrame(
            [
                (100, f"{shared} first day tail"),
                (101, "an unrelated second day document body here"),
            ],
            schema,
        ),
    ]
    stage, src = str(tmp_path / "stage"), str(tmp_path / "src")
    for i, d in enumerate(days):
        d.coalesce(1).write.mode("overwrite").parquet(f"{stage}/d{i}")
    os.makedirs(src, exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(f"{stage}/d*/part-*.parquet"))):
        shutil.copyfile(f, f"{src}/day{i}.parquet")

    stream_path = str(tmp_path / "wf_stream")
    dedup_ingest.init_winnow_index(spark, stream_path, k=5, w=4)
    dedup_ingest.maintain_winnow_index(
        spark, src, schema, stream_path, str(tmp_path / "ck"),
        max_dup_mils=100,
    )
    assert os.path.isdir(f"{stream_path}/fps/batch=compacted")
    rows = spark.read.parquet(f"{stream_path}/fps").select("id", "fp")
    assert rows.count() == rows.distinct().count()

    batch_path = str(tmp_path / "wf_batch")
    dedup.build_winnow_index(
        days[0].union(days[1]).distinct(), batch_path, k=5, w=4
    )
    probe = spark.createDataFrame(
        [(200, f"{shared} probe ingest text")], schema
    )

    def result(path):
        return sorted(
            tuple(r)
            for r in dedup.winnow_index_pairs(
                spark, probe, path, min_shared=2
            ).collect()
        )

    assert result(stream_path) == result(batch_path)
    assert len(result(stream_path)) > 0  # the shared passage pairs


class TestPairsTopkBounded:
    """r13: the bound as a standalone policy over any canonical scored
    pair frame — the shape every set-similarity op emits."""

    def _pairs(self, spark, rows, score="jaccard"):
        return spark.createDataFrame(rows, ["id_a", "id_b", score])

    def test_union_keep_and_score_ordering(self, spark):
        # doc 1's neighbors by score: 4 (0.9), 3 (0.8), 2 (0.7).
        # per_doc_k=1 keeps (1,4) from 1's side; (1,3) and (1,2)
        # survive via 3's and 2's sides (1 is their only neighbor)
        pairs = self._pairs(
            spark, [(1, 2, 0.7), (1, 3, 0.8), (1, 4, 0.9)]
        )
        got = {
            (r.id_a, r.id_b, r.jaccard)
            for r in dedup.pairs_topk_bounded(
                pairs, per_doc_k=1, score_col="jaccard"
            ).collect()
        }
        assert got == {(1, 2, 0.7), (1, 3, 0.8), (1, 4, 0.9)}

    def test_truncates_only_pairs_unranked_by_both_sides(self, spark):
        # a 4-clique at equal score: per_doc_k=1 keeps each member's
        # smallest-id neighbor -> union = {(1,2),(1,3),(1,4)}; (2,3),
        # (2,4),(3,4) are unranked by BOTH endpoints and drop
        clique = [
            (a, b, 1.0) for a in range(1, 5) for b in range(a + 1, 5)
        ]
        got = {
            (r.id_a, r.id_b)
            for r in dedup.pairs_topk_bounded(
                self._pairs(spark, clique), per_doc_k=1,
                score_col="jaccard",
            ).collect()
        }
        assert got == {(1, 2), (1, 3), (1, 4)}

    def test_winnow_bounded_is_the_same_policy(self, spark):
        # winnow_pairs_bounded must equal pairs_topk_bounded applied to
        # winnow_overlap_pairs — the factored policy is not a fork
        docs = spark.createDataFrame(
            [
                (i, "alpha bravo charlie delta echo foxtrot golf"
                    " hotel india")
                for i in range(1, 6)
            ],
            ["doc_id", "text"],
        )
        direct = {
            tuple(r)
            for r in dedup.winnow_pairs_bounded(
                docs, min_shared=2, per_doc_k=2
            ).collect()
        }
        composed = {
            tuple(r)
            for r in dedup.pairs_topk_bounded(
                dedup.winnow_overlap_pairs(docs, min_shared=2),
                per_doc_k=2,
                score_col="n_shared",
            ).collect()
        }
        assert direct == composed and len(direct) > 0


class TestShingleCapRecallEstimate:
    """r13 (VERDICT r12 ask 4): the cap report priced in PAIRS —
    deterministic md5 sampling, bounded expansion, closed-form mega
    keys."""

    def _shared_passage_docs(self, spark, m: int = 5, passage="xq yq zq"):
        # m docs share one 3-token passage; distinct filler keeps the
        # corpus from collapsing to exact dups
        return spark.createDataFrame(
            [
                (i, f"{passage} filler{i} alone{i} tail{i}")
                for i in range(1, m + 1)
            ],
            ["doc_id", "text"],
        )

    def test_single_capped_key_fully_expanded(self, spark):
        docs = self._shared_passage_docs(spark)
        r = dedup.shingle_cap_recall_estimate(
            docs, n=3, max_df=3, sample_inv=1, expand_max_df=2000
        ).first()
        assert r.capped_keys == 1 and r.sampled_keys == 1
        assert r.expanded_keys == 1 and r.mega_keys == 0
        assert r.sampled_pairs_distinct == 10  # C(5,2)
        assert r.mega_pair_slots == 0
        assert r.est_capped_pairs == 10
        assert r.capped_pair_slots_exact == 10

    def test_mega_key_priced_by_closed_form(self, spark):
        docs = self._shared_passage_docs(spark)
        r = dedup.shingle_cap_recall_estimate(
            docs, n=3, max_df=3, sample_inv=1, expand_max_df=4
        ).first()
        # df=5 > expand_max_df=4: never expanded, priced as df(df-1)/2
        assert r.expanded_keys == 0 and r.mega_keys == 1
        assert r.sampled_pairs_distinct == 0
        assert r.mega_pair_slots == 10 and r.est_capped_pairs == 10

    def test_cross_key_dedup_within_sample(self, spark):
        # a shared 4-token passage yields TWO overlapping capped
        # shingles over the SAME 5 docs: slots double-count (20) but
        # the expanded estimate deduplicates to the 10 true pairs
        docs = self._shared_passage_docs(spark, passage="xq yq zq wq")
        r = dedup.shingle_cap_recall_estimate(
            docs, n=3, max_df=3, sample_inv=1, expand_max_df=2000
        ).first()
        assert r.capped_keys == 2
        assert r.capped_pair_slots_exact == 20
        assert r.sampled_pairs_distinct == 10
        assert r.est_capped_pairs == 10

    def test_uncapped_corpus_all_zero_not_null(self, spark):
        docs = self._shared_passage_docs(spark)
        r = dedup.shingle_cap_recall_estimate(
            docs, n=3, max_df=100, sample_inv=1
        ).first()
        assert (
            r.capped_keys,
            r.sampled_keys,
            r.expanded_keys,
            r.mega_keys,
            r.sampled_pairs_distinct,
            r.mega_pair_slots,
            r.est_capped_pairs,
            r.capped_pair_slots_exact,
        ) == (0, 0, 0, 0, 0, 0, 0, 0)

    def test_winnow_twin_shares_the_core(self, spark):
        # the winnow-side estimator: 5 docs share one full passage, so
        # EVERY selected fingerprint of that passage is capped at df=5;
        # sample_inv=1 expands all of them and the distinct pairs
        # deduplicate to the C(5,2)=10 true pairs regardless of how
        # many fingerprints the clique shares
        docs = spark.createDataFrame(
            [
                (
                    i,
                    "alpha bravo charlie delta echo foxtrot golf hotel"
                    f" india tail{i}",
                )
                for i in range(1, 6)
            ],
            ["doc_id", "text"],
        )
        r = dedup.winnow_cap_recall_estimate(
            docs, k=5, w=4, max_df=3, sample_inv=1, expand_max_df=2000
        ).first()
        assert r.capped_keys >= 1
        assert r.sampled_keys == r.capped_keys  # sample_inv=1
        assert r.sampled_pairs_distinct == 10
        assert r.est_capped_pairs == 10
        assert r.capped_pair_slots_exact == 10 * r.capped_keys

    def test_sampling_is_md5_deterministic(self, spark):
        # at sample_inv=8 the sampled subset is a pure function of the
        # shingle strings: 'hotel india juliet' is the one planted key
        # with h40 % 8 == 0 (the contract entry's documented anchor)
        import hashlib

        h40 = int(
            hashlib.md5(b"hotel india juliet").hexdigest()[:10], 16
        )
        assert h40 % 8 == 0
        docs = self._shared_passage_docs(
            spark, passage="hotel india juliet"
        )
        r = dedup.shingle_cap_recall_estimate(
            docs, n=3, max_df=3, sample_inv=8, expand_max_df=2000
        ).first()
        assert r.sampled_keys == 1 and r.est_capped_pairs == 8 * 10


class TestIndexCompaction:
    """r11: the reclaim step every append_* docstring promises — read-
    distinct-rewrite into a rotation dir. Contract per tier: the
    compacted copy's key SET equals the source's (compact ∘ append ≡
    append-distinct), bytes shrink, params travel, and the incremental
    queries answer identically before/after."""

    @staticmethod
    def _bytes(p):
        total = 0
        for root, _, files in os.walk(str(p)):
            for f in files:
                if not f.startswith(("_", ".")):
                    total += os.path.getsize(os.path.join(root, f))
        return total

    @staticmethod
    def _docs(spark, ids):
        return spark.createDataFrame(
            [
                (
                    i,
                    f"Alpha bravo charlie delta echo golf hotel india w{i}."
                    f" Bravo second sentence here w{i}."
                    f" Charlie third sentence closes w{i}.",
                )
                for i in ids
            ],
            ["doc_id", "text"],
        )

    def test_in_place_compaction_refused(self, spark, tmp_path):
        path = str(tmp_path / "exidx")
        dedup.build_exact_index(self._docs(spark, range(5)), path)
        with pytest.raises(ValueError, match="in place"):
            dedup.compact_exact_index(spark, path, path)

    def test_exact_tier(self, spark, tmp_path):
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        corpus = self._docs(spark, range(60))
        batch = self._docs(spark, range(40, 80))
        dedup.build_exact_index(corpus, src)
        for _ in range(3):  # heavy duplication: 40-59 re-land each time
            dedup.append_exact_index(batch, src)
        dedup.compact_exact_index(spark, src, dst)
        s = spark.read.parquet(f"{src}/hashes")
        d = spark.read.parquet(f"{dst}/hashes")
        assert d.count() == s.distinct().count() < s.count()
        assert set(r.h for r in d.collect()) == set(
            r.h for r in s.collect()
        )
        assert self._bytes(dst) < self._bytes(src)
        probe = self._docs(spark, [70, 200]).unionByName(
            self._docs(spark, [200]).selectExpr("doc_id + 1 as doc_id", "text")
        )
        before = sorted(
            tuple(r)
            for r in dedup.dedup_exact_incremental(spark, probe, src).collect()
        )
        after = sorted(
            tuple(r)
            for r in dedup.dedup_exact_incremental(spark, probe, dst).collect()
        )
        assert before == after and len(before) > 0

    def test_window_tier_params_travel(self, spark, tmp_path):
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        dedup.build_window_index(self._docs(spark, range(30)), src, n=8)
        dedup.append_window_index(self._docs(spark, range(20, 50)), src, n=8)
        dedup.append_window_index(self._docs(spark, range(20, 50)), src, n=8)
        dedup.compact_window_index(spark, src, dst)
        s = spark.read.parquet(f"{src}/windows")
        d = spark.read.parquet(f"{dst}/windows")
        assert d.count() == s.distinct().count() < s.count()
        assert self._bytes(dst) < self._bytes(src)
        probe = self._docs(spark, [40, 300])
        before = sorted(
            tuple(r)
            for r in dedup.decontaminate_substrings_incremental(
                spark, probe, src, n=8
            ).collect()
        )
        after = sorted(
            tuple(r)
            for r in dedup.decontaminate_substrings_incremental(
                spark, probe, dst, n=8
            ).collect()
        )
        assert before == after
        # the n-param assertion holds identically on the compacted copy
        with pytest.raises(ValueError, match="n=8"):
            dedup.decontaminate_substrings_incremental(
                spark, probe, dst, n=5
            )

    def test_sentence_tier_params_travel(self, spark, tmp_path):
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        dedup.build_sentence_index(self._docs(spark, range(30)), src, span=3)
        dedup.append_sentence_index(
            self._docs(spark, range(20, 50)), src, span=3
        )
        dedup.append_sentence_index(
            self._docs(spark, range(20, 50)), src, span=3
        )
        dedup.compact_sentence_index(spark, src, dst)
        s = spark.read.parquet(f"{src}/sentences")
        d = spark.read.parquet(f"{dst}/sentences")
        assert d.count() == s.distinct().count() < s.count()
        assert self._bytes(dst) < self._bytes(src)
        probe = self._docs(spark, [40, 400])
        before = sorted(
            tuple(r)
            for r in dedup.dedup_sentences_incremental(
                spark, probe, src, span=3
            ).collect()
        )
        after = sorted(
            tuple(r)
            for r in dedup.dedup_sentences_incremental(
                spark, probe, dst, span=3
            ).collect()
        )
        assert before == after
        with pytest.raises(ValueError, match="span=3"):
            dedup.dedup_sentences_incremental(spark, probe, dst, span=2)

    def test_paragraph_tier(self, spark, tmp_path):
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        para = self._docs(spark, range(30)).selectExpr(
            "doc_id", "replace(text, '. ', chr(10) || chr(10)) as text"
        )
        batch = self._docs(spark, range(20, 50)).selectExpr(
            "doc_id", "replace(text, '. ', chr(10) || chr(10)) as text"
        )
        dedup.build_paragraph_index(para, src)
        dedup.append_paragraph_index(batch, src)
        dedup.append_paragraph_index(batch, src)
        dedup.compact_paragraph_index(spark, src, dst)
        s = spark.read.parquet(f"{src}/paragraphs")
        d = spark.read.parquet(f"{dst}/paragraphs")
        assert d.count() == s.distinct().count() < s.count()
        assert self._bytes(dst) < self._bytes(src)
        probe = self._docs(spark, [40, 500]).selectExpr(
            "doc_id", "replace(text, '. ', chr(10) || chr(10)) as text"
        )
        before = sorted(
            tuple(r)
            for r in dedup.dedup_paragraphs_incremental(
                spark, probe, src
            ).collect()
        )
        after = sorted(
            tuple(r)
            for r in dedup.dedup_paragraphs_incremental(
                spark, probe, dst
            ).collect()
        )
        assert before == after

    def test_minhash_tier(self, spark, tmp_path):
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        corpus = self._docs(spark, range(30))
        batch = self._docs(spark, range(20, 45))
        dedup.build_minhash_index(corpus, src, portable=True)
        dedup.append_minhash_index(batch, src)
        dedup.append_minhash_index(batch, src)  # replayed ingest
        dedup.compact_minhash_index(spark, src, dst)
        for sub in ("signatures", "banded"):
            s = spark.read.parquet(f"{src}/{sub}")
            d = spark.read.parquet(f"{dst}/{sub}")
            assert d.count() == s.distinct().count() < s.count()
        assert self._bytes(dst) < self._bytes(src)
        p_src = spark.read.parquet(f"{src}/params").head()
        p_dst = spark.read.parquet(f"{dst}/params").head()
        assert tuple(p_src) == tuple(p_dst)
        probe = self._docs(spark, [25, 600])
        before = sorted(
            tuple(r)
            for r in dedup.minhash_index_pairs(
                spark, probe, src, threshold=0.3
            ).collect()
        )
        after = sorted(
            tuple(r)
            for r in dedup.minhash_index_pairs(
                spark, probe, dst, threshold=0.3
            ).collect()
        )
        assert before == after and len(before) > 0


class TestIndexTierStats:
    def test_counts_and_compaction_trigger(self, spark, tmp_path):
        path = str(tmp_path / "exidx")
        corpus = spark.createDataFrame(
            [(1, "alpha doc"), (2, "beta doc"), (3, "alpha doc")],
            ["doc_id", "text"],
        )
        batch = spark.createDataFrame(
            [(10, "beta doc"), (11, "fresh text")], ["doc_id", "text"]
        )
        dedup.build_exact_index(corpus, path)       # 2 distinct norms
        dedup.append_exact_index(batch, path)       # +2 rows (1 dup norm)
        dedup.append_exact_index(batch, path)       # replayed: +2 rows
        r = dedup.index_tier_stats(spark, path).first()
        assert r.tier_table == "hashes"
        assert (r.n_rows, r.n_distinct, r.dup_rows) == (6, 3, 3)
        assert r.dup_mils == 500
        # after compaction the trigger metric reads clean
        dst = str(tmp_path / "dst")
        dedup.compact_exact_index(spark, path, dst)
        c = dedup.index_tier_stats(spark, dst).first()
        assert (c.n_rows, c.n_distinct, c.dup_rows, c.dup_mils) == (
            3, 3, 0, 0,
        )

    def test_empty_tier_reports_zero_not_null(self, spark, tmp_path):
        # r11 ADVICE: a freshly-truncated tier (n_rows = 0) must report
        # dup_mils = 0, not NULL — the compaction trigger is compared
        # against a threshold and NULL would silently never fire (or
        # worse, crash a strict scheduler)
        path = str(tmp_path / "emptyidx")
        empty = spark.createDataFrame([], "doc_id INT, text STRING")
        dedup.build_exact_index(empty, path)
        r = dedup.index_tier_stats(spark, path).first()
        assert (r.n_rows, r.n_distinct, r.dup_rows) == (0, 0, 0)
        assert r.dup_mils == 0 and r.dup_mils is not None

    def test_maintain_triggers_rotation_over_threshold(
        self, spark, tmp_path
    ):
        import os

        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        corpus = spark.createDataFrame(
            [(i, f"text number {i % 7}") for i in range(20)],
            ["doc_id", "text"],
        )
        batch = spark.createDataFrame(
            [(100 + i, f"text number {i % 7} fresh") for i in range(10)],
            ["doc_id", "text"],
        )
        dedup.build_exact_index(corpus, src)
        dedup.append_exact_index(batch, src)
        dedup.append_exact_index(batch, src)  # replayed ingest
        probe = spark.createDataFrame(
            [(500, "text number 3"), (501, "genuinely new text")],
            ["doc_id", "text"],
        )
        before = sorted(
            tuple(r)
            for r in dedup.dedup_exact_incremental(
                spark, probe, src
            ).collect()
        )
        rep = dedup.maintain_index_tier(
            spark, src, dst, tier="exact", max_dup_mils=100
        ).first()
        assert rep.compacted and rep.dup_mils > 100
        assert rep.reclaimed_rows == rep.dup_rows > 0
        assert os.path.isdir(f"{dst}/hashes")
        # incremental queries answer identically against the rotation
        after = sorted(
            tuple(r)
            for r in dedup.dedup_exact_incremental(
                spark, probe, dst
            ).collect()
        )
        assert before == after
        # idempotency: maintaining the compacted copy reads clean and
        # SKIPS (no second rotation directory appears)
        rep2 = dedup.maintain_index_tier(
            spark, dst, str(tmp_path / "dst2"), tier="exact",
            max_dup_mils=100,
        ).first()
        assert not rep2.compacted
        assert (rep2.dup_mils, rep2.reclaimed_rows) == (0, 0)
        assert not os.path.exists(str(tmp_path / "dst2"))

    def test_maintain_skips_below_threshold(self, spark, tmp_path):
        import os

        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        docs = spark.createDataFrame(
            [(i, f"unique text {i}") for i in range(12)],
            ["doc_id", "text"],
        )
        dedup.build_exact_index(docs, src)
        dedup.append_exact_index(
            spark.createDataFrame([(99, "unique text 3")], ["doc_id", "text"]),
            src,
        )  # 1 dup row / 13 = 76 mils, under the 100 threshold
        rep = dedup.maintain_index_tier(
            spark, src, dst, tier="exact", max_dup_mils=100
        ).first()
        assert not rep.compacted and 0 < rep.dup_mils <= 100
        assert rep.reclaimed_rows == 0 and rep.dup_rows == 1
        assert not os.path.exists(dst)

    def test_maintain_minhash_any_table_triggers_whole_tier(
        self, spark, tmp_path
    ):
        import os

        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        docs = spark.createDataFrame(
            [(i, f"some words here number {i} plus shared tail")
             for i in range(6)],
            ["doc_id", "text"],
        )
        dedup.build_minhash_index(docs, src, portable=True)
        dedup.append_minhash_index(docs.limit(3), src)  # replayed rows
        got = {
            r.tier_table: r
            for r in dedup.maintain_index_tier(
                spark, src, dst, tier="minhash", max_dup_mils=100
            ).collect()
        }
        assert set(got) == {"signatures", "banded"}
        # tier-wide decision: every table row carries the same flag and
        # BOTH tables were rewritten into the rotation dir
        assert got["signatures"].compacted and got["banded"].compacted
        assert os.path.isdir(f"{dst}/signatures")
        assert os.path.isdir(f"{dst}/banded")
        assert os.path.isdir(f"{dst}/params")
        for t in ("signatures", "banded"):
            assert (
                spark.read.parquet(f"{dst}/{t}").count()
                == got[t].n_distinct
            )

    def test_maintain_unknown_tier_raises(self, spark, tmp_path):
        with pytest.raises(ValueError, match="unknown index tier"):
            dedup.maintain_index_tier(
                spark, str(tmp_path / "x"), str(tmp_path / "y"),
                tier="bogus",
            )

    def test_minhash_two_table_report(self, spark, tmp_path):
        path = str(tmp_path / "mhidx")
        docs = spark.createDataFrame(
            [(i, f"some words here number {i} plus shared tail") for i in range(6)],
            ["doc_id", "text"],
        )
        dedup.build_minhash_index(docs, path, portable=True)
        got = {
            r.tier_table: r
            for r in dedup.index_tier_stats(
                spark, path, tables=("signatures", "banded")
            ).collect()
        }
        assert set(got) == {"signatures", "banded"}
        assert got["signatures"].dup_rows == 0
        dedup.append_minhash_index(docs.limit(2), path)
        got2 = {
            r.tier_table: r
            for r in dedup.index_tier_stats(
                spark, path, tables=("signatures", "banded")
            ).collect()
        }
        assert got2["signatures"].dup_rows == 2
        assert got2["banded"].dup_rows > 0
