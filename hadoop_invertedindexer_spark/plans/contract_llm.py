"""Contract queries for the LLM-pipeline surface: dedup, similarity,
text analysis, multimodal (EXT, SURVEY §2B 'north star' rows).

Oracle policy: everything whose math both engines can express bit-equal
gets a DuckDB twin — including SimHash (md5 bit votes), hyperplane LSH
(literal plane constants), portable-hash MinHash (md5-60bit), the
k-means IVF refinement (integer-sum centroids), and the real-codec
multimodal/media paths (SQL restatement of the synthesis geometry). The
remaining rows-only entries are inherent (engine-specific xxhash64 /
sketch internals / fp pixel histograms), each with an oracle-paired twin
where one is possible, and all verified by planted-fixture tests in
tests/test_dedup.py, tests/test_similarity.py, tests/test_multimodal.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_invertedindexer_spark.functions import textstats
from hadoop_invertedindexer_spark.caching import tracked_persist
from hadoop_invertedindexer_spark.operators import (
    dedup,
    multimodal,
    sampling,
    similarity,
    vocab,
)
from hadoop_invertedindexer_spark.sources.tables import read_table

STOPWORDS = ["the", "and", "for", "with", "that", "this", "from"]

_SQL_PUNCT = "[`~!@#$%^&*()_+=\\[\\]{}\\\\|;'':\",./<>?-]"
_SQL_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '"
    + _SQL_PUNCT
    + "', ' ', 'g'), '\\s+', ' ', 'g'))"
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "embeddings")


# ------------------------------------------------------------------ dedup


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_exact(_docs(spark, sf_dir))


def _exact_inc_planted():
    """Planted duplicate texts for the exact-incremental contract:
    crossdup groups straddle the corpus/batch boundary at doc 250 (the
    published copy must win and the whole group must vanish from the
    report), freshdup groups live entirely in the batch (they must
    survive with batch counts). CASE order (cross first) is mirrored in
    the oracle."""
    return (
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("crossdup "), (F.col("doc_id") % 40).cast("string")),
        )
        .when(
            (F.col("doc_id") >= 250) & (F.col("doc_id") % 7 == 0),
            F.concat(F.lit("freshdup "), (F.col("doc_id") % 21).cast("string")),
        )
        .otherwise(F.col("text"))
    )


def q_dedup_exact_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Persisted-index exact dedup (r10): docs < 250 play the published
    corpus (hash set built into a temp index), docs >= 250 the ingest
    batch. Cross-boundary planted groups must vanish (index wins);
    batch-only groups must keep their smallest id with batch counts —
    equal by construction to the direct chain over corpus ∪ batch
    restricted to batch-side keepers, which is what the oracle states."""
    import tempfile

    d = _docs(spark, sf_dir).select(
        "doc_id", _exact_inc_planted().alias("text")
    )
    path = tempfile.mkdtemp(prefix="exidx_") + "/exidx"
    dedup.build_exact_index(d.where(F.col("doc_id") < 250), path)
    return dedup.dedup_exact_incremental(
        spark, d.where(F.col("doc_id") >= 250), path
    )


def q_index_tier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-tier health report (r11): docs < 250 build the exact
    index, docs >= 250 append TWICE (a replayed ingest), so the stored
    table carries a deterministic duplicate mass — n_rows, n_distinct,
    dup_rows, and dup_mils (the compaction trigger) all value-hash
    against counting distinct normalized texts in SQL, because the
    sha2 keys are injective on the norms."""
    import tempfile

    d = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="statsidx_") + "/exidx"
    dedup.build_exact_index(d.where(F.col("doc_id") < 250), path)
    batch = d.where(F.col("doc_id") >= 250)
    dedup.append_exact_index(batch, path)
    dedup.append_exact_index(batch, path)
    return dedup.index_tier_stats(spark, path, tables=("hashes",))


def q_maintain_index_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-driven auto-compaction (r12): the q_index_tier_stats
    fixture (build < 250, the >= 250 batch appended twice) pushes the
    exact tier's dup_mils well over the 100-mils threshold, so the
    maintainer must rotate a compacted copy and report it — the
    compacted flag and reclaimed_rows are SQL-expressible from the same
    distinct-norm counting, and the stats row is the tier-stats oracle
    verbatim."""
    import tempfile

    d = _docs(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="maintidx_")
    path, dest = base + "/exidx", base + "/exidx_compact"
    dedup.build_exact_index(d.where(F.col("doc_id") < 250), path)
    batch = d.where(F.col("doc_id") >= 250)
    dedup.append_exact_index(batch, path)
    dedup.append_exact_index(batch, path)
    return dedup.maintain_index_tier(
        spark, path, dest, tier="exact", max_dup_mils=100
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.6, max_df=100)


def q_winnow_fingerprints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Winnowing fingerprints (r10): every document's MOSS-selected
    (pos, fp) set at k=5, w=4 — the windowed rightmost-min selection,
    packed-key tie-break, and arithmetic decode all value-hash against
    the SQL twin."""
    return dedup.winnow_fingerprints(_docs(spark, sf_dir), k=5, w=4)


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnow-based near-dup pairs (r10): documents sharing >= 2
    df-capped selected fingerprints — MOSS's actual detection step over
    the ~2/(w+1)-density sketch instead of the full shingle sets."""
    return dedup.winnow_overlap_pairs(
        _docs(spark, sf_dir), k=5, w=4, min_shared=2, max_df=100
    )


def _subset_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The %41 subset/superset plant shared by the containment and
    bounded-jaccard entries: every 41st doc becomes a fixed 6-token
    passage, its %41==1 neighbor the same passage extended to 13
    tokens — two ~13-member jaccard-1.0 cliques at sf0.01."""
    d = _docs(spark, sf_dir)
    planted = (
        F.when(
            F.col("doc_id") % 41 == 0,
            F.lit("Contain alpha bravo charlie delta echo"),
        )
        .when(
            F.col("doc_id") % 41 == 1,
            F.lit(
                "Contain alpha bravo charlie delta echo foxtrot golf"
                " hotel india juliet kilo lima"
            ),
        )
        .otherwise(F.col("text"))
    )
    return d.select("doc_id", planted.alias("text"))


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment near-dup pairs (r10): the subset docs
    score containment 1.0 INTO the supersets (and among themselves)
    while the reverse direction sits at 4/11 and is correctly
    excluded, which is exactly the asymmetry Jaccard cannot
    represent."""
    return dedup.containment_pairs(
        _subset_planted(spark, sf_dir), n=3, threshold=0.8, max_df=100
    )


def q_jaccard_pairs_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-doc top-k bound applied to the JACCARD family (r13):
    pairs_topk_bounded is the policy factored out of
    winnow_pairs_bounded — any canonical scored pair frame bounds the
    same way. The %41 plant's two ~13-member jaccard-1.0 cliques
    exercise real truncation at per_doc_k=3 (each member's degree is
    ~12), with the union-keep rule and (score desc, nbr asc)
    tie-break fully stated in the SQL twin."""
    return dedup.pairs_topk_bounded(
        dedup.ngram_jaccard_pairs(
            _subset_planted(spark, sf_dir), n=3, threshold=0.6, max_df=100
        ),
        per_doc_k=3,
        score_col="jaccard",
    )


# r12 cap-saturation family: 125 docs (doc_id < 500, every 4th) become
# one 12-token passage, so its shingles/fingerprints carry df = 125 —
# over the max_df=100 cap at sf >= 0.01 regardless of corpus size (a
# FIXED-COUNT plant: the bench at sf0.1 pays the same bounded join).
# The cap reports must count exactly this bite; the escalated variants
# must recover the clique the plain cap silently drops.
_CAP_PASSAGE = (
    "Capsat alpha bravo charlie delta echo foxtrot"
    " golf hotel india juliet kilo"
)


def _cap_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.when(
            (F.col("doc_id") < 500) & (F.col("doc_id") % 4 == 0),
            F.lit(_CAP_PASSAGE),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def q_shingle_cap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap-hit observability (r12): how hard the max_df=100 stop-
    shingle cap bites the planted corpus — capped keys, dropped
    postings, and the dropped-mass mils a schedule compares against
    its recall budget. The 10 passage shingles at df=125 are the bite."""
    return dedup.shingle_cap_report(
        _cap_planted(spark, sf_dir), n=3, max_df=100
    )


def q_winnow_cap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnow-side cap-hit observability (r12): the same report over
    the MOSS-selected fingerprint postings (k=5, w=4), auditing exactly
    the join winnow_pairs runs — selection step fully oracled."""
    return dedup.winnow_cap_report(
        _cap_planted(spark, sf_dir), k=5, w=4, max_df=100
    )


def q_dedup_containment_escalated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tiered-cap escalation (r12): at the base cap the planted df=125
    clique is silently dropped (the r11 30x saturation in miniature);
    with tiers (100, 400) and a 1-mil dropped-mass budget the chooser
    must escalate to 400 and report every clique pair at containment
    1.0 — the chooser itself (per-tier dropped mass, first qualifying
    tier) is stated in SQL."""
    return dedup.containment_pairs(
        _cap_planted(spark, sf_dir),
        n=3,
        threshold=0.8,
        max_df=100,
        max_df_tiers=(100, 400),
        max_dropped_mils=1,
    )


def q_winnow_pairs_escalated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Winnow-side tiered-cap escalation (r12): the planted clique's 2
    shared fingerprints carry df=125 — capped at 100, recovered at the
    400 tier; min_shared=2 keeps only full passage matches."""
    return dedup.winnow_overlap_pairs(
        _cap_planted(spark, sf_dir),
        k=5,
        w=4,
        min_shared=2,
        max_df=100,
        max_df_tiers=(100, 400),
        max_dropped_mils=1,
    )


def q_winnow_pairs_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Persisted winnow-index near-dup pairs (r13 — the last dedup
    family without an incremental path): docs < 250 play the published
    corpus (winnowed postings built into a temp index at the stored
    (k, w)), docs >= 250 the ingest batch. Equal by construction to
    the direct winnow_overlap_pairs over corpus ∪ batch restricted to
    batch-touching pairs — which is exactly what the oracle states
    (full chain + the >= 250 filter). A planted verbatim passage
    guarantees cross-boundary pairs exist at sf0.01."""
    import tempfile

    d = _docs(spark, sf_dir)
    planted = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 83 == 0,
            F.lit(
                "Winc alpha bravo charlie delta echo foxtrot golf"
                " hotel india"
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    path = tempfile.mkdtemp(prefix="wfidx_") + "/wfidx"
    dedup.build_winnow_index(
        planted.where(F.col("doc_id") < 250), path, k=5, w=4
    )
    return dedup.winnow_index_pairs(
        spark,
        planted.where(F.col("doc_id") >= 250),
        path,
        min_shared=2,
        max_df=100,
    )


def q_winnow_pairs_bounded(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Declaratively bounded winnow pairs (r13 — VERDICT r12 ask 2):
    the escalated run recovers the planted df=125 clique (7,750 true
    pairs), and the per-doc top-5 bound emits each member's 5
    strongest neighbors instead of the full quadratic stream — union
    semantics, total-order tie-break, so the survivor set value-hashes
    against the SQL twin."""
    return dedup.winnow_pairs_bounded(
        _cap_planted(spark, sf_dir),
        k=5,
        w=4,
        min_shared=2,
        max_df=100,
        per_doc_k=5,
        max_df_tiers=(100, 400),
        max_dropped_mils=1,
    )


def q_winnow_bounded_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Truncation pricing for the bounded winnow stream (r13): one row
    — full pairs vs kept pairs, truncated mils, and where the
    truncation lives (docs over the bound, max degree). The planted
    clique makes every number non-trivial."""
    return dedup.winnow_bounded_report(
        _cap_planted(spark, sf_dir),
        k=5,
        w=4,
        min_shared=2,
        max_df=100,
        per_doc_k=5,
        max_df_tiers=(100, 400),
        max_dropped_mils=1,
    )


def q_winnow_bounded_report_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sampled truncation pricing for the bounded winnow stream (r14 —
    VERDICT r13 ask 1): the exact report re-runs the full pair join;
    this one joins only pairs touching md5-sampled docs (1/4 here) and
    scales degrees back up — unbiased est_n_pairs_full, upper-bound
    est_truncated_pairs (conservative for a recall budget). The planted
    df=125 clique puts ~31 docs in the sample, so every number is
    non-trivial and the estimate lands near the exact report's row."""
    return dedup.winnow_bounded_report_estimate(
        _cap_planted(spark, sf_dir),
        k=5,
        w=4,
        min_shared=2,
        max_df=100,
        per_doc_k=5,
        sample_inv=4,
        max_df_tiers=(100, 400),
        max_dropped_mils=1,
    )


def q_winnow_cap_recall_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Winnow-side estimated-missed-pairs (r13): the shared estimator
    core over the MOSS-selected fingerprint postings — the sampling
    bucket is the fingerprint itself (md5-40bit by construction), so
    the whole audit incl. the selection step value-hashes against the
    SQL twin."""
    return dedup.winnow_cap_recall_estimate(
        _cap_planted(spark, sf_dir),
        k=5,
        w=4,
        max_df=100,
        sample_inv=8,
        expand_max_df=2000,
    )


def q_shingle_cap_recall_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Estimated-missed-PAIRS cost of the stop-shingle cap (r13 —
    VERDICT r12 ask 4): md5-sampled capped keys expanded to their
    distinct co-occurring pairs and scaled back up, mega keys priced
    by closed form — deterministic integers end to end. At these
    settings exactly one planted shingle ('hotel india juliet',
    h40 % 8 == 0) is sampled, df=125 → 7,750 expanded pairs →
    est = 62,000 vs the exact 77,500 slot ceiling."""
    return dedup.shingle_cap_recall_estimate(
        _cap_planted(spark, sf_dir),
        n=3,
        max_df=100,
        sample_inv=8,
        expand_max_df=2000,
    )


def q_minhash_pairs_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-doc top-k bound applied to the MINHASH family (r14 —
    VERDICT r13 ask 5): pairs_topk_bounded explicitly claims it covers
    est_jaccard pairs; this entry proves it on the %41 plant's two
    ~13-member est-1.0 cliques (banded candidates → signature-estimated
    verify → bound). Each member's degree is ~12, so per_doc_k=3
    exercises REAL truncation — union keep, (score desc, nbr asc)
    tie-break, all stated in the SQL twin. Portable md5-60bit hashes,
    so the whole composite value-hashes."""
    return dedup.pairs_topk_bounded(
        dedup.minhash_lsh_pairs(
            _subset_planted(spark, sf_dir), threshold=0.5, portable=True
        ),
        per_doc_k=3,
        score_col="est_jaccard",
    )


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: xxhash64 has no DuckDB twin; see tests/test_dedup.py."""
    return dedup.minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.5)


def q_dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH with the md5-60-bit portable hash — the
    oracle-checkable twin of dedup_minhash: identical banding, candidate
    generation, and estimate formula, but every hash is reproducible in
    ANSI SQL, so the driver value-checks the ALGORITHM end-to-end while
    the xxhash64 variant stays the scale path (rows-only, inherent)."""
    return dedup.minhash_lsh_pairs(
        _docs(spark, sf_dir), threshold=0.5, portable=True
    )


def q_minhash_band_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding observability (r12): the cap-report pattern applied to
    the LSH band join — bucket occupancy, raw band fanout (Σ C(n,2)),
    and the distinct candidate-pair count that prices the estimate join
    before it runs. Portable hashes, so every number — including the
    pair-scale distinct — recomputes exactly in SQL."""
    return dedup.minhash_band_report(
        _docs(spark, sf_dir), num_perm=64, bands=16, n=3, portable=True
    )


def q_dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash near-dup dedup against a persisted signature
    index (the daily-ingest path): corpus = doc_id % 10 != 0 is indexed
    once with the portable md5-60bit hashes; the batch = doc_id % 10 == 0
    is signed fresh (O(batch)) and joined against the index without any
    corpus rescan. Fully oracle-paired: signatures are per-doc
    projections, so the result is exactly the full portable pipeline's
    pairs restricted to pairs with >= 1 batch member — which is what the
    SQL twin computes."""
    import tempfile

    d = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="mhidx_") + "/mh"
    dedup.build_minhash_index(
        d.where(F.col("doc_id") % 10 != 0), path, portable=True
    )
    return dedup.minhash_index_pairs(
        spark, d.where(F.col("doc_id") % 10 == 0), path, threshold=0.5
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs. Oracle-paired despite the pandas-UDF
    fingerprint: the fingerprint math is md5-derived bit votes, and md5 +
    two's-complement popcount are engine-portable, so the oracle restates
    the whole pipeline (votes -> signed fp -> pigeonhole bands ->
    hamming) in SQL and hash-matches it. Fixtures in tests/test_dedup.py."""
    return dedup.simhash_near_dup_pairs(_docs(spark, sf_dir), max_hamming=3)


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-bucketed embedding near-dup pairs + exact cosine
    verify. Oracle-paired the same way as similarity_lsh: the 12
    hyperplanes are identical literal constants in both plans, so bucket
    signs and rounded cosines hash-match. The synthetic embeddings are
    near-orthogonal (max real cosine ~0.5), so the contract run uses the
    threshold/bits where the data actually has pairs; the 0.95-threshold
    behavior is covered by planted-dup fixtures in tests/test_dedup.py."""
    return dedup.embedding_near_dup_pairs(
        _emb(spark, sf_dir), threshold=0.5, nbits=12, dim=64
    )


# ------------------------------------------------------------- similarity


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: coarse clusters (sampled
    centroids), in-cluster cosine near-dup pruning keeping the most
    MARGINAL member (lowest centroid cosine, id tie-break). Fully
    oracle-paired: assignment, rounded cosines, and the drop rule are
    all exact double/round(6) math both engines share. ``every=50``
    PINS the r6 centroid policy explicitly (VERDICT r6 item 1 moved the
    operator DEFAULT to bounded-K kmeans; this keeps the oracle hash
    byte-stable while `semantic_dedup_bounded` oracles the new
    default)."""
    return similarity.semantic_dedup(
        _emb(spark, sf_dir), threshold=0.4, every=50
    )


def q_semantic_dedup_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The new DEFAULT semantic-dedup path (VERDICT r6 item 1), fully
    oracle-paired: bounded-K centroids (md5-ordered sample of 256, first
    64 as seeds) refined by two portable Lloyd iterations (exact
    floor(x·2^20) integer sums, bit-reproducible in ANSI SQL), then the
    same assignment / round(6) cosine / keep-the-marginal rule as
    `semantic_dedup`. Centroid count is FIXED at k=64 regardless of
    corpus size — the broadcast assignment is O(N·k), no longer
    O(N²/every)."""
    return similarity.semantic_dedup(
        _emb(spark, sf_dir),
        threshold=0.4,
        k=64,
        refine_iters=2,
        sample_mult=4,
        portable=True,
    )


def q_ivf_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index-health metrics (r8): build a persisted index under the
    portable bounded-K centroids (same construction the
    semantic_dedup_bounded oracle pins) and report occupancy +
    quantization-error drift signals off the stored assignments. The
    oracle recomputes the assignment argmax and the same one-row
    aggregate."""
    import tempfile

    emb = _emb(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="ivfidx_") + "/ivf"
    cents = similarity.bounded_centroids_refined(
        emb, k=64, sample_mult=4, refine_iters=2, portable=True
    )
    similarity.build_ivf_index(emb, cents, path)
    return similarity.ivf_index_drift(spark, path)


def q_maintain_ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift-triggered IVF auto-rebuild (r12) — the ANN twin of
    q_maintain_index_tier: the index is built DRIFTED by construction
    (centroids derive only from the vec_id % 4 == 0 quarter; the other
    three quarters are appended against those frozen centroids), so
    avg_qerr sits far above the 300-mils threshold at sf0.01 and sf0.1
    alike (measured 584 / 670 mils) and the maintainer must rebuild
    into the rotation dir and say so. The returned row is the
    PRE-rebuild drift report + the rebuilt flag; the oracle recomputes
    the subset-built centroids, the full-corpus assignment argmax, the
    drift aggregate, and the same threshold rule."""
    import tempfile

    emb = _emb(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="mivf_")
    path, dest = base + "/ivf", base + "/ivf_rebuilt"
    seed = emb.where(F.col("vec_id") % 4 == 0)
    cents = similarity.bounded_centroids_refined(
        seed, k=64, sample_mult=4, refine_iters=2, portable=True
    )
    similarity.build_ivf_index(seed, cents, path)
    similarity.append_ivf_index(emb.where(F.col("vec_id") % 4 != 0), path)
    return similarity.maintain_ivf_index(
        spark, path, dest, max_avg_qerr_mils=300, max_imbalance_mils=4000,
        portable=True,
    )


# the read-path probe memoizes its built index per (process, sf_dir):
# the bench's median-of-3 then times [build+read, read, read] and the
# median IS the read path — the per-day monitoring cost, not the
# one-off build (VERDICT r9 ask 10)
_IVF_DRIFT_INDEX: dict[str, str] = {}


def q_ivf_drift_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The READ path of the IVF drift probe against a PRE-BUILT index
    (r10): identical output to ivf_drift — the metrics are a pure
    function of the stored assignments, which the memoized build wrote
    with the same params — so the oracle is shared verbatim; what this
    entry adds is the bench row showing the monitoring read is one
    pruned scan + a one-row aggregate, sub-second at sf0.1."""
    import tempfile

    if sf_dir not in _IVF_DRIFT_INDEX:
        emb = _emb(spark, sf_dir)
        path = tempfile.mkdtemp(prefix="ivfidxr_") + "/ivf"
        cents = similarity.bounded_centroids_refined(
            emb, k=64, sample_mult=4, refine_iters=2, portable=True
        )
        similarity.build_ivf_index(emb, cents, path)
        _IVF_DRIFT_INDEX[sf_dir] = path
    return similarity.ivf_index_drift(spark, _IVF_DRIFT_INDEX[sf_dir])


def q_similarity_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for every 100th vector as query set."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return similarity.cosine_topk_bruteforce(emb, queries, k=10)


def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe path; recall-vs-bruteforce in tests. Oracle-paired: the
    sampled centroids are corpus rows and every cosine is the same
    sequential double fold in both engines, so nearest-centroid
    assignment, the nprobe probe set, and the final rounded top-k all
    hash-match."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    cents = similarity.centroids_by_sampling(emb, every=50)
    return similarity.cosine_topk_ivf(emb, queries, cents, k=10, nprobe=4)


def q_similarity_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe over k-means-refined centroids, oracle-paired since r6:
    ``portable=True`` replaces the fp mean with the exact integer SUM
    vector (cosine is scale-invariant, so assignment is unchanged;
    coordinates quantize as floor(x*2^20), bigint sums re-cast to double
    losslessly), making both Lloyd iterations bit-reproducible in SQL —
    the oracle unrolls them as CTEs like the pagerank oracle. Distortion
    + recall improvement vs sampled init asserted in
    tests/test_similarity.py."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    cents = similarity.centroids_kmeans(emb, every=50, n_iters=2, portable=True)
    return similarity.cosine_topk_ivf(emb, queries, cents, k=10, nprobe=4)


def q_similarity_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-bucketed ANN (the projection-only scale path next to
    IVF); planted-cluster recall in tests/test_similarity.py. nbits=4 so
    the near-orthogonal synthetic vectors still collide. Fully
    oracle-paired: the hyperplanes are literal constants in BOTH plans —
    the oracle SQL embeds the identical floats, and sequential double
    summation (list_sum / F.aggregate fold) is bit-identical across
    engines, so bucket signs, candidates, and rounded cosines all
    hash-match. dim pinned to 64 (the testdata embedding width) so the
    embedded literals agree with the probe-free Spark plan."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return similarity.cosine_topk_lsh(emb, queries, k=10, nbits=4, dim=64)


def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index-quality eval (r10): per-query recall@10 of the LSH
    path against the exact brute-force truth — the acceptance gate an
    approximate index must clear before it replaces brute force, and
    the answer-quality companion to ivf_drift's geometry report. Both
    neighbor lists are fully deterministic (literal hyperplanes,
    sequential double folds), so per-query hit counts and the integer-
    thousandths recall hash-match the SQL twin."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    truth = similarity.cosine_topk_bruteforce(emb, queries, k=10)
    cand = similarity.cosine_topk_lsh(
        emb, queries, k=10, nbits=4, dim=64
    )
    return similarity.ann_recall(truth, cand)


def q_ann_recall_eval_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF recall@10 vs exact truth (r10): the second eval dimension
    next to the LSH entry — nprobe=4 over sampled centroids, so the
    report shows what probe-limited bucketing actually costs in
    answers. Fully deterministic both sides; oracle composes the two
    existing chains verbatim."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    truth = similarity.cosine_topk_bruteforce(emb, queries, k=10)
    cents = similarity.centroids_by_sampling(emb, every=50)
    cand = similarity.cosine_topk_ivf(emb, queries, cents, k=10, nprobe=4)
    return similarity.ann_recall(truth, cand)


# recall eval against the PERSISTED index, build memoized per
# (process, sf_dir) like _IVF_DRIFT_INDEX: the bench median-of-3 then
# times [build+eval, eval, eval] and the median is the recurring
# acceptance-gate cost — truth recompute + pruned index read — not the
# one-off assignment build (VERDICT r10 ask 2)
_ANN_IVF_INDEX: dict[str, str] = {}


def q_ann_recall_eval_ivf_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IVF recall@10 vs exact truth, candidates served from a PRE-BUILT
    persisted index (r11): ``query_ivf_index`` returns results identical
    to ``cosine_topk_ivf`` over the same corpus/centroids (pinned by
    test), so the oracle is shared verbatim with ``ann_recall_eval_ivf``
    — what this entry adds is the bench row showing the recurring eval
    cost once the assignment pass is amortized into the index."""
    import tempfile

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    if sf_dir not in _ANN_IVF_INDEX:
        path = tempfile.mkdtemp(prefix="annivfidx_") + "/ivf"
        cents = similarity.centroids_by_sampling(emb, every=50)
        similarity.build_ivf_index(emb, cents, path)
        _ANN_IVF_INDEX[sf_dir] = path
    truth = similarity.cosine_topk_bruteforce(emb, queries, k=10)
    cand = similarity.query_ivf_index(
        spark, _ANN_IVF_INDEX[sf_dir], queries, k=10, nprobe=4
    )
    return similarity.ann_recall(truth, cand)


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes for every corpus vector (m=8 subspaces,
    ksub=16 codewords from the first-16-by-id bootstrap). All arithmetic
    is exact integer (floor(x*2^10) grid), so the codes value-hash
    against the SQL restatement. Codes rendered as csv for the compare."""
    emb = _emb(spark, sf_dir)
    cb = similarity.pq_codebooks(emb, m=8, ksub=16, dim=64)
    enc = similarity.pq_encode(emb, cb, m=8, dim=64)
    return enc.select(
        "vec_id",
        F.concat_ws(
            ",", F.transform("codes", lambda c: c.cast("string"))
        ).alias("codes_str"),
    )


def q_similarity_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-10 for every 100th vector: the corpus
    side is scanned as 8-byte codes only (32x below raw float32), each
    pair costing m integer table-lookup adds. Exact-integer end-to-end,
    so codebooks, codes, ADC sums, and ranks all hash-match the SQL
    twin; recall-vs-bruteforce and planted-dup fixtures live in
    tests/test_similarity.py."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    cb = similarity.pq_codebooks(emb, m=8, ksub=16, dim=64)
    enc = similarity.pq_encode(emb, cb, m=8, dim=64)
    return similarity.pq_adc_topk(enc, cb, queries, k=10, m=8, dim=64)


def _ivfpq_parts(spark: SparkSession, sf_dir: str):
    """The IVF-PQ contract fixture: the IVF oracles' sampled centroids
    (cid = vec_id, every 50th) + the PQ oracles' first-16-by-id
    codebooks — both already restated in SQL, so the composite oracles
    are their CTEs joined."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    cents = similarity.centroids_by_sampling(emb, every=50)
    cb = similarity.pq_codebooks(emb, m=8, ksub=16, dim=64)
    return emb, queries, cents, cb


def q_similarity_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-10 for every 100th vector (r13): probe the 4 nearest
    coarse buckets, ADC-rank only the probed buckets' m-byte codes —
    the two ANN levers composed (candidates ~nprobe/C of the corpus ×
    scan bytes ~32x below float32). Exact-integer ADC over the exact
    same probe selection as similarity_ivf, so the composite
    value-hashes against the SQL restatement of the two chains
    joined."""
    emb, queries, cents, cb = _ivfpq_parts(spark, sf_dir)
    assigned = similarity.ivf_assign(emb, cents, dim=64)
    codes = similarity.ivfpq_encode(assigned, cb, m=8, dim=64)
    return similarity.ivfpq_adc_topk(
        codes, cb, cents, queries, k=10, nprobe=4, m=8, dim=64
    )


def q_pq_codebooks_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded per-subspace k-means PQ codebooks (r14, VERDICT r13 ask
    3): the 256-vector md5 sample Lloyd-refined for 2 iterations from
    the first-16 bootstrap — deterministic end to end (exact-integer
    distances, floor-of-mean codewords, lowest-c ties), so the whole
    refinement value-hashes. Codewords csv-rendered like pq_codes."""
    emb = _emb(spark, sf_dir)
    cb = similarity.pq_codebooks_refined(
        emb, m=8, ksub=16, sample_mult=16, refine_iters=2, dim=64
    )
    return cb.select(
        "s",
        "c",
        F.concat_ws(
            ",", F.transform("cq", lambda c: c.cast("string"))
        ).alias("cq_str"),
    )


def _refined_cb(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return similarity.pq_codebooks_refined(
        emb, m=8, ksub=16, sample_mult=16, refine_iters=2, dim=64
    )


def q_similarity_ivfpq_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF-PQ ADC composite at the REFINED codebooks (r14) — same
    (m, ksub, nprobe) as similarity_ivfpq, only the codebook quality
    changes, so the two entries price exactly what refinement buys.
    Note the honest finding (measured, r14): refinement cuts subspace
    quantization error ~19% but plain ADC top-10 on the synthetic
    near-uniform embeddings is resolution-bound — the lift shows up in
    SHORTLIST coverage, i.e. the two-stage rerank entries below."""
    emb, queries, cents, _ = _ivfpq_parts(spark, sf_dir)
    cb = _refined_cb(spark, sf_dir)
    assigned = similarity.ivf_assign(emb, cents, dim=64)
    codes = similarity.ivfpq_encode(assigned, cb, m=8, dim=64)
    return similarity.ivfpq_adc_topk(
        codes, cb, cents, queries, k=10, nprobe=4, m=8, dim=64
    )


def q_similarity_ivfpq_rerank_refined(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-stage serving at the REFINED codebooks (r14): better
    codewords put more of the true top-10 inside the ADC shortlist, so
    the exact re-rank recovers more recall at the SAME shortlist depth
    (sf0.01: recall@10 660 → 740 mils vs the bootstrap entry)."""
    emb, queries, cents, _ = _ivfpq_parts(spark, sf_dir)
    cb = _refined_cb(spark, sf_dir)
    assigned = similarity.ivf_assign(emb, cents, dim=64)
    codes = similarity.ivfpq_encode(assigned, cb, m=8, dim=64)
    return similarity.ivfpq_rerank_topk(
        codes, cb, cents, emb, queries, k=10, shortlist=40, nprobe=4,
        m=8, dim=64,
    )


def q_ann_recall_eval_ivfpq_rerank_refined(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Recall@10 of the refined-codebook two-stage path vs exact truth
    — read next to ann_recall_eval_ivfpq_rerank: the delta between the
    two rows is what codebook refinement buys at equal (m, ksub,
    nprobe, shortlist)."""
    emb, queries, cents, _ = _ivfpq_parts(spark, sf_dir)
    cb = _refined_cb(spark, sf_dir)
    truth = similarity.cosine_topk_bruteforce(emb, queries, k=10)
    assigned = similarity.ivf_assign(emb, cents, dim=64)
    codes = similarity.ivfpq_encode(assigned, cb, m=8, dim=64)
    cand = similarity.ivfpq_rerank_topk(
        codes, cb, cents, emb, queries, k=10, shortlist=40, nprobe=4,
        m=8, dim=64,
    )
    return similarity.ann_recall(truth, cand)


_ANN_IVFPQ_INDEX: dict[str, str] = {}


def q_similarity_ivfpq_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-10 served from a PRE-BUILT persisted index:
    ``query_ivfpq_index`` returns results identical to
    :func:`q_similarity_ivfpq`'s in-memory composite (pinned by test —
    stored codes partition-prune on cid, params/codebooks come from the
    index contract), so the oracle is shared verbatim; what this entry
    adds is the recurring read-path cost once assign+encode are
    amortized into the index."""
    import tempfile

    emb, queries, cents, cb = _ivfpq_parts(spark, sf_dir)
    if sf_dir not in _ANN_IVFPQ_INDEX:
        path = tempfile.mkdtemp(prefix="annivfpq_") + "/ivfpq"
        similarity.build_ivfpq_index(emb, cents, cb, path, m=8, dim=64)
        _ANN_IVFPQ_INDEX[sf_dir] = path
    return similarity.query_ivfpq_index(
        spark, _ANN_IVFPQ_INDEX[sf_dir], queries, k=10, nprobe=4
    )


def q_ann_recall_eval_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF-PQ composite vs exact cosine truth — the
    eval that closes the compression loop: IVF-PQ stacks bucket-miss
    recall loss (shared with similarity_ivf) on quantization ranking
    loss (shared with similarity_pq), and a schedule reading this row
    decides whether the 32x scan saving is worth the recall it costs
    at its nprobe/m point."""
    emb, queries, cents, cb = _ivfpq_parts(spark, sf_dir)
    truth = similarity.cosine_topk_bruteforce(emb, queries, k=10)
    assigned = similarity.ivf_assign(emb, cents, dim=64)
    codes = similarity.ivfpq_encode(assigned, cb, m=8, dim=64)
    cand = similarity.ivfpq_adc_topk(
        codes, cb, cents, queries, k=10, nprobe=4, m=8, dim=64
    )
    return similarity.ann_recall(truth, cand)


def q_similarity_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage IVF-PQ serving (r13): the ADC top-40 shortlist
    re-ranked by exact cosine over the raw vectors — quantization
    error stops deciding the final order, it only decides the
    shortlist. Output shape identical to similarity_ivf, so the
    backends are drop-in swappable; exact-arithmetic end-to-end (ADC
    integers, then the round(6) cosine every exact path shares), so
    the whole two-stage chain value-hashes."""
    emb, queries, cents, cb = _ivfpq_parts(spark, sf_dir)
    assigned = similarity.ivf_assign(emb, cents, dim=64)
    codes = similarity.ivfpq_encode(assigned, cb, m=8, dim=64)
    return similarity.ivfpq_rerank_topk(
        codes, cb, cents, emb, queries, k=10, shortlist=40, nprobe=4,
        m=8, dim=64,
    )


def q_ann_recall_eval_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the two-stage path vs exact truth — read next to
    ann_recall_eval_ivfpq: the delta between the two rows is what the
    exact re-rank buys back of the recall PQ quantization costs, at
    the price of |Q|·shortlist raw-vector fetches."""
    emb, queries, cents, cb = _ivfpq_parts(spark, sf_dir)
    truth = similarity.cosine_topk_bruteforce(emb, queries, k=10)
    assigned = similarity.ivf_assign(emb, cents, dim=64)
    codes = similarity.ivfpq_encode(assigned, cb, m=8, dim=64)
    cand = similarity.ivfpq_rerank_topk(
        codes, cb, cents, emb, queries, k=10, shortlist=40, nprobe=4,
        m=8, dim=64,
    )
    return similarity.ann_recall(truth, cand)


def q_ivfpq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Occupancy drift report off a persisted IVF-PQ index (r13): the
    codes tier keeps no raw floats, so the health probe is
    occupancy-only — one pruned scan of the stored cid column. The
    oracle recomputes the bounded-centroid assignment argmax and the
    same occupancy aggregate."""
    import tempfile

    emb = _emb(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="ivfpqidx_") + "/ivfpq"
    cents = similarity.bounded_centroids_refined(
        emb, k=64, sample_mult=4, refine_iters=2, portable=True
    )
    cb = similarity.pq_codebooks(emb, m=8, ksub=16, dim=64)
    similarity.build_ivfpq_index(emb, cents, cb, path, m=8, dim=64)
    return similarity.ivfpq_index_drift(spark, path)


def q_maintain_ivfpq_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Occupancy-triggered IVF-PQ rebuild (r13) — the compressed tier's
    maintenance loop, drifted BY CONSTRUCTION: a 300-copy slab of
    document 1's embedding is appended (replica ingest — every copy
    lands in one bucket), so imbalance = max_bucket·64/n sits far above
    the 4000-mils threshold at every sf (24.0 at sf0.01, ~8.6 at
    sf0.1) and the maintainer must rebuild into the rotation dir — from
    the caller's raw corpus, since the lossy codes tier cannot recenter
    itself. Returned row is the PRE-rebuild occupancy report + the
    rebuilt flag; the oracle recomputes the slab, the assignment
    argmax, and the same threshold rule."""
    import tempfile

    emb = _emb(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="mivfpq_")
    path, dest = base + "/ivfpq", base + "/ivfpq_rebuilt"
    cents = similarity.bounded_centroids_refined(
        emb, k=64, sample_mult=4, refine_iters=2, portable=True
    )
    cb = similarity.pq_codebooks(emb, m=8, ksub=16, dim=64)
    similarity.build_ivfpq_index(emb, cents, cb, path, m=8, dim=64)
    one = emb.where(F.col("vec_id") == 1).select("embedding")
    slab = (
        spark.range(300)
        .select((F.col("id") + F.lit(10_000_000)).alias("vec_id"))
        .crossJoin(F.broadcast(one))
    )
    similarity.append_ivfpq_index(slab, path)
    return similarity.maintain_ivfpq_index(
        spark, path, dest,
        emb.select("vec_id", "embedding").unionByName(slab),
        max_imbalance_mils=4000, portable=True,
    )


def q_ivfpq_qerr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled quantization-error probe on a HEALTHY persisted IVF-PQ
    index (r14, VERDICT r13 ask 4): current sampled reconstruction
    error vs the baseline the build pinned — same corpus, so the
    ratio is exactly 1000 mils ("as healthy as the day it was
    built"); the drifted twin is maintain_ivfpq_qerr. Reuses the
    similarity_ivfpq_read fixture index."""
    emb, _queries, cents, cb = _ivfpq_parts(spark, sf_dir)
    if sf_dir not in _ANN_IVFPQ_INDEX:
        import tempfile

        path = tempfile.mkdtemp(prefix="annivfpq_") + "/ivfpq"
        similarity.build_ivfpq_index(emb, cents, cb, path, m=8, dim=64)
        _ANN_IVFPQ_INDEX[sf_dir] = path
    return similarity.ivfpq_index_qerr(
        spark, _ANN_IVFPQ_INDEX[sf_dir], emb, n_sample=256
    )


def q_maintain_ivfpq_qerr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qerr-triggered IVF-PQ rebuild (r14) on the drift class the
    occupancy trigger CANNOT see: a 5x-scaled replica slab (every 4th
    vector, ids offset) is appended — cosine assignment is
    scale-invariant, so imbalance stays at the healthy 1.25 and
    maintain_ivfpq_index would never fire, while squared-L2
    reconstruction error explodes (ratio ~6380 vs the build-time
    baseline at sf0.01). The maintainer must rebuild into the
    rotation dir with md5-sampled k-means codebooks (the first-ksub
    bootstrap would re-pin to the stale cohort). The oracle restates
    the baseline sample, the drifted sample, and the threshold rule."""
    import tempfile

    emb = _emb(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="mqerr_")
    path, dest = base + "/ivfpq", base + "/ivfpq_rebuilt"
    cents = similarity.centroids_by_sampling(emb, every=50)
    cb = similarity.pq_codebooks(emb, m=8, ksub=16, dim=64)
    similarity.build_ivfpq_index(emb, cents, cb, path, m=8, dim=64)
    slab = emb.where(F.col("vec_id") % 4 == 0).select(
        (F.col("vec_id") + F.lit(20_000_000)).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(5.0))
        .cast("array<float>")
        .alias("embedding"),
    )
    similarity.append_ivfpq_index(slab, path)
    return similarity.maintain_ivfpq_index_qerr(
        spark,
        path,
        dest,
        emb.select("vec_id", "embedding").unionByName(slab),
        max_ratio_mils=3000,
        n_sample=256,
    )


def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote labeling of every 100th vector from its exact
    cosine top-10 (the brute-force backend — any ANN backend plugs in).
    Vote counts and the lowest-label tie-break are integer-exact, so the
    query hashes against the SQL twin built on the same top-10 CTE."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    nn = similarity.cosine_topk_bruteforce(emb, queries, k=10)
    return similarity.knn_classify(nn, emb.select("vec_id", "label"))


def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar quantization of the embedding column; arrays rendered
    as strings for the value-hash compare (scale rounded to 6)."""
    qz = similarity.quantize_embeddings(_emb(spark, sf_dir))
    return qz.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.concat_ws(",", F.transform("q", lambda v: v.cast("string"))).alias(
            "q_str"
        ),
    )


# ----------------------------------------------------------- text analysis


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", textstats.lang_id(F.col("text")).alias("pred_lang")
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        textstats.punct_ratio(F.col("text")).alias("punct_ratio"),
        textstats.stopword_ratio(F.col("text"), STOPWORDS).alias("stopword_ratio"),
        textstats.mean_word_len(F.col("text")).alias("mean_word_len"),
        textstats.quality_score(F.col("text"), STOPWORDS).alias("quality"),
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        textstats.n_ws_tokens(F.col("text")).alias("n_ws_tokens"),
        textstats.n_bpe_tokens(F.col("text")).alias("n_bpe_tokens"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", textstats.fingerprint(F.col("text")).alias("fp")
    )


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (r7). The synthetic text
    carries no newlines, so line structure is PLANTED the same way both
    engines restate it (the domain_stats_psl pattern): every doc gains a
    copy of its first 40 chars as a line plus a doc-unique tail line,
    and every third doc duplicates the 40-char line — so the
    duplicate-line fractions take 3 distinct value shapes while the
    n-gram fractions run on the real corpus text."""
    d = _docs(spark, sf_dir)
    planted = F.concat(
        F.col("text"),
        F.lit("\n"),
        F.substring("text", 1, 40),
        F.lit("\nunique tail "),
        F.col("doc_id").cast("string"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("\n"), F.substring("text", 1, 40)),
        ).otherwise(F.lit("")),
    )
    return textstats.repetition_signals(
        d.select("doc_id", planted.alias("text"))
    )


def q_upsample_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fractional mixture upsampling (r7): rare languages
    repeat (de 2.5x, fr 3x), the dominant one downsamples (en 0.4x),
    the rest pass through at 1x — every copy decision an exact-integer
    md5 cross-multiplication, reproducible across engines."""
    from hadoop_invertedindexer_spark.operators import sampling

    return sampling.upsample_corpus(
        _docs(spark, sf_dir),
        {"de": 2500, "fr": 3000, "en": 400},
    )


def q_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring (r7): every document scored by
    average negative log-likelihood under the corpus's own top-256
    unigram model (Laplace smoothed) — the perplexity-filter primitive,
    capped vocab broadcast, one per-doc shuffle."""
    return textstats.unigram_nll(_docs(spark, sf_dir), max_vocab=256)


def q_ngram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated trigram LM quality scoring (r8): Jelinek-Mercer
    fixed-weight mix of capped-table trigram/bigram ML ratios over the
    Laplace-smoothed unigram floor. Capped at 256 unigrams / 512 grams
    per order so the broadcast tables stay metadata-sized at any corpus
    scale."""
    return textstats.ngram_nll(
        _docs(spark, sf_dir), max_vocab=256, max_ngrams=512
    )


def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail partitioning (r8): unigram-LM scores cut
    into terciles via the milli-granular histogram cumsum — no global
    sort of doc rows, no approx-percentile sketch; cutoffs are exact at
    1/1000 score resolution."""
    return textstats.score_buckets(
        textstats.unigram_nll(_docs(spark, sf_dir), max_vocab=256)
    )


def q_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring (r8): fastText-style linear
    classifier inference over md5-hashed bag-of-words features with the
    deterministic synthetic weight table — the DCLM/FineWeb-Edu
    filtering step; swap trained weights in production."""
    return textstats.classifier_score(_docs(spark, sf_dir), n_features=1024)


def q_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier TRAINING (r8): batch perceptron over hashed
    bag-of-words features on a planted-label corpus — even doc_ids get
    a ' qualitymarker' suffix and label +1, odd get ' junkmarker' and
    −1, so the learned table must separate on the marker features. Four
    integer-exact update rounds; the oracle replays them as unrolled
    MATERIALIZED CTEs (margin → misclassified set → summed y·x delta →
    full-outer weight merge), bit-equal because every quantity is an
    integer."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            "text",
            F.when(
                F.col("doc_id") % 2 == 0, F.lit(" qualitymarker")
            ).otherwise(F.lit(" junkmarker")),
        ).alias("text"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("y"),
    )
    return textstats.classifier_train(d, n_iters=4, n_features=1024)


def q_classifier_train_continue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Warm-started perceptron (r8): 2 rounds, then CONTINUE for 2 more
    from the stored table — must equal the from-scratch 4-round model
    (the weight table is the loop's entire state), so the oracle is
    shared verbatim with classifier_train."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            "text",
            F.when(
                F.col("doc_id") % 2 == 0, F.lit(" qualitymarker")
            ).otherwise(F.lit(" junkmarker")),
        ).alias("text"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("y"),
    )
    feats = textstats.classifier_features(d, n_features=1024, label_col="y")
    w2 = textstats.classifier_train(
        d, n_iters=2, n_features=1024, features=feats
    )
    return textstats.classifier_train(
        d, n_iters=2, n_features=1024, init_weights=w2, features=feats
    )


def q_classifier_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→predict composition (r8): the 4-round perceptron's hard
    votes over its own planted-label corpus — summed integer margin,
    sign decision. Value-checks that the trained table and the decision
    function agree bit-for-bit across engines."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            "text",
            F.when(
                F.col("doc_id") % 2 == 0, F.lit(" qualitymarker")
            ).otherwise(F.lit(" junkmarker")),
        ).alias("text"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("y"),
    )
    feats = textstats.classifier_features(d, n_features=1024, label_col="y")
    w = textstats.classifier_train(
        d, n_iters=4, n_features=1024, features=feats
    )
    return textstats.classifier_predict(d, w, n_features=1024, features=feats)


def q_classifier_train_bigrams(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """fastText-parity hashed BIGRAM features (r10, VERDICT r9 ask 4):
    the same 4-round planted-label perceptron with word_ngrams=2 — the
    gram set widens to tokens + adjacent bigrams, everything else
    (hashing, updates, integer exactness) identical. The learned table
    must differ from the unigram model only through the extra
    features."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            "text",
            F.when(
                F.col("doc_id") % 2 == 0, F.lit(" qualitymarker")
            ).otherwise(F.lit(" junkmarker")),
        ).alias("text"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("y"),
    )
    return textstats.classifier_train(
        d, n_iters=4, n_features=1024, word_ngrams=2
    )


def q_classifier_predict_bigrams(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bigram-model train→predict composition (r10): the wordNgrams=2
    perceptron's hard votes over its planted corpus — n_tokens counts
    grams (2T−1), the margin sums weights over tokens AND bigrams."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            "text",
            F.when(
                F.col("doc_id") % 2 == 0, F.lit(" qualitymarker")
            ).otherwise(F.lit(" junkmarker")),
        ).alias("text"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("y"),
    )
    feats = textstats.classifier_features(
        d, n_features=1024, word_ngrams=2, label_col="y"
    )
    w = textstats.classifier_train(
        d, n_iters=4, n_features=1024, word_ngrams=2, features=feats
    )
    return textstats.classifier_predict(
        d, w, n_features=1024, word_ngrams=2, features=feats
    )


def q_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier EVAL report (r10): ROC-AUC + accuracy of the 4-round
    perceptron's margins against its own planted ±1 labels — the
    fastText-``test`` metric every quality-classifier retrain gates on.
    Tie-aware rank-sum AUC over the grouped integer margins, everything
    integer thousandths, so the one-row report value-hashes against the
    SQL twin built on the same train chain."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            "text",
            F.when(
                F.col("doc_id") % 2 == 0, F.lit(" qualitymarker")
            ).otherwise(F.lit(" junkmarker")),
        ).alias("text"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("y"),
    )
    feats = textstats.classifier_features(d, n_features=1024, label_col="y")
    w = textstats.classifier_train(
        d, n_iters=4, n_features=1024, features=feats
    )
    preds = textstats.classifier_predict(
        d, w, n_features=1024, features=feats
    )
    labeled = preds.withColumn(
        "y",
        F.when(F.col("doc_id") % 2 == 0, F.lit(1)).otherwise(F.lit(-1)),
    )
    return textstats.classifier_auc(labeled)


def q_classifier_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Calibration report (r11): reliability bins + per-bin Brier of
    the same 4-round perceptron's margins against the planted ±1
    labels — completes the eval family next to classifier_auc. The
    clamped-linear probability map, the observed-range binning, and
    every mils/micros division are integer-exact, so the per-bin rows
    value-hash against the SQL twin built on the same train chain."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            "text",
            F.when(
                F.col("doc_id") % 2 == 0, F.lit(" qualitymarker")
            ).otherwise(F.lit(" junkmarker")),
        ).alias("text"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("y"),
    )
    feats = textstats.classifier_features(d, n_features=1024, label_col="y")
    w = textstats.classifier_train(
        d, n_iters=4, n_features=1024, features=feats
    )
    preds = textstats.classifier_predict(
        d, w, n_features=1024, features=feats
    )
    labeled = preds.withColumn(
        "y",
        F.when(F.col("doc_id") % 2 == 0, F.lit(1)).otherwise(F.lit(-1)),
    )
    return textstats.classifier_calibration(labeled, n_bins=8, scale=200)


def q_classifier_pr_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Operating-point sweep (r11): the kept-fraction / precision /
    recall trade at every candidate margin threshold of the same
    4-round perceptron — the row a corpus_filter integration actually
    reads before choosing its cut. All counts and mils ride the grouped
    margin histogram, so the full sweep value-hashes against the SQL
    twin built on the same train chain."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            "text",
            F.when(
                F.col("doc_id") % 2 == 0, F.lit(" qualitymarker")
            ).otherwise(F.lit(" junkmarker")),
        ).alias("text"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("y"),
    )
    feats = textstats.classifier_features(d, n_features=1024, label_col="y")
    w = textstats.classifier_train(
        d, n_iters=4, n_features=1024, features=feats
    )
    preds = textstats.classifier_predict(
        d, w, n_features=1024, features=feats
    )
    labeled = preds.withColumn(
        "y",
        F.when(F.col("doc_id") % 2 == 0, F.lit(1)).otherwise(F.lit(-1)),
    )
    return textstats.classifier_pr_sweep(labeled)


def q_corpus_filter_classifier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Threshold-picked classifier gate (r12): the same 4-round
    perceptron; the operator derives its cut from the PR sweep
    (smallest threshold at >= 900-mils precision, histogram-side) and
    gates every document with corpus_filter-style reason attribution —
    the sweep chain, the chooser, and the keep rule are all stated in
    SQL, shared verbatim with the classifier_pr_sweep oracle."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            "text",
            F.when(
                F.col("doc_id") % 2 == 0, F.lit(" qualitymarker")
            ).otherwise(F.lit(" junkmarker")),
        ).alias("text"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("y"),
    )
    feats = textstats.classifier_features(d, n_features=1024, label_col="y")
    w = textstats.classifier_train(
        d, n_iters=4, n_features=1024, features=feats
    )
    return textstats.corpus_filter_classifier(
        d, w, min_precision_mils=900, n_features=1024, features=feats
    )


def q_ngram_nll_ref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-LM scoring (r8): the eval split (every 50th doc) scored
    under the trigram model trained on the TRAIN split only — the
    lm_docs branch, i.e. how CCNet actually scores a crawl against a
    Wikipedia-trained LM."""
    d = _docs(spark, sf_dir)
    return textstats.ngram_nll(
        d.where(F.col("doc_id") % 50 == 0),
        lm_docs=d.where(F.col("doc_id") % 50 != 0),
        max_vocab=256,
        max_ngrams=512,
    )


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge training (r8): 10 merges learned on the
    corpus word-frequency dictionary; the oracle replays the identical
    loop as 10 unrolled MATERIALIZED CTE steps (argmax by freq desc,
    pair asc; greedy replace application)."""
    return vocab.bpe_train(_docs(spark, sf_dir), num_merges=10)


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus with the 10-merge BPE model trained on itself:
    merges replay in rank order over sentinel-separated character
    symbols; at this model size the replay is a pure JVM replace
    chain."""
    d = _docs(spark, sf_dir)
    return vocab.bpe_encode(d, vocab.bpe_train(d, num_merges=10))


def q_bpe_encode_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stored-BPE-model encode (r10, VERDICT r9 ask 5): train the
    10-merge model into a persisted artifact, then encode the corpus
    against the STORED merges — identical output to the direct
    train→encode chain by construction, so the oracle is shared
    verbatim with bpe_encode."""
    import tempfile

    d = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="bpem_") + "/bpem"
    vocab.build_bpe_model(d, path, num_merges=10)
    return vocab.bpe_encode_incremental(spark, d, path)


def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility report (r10): pieces-per-word /
    pieces-per-char of the corpus-trained 10-merge BPE model, rolled up
    by the table's lang column — the diagnostic a tokenizer choice is
    judged on before burning a training run. Word/char masses ride the
    encode projection (carry_cols), so the corpus scans once."""
    d = _docs(spark, sf_dir)
    return vocab.bpe_fertility(d, vocab.bpe_train(d, num_merges=10))


def q_bpe_continue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warm-start BPE (r8): train 5 merges, then CONTINUE for 5 more —
    must equal merges 6-10 of the from-scratch 10-merge chain (BPE state
    is fully captured by dictionary + merge list), so the oracle is just
    the unrolled chain's steps p6..p10."""
    d = _docs(spark, sf_dir)
    return vocab.bpe_train_continue(
        d, vocab.bpe_train(d, num_merges=5), num_merges=5
    )


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level source-overlap matrix (r7), SCALE path: one MinHash
    signature per SOURCE (xxhash64 over 8-byte pre-hashed shingles)
    over the union of its documents' 3-gram shingles, Jaccard estimated
    for all C(20,2) source pairs. Rows-only driver check (hash values
    are engine-specific); `source_overlap_portable` is the fully
    oracled md5-60bit twin — same split as dedup_minhash."""
    return dedup.source_overlap(_docs(spark, sf_dir))


def q_source_overlap_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle-checkable twin: every per-source signature min is the
    md5-60bit construction DuckDB reproduces bit-for-bit, so all 190
    estimates value-hash."""
    return dedup.source_overlap(_docs(spark, sf_dir), portable=True)


def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/RefinedWeb-style keep/drop verdict per document (r7): the
    fixed rule chain too_short → wrong_lang → low_quality →
    repetitive_lines → repetitive_ngrams → top_ngram_heavy over the
    engine's own signals; thresholds chosen so the synthetic corpus
    splits across several reasons (token median 56, quality median 0.57,
    ~24% 'und' language, top-2-gram coverage up to 0.33)."""
    return textstats.corpus_filter(_docs(spark, sf_dir), STOPWORDS)


_CAPSTONE_WEIGHTS = {"src0": 2500, "src1": 2500, "src7": 300, "src8": 1500}


def q_pipeline_capstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data pipeline (VERDICT r7 ask 4), every
    stage the engine's own first-class operator, chained the way a real
    pretraining ingest runs them:

      ingest (with planted re-ingested duplicates: every 10th doc
      appears again under a shifted id) → corpus_filter keep/drop →
      exact dedup (keep-min-id, so each planted copy dies and its
      original survives) → fractional mixture upsampling by source →
      deterministic md5-nibble split (keyed on the ORIGINAL doc id, so
      all epochs of a doc share a split — leakage-safe by construction)
      → GPT block packing of the train epochs with a 32-entry vocab
      built on the deduped corpus. The pack stream id is doc*4 + epoch —
      stride 4 = max copies + 1 under these weights, keeping sids DENSE
      so pack_tokens' bucket summary frame stays ~D/bucket_size rows (a
      sparse doc*1000 stride would inflate the single-task summary
      1000x, measured 5.1 s -> the fix below).

    Output = the packed train blocks (block_id, n_tokens, ids_str) —
    the actual artifact a trainer would read. The oracle restates the
    entire chain in one SQL query, so the value hash certifies not just
    each operator but every COLUMN CONTRACT between them."""
    d = _docs(spark, sf_dir).select("doc_id", "text", "source")
    src = d.unionByName(
        d.where(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "source"
        )
    )
    verdict = textstats.corpus_filter(src, STOPWORDS)
    # kept carries the whole verdict-signal lineage and is scanned twice
    # below (the dedup aggregate + the keep join); deduped feeds three
    # consumers (upsample, the epoch text join, the vocab build) — both
    # persist, or the repetition CTEs re-run per consumer
    kept = src.join(
        verdict.where(F.col("is_kept")).select("doc_id"), "doc_id"
    ).transform(tracked_persist)
    keep_ids = dedup.dedup_exact(kept).select(
        F.col("keep_id").alias("doc_id")
    )
    deduped = kept.join(keep_ids, "doc_id").transform(tracked_persist)
    ups = sampling.upsample_corpus(
        deduped, _CAPSTONE_WEIGHTS, strata_col="source"
    )
    train = sampling.hash_split(ups).where(F.col("split") == "train")
    epochs = (
        train.join(deduped.select("doc_id", "text"), "doc_id")
        .select((F.col("doc_id") * 4 + F.col("epoch")).alias("sid"), "text")
        .transform(tracked_persist)  # pack_tokens scans its input twice
    )
    return vocab.pack_tokens(
        epochs,
        vocab.build_vocab(deduped, max_size=32),
        block_size=128,
        id_col="sid",
        bucket_size=256,
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every-50th doc plays the eval set; the
    query reports each train doc sharing a word 3-gram with it, with the
    distinct-shared-shingle count. Eval shingles broadcast, so the train
    side never shuffles (dedup.contamination)."""
    d = _docs(spark, sf_dir)
    return dedup.contamination(
        train=d.where(F.col("doc_id") % 50 != 0),
        evalset=d.where(F.col("doc_id") % 50 == 0),
        n=3,
    )


def _planted_pii():
    """The synthetic corpus carries no natural PII, so the scrub would be
    a no-op over raw ``text``. Derive a deterministic PII-bearing column
    from doc_id (same expression in the oracle) so every row exercises
    all three redaction patterns with known counts."""
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.2."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".7 tel +1 (555) 010-"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: typed placeholder redaction of emails / IPv4s / phone
    runs, plus per-pattern hit counts. Pure regexp chain — JVM-side for
    the 100 TB scrub path."""
    d = _docs(spark, sf_dir)
    planted = _planted_pii()
    return d.select(
        "doc_id",
        textstats.count_pii(planted, textstats.EMAIL_REGEX).alias("n_emails"),
        textstats.count_pii(planted, textstats.IPV4_REGEX).alias("n_ips"),
        textstats.count_pii(planted, textstats.PHONE_REGEX).alias("n_phones"),
        textstats.redact_pii(planted).alias("redacted"),
    )


def q_filter_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-filter agreement (r10): corpus_filter's keep verdict vs a
    plain quality_score >= 0.6 gate — the contingency table, raw
    agreement, and chance-corrected Cohen's kappa, all exact-integer
    thousandths (floor-division kappa so negative values match the
    oracle's // semantics)."""
    d = _docs(spark, sf_dir)
    va = textstats.corpus_filter(d, STOPWORDS).select(
        "doc_id", F.col("is_kept").alias("a")
    )
    vb = d.select(
        "doc_id",
        (textstats.quality_score(F.col("text"), STOPWORDS) >= 0.6).alias(
            "b"
        ),
    )
    return textstats.filter_agreement(va.join(vb, "doc_id"))


def q_pii_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII compliance rollup (r10): PII planted on two
    thirds of the docs (every id with doc_id % 3 != 2), so the report
    carries real per-source masses AND a sub-1000 affected-doc rate —
    value-checking the counters, the any-hit flag, and the
    thousandths rate in one row per source."""
    d = _docs(spark, sf_dir)
    planted = F.when(
        F.col("doc_id") % 3 != 2, _planted_pii()
    ).otherwise(F.col("text"))
    return textstats.pii_report(
        d.select("doc_id", "source", planted.alias("text"))
    )


def q_repetition_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition removal: first occurrence of each token
    kept in document order. array_distinct keeps it a narrow projection —
    no explode, no shuffle; the oracle proves the order-preserving
    semantics positionally (min(ord) per token)."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique"),
        textstats.dedup_repeated_tokens(F.col("text")).alias("dedup_text"),
    )


# -------------------------------------------------------------- multimodal


_BOILER_PHRASE = (
    "subscribe to the daily digest and share this page with your team "
    "for more updates and tips"
)


def q_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate removal over content-defined chunks: a
    17-token template is planted into every 3rd document (same CTE trick
    as pii_redact), the chunker splits at md5(token)%8==0 boundaries so
    the template's interior chunks align across documents regardless of
    offset, and chunks in >= 30 distinct docs are dropped. The small
    shared vocabulary of the synthetic corpus also makes some short
    NATURAL chunks cross the threshold — exactly the CCNet behavior
    (frequent lines go regardless of why they repeat)."""
    planted = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" " + _BOILER_PHRASE)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return dedup.boilerplate_removal(planted, modulus=8, max_df=30)


def _planted_url():
    """Deterministic per-doc URL (the synthetic corpus has none), with
    the variation the canonicalizer must see through: mixed-case hosts,
    tracking params, a fragment. Same planted-column pattern as
    ``_planted_pii``; the oracle reconstructs the canonical form from
    the identical doc_id arithmetic."""
    host = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("www.Example.COM"))
        .when(F.col("doc_id") % 3 == 1, F.lit("docs.spark.test"))
        .otherwise(F.lit("Data.Example.com"))
    )
    return F.concat(
        F.lit("https://"),
        host,
        F.lit("/p/"),
        F.col("doc_id").cast("string"),
        F.lit("?utm_source=feed&ref="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&q="),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("#frag"),
    )


def q_filter_optout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opt-out compliance filtering (r8): an opt-out for 'example.com'
    must drop BOTH planted example.com hosts (www., Data. — different
    case, different subdomains) via the PSL registered domain, keeping
    only the spark.test third of the corpus."""
    from hadoop_invertedindexer_spark.functions import urls

    d = _docs(spark, sf_dir).select("doc_id", _planted_url().alias("url"))
    opt = spark.createDataFrame([("example.com",)], ["domain"])
    return urls.filter_optout_domains(d, opt).select("doc_id", "url")


def q_dedup_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup (r8): the planted URLs collide ONLY after
    canonicalization — the path repeats every 40 ids while host case and
    tracking params vary per id — so the keeper groups (same id mod
    120 by CRT over the host/path/query residues) value-check the
    canonicalize-then-group pipeline, not a string group-by."""
    host = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("www.Example.COM"))
        .when(F.col("doc_id") % 3 == 1, F.lit("docs.spark.test"))
        .otherwise(F.lit("Data.Example.com"))
    )
    url = F.concat(
        F.lit("https://"),
        host,
        F.lit("/p/"),
        (F.col("doc_id") % 40).cast("string"),
        F.lit("?utm_source=feed&ref="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&q="),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("#frag"),
    )
    d = _docs(spark, sf_dir).select("doc_id", url.alias("url"))
    return dedup.dedup_urls(d)


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real parse_url + HOF query scrub on the Spark side; the oracle
    rebuilds host/path/clean-query from the planted geometry (the
    media-oracle trick), so case folding, tracking-param removal, and
    fragment drop are all value-checked."""
    from hadoop_invertedindexer_spark.functions import urls

    d = _docs(spark, sf_dir).select("doc_id", _planted_url().alias("url"))
    return d.select(
        "doc_id",
        "url",
        urls.canonicalize_url(F.col("url")).alias("canon_url"),
        urls.url_host(F.col("url")).alias("host"),
        urls.registered_domain(urls.url_host(F.col("url"))).alias("domain"),
    )


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain corpus statistics over canonical URLs — the
    grouping web pipelines rate-limit / quality-score by."""
    from hadoop_invertedindexer_spark.functions import urls

    d = _docs(spark, sf_dir).select("doc_id", _planted_url().alias("url"))
    return (
        d.select(
            urls.registered_domain(urls.url_host(F.col("url"))).alias("domain"),
            urls.canonicalize_url(F.col("url")).alias("canon"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("canon").alias("n_distinct_urls"),
        )
    )


def q_domain_stats_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Public-suffix-aware registered-domain rollup (ADVICE r5 item 6):
    the planted hosts include co.uk / com.au / plain-.com / bare-suffix
    shapes, so the oracle value-checks exactly where the broadcast
    suffix join and the last-two-labels heuristic DIVERGE. The suffix
    table is broadcast; the corpus side never shuffles for the join."""
    from hadoop_invertedindexer_spark.functions import urls

    host = (
        F.when(F.col("doc_id") % 8 == 0, F.lit("News.BBC.co.uk"))
        .when(F.col("doc_id") % 8 == 1, F.lit("shop.Example.COM.au"))
        .when(F.col("doc_id") % 8 == 2, F.lit("www.Example.COM"))
        .when(F.col("doc_id") % 8 == 3, F.lit("co.uk"))  # bare suffix
        .when(F.col("doc_id") % 8 == 4, F.lit("a.b.data.gov.uk"))  # deep chain
        # full PSL rule shapes (VERDICT r6 item 5): a 3-label rule, a
        # wildcard rule, and an exception rule from the real PSL
        .when(F.col("doc_id") % 8 == 5, F.lit("www.School.ACT.edu.au"))
        .when(F.col("doc_id") % 8 == 6, F.lit("WWW.Shop.Foo.CK"))  # *.ck
        .otherwise(F.lit("sub.WWW.ck"))  # !www.ck exception
    )
    d = _docs(spark, sf_dir).select("doc_id", host.alias("host"))
    return (
        urls.with_registered_domain_psl(d, "host", "domain")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("host").alias("n_hosts"),
        )
    )


def q_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked word vocabulary with deterministic tie-broken
    ids (count desc, token asc)."""
    return vocab.build_vocab(_docs(spark, sf_dir), max_size=1024)


def q_tokens_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document encoded as its ordered token-id sequence against
    a deliberately small (32-entry) vocab so the OOV path (id 0) is
    exercised on real rows. Vocab side broadcast; one exchange for the
    per-doc reassembly."""
    d = _docs(spark, sf_dir)
    return vocab.encode_tokens(d, vocab.build_vocab(d, max_size=32))


def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID eval (r10): confusion matrix of the marker-profile
    heuristic against the table's gold lang column — per (gold, pred)
    cell counts and the integer-thousandths share of the gold row (the
    diagonal = per-language recall)."""
    return textstats.lang_confusion(_docs(spark, sf_dir))


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang OOV/coverage report (r10) of the deliberately small
    32-entry vocab (the tokens_encode setup, so the OOV path carries
    real mass) — the diagnostic that shows a vocab under-serving a
    stratum before training."""
    d = _docs(spark, sf_dir)
    return vocab.vocab_coverage(d, vocab.build_vocab(d, max_size=32))


def q_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode: documents rendered into SAU1 int16-PCM
    containers, headers parsed back by the real codec path. Synthesis
    geometry is SQL-expressible (sample_rate/channels/n_samples from
    doc_id + octet_length), mirroring multimodal_decode."""
    return multimodal.decode_audio_meta(
        multimodal.synthesize_audio(_docs(spark, sf_dir))
    )


def q_pack_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing (r7): the 32-entry vocab's id streams
    (OOV → 0), one EOS (-1) per document, concatenated in doc_id order
    and cut into 128-token training blocks. bucket_size=64 exercises the
    two-level distributed prefix sum across ~8 buckets at sf0.01."""
    d = _docs(spark, sf_dir)
    return vocab.pack_tokens(
        d,
        vocab.build_vocab(d, max_size=32),
        block_size=128,
        bucket_size=64,
    )


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signal stats over decoded PCM (energy / peak / per-channel zero
    crossings / integer duration): every metric is integer-exact, so the
    oracle recomputes them from the text-cycled synthesis samples
    without any decode."""
    return multimodal.audio_features(
        multimodal.synthesize_audio(_docs(spark, sf_dir))
    )


def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination against a 16 KiB Bloom bitmap of the eval set's
    3-gram shingles (every-50th doc plays the eval set, same split as
    ``decontaminate``). The bitmap is a ONE-ROW broadcast regardless of
    eval size — the fixed-memory alternative to broadcasting the full
    shingle set — and the md5-60bit double hashing makes every bit
    position reproducible in ANSI SQL, so the oracle recomputes the
    exact same membership (false positives included)."""
    d = _docs(spark, sf_dir)
    return dedup.bloom_decontaminate(
        train=d.where(F.col("doc_id") % 50 != 0),
        evalset=d.where(F.col("doc_id") % 50 == 0),
        n=3,
    )


def q_duplicate_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplicate spans: maximal per-doc runs of token
    positions covered by an 8-token shingle occurring in >= 2 distinct
    docs. Shingle document frequency on 8-byte hashes; only duplicated
    shingles reach the windowed islands merge."""
    return dedup.duplicate_passages(_docs(spark, sf_dir), n=8, min_docs=2)


def q_dedup_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr rewrite (r8): duplicated substrings are PLANTED the
    same way both engines restate them — every 7th doc gains a shared
    13-token passage (cross-doc duplication; canonical = doc 0, the
    smallest planted id) and every 11th doc re-appends its own first 120
    chars (a within-doc repeat, which duplicate_passages' distinct-doc
    frequency would miss by design). The plant vocabulary is disjoint
    from the corpus vocabulary, so planted windows never collide with
    real text."""
    d = _docs(spark, sf_dir)
    planted = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.lit(
                " shared planted passage alpha beta gamma delta"
                " epsilon zeta eta theta iota kappa"
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit(" "), F.substring("text", 1, 120)),
        ).otherwise(F.lit("")),
    )
    return dedup.dedup_substrings(
        d.select("doc_id", planted.alias("text")), n=8
    )


def q_dedup_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 three-sentence-span dedup (r10, VERDICT r9 ask 6): sentence
    boundaries AND duplicated spans are PLANTED (the synthetic corpus
    has neither) — every 6th doc gains the same three shared sentences
    mid-doc (cross-doc duplication; canonical = doc 0), and every 11th
    doc gains a three-sentence run repeated twice whose first sentence
    embeds the doc's OWN leading 20 chars (a pure within-doc repeat:
    the doc-specific material keeps it from duplicating across docs).
    Flanking spans mix planted sentences with per-doc prefix/tail
    sentences, so exactly the planted spans duplicate."""
    d = _docs(spark, sf_dir)
    planted = F.concat(
        F.substring("text", 1, 50),
        F.when(
            F.col("doc_id") % 6 == 0,
            F.lit(
                ". Aaa shared span. Bbb shared span."
                " Ccc shared span. And then "
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(". Wda "),
                F.substring("text", 1, 20),
                F.lit(". Wdb own rep. Wdc own rep. Wda "),
                F.substring("text", 1, 20),
                F.lit(". Wdb own rep. Wdc own rep. After that "),
            ),
        ).otherwise(F.lit("")),
        F.substring("text", 51, 100000),
    )
    return dedup.dedup_sentences(d.select("doc_id", planted.alias("text")))


def q_dedup_sentences_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Persisted-sentence-index dedup (r10): docs 0..249 (the published
    corpus — every planted cross-doc span's canonical among them) are
    indexed once; the batch = docs 250+ span-dedups against the stored
    keys. With index ids preceding batch ids this equals the direct
    chain over the union restricted to batch docs, so the oracle is
    the shared chain with an output filter."""
    import tempfile

    d = _docs(spark, sf_dir)
    planted = F.concat(
        F.substring("text", 1, 50),
        F.when(
            F.col("doc_id") % 6 == 0,
            F.lit(
                ". Aaa shared span. Bbb shared span."
                " Ccc shared span. And then "
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(". Wda "),
                F.substring("text", 1, 20),
                F.lit(". Wdb own rep. Wdc own rep. Wda "),
                F.substring("text", 1, 20),
                F.lit(". Wdb own rep. Wdc own rep. After that "),
            ),
        ).otherwise(F.lit("")),
        F.substring("text", 51, 100000),
    )
    src = d.select("doc_id", planted.alias("text"))
    path = tempfile.mkdtemp(prefix="sidx_") + "/sidx"
    dedup.build_sentence_index(src.where(F.col("doc_id") < 250), path)
    return dedup.dedup_sentences_incremental(
        spark, src.where(F.col("doc_id") >= 250), path
    )


def q_decontaminate_sentences(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sentence-span decontamination (r10): every 50th doc plays the
    eval set; a three-sentence canary block is planted on BOTH the eval
    docs and every 9th train doc — contaminated train docs lose exactly
    the three canary sentences (flanking spans mix in doc-specific
    prefix/tail sentences, so only the canary triple matches)."""
    d = _docs(spark, sf_dir)
    planted = F.concat(
        F.substring("text", 1, 50),
        F.when(
            (F.col("doc_id") % 9 == 0) | (F.col("doc_id") % 50 == 0),
            F.lit(
                ". Canary alpha one. Canary bravo two."
                " Canary charlie three. And then "
            ),
        ).otherwise(F.lit("")),
        F.substring("text", 51, 100000),
    )
    src = d.select("doc_id", planted.alias("text"))
    return dedup.decontaminate_sentences(
        train=src.where(F.col("doc_id") % 50 != 0),
        evalset=src.where(F.col("doc_id") % 50 == 0),
    )


def q_contamination_report_sentences(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sentence-granular contamination measurement (r10): the same
    canary-planted train/eval split as decontaminate_sentences, but
    reporting per EVAL doc how many of its sentences are covered by
    spans shared with train (union coverage via the islands merge) —
    the '% of the benchmark leaks as quoted passages' table, not the
    scrub."""
    d = _docs(spark, sf_dir)
    planted = F.concat(
        F.substring("text", 1, 50),
        F.when(
            (F.col("doc_id") % 9 == 0) | (F.col("doc_id") % 50 == 0),
            F.lit(
                ". Canary alpha one. Canary bravo two."
                " Canary charlie three. And then "
            ),
        ).otherwise(F.lit("")),
        F.substring("text", 51, 100000),
    )
    src = d.select("doc_id", planted.alias("text"))
    return dedup.contamination_report_sentences(
        train=src.where(F.col("doc_id") % 50 != 0),
        evalset=src.where(F.col("doc_id") % 50 == 0),
    )


def q_contamination_report_sentences_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Persisted-train-index sentence contamination (r10): the TRAIN
    side of the same canary-planted split builds a sentence-span index
    once; the benchmark probes the stored 16-byte keys — identical
    output to the direct path by construction, so the oracle is shared
    verbatim with contamination_report_sentences."""
    import tempfile

    d = _docs(spark, sf_dir)
    planted = F.concat(
        F.substring("text", 1, 50),
        F.when(
            (F.col("doc_id") % 9 == 0) | (F.col("doc_id") % 50 == 0),
            F.lit(
                ". Canary alpha one. Canary bravo two."
                " Canary charlie three. And then "
            ),
        ).otherwise(F.lit("")),
        F.substring("text", 51, 100000),
    )
    src = d.select("doc_id", planted.alias("text"))
    path = tempfile.mkdtemp(prefix="sidx_rep_") + "/sidx"
    dedup.build_sentence_index(src.where(F.col("doc_id") % 50 != 0), path)
    return dedup.contamination_report_sentences_incremental(
        spark, src.where(F.col("doc_id") % 50 == 0), path
    )


def q_decontaminate_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level decontamination (r8): every 50th doc plays the
    eval set (the decontaminate/bloom split); a 10-token canary passage
    is planted on BOTH the eval docs and every 9th train doc, so the
    contaminated train docs lose exactly the canary span while their own
    text survives — span-granular, unlike the doc-flagging twins."""
    d = _docs(spark, sf_dir)
    planted = F.concat(
        F.col("text"),
        F.when(
            (F.col("doc_id") % 9 == 0) | (F.col("doc_id") % 50 == 0),
            F.lit(
                " benchmark canary alpha bravo charlie delta echo"
                " foxtrot golf hotel"
            ),
        ).otherwise(F.lit("")),
    )
    src = d.select("doc_id", planted.alias("text"))
    return dedup.decontaminate_substrings(
        train=src.where(F.col("doc_id") % 50 != 0),
        evalset=src.where(F.col("doc_id") % 50 == 0),
        n=8,
    )


def q_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-side contamination measurement (r8): the same canary-planted
    train/eval split as decontaminate_substrings, but reporting per EVAL
    doc how many of its tokens are covered by windows shared with train
    (union coverage via the islands merge) — the '% contaminated' table,
    not the scrub."""
    d = _docs(spark, sf_dir)
    planted = F.concat(
        F.col("text"),
        F.when(
            (F.col("doc_id") % 9 == 0) | (F.col("doc_id") % 50 == 0),
            F.lit(
                " benchmark canary alpha bravo charlie delta echo"
                " foxtrot golf hotel"
            ),
        ).otherwise(F.lit("")),
    )
    src = d.select("doc_id", planted.alias("text"))
    return dedup.contamination_report(
        train=src.where(F.col("doc_id") % 50 != 0),
        evalset=src.where(F.col("doc_id") % 50 == 0),
        n=8,
    )


def q_contamination_report_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Persisted-train-index contamination measurement (r8): the TRAIN
    split's window hashes go into a stored index, then the eval split
    measures against the stored hashes — output identical to the direct
    report by construction, so the oracle is shared verbatim."""
    import tempfile

    d = _docs(spark, sf_dir)
    planted = F.concat(
        F.col("text"),
        F.when(
            (F.col("doc_id") % 9 == 0) | (F.col("doc_id") % 50 == 0),
            F.lit(
                " benchmark canary alpha bravo charlie delta echo"
                " foxtrot golf hotel"
            ),
        ).otherwise(F.lit("")),
    )
    src = d.select("doc_id", planted.alias("text"))
    path = tempfile.mkdtemp(prefix="tidx_") + "/tidx"
    dedup.build_window_index(src.where(F.col("doc_id") % 50 != 0), path, n=8)
    return dedup.contamination_report_incremental(
        spark, src.where(F.col("doc_id") % 50 == 0), path, n=8
    )


def q_decontaminate_substrings_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Persisted-window-index decontamination (r8): build the eval
    split's window-hash index in a temp dir, then decontaminate the
    train split against the STORED hashes — output identical to the
    direct path by construction, so the oracle is shared verbatim."""
    import tempfile

    d = _docs(spark, sf_dir)
    planted = F.concat(
        F.col("text"),
        F.when(
            (F.col("doc_id") % 9 == 0) | (F.col("doc_id") % 50 == 0),
            F.lit(
                " benchmark canary alpha bravo charlie delta echo"
                " foxtrot golf hotel"
            ),
        ).otherwise(F.lit("")),
    )
    src = d.select("doc_id", planted.alias("text"))
    path = tempfile.mkdtemp(prefix="widx_") + "/widx"
    dedup.build_window_index(src.where(F.col("doc_id") % 50 == 0), path, n=8)
    return dedup.decontaminate_substrings_incremental(
        spark, src.where(F.col("doc_id") % 50 != 0), path, n=8
    )


def q_dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet paragraph-level dedup (r8): multi-paragraph docs are
    PLANTED on the newline-free corpus — every doc becomes (first 60
    chars, a middle paragraph, the rest), where every 5th doc's middle
    paragraph is an identical shared string (the cross-doc boilerplate
    family; canonical = doc 0) and every 7th doc re-appends its own
    first paragraph (a within-doc repeat). Short docs produce
    empty-normalization trailing paragraphs, exercising the
    kept-verbatim empty path."""
    d = _docs(spark, sf_dir)
    planted = F.concat(
        F.substring("text", 1, 60),
        F.lit("\n"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit("planted shared paragraph alpha beta gamma"),
        ).otherwise(
            F.concat(F.lit("solo paragraph "), F.col("doc_id").cast("string"))
        ),
        F.lit("\n"),
        F.substring("text", 61, 100000),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit("\n"), F.substring("text", 1, 60)),
        ).otherwise(F.lit("")),
    )
    return dedup.dedup_paragraphs(d.select("doc_id", planted.alias("text")))


def q_dedup_paragraphs_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Persisted-paragraph-index dedup (r8): docs 0..249 (the published
    corpus, every planted cross-doc paragraph's canonical among them)
    are indexed once; the batch = docs 250+ dedups against the stored
    hashes — output identical to the direct path over the full set
    restricted to batch docs, so the oracle is the shared chain with an
    output filter."""
    import tempfile

    d = _docs(spark, sf_dir)
    planted = F.concat(
        F.substring("text", 1, 60),
        F.lit("\n"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit("planted shared paragraph alpha beta gamma"),
        ).otherwise(
            F.concat(F.lit("solo paragraph "), F.col("doc_id").cast("string"))
        ),
        F.lit("\n"),
        F.substring("text", 61, 100000),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit("\n"), F.substring("text", 1, 60)),
        ).otherwise(F.lit("")),
    )
    src = d.select("doc_id", planted.alias("text"))
    path = tempfile.mkdtemp(prefix="pidx_") + "/pidx"
    dedup.build_paragraph_index(src.where(F.col("doc_id") < 250), path)
    return dedup.dedup_paragraphs_incremental(
        spark, src.where(F.col("doc_id") >= 250), path
    )


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (r8): target = the English documents,
    raw pool = everything else; hashed unigram+bigram features in 512
    buckets, Gumbel top-50 with the md5-uniform noise — the whole chain
    (feature hash, Laplace bucket models, log-ratio weights, Gumbel
    keys) is exact double math both engines restate."""
    d = _docs(spark, sf_dir)
    return sampling.dsir_select(
        raw=d.where(F.col("lang") != "en"),
        target=d.where(F.col("lang") == "en"),
        k=50,
        n_buckets=512,
    )


def q_dsir_select_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-model DSIR (r8): the log-ratio model is built once from
    the same en/non-en split as ``dsir_select`` and stored; scoring the
    raw pool against the STORED model reproduces the direct path
    exactly, so the oracle is shared verbatim."""
    import tempfile

    d = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="dsir_") + "/dsir"
    sampling.build_dsir_model(
        raw=d.where(F.col("lang") != "en"),
        target=d.where(F.col("lang") == "en"),
        path=path,
        n_buckets=512,
    )
    return sampling.dsir_select_incremental(
        spark, d.where(F.col("lang") != "en"), path, k=50
    )


def q_dsir_model_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR model health (r8): build the persisted model from the same
    en/non-en split, then report bucket coverage + smoothed
    KL(target‖raw) + max |log-ratio| off the STORED counts — the
    selection family's ivf_drift."""
    import tempfile

    d = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="dsirm_") + "/dsir"
    sampling.build_dsir_model(
        raw=d.where(F.col("lang") != "en"),
        target=d.where(F.col("lang") == "en"),
        path=path,
        n_buckets=512,
    )
    return sampling.dsir_model_divergence(spark, path)


def q_maintain_dsir_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staleness-triggered DSIR rebuild (r12): the divergence fixture's
    model (raw = non-en, target = en, 512 buckets) probed with a batch
    that IS the target distribution — the drifted-raw-pool story: the
    stream being scored now looks like target, so KL(batch‖raw) equals
    the (positive) KL(target‖raw) and crosses the 1-mil threshold at
    sf0.01 (17 mils) and sf0.1 (1.7 mils) alike; the maintainer must
    rebuild into the rotation dir at the stored n_buckets and say so.
    The oracle reuses the divergence CTEs — batch ≡ target makes
    kl_batch_raw the same expression — plus the threshold rule."""
    import tempfile

    d = _docs(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="mdsir_")
    path, dest = base + "/dsir", base + "/dsir_rot"
    target = d.where(F.col("lang") == "en")
    sampling.build_dsir_model(
        raw=d.where(F.col("lang") != "en"), target=target, path=path,
        n_buckets=512,
    )
    return sampling.maintain_dsir_model(
        spark, path, dest, batch=target, target=target,
        max_kl_batch_mils=1,
    )


def q_maintain_bpe_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fertility-triggered BPE growth (r12): a 10-merge stored model
    probed with its own training corpus reads ~3,600 mils (10 merges
    barely compress — the undertrained state) against the 2,500-mils
    threshold, so the maintainer must learn 5 more merges by rank
    continuation. merges_after is SQL-expressible because continuation
    on the SAME corpus equals merges 11–15 of the from-scratch chain
    (the q_bpe_continue contract), so the oracle unrolls 15 steps,
    probes fertility against the first 10, and counts both prefixes."""
    import tempfile

    d = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="mbpe_") + "/bpem"
    vocab.build_bpe_model(d, path, num_merges=10)
    return vocab.maintain_bpe_model(
        d, path, max_fertility_mils=2500, extra_merges=5
    )


def q_html_to_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML→text crawl preprocessing (r8): every doc is wrapped in a
    PLANTED page — style block + comment in the head, an h1 title, a
    paragraph with encoded entities, and a script with a bare ``<`` —
    then stripped back. Both engines restate the identical regex chain
    (Java regex and RE2 parse every pattern the same; no
    backreferences), so the recovered text + paragraph newlines
    hash-match."""
    from hadoop_invertedindexer_spark.functions import textprep

    d = _docs(spark, sf_dir)
    html = F.concat(
        F.lit(
            "<html><head><style>p color red</style>"
            "<!-- crawler junk --></head><body><h1>"
        ),
        F.substring("text", 1, 40),
        F.lit("</h1><p>"),
        F.substring("text", 41, 100000),
        F.lit(
            " &amp; more &lt;tags&gt;</p>"
            "<script>var x = 1 < 2;</script></body></html>"
        ),
    )
    out = textprep.strip_html(html)
    return d.select(
        "doc_id",
        out.alias("text"),
        F.length(out).cast("long").alias("n_chars"),
    )


def q_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation (r8): boundaries are PLANTED mid-corpus
    (the synthetic text has no sentence-final punctuation + capital
    openers of its own), covering ., !, ? and the no-boundary negative
    (the tail resumes lowercase). Both engines insert the same sentinel
    via capture-group replacement — Spark spells groups $1, DuckDB \\1 —
    then split on it."""
    from hadoop_invertedindexer_spark.functions import textprep

    d = _docs(spark, sf_dir)
    planted = F.concat(
        F.substring("text", 1, 50),
        F.lit(
            ". Alpha beta gamma. Delta says hello! Echo asks why? and then "
        ),
        F.substring("text", 51, 100000),
    )
    return textprep.split_sentences(d.select("doc_id", planted.alias("text")))


def q_split_long_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-boundary document segmentation (r8): the same planted
    sentence boundaries as split_sentences, re-packed into ≤40-token
    sub-docs by the next-fit cumsum rule — every chunk is a
    space-rejoin of whole sentences, so chunk texts, counts, and token
    masses all value-check."""
    from hadoop_invertedindexer_spark.functions import textprep

    d = _docs(spark, sf_dir)
    planted = F.concat(
        F.substring("text", 1, 50),
        F.lit(
            ". Alpha beta gamma. Delta says hello! Echo asks why? and then "
        ),
        F.substring("text", 51, 100000),
    )
    return textprep.split_long_docs(
        d.select("doc_id", planted.alias("text")), max_tokens=40
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.media_metadata_summary(
        multimodal.binary_docs(_docs(spark, sf_dir))
    )


def q_multimodal_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.payload_digest(multimodal.binary_docs(_docs(spark, sf_dir)))


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode: documents rendered into SBM1/SVD1 containers
    (synthesize_media), headers parsed back by the real codec path. The
    synthesis geometry is SQL-expressible, so the oracle recomputes
    width/height/n_frames/n_bytes from doc_id + octet_length(text)."""
    return multimodal.decode_image_meta(
        multimodal.synthesize_media(_docs(spark, sf_dir)), fake=False
    )


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize: every frame nearest-neighbor-resized to 16x16 and
    re-encoded; out_bytes proves the payload was actually rebuilt
    (header + n_frames*16*16*channels)."""
    return (
        multimodal.resize_image(
            multimodal.synthesize_media(_docs(spark, sf_dir)),
            width=16,
            height=16,
            fake=False,
        )
        .select(
            "doc_id",
            "width",
            "height",
            F.octet_length("payload").cast("bigint").alias("out_bytes"),
        )
    )


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame sampling: every 2nd decoded frame re-encoded as a
    standalone SBM1 still (1 row -> N frames fan-out); frame_bytes proves
    each emitted frame is a full single-frame container."""
    return multimodal.frame_sample(
        multimodal.synthesize_media(_docs(spark, sf_dir)), every=2, fake=False
    ).select(
        "doc_id",
        "frame_idx",
        F.octet_length("frame").cast("bigint").alias("frame_bytes"),
    )


def q_media_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup: one shuffle of (md5(payload), doc_id) — the
    payload column never moves. Oracle-paired without restating md5 over
    the container bytes: payloads are pure functions of (geometry,
    text-cycled body), so the SQL twin groups by that identity key
    (hex-string cycling aligns at byte boundaries)."""
    return multimodal.media_dedup_exact(
        multimodal.synthesize_media(_docs(spark, sf_dir))
    )


def q_media_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash fingerprints over REAL decoded pixels.
    Oracle-paired bit-for-bit: the hash is pure integer arithmetic
    (channel-sum gray, 64*g > sum threshold), and frame-0 pixel (r,c,ch)
    is text byte ((r*w+c)*ch_n+ch) mod nb by the synthesis geometry, so
    DuckDB recomputes all 64 bits from doc_id + the hex-encoded text."""
    return multimodal.media_ahash(
        multimodal.synthesize_media(_docs(spark, sf_dir))
    )


def q_media_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual media near-dup pairs (hamming(ahash) <= 3) via the
    pigeonhole band join shared with SimHash. Fully oracle-paired: the
    ahash SQL restatement feeds the same band/piece candidate join and
    bit_count(xor) verify the SimHash oracle uses. max_hamming=7 (8 bands
    of 8 bits) so the contract run has a natural pair to value-check (1 at
    sf0.01; the synthetic corpus plants no media dups — tight-threshold
    behavior is covered by planted fixtures in tests/test_multimodal.py)."""
    return multimodal.media_near_dup_pairs(
        multimodal.synthesize_media(_docs(spark, sf_dir)), max_hamming=7
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (inherent: the float32 normalization chain has no clean
    SQL equivalent), but the counting core IS oracle-checked — see the
    ``multimodal_features_hist`` twin: real decoded-pixel histogram
    'embedding' over the synthesized media table."""
    f = multimodal.feature_extract(
        multimodal.synthesize_media(_docs(spark, sf_dir)), decode=True
    )
    return f.select("doc_id", F.round(F.element_at("features", 1), 6).alias("f0"))


def q_multimodal_features_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle-paired twin of multimodal_features: the same real
    decode and binning, but integer bin counts instead of float32
    normalization. The SQL twin reproduces every count from the
    text-cycling geometry: raw byte i of the text appears
    total//nb + (i < total%nb) times in the raster, so
    hist[b] = sum over positions with byte%16==b of that multiplicity."""
    h = multimodal.pixel_histogram(
        multimodal.synthesize_media(_docs(spark, sf_dir)), dim=16
    )
    return h.select(
        "doc_id",
        F.concat_ws(",", F.transform("hist", lambda v: v.cast("string"))).alias(
            "hist_str"
        ),
    )


LLM_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_exact": q_dedup_exact,
    "dedup_exact_incremental": q_dedup_exact_incremental,
    "index_tier_stats": q_index_tier_stats,
    "maintain_index_tier": q_maintain_index_tier,
    "dedup_containment": q_dedup_containment,
    "shingle_cap_report": q_shingle_cap_report,
    "winnow_cap_report": q_winnow_cap_report,
    "dedup_containment_escalated": q_dedup_containment_escalated,
    "winnow_pairs_escalated": q_winnow_pairs_escalated,
    "winnow_pairs_bounded": q_winnow_pairs_bounded,
    "winnow_bounded_report": q_winnow_bounded_report,
    "winnow_bounded_report_estimate": q_winnow_bounded_report_estimate,
    "winnow_pairs_incremental": q_winnow_pairs_incremental,
    "jaccard_pairs_bounded": q_jaccard_pairs_bounded,
    "shingle_cap_recall_estimate": q_shingle_cap_recall_estimate,
    "winnow_cap_recall_estimate": q_winnow_cap_recall_estimate,
    "winnow_fingerprints": q_winnow_fingerprints,
    "winnow_pairs": q_winnow_pairs,
    "ngram_jaccard": q_ngram_jaccard,
    "dedup_minhash": q_dedup_minhash,
    "dedup_minhash_portable": q_dedup_minhash_portable,
    "minhash_pairs_bounded": q_minhash_pairs_bounded,
    "minhash_band_report": q_minhash_band_report,
    "dedup_minhash_incremental": q_dedup_minhash_incremental,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding": q_dedup_embedding,
    "semantic_dedup": q_semantic_dedup,
    "semantic_dedup_bounded": q_semantic_dedup_bounded,
    "ivf_drift": q_ivf_drift,
    "ivf_drift_read": q_ivf_drift_read,
    "maintain_ivf_index": q_maintain_ivf_index,
    "decontaminate": q_decontaminate,
    "similarity_bruteforce": q_similarity_bruteforce,
    "ann_recall_eval": q_ann_recall_eval,
    "ann_recall_eval_ivf": q_ann_recall_eval_ivf,
    "ann_recall_eval_ivf_read": q_ann_recall_eval_ivf_read,
    "similarity_ivf": q_similarity_ivf,
    "similarity_ivf_kmeans": q_similarity_ivf_kmeans,
    "similarity_lsh": q_similarity_lsh,
    "pq_codes": q_pq_codes,
    "knn_classify": q_knn_classify,
    "similarity_pq": q_similarity_pq,
    "similarity_ivfpq": q_similarity_ivfpq,
    "similarity_ivfpq_read": q_similarity_ivfpq_read,
    "ann_recall_eval_ivfpq": q_ann_recall_eval_ivfpq,
    "ivfpq_drift": q_ivfpq_drift,
    "maintain_ivfpq_index": q_maintain_ivfpq_index,
    "ivfpq_qerr": q_ivfpq_qerr,
    "maintain_ivfpq_qerr": q_maintain_ivfpq_qerr,
    "similarity_ivfpq_rerank": q_similarity_ivfpq_rerank,
    "ann_recall_eval_ivfpq_rerank": q_ann_recall_eval_ivfpq_rerank,
    "pq_codebooks_refined": q_pq_codebooks_refined,
    "similarity_ivfpq_refined": q_similarity_ivfpq_refined,
    "similarity_ivfpq_rerank_refined": q_similarity_ivfpq_rerank_refined,
    "ann_recall_eval_ivfpq_rerank_refined":
        q_ann_recall_eval_ivfpq_rerank_refined,
    "quantize_embeddings": q_quantize_embeddings,
    "lang_id": q_lang_id,
    "lang_confusion": q_lang_confusion,
    "quality_score": q_quality_score,
    "token_count": q_token_count,
    "doc_fingerprint": q_doc_fingerprint,
    "repetition_signals": q_repetition_signals,
    "corpus_filter": q_corpus_filter,
    "pipeline_capstone": q_pipeline_capstone,
    "source_overlap": q_source_overlap,
    "source_overlap_portable": q_source_overlap_portable,
    "upsample_corpus": q_upsample_corpus,
    "unigram_nll": q_unigram_nll,
    "ngram_nll": q_ngram_nll,
    "ngram_nll_ref": q_ngram_nll_ref,
    "classifier_score": q_classifier_score,
    "classifier_train": q_classifier_train,
    "classifier_predict": q_classifier_predict,
    "classifier_auc": q_classifier_auc,
    "classifier_calibration": q_classifier_calibration,
    "classifier_pr_sweep": q_classifier_pr_sweep,
    "corpus_filter_classifier": q_corpus_filter_classifier,
    "classifier_train_continue": q_classifier_train_continue,
    "classifier_train_bigrams": q_classifier_train_bigrams,
    "classifier_predict_bigrams": q_classifier_predict_bigrams,
    "perplexity_buckets": q_perplexity_buckets,
    "bpe_train": q_bpe_train,
    "bpe_encode": q_bpe_encode,
    "bpe_fertility": q_bpe_fertility,
    "bpe_continue": q_bpe_continue,
    "bpe_encode_incremental": q_bpe_encode_incremental,
    "pii_redact": q_pii_redact,
    "pii_report": q_pii_report,
    "filter_agreement": q_filter_agreement,
    "repetition_removal": q_repetition_removal,
    "boilerplate_removal": q_boilerplate_removal,
    "bloom_decontaminate": q_bloom_decontaminate,
    "audio_meta": q_audio_meta,
    "vocab_build": q_vocab_build,
    "url_canonicalize": q_url_canonicalize,
    "dedup_urls": q_dedup_urls,
    "filter_optout": q_filter_optout,
    "domain_stats": q_domain_stats,
    "domain_stats_psl": q_domain_stats_psl,
    "tokens_encode": q_tokens_encode,
    "vocab_coverage": q_vocab_coverage,
    "pack_tokens": q_pack_tokens,
    "audio_features": q_audio_features,
    "duplicate_passages": q_duplicate_passages,
    "dedup_substrings": q_dedup_substrings,
    "dedup_sentences": q_dedup_sentences,
    "decontaminate_sentences": q_decontaminate_sentences,
    "contamination_report_sentences": q_contamination_report_sentences,
    "contamination_report_sentences_incremental":
        q_contamination_report_sentences_incremental,
    "dedup_sentences_incremental": q_dedup_sentences_incremental,
    "decontaminate_substrings": q_decontaminate_substrings,
    "contamination_report": q_contamination_report,
    "contamination_report_incremental": q_contamination_report_incremental,
    "decontaminate_substrings_incremental": (
        q_decontaminate_substrings_incremental
    ),
    "dedup_paragraphs": q_dedup_paragraphs,
    "dedup_paragraphs_incremental": q_dedup_paragraphs_incremental,
    "dsir_select": q_dsir_select,
    "dsir_select_incremental": q_dsir_select_incremental,
    "dsir_model_divergence": q_dsir_model_divergence,
    "maintain_dsir_model": q_maintain_dsir_model,
    "maintain_bpe_model": q_maintain_bpe_model,
    "html_to_text": q_html_to_text,
    "split_sentences": q_split_sentences,
    "split_long_docs": q_split_long_docs,
    "media_dedup_exact": q_media_dedup_exact,
    "media_ahash": q_media_ahash,
    "media_near_dup": q_media_near_dup,
    "multimodal_meta": q_multimodal_meta,
    "multimodal_digest": q_multimodal_digest,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_features": q_multimodal_features,
    "multimodal_features_hist": q_multimodal_features_hist,
}

# shared SQL fragments -----------------------------------------------------

# shared winnowing CTE chain (r10): toks -> positional k-gram md5-40bit
# hashes -> packed keys -> per-doc windowed min (k=5, w=4); ``src``
# parameterizes the source CTE for planted variants (r12)
def _sql_winnow_ctes(src: str = "documents") -> str:
    return f"""toks AS (
            SELECT doc_id, string_split({_SQL_NORM}, ' ') AS tk
            FROM {src}),
        grams AS (
            SELECT doc_id, i - 1 AS pos,
                   ('0x' || substr(md5(
                        array_to_string(tk[i:least(i + 4, len(tk))], ' ')),
                        1, 10))::BIGINT AS h
            FROM toks,
                 unnest(generate_series(1, greatest(len(tk) - 4, 1))) AS t(i)),
        comb AS (
            SELECT doc_id, pos,
                   h * 1048576 + (1048575 - pos) AS c,
                   count(*) OVER (PARTITION BY doc_id) AS ng
            FROM grams),
        wmin AS (
            SELECT doc_id, pos, ng,
                   min(c) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN CURRENT ROW
                                         AND 3 FOLLOWING) AS mc
            FROM comb)"""


_SQL_WINNOW_CTES = f"""toks AS (
            SELECT doc_id, string_split({_SQL_NORM}, ' ') AS tk
            FROM documents),
        grams AS (
            SELECT doc_id, i - 1 AS pos,
                   ('0x' || substr(md5(
                        array_to_string(tk[i:least(i + 4, len(tk))], ' ')),
                        1, 10))::BIGINT AS h
            FROM toks,
                 unnest(generate_series(1, greatest(len(tk) - 4, 1))) AS t(i)),
        comb AS (
            SELECT doc_id, pos,
                   h * 1048576 + (1048575 - pos) AS c,
                   count(*) OVER (PARTITION BY doc_id) AS ng
            FROM grams),
        wmin AS (
            SELECT doc_id, pos, ng,
                   min(c) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN CURRENT ROW
                                         AND 3 FOLLOWING) AS mc
            FROM comb)"""

def _sql_shingles(src: str = "documents") -> str:
    return f"""
shingles AS (
    SELECT DISTINCT doc_id AS id, sh FROM (
        SELECT doc_id, unnest(
            list_transform(
                generate_series(1, greatest(len(toks) - 2, 1)),
                i -> array_to_string(toks[i:least(i + 2, len(toks))], ' ')
            )) AS sh
        FROM (SELECT doc_id, string_split({_SQL_NORM}, ' ') AS toks FROM {src}) t
    ) u
)
"""


_SQL_SHINGLES = _sql_shingles()

_SQL_MARKER = "len(string_split(' ' || lower(text) || ' ', ' {w} ')) - 1"


def _marker_sum(words: list[str]) -> str:
    return " + ".join(_SQL_MARKER.format(w=w) for w in words)


_S_EN = _marker_sum(textstats.LANG_MARKERS["en"])
_S_DE = _marker_sum(textstats.LANG_MARKERS["de"])
_S_ES = _marker_sum(textstats.LANG_MARKERS["es"])
_S_FR = _marker_sum(textstats.LANG_MARKERS["fr"])

_SQL_N_WS = (
    "CASE WHEN trim(text) = '' THEN 0 "
    "ELSE len(string_split_regex(trim(text), '\\s+')) END::BIGINT"
)
_SQL_STOPSUM = _marker_sum(STOPWORDS)
_SQL_PUNCT_RATIO = (
    "CASE WHEN length(text) = 0 THEN 0.0 ELSE round("
    "(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')))"
    " / length(text)::DOUBLE, 6) END"
)
_SQL_STOP_RATIO = (
    f"CASE WHEN {_SQL_N_WS} = 0 THEN 0.0 ELSE round(({_SQL_STOPSUM})"
    f" / ({_SQL_N_WS})::DOUBLE, 6) END"
)
_SQL_MEAN_WLEN = (
    f"CASE WHEN {_SQL_N_WS} = 0 THEN 0.0 ELSE round("
    f"length(regexp_replace(text, '\\s+', '', 'g')) / ({_SQL_N_WS})::DOUBLE, 6) END"
)

# the composed quality formula — single source of truth for every oracle
# that thresholds or reports the score (mirrors textstats.quality_score)
_SQL_QUALITY = f"""round(0.4 * least(length(text) / 500.0, 1.0)
                   + 0.3 * least({_SQL_STOP_RATIO} * 4, 1.0)
                   + 0.3 * greatest(0.0, 1.0 - {_SQL_PUNCT_RATIO} * 5), 6)"""

_SQL_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), x -> x[1]::DOUBLE * x[2]::DOUBLE))"
)


def _sql_cosine(a: str, b: str) -> str:
    return (
        f"{_SQL_DOT.format(a=a, b=b)} / "
        f"(sqrt({_SQL_DOT.format(a=a, b=a)}) * sqrt({_SQL_DOT.format(a=b, b=b)}))"
    )


def _sql_simhash_pairs(max_hamming: int = 3) -> str:
    """The EXACT SimHash near-dup pipeline in SQL: per-token md5-derived
    ±1 bit votes (tf-weighted — every occurrence votes), 64 majority
    bits folded into a signed two's-complement BIGINT, pigeonhole
    16-bit band candidates, bit_count(xor) hamming verify. md5 and
    two's-complement popcount are engine-portable, so the pandas-UDF
    fingerprint path is value-hash-checked end-to-end. Bit i counts
    from the MSB (exponent 63-i), matching numpy unpackbits order in
    dedup._simhash64."""
    votes = ",\n                   ".join(
        f"sum(CASE WHEN (('0x' || substr(h, {2 * (i // 8) + 1}, 2))::INT "
        f">> {7 - i % 8}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(64)
    )
    fp_terms = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN {1 << (63 - i)} ELSE 0 END)"
        for i in range(1, 64)
    )
    fp = (
        "(CASE WHEN v0 > 0 THEN (-9223372036854775807 - 1) ELSE 0 END) + "
        + fp_terms
    )
    nbands = max_hamming + 1
    width = 64 // nbands
    piece_exprs = []
    for bi in range(nbands):
        terms = " + ".join(
            f"(CASE WHEN v{63 - (bi * width + e)} > 0 THEN {1 << e} ELSE 0 END)"
            for e in range(width)
        )
        piece_exprs.append(f"({terms})")
    pieces = ", ".join(piece_exprs)
    bands = ", ".join(str(b) for b in range(nbands))
    return f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split({_SQL_NORM}, ' ')) AS t
            FROM documents),
        hx AS (SELECT doc_id, md5(t) AS h FROM toks),
        votes AS (
            SELECT doc_id,
                   {votes}
            FROM hx GROUP BY doc_id),
        fps AS (
            SELECT doc_id AS id, {fp} AS fp, [{pieces}] AS pieces
            FROM votes),
        banded AS (
            SELECT id, fp, unnest([{bands}]) AS band, unnest(pieces) AS piece
            FROM fps),
        cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                            a.fp AS fp_a, b.fp AS fp_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.piece = b.piece AND a.id < b.id)
        SELECT id_a, id_b, hamming FROM (
            SELECT id_a, id_b, bit_count(xor(fp_a, fp_b))::INT AS hamming
            FROM cand) t
        WHERE hamming <= {max_hamming}"""


def _sql_lsh_sig(vec: str, dim: int, nbits: int, seed: int) -> str:
    """The EXACT hyperplane signature the Spark plan computes, restated
    with the same float constants embedded as SQL literals (repr
    round-trips to the identical double in both parsers; sequential
    double summation is bit-identical, so the sign bits match)."""
    from hadoop_invertedindexer_spark.operators.dedup import _hyperplanes

    parts = []
    for plane in _hyperplanes(dim, nbits, seed):
        lits = ", ".join(repr(x) for x in plane)
        dot = _SQL_DOT.format(a=vec, b=f"[{lits}]")
        parts.append(f"(CASE WHEN {dot} > 0 THEN '1' ELSE '0' END)")
    return " || ".join(parts)


def _sql_ivf_kmeans(
    n_iters: int = 2,
    every: int = 50,
    k: int = 10,
    nprobe: int = 4,
    qmod: int = 100,
    dim: int = 64,
) -> str:
    """The portable k-means-refined IVF pipeline in SQL, Lloyd iterations
    unrolled as CTEs (the pagerank-oracle pattern). Per iteration:
    nearest-centroid assignment (rn=1, same tie-break as ivf_assign),
    exact integer sums of floor(x*2^20) per (cid, pos) reassembled with
    list(... ORDER BY i), empty centroids keeping their previous vector
    via LEFT JOIN + coalesce — lockstep with
    similarity.centroids_kmeans(portable=True). The final probe/top-k
    mirrors the similarity_ivf oracle with the refined centroids."""
    ctes = [
        f"""cents0 AS (
            SELECT vec_id AS cid, list_transform(embedding, x -> x::DOUBLE)
                       AS cvec
            FROM embeddings WHERE vec_id % {every} = 0)""",
        f"idx AS (SELECT unnest(range(1, {dim + 1})) AS i)",
    ]
    for it in range(1, n_iters + 1):
        prev = f"cents{it - 1}"
        ctes += [
            f"""assign{it} AS (
            SELECT id, emb, cid FROM (
                SELECT e.vec_id AS id, e.embedding AS emb, c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_sql_cosine('e.embedding', 'c.cvec')} DESC,
                                    c.cid) AS rn
                FROM embeddings e CROSS JOIN {prev} c) t
            WHERE rn = 1)""",
            f"""sums{it} AS (
            SELECT cid, i, sum(floor(emb[i]::DOUBLE * 1048576.0)::BIGINT) AS sx
            FROM assign{it} CROSS JOIN idx GROUP BY cid, i)""",
            f"""newc{it} AS (
            SELECT cid, list_transform(list(sx ORDER BY i), x -> x::DOUBLE)
                       AS svec
            FROM sums{it} GROUP BY cid)""",
            f"""cents{it} AS (
            SELECT p.cid, coalesce(n.svec, p.cvec) AS cvec
            FROM {prev} p LEFT JOIN newc{it} n USING (cid))""",
        ]
    final_cents = f"cents{n_iters}"
    return f"""
        WITH {", ".join(ctes)},
        assigned AS (
            SELECT id, v, nrm, cid FROM (
                SELECT e.vec_id AS id, e.embedding AS v,
                       sqrt({_SQL_DOT.format(a='e.embedding', b='e.embedding')})
                           AS nrm,
                       c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_sql_cosine('e.embedding', 'c.cvec')} DESC,
                                    c.cid) AS rn
                FROM embeddings e CROSS JOIN {final_cents} c) t
            WHERE rn = 1),
        probes AS (
            SELECT qid, qv, qnrm, cid FROM (
                SELECT e.vec_id AS qid, e.embedding AS qv,
                       sqrt({_SQL_DOT.format(a='e.embedding', b='e.embedding')})
                           AS qnrm,
                       c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_sql_cosine('e.embedding', 'c.cvec')} DESC,
                                    c.cid) AS rn
                FROM embeddings e CROSS JOIN {final_cents} c
                WHERE e.vec_id % {qmod} = 0) t
            WHERE rn <= {nprobe}),
        scored AS (
            SELECT p.qid, a.id AS vec_id,
                   round({_SQL_DOT.format(a='p.qv', b='a.v')}
                         / (p.qnrm * a.nrm), 6) AS cosine
            FROM probes p JOIN assigned a USING (cid)
            WHERE p.qid <> a.id)
        SELECT qid, vec_id, cosine, rank FROM (
            SELECT qid, vec_id, cosine,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY cosine DESC, vec_id)::BIGINT
                       AS rank
            FROM scored) t
        WHERE rank <= {k}"""


def _sql_bounded_cents_ctes(
    k: int = 64,
    sample: int = 256,
    n_iters: int = 2,
    dim: int = 64,
    src: str = "embeddings",
) -> tuple[str, str]:
    """The bounded-K centroid construction in SQL (lockstep with
    similarity.bounded_centroids_refined, portable=True): md5-ordered
    sample, first-k seeds, unrolled integer-exact Lloyd iterations
    (floor(x·2^20) sums, empty centroids keep their previous vector).
    Returns (ctes, final_cents_name) — shared by the
    semantic_dedup_bounded, ivf_drift, and maintain_ivf_index oracles
    (the last passes ``src`` to build centroids from a SUBSET, the
    drifted-index construction)."""
    mk = "('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT"
    ctes = [
        f"""samp AS (
            SELECT vec_id, embedding FROM {src}
            ORDER BY {mk}, vec_id LIMIT {sample})""",
        f"""cents0 AS (
            SELECT vec_id AS cid,
                   list_transform(embedding, x -> x::DOUBLE) AS cvec
            FROM samp ORDER BY {mk}, vec_id LIMIT {k})""",
        f"idx AS (SELECT unnest(range(1, {dim + 1})) AS i)",
    ]
    for it in range(1, n_iters + 1):
        prev = f"cents{it - 1}"
        ctes += [
            f"""assign{it} AS (
            SELECT id, emb, cid FROM (
                SELECT s.vec_id AS id, s.embedding AS emb, c.cid,
                       row_number() OVER (
                           PARTITION BY s.vec_id
                           ORDER BY {_sql_cosine('s.embedding', 'c.cvec')} DESC,
                                    c.cid) AS rn
                FROM samp s CROSS JOIN {prev} c) t
            WHERE rn = 1)""",
            f"""sums{it} AS (
            SELECT cid, i, sum(floor(emb[i]::DOUBLE * 1048576.0)::BIGINT) AS sx
            FROM assign{it} CROSS JOIN idx GROUP BY cid, i)""",
            f"""newc{it} AS (
            SELECT cid, list_transform(list(sx ORDER BY i), x -> x::DOUBLE)
                       AS svec
            FROM sums{it} GROUP BY cid)""",
            f"""cents{it} AS (
            SELECT p.cid, coalesce(n.svec, p.cvec) AS cvec
            FROM {prev} p LEFT JOIN newc{it} n USING (cid))""",
        ]
    return ", ".join(ctes), f"cents{n_iters}"


def _sql_semantic_dedup_bounded(
    k: int = 64,
    sample: int = 256,
    n_iters: int = 2,
    threshold: float = 0.4,
    dim: int = 64,
) -> str:
    """The bounded-K semantic-dedup default in SQL (VERDICT r6 item 1
    twin): the shared bounded-centroid CTEs, then the assignment +
    round(6) cosines + keep-the-marginal drop rule shared verbatim with
    the `semantic_dedup` oracle."""
    cents_ctes, final_cents = _sql_bounded_cents_ctes(k, sample, n_iters, dim)
    return f"""
        WITH {cents_ctes},
        assigned AS (
            SELECT id, v, cid, round(sim, 6) AS cent_cos,
                   sqrt({_SQL_DOT.format(a='v', b='v')}) AS nrm
            FROM (
                SELECT e.vec_id AS id, e.embedding AS v, c.cid,
                       {_sql_cosine('e.embedding', 'c.cvec')} AS sim,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_sql_cosine('e.embedding', 'c.cvec')} DESC,
                                    c.cid) AS rn
                FROM embeddings e CROSS JOIN {final_cents} c) t
            WHERE rn = 1),
        dropped AS (
            SELECT DISTINCT a.id FROM assigned a JOIN assigned b
              ON a.cid = b.cid AND a.id <> b.id
            WHERE round({_SQL_DOT.format(a='a.v', b='b.v')}
                        / (a.nrm * b.nrm), 6) >= {threshold}
              AND (b.cent_cos < a.cent_cos
                   OR (b.cent_cos = a.cent_cos AND b.id < a.id)))
        SELECT a.id AS vec_id, a.cid, a.cent_cos,
               (d.id IS NULL) AS is_kept
        FROM assigned a LEFT JOIN dropped d ON a.id = d.id"""


def _sql_minhash_banded_ctes(src: str = "documents") -> str:
    """shingles → portable md5-60bit signatures → 16 raw-string band
    keys — the shared head of the minhash pair oracles and the
    minhash_band_report oracle (keep in lockstep with
    dedup.minhash_signatures / dedup._banded_signatures,
    portable=True). ``src`` lets a planted-corpus oracle reuse the
    chain (minhash_pairs_bounded's hub-clique plant)."""
    return f"""{_sql_shingles(src)},
        sigs AS (
            SELECT id, [{", ".join(
                f"min(('0x' || substr(md5('{i}|' || sh), 1, 15))::BIGINT)"
                for i in range(64))}] AS sig
            FROM shingles GROUP BY id),
        banded AS (
            SELECT id, sig,
                   unnest([{", ".join(str(b) for b in range(16))}]) AS band,
                   unnest([{", ".join(
                       f"array_to_string(sig[{4 * b + 1}:{4 * b + 4}], ',')"
                       for b in range(16))}]) AS bh
            FROM sigs)"""


def _sql_minhash_portable(cand_filter: str = "") -> str:
    """The portable (md5-60bit) MinHash-LSH pipeline in SQL: the shared
    banded CTEs, distinct candidate pairs, positional-equality
    estimate. ``cand_filter`` is appended to the candidate join condition
    — the incremental twin restricts to pairs touching the batch ids."""
    return f"""
        WITH {_sql_minhash_banded_ctes()},
        cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                            a.sig AS sa, b.sig AS sb
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bh = b.bh AND a.id < b.id{cand_filter})
        SELECT id_a, id_b, est_jaccard FROM (
            SELECT id_a, id_b,
                   round(list_sum(list_transform(list_zip(sa, sb),
                                                 x -> (x[1] = x[2])::INT))
                         / 64.0, 6) AS est_jaccard
            FROM cand) t
        WHERE est_jaccard >= 0.5"""


# geometry of the synthesized SBM1/SVD1 media payloads — the SQL
# restatement of media_codec.synth_params(doc_id, octet_length(text))
_SQL_MEDIA_GEOM = """
    SELECT doc_id,
           8 + octet_length(encode(text)) % 24 AS w,
           8 + (doc_id * 7) % 24 AS h,
           1 + 2 * (doc_id % 2) AS c,
           CASE WHEN doc_id % 5 = 0 THEN 2 + doc_id % 3 ELSE 1 END AS frames
    FROM documents
"""


def _sql_media_ahash_ctes() -> str:
    """CTE chain computing the perceptual average-hash inputs from the
    codec's text-cycling geometry: frame-0 pixel (r, col, ch) is text
    byte ((r*w+col)*c+ch) mod nb (media_codec.synth_payload), extracted
    from the hex encoding (2 chars/byte), channel-summed into the 64
    floor-scaled 8x8 samples of media_codec.resize_nearest's index
    arithmetic. Ends with gsum(doc_id, gs BIGINT[64], s) — keep in
    lockstep with multimodal.media_ahash."""
    flat = "((((k // 8) * h) // 8) * w + (((k % 8) * w) // 8)) * c + ch"
    return f"""
        geom AS ({_SQL_MEDIA_GEOM}),
        rast AS (
            SELECT g.doc_id, g.w, g.h, g.c,
                   CASE WHEN octet_length(encode(d.text)) = 0 THEN '00'
                        ELSE hex(encode(d.text)) END AS hx,
                   greatest(octet_length(encode(d.text)), 1) AS nb
            FROM geom g JOIN documents d USING (doc_id)),
        gvals AS (
            SELECT doc_id,
                   list_transform(range(0, 64), k ->
                       list_sum(list_transform(range(0, c), ch ->
                           ('0x' || substr(hx,
                               2 * (({flat}) % nb) + 1, 2))::BIGINT)))
                       AS gs
            FROM rast),
        gsum AS (SELECT doc_id, gs, list_sum(gs) AS s FROM gvals)"""


def _sql_media_ahash_fp() -> str:
    """The signed two's-complement 64-bit fold of the threshold bits —
    bit k (row-major, MSB first) set iff 64*gs[k+1] > s."""
    terms = " + ".join(
        f"(CASE WHEN 64 * gs[{k + 1}] > s THEN {1 << (63 - k)} ELSE 0 END)"
        for k in range(1, 64)
    )
    return (
        "(CASE WHEN 64 * gs[1] > s THEN (-9223372036854775807 - 1) ELSE 0 END) + "
        + terms
    )


def _sql_media_near_dup(max_hamming: int = 3) -> str:
    """Perceptual near-dup pairs in SQL: the ahash CTEs + the same
    pigeonhole band candidates and bit_count(xor) verify as the SimHash
    oracle (bands built from the threshold bits directly — BIGINT shifts
    on negative fps aren't portable)."""
    nbands = max_hamming + 1
    width = 64 // nbands
    piece_exprs = []
    for bi in range(nbands):
        terms = " + ".join(
            f"(CASE WHEN 64 * gs[{64 - (bi * width + e)}] > s "
            f"THEN {1 << e} ELSE 0 END)"
            for e in range(width)
        )
        piece_exprs.append(f"({terms})")
    pieces = ", ".join(piece_exprs)
    bands = ", ".join(str(b) for b in range(nbands))
    return f"""
        WITH {_sql_media_ahash_ctes()},
        fps AS (
            SELECT doc_id AS id, {_sql_media_ahash_fp()} AS fp,
                   [{pieces}] AS pieces
            FROM gsum),
        banded AS (
            SELECT id, fp, unnest([{bands}]) AS band, unnest(pieces) AS piece
            FROM fps),
        cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                            a.fp AS fp_a, b.fp AS fp_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.piece = b.piece AND a.id < b.id)
        SELECT id_a, id_b, hamming FROM (
            SELECT id_a, id_b, bit_count(xor(fp_a, fp_b))::INT AS hamming
            FROM cand) t
        WHERE hamming <= {max_hamming}"""

_SQL_PQ_SQDIST = (
    "list_sum(list_transform(list_zip({a}, {b}),"
    " p -> (p[1] - p[2]) * (p[1] - p[2])))"
)


def _sql_pq_ctes(refined: bool = False) -> str:
    """The EXACT product-quantization pipeline in SQL (lockstep with
    similarity.pq_codebooks/pq_encode at m=8, ksub=16, dim=64): coords
    quantize as floor(x*2^10) bigints, codebook s is the s-th subvector
    slice of the first 16 vectors by id, assignment is integer squared-L2
    argmin with ties to the lowest codeword — every intermediate is exact
    integer arithmetic, so codes and ADC sums are bit-identical across
    engines.

    ``refined=True`` swaps the bootstrap ``cb`` for the bounded
    per-subspace k-means refinement (lockstep with
    similarity.pq_codebooks_refined at sample_mult=16, refine_iters=2):
    a 256-vector md5-ordered sample, the same first-16 seeds, two
    unrolled Lloyd iterations with floor-of-mean codewords and
    empty-codeword carry-over — the downstream dists/enc CTEs are
    byte-identical, only the cb definition changes."""
    d = _SQL_PQ_SQDIST.format(a="b.sub", b="cb.cq")
    if refined:
        iters = []
        for t in (1, 2):
            prev = f"cb{t - 1}"
            iters.append(f"""
        assign{t} AS (
            SELECT vec_id, s, sub, c FROM (
                SELECT b.vec_id, b.s, b.sub, cb.c,
                       row_number() OVER (PARTITION BY b.vec_id, b.s
                                          ORDER BY {d}, cb.c) AS rn
                FROM ssubs b JOIN {prev} cb USING (s)) z
            WHERE rn = 1),
        sums{t} AS (
            SELECT s, c, i, sum(sub[i])::BIGINT AS sx, count(*) AS n
            FROM assign{t}, sidx GROUP BY s, c, i),
        newc{t} AS (
            SELECT s, c, list(floor(sx / n)::BIGINT ORDER BY i) AS cq
            FROM sums{t} GROUP BY s, c),
        cb{t} AS (
            SELECT p.s, p.c, coalesce(n.cq, p.cq) AS cq
            FROM {prev} p LEFT JOIN newc{t} n
              ON p.s = n.s AND p.c = n.c)""")
        cb_chain = f"""
        sampq AS (
            SELECT vec_id, qx FROM qx
            ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT,
                     vec_id
            LIMIT 256),
        train AS (
            SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS c, qx
            FROM (SELECT vec_id, qx FROM sampq ORDER BY vec_id LIMIT 16) t),
        ss AS (SELECT unnest(range(8))::INT AS s),
        sidx AS (SELECT unnest(range(1, 9)) AS i),
        cb0 AS (
            SELECT s, c, list_slice(qx, s*8 + 1, s*8 + 8) AS cq
            FROM train, ss),
        ssubs AS (
            SELECT vec_id, s, list_slice(qx, s*8 + 1, s*8 + 8) AS sub
            FROM sampq, ss),{",".join(iters)},
        cb AS (SELECT s, c, cq FROM cb2)"""
    else:
        cb_chain = """
        train AS (
            SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS c, qx
            FROM (SELECT vec_id, qx FROM qx ORDER BY vec_id LIMIT 16) t),
        ss AS (SELECT unnest(range(8))::INT AS s),
        cb AS (
            SELECT s, c, list_slice(qx, s*8 + 1, s*8 + 8) AS cq
            FROM train, ss)"""
    return f"""
        qx AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> floor(x::DOUBLE * 1024.0)::BIGINT) AS qx
            FROM embeddings),{cb_chain},
        subs AS (
            SELECT vec_id, s, list_slice(qx, s*8 + 1, s*8 + 8) AS sub
            FROM qx, ss),
        dists AS (
            SELECT vec_id, s, c,
                   {_SQL_PQ_SQDIST.format(a="sub", b="cq")}::BIGINT AS d
            FROM subs JOIN cb USING (s)),
        enc AS (
            SELECT vec_id, s, c FROM (
                SELECT vec_id, s, c,
                       row_number() OVER (PARTITION BY vec_id, s
                                          ORDER BY d, c) AS rn
                FROM dists) r
            WHERE rn = 1)"""


def _sql_ivfpq_topk(k: int, refined: bool = False) -> str:
    """The IVF-PQ composite in SQL, parameterized on the output depth
    (lockstep with ivfpq_adc_topk at nprobe=4, m=8, ksub=16, dim=64 —
    every constant shared with the similarity_ivf and _sql_pq_ctes
    chains it composes). ``refined`` selects the k-means codebooks."""
    return f"""
        WITH {_sql_pq_ctes(refined)},
        cents AS (
            SELECT vec_id AS cid, embedding AS cvec
            FROM embeddings WHERE vec_id % 50 = 0),
        assigned AS (
            SELECT id, cid FROM (
                SELECT e.vec_id AS id, c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_sql_cosine('e.embedding', 'c.cvec')} DESC,
                                    c.cid) AS rn
                FROM embeddings e CROSS JOIN cents c) t
            WHERE rn = 1),
        probes AS (
            SELECT qid, cid FROM (
                SELECT e.vec_id AS qid, c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_sql_cosine('e.embedding', 'c.cvec')} DESC,
                                    c.cid) AS rn
                FROM embeddings e CROSS JOIN cents c
                WHERE e.vec_id % 100 = 0) t
            WHERE rn <= 4),
        qtab AS (
            SELECT vec_id AS qid, s, c, d AS qdist
            FROM dists WHERE vec_id % 100 = 0),
        adist AS (
            SELECT q.qid, e.vec_id, sum(q.qdist)::BIGINT AS adist
            FROM enc e
            JOIN assigned a ON a.id = e.vec_id
            JOIN probes p ON p.cid = a.cid
            JOIN qtab q ON q.qid = p.qid AND q.s = e.s AND q.c = e.c
            WHERE q.qid <> e.vec_id
            GROUP BY q.qid, e.vec_id)
        SELECT qid, vec_id, adist, rank FROM (
            SELECT qid, vec_id, adist,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY adist, vec_id)::BIGINT AS rank
            FROM adist) t
        WHERE rank <= {k}"""


LLM_ORACLE_SQL: dict[str, str] = {
    "dedup_exact": f"""
        SELECT min(doc_id) AS keep_id, count(*) AS n_dups
        FROM documents GROUP BY {_SQL_NORM}""",
    # persisted-index exact dedup (r10): the incremental path over the
    # planted corpus/batch split equals the direct chain restricted to
    # batch-side keepers — a group with any published (< 250) member
    # has a corpus keeper and vanishes; batch-fresh groups' full counts
    # ARE their batch counts. CASE order mirrors _exact_inc_planted.
    "dedup_exact_incremental": f"""
        WITH planted AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0
                        THEN 'crossdup ' || (doc_id % 40)
                        WHEN doc_id >= 250 AND doc_id % 7 = 0
                        THEN 'freshdup ' || (doc_id % 21)
                        ELSE text END AS text
            FROM documents)
        SELECT min(doc_id) AS keep_id, count(*) AS n_dups
        FROM planted GROUP BY {_SQL_NORM}
        HAVING min(doc_id) >= 250""",
    # index-tier health report (r11): build on doc_id < 250, the
    # >= 250 batch appended twice — stored-row and distinct counts
    # restate as distinct-norm counting (sha2 keys injective on norms);
    # keep in lockstep with q_index_tier_stats' construction
    "index_tier_stats": f"""
        WITH n AS (SELECT doc_id, {_SQL_NORM} AS nm FROM documents),
        cb AS (
            SELECT count(DISTINCT nm) AS k FROM n WHERE doc_id < 250),
        bb AS (
            SELECT count(DISTINCT nm) AS k FROM n WHERE doc_id >= 250),
        al AS (SELECT count(DISTINCT nm) AS k FROM n)
        SELECT 'hashes' AS tier_table,
               (cb.k + 2 * bb.k)::BIGINT AS n_rows,
               al.k::BIGINT AS n_distinct,
               (cb.k + 2 * bb.k - al.k)::BIGINT AS dup_rows,
               ((cb.k + 2 * bb.k - al.k) * 1000
                // (cb.k + 2 * bb.k))::BIGINT AS dup_mils
        FROM cb, bb, al""",
    # threshold-driven auto-compaction report (r12): the tier-stats
    # oracle plus the trigger decision itself stated in SQL — the
    # rotation runs iff dup_mils > 100, reclaiming exactly dup_rows;
    # keep in lockstep with q_maintain_index_tier's construction
    "maintain_index_tier": f"""
        WITH n AS (SELECT doc_id, {_SQL_NORM} AS nm FROM documents),
        cb AS (
            SELECT count(DISTINCT nm) AS k FROM n WHERE doc_id < 250),
        bb AS (
            SELECT count(DISTINCT nm) AS k FROM n WHERE doc_id >= 250),
        al AS (SELECT count(DISTINCT nm) AS k FROM n),
        s AS (
            SELECT 'hashes' AS tier_table,
                   (cb.k + 2 * bb.k)::BIGINT AS n_rows,
                   al.k::BIGINT AS n_distinct,
                   (cb.k + 2 * bb.k - al.k)::BIGINT AS dup_rows,
                   ((cb.k + 2 * bb.k - al.k) * 1000
                    // (cb.k + 2 * bb.k))::BIGINT AS dup_mils
            FROM cb, bb, al)
        SELECT tier_table, n_rows, n_distinct, dup_rows, dup_mils,
               dup_mils > 100 AS compacted,
               (CASE WHEN dup_mils > 100 THEN dup_rows
                     ELSE 0 END)::BIGINT AS reclaimed_rows
        FROM s""",
    # winnowing (r10): md5-40bit k-gram hashes packed with the inverted
    # position, one windowed min per w-window = rightmost-min selection,
    # arithmetic decode — keep in lockstep with dedup.winnow_fingerprints
    "winnow_fingerprints": f"""
        WITH {_SQL_WINNOW_CTES}
        SELECT DISTINCT doc_id,
               (1048575 - (mc % 1048576))::BIGINT AS pos,
               (mc // 1048576)::BIGINT AS fp
        FROM wmin WHERE pos <= greatest(ng - 4, 0)""",
    # winnow-based near-dup pairs (r10): the selected fingerprint sets,
    # df-capped, self-joined — keep in lockstep with
    # dedup.winnow_overlap_pairs
    "winnow_pairs": f"""
        WITH {_SQL_WINNOW_CTES},
        sel AS (
            SELECT DISTINCT doc_id AS id,
                   (mc // 1048576)::BIGINT AS fp
            FROM wmin WHERE pos <= greatest(ng - 4, 0)),
        kept AS (
            SELECT s.id, s.fp FROM sel s
            JOIN (SELECT fp FROM sel GROUP BY fp
                  HAVING count(*) <= 100) c
              ON s.fp = c.fp)
        SELECT id_a, id_b, n_shared FROM (
            SELECT a.id AS id_a, b.id AS id_b,
                   count(*)::BIGINT AS n_shared
            FROM kept a JOIN kept b
              ON a.fp = b.fp AND a.id < b.id
            GROUP BY a.id, b.id) t
        WHERE n_shared >= 2""",
    # directional containment (r10): the jaccard machinery over the
    # planted subset/superset texts, both directions unioned before the
    # threshold — keep in lockstep with dedup.containment_pairs
    "dedup_containment": f"""
        WITH src AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 41 = 0
                        THEN 'Contain alpha bravo charlie delta echo'
                        WHEN doc_id % 41 = 1
                        THEN 'Contain alpha bravo charlie delta echo'
                             || ' foxtrot golf hotel india juliet kilo'
                             || ' lima'
                        ELSE text END AS text
            FROM documents),
        shingles AS (
            SELECT DISTINCT doc_id AS id, sh FROM (
                SELECT doc_id, unnest(
                    list_transform(
                        generate_series(1, greatest(len(toks) - 2, 1)),
                        i -> array_to_string(
                                 toks[i:least(i + 2, len(toks))], ' ')
                    )) AS sh
                FROM (SELECT doc_id, string_split({_SQL_NORM}, ' ')
                          AS toks FROM src) t
            ) u),
        sizes AS (SELECT id, count(*) AS sz FROM shingles GROUP BY id),
        kept AS (
            SELECT s.id, s.sh FROM shingles s
            JOIN (SELECT sh FROM shingles GROUP BY sh
                  HAVING count(*) <= 100) c
              ON s.sh = c.sh),
        inter AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
            FROM kept a JOIN kept b ON a.sh = b.sh AND a.id < b.id
            GROUP BY a.id, b.id),
        scored AS (
            SELECT id_a, id_b, i, sa.sz AS sz_a, sb.sz AS sz_b
            FROM inter
            JOIN sizes sa ON sa.id = id_a
            JOIN sizes sb ON sb.id = id_b),
        dirs AS (
            SELECT id_a AS id_sub, id_b AS id_super,
                   round(i / sz_a::DOUBLE, 6) AS containment
            FROM scored
            UNION ALL
            SELECT id_b, id_a, round(i / sz_b::DOUBLE, 6)
            FROM scored)
        SELECT id_sub, id_super, containment
        FROM dirs WHERE containment >= 0.8""",
    "ngram_jaccard": f"""
        WITH {_SQL_SHINGLES},
        sizes AS (SELECT id, count(*) AS sz FROM shingles GROUP BY id),
        kept AS (
            SELECT s.id, s.sh FROM shingles s
            JOIN (SELECT sh FROM shingles GROUP BY sh HAVING count(*) <= 100) c
              ON s.sh = c.sh
        ),
        inter AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
            FROM kept a JOIN kept b ON a.sh = b.sh AND a.id < b.id
            GROUP BY a.id, b.id
        )
        SELECT id_a, id_b,
               round(i / (sa.sz + sb.sz - i)::DOUBLE, 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE i / (sa.sz + sb.sz - i)::DOUBLE >= 0.6""",
    "similarity_bruteforce": f"""
        SELECT qid, vec_id, cosine, rank FROM (
            SELECT q.vec_id AS qid, c.vec_id AS vec_id,
                   round({_sql_cosine('q.embedding', 'c.embedding')}, 6) AS cosine,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round({_sql_cosine('q.embedding', 'c.embedding')}, 6)
                                DESC, c.vec_id)::BIGINT AS rank
            FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
            WHERE q.vec_id % 100 = 0
        ) t WHERE rank <= 10""",
    # content-defined chunk boilerplate removal: boundaries, chunk ids,
    # df counts, and reassembly restated verbatim (lockstep with
    # dedup.content_chunks/boilerplate_removal at modulus=8, max_df=30)
    "boilerplate_removal": f"""
        WITH planted AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0
                        THEN text || ' {_BOILER_PHRASE}'
                        ELSE text END AS t
            FROM documents),
        tok AS (
            SELECT doc_id,
                   unnest(string_split(t, ' ')) AS tok,
                   unnest(range(1, len(string_split(t, ' ')) + 1)) AS ord
            FROM planted),
        cid AS (
            SELECT doc_id, ord, tok,
                   sum(CASE WHEN ('0x' || substr(md5(tok), 1, 2))::INT % 8 = 0
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY ord) AS chunk_id
            FROM tok),
        chunks AS (
            SELECT doc_id, chunk_id, min(ord) AS start_ord,
                   string_agg(tok, ' ' ORDER BY ord) AS chunk
            FROM cid GROUP BY doc_id, chunk_id),
        freq AS (
            SELECT md5(chunk) AS h, count(DISTINCT doc_id) AS df
            FROM chunks GROUP BY md5(chunk)),
        flagged AS (
            SELECT c.doc_id, c.start_ord, c.chunk,
                   CASE WHEN f.df >= 30 THEN 1 ELSE 0 END AS dropped
            FROM chunks c JOIN freq f ON md5(c.chunk) = f.h)
        SELECT doc_id,
               count(*)::BIGINT AS n_chunks,
               sum(dropped)::BIGINT AS n_dropped,
               coalesce(string_agg(CASE WHEN dropped = 0 THEN chunk END,
                                   ' ' ORDER BY start_ord), '') AS clean_text
        FROM flagged GROUP BY doc_id""",
    # planted-URL canonicalization: the oracle rebuilds every component
    # from the doc_id arithmetic (hosts lowercased, utm_*/ref params
    # scrubbed leaving q=, fragment never reassembled) — lockstep with
    # functions/urls.py + _planted_url
    "filter_optout": """
        SELECT doc_id,
               'https://docs.spark.test/p/' || doc_id
                   || '?utm_source=feed&ref=' || (doc_id % 7)
                   || '&q=' || (doc_id % 5) || '#frag' AS url
        FROM documents WHERE doc_id % 3 = 1""",
    "dedup_urls": """
        WITH u AS (
            SELECT doc_id,
                   'https://'
                   || CASE doc_id % 3 WHEN 0 THEN 'www.example.com'
                                      WHEN 1 THEN 'docs.spark.test'
                                      ELSE 'data.example.com' END
                   || '/p/' || (doc_id % 40)
                   || '?q=' || (doc_id % 5) AS canon_url
            FROM documents)
        SELECT canon_url, min(doc_id) AS keep_id,
               count(*)::BIGINT AS n_dups
        FROM u GROUP BY canon_url""",
    "url_canonicalize": """
        WITH u AS (
            SELECT doc_id,
                   CASE doc_id % 3 WHEN 0 THEN 'www.Example.COM'
                                   WHEN 1 THEN 'docs.spark.test'
                                   ELSE 'Data.Example.com' END AS rawhost,
                   CASE doc_id % 3 WHEN 0 THEN 'www.example.com'
                                   WHEN 1 THEN 'docs.spark.test'
                                   ELSE 'data.example.com' END AS host
            FROM documents)
        SELECT doc_id,
               'https://' || rawhost || '/p/' || doc_id
                   || '?utm_source=feed&ref=' || (doc_id % 7)
                   || '&q=' || (doc_id % 5) || '#frag' AS url,
               'https://' || host || '/p/' || doc_id
                   || '?q=' || (doc_id % 5) AS canon_url,
               host,
               CASE doc_id % 3 WHEN 1 THEN 'spark.test'
                               ELSE 'example.com' END AS domain
        FROM u""",
    "domain_stats": """
        SELECT CASE doc_id % 3 WHEN 1 THEN 'spark.test'
                               ELSE 'example.com' END AS domain,
               count(*)::BIGINT AS n_docs,
               count(DISTINCT 'https://'
                   || CASE doc_id % 3 WHEN 0 THEN 'www.example.com'
                                      WHEN 1 THEN 'docs.spark.test'
                                      ELSE 'data.example.com' END
                   || '/p/' || doc_id || '?q=' || (doc_id % 5))::BIGINT
                   AS n_distinct_urls
        FROM documents GROUP BY 1""",
    # PSL twin: the oracle restates the suffix-join rule on the planted
    # host geometry — co.uk/com.au hosts yield THREE-label domains, the
    # plain .com host the two-label default, the bare suffix itself, and
    # the deep chain collapses to label+suffix (a.b.data.gov.uk ->
    # data.gov.uk) — exactly where the heuristic and the PSL differ
    "domain_stats_psl": """
        SELECT CASE doc_id % 8
                   WHEN 0 THEN 'bbc.co.uk'
                   WHEN 1 THEN 'example.com.au'
                   WHEN 2 THEN 'example.com'
                   WHEN 3 THEN 'co.uk'
                   WHEN 4 THEN 'data.gov.uk'
                   WHEN 5 THEN 'school.act.edu.au'
                   WHEN 6 THEN 'shop.foo.ck'
                   ELSE 'www.ck' END AS domain,
               count(*)::BIGINT AS n_docs,
               count(DISTINCT CASE doc_id % 8
                   WHEN 0 THEN 'News.BBC.co.uk'
                   WHEN 1 THEN 'shop.Example.COM.au'
                   WHEN 2 THEN 'www.Example.COM'
                   WHEN 3 THEN 'co.uk'
                   WHEN 4 THEN 'a.b.data.gov.uk'
                   WHEN 5 THEN 'www.School.ACT.edu.au'
                   WHEN 6 THEN 'WWW.Shop.Foo.CK'
                   ELSE 'sub.WWW.ck' END)::BIGINT AS n_hosts
        FROM documents GROUP BY 1""",
    # word vocab: same normalization as the dedup family, rank by
    # (count desc, token asc) — a total order, so ids agree bit-for-bit
    "vocab_build": f"""
        WITH tok AS (
            SELECT unnest(string_split({_SQL_NORM}, ' ')) AS token
            FROM documents),
        counts AS (
            SELECT token, count(*)::BIGINT AS n_occurrences FROM tok
            WHERE token <> '' GROUP BY token)
        SELECT token, token_id, n_occurrences FROM (
            SELECT token, n_occurrences,
                   row_number() OVER (ORDER BY n_occurrences DESC, token)::INT
                       AS token_id
            FROM counts) t
        WHERE token_id <= 1024""",
    # encode twin: 32-entry vocab rebuilt inline, OOV -> 0, sequence
    # reassembled in position order (two equal-length unnests align
    # positionally in DuckDB — same idiom as the boilerplate oracle)
    "tokens_encode": f"""
        WITH base AS (SELECT doc_id, {_SQL_NORM} AS norm FROM documents),
        tok AS (
            SELECT doc_id,
                   unnest(string_split(norm, ' ')) AS token,
                   unnest(range(1, len(string_split(norm, ' ')) + 1)) AS pos
            FROM base),
        tok2 AS (SELECT * FROM tok WHERE token <> ''),
        counts AS (SELECT token, count(*) AS c FROM tok2 GROUP BY token),
        vocab AS (
            SELECT token, token_id FROM (
                SELECT token,
                       row_number() OVER (ORDER BY c DESC, token) AS token_id
                FROM counts) v
            WHERE token_id <= 32)
        SELECT doc_id, count(*)::BIGINT AS n_tokens,
               sum(CASE WHEN v.token_id IS NULL THEN 1 ELSE 0 END)::BIGINT
                   AS n_oov,
               string_agg(coalesce(v.token_id, 0)::VARCHAR, ','
                          ORDER BY pos) AS ids_str
        FROM tok2 t LEFT JOIN vocab v USING (token)
        GROUP BY doc_id""",
    # per-lang coverage report (r10): the tokens_encode vocab CTE +
    # a lang rollup — keep in lockstep with vocab.vocab_coverage
    "vocab_coverage": f"""
        WITH base AS (
            SELECT doc_id, lang, {_SQL_NORM} AS norm FROM documents),
        tok AS (
            SELECT lang, unnest(string_split(norm, ' ')) AS token
            FROM base),
        tok2 AS (SELECT * FROM tok WHERE token <> ''),
        counts AS (
            SELECT token, count(*) AS c FROM tok2 GROUP BY token),
        vocab AS (
            SELECT token FROM (
                SELECT token,
                       row_number() OVER (ORDER BY c DESC, token)
                           AS token_id
                FROM counts) v
            WHERE token_id <= 32)
        SELECT lang, count(*)::BIGINT AS n_tokens,
               sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::BIGINT
                   AS n_oov,
               (sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) * 1000
                // count(*))::BIGINT AS oov_mils,
               ((count(*) - sum(CASE WHEN v.token IS NULL
                                     THEN 1 ELSE 0 END)) * 1000
                // count(*))::BIGINT AS coverage_mils
        FROM tok2 t LEFT JOIN vocab v USING (token)
        GROUP BY lang""",
    # GPT-style packing twin: same 32-entry vocab mapping as
    # tokens_encode; per-doc DENSE local index (row_number over pos —
    # tok2's pos has gaps where empty tokens were filtered), prefix-sum
    # offsets in doc order (the oracle's single window ≡ the operator's
    # two-level bucketed prefix by associativity), one -1 EOS per doc at
    # offset + len - 1, blocks of 128
    "pack_tokens": f"""
        WITH base AS (SELECT doc_id, {_SQL_NORM} AS norm FROM documents),
        tok AS (
            SELECT doc_id,
                   unnest(string_split(norm, ' ')) AS token,
                   unnest(range(1, len(string_split(norm, ' ')) + 1)) AS pos
            FROM base),
        tok2 AS (SELECT * FROM tok WHERE token <> ''),
        counts AS (SELECT token, count(*) AS c FROM tok2 GROUP BY token),
        vocab AS (
            SELECT token, token_id FROM (
                SELECT token,
                       row_number() OVER (ORDER BY c DESC, token) AS token_id
                FROM counts) v
            WHERE token_id <= 32),
        ids AS (
            SELECT t.doc_id,
                   row_number() OVER (PARTITION BY t.doc_id ORDER BY t.pos)
                       - 1 AS li,
                   coalesce(v.token_id, 0)::INT AS tid
            FROM tok2 t LEFT JOIN vocab v USING (token)),
        doc_len AS (
            SELECT d.doc_id, coalesce(c.n, 0) + 1 AS len
            FROM documents d LEFT JOIN (
                SELECT doc_id, count(*) AS n FROM tok2 GROUP BY doc_id
            ) c USING (doc_id)),
        offs AS (
            SELECT doc_id, len,
                   coalesce(sum(len) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS off
            FROM doc_len),
        stream AS (
            SELECT (o.off + i.li)::BIGINT AS gpos, i.tid
            FROM ids i JOIN offs o USING (doc_id)
            UNION ALL
            SELECT (o.off + o.len - 1)::BIGINT AS gpos, -1 AS tid FROM offs o)
        SELECT (gpos // 128)::BIGINT AS block_id,
               count(*)::BIGINT AS n_tokens,
               string_agg(tid::VARCHAR, ',' ORDER BY gpos) AS ids_str
        FROM stream GROUP BY 1""",
    # SAU1 audio geometry restated from media_codec.synth_audio_params:
    # header is 11 bytes, samples are int16 interleaved
    "audio_meta": """
        SELECT doc_id,
               (8000 + 4000 * (doc_id % 3))::INT AS sample_rate,
               (1 + doc_id % 2)::INT AS channels,
               (64 + octet_length(encode(text)) % 192)::INT AS n_samples,
               (11 + 2 * (64 + octet_length(encode(text)) % 192)
                       * (1 + doc_id % 2))::BIGINT AS n_bytes
        FROM documents""",
    # audio features twin: sample j of the interleaved stream is
    # (byte[j % nb] - 128) * 256 (text bytes cycled, b'\\x00' if empty),
    # so energy/peak/zero-crossings are exact-integer recomputable from
    # the hex-encoded text — keep in lockstep with
    # multimodal.audio_features / media_codec.synth_audio_payload
    "audio_features": """
        WITH geom AS (
            SELECT doc_id,
                   8000 + 4000 * (doc_id % 3) AS sr,
                   1 + doc_id % 2 AS ch,
                   64 + octet_length(encode(text)) % 192 AS n,
                   CASE WHEN octet_length(encode(text)) = 0 THEN '00'
                        ELSE hex(encode(text)) END AS hx,
                   greatest(octet_length(encode(text)), 1) AS nb
            FROM documents),
        sv AS (
            SELECT doc_id, sr, ch, n,
                   list_transform(range(0, n * ch), j ->
                       (('0x' || substr(hx, (2 * (j % nb) + 1)::INT, 2))::BIGINT
                        - 128) * 256) AS s
            FROM geom)
        SELECT doc_id,
               (n * 1000 // sr)::BIGINT AS duration_ms,
               list_sum(list_transform(s, x -> abs(x)))::BIGINT AS energy,
               list_max(list_transform(s, x -> abs(x)))::INT AS peak,
               coalesce(list_sum(list_transform(range(ch, n * ch), j ->
                   ((s[(j + 1)::INT] < 0) != (s[(j - ch + 1)::INT] < 0))::INT)),
                   0)::BIGINT AS zero_crossings
        FROM sv""",
    # Bloom decontamination: the exact bit positions of the Spark bitmap
    # (md5-60bit Kirsch-Mitzenmacher double hashing, both draws reduced
    # mod m before combining) restated in SQL. Set-bit membership == 'all
    # k positions appear in the union of eval positions', so the word
    # packing needs no restating — semantics, false positives included,
    # are identical (lockstep with dedup.bloom_decontaminate at
    # n=3, m=2^17, k=4, eval = doc_id % 50 = 0).
    "bloom_decontaminate": f"""
        WITH {_SQL_SHINGLES},
        hp AS (
            SELECT id, sh,
                   ('0x' || substr(md5('b1|' || sh), 1, 15))::BIGINT
                       % {dedup.BLOOM_M_BITS} AS h1,
                   ('0x' || substr(md5('b2|' || sh), 1, 15))::BIGINT
                       % {dedup.BLOOM_M_BITS} AS h2
            FROM shingles),
        ev_pos AS (
            SELECT DISTINCT (h1 + i * h2) % {dedup.BLOOM_M_BITS} AS p
            FROM hp, unnest([0, 1, 2, 3]) AS t(i) WHERE id % 50 = 0),
        tr AS (
            SELECT id, sh, i, (h1 + i * h2) % {dedup.BLOOM_M_BITS} AS p
            FROM hp, unnest([0, 1, 2, 3]) AS t(i) WHERE id % 50 <> 0),
        flagged AS (
            SELECT id, sh FROM tr JOIN ev_pos USING (p)
            GROUP BY id, sh HAVING count(DISTINCT i) = 4)
        SELECT id AS doc_id, count(*)::BIGINT AS n_flagged
        FROM flagged GROUP BY id""",
    # duplicate passages: positional 8-gram shingles (whole-doc shingle
    # for docs shorter than 8 tokens — same convention as word_ngrams),
    # cross-doc df >= 2, gaps-and-islands merge of covered intervals
    # (lockstep with dedup.duplicate_passages; Spark groups shingles by
    # xxhash64, the oracle by the string — identical absent a 64-bit
    # collision, as in ngram_jaccard)
    "duplicate_passages": f"""
        WITH toks AS (
            SELECT doc_id, string_split({_SQL_NORM}, ' ') AS toks
            FROM documents),
        sh AS (
            SELECT doc_id AS id, i - 1 AS pos,
                   array_to_string(toks[i:least(i + 7, len(toks))], ' ') AS sh
            FROM toks,
                 unnest(generate_series(1, greatest(len(toks) - 7, 1))) AS t(i)),
        dup AS (
            SELECT sh FROM sh GROUP BY sh HAVING count(DISTINCT id) >= 2),
        ival AS (
            SELECT id, pos, pos + 7 AS e FROM sh JOIN dup USING (sh)),
        isl AS (
            SELECT id, pos, e,
                   max(e) OVER (PARTITION BY id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS prev_end
            FROM ival),
        isl2 AS (
            SELECT id, pos, e,
                   sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS island
            FROM isl)
        SELECT id AS doc_id, min(pos)::BIGINT AS span_start,
               (max(e) - min(pos) + 1)::BIGINT AS span_len
        FROM isl2 GROUP BY id, island""",
    # ExactSubstr rewrite: the full keep-one-copy pipeline restated —
    # positional 8-gram windows (grouped by STRING here, xxhash64 in
    # Spark, identical absent a 64-bit collision), total count >= 2,
    # canonical occurrence = first (id, pos), interval-overlay sweep
    # (dropped coverage > 0 AND kept coverage = 0), islands merge,
    # rebuild via string_agg ORDER BY position. Input = the planted
    # corpus of q_dedup_substrings.
    "dedup_substrings": f"""
        WITH src AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 7 = 0
                           THEN ' shared planted passage alpha beta'
                                || ' gamma delta epsilon zeta eta theta'
                                || ' iota kappa'
                           ELSE '' END
                   || CASE WHEN doc_id % 11 = 0
                           THEN ' ' || substr(text, 1, 120)
                           ELSE '' END AS text
            FROM documents),
        toks AS (
            SELECT doc_id, string_split({_SQL_NORM}, ' ') AS tk
            FROM src),
        win AS (
            SELECT doc_id AS id, i - 1 AS pos,
                   least(i + 6, len(tk) - 1) AS e,
                   array_to_string(tk[i:least(i + 7, len(tk))], ' ') AS sh
            FROM toks,
                 unnest(generate_series(1, greatest(len(tk) - 7, 1))) AS t(i)),
        occ AS (
            SELECT id, pos, e,
                   row_number() OVER (PARTITION BY sh ORDER BY id, pos) = 1
                       AS kept,
                   count(*) OVER (PARTITION BY sh) AS c
            FROM win),
        marked AS (SELECT id, pos, e, kept FROM occ WHERE c >= 2),
        ev AS (
            SELECT id, pos AS b,
                   CASE WHEN kept THEN 0 ELSE 1 END AS dd,
                   CASE WHEN kept THEN 1 ELSE 0 END AS kd
            FROM marked
            UNION ALL
            SELECT id, e + 1,
                   CASE WHEN kept THEN 0 ELSE -1 END,
                   CASE WHEN kept THEN -1 ELSE 0 END
            FROM marked),
        evg AS (
            SELECT id, b, sum(dd) AS dd, sum(kd) AS kd
            FROM ev GROUP BY id, b),
        sweep AS (
            SELECT id, b,
                   sum(dd) OVER (PARTITION BY id ORDER BY b) AS dcov,
                   sum(kd) OVER (PARTITION BY id ORDER BY b) AS kcov,
                   lead(b) OVER (PARTITION BY id ORDER BY b) AS nb
            FROM evg),
        seg AS (
            SELECT id, b AS s, nb - 1 AS e FROM sweep
            WHERE nb IS NOT NULL AND dcov > 0 AND kcov = 0),
        mrg AS (
            SELECT id, s, e,
                   max(e) OVER (PARTITION BY id ORDER BY s
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS pe
            FROM seg),
        isl AS (
            SELECT id, s, e,
                   sum(CASE WHEN pe IS NULL OR s > pe + 1
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY id ORDER BY s) AS island
            FROM mrg),
        spans AS (
            SELECT id, min(s) AS rs, max(e) AS re
            FROM isl GROUP BY id, island),
        toke AS (
            SELECT doc_id, i - 1 AS pos, tk[i] AS tok, len(tk) AS tl
            FROM toks, unnest(generate_series(1, len(tk))) AS t(i)),
        keep AS (
            SELECT t.doc_id, t.pos, t.tok
            FROM toke t
            WHERE NOT EXISTS (
                SELECT 1 FROM spans s
                WHERE s.id = t.doc_id AND t.pos BETWEEN s.rs AND s.re)),
        agg AS (
            SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text,
                   count(*) AS nkept
            FROM keep GROUP BY doc_id),
        tl AS (SELECT doc_id, len(tk) AS tl FROM toks)
        SELECT tl.doc_id, coalesce(a.text, '') AS text,
               (tl.tl - coalesce(a.nkept, 0))::BIGINT AS removed_tokens
        FROM tl LEFT JOIN agg a USING (doc_id)""",
    # substring decontamination (r8): same interval machinery as
    # dedup_substrings without keeper protection — every eval-matched
    # window's coverage goes; windows grouped by string (xxhash64 in
    # Spark, identical absent a collision)
    "decontaminate_substrings": f"""
        WITH src AS (
            SELECT doc_id,
                   text || CASE WHEN doc_id % 9 = 0 OR doc_id % 50 = 0
                                THEN ' benchmark canary alpha bravo'
                                     || ' charlie delta echo foxtrot'
                                     || ' golf hotel'
                                ELSE '' END AS text
            FROM documents),
        toks AS (
            SELECT doc_id, string_split({_SQL_NORM}, ' ') AS tk
            FROM src WHERE doc_id % 50 <> 0),
        etoks AS (
            SELECT doc_id, string_split({_SQL_NORM}, ' ') AS tk
            FROM src WHERE doc_id % 50 = 0),
        win AS (
            SELECT doc_id AS id, i - 1 AS pos,
                   least(i + 6, len(tk) - 1) AS e,
                   array_to_string(tk[i:least(i + 7, len(tk))], ' ') AS sh
            FROM toks,
                 unnest(generate_series(1, greatest(len(tk) - 7, 1))) AS t(i)),
        ewin AS (
            SELECT DISTINCT
                   array_to_string(tk[i:least(i + 7, len(tk))], ' ') AS sh
            FROM etoks,
                 unnest(generate_series(1, greatest(len(tk) - 7, 1))) AS t(i)),
        hits AS (SELECT w.id, w.pos, w.e FROM win w JOIN ewin USING (sh)),
        isl AS (
            SELECT id, pos, e,
                   max(e) OVER (PARTITION BY id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS pe
            FROM hits),
        isl2 AS (
            SELECT id, pos, e,
                   sum(CASE WHEN pe IS NULL OR pos > pe + 1
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY id ORDER BY pos) AS island
            FROM isl),
        spans AS (
            SELECT id, min(pos) AS rs, max(e) AS re
            FROM isl2 GROUP BY id, island),
        toke AS (
            SELECT doc_id, i - 1 AS pos, tk[i] AS tok, len(tk) AS tl
            FROM toks, unnest(generate_series(1, len(tk))) AS t(i)),
        keep AS (
            SELECT t.doc_id, t.pos, t.tok
            FROM toke t
            WHERE NOT EXISTS (
                SELECT 1 FROM spans s
                WHERE s.id = t.doc_id AND t.pos BETWEEN s.rs AND s.re)),
        agg AS (
            SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text,
                   count(*) AS nkept
            FROM keep GROUP BY doc_id),
        tl AS (SELECT doc_id, len(tk) AS tl FROM toks)
        SELECT tl.doc_id, coalesce(a.text, '') AS text,
               (tl.tl - coalesce(a.nkept, 0))::BIGINT AS removed_tokens
        FROM tl LEFT JOIN agg a USING (doc_id)""",
    "contamination_report": f"""
        WITH src AS (
            SELECT doc_id,
                   text || CASE WHEN doc_id % 9 = 0 OR doc_id % 50 = 0
                                THEN ' benchmark canary alpha bravo'
                                     || ' charlie delta echo foxtrot'
                                     || ' golf hotel'
                                ELSE '' END AS text
            FROM documents),
        toks AS (
            SELECT doc_id, string_split({_SQL_NORM}, ' ') AS tk
            FROM src WHERE doc_id % 50 <> 0),
        etoks AS (
            SELECT doc_id, string_split({_SQL_NORM}, ' ') AS tk
            FROM src WHERE doc_id % 50 = 0),
        ewin AS (
            SELECT doc_id AS id, i - 1 AS pos,
                   least(i + 6, len(tk) - 1) AS e,
                   array_to_string(tk[i:least(i + 7, len(tk))], ' ') AS sh
            FROM etoks,
                 unnest(generate_series(1, greatest(len(tk) - 7, 1))) AS t(i)),
        twin AS (
            SELECT DISTINCT
                   array_to_string(tk[i:least(i + 7, len(tk))], ' ') AS sh
            FROM toks,
                 unnest(generate_series(1, greatest(len(tk) - 7, 1))) AS t(i)),
        hits AS (SELECT w.id, w.pos, w.e FROM ewin w JOIN twin USING (sh)),
        isl AS (
            SELECT id, pos, e,
                   max(e) OVER (PARTITION BY id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS pe
            FROM hits),
        isl2 AS (
            SELECT id, pos, e,
                   sum(CASE WHEN pe IS NULL OR pos > pe + 1
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY id ORDER BY pos) AS island
            FROM isl),
        spans AS (
            SELECT id, min(pos) AS rs, max(e) AS re
            FROM isl2 GROUP BY id, island),
        cov AS (
            SELECT id, sum(re - rs + 1) AS cov FROM spans GROUP BY id),
        tl AS (SELECT doc_id, len(tk) AS tl FROM etoks)
        SELECT tl.doc_id, tl.tl::BIGINT AS n_tokens,
               coalesce(c.cov, 0)::BIGINT AS contaminated_tokens,
               round(coalesce(c.cov, 0) / tl.tl::DOUBLE, 6)
                   AS contaminated_frac
        FROM tl LEFT JOIN cov c ON c.id = tl.doc_id""",
    "knn_classify": f"""
        WITH nn AS (
            SELECT qid, vec_id FROM (
                SELECT q.vec_id AS qid, c.vec_id AS vec_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY round({_sql_cosine('q.embedding',
                                                       'c.embedding')}, 6)
                                    DESC, c.vec_id) AS rank
                FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
                WHERE q.vec_id % 100 = 0
            ) t WHERE rank <= 10),
        votes AS (
            SELECT nn.qid, e.label, count(*)::BIGINT AS votes
            FROM nn JOIN embeddings e ON e.vec_id = nn.vec_id
            GROUP BY nn.qid, e.label)
        SELECT qid, label AS pred_label, votes FROM (
            SELECT qid, label, votes,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY votes DESC, label) AS rn
            FROM votes) v
        WHERE rn = 1""",
    "pq_codes": f"""
        WITH {_sql_pq_ctes()}
        SELECT vec_id, string_agg(c::VARCHAR, ',' ORDER BY s) AS codes_str
        FROM enc GROUP BY vec_id""",
    "similarity_pq": f"""
        WITH {_sql_pq_ctes()},
        qtab AS (
            SELECT vec_id AS qid, s, c, d AS qdist
            FROM dists WHERE vec_id % 100 = 0),
        adist AS (
            SELECT q.qid, e.vec_id, sum(q.qdist)::BIGINT AS adist
            FROM enc e JOIN qtab q ON q.s = e.s AND q.c = e.c
            WHERE q.qid <> e.vec_id
            GROUP BY q.qid, e.vec_id)
        SELECT qid, vec_id, adist, rank FROM (
            SELECT qid, vec_id, adist,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY adist, vec_id)::BIGINT AS rank
            FROM adist) t
        WHERE rank <= 10""",
    # IVF-PQ composite (r13): the similarity_ivf assignment/probe CTEs
    # joined with the _sql_pq_ctes encoding — candidates restricted to
    # each query's 4 probed buckets, ranked by the exact-integer ADC
    # sum. Parameterized on k so the rerank entry reuses it as its
    # shortlist subquery.
    "similarity_ivfpq": _sql_ivfpq_topk(10),
    "quantize_embeddings": """
        WITH staged AS (
            SELECT vec_id, embedding,
                   CASE WHEN list_max(list_transform(embedding, y -> abs(y))) = 0.0
                        THEN 0.0
                        ELSE greatest(
                            list_max(list_transform(embedding, y -> abs(y))) / 127.0,
                            1e-30)
                   END AS scale
            FROM embeddings)
        SELECT vec_id, round(scale, 6) AS scale,
               array_to_string(list_transform(embedding,
                   x -> round(x / greatest(scale, 1e-30))::INT::VARCHAR), ',')
                   AS q_str
        FROM staged""",
    "lang_id": f"""
        SELECT doc_id,
               CASE
                 WHEN ({_S_EN}) > 0 AND ({_S_EN}) >= ({_S_DE})
                      AND ({_S_EN}) >= ({_S_ES}) AND ({_S_EN}) >= ({_S_FR}) THEN 'en'
                 WHEN ({_S_DE}) > 0 AND ({_S_DE}) >= ({_S_ES})
                      AND ({_S_DE}) >= ({_S_FR}) THEN 'de'
                 WHEN ({_S_ES}) > 0 AND ({_S_ES}) >= ({_S_FR}) THEN 'es'
                 WHEN ({_S_FR}) > 0 THEN 'fr'
                 ELSE 'und'
               END AS pred_lang
        FROM documents""",
    # lang-ID confusion matrix (r10): the lang_id CASE grouped against
    # the gold column, row shares via a window over the tiny matrix
    "lang_confusion": f"""
        WITH pred AS (
            SELECT lang AS gold,
                   CASE
                     WHEN ({_S_EN}) > 0 AND ({_S_EN}) >= ({_S_DE})
                          AND ({_S_EN}) >= ({_S_ES})
                          AND ({_S_EN}) >= ({_S_FR}) THEN 'en'
                     WHEN ({_S_DE}) > 0 AND ({_S_DE}) >= ({_S_ES})
                          AND ({_S_DE}) >= ({_S_FR}) THEN 'de'
                     WHEN ({_S_ES}) > 0 AND ({_S_ES}) >= ({_S_FR}) THEN 'es'
                     WHEN ({_S_FR}) > 0 THEN 'fr'
                     ELSE 'und'
                   END AS pred
            FROM documents),
        cells AS (
            SELECT gold, pred, count(*)::BIGINT AS n_docs
            FROM pred GROUP BY gold, pred)
        SELECT gold, pred, n_docs,
               (n_docs * 1000 // sum(n_docs) OVER (PARTITION BY gold))
                   ::BIGINT AS share_mils
        FROM cells""",
    "quality_score": f"""
        SELECT doc_id,
               {_SQL_PUNCT_RATIO} AS punct_ratio,
               {_SQL_STOP_RATIO} AS stopword_ratio,
               {_SQL_MEAN_WLEN} AS mean_word_len,
               {_SQL_QUALITY} AS quality
        FROM documents""",
    "token_count": f"""
        SELECT doc_id,
               {_SQL_N_WS} AS n_ws_tokens,
               len(regexp_extract_all(text,
                   '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))::BIGINT AS n_bpe_tokens
        FROM documents""",
    "doc_fingerprint": """
        SELECT doc_id,
               CASE WHEN length(text) = 0 THEN 0 ELSE
                   list_reduce(
                       list_transform(string_split(text, ''), c -> ascii(c)::BIGINT),
                       (acc, x) -> (acc * 31 + x) % 1000000007)
               END AS fp
        FROM documents""",
    # Gopher repetition signals over the PLANTED line structure (same
    # construction as q_repetition_signals); grams use the shared
    # normalization and the _SQL_SHINGLES short-doc idiom generalized to
    # n=2 and n=5 (CTE text from _sql_repetition_ctes, shared with the
    # corpus_filter oracle)
    "repetition_signals": None,  # assembled below
    "corpus_filter": None,  # assembled below
    "decontaminate": f"""
        WITH {_SQL_SHINGLES},
        ev AS (SELECT DISTINCT sh FROM shingles WHERE id % 50 = 0)
        SELECT s.id AS doc_id, count(*)::BIGINT AS n_shared
        FROM shingles s JOIN ev USING (sh)
        WHERE s.id % 50 <> 0
        GROUP BY s.id""",
    "pii_redact": f"""
        WITH planted AS (
            SELECT doc_id,
                   text || ' contact user' || doc_id::VARCHAR
                        || '@example.com from 10.2.' || (doc_id % 200)::VARCHAR
                        || '.7 tel +1 (555) 010-'
                        || lpad((doc_id % 100)::VARCHAR, 2, '0') AS t
            FROM documents)
        SELECT doc_id,
               len(regexp_extract_all(t, '{textstats.EMAIL_REGEX}'))::BIGINT
                   AS n_emails,
               len(regexp_extract_all(t, '{textstats.IPV4_REGEX}'))::BIGINT
                   AS n_ips,
               len(regexp_extract_all(t, '{textstats.PHONE_REGEX}'))::BIGINT
                   AS n_phones,
               regexp_replace(regexp_replace(regexp_replace(t,
                   '{textstats.EMAIL_REGEX}', '<EMAIL>', 'g'),
                   '{textstats.IPV4_REGEX}', '<IP>', 'g'),
                   '{textstats.PHONE_REGEX}', '<PHONE>', 'g') AS redacted
        FROM planted""",
    # per-source PII rollup (r10): the pii_redact planted geometry on
    # two thirds of the docs, grouped — keep in lockstep with
    # textstats.pii_report and q_pii_report
    "pii_report": f"""
        WITH planted AS (
            SELECT doc_id, source,
                   CASE WHEN doc_id % 3 <> 2
                        THEN text || ' contact user' || doc_id::VARCHAR
                             || '@example.com from 10.2.'
                             || (doc_id % 200)::VARCHAR
                             || '.7 tel +1 (555) 010-'
                             || lpad((doc_id % 100)::VARCHAR, 2, '0')
                        ELSE text END AS t
            FROM documents),
        per AS (
            SELECT source,
                   len(regexp_extract_all(t,
                       '{textstats.EMAIL_REGEX}'))::BIGINT AS e,
                   len(regexp_extract_all(t,
                       '{textstats.IPV4_REGEX}'))::BIGINT AS i,
                   len(regexp_extract_all(t,
                       '{textstats.PHONE_REGEX}'))::BIGINT AS p
            FROM planted)
        SELECT source, count(*)::BIGINT AS n_docs,
               sum(e)::BIGINT AS n_emails,
               sum(i)::BIGINT AS n_ips,
               sum(p)::BIGINT AS n_phones,
               sum((e + i + p > 0)::INT)::BIGINT AS n_docs_with_pii,
               (sum((e + i + p > 0)::INT) * 1000 // count(*))::BIGINT
                   AS pii_doc_rate_mils
        FROM per GROUP BY source""",
    "repetition_removal": """
        WITH pos AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                   unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord
            FROM documents),
        firsts AS (
            SELECT doc_id, tok, min(ord) AS first_ord
            FROM pos GROUP BY doc_id, tok)
        SELECT d.doc_id,
               len(string_split(d.text, ' '))::BIGINT AS n_tokens,
               (SELECT count(*) FROM firsts f
                WHERE f.doc_id = d.doc_id)::BIGINT AS n_unique,
               (SELECT string_agg(tok, ' ' ORDER BY first_ord)
                FROM firsts f WHERE f.doc_id = d.doc_id) AS dedup_text
        FROM documents d""",
    "multimodal_meta": """
        SELECT 'text/plain' AS media_type, count(*) AS n_docs,
               sum(octet_length(encode(text)))::BIGINT AS total_bytes,
               max(octet_length(encode(text)))::BIGINT AS max_bytes
        FROM documents""",
    "multimodal_digest": """
        SELECT doc_id, md5(text) AS digest,
               octet_length(encode(text))::BIGINT AS n_bytes
        FROM documents""",
    # md5-60bit portable MinHash twin: same shingles as the jaccard
    # oracle, min per permutation of the hash_uniform60 construction
    # (proven portable by the weighted_sample oracle), raw concatenated
    # band keys, positional-equality estimate
    "dedup_minhash_portable": _sql_minhash_portable(),
    # LSH banding observability (r12): bucket stats + raw band fanout +
    # the pair-scale distinct — keep in lockstep with
    # dedup.minhash_band_report (portable=True)
    "minhash_band_report": f"""
        WITH {_sql_minhash_banded_ctes()},
        buckets AS (
            SELECT band, bh, count(*) AS bn
            FROM banded GROUP BY band, bh),
        bstats AS (
            SELECT count(*)::BIGINT AS n_band_keys,
                   coalesce(sum((bn > 1)::INT), 0)::BIGINT
                       AS colliding_keys,
                   coalesce(max(bn), 0)::BIGINT AS max_bucket,
                   coalesce(sum(bn * (bn - 1) // 2), 0)::BIGINT
                       AS band_collisions
            FROM buckets),
        cand AS (
            SELECT count(*)::BIGINT AS candidate_pairs FROM (
                SELECT DISTINCT a.id, b.id
                FROM banded a JOIN banded b
                  ON a.band = b.band AND a.bh = b.bh AND a.id < b.id) t),
        nd AS (SELECT count(DISTINCT id)::BIGINT AS n_docs FROM banded)
        SELECT nd.n_docs, 64::BIGINT AS num_perm, 16::BIGINT AS bands,
               bstats.n_band_keys, bstats.colliding_keys,
               bstats.max_bucket, bstats.band_collisions,
               cand.candidate_pairs,
               (CASE WHEN nd.n_docs = 0 THEN 0
                     ELSE cand.candidate_pairs * 1000 // nd.n_docs
                END)::BIGINT AS candidates_per_doc_mils
        FROM nd, bstats, cand""",
    # incremental twin: identical pipeline restricted to pairs touching
    # the batch (doc_id % 10 = 0) — valid because signatures are per-doc
    # projections, so index-vs-batch candidates = full candidates with
    # >= 1 batch member (lockstep with dedup.minhash_index_pairs)
    "dedup_minhash_incremental": _sql_minhash_portable(
        " AND (a.id % 10 = 0 OR b.id % 10 = 0)"
    ),
    "dedup_simhash": _sql_simhash_pairs(max_hamming=3),
    # the portable k-means IVF twin: 2 Lloyd iterations unrolled as CTEs,
    # centroid directions as exact integer sums (cosine scale-invariance
    # makes the mean division unnecessary) — lockstep with
    # q_similarity_ivf_kmeans / centroids_kmeans(portable=True)
    "similarity_ivf_kmeans": _sql_ivf_kmeans(n_iters=2, every=50, k=10, nprobe=4),
    # IVF: every-50th-id centroids, nearest-centroid assignment (rn=1),
    # nprobe=4 probe buckets per query, exact rounded cosine inside the
    # probed buckets — lockstep with q_similarity_ivf /
    # similarity.cosine_topk_ivf (unrounded sims order identically:
    # bit-identical doubles from the same sequential fold)
    "similarity_ivf": f"""
        WITH cents AS (
            SELECT vec_id AS cid, embedding AS cvec
            FROM embeddings WHERE vec_id % 50 = 0),
        assigned AS (
            SELECT id, v, nrm, cid FROM (
                SELECT e.vec_id AS id, e.embedding AS v,
                       sqrt({_SQL_DOT.format(a='e.embedding', b='e.embedding')})
                           AS nrm,
                       c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_sql_cosine('e.embedding', 'c.cvec')} DESC,
                                    c.cid) AS rn
                FROM embeddings e CROSS JOIN cents c) t
            WHERE rn = 1),
        probes AS (
            SELECT qid, qv, qnrm, cid FROM (
                SELECT e.vec_id AS qid, e.embedding AS qv,
                       sqrt({_SQL_DOT.format(a='e.embedding', b='e.embedding')})
                           AS qnrm,
                       c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_sql_cosine('e.embedding', 'c.cvec')} DESC,
                                    c.cid) AS rn
                FROM embeddings e CROSS JOIN cents c
                WHERE e.vec_id % 100 = 0) t
            WHERE rn <= 4),
        scored AS (
            SELECT p.qid, a.id AS vec_id,
                   round({_SQL_DOT.format(a='p.qv', b='a.v')}
                         / (p.qnrm * a.nrm), 6) AS cosine
            FROM probes p JOIN assigned a USING (cid)
            WHERE p.qid <> a.id)
        SELECT qid, vec_id, cosine, rank FROM (
            SELECT qid, vec_id, cosine,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY cosine DESC, vec_id)::BIGINT
                       AS rank
            FROM scored) t
        WHERE rank <= 10""",
    # single-table hyperplane bucketing + exact verify (nbits=12, seed 42,
    # dim=64, threshold on the ROUNDED cosine — lockstep with
    # q_dedup_embedding / dedup.embedding_near_dup_pairs)
    # SemDeDup twin: sampled centroids, unrounded-cosine assignment
    # order (same as the IVF oracles), round(6) centroid + pair cosines,
    # drop rule restated verbatim (exists a nearer-to-margin near-dup)
    "semantic_dedup": f"""
        WITH cents AS (
            SELECT vec_id AS cid, embedding AS cvec FROM embeddings
            WHERE vec_id % 50 = 0),
        assigned AS (
            SELECT id, v, cid, round(sim, 6) AS cent_cos,
                   sqrt({_SQL_DOT.format(a='v', b='v')}) AS nrm
            FROM (
                SELECT e.vec_id AS id, e.embedding AS v, c.cid,
                       {_sql_cosine('e.embedding', 'c.cvec')} AS sim,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_sql_cosine('e.embedding', 'c.cvec')} DESC,
                                    c.cid) AS rn
                FROM embeddings e CROSS JOIN cents c) t
            WHERE rn = 1),
        dropped AS (
            SELECT DISTINCT a.id FROM assigned a JOIN assigned b
              ON a.cid = b.cid AND a.id <> b.id
            WHERE round({_SQL_DOT.format(a='a.v', b='b.v')}
                        / (a.nrm * b.nrm), 6) >= 0.4
              AND (b.cent_cos < a.cent_cos
                   OR (b.cent_cos = a.cent_cos AND b.id < a.id)))
        SELECT a.id AS vec_id, a.cid, a.cent_cos,
               (d.id IS NULL) AS is_kept
        FROM assigned a LEFT JOIN dropped d ON a.id = d.id""",
    # the bounded-K default path (VERDICT r6 item 1): md5-sampled seeds +
    # 2 portable Lloyd iterations + the same drop rule
    # IVF drift metrics (r8): the shared bounded-centroid CTEs, the
    # exact assignment argmax (cos desc, cid asc — same tie-break as
    # ivf_assign's max(struct)), and the one-row occupancy + qerr
    # aggregate. The Spark side reads the metrics off the PERSISTED
    # index; the stored assignment is this argmax by construction.
    "ivf_drift": (
        lambda _c: f"""
        WITH {_c[0]},
        assigned AS (
            SELECT id, cid, sim FROM (
                SELECT e.vec_id AS id, c.cid,
                       {_sql_cosine('e.embedding', 'c.cvec')} AS sim,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_sql_cosine('e.embedding', 'c.cvec')}
                                        DESC,
                                    c.cid) AS rn
                FROM embeddings e CROSS JOIN {_c[1]} c) t
            WHERE rn = 1),
        agg AS (
            SELECT count(*) AS n_vectors,
                   avg(1.0 - sim) AS aq, max(1.0 - sim) AS mq
            FROM assigned),
        bk AS (
            SELECT max(n) AS max_bucket, count(*) AS n_used
            FROM (SELECT cid, count(*) AS n FROM assigned GROUP BY cid) t),
        cc AS (SELECT count(*) AS n_centroids FROM {_c[1]})
        SELECT agg.n_vectors::BIGINT AS n_vectors,
               cc.n_centroids::BIGINT AS n_centroids,
               (cc.n_centroids - bk.n_used)::BIGINT AS n_empty_buckets,
               bk.max_bucket::BIGINT AS max_bucket,
               round(bk.max_bucket * cc.n_centroids / agg.n_vectors, 6)
                   AS imbalance,
               round(agg.aq, 6) AS avg_qerr,
               round(agg.mq, 6) AS max_qerr
        FROM agg, bk, cc"""
    )(_sql_bounded_cents_ctes(k=64, sample=256, n_iters=2, dim=64)),
    # drift-triggered IVF auto-rebuild (r12): the drifted-index fixture
    # (centroids from the vec_id % 4 == 0 quarter, everything assigned
    # against them) + the ivf_drift aggregate + the threshold rule —
    # keep thresholds in lockstep with q_maintain_ivf_index
    "maintain_ivf_index": (
        lambda _c: f"""
        WITH {_c[0]},
        assigned AS (
            SELECT id, cid, sim FROM (
                SELECT e.vec_id AS id, c.cid,
                       {_sql_cosine('e.embedding', 'c.cvec')} AS sim,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_sql_cosine('e.embedding', 'c.cvec')}
                                        DESC,
                                    c.cid) AS rn
                FROM embeddings e CROSS JOIN {_c[1]} c) t
            WHERE rn = 1),
        agg AS (
            SELECT count(*) AS n_vectors,
                   avg(1.0 - sim) AS aq, max(1.0 - sim) AS mq
            FROM assigned),
        bk AS (
            SELECT max(n) AS max_bucket, count(*) AS n_used
            FROM (SELECT cid, count(*) AS n FROM assigned GROUP BY cid) t),
        cc AS (SELECT count(*) AS n_centroids FROM {_c[1]})
        SELECT agg.n_vectors::BIGINT AS n_vectors,
               cc.n_centroids::BIGINT AS n_centroids,
               (cc.n_centroids - bk.n_used)::BIGINT AS n_empty_buckets,
               bk.max_bucket::BIGINT AS max_bucket,
               round(bk.max_bucket * cc.n_centroids / agg.n_vectors, 6)
                   AS imbalance,
               round(agg.aq, 6) AS avg_qerr,
               round(agg.mq, 6) AS max_qerr,
               (round(agg.aq, 6) * 1000 > 300
                OR round(bk.max_bucket * cc.n_centroids / agg.n_vectors, 6)
                       * 1000 > 4000) AS rebuilt
        FROM agg, bk, cc"""
    )(_sql_bounded_cents_ctes(
        k=64, sample=256, n_iters=2, dim=64,
        src="(SELECT vec_id, embedding FROM embeddings"
            " WHERE vec_id % 4 = 0)",
    )),
    # IVF-PQ occupancy drift (r13): the shared bounded-centroid CTEs +
    # the assignment argmax + the occupancy-only aggregate — the codes
    # tier stores no raw floats, so there is no qerr column to restate
    "ivfpq_drift": (
        lambda _c: f"""
        WITH {_c[0]},
        assigned AS (
            SELECT id, cid FROM (
                SELECT e.vec_id AS id, c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_sql_cosine('e.embedding', 'c.cvec')}
                                        DESC,
                                    c.cid) AS rn
                FROM embeddings e CROSS JOIN {_c[1]} c) t
            WHERE rn = 1),
        agg AS (SELECT count(*) AS n_vectors FROM assigned),
        bk AS (
            SELECT max(n) AS max_bucket, count(*) AS n_used
            FROM (SELECT cid, count(*) AS n FROM assigned GROUP BY cid) t),
        cc AS (SELECT count(*) AS n_centroids FROM {_c[1]})
        SELECT agg.n_vectors::BIGINT AS n_vectors,
               cc.n_centroids::BIGINT AS n_centroids,
               (cc.n_centroids - bk.n_used)::BIGINT AS n_empty_buckets,
               bk.max_bucket::BIGINT AS max_bucket,
               round(bk.max_bucket * cc.n_centroids / agg.n_vectors, 6)
                   AS imbalance
        FROM agg, bk, cc"""
    )(_sql_bounded_cents_ctes(k=64, sample=256, n_iters=2, dim=64)),
    # occupancy-triggered IVF-PQ rebuild (r13): the 300-copy slab of
    # document 1's embedding appended to the healthy index + the same
    # occupancy aggregate + the imbalance threshold rule — keep the
    # slab construction and threshold in lockstep with
    # q_maintain_ivfpq_index
    "maintain_ivfpq_index": (
        lambda _c: f"""
        WITH {_c[0]},
        slab AS (
            SELECT (10000000 + i)::BIGINT AS vec_id, e.embedding
            FROM (SELECT embedding FROM embeddings WHERE vec_id = 1) e,
                 unnest(range(300)) AS t(i)),
        uni AS (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL SELECT vec_id, embedding FROM slab),
        assigned AS (
            SELECT id, cid FROM (
                SELECT e.vec_id AS id, c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_sql_cosine('e.embedding', 'c.cvec')}
                                        DESC,
                                    c.cid) AS rn
                FROM uni e CROSS JOIN {_c[1]} c) t
            WHERE rn = 1),
        agg AS (SELECT count(*) AS n_vectors FROM assigned),
        bk AS (
            SELECT max(n) AS max_bucket, count(*) AS n_used
            FROM (SELECT cid, count(*) AS n FROM assigned GROUP BY cid) t),
        cc AS (SELECT count(*) AS n_centroids FROM {_c[1]})
        SELECT agg.n_vectors::BIGINT AS n_vectors,
               cc.n_centroids::BIGINT AS n_centroids,
               (cc.n_centroids - bk.n_used)::BIGINT AS n_empty_buckets,
               bk.max_bucket::BIGINT AS max_bucket,
               round(bk.max_bucket * cc.n_centroids / agg.n_vectors, 6)
                   AS imbalance,
               (round(bk.max_bucket * cc.n_centroids / agg.n_vectors, 6)
                    * 1000 > 4000) AS rebuilt
        FROM agg, bk, cc"""
    )(_sql_bounded_cents_ctes(k=64, sample=256, n_iters=2, dim=64)),
    # healthy qerr probe (r14): sampled reconstruction error of the
    # stored codes vs the build-time baseline — same corpus, so the
    # ratio is exactly 1000; keep in lockstep with
    # similarity.ivfpq_index_qerr / _ivfpq_sample_recon (n_sample=256)
    "ivfpq_qerr": f"""
        WITH {_sql_pq_ctes()},
        samp AS (
            SELECT vec_id FROM embeddings
            ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT,
                     vec_id
            LIMIT 256),
        recon AS (
            SELECT d.vec_id, sum(d.d)::BIGINT AS recon
            FROM dists d
            JOIN enc e ON e.vec_id = d.vec_id AND e.s = d.s AND e.c = d.c
            JOIN samp ON samp.vec_id = d.vec_id
            GROUP BY d.vec_id),
        g AS (SELECT count(*)::BIGINT AS n,
                     coalesce(sum(recon), 0)::BIGINT AS r
              FROM recon)
        SELECT n AS n_sampled,
               (r // greatest(n, 1))::BIGINT AS avg_recon_sq,
               (r // greatest(n, 1))::BIGINT AS baseline_recon_sq,
               (CASE WHEN n = 0 OR (r // greatest(n, 1)) <= 0 THEN 0
                     ELSE (r // greatest(n, 1)) * 1000
                          // (r // greatest(n, 1)) END)::BIGINT
                   AS qerr_ratio_mils
        FROM g""",
    # qerr-triggered rebuild on the occupancy-blind drift class (r14):
    # a 5x-scaled slab appended at the stored models — baseline sample
    # over the BASE corpus, current sample over the union, both encoded
    # at the same first-16 codebooks; rebuilt = ratio > 3000. Keep in
    # lockstep with q_maintain_ivfpq_qerr.
    "maintain_ivfpq_qerr": f"""
        WITH {_sql_pq_ctes()},
        bsamp AS (
            SELECT vec_id FROM embeddings
            ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT,
                     vec_id
            LIMIT 256),
        brecon AS (
            SELECT d.vec_id, sum(d.d)::BIGINT AS recon
            FROM dists d
            JOIN enc e ON e.vec_id = d.vec_id AND e.s = d.s AND e.c = d.c
            JOIN bsamp ON bsamp.vec_id = d.vec_id
            GROUP BY d.vec_id),
        bg AS (SELECT count(*)::BIGINT AS n,
                      coalesce(sum(recon), 0)::BIGINT AS r
               FROM brecon),
        slab AS (
            SELECT (20000000 + vec_id)::BIGINT AS vec_id,
                   list_transform(embedding, x -> (x * 5.0)::FLOAT)
                       AS embedding
            FROM embeddings WHERE vec_id % 4 = 0),
        uni AS (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL SELECT vec_id, embedding FROM slab),
        uqx AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> floor(x::DOUBLE * 1024.0)::BIGINT) AS qx
            FROM uni),
        usubs AS (
            SELECT vec_id, s, list_slice(qx, s*8 + 1, s*8 + 8) AS sub
            FROM uqx, ss),
        udists AS (
            SELECT vec_id, s, c,
                   {_SQL_PQ_SQDIST.format(a="sub", b="cq")}::BIGINT AS d
            FROM usubs JOIN cb USING (s)),
        uenc AS (
            SELECT vec_id, s, c FROM (
                SELECT vec_id, s, c,
                       row_number() OVER (PARTITION BY vec_id, s
                                          ORDER BY d, c) AS rn
                FROM udists) r
            WHERE rn = 1),
        usamp AS (
            SELECT vec_id FROM uni
            ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT,
                     vec_id
            LIMIT 256),
        urecon AS (
            SELECT d.vec_id, sum(d.d)::BIGINT AS recon
            FROM udists d
            JOIN uenc e ON e.vec_id = d.vec_id AND e.s = d.s AND e.c = d.c
            JOIN usamp ON usamp.vec_id = d.vec_id
            GROUP BY d.vec_id),
        ug AS (SELECT count(*)::BIGINT AS n,
                      coalesce(sum(recon), 0)::BIGINT AS r
               FROM urecon)
        SELECT ug.n AS n_sampled,
               (ug.r // greatest(ug.n, 1))::BIGINT AS avg_recon_sq,
               (bg.r // greatest(bg.n, 1))::BIGINT AS baseline_recon_sq,
               (CASE WHEN ug.n = 0 OR (bg.r // greatest(bg.n, 1)) <= 0
                     THEN 0
                     ELSE (ug.r // greatest(ug.n, 1)) * 1000
                          // (bg.r // greatest(bg.n, 1)) END)::BIGINT
                   AS qerr_ratio_mils,
               (ug.n > 0 AND (bg.r // greatest(bg.n, 1)) > 0
                AND (ug.r // greatest(ug.n, 1)) * 1000
                    // (bg.r // greatest(bg.n, 1)) > 3000) AS rebuilt
        FROM ug, bg""",
    "semantic_dedup_bounded": _sql_semantic_dedup_bounded(
        k=64, sample=256, n_iters=2, threshold=0.4
    ),
    "dedup_embedding": f"""
        WITH sig AS (
            SELECT vec_id AS id, embedding AS v,
                   {_sql_lsh_sig('embedding', 64, 12, 42)} AS bucket
            FROM embeddings)
        SELECT id_a, id_b, cosine FROM (
            SELECT a.id AS id_a, b.id AS id_b,
                   round({_sql_cosine('a.v', 'b.v')}, 6) AS cosine
            FROM sig a JOIN sig b
              ON a.bucket = b.bucket AND a.id < b.id) t
        WHERE cosine >= 0.5""",
    # multi-table hyperplane LSH with the planes as shared literal
    # constants (seeds 42 + 1000*t, t in 0..2; nbits=4, dim=64 — keep in
    # lockstep with q_similarity_lsh and similarity._lsh_tables)
    "similarity_lsh": f"""
        WITH sig AS (
            SELECT vec_id, embedding,
                   sqrt({_SQL_DOT.format(a='embedding', b='embedding')}) AS nrm,
                   [{_sql_lsh_sig('embedding', 64, 4, 42)},
                    {_sql_lsh_sig('embedding', 64, 4, 1042)},
                    {_sql_lsh_sig('embedding', 64, 4, 2042)}] AS sigs
            FROM embeddings),
        banded AS (
            SELECT vec_id, embedding, nrm,
                   unnest([0, 1, 2]) AS t, unnest(sigs) AS b
            FROM sig),
        cand AS (
            SELECT DISTINCT q.vec_id AS qid, c.vec_id AS vec_id
            FROM banded q JOIN banded c
              ON q.t = c.t AND q.b = c.b AND q.vec_id <> c.vec_id
            WHERE q.vec_id % 100 = 0),
        scored AS (
            SELECT cand.qid, cand.vec_id,
                   round({_SQL_DOT.format(a='q.embedding', b='c.embedding')}
                         / (q.nrm * c.nrm), 6) AS cosine
            FROM cand
            JOIN sig q ON q.vec_id = cand.qid
            JOIN sig c ON c.vec_id = cand.vec_id)
        SELECT qid, vec_id, cosine, rank FROM (
            SELECT qid, vec_id, cosine,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY cosine DESC, vec_id)::BIGINT
                       AS rank
            FROM scored) t
        WHERE rank <= 10""",
    # ANN recall eval (r10): the LSH candidate chain (verbatim from
    # similarity_lsh) intersected per query with the brute-force truth
    # top-10 — keep both in lockstep with q_ann_recall_eval
    "ann_recall_eval": f"""
        WITH sig AS (
            SELECT vec_id, embedding,
                   sqrt({_SQL_DOT.format(a='embedding', b='embedding')}) AS nrm,
                   [{_sql_lsh_sig('embedding', 64, 4, 42)},
                    {_sql_lsh_sig('embedding', 64, 4, 1042)},
                    {_sql_lsh_sig('embedding', 64, 4, 2042)}] AS sigs
            FROM embeddings),
        banded AS (
            SELECT vec_id, embedding, nrm,
                   unnest([0, 1, 2]) AS t, unnest(sigs) AS b
            FROM sig),
        cpairs AS (
            SELECT DISTINCT q.vec_id AS qid, c.vec_id AS vec_id
            FROM banded q JOIN banded c
              ON q.t = c.t AND q.b = c.b AND q.vec_id <> c.vec_id
            WHERE q.vec_id % 100 = 0),
        cscored AS (
            SELECT cpairs.qid, cpairs.vec_id,
                   round({_SQL_DOT.format(a='q.embedding', b='c.embedding')}
                         / (q.nrm * c.nrm), 6) AS cosine
            FROM cpairs
            JOIN sig q ON q.vec_id = cpairs.qid
            JOIN sig c ON c.vec_id = cpairs.vec_id),
        cand AS (
            SELECT qid, vec_id FROM (
                SELECT qid, vec_id,
                       row_number() OVER (PARTITION BY qid
                                          ORDER BY cosine DESC, vec_id)
                           AS rank
                FROM cscored) t
            WHERE rank <= 10),
        truth AS (
            SELECT qid, vec_id FROM (
                SELECT q.vec_id AS qid, c.vec_id AS vec_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY round({_sql_cosine('q.embedding',
                                                       'c.embedding')}, 6)
                                    DESC, c.vec_id) AS rank
                FROM embeddings q JOIN embeddings c
                  ON q.vec_id != c.vec_id
                WHERE q.vec_id % 100 = 0) t
            WHERE rank <= 10),
        hits AS (
            SELECT t.qid, count(*)::BIGINT AS n_hit
            FROM truth t JOIN cand c
              ON t.qid = c.qid AND t.vec_id = c.vec_id
            GROUP BY t.qid),
        perq AS (
            SELECT qid, count(*)::BIGINT AS n_truth
            FROM truth GROUP BY qid)
        SELECT p.qid, p.n_truth,
               coalesce(h.n_hit, 0)::BIGINT AS n_hit,
               (coalesce(h.n_hit, 0) * 1000 // p.n_truth)::BIGINT
                   AS recall_mils
        FROM perq p LEFT JOIN hits h USING (qid)""",
    # exact media dedup: group by the payload identity key instead of
    # md5-ing container bytes DuckDB can't assemble — payloads are pure
    # functions of (w,h,c,frames, text bytes cycled to the raster size),
    # and hex-string cycling aligns at byte boundaries, so the grouping
    # is identical to grouping by the payload itself
    "media_dedup_exact": f"""
        WITH geom AS ({_SQL_MEDIA_GEOM}),
        pkey AS (
            SELECT g.doc_id,
                   g.w || ',' || g.h || ',' || g.c || ',' || g.frames || '|' ||
                   substring(
                       repeat(
                           CASE WHEN octet_length(encode(d.text)) = 0 THEN '00'
                                ELSE hex(encode(d.text)) END,
                           (g.frames * g.w * g.h * g.c
                            + greatest(octet_length(encode(d.text)), 1) - 1)
                           // greatest(octet_length(encode(d.text)), 1)),
                       1, 2 * g.frames * g.w * g.h * g.c) AS pk
            FROM geom g JOIN documents d USING (doc_id))
        SELECT min(doc_id) AS keep_id, count(*) AS n_dups
        FROM pkey GROUP BY pk""",
    "media_ahash": f"""
        WITH {_sql_media_ahash_ctes()}
        SELECT doc_id, {_sql_media_ahash_fp()} AS ahash
        FROM gsum""",
    "media_near_dup": _sql_media_near_dup(max_hamming=7),
    # the three real-codec oracles restate media_codec.synth_params in SQL
    # (11 = container header length) — keep in lockstep with
    # functions/media_codec.py
    "multimodal_decode": f"""
        WITH geom AS ({_SQL_MEDIA_GEOM})
        SELECT doc_id, (11 + frames * w * h * c)::BIGINT AS n_bytes,
               w::INT AS width, h::INT AS height, frames::INT AS n_frames
        FROM geom""",
    "multimodal_resize": f"""
        WITH geom AS ({_SQL_MEDIA_GEOM})
        SELECT doc_id, 16::INT AS width, 16::INT AS height,
               (11 + frames * 16 * 16 * c)::BIGINT AS out_bytes
        FROM geom""",
    "multimodal_frames": f"""
        WITH geom AS ({_SQL_MEDIA_GEOM})
        SELECT doc_id, unnest(range(0, frames, 2))::INT AS frame_idx,
               (11 + w * h * c)::BIGINT AS frame_bytes
        FROM geom""",
    # integer histogram twin of multimodal_features: raw text byte i
    # appears total//nb + (i < total%nb) times in the cycled raster, so
    # every bin count is reproducible without materializing pixels —
    # keep in lockstep with multimodal.pixel_histogram
    "multimodal_features_hist": f"""
        WITH geom AS ({_SQL_MEDIA_GEOM}),
        rast AS (
            SELECT g.doc_id,
                   CASE WHEN octet_length(encode(d.text)) = 0 THEN '00'
                        ELSE hex(encode(d.text)) END AS hx,
                   greatest(octet_length(encode(d.text)), 1) AS nb,
                   g.frames * g.w * g.h * g.c AS total
            FROM geom g JOIN documents d USING (doc_id)),
        bytes AS (
            SELECT doc_id, nb, total,
                   list_transform(range(0, nb), i ->
                       ('0x' || substr(hx, (2*i+1)::INT, 2))::BIGINT) AS bv
            FROM rast)
        SELECT doc_id,
               array_to_string(list_transform(range(0, 16), b ->
                   list_sum(list_transform(range(0, nb), i ->
                       CASE WHEN bv[(i+1)::INT] % 16 = b
                            THEN total // nb
                                 + CASE WHEN i < total % nb THEN 1 ELSE 0 END
                            ELSE 0 END))), ',') AS hist_str
        FROM bytes""",
}


def _sql_repetition_ctes(src_select: str) -> str:
    """The Gopher repetition-signal CTE chain (lockstep with
    textstats.repetition_signals: trimmed non-empty lines, shared
    normalization, the _SQL_SHINGLES short-doc idiom generalized to
    n=2/n=5). ``src_select`` provides the (doc_id, text) source —
    planted line structure for the repetition_signals oracle, raw
    documents for corpus_filter. Ends with CTEs lstats/tstats/dstats;
    callers join them to the id spine and round(6)."""
    return f"""src AS ({src_select}),
        lines AS (
            SELECT doc_id, trim(l) AS line FROM (
                SELECT doc_id, unnest(string_split(text, chr(10))) AS l
                FROM src) t
            WHERE trim(l) <> ''),
        lc AS (
            SELECT doc_id, line, count(*) AS c
            FROM lines GROUP BY doc_id, line),
        lstats AS (
            SELECT doc_id,
                   sum(CASE WHEN c >= 2 THEN c ELSE 0 END)::DOUBLE
                       / sum(c) AS dlf,
                   sum((CASE WHEN c >= 2 THEN c ELSE 0 END)
                       * len(line))::DOUBLE
                       / sum(c * len(line)) AS dlcf
            FROM lc GROUP BY doc_id),
        toks AS (
            SELECT doc_id, len({_SQL_NORM}) AS nchars,
                   string_split({_SQL_NORM}, ' ') AS tk
            FROM src),
        g2 AS (
            SELECT doc_id, nchars, unnest(
                CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
                     ELSE list_transform(
                         generate_series(1, len(tk) - 1),
                         i -> array_to_string(tk[i:i+1], ' '))
                END) AS g
            FROM toks),
        g2c AS (
            SELECT doc_id, nchars, g, count(*) AS c FROM g2
            WHERE g <> '' GROUP BY doc_id, nchars, g),
        tstats AS (
            SELECT doc_id,
                   least(1.0, max(c * len(g))::DOUBLE / max(nchars))
                       AS tncf
            FROM g2c GROUP BY doc_id),
        g5 AS (
            SELECT doc_id, unnest(
                CASE WHEN len(tk) < 5 THEN [array_to_string(tk, ' ')]
                     ELSE list_transform(
                         generate_series(1, len(tk) - 4),
                         i -> array_to_string(tk[i:i+4], ' '))
                END) AS g
            FROM toks),
        g5c AS (
            SELECT doc_id, g, count(*) AS c FROM g5
            WHERE g <> '' GROUP BY doc_id, g),
        dstats AS (
            SELECT doc_id,
                   sum((CASE WHEN c >= 2 THEN c ELSE 0 END)
                       * len(g))::DOUBLE
                       / sum(c * len(g)) AS dncf
            FROM g5c GROUP BY doc_id)"""


_SQL_REP_PLANTED_SRC = """
            SELECT doc_id,
                   text || chr(10) || substr(text, 1, 40)
                        || chr(10) || 'unique tail ' || doc_id
                        || CASE WHEN doc_id % 3 = 0
                                THEN chr(10) || substr(text, 1, 40)
                                ELSE '' END AS text
            FROM documents"""

# the incremental path's output is identical to the direct path by
# construction (the index stores exactly the eval window-hash set), so
# the oracle is shared verbatim
# C4 three-sentence-span dedup (r10): the dedup_substrings sweep at
# sentence granularity — sentinel-insertion segmentation (the
# split_sentences chain), span key = md5 of per-sentence normalizations
# joined with chr(2) (all-blank spans get unique 'u|' keys), total
# count >= 2, canonical = first (id, pos), keeper-protected coverage
# sweep, rebuild via string_agg of surviving sentences with ' '. The
# boundary regex is spelled as a plain string (\1 capture, chr(1)
# sentinel — the split_sentences oracle convention).
_SQL_SENT_SPLIT = (
    "string_split(regexp_replace(text,"
    " '([.!?][\"'')\\]]?) ([A-Z0-9])',"
    " '\\1' || chr(1) || '\\2', 'g'), chr(1))"
)
_SQL_SENT_NORM = (
    "trim(regexp_replace(regexp_replace(lower(s), '"
    + _SQL_PUNCT
    + "', ' ', 'g'), '\\s+', ' ', 'g'))"
)

def _sql_dedup_sentences(out_where: str = "") -> str:
    """The full sentence-span keep-one-copy chain; ``out_where``
    restricts the output rows — the incremental twin is the SAME chain
    over (indexed corpus ∪ batch) filtered to batch docs (index ids
    all precede batch ids, so index-side canonicals dominate exactly
    like the stored keys do)."""
    return f"""
        WITH src AS (
            SELECT doc_id,
                   substr(text, 1, 50)
                   || CASE WHEN doc_id % 6 = 0
                           THEN '. Aaa shared span. Bbb shared span.'
                                || ' Ccc shared span. And then '
                           ELSE '' END
                   || CASE WHEN doc_id % 11 = 0
                           THEN '. Wda ' || substr(text, 1, 20)
                                || '. Wdb own rep. Wdc own rep. Wda '
                                || substr(text, 1, 20)
                                || '. Wdb own rep. Wdc own rep. After that '
                           ELSE '' END
                   || substr(text, 51, 100000) AS text
            FROM documents),
        sents AS (
            SELECT doc_id, {_SQL_SENT_SPLIT} AS sn
            FROM src),
        nrm AS (
            SELECT doc_id, sn,
                   list_transform(sn, s -> {_SQL_SENT_NORM}) AS ns
            FROM sents),
        win AS (
            SELECT doc_id AS id, i - 1 AS pos,
                   least(i + 1, len(sn) - 1) AS e,
                   array_to_string(ns[i:least(i + 2, len(ns))], chr(2)) AS sp
            FROM nrm,
                 unnest(generate_series(1, greatest(len(sn) - 2, 1))) AS t(i)),
        keyd AS (
            SELECT id, pos, e,
                   CASE WHEN replace(sp, chr(2), '') = ''
                        THEN 'u|' || id::VARCHAR || '|' || pos::VARCHAR
                        ELSE md5(sp) END AS sh
            FROM win),
        occ AS (
            SELECT id, pos, e,
                   row_number() OVER (PARTITION BY sh ORDER BY id, pos) = 1
                       AS kept,
                   count(*) OVER (PARTITION BY sh) AS c
            FROM keyd),
        marked AS (SELECT id, pos, e, kept FROM occ WHERE c >= 2),
        ev AS (
            SELECT id, pos AS b,
                   CASE WHEN kept THEN 0 ELSE 1 END AS dd,
                   CASE WHEN kept THEN 1 ELSE 0 END AS kd
            FROM marked
            UNION ALL
            SELECT id, e + 1,
                   CASE WHEN kept THEN 0 ELSE -1 END,
                   CASE WHEN kept THEN -1 ELSE 0 END
            FROM marked),
        evg AS (
            SELECT id, b, sum(dd) AS dd, sum(kd) AS kd
            FROM ev GROUP BY id, b),
        sweep AS (
            SELECT id, b,
                   sum(dd) OVER (PARTITION BY id ORDER BY b) AS dcov,
                   sum(kd) OVER (PARTITION BY id ORDER BY b) AS kcov,
                   lead(b) OVER (PARTITION BY id ORDER BY b) AS nb
            FROM evg),
        seg AS (
            SELECT id, b AS s, nb - 1 AS e FROM sweep
            WHERE nb IS NOT NULL AND dcov > 0 AND kcov = 0),
        mrg AS (
            SELECT id, s, e,
                   max(e) OVER (PARTITION BY id ORDER BY s
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS pe
            FROM seg),
        isl AS (
            SELECT id, s, e,
                   sum(CASE WHEN pe IS NULL OR s > pe + 1
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY id ORDER BY s) AS island
            FROM mrg),
        spans AS (
            SELECT id, min(s) AS rs, max(e) AS re
            FROM isl GROUP BY id, island),
        sente AS (
            SELECT doc_id, i - 1 AS pos, sn[i] AS sent, len(sn) AS sl
            FROM sents, unnest(generate_series(1, len(sn))) AS t(i)),
        keep AS (
            SELECT t.doc_id, t.pos, t.sent
            FROM sente t
            WHERE NOT EXISTS (
                SELECT 1 FROM spans s
                WHERE s.id = t.doc_id AND t.pos BETWEEN s.rs AND s.re)),
        agg AS (
            SELECT doc_id, string_agg(sent, ' ' ORDER BY pos) AS text,
                   count(*) AS nkept
            FROM keep GROUP BY doc_id),
        sl AS (SELECT doc_id, len(sn) AS sl FROM sents)
        SELECT sl.doc_id, coalesce(a.text, '') AS text,
               (sl.sl - coalesce(a.nkept, 0))::BIGINT AS removed_sentences
        FROM sl LEFT JOIN agg a USING (doc_id){out_where}"""


LLM_ORACLE_SQL["dedup_sentences"] = _sql_dedup_sentences()
# persisted-index incremental (r10): identical chain over
# (indexed corpus = docs < 250, batch = docs >= 250), batch docs only
LLM_ORACLE_SQL["dedup_sentences_incremental"] = _sql_dedup_sentences(
    "\n        WHERE sl.doc_id >= 250"
)


# the read-path probe reproduces ivf_drift exactly (metrics are a pure
# function of the stored assignments, same build params) — shared oracle
LLM_ORACLE_SQL["ivf_drift_read"] = LLM_ORACLE_SQL["ivf_drift"]

# ---------------------------------------------------------------- r12
# cap-saturation observability + tiered escalation: shared planted CTE
# (125 fixed docs become one 12-token passage, df = 125 > the 100 cap)

_SQL_CAPPLANT = """capplant AS (
            SELECT doc_id,
                   CASE WHEN doc_id < 500 AND doc_id % 4 = 0
                        THEN 'Capsat alpha bravo charlie delta echo'
                             || ' foxtrot golf hotel india juliet kilo'
                        ELSE text END AS text
            FROM documents)"""

# one-row cap-hit rollup over a (id/doc_id, key) posting CTE — keep in
# lockstep with dedup._cap_report
def _sql_cap_rollup(postings: str, key: str, max_df: int) -> str:
    return f"""
        dfc AS (SELECT {key}, count(*) AS df FROM {postings}
                GROUP BY {key}),
        s AS (SELECT count(*)::BIGINT AS n_keys,
                     sum((df > {max_df})::INT)::BIGINT AS capped_keys,
                     sum(df)::BIGINT AS n_postings,
                     sum(CASE WHEN df > {max_df} THEN df
                              ELSE 0 END)::BIGINT AS dropped_postings
              FROM dfc)
        SELECT {max_df}::BIGINT AS max_df, n_keys, capped_keys,
               (CASE WHEN n_keys = 0 THEN 0
                     ELSE capped_keys * 1000 // n_keys END)::BIGINT
                   AS capped_key_mils,
               n_postings, dropped_postings,
               (CASE WHEN n_postings = 0 THEN 0
                     ELSE dropped_postings * 1000 // n_postings
                END)::BIGINT AS dropped_mass_mils
        FROM s"""


LLM_ORACLE_SQL["shingle_cap_report"] = (
    "WITH "
    + _SQL_CAPPLANT
    + ","
    + _sql_shingles("capplant").strip().rstrip()
    + ","
    + _sql_cap_rollup("shingles", "sh", 100)
)

LLM_ORACLE_SQL["winnow_cap_report"] = (
    "WITH "
    + _SQL_CAPPLANT
    + ",\n        "
    + _sql_winnow_ctes("capplant")
    + """,
        sel AS (
            SELECT DISTINCT doc_id AS id,
                   (mc // 1048576)::BIGINT AS fp
            FROM wmin WHERE pos <= greatest(ng - 4, 0)),"""
    + _sql_cap_rollup("sel", "fp", 100).lstrip("\n").lstrip()
)

# the tier chooser stated in SQL — keep in lockstep with
# dedup._choose_df_cap (tiers (100, 400), dropped-mass budget 1 mil)
_SQL_TIER_CHOICE = """
        tiers(cap) AS (VALUES (100::BIGINT), (400::BIGINT)),
        per AS (SELECT cap,
                       sum(CASE WHEN df > cap THEN df ELSE 0 END)
                           AS dropped,
                       sum(df) AS total
                FROM dfc, tiers GROUP BY cap),
        ch AS (SELECT coalesce(
                   min(CASE WHEN dropped * 1000 // total <= 1
                            THEN cap END),
                   max(cap)) AS cap
               FROM per)"""

LLM_ORACLE_SQL["dedup_containment_escalated"] = (
    "WITH "
    + _SQL_CAPPLANT
    + ","
    + _sql_shingles("capplant").strip()
    + """,
        dfc AS (SELECT sh, count(*) AS df FROM shingles GROUP BY sh),"""
    + _SQL_TIER_CHOICE
    + """,
        sizes AS (SELECT id, count(*) AS sz FROM shingles GROUP BY id),
        kept AS (
            SELECT s.id, s.sh FROM shingles s
            JOIN dfc d ON s.sh = d.sh
            CROSS JOIN ch WHERE d.df <= ch.cap),
        inter AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
            FROM kept a JOIN kept b ON a.sh = b.sh AND a.id < b.id
            GROUP BY a.id, b.id),
        scored AS (
            SELECT id_a, id_b, i, sa.sz AS sz_a, sb.sz AS sz_b
            FROM inter
            JOIN sizes sa ON sa.id = id_a
            JOIN sizes sb ON sb.id = id_b),
        dirs AS (
            SELECT id_a AS id_sub, id_b AS id_super,
                   round(i / sz_a::DOUBLE, 6) AS containment
            FROM scored
            UNION ALL
            SELECT id_b, id_a, round(i / sz_b::DOUBLE, 6)
            FROM scored)
        SELECT id_sub, id_super, containment
        FROM dirs WHERE containment >= 0.8"""
)

LLM_ORACLE_SQL["winnow_pairs_escalated"] = (
    "WITH "
    + _SQL_CAPPLANT
    + ",\n        "
    + _sql_winnow_ctes("capplant")
    + """,
        sel AS (
            SELECT DISTINCT doc_id AS id,
                   (mc // 1048576)::BIGINT AS fp
            FROM wmin WHERE pos <= greatest(ng - 4, 0)),
        dfc AS (SELECT fp, count(*) AS df FROM sel GROUP BY fp),"""
    + _SQL_TIER_CHOICE
    + """,
        kept AS (
            SELECT s.id, s.fp FROM sel s
            JOIN dfc d ON s.fp = d.fp
            CROSS JOIN ch WHERE d.df <= ch.cap)
        SELECT id_a, id_b, n_shared FROM (
            SELECT a.id AS id_a, b.id AS id_b,
                   count(*)::BIGINT AS n_shared
            FROM kept a JOIN kept b
              ON a.fp = b.fp AND a.id < b.id
            GROUP BY a.id, b.id) t
        WHERE n_shared >= 2"""
)

# ---------------------------------------------------------------- r13
# bounded winnow output + truncation pricing — shared escalated-pair
# CTE chain (the winnow_pairs_escalated oracle up to the pair frame)

_SQL_WINNOW_ESC_KEPT = (
    _SQL_CAPPLANT
    + ",\n        "
    + _sql_winnow_ctes("capplant")
    + """,
        sel AS (
            SELECT DISTINCT doc_id AS id,
                   (mc // 1048576)::BIGINT AS fp
            FROM wmin WHERE pos <= greatest(ng - 4, 0)),
        dfc AS (SELECT fp, count(*) AS df FROM sel GROUP BY fp),"""
    + _SQL_TIER_CHOICE
    + """,
        kept AS (
            SELECT s.id, s.fp FROM sel s
            JOIN dfc d ON s.fp = d.fp
            CROSS JOIN ch WHERE d.df <= ch.cap)"""
)

_SQL_WINNOW_ESC_PAIRS = (
    _SQL_WINNOW_ESC_KEPT
    + """,
        pairs AS (
            SELECT id_a, id_b, n_shared FROM (
                SELECT a.id AS id_a, b.id AS id_b,
                       count(*)::BIGINT AS n_shared
                FROM kept a JOIN kept b
                  ON a.fp = b.fp AND a.id < b.id
                GROUP BY a.id, b.id) t
            WHERE n_shared >= 2),
        sym AS (
            SELECT id_a AS id, id_b AS nbr, n_shared FROM pairs
            UNION ALL
            SELECT id_b, id_a, n_shared FROM pairs)"""
)

# per-doc top-5 strongest neighbors, union semantics — keep in lockstep
# with dedup.winnow_pairs_bounded
LLM_ORACLE_SQL["winnow_pairs_bounded"] = (
    "WITH "
    + _SQL_WINNOW_ESC_PAIRS
    + """,
        ranked AS (
            SELECT id, nbr, n_shared,
                   row_number() OVER (PARTITION BY id
                                      ORDER BY n_shared DESC, nbr ASC)
                       AS rn
            FROM sym)
        SELECT DISTINCT least(id, nbr) AS id_a,
               greatest(id, nbr) AS id_b, n_shared
        FROM ranked WHERE rn <= 5"""
)

# keep in lockstep with dedup.winnow_bounded_report
LLM_ORACLE_SQL["winnow_bounded_report"] = (
    "WITH "
    + _SQL_WINNOW_ESC_PAIRS
    + """,
        fullc AS (SELECT count(*)::BIGINT AS n_pairs_full FROM pairs),
        degs AS (SELECT id, count(*) AS deg FROM sym GROUP BY id),
        dstats AS (
            SELECT count(*)::BIGINT AS n_docs_paired,
                   coalesce(sum((deg > 5)::INT), 0)::BIGINT
                       AS docs_truncated,
                   coalesce(max(deg), 0)::BIGINT AS max_degree
            FROM degs),
        ranked AS (
            SELECT id, nbr,
                   row_number() OVER (PARTITION BY id
                                      ORDER BY n_shared DESC, nbr ASC)
                       AS rn
            FROM sym),
        keptc AS (
            SELECT count(*)::BIGINT AS n_pairs_kept FROM (
                SELECT DISTINCT least(id, nbr), greatest(id, nbr)
                FROM ranked WHERE rn <= 5) t)
        SELECT 5::BIGINT AS per_doc_k, n_pairs_full, n_pairs_kept,
               (n_pairs_full - n_pairs_kept)::BIGINT AS truncated_pairs,
               (CASE WHEN n_pairs_full = 0 THEN 0
                     ELSE (n_pairs_full - n_pairs_kept) * 1000
                          // n_pairs_full END)::BIGINT AS truncated_mils,
               n_docs_paired, docs_truncated, max_degree
        FROM fullc, dstats, keptc"""
)

# sampled truncation pricing of the bounded winnow stream (r14 —
# VERDICT r13 ask 1): the shared kept-postings chain, then ONLY pairs
# touching md5-sampled docs — keep in lockstep with
# dedup.winnow_bounded_report_estimate (per_doc_k=5, sample_inv=4)
LLM_ORACLE_SQL["winnow_bounded_report_estimate"] = (
    "WITH "
    + _SQL_WINNOW_ESC_KEPT
    + """,
        sampled AS (
            SELECT id, fp FROM kept
            WHERE ('0x' || substr(md5(id::VARCHAR), 1, 10))::BIGINT
                  % 4 = 0),
        nbrs AS (
            SELECT id, nbr FROM (
                SELECT s.id, o.id AS nbr, count(*)::BIGINT AS n_shared
                FROM sampled s JOIN kept o
                  ON s.fp = o.fp AND s.id <> o.id
                GROUP BY s.id, o.id) t
            WHERE n_shared >= 2),
        degs AS (SELECT id, count(*) AS deg FROM nbrs GROUP BY id),
        stats AS (
            SELECT count(*)::BIGINT AS sampled_docs_paired,
                   coalesce(sum(deg), 0)::BIGINT AS sampled_deg_sum,
                   coalesce(sum(greatest(deg - 5, 0)), 0)::BIGINT
                       AS sampled_over_k_slots,
                   coalesce(sum((deg > 5)::INT), 0)::BIGINT
                       AS docs_trunc,
                   coalesce(max(deg), 0)::BIGINT AS sampled_max_degree
            FROM degs)
        SELECT 5::BIGINT AS per_doc_k, 4::BIGINT AS sample_inv,
               sampled_docs_paired, sampled_deg_sum,
               sampled_over_k_slots, sampled_max_degree,
               (sampled_deg_sum * 4 // 2)::BIGINT AS est_n_pairs_full,
               (sampled_docs_paired * 4)::BIGINT AS est_docs_paired,
               (docs_trunc * 4)::BIGINT AS est_docs_truncated,
               (sampled_over_k_slots * 4 // 2)::BIGINT
                   AS est_truncated_pairs,
               (CASE WHEN sampled_deg_sum = 0 THEN 0
                     ELSE (sampled_over_k_slots * 4 // 2) * 1000
                          // (sampled_deg_sum * 4 // 2) END)::BIGINT
                   AS est_truncated_mils
        FROM stats"""
)

# winnow-side estimated-missed-pairs: the shared estimator core over
# the MOSS-selected fingerprint postings — the sampling bucket is the
# fp itself; keep in lockstep with dedup.winnow_cap_recall_estimate
# (k=5, w=4, max_df=100, sample_inv=8, expand_max_df=2000)
LLM_ORACLE_SQL["winnow_cap_recall_estimate"] = (
    "WITH "
    + _SQL_CAPPLANT
    + ",\n        "
    + _sql_winnow_ctes("capplant")
    + """,
        sel AS (
            SELECT DISTINCT doc_id AS id,
                   (mc // 1048576)::BIGINT AS fp
            FROM wmin WHERE pos <= greatest(ng - 4, 0)),
        dfc AS (
            SELECT fp, count(*) AS df, fp AS h40
            FROM sel GROUP BY fp HAVING count(*) > 100),
        stats AS (
            SELECT count(*)::BIGINT AS capped_keys,
                   coalesce(sum(df * (df - 1) // 2), 0)::BIGINT
                       AS capped_pair_slots_exact,
                   coalesce(sum((h40 % 8 = 0)::INT), 0)::BIGINT
                       AS sampled_keys,
                   coalesce(sum((h40 % 8 = 0 AND df <= 2000)::INT),
                            0)::BIGINT AS expanded_keys,
                   coalesce(sum((h40 % 8 = 0 AND df > 2000)::INT),
                            0)::BIGINT AS mega_keys,
                   coalesce(sum(CASE WHEN h40 % 8 = 0 AND df > 2000
                                     THEN df * (df - 1) // 2 END),
                            0)::BIGINT AS mega_pair_slots
            FROM dfc),
        expandable AS (
            SELECT fp FROM dfc WHERE h40 % 8 = 0 AND df <= 2000),
        kp AS (SELECT s.id, s.fp FROM sel s
               JOIN expandable e USING (fp)),
        sp AS (
            SELECT count(*)::BIGINT AS sampled_pairs_distinct FROM (
                SELECT DISTINCT a.id AS id_a, b.id AS id_b
                FROM kp a JOIN kp b
                  ON a.fp = b.fp AND a.id < b.id) t)
        SELECT 100::BIGINT AS max_df, 8::BIGINT AS sample_inv,
               2000::BIGINT AS expand_max_df, capped_keys, sampled_keys,
               expanded_keys, mega_keys, sampled_pairs_distinct,
               mega_pair_slots,
               (8 * (sampled_pairs_distinct + mega_pair_slots))::BIGINT
                   AS est_capped_pairs,
               capped_pair_slots_exact
        FROM stats, sp"""
)

# persisted winnow-index incremental pairs: the FULL direct chain over
# the planted corpus (df over the union — exactly what the incremental
# path computes), restricted to batch-touching pairs — keep in lockstep
# with dedup.winnow_index_pairs (index = doc_id < 250, batch >= 250)
LLM_ORACLE_SQL["winnow_pairs_incremental"] = (
    """WITH wincsrc AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 83 = 0
                        THEN 'Winc alpha bravo charlie delta echo'
                             || ' foxtrot golf hotel india'
                        ELSE text END AS text
            FROM documents),
        """
    + _sql_winnow_ctes("wincsrc")
    + """,
        sel AS (
            SELECT DISTINCT doc_id AS id,
                   (mc // 1048576)::BIGINT AS fp
            FROM wmin WHERE pos <= greatest(ng - 4, 0)),
        kept AS (
            SELECT s.id, s.fp FROM sel s
            JOIN (SELECT fp FROM sel GROUP BY fp
                  HAVING count(*) <= 100) c
              ON s.fp = c.fp)
        SELECT id_a, id_b, n_shared FROM (
            SELECT a.id AS id_a, b.id AS id_b,
                   count(*)::BIGINT AS n_shared
            FROM kept a JOIN kept b
              ON a.fp = b.fp AND a.id < b.id
            GROUP BY a.id, b.id) t
        WHERE n_shared >= 2 AND (id_a >= 250 OR id_b >= 250)"""
)

# the factored per-doc top-k bound applied to the jaccard family —
# keep in lockstep with dedup.pairs_topk_bounded over
# dedup.ngram_jaccard_pairs (%41 plant, n=3, threshold 0.6,
# per_doc_k=3)
LLM_ORACLE_SQL["jaccard_pairs_bounded"] = f"""
        WITH src AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 41 = 0
                        THEN 'Contain alpha bravo charlie delta echo'
                        WHEN doc_id % 41 = 1
                        THEN 'Contain alpha bravo charlie delta echo'
                             || ' foxtrot golf hotel india juliet kilo'
                             || ' lima'
                        ELSE text END AS text
            FROM documents),
        {_sql_shingles("src").strip()},
        sizes AS (SELECT id, count(*) AS sz FROM shingles GROUP BY id),
        kept AS (
            SELECT s.id, s.sh FROM shingles s
            JOIN (SELECT sh FROM shingles GROUP BY sh
                  HAVING count(*) <= 100) c
              ON s.sh = c.sh),
        inter AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
            FROM kept a JOIN kept b ON a.sh = b.sh AND a.id < b.id
            GROUP BY a.id, b.id),
        pairs AS (
            SELECT id_a, id_b,
                   round(i / (sa.sz + sb.sz - i)::DOUBLE, 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.id = id_a
            JOIN sizes sb ON sb.id = id_b
            WHERE i / (sa.sz + sb.sz - i)::DOUBLE >= 0.6),
        sym AS (
            SELECT id_a AS id, id_b AS nbr, jaccard FROM pairs
            UNION ALL
            SELECT id_b, id_a, jaccard FROM pairs),
        ranked AS (
            SELECT id, nbr, jaccard,
                   row_number() OVER (PARTITION BY id
                                      ORDER BY jaccard DESC, nbr ASC)
                       AS rn
            FROM sym)
        SELECT DISTINCT least(id, nbr) AS id_a,
               greatest(id, nbr) AS id_b, jaccard
        FROM ranked WHERE rn <= 3"""

# the factored per-doc top-k bound applied to the MINHASH family (r14
# — VERDICT r13 ask 5): the full portable banded-LSH chain over the
# %41 hub-clique plant, then the shared sym/ranked/union-keep bound —
# keep in lockstep with dedup.pairs_topk_bounded over
# dedup.minhash_lsh_pairs (portable=True, threshold 0.5, per_doc_k=3)
LLM_ORACLE_SQL["minhash_pairs_bounded"] = f"""
        WITH src AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 41 = 0
                        THEN 'Contain alpha bravo charlie delta echo'
                        WHEN doc_id % 41 = 1
                        THEN 'Contain alpha bravo charlie delta echo'
                             || ' foxtrot golf hotel india juliet kilo'
                             || ' lima'
                        ELSE text END AS text
            FROM documents),
        {_sql_minhash_banded_ctes("src")},
        cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                            a.sig AS sa, b.sig AS sb
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bh = b.bh AND a.id < b.id),
        pairs AS (
            SELECT id_a, id_b, est_jaccard FROM (
                SELECT id_a, id_b,
                       round(list_sum(list_transform(list_zip(sa, sb),
                                                     x -> (x[1] = x[2])::INT))
                             / 64.0, 6) AS est_jaccard
                FROM cand) t
            WHERE est_jaccard >= 0.5),
        sym AS (
            SELECT id_a AS id, id_b AS nbr, est_jaccard FROM pairs
            UNION ALL
            SELECT id_b, id_a, est_jaccard FROM pairs),
        ranked AS (
            SELECT id, nbr, est_jaccard,
                   row_number() OVER (PARTITION BY id
                                      ORDER BY est_jaccard DESC, nbr ASC)
                       AS rn
            FROM sym)
        SELECT DISTINCT least(id, nbr) AS id_a,
               greatest(id, nbr) AS id_b, est_jaccard
        FROM ranked WHERE rn <= 3"""

# estimated-missed-pairs audit of the stop-shingle cap — keep in
# lockstep with dedup.shingle_cap_recall_estimate (max_df=100,
# sample_inv=8, expand_max_df=2000)
LLM_ORACLE_SQL["shingle_cap_recall_estimate"] = (
    "WITH "
    + _SQL_CAPPLANT
    + ","
    + _sql_shingles("capplant").strip()
    + """,
        dfc AS (
            SELECT sh, count(*) AS df,
                   ('0x' || substr(md5(sh), 1, 10))::BIGINT AS h40
            FROM shingles GROUP BY sh HAVING count(*) > 100),
        stats AS (
            SELECT count(*)::BIGINT AS capped_keys,
                   coalesce(sum(df * (df - 1) // 2), 0)::BIGINT
                       AS capped_pair_slots_exact,
                   coalesce(sum((h40 % 8 = 0)::INT), 0)::BIGINT
                       AS sampled_keys,
                   coalesce(sum((h40 % 8 = 0 AND df <= 2000)::INT),
                            0)::BIGINT AS expanded_keys,
                   coalesce(sum((h40 % 8 = 0 AND df > 2000)::INT),
                            0)::BIGINT AS mega_keys,
                   coalesce(sum(CASE WHEN h40 % 8 = 0 AND df > 2000
                                     THEN df * (df - 1) // 2 END),
                            0)::BIGINT AS mega_pair_slots
            FROM dfc),
        expandable AS (
            SELECT sh FROM dfc WHERE h40 % 8 = 0 AND df <= 2000),
        kp AS (SELECT s.id, s.sh FROM shingles s
               JOIN expandable e USING (sh)),
        sp AS (
            SELECT count(*)::BIGINT AS sampled_pairs_distinct FROM (
                SELECT DISTINCT a.id AS id_a, b.id AS id_b
                FROM kp a JOIN kp b
                  ON a.sh = b.sh AND a.id < b.id) t)
        SELECT 100::BIGINT AS max_df, 8::BIGINT AS sample_inv,
               2000::BIGINT AS expand_max_df, capped_keys, sampled_keys,
               expanded_keys, mega_keys, sampled_pairs_distinct,
               mega_pair_slots,
               (8 * (sampled_pairs_distinct + mega_pair_slots))::BIGINT
                   AS est_capped_pairs,
               capped_pair_slots_exact
        FROM stats, sp"""
)


# sentence-span decontamination (r10): the dedup_sentences chain minus
# keeper protection — train spans semi-matched against the eval split's
# DISTINCT span keys, every match dropped coverage (kept ≡ false, so
# kcov is identically 0 through the shared sweep shape)
LLM_ORACLE_SQL["decontaminate_sentences"] = f"""
        WITH src AS (
            SELECT doc_id,
                   substr(text, 1, 50)
                   || CASE WHEN doc_id % 9 = 0 OR doc_id % 50 = 0
                           THEN '. Canary alpha one. Canary bravo two.'
                                || ' Canary charlie three. And then '
                           ELSE '' END
                   || substr(text, 51, 100000) AS text
            FROM documents),
        sents AS (
            SELECT doc_id, {_SQL_SENT_SPLIT} AS sn
            FROM src WHERE doc_id % 50 <> 0),
        nrm AS (
            SELECT doc_id, sn,
                   list_transform(sn, s -> {_SQL_SENT_NORM}) AS ns
            FROM sents),
        win AS (
            SELECT doc_id AS id, i - 1 AS pos,
                   least(i + 1, len(sn) - 1) AS e,
                   array_to_string(ns[i:least(i + 2, len(ns))], chr(2)) AS sp
            FROM nrm,
                 unnest(generate_series(1, greatest(len(sn) - 2, 1))) AS t(i)),
        keyd AS (
            SELECT id, pos, e, md5(sp) AS sh
            FROM win WHERE replace(sp, chr(2), '') <> ''),
        esents AS (
            SELECT doc_id, {_SQL_SENT_SPLIT} AS sn
            FROM src WHERE doc_id % 50 = 0),
        enrm AS (
            SELECT doc_id, sn,
                   list_transform(sn, s -> {_SQL_SENT_NORM}) AS ns
            FROM esents),
        ewin AS (
            SELECT array_to_string(ns[i:least(i + 2, len(ns))], chr(2)) AS sp
            FROM enrm,
                 unnest(generate_series(1, greatest(len(sn) - 2, 1))) AS t(i)),
        ekey AS (
            SELECT DISTINCT md5(sp) AS sh
            FROM ewin WHERE replace(sp, chr(2), '') <> ''),
        marked AS (
            SELECT k.id, k.pos, k.e, false AS kept
            FROM keyd k JOIN ekey USING (sh)),
        ev AS (
            SELECT id, pos AS b,
                   CASE WHEN kept THEN 0 ELSE 1 END AS dd,
                   CASE WHEN kept THEN 1 ELSE 0 END AS kd
            FROM marked
            UNION ALL
            SELECT id, e + 1,
                   CASE WHEN kept THEN 0 ELSE -1 END,
                   CASE WHEN kept THEN -1 ELSE 0 END
            FROM marked),
        evg AS (
            SELECT id, b, sum(dd) AS dd, sum(kd) AS kd
            FROM ev GROUP BY id, b),
        sweep AS (
            SELECT id, b,
                   sum(dd) OVER (PARTITION BY id ORDER BY b) AS dcov,
                   sum(kd) OVER (PARTITION BY id ORDER BY b) AS kcov,
                   lead(b) OVER (PARTITION BY id ORDER BY b) AS nb
            FROM evg),
        seg AS (
            SELECT id, b AS s, nb - 1 AS e FROM sweep
            WHERE nb IS NOT NULL AND dcov > 0 AND kcov = 0),
        mrg AS (
            SELECT id, s, e,
                   max(e) OVER (PARTITION BY id ORDER BY s
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS pe
            FROM seg),
        isl AS (
            SELECT id, s, e,
                   sum(CASE WHEN pe IS NULL OR s > pe + 1
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY id ORDER BY s) AS island
            FROM mrg),
        spans AS (
            SELECT id, min(s) AS rs, max(e) AS re
            FROM isl GROUP BY id, island),
        sente AS (
            SELECT doc_id, i - 1 AS pos, sn[i] AS sent, len(sn) AS sl
            FROM sents, unnest(generate_series(1, len(sn))) AS t(i)),
        keep AS (
            SELECT t.doc_id, t.pos, t.sent
            FROM sente t
            WHERE NOT EXISTS (
                SELECT 1 FROM spans s
                WHERE s.id = t.doc_id AND t.pos BETWEEN s.rs AND s.re)),
        agg AS (
            SELECT doc_id, string_agg(sent, ' ' ORDER BY pos) AS text,
                   count(*) AS nkept
            FROM keep GROUP BY doc_id),
        sl AS (SELECT doc_id, len(sn) AS sl FROM sents)
        SELECT sl.doc_id, coalesce(a.text, '') AS text,
               (sl.sl - coalesce(a.nkept, 0))::BIGINT AS removed_sentences
        FROM sl LEFT JOIN agg a USING (doc_id)"""

LLM_ORACLE_SQL["contamination_report_incremental"] = LLM_ORACLE_SQL[
    "contamination_report"
]

# IVF recall eval (r10): the two existing chains composed verbatim as
# subqueries (DuckDB accepts statement-level WITH inside a CTE body) +
# the same intersection rollup as the LSH entry
LLM_ORACLE_SQL["ann_recall_eval_ivf"] = f"""
        WITH cand AS (
            SELECT qid, vec_id
            FROM ({LLM_ORACLE_SQL["similarity_ivf"]}) c),
        truth AS (
            SELECT qid, vec_id
            FROM ({LLM_ORACLE_SQL["similarity_bruteforce"]}) b),
        hits AS (
            SELECT t.qid, count(*)::BIGINT AS n_hit
            FROM truth t JOIN cand c
              ON t.qid = c.qid AND t.vec_id = c.vec_id
            GROUP BY t.qid),
        perq AS (
            SELECT qid, count(*)::BIGINT AS n_truth
            FROM truth GROUP BY qid)
        SELECT p.qid, p.n_truth,
               coalesce(h.n_hit, 0)::BIGINT AS n_hit,
               (coalesce(h.n_hit, 0) * 1000 // p.n_truth)::BIGINT
                   AS recall_mils
        FROM perq p LEFT JOIN hits h USING (qid)"""

# the persisted-index read path reproduces ann_recall_eval_ivf exactly
# (query_ivf_index ≡ cosine_topk_ivf over the same corpus/centroids,
# pinned by test) — shared oracle, same pattern as ivf_drift_read
LLM_ORACLE_SQL["ann_recall_eval_ivf_read"] = LLM_ORACLE_SQL[
    "ann_recall_eval_ivf"
]

# the persisted IVF-PQ read path reproduces the in-memory composite
# exactly (query_ivfpq_index ≡ ivfpq_adc_topk at the stored
# centroids/codebooks/params, pinned by test) — shared oracle
LLM_ORACLE_SQL["similarity_ivfpq_read"] = LLM_ORACLE_SQL["similarity_ivfpq"]

# two-stage IVF-PQ (r13): the ADC chain at shortlist depth 40 as the
# candidate subquery, re-ranked by the exact round(6) cosine every
# exact path shares
LLM_ORACLE_SQL["similarity_ivfpq_rerank"] = f"""
        WITH cand AS (
            SELECT qid, vec_id FROM ({_sql_ivfpq_topk(40)}) s),
        scored AS (
            SELECT c.qid, c.vec_id,
                   round({_sql_cosine('e.embedding', 'q.embedding')}, 6)
                       AS cosine
            FROM cand c
            JOIN embeddings e ON e.vec_id = c.vec_id
            JOIN embeddings q ON q.vec_id = c.qid)
        SELECT qid, vec_id, cosine, rank FROM (
            SELECT qid, vec_id, cosine,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY cosine DESC, vec_id)::BIGINT
                       AS rank
            FROM scored) t
        WHERE rank <= 10"""

LLM_ORACLE_SQL["ann_recall_eval_ivfpq_rerank"] = f"""
        WITH cand AS (
            SELECT qid, vec_id
            FROM ({LLM_ORACLE_SQL["similarity_ivfpq_rerank"]}) c),
        truth AS (
            SELECT qid, vec_id
            FROM ({LLM_ORACLE_SQL["similarity_bruteforce"]}) b),
        hits AS (
            SELECT t.qid, count(*)::BIGINT AS n_hit
            FROM truth t JOIN cand c
              ON t.qid = c.qid AND t.vec_id = c.vec_id
            GROUP BY t.qid),
        perq AS (
            SELECT qid, count(*)::BIGINT AS n_truth
            FROM truth GROUP BY qid)
        SELECT p.qid, p.n_truth,
               coalesce(h.n_hit, 0)::BIGINT AS n_hit,
               (coalesce(h.n_hit, 0) * 1000 // p.n_truth)::BIGINT
                   AS recall_mils
        FROM perq p LEFT JOIN hits h USING (qid)"""

# refined-codebook tier (r14, VERDICT r13 ask 3): the same chains with
# the k-means cb — only the codebook CTE differs, stated by the shared
# builder
LLM_ORACLE_SQL["pq_codebooks_refined"] = f"""
        WITH {_sql_pq_ctes(refined=True)}
        SELECT s, c, array_to_string(cq, ',') AS cq_str FROM cb"""

LLM_ORACLE_SQL["similarity_ivfpq_refined"] = _sql_ivfpq_topk(
    10, refined=True
)

LLM_ORACLE_SQL["similarity_ivfpq_rerank_refined"] = f"""
        WITH cand AS (
            SELECT qid, vec_id FROM ({_sql_ivfpq_topk(40, refined=True)}) s),
        scored AS (
            SELECT c.qid, c.vec_id,
                   round({_sql_cosine('e.embedding', 'q.embedding')}, 6)
                       AS cosine
            FROM cand c
            JOIN embeddings e ON e.vec_id = c.vec_id
            JOIN embeddings q ON q.vec_id = c.qid)
        SELECT qid, vec_id, cosine, rank FROM (
            SELECT qid, vec_id, cosine,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY cosine DESC, vec_id)::BIGINT
                       AS rank
            FROM scored) t
        WHERE rank <= 10"""

LLM_ORACLE_SQL["ann_recall_eval_ivfpq_rerank_refined"] = f"""
        WITH cand AS (
            SELECT qid, vec_id
            FROM ({LLM_ORACLE_SQL["similarity_ivfpq_rerank_refined"]}) c),
        truth AS (
            SELECT qid, vec_id
            FROM ({LLM_ORACLE_SQL["similarity_bruteforce"]}) b),
        hits AS (
            SELECT t.qid, count(*)::BIGINT AS n_hit
            FROM truth t JOIN cand c
              ON t.qid = c.qid AND t.vec_id = c.vec_id
            GROUP BY t.qid),
        perq AS (
            SELECT qid, count(*)::BIGINT AS n_truth
            FROM truth GROUP BY qid)
        SELECT p.qid, p.n_truth,
               coalesce(h.n_hit, 0)::BIGINT AS n_hit,
               (coalesce(h.n_hit, 0) * 1000 // p.n_truth)::BIGINT
                   AS recall_mils
        FROM perq p LEFT JOIN hits h USING (qid)"""

# IVF-PQ recall eval (r13): the composite + brute chains as subqueries
# with the same intersection rollup as the IVF/LSH recall entries
LLM_ORACLE_SQL["ann_recall_eval_ivfpq"] = f"""
        WITH cand AS (
            SELECT qid, vec_id
            FROM ({LLM_ORACLE_SQL["similarity_ivfpq"]}) c),
        truth AS (
            SELECT qid, vec_id
            FROM ({LLM_ORACLE_SQL["similarity_bruteforce"]}) b),
        hits AS (
            SELECT t.qid, count(*)::BIGINT AS n_hit
            FROM truth t JOIN cand c
              ON t.qid = c.qid AND t.vec_id = c.vec_id
            GROUP BY t.qid),
        perq AS (
            SELECT qid, count(*)::BIGINT AS n_truth
            FROM truth GROUP BY qid)
        SELECT p.qid, p.n_truth,
               coalesce(h.n_hit, 0)::BIGINT AS n_hit,
               (coalesce(h.n_hit, 0) * 1000 // p.n_truth)::BIGINT
                   AS recall_mils
        FROM perq p LEFT JOIN hits h USING (qid)"""

# sentence-granular contamination report (r10): the eval side keeps its
# span POSITIONS (ewin), the train side reduces to a distinct key set,
# and the islands merge from contamination_report runs over sentence
# indices — keep the span CTEs in lockstep with decontaminate_sentences
LLM_ORACLE_SQL["contamination_report_sentences"] = f"""
        WITH src AS (
            SELECT doc_id,
                   substr(text, 1, 50)
                   || CASE WHEN doc_id % 9 = 0 OR doc_id % 50 = 0
                           THEN '. Canary alpha one. Canary bravo two.'
                                || ' Canary charlie three. And then '
                           ELSE '' END
                   || substr(text, 51, 100000) AS text
            FROM documents),
        esents AS (
            SELECT doc_id, {_SQL_SENT_SPLIT} AS sn
            FROM src WHERE doc_id % 50 = 0),
        enrm AS (
            SELECT doc_id, sn,
                   list_transform(sn, s -> {_SQL_SENT_NORM}) AS ns
            FROM esents),
        ewin AS (
            SELECT doc_id AS id, i - 1 AS pos,
                   least(i + 1, len(sn) - 1) AS e,
                   array_to_string(ns[i:least(i + 2, len(ns))], chr(2)) AS sp
            FROM enrm,
                 unnest(generate_series(1, greatest(len(sn) - 2, 1))) AS t(i)),
        ekey AS (
            SELECT id, pos, e, md5(sp) AS sh
            FROM ewin WHERE replace(sp, chr(2), '') <> ''),
        tsents AS (
            SELECT doc_id, {_SQL_SENT_SPLIT} AS sn
            FROM src WHERE doc_id % 50 <> 0),
        tnrm AS (
            SELECT doc_id, sn,
                   list_transform(sn, s -> {_SQL_SENT_NORM}) AS ns
            FROM tsents),
        twin AS (
            SELECT array_to_string(ns[i:least(i + 2, len(ns))], chr(2)) AS sp
            FROM tnrm,
                 unnest(generate_series(1, greatest(len(sn) - 2, 1))) AS t(i)),
        tkey AS (
            SELECT DISTINCT md5(sp) AS sh
            FROM twin WHERE replace(sp, chr(2), '') <> ''),
        hits AS (SELECT k.id, k.pos, k.e FROM ekey k JOIN tkey USING (sh)),
        isl AS (
            SELECT id, pos, e,
                   max(e) OVER (PARTITION BY id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS pe
            FROM hits),
        isl2 AS (
            SELECT id, pos, e,
                   sum(CASE WHEN pe IS NULL OR pos > pe + 1
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY id ORDER BY pos) AS island
            FROM isl),
        spans AS (
            SELECT id, min(pos) AS rs, max(e) AS re
            FROM isl2 GROUP BY id, island),
        cov AS (
            SELECT id, sum(re - rs + 1) AS cov FROM spans GROUP BY id),
        sl AS (SELECT doc_id, len(sn) AS sl FROM esents)
        SELECT sl.doc_id, sl.sl::BIGINT AS n_sentences,
               coalesce(c.cov, 0)::BIGINT AS contaminated_sentences,
               round(coalesce(c.cov, 0) / sl.sl::DOUBLE, 6)
                   AS contaminated_frac
        FROM sl LEFT JOIN cov c ON c.id = sl.doc_id"""
# the persisted-index path reproduces the direct report exactly — the
# stored key set IS the train side's distinct span keys
LLM_ORACLE_SQL["contamination_report_sentences_incremental"] = (
    LLM_ORACLE_SQL["contamination_report_sentences"]
)
LLM_ORACLE_SQL["decontaminate_substrings_incremental"] = LLM_ORACLE_SQL[
    "decontaminate_substrings"
]

LLM_ORACLE_SQL["repetition_signals"] = f"""
        WITH {_sql_repetition_ctes(_SQL_REP_PLANTED_SRC)}
        SELECT d.doc_id,
               round(coalesce(l.dlf, 0), 6) AS dup_line_frac,
               round(coalesce(l.dlcf, 0), 6) AS dup_line_char_frac,
               round(coalesce(t.tncf, 0), 6) AS top_ngram_char_frac,
               round(coalesce(s.dncf, 0), 6) AS dup_ngram_char_frac
        FROM documents d
        LEFT JOIN lstats l ON d.doc_id = l.doc_id
        LEFT JOIN tstats t ON d.doc_id = t.doc_id
        LEFT JOIN dstats s ON d.doc_id = s.doc_id"""

# per-SOURCE portable MinHash + all-pairs positional-equality estimate
# (the signature mins are the exact md5-60bit construction of
# _sql_minhash_portable, grouped by source instead of doc)
LLM_ORACLE_SQL["source_overlap_portable"] = f"""
        WITH {_SQL_SHINGLES},
        srcsh AS (
            SELECT DISTINCT d.source AS src, s.sh
            FROM shingles s JOIN documents d ON s.id = d.doc_id),
        sigs AS (
            SELECT src, [{", ".join(
                f"min(('0x' || substr(md5('{i}|' || sh), 1, 15))::BIGINT)"
                for i in range(64))}] AS sig
            FROM srcsh GROUP BY src)
        SELECT a.src AS source_a, b.src AS source_b,
               round(len(list_filter(list_zip(a.sig, b.sig),
                                     x -> x[1] = x[2])) / 64.0, 6)
                   AS est_jaccard
        FROM sigs a JOIN sigs b ON a.src < b.src"""

# deterministic fractional upsampling: exact-integer md5
# cross-multiplication (the weighted_sample idiom) decides the extra
# copy; epochs unroll with range()
LLM_ORACLE_SQL["upsample_corpus"] = """
        WITH w AS (
            SELECT doc_id, lang,
                   CASE lang WHEN 'de' THEN 2500 WHEN 'fr' THEN 3000
                             WHEN 'en' THEN 400 ELSE 1000 END AS wm,
                   ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h
            FROM documents),
        c AS (
            SELECT doc_id, lang,
                   (wm // 1000)
                   + CASE WHEN h::HUGEINT * 1000
                               < 1152921504606846976::HUGEINT * (wm % 1000)
                          THEN 1 ELSE 0 END AS copies
            FROM w)
        SELECT doc_id, lang, unnest(range(1, copies + 1))::BIGINT AS epoch
        FROM c WHERE copies >= 1"""

# unigram-LM scoring: top-256 vocab by (count desc, token asc), Laplace
# p=(c+1)/(N+V+1), avg(-ln p) per doc, round(6)
LLM_ORACLE_SQL["unigram_nll"] = f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split({_SQL_NORM}, ' ')) AS token
            FROM documents),
        tok2 AS (SELECT * FROM tok WHERE token <> ''),
        counts AS (
            SELECT token, count(*) AS c FROM tok2 GROUP BY token
            ORDER BY c DESC, token LIMIT 256),
        stats AS (
            SELECT sum(c) AS n_mass, count(*) AS v_size FROM counts)
        SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
               round(avg(-ln((coalesce(v.c, 0) + 1.0)
                             / (s.n_mass + s.v_size + 1.0))), 6) AS avg_nll
        FROM tok2 t
        LEFT JOIN counts v USING (token)
        CROSS JOIN stats s
        GROUP BY t.doc_id"""

# Symbol-boundary sentinels, oracle side (r10, ADVICE high — mirrors
# vocab._SYM_OPEN/_SYM_CLOSE exactly): merges apply as literal replaces
# over the WRAPPED form chr(2)||sym||chr(3) per symbol, so a pattern can
# only match two whole adjacent symbols — never across a boundary the
# way the bare space-joined replace could ('t h' firing inside 't he').
_SQL_SYM_WRAP = "chr(2) || replace({x}, ' ', chr(3) || chr(2)) || chr(3)"
_SQL_SYM_UNWRAP = (
    "replace(replace(replace({x}, chr(3) || chr(2), ' '),"
    " chr(2), ''), chr(3), '')"
)


def _sql_merge_pattern(pair_src: str) -> str:
    """The wrapped two-symbol search pattern for the argmax pair row of
    CTE ``pair_src`` (pair is the space-joined 'lhs rhs' string)."""
    return (
        f"(SELECT chr(2) || split_part(pair, ' ', 1) || chr(3)"
        f" || chr(2) || split_part(pair, ' ', 2) || chr(3) FROM {pair_src})"
    )


def _sql_merge_replacement(pair_src: str) -> str:
    return (
        f"(SELECT chr(2) || replace(pair, ' ', '') || chr(3)"
        f" FROM {pair_src})"
    )


def _sql_bpe_ctes(num_merges: int) -> str:
    """Unrolled BPE training steps (r8; boundary-aware merges r10): w0 =
    the char-symbol word dictionary; per step, p{i} = the argmax pair of
    w{i-1} (freq desc, pair asc) and w{i} = w{i-1} with the greedy
    whole-symbol replace applied in the sentinel-wrapped space, then
    unwrapped back to the space-joined form. Every CTE is MATERIALIZED —
    w{i} references w{i-1} once and p{i} twice, so un-materialized
    inlining would re-expand the chain exponentially (the r5
    DuckDB-unrolled-iteration lesson)."""
    parts = [
        f"""w0 AS MATERIALIZED (
            SELECT array_to_string(string_split(word, ''), ' ') AS ws, cnt
            FROM (SELECT word, count(*) AS cnt
                  FROM (SELECT unnest(string_split({_SQL_NORM}, ' '))
                            AS word FROM documents)
                  WHERE word <> '' GROUP BY word))"""
    ]
    for i in range(1, num_merges + 1):
        merged_expr = (
            f"replace({_SQL_SYM_WRAP.format(x='ws')},"
            f" {_sql_merge_pattern(f'p{i}')},"
            f" {_sql_merge_replacement(f'p{i}')})"
        )
        parts.append(f"""p{i} AS MATERIALIZED (
            SELECT pair, sum(cnt) AS freq FROM (
                SELECT cnt, unnest(list_transform(
                    generate_series(2, len(string_split(ws, ' '))),
                    j -> string_split(ws, ' ')[j - 1] || ' '
                         || string_split(ws, ' ')[j])) AS pair
                FROM w{i - 1})
            GROUP BY pair ORDER BY freq DESC, pair LIMIT 1)""")
        parts.append(f"""w{i} AS MATERIALIZED (
            SELECT {_SQL_SYM_UNWRAP.format(x=merged_expr)} AS ws,
                   cnt
            FROM w{i - 1})""")
    return ",\n        ".join(parts)


_BPE_CONTRACT_MERGES = 10

LLM_ORACLE_SQL["bpe_train"] = (
    "WITH "
    + _sql_bpe_ctes(_BPE_CONTRACT_MERGES)
    + "\n        "
    + "\n        UNION ALL ".join(
        f"""SELECT {i}::BIGINT AS merge_rank,
                   split_part(pair, ' ', 1) AS lhs,
                   split_part(pair, ' ', 2) AS rhs,
                   replace(pair, ' ', '') AS merged,
                   freq::BIGINT AS freq FROM p{i}"""
        for i in range(1, _BPE_CONTRACT_MERGES + 1)
    )
)


LLM_ORACLE_SQL["bpe_continue"] = (
    "WITH "
    + _sql_bpe_ctes(_BPE_CONTRACT_MERGES)
    + "\n        "
    + "\n        UNION ALL ".join(
        f"""SELECT {i}::BIGINT AS merge_rank,
                   split_part(pair, ' ', 1) AS lhs,
                   split_part(pair, ' ', 2) AS rhs,
                   replace(pair, ' ', '') AS merged,
                   freq::BIGINT AS freq FROM p{i}"""
        for i in range(6, _BPE_CONTRACT_MERGES + 1)
    )
)


def _sql_bpe_encode() -> str:
    expr = (
        "array_to_string(list_transform("
        f"list_filter(string_split({_SQL_NORM}, ' '), w -> w <> ''), "
        "w -> array_to_string(string_split(w, ''), ' ')), ' | ')"
    )
    # wrap once, replay every merge as a whole-symbol replace in the
    # wrapped space, unwrap once — exactly vocab.bpe_encode's expr path
    expr = _SQL_SYM_WRAP.format(x=expr)
    for i in range(1, _BPE_CONTRACT_MERGES + 1):
        expr = (
            f"replace({expr}, {_sql_merge_pattern(f'p{i}')},"
            f" {_sql_merge_replacement(f'p{i}')})"
        )
    expr = _SQL_SYM_UNWRAP.format(x=expr)
    return f"""
        WITH {_sql_bpe_ctes(_BPE_CONTRACT_MERGES)},
        enc AS (SELECT doc_id, {expr} AS ws FROM documents),
        pieces AS (
            SELECT doc_id,
                   list_filter(string_split(ws, ' '), p -> p <> '|')
                       AS pieces
            FROM enc)
        SELECT doc_id, len(pieces)::BIGINT AS n_pieces,
               array_to_string(pieces, ' ') AS pieces_str
        FROM pieces"""


LLM_ORACLE_SQL["bpe_encode"] = _sql_bpe_encode()


# tokenizer fertility report (r10): the encode expr with word/char
# masses carried alongside, grouped by the table's lang column — keep
# in lockstep with vocab.bpe_fertility
def _sql_bpe_fertility() -> str:
    words = (
        f"list_filter(string_split({_SQL_NORM}, ' '), w -> w <> '')"
    )
    expr = (
        "array_to_string(list_transform("
        f"{words}, "
        "w -> array_to_string(string_split(w, ''), ' ')), ' | ')"
    )
    expr = _SQL_SYM_WRAP.format(x=expr)
    for i in range(1, _BPE_CONTRACT_MERGES + 1):
        expr = (
            f"replace({expr}, {_sql_merge_pattern(f'p{i}')},"
            f" {_sql_merge_replacement(f'p{i}')})"
        )
    expr = _SQL_SYM_UNWRAP.format(x=expr)
    return f"""
        WITH {_sql_bpe_ctes(_BPE_CONTRACT_MERGES)},
        enc AS (
            SELECT lang,
                   len({words})::BIGINT AS nw,
                   length(array_to_string({words}, ''))::BIGINT AS nc,
                   {expr} AS ws
            FROM documents),
        pieces AS (
            SELECT lang, nw, nc,
                   len(list_filter(string_split(ws, ' '),
                                   p -> p <> '|'))::BIGINT AS np
            FROM enc)
        SELECT lang, count(*)::BIGINT AS n_docs,
               sum(nw)::BIGINT AS n_words,
               sum(nc)::BIGINT AS n_chars,
               sum(np)::BIGINT AS n_pieces,
               (CASE WHEN sum(nw) = 0 THEN NULL
                     ELSE sum(np) * 1000 // sum(nw) END)::BIGINT
                   AS fertility_mils,
               (CASE WHEN sum(nc) = 0 THEN NULL
                     ELSE sum(np) * 1000 // sum(nc) END)::BIGINT
                   AS pieces_per_kchar
        FROM pieces GROUP BY lang"""


LLM_ORACLE_SQL["bpe_fertility"] = _sql_bpe_fertility()


def _sql_maintain_bpe(
    stored: int = 10, extra: int = 5, thresh_mils: int = 2500
) -> str:
    """Fertility-triggered BPE growth in SQL (r12): unroll
    ``stored + extra`` training steps (continuation on the same corpus
    equals the from-scratch chain — the bpe_continue contract), probe
    fertility against the first ``stored`` merges only, count both
    prefixes, and apply the threshold rule."""
    words = f"list_filter(string_split({_SQL_NORM}, ' '), w -> w <> '')"
    expr = (
        "array_to_string(list_transform("
        f"{words}, "
        "w -> array_to_string(string_split(w, ''), ' ')), ' | ')"
    )
    expr = _SQL_SYM_WRAP.format(x=expr)
    for i in range(1, stored + 1):  # probe encodes against the STORED model
        expr = (
            f"replace({expr}, {_sql_merge_pattern(f'p{i}')},"
            f" {_sql_merge_replacement(f'p{i}')})"
        )
    expr = _SQL_SYM_UNWRAP.format(x=expr)
    n_before = " + ".join(
        f"(SELECT count(*) FROM p{i})" for i in range(1, stored + 1)
    )
    n_ext = " + ".join(
        f"(SELECT count(*) FROM p{i})"
        for i in range(stored + 1, stored + extra + 1)
    )
    return f"""
        WITH {_sql_bpe_ctes(stored + extra)},
        enc AS (
            SELECT len({words})::BIGINT AS nw,
                   length(array_to_string({words}, ''))::BIGINT AS nc,
                   {expr} AS ws
            FROM documents),
        pieces AS (
            SELECT nw, nc,
                   len(list_filter(string_split(ws, ' '),
                                   p -> p <> '|'))::BIGINT AS np
            FROM enc),
        roll AS (
            SELECT count(*)::BIGINT AS n_docs,
                   sum(nw)::BIGINT AS n_words,
                   sum(nc)::BIGINT AS n_chars,
                   sum(np)::BIGINT AS n_pieces,
                   (CASE WHEN sum(nw) = 0 THEN NULL
                         ELSE sum(np) * 1000 // sum(nw) END)::BIGINT
                       AS fertility_mils,
                   (CASE WHEN sum(nc) = 0 THEN NULL
                         ELSE sum(np) * 1000 // sum(nc) END)::BIGINT
                       AS pieces_per_kchar
            FROM pieces),
        mb AS (SELECT ({n_before})::BIGINT AS merges_before,
                      ({n_ext})::BIGINT AS merges_ext)
        SELECT roll.*,
               coalesce(roll.fertility_mils > {thresh_mils}, FALSE)
                   AS extended,
               mb.merges_before,
               (mb.merges_before
                + CASE WHEN coalesce(roll.fertility_mils > {thresh_mils},
                                     FALSE)
                       THEN mb.merges_ext ELSE 0 END)::BIGINT
                   AS merges_after
        FROM roll, mb"""


LLM_ORACLE_SQL["maintain_bpe_model"] = _sql_maintain_bpe()
# stored-model encode (r10) reproduces the direct chain exactly — the
# persisted merges/ table IS bpe_train's output — so the oracle is
# shared verbatim
LLM_ORACLE_SQL["bpe_encode_incremental"] = _sql_bpe_encode()


# interpolated trigram LM (r8): the same capped-table construction as
# the Spark side — top-k by (count desc, gram asc), context masses
# summed over the capped tables, Jelinek-Mercer 0.2/0.3/0.5 mix with
# identical term order so the double arithmetic matches bit-for-bit
# before round(6)
def _sql_ngram_nll(model_where: str = "", score_where: str = "") -> str:
    """The interpolated trigram oracle, parameterized by model/score
    splits (r8: the self-scored entry uses no filters; the reference-LM
    twin trains on the train split and scores the eval split)."""
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split({_SQL_NORM}, ' '),
                               t -> t <> '') AS tk
            FROM documents{model_where}),
        tok AS (
            SELECT doc_id, tk[i] AS cur,
                   CASE WHEN i >= 2 THEN tk[i - 1] END AS p1,
                   CASE WHEN i >= 3 THEN tk[i - 2] END AS p2
            FROM toks, unnest(generate_series(1, len(tk))) AS t(i)),
        stoks AS (
            SELECT doc_id,
                   list_filter(string_split({_SQL_NORM}, ' '),
                               t -> t <> '') AS tk
            FROM documents{score_where}),
        stok AS (
            SELECT doc_id, tk[i] AS cur,
                   CASE WHEN i >= 2 THEN tk[i - 1] END AS p1,
                   CASE WHEN i >= 3 THEN tk[i - 2] END AS p2
            FROM stoks, unnest(generate_series(1, len(tk))) AS t(i)),
        uni AS (
            SELECT cur AS token, count(*) AS c FROM tok GROUP BY cur
            ORDER BY c DESC, token LIMIT 256),
        stats AS (
            SELECT sum(c) AS n_mass, count(*) AS v_size FROM uni),
        big AS (
            SELECT p1 AS w1, cur AS w2, count(*) AS cb FROM tok
            WHERE p1 IS NOT NULL GROUP BY p1, cur
            ORDER BY cb DESC, w1, w2 LIMIT 512),
        bctx AS (SELECT w1 AS bc1, sum(cb) AS cbc FROM big GROUP BY w1),
        tri AS (
            SELECT p2 AS t1, p1 AS t2, cur AS t3, count(*) AS ct FROM tok
            WHERE p2 IS NOT NULL GROUP BY p2, p1, cur
            ORDER BY ct DESC, t1, t2, t3 LIMIT 512),
        tctx AS (
            SELECT t1 AS tc1, t2 AS tc2, sum(ct) AS ctc FROM tri
            GROUP BY t1, t2),
        scored AS (
            SELECT t.doc_id,
                   -ln(0.5 * coalesce(tr.ct / tc.ctc, 0.0)
                       + 0.3 * coalesce(b.cb / bc.cbc, 0.0)
                       + 0.2 * ((coalesce(u.c, 0) + 1.0)
                                / (s.n_mass + s.v_size + 1.0))) AS nll
            FROM stok t
            LEFT JOIN uni u ON t.cur = u.token
            LEFT JOIN big b ON t.p1 = b.w1 AND t.cur = b.w2
            LEFT JOIN bctx bc ON t.p1 = bc.bc1
            LEFT JOIN tri tr ON t.p2 = tr.t1 AND t.p1 = tr.t2
                            AND t.cur = tr.t3
            LEFT JOIN tctx tc ON t.p2 = tc.tc1 AND t.p1 = tc.tc2
            CROSS JOIN stats s)
        SELECT doc_id, count(*)::BIGINT AS n_tokens,
               round(avg(nll), 6) AS avg_nll
        FROM scored GROUP BY doc_id"""


# CCNet head/middle/tail terciles (r8): the unigram_nll chain wrapped
# as an nll CTE, then the milli-cell histogram cumsum and the
# first-cell-reaching-ceil(N*frac) cutoffs — every row in a cutoff cell
# takes the lower label (1/1000-resolution determinism)
LLM_ORACLE_SQL["perplexity_buckets"] = f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split({_SQL_NORM}, ' ')) AS token
            FROM documents),
        tok2 AS (SELECT * FROM tok WHERE token <> ''),
        counts AS (
            SELECT token, count(*) AS c FROM tok2 GROUP BY token
            ORDER BY c DESC, token LIMIT 256),
        stats AS (
            SELECT sum(c) AS n_mass, count(*) AS v_size FROM counts),
        nll AS (
            SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
                   round(avg(-ln((coalesce(v.c, 0) + 1.0)
                                 / (s.n_mass + s.v_size + 1.0))), 6)
                       AS avg_nll
            FROM tok2 t
            LEFT JOIN counts v USING (token)
            CROSS JOIN stats s
            GROUP BY t.doc_id),
        hist AS (
            SELECT floor(avg_nll * 1000)::BIGINT AS cell, count(*) AS n
            FROM nll GROUP BY 1),
        cum AS (
            SELECT cell, sum(n) OVER (ORDER BY cell) AS cum,
                   (SELECT sum(n) FROM hist) AS tot
            FROM hist),
        cuts AS (
            SELECT min(CASE WHEN cum >= ceil(tot * {1 / 3!r})
                            THEN cell END) AS c1,
                   min(CASE WHEN cum >= ceil(tot * {2 / 3!r})
                            THEN cell END) AS c2
            FROM cum)
        SELECT n.doc_id, n.n_tokens, n.avg_nll,
               CASE WHEN floor(n.avg_nll * 1000)::BIGINT <= c.c1
                    THEN 'head'
                    WHEN floor(n.avg_nll * 1000)::BIGINT <= c.c2
                    THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM nll n CROSS JOIN cuts c"""

# fastText-style classifier inference (r8): the hashing trick + the
# synthetic weight table restated — md5-60bit feature ids and weights,
# sigmoid of the mean, identical expression shape before round(6)
LLM_ORACLE_SQL["classifier_score"] = f"""
        WITH w AS (
            SELECT f::INT AS feature,
                   ((('0x' || substr(md5('w|' || f::VARCHAR), 1, 15))::BIGINT
                         % 2001) - 1000) / 1000.0 AS weight
            FROM range(1024) t(f)),
        tok0 AS (
            SELECT doc_id, unnest(string_split(norm, ' ')) AS token
            FROM (SELECT doc_id, {_SQL_NORM} AS norm FROM documents)),
        tok AS (
            SELECT doc_id,
                   (('0x' || substr(md5(token), 1, 15))::BIGINT
                        % 1024)::INT AS feature
            FROM tok0 WHERE token <> ''),
        s AS (
            SELECT t.doc_id, count(*) AS n_tokens,
                   avg(coalesce(w.weight, 0.0)) AS m
            FROM tok t LEFT JOIN w USING (feature)
            GROUP BY t.doc_id)
        SELECT doc_id, n_tokens::BIGINT AS n_tokens,
               round(1.0 / (1.0 + exp(-(0.0 + m))), 6) AS score
        FROM s"""

# batch-perceptron training (r8): integer-exact unrolled update rounds.
# w0 = {} makes round 1's margins all zero (y·0 ≤ 0 → everybody
# misclassified → w1 = Σ y·x); each later round is margin →
# misclassified set → summed y·x delta → full-outer weight merge. Every
# CTE is MATERIALIZED — m{i} and d{i} each read feats, and w{i} reads
# w{i-1} plus d{i}, so inlining would re-expand the chain per round
# (the r5 unrolled-iteration lesson).
def _sql_classifier_train_parts(
    n_iters: int, n_features: int = 1024, word_ngrams: int = 1
) -> list[str]:
    if word_ngrams == 1:
        feats = f"""feats AS MATERIALIZED (
            SELECT doc_id, y,
                   (('0x' || substr(md5(token), 1, 15))::BIGINT
                        % {n_features})::INT AS feature,
                   count(*)::BIGINT AS cnt
            FROM (SELECT doc_id, y,
                         unnest(string_split({_SQL_NORM}, ' ')) AS token
                  FROM src)
            WHERE token <> ''
            GROUP BY doc_id, y, feature)"""
    else:
        # fastText wordNgrams=2 (r10): grams = tokens plus adjacent
        # bigrams, built over the PRE-FILTERED token list (empties
        # removed before pairing, matching the Spark array)
        feats = f"""feats AS MATERIALIZED (
            SELECT doc_id, y,
                   (('0x' || substr(md5(gram), 1, 15))::BIGINT
                        % {n_features})::INT AS feature,
                   count(*)::BIGINT AS cnt
            FROM (SELECT doc_id, y,
                         unnest(list_concat(toks, list_transform(
                             generate_series(2, len(toks)),
                             j -> toks[j - 1] || ' ' || toks[j]))) AS gram
                  FROM (SELECT doc_id, y,
                               list_filter(string_split({_SQL_NORM}, ' '),
                                           t -> t <> '') AS toks
                        FROM src))
            GROUP BY doc_id, y, feature)"""
    parts = [
        """src AS MATERIALIZED (
            SELECT doc_id,
                   text || CASE WHEN doc_id % 2 = 0 THEN ' qualitymarker'
                                ELSE ' junkmarker' END AS text,
                   CASE WHEN doc_id % 2 = 0 THEN 1 ELSE -1 END AS y
            FROM documents)""",
        feats,
        """w1 AS MATERIALIZED (
            SELECT feature, sum(y * cnt)::BIGINT AS weight
            FROM feats GROUP BY feature)""",
    ]
    for i in range(2, n_iters + 1):
        parts.append(f"""m{i} AS MATERIALIZED (
            SELECT f.doc_id, f.y,
                   sum(f.cnt * coalesce(w.weight, 0))::BIGINT AS margin
            FROM feats f LEFT JOIN w{i - 1} w USING (feature)
            GROUP BY f.doc_id, f.y)""")
        parts.append(f"""d{i} AS MATERIALIZED (
            SELECT f.feature, sum(f.y * f.cnt)::BIGINT AS delta
            FROM feats f
            JOIN (SELECT doc_id FROM m{i} WHERE y * margin <= 0) m
                USING (doc_id)
            GROUP BY f.feature)""")
        parts.append(f"""w{i} AS MATERIALIZED (
            SELECT coalesce(w.feature, d.feature) AS feature,
                   (coalesce(w.weight, 0) + coalesce(d.delta, 0))::BIGINT
                       AS weight
            FROM w{i - 1} w FULL OUTER JOIN d{i} d
                ON w.feature = d.feature)""")
    return parts


def _sql_classifier_train(
    n_iters: int, n_features: int = 1024, word_ngrams: int = 1
) -> str:
    return (
        "WITH "
        + ",\n        ".join(
            _sql_classifier_train_parts(n_iters, n_features, word_ngrams)
        )
        + f"""
        SELECT feature, weight FROM w{n_iters} WHERE weight <> 0"""
    )


LLM_ORACLE_SQL["classifier_train"] = _sql_classifier_train(4)
# warm start shares the chain: continue(train(2), 2) == w4 exactly
LLM_ORACLE_SQL["classifier_train_continue"] = _sql_classifier_train(4)
# fastText-parity bigram features (r10): the same 4-round chain with
# the gram set widened to tokens + adjacent bigrams
LLM_ORACLE_SQL["classifier_train_bigrams"] = _sql_classifier_train(
    4, word_ngrams=2
)

# hard-vote inference with the 4-round trained model (r8): the summed
# integer margin and sign(margin) over the same planted corpus — the
# perceptron's own decision function, distinct from classifier_score's
# mean+sigmoid calibration
def _sql_classifier_predict(word_ngrams: int = 1) -> str:
    return (
        "WITH "
        + ",\n        ".join(
            _sql_classifier_train_parts(4, word_ngrams=word_ngrams)
        )
        + """,
        m AS (
            SELECT f.doc_id, sum(f.cnt)::BIGINT AS n_tokens,
                   sum(f.cnt * coalesce(w.weight, 0))::BIGINT AS margin
            FROM feats f LEFT JOIN w4 w USING (feature)
            GROUP BY f.doc_id)
        SELECT doc_id, n_tokens, margin,
               (CASE WHEN margin > 0 THEN 1 ELSE -1 END)::INT AS pred
        FROM m"""
    )


LLM_ORACLE_SQL["classifier_predict"] = _sql_classifier_predict()
LLM_ORACLE_SQL["classifier_predict_bigrams"] = _sql_classifier_predict(
    word_ngrams=2
)


# classifier EVAL report (r10): the same 4-round train chain, margins
# re-keyed with their labels, then the tie-aware grouped rank-sum AUC +
# sign-decision accuracy — keep the rollup in lockstep with
# textstats.classifier_auc
def _sql_classifier_auc() -> str:
    return (
        "WITH "
        + ",\n        ".join(_sql_classifier_train_parts(4))
        + """,
        marg AS (
            SELECT f.doc_id, f.y,
                   sum(f.cnt * coalesce(w.weight, 0))::BIGINT AS margin
            FROM feats f LEFT JOIN w4 w USING (feature)
            GROUP BY f.doc_id, f.y),
        g AS (
            SELECT margin,
                   sum((y = 1)::INT)::BIGINT AS pos,
                   count(*)::BIGINT AS tot,
                   sum(((margin > 0) = (y = 1))::INT)::BIGINT AS ok
            FROM marg GROUP BY margin),
        c AS (
            SELECT pos, tot, ok,
                   coalesce(sum(tot) OVER (ORDER BY margin
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS cum
            FROM g),
        t AS (
            SELECT sum(pos * (2 * cum + tot + 1))::BIGINT AS ranksum2,
                   sum(pos)::BIGINT AS n_pos,
                   sum(tot - pos)::BIGINT AS n_neg,
                   sum(tot)::BIGINT AS n_docs,
                   sum(ok)::BIGINT AS n_correct
            FROM c)
        SELECT n_pos, n_neg, n_docs, n_correct,
               (n_correct * 1000 // n_docs)::BIGINT AS accuracy_mils,
               (CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
                     ELSE (ranksum2 - n_pos * (n_pos + 1)) * 1000
                          // (2 * n_pos * n_neg) END)::BIGINT AS auc_mils
        FROM t"""
    )


LLM_ORACLE_SQL["classifier_auc"] = _sql_classifier_auc()


# calibration report (r11): same train chain, margins histogrammed,
# binned over the observed range, clamped-linear p_mils, per-bin Brier
# — keep the rollup in lockstep with textstats.classifier_calibration
# (n_bins=8, scale=200 as pinned by q_classifier_calibration)
def _sql_classifier_calibration(n_bins: int = 8, scale: int = 200) -> str:
    return (
        "WITH "
        + ",\n        ".join(_sql_classifier_train_parts(4))
        + f""",
        marg AS (
            SELECT f.doc_id, f.y,
                   sum(f.cnt * coalesce(w.weight, 0))::BIGINT AS margin
            FROM feats f LEFT JOIN w4 w USING (feature)
            GROUP BY f.doc_id, f.y),
        g AS (
            SELECT margin,
                   sum((y = 1)::INT)::BIGINT AS pos,
                   count(*)::BIGINT AS tot
            FROM marg GROUP BY margin),
        stats AS (
            SELECT min(margin)::BIGINT AS mn, max(margin)::BIGINT AS mx
            FROM g),
        binned AS (
            SELECT ((g.margin - s.mn) * {n_bins}
                    // (s.mx - s.mn + 1))::INT AS bin,
                   least(1000, greatest(0,
                       500 * ({scale} + g.margin) // {scale}))::BIGINT
                       AS p,
                   g.pos, g.tot, g.margin
            FROM g, stats s),
        b AS (
            SELECT bin,
                   sum(tot)::BIGINT AS n_docs,
                   sum(pos)::BIGINT AS n_pos,
                   sum(margin * tot)::BIGINT AS msum,
                   sum(p * tot)::BIGINT AS psum,
                   sum((tot - pos) * p * p
                       + pos * (1000 - p) * (1000 - p))::BIGINT AS se_sum
            FROM binned GROUP BY bin)
        SELECT bin, n_docs, n_pos,
               (msum * 1000 // n_docs)::BIGINT AS mean_margin_mils,
               (n_pos * 1000 // n_docs)::BIGINT AS pos_rate_mils,
               (psum // n_docs)::BIGINT AS mean_p_mils,
               abs(psum // n_docs
                   - n_pos * 1000 // n_docs)::BIGINT AS gap_mils,
               se_sum,
               (se_sum // n_docs)::BIGINT AS brier_micros
        FROM b"""
    )


LLM_ORACLE_SQL["classifier_calibration"] = _sql_classifier_calibration()


# PR threshold sweep (r11): same train chain + grouped margin
# histogram; kept/tp at threshold t = strictly-greater cumulative sums
# over the DESC-ordered histogram — keep in lockstep with
# textstats.classifier_pr_sweep — the sweep chain is shared VERBATIM
# with corpus_filter_classifier (r12), which picks a cut from the same
# sw CTE and gates the margins with it
def _sql_pr_sweep_parts() -> list[str]:
    return _sql_classifier_train_parts(4) + [
        """marg AS (
            SELECT f.doc_id, f.y,
                   sum(f.cnt * coalesce(w.weight, 0))::BIGINT AS margin
            FROM feats f LEFT JOIN w4 w USING (feature)
            GROUP BY f.doc_id, f.y)""",
        """g0 AS (
            SELECT margin,
                   sum((y = 1)::INT)::BIGINT AS pos,
                   count(*)::BIGINT AS tot
            FROM marg GROUP BY margin)""",
        """g AS (
            SELECT margin, pos, tot FROM g0
            UNION ALL
            SELECT min(margin) - 1, 0::BIGINT, 0::BIGINT FROM g0
            HAVING min(margin) IS NOT NULL)""",
        """c AS (
            SELECT margin::BIGINT AS threshold,
                   coalesce(sum(tot) OVER (ORDER BY margin DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0)::BIGINT AS n_kept,
                   coalesce(sum(pos) OVER (ORDER BY margin DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0)::BIGINT
                       AS n_pos_kept
            FROM g)""",
        """t AS (
            SELECT sum(tot)::BIGINT AS n_docs, sum(pos)::BIGINT AS n_pos
            FROM g)""",
        """sw AS (
        SELECT c.threshold, c.n_kept,
               (c.n_kept * 1000 // t.n_docs)::BIGINT AS kept_mils,
               c.n_pos_kept,
               (CASE WHEN c.n_kept = 0 THEN NULL
                     ELSE c.n_pos_kept * 1000 // c.n_kept END)::BIGINT
                   AS precision_mils,
               (CASE WHEN t.n_pos = 0 THEN NULL
                     ELSE c.n_pos_kept * 1000 // t.n_pos END)::BIGINT
                   AS recall_mils
        FROM c, t)""",
    ]


def _sql_classifier_pr_sweep() -> str:
    return (
        "WITH "
        + ",\n        ".join(_sql_pr_sweep_parts())
        + """
        SELECT threshold, n_kept, kept_mils, n_pos_kept,
               precision_mils, recall_mils
        FROM sw"""
    )


LLM_ORACLE_SQL["classifier_pr_sweep"] = _sql_classifier_pr_sweep()


# textstats.corpus_filter_classifier (r12): the SAME sweep chain, a
# histogram-side chooser (smallest threshold meeting the precision
# floor with a nonempty keep, else keep-nothing max), and the margin
# gate with corpus_filter-style reason attribution
def _sql_corpus_filter_classifier(min_precision_mils: int) -> str:
    return (
        "WITH "
        + ",\n        ".join(_sql_pr_sweep_parts())
        + f""",
        ch AS (
            SELECT coalesce(
                min(CASE WHEN precision_mils >= {min_precision_mils}
                              AND n_kept > 0
                         THEN threshold END),
                max(threshold)) AS threshold
            FROM sw)
        SELECT m.doc_id, m.margin, ch.threshold,
               m.margin > ch.threshold AS is_kept,
               CASE WHEN m.margin > ch.threshold THEN NULL
                    ELSE 'classifier_low_margin' END AS drop_reason
        FROM marg m, ch"""
    )


LLM_ORACLE_SQL["corpus_filter_classifier"] = _sql_corpus_filter_classifier(
    900
)

LLM_ORACLE_SQL["ngram_nll"] = _sql_ngram_nll()
LLM_ORACLE_SQL["ngram_nll_ref"] = _sql_ngram_nll(
    model_where=" WHERE doc_id % 50 <> 0",
    score_where=" WHERE doc_id % 50 = 0",
)

# CCNet/RefinedWeb-style keep/drop verdict: the CASE chain restates
# corpus_filter's fixed rule order over the same signal formulas
# (_SQL_N_WS, lang argmax, _SQL_QUALITY, rounded repetition fractions)


def _sql_corpus_filter_ctes(src_select: str) -> str:
    """corpus_filter's verdict chain over an arbitrary (doc_id, text[,
    ...]) source (r8 — the capstone pipeline reuses it over the planted
    union). Ends with CTE ``verdict(doc_id, drop_reason)``; drop_reason
    NULL = kept."""
    return f"""{_sql_repetition_ctes(src_select)},
        base AS (
            SELECT doc_id, {_SQL_N_WS} AS nt, {_SQL_QUALITY} AS q,
                   CASE
                     WHEN ({_S_EN}) > 0 AND ({_S_EN}) >= ({_S_DE})
                          AND ({_S_EN}) >= ({_S_ES})
                          AND ({_S_EN}) >= ({_S_FR}) THEN 'en'
                     WHEN ({_S_DE}) > 0 AND ({_S_DE}) >= ({_S_ES})
                          AND ({_S_DE}) >= ({_S_FR}) THEN 'de'
                     WHEN ({_S_ES}) > 0 AND ({_S_ES}) >= ({_S_FR}) THEN 'es'
                     WHEN ({_S_FR}) > 0 THEN 'fr'
                     ELSE 'und'
                   END AS lang
            FROM src),
        verdict AS (
            SELECT b.doc_id,
                   CASE
                     WHEN b.nt < 25 THEN 'too_short'
                     WHEN b.lang <> 'en' THEN 'wrong_lang'
                     WHEN b.q < 0.5 THEN 'low_quality'
                     WHEN round(coalesce(l.dlf, 0), 6) > 0.3
                         THEN 'repetitive_lines'
                     WHEN round(coalesce(s.dncf, 0), 6) > 0.2
                         THEN 'repetitive_ngrams'
                     WHEN round(coalesce(t.tncf, 0), 6) > 0.2
                         THEN 'top_ngram_heavy'
                   END AS drop_reason
            FROM base b
            LEFT JOIN lstats l ON b.doc_id = l.doc_id
            LEFT JOIN tstats t ON b.doc_id = t.doc_id
            LEFT JOIN dstats s ON b.doc_id = s.doc_id)"""


LLM_ORACLE_SQL["corpus_filter"] = f"""
        WITH {_sql_corpus_filter_ctes("SELECT doc_id, text FROM documents")}
        SELECT doc_id, (drop_reason IS NULL) AS is_kept, drop_reason
        FROM verdict"""

# inter-filter agreement (r10): corpus_filter's verdict vs the plain
# quality>=0.6 gate; contingency counters + floor-division kappa —
# keep in lockstep with textstats.filter_agreement
LLM_ORACLE_SQL["filter_agreement"] = f"""
        WITH {_sql_corpus_filter_ctes("SELECT doc_id, text FROM documents")},
        qb AS (
            SELECT doc_id, ({_SQL_QUALITY} >= 0.6) AS b FROM documents),
        pairsv AS (
            SELECT (v.drop_reason IS NULL) AS a, qb.b
            FROM verdict v JOIN qb USING (doc_id)),
        c AS (
            SELECT count(*)::BIGINT AS n_docs,
                   sum((a AND b)::INT)::BIGINT AS n_both,
                   sum((a AND NOT b)::INT)::BIGINT AS n_a_only,
                   sum((NOT a AND b)::INT)::BIGINT AS n_b_only,
                   sum((NOT a AND NOT b)::INT)::BIGINT AS n_neither
            FROM pairsv),
        k AS (
            SELECT *,
                   (n_both + n_a_only) * (n_both + n_b_only)
                   + (n_docs - (n_both + n_a_only))
                     * (n_docs - (n_both + n_b_only)) AS pe_num,
                   n_both + n_neither AS agree
            FROM c)
        SELECT n_docs, n_both, n_a_only, n_b_only, n_neither,
               (agree * 1000 // n_docs)::BIGINT AS agreement_mils,
               (CASE WHEN n_docs * n_docs = pe_num THEN NULL
                     ELSE (agree * n_docs - pe_num) * 1000
                          // (n_docs * n_docs - pe_num) END)::BIGINT
                   AS kappa_mils
        FROM k"""

# the e2e capstone (r8): the whole filter → dedup → upsample → split →
# pack chain in ONE query — verdict CTEs over the planted union, exact
# dedup via row_number on the normalized text (same equality classes as
# sha2), the upsample integer cross-multiplication, the md5-nibble
# split on the ORIGINAL doc id, and the pack_tokens stream restated
# with the dense stride sid = doc_id*4 + epoch (epoch < 4 by
# construction; a sparse doc*1000 stride would inflate the pack bucket
# summary 1000x — see the stream CTE below)
_CAP_SRC = """SELECT doc_id, text, source FROM documents
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id, text, source FROM documents
            WHERE doc_id % 10 = 0"""

LLM_ORACLE_SQL["pipeline_capstone"] = f"""
        WITH {_sql_corpus_filter_ctes(_CAP_SRC)},
        kept AS (
            SELECT s.doc_id, s.text, s.source
            FROM src s JOIN verdict v USING (doc_id)
            WHERE v.drop_reason IS NULL),
        dd AS (
            SELECT doc_id, text, source FROM (
                SELECT k.*, row_number() OVER (
                    PARTITION BY {_SQL_NORM} ORDER BY doc_id) AS rn
                FROM kept k) t
            WHERE rn = 1),
        ups AS (
            SELECT doc_id, unnest(range(1, copies + 1))::BIGINT AS epoch
            FROM (
                SELECT doc_id,
                       (wm // 1000)
                       + CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR),
                                                   1, 15))::BIGINT::HUGEINT
                                       * 1000
                                   < 1152921504606846976::HUGEINT
                                       * (wm % 1000)
                              THEN 1 ELSE 0 END AS copies
                FROM (SELECT doc_id,
                             CASE source WHEN 'src0' THEN 2500
                                         WHEN 'src1' THEN 2500
                                         WHEN 'src7' THEN 300
                                         WHEN 'src8' THEN 1500
                                         ELSE 1000 END AS wm
                      FROM dd) w) c
            WHERE copies >= 1),
        train AS (
            SELECT u.doc_id, u.epoch FROM ups u
            WHERE substring(md5(u.doc_id::VARCHAR), 1, 1) <= 'b'),
        epochs AS (
            SELECT t.doc_id * 4 + t.epoch AS sid, d.text
            FROM train t JOIN dd d USING (doc_id)),
        vcounts AS (
            SELECT token, count(*) AS c FROM (
                SELECT unnest(string_split({_SQL_NORM}, ' ')) AS token
                FROM dd) t
            WHERE token <> '' GROUP BY token),
        vocab AS (
            SELECT token, token_id FROM (
                SELECT token,
                       row_number() OVER (ORDER BY c DESC, token)
                           AS token_id
                FROM vcounts) v
            WHERE token_id <= 32),
        ebase AS (SELECT sid, {_SQL_NORM} AS norm FROM epochs),
        etok AS (
            SELECT sid,
                   unnest(string_split(norm, ' ')) AS token,
                   unnest(range(1, len(string_split(norm, ' ')) + 1))
                       AS pos
            FROM ebase),
        etok2 AS (SELECT * FROM etok WHERE token <> ''),
        ids AS (
            SELECT t.sid,
                   row_number() OVER (PARTITION BY t.sid ORDER BY t.pos)
                       - 1 AS li,
                   coalesce(v.token_id, 0)::INT AS tid
            FROM etok2 t LEFT JOIN vocab v USING (token)),
        doc_len AS (
            SELECT e.sid, coalesce(c.n, 0) + 1 AS len
            FROM epochs e LEFT JOIN (
                SELECT sid, count(*) AS n FROM etok2 GROUP BY sid
            ) c USING (sid)),
        offs AS (
            SELECT sid, len,
                   coalesce(sum(len) OVER (
                       ORDER BY sid
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS off
            FROM doc_len),
        stream AS (
            SELECT (o.off + i.li)::BIGINT AS gpos, i.tid
            FROM ids i JOIN offs o USING (sid)
            UNION ALL
            SELECT (o.off + o.len - 1)::BIGINT, -1 FROM offs o)
        SELECT (gpos // 128)::BIGINT AS block_id,
               count(*)::BIGINT AS n_tokens,
               string_agg(tid::VARCHAR, ',' ORDER BY gpos) AS ids_str
        FROM stream GROUP BY 1"""

# CCNet paragraph-level dedup: split the planted multi-paragraph docs on
# chr(10), keep the corpus-wide first occurrence of each normalized
# paragraph (empty normalizations keep verbatim — per-occurrence unique
# key on the Spark side, the norm='' short-circuit here), reassemble.
# The incremental entry shares the chain verbatim: with the indexed
# corpus's ids (< 250) preceding the batch's, "index wins, then batch
# first occurrence" IS the full-set first-occurrence rule restricted to
# batch docs — so its oracle is the same SQL with the output filter.
_SQL_NORM_PARA = _SQL_NORM.replace("lower(text)", "lower(para)")


def _sql_dedup_paragraphs(out_where: str = "") -> str:
    return f"""
        WITH src AS (
            SELECT doc_id,
                   substr(text, 1, 60) || chr(10)
                   || CASE WHEN doc_id % 5 = 0
                           THEN 'planted shared paragraph alpha beta gamma'
                           ELSE 'solo paragraph ' || doc_id END
                   || chr(10) || substr(text, 61, 100000)
                   || CASE WHEN doc_id % 7 = 0
                           THEN chr(10) || substr(text, 1, 60)
                           ELSE '' END AS text
            FROM documents),
        paras AS (
            SELECT doc_id,
                   unnest(string_split(text, chr(10))) AS para,
                   unnest(range(0, len(string_split(text, chr(10)))))
                       AS pos
            FROM src),
        keyed AS (
            SELECT doc_id, pos, para, {_SQL_NORM_PARA} AS norm
            FROM paras),
        flagged AS (
            SELECT doc_id, pos, para,
                   (norm = '' OR row_number() OVER (
                        PARTITION BY norm ORDER BY doc_id, pos) = 1)
                       AS keep
            FROM keyed)
        SELECT doc_id,
               string_agg(para, chr(10) ORDER BY pos)
                   FILTER (WHERE keep) AS text,
               sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
               sum(CASE WHEN keep THEN 0 ELSE 1 END)::BIGINT AS n_dropped
        FROM flagged
        {out_where}
        GROUP BY doc_id
        HAVING sum(CASE WHEN keep THEN 1 ELSE 0 END) >= 1"""


LLM_ORACLE_SQL["dedup_paragraphs"] = _sql_dedup_paragraphs()
LLM_ORACLE_SQL["dedup_paragraphs_incremental"] = _sql_dedup_paragraphs(
    "WHERE doc_id >= 250"
)

# DSIR: hashed unigram+bigram bucket models (Laplace), per-doc log
# importance weight, Gumbel top-k from the md5-uniform — every step is
# the identical double math on both engines, round(6) on the outputs
_SQL_DSIR_CTES = f"""tgt AS (
            SELECT doc_id, {_SQL_NORM} AS norm FROM documents
            WHERE lang = 'en'),
        rawd AS (
            SELECT doc_id, {_SQL_NORM} AS norm FROM documents
            WHERE lang <> 'en'),
        tgr AS (
            SELECT doc_id, unnest(
                tk || CASE WHEN len(tk) >= 2
                           THEN list_transform(
                               generate_series(1, len(tk) - 1),
                               i -> tk[i] || ' ' || tk[i + 1])
                           ELSE []::VARCHAR[] END) AS g
            FROM (SELECT doc_id,
                         list_filter(string_split(norm, ' '),
                                     t -> t <> '') AS tk
                  FROM tgt)),
        rgr AS (
            SELECT doc_id, unnest(
                tk || CASE WHEN len(tk) >= 2
                           THEN list_transform(
                               generate_series(1, len(tk) - 1),
                               i -> tk[i] || ' ' || tk[i + 1])
                           ELSE []::VARCHAR[] END) AS g
            FROM (SELECT doc_id,
                         list_filter(string_split(norm, ' '),
                                     t -> t <> '') AS tk
                  FROM rawd)),
        tc AS (
            SELECT ('0x' || substr(md5(g), 1, 15))::BIGINT % 512
                       AS feature,
                   count(*) AS ct
            FROM tgr GROUP BY 1),
        rfeat AS (
            SELECT doc_id,
                   ('0x' || substr(md5(g), 1, 15))::BIGINT % 512
                       AS feature
            FROM rgr),
        rc AS (SELECT feature, count(*) AS cr FROM rfeat GROUP BY feature),
        buckets AS (SELECT unnest(range(512))::BIGINT AS feature),
        model AS (
            SELECT b.feature, coalesce(tc.ct, 0) AS ct,
                   coalesce(rc.cr, 0) AS cr
            FROM buckets b
            LEFT JOIN tc USING (feature)
            LEFT JOIN rc USING (feature)),
        tots AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM model),
        lrm AS (
            SELECT feature,
                   ln((ct + 1.0) / (tt + 512.0))
                   - ln((cr + 1.0) / (tr + 512.0)) AS lr
            FROM model CROSS JOIN tots)"""

LLM_ORACLE_SQL["dsir_select"] = f"""
        WITH {_SQL_DSIR_CTES},
        docf AS (
            SELECT doc_id, feature, count(*) AS c
            FROM rfeat GROUP BY doc_id, feature),
        scored AS (
            SELECT doc_id, sum(c)::BIGINT AS n_grams, sum(c * lr) AS logw
            FROM docf JOIN lrm USING (feature) GROUP BY doc_id),
        gk AS (
            SELECT doc_id, n_grams, logw,
                   logw + (-ln(-ln(
                       (('0x' || substr(md5('dsir|' || doc_id), 1, 15))
                            ::BIGINT + 0.5)
                       / 1152921504606846976.0))) AS skey
            FROM scored)
        SELECT doc_id, n_grams, round(logw, 6) AS logw,
               round(skey, 6) AS sel_key
        FROM gk ORDER BY sel_key DESC, doc_id LIMIT 50"""

# the persisted-model path's output is identical to the direct path by
# construction (the stored table IS the inline log-ratio model), so the
# oracle is shared verbatim
LLM_ORACLE_SQL["dsir_select_incremental"] = LLM_ORACLE_SQL["dsir_select"]

# DSIR model health: bucket coverage, the smoothed KL(target||raw) the
# importance weights are worth, and the max |log-ratio| — recomputed by
# the oracle from the same model CTEs the selection oracle uses
# staleness-triggered rebuild (r12): the divergence report with the
# batch ≡ target probe (so kl_batch_raw is the kl_target_raw
# expression) + the 1-mil threshold rule — keep in lockstep with
# q_maintain_dsir_model
LLM_ORACLE_SQL["maintain_dsir_model"] = f"""
        WITH {_SQL_DSIR_CTES}
        SELECT 512::INT AS n_buckets,
               sum(CASE WHEN ct > 0 THEN 1 ELSE 0 END)::BIGINT
                   AS n_target_buckets,
               sum(CASE WHEN cr > 0 THEN 1 ELSE 0 END)::BIGINT
                   AS n_raw_buckets,
               round(sum(((ct + 1.0) / (tt + 512.0))
                         * (ln((ct + 1.0) / (tt + 512.0))
                            - ln((cr + 1.0) / (tr + 512.0)))), 6)
                   AS kl_target_raw,
               round(max(abs(ln((ct + 1.0) / (tt + 512.0))
                             - ln((cr + 1.0) / (tr + 512.0)))), 6)
                   AS max_abs_lr,
               round(sum(((ct + 1.0) / (tt + 512.0))
                         * (ln((ct + 1.0) / (tt + 512.0))
                            - ln((cr + 1.0) / (tr + 512.0)))), 6)
                   AS kl_batch_raw,
               (round(sum(((ct + 1.0) / (tt + 512.0))
                          * (ln((ct + 1.0) / (tt + 512.0))
                             - ln((cr + 1.0) / (tr + 512.0)))), 6)
                    * 1000 > 1) AS rebuilt
        FROM model CROSS JOIN tots"""

LLM_ORACLE_SQL["dsir_model_divergence"] = f"""
        WITH {_SQL_DSIR_CTES}
        SELECT 512::INT AS n_buckets,
               sum(CASE WHEN ct > 0 THEN 1 ELSE 0 END)::BIGINT
                   AS n_target_buckets,
               sum(CASE WHEN cr > 0 THEN 1 ELSE 0 END)::BIGINT
                   AS n_raw_buckets,
               round(sum(((ct + 1.0) / (tt + 512.0))
                         * (ln((ct + 1.0) / (tt + 512.0))
                            - ln((cr + 1.0) / (tr + 512.0)))), 6)
                   AS kl_target_raw,
               round(max(abs(ln((ct + 1.0) / (tt + 512.0))
                             - ln((cr + 1.0) / (tr + 512.0)))), 6)
                   AS max_abs_lr
        FROM model CROSS JOIN tots"""

# HTML->text: the same regex chain as functions/textprep.strip_html,
# restated with RE2 syntax (identical pattern text; DuckDB needs the
# explicit 'g' flag where Spark replaces globally by default). Plain
# string on purpose: the {3,} quantifier would fight an f-string.
LLM_ORACLE_SQL["html_to_text"] = """
        WITH h AS (
            SELECT doc_id,
                   '<html><head><style>p color red</style>'
                   || '<!-- crawler junk --></head><body><h1>'
                   || substr(text, 1, 40) || '</h1><p>'
                   || substr(text, 41, 100000)
                   || ' &amp; more &lt;tags&gt;</p>'
                   || '<script>var x = 1 < 2;</script></body></html>'
                       AS html
            FROM documents),
        s AS (
            SELECT doc_id, regexp_replace(trim(
                regexp_replace(
                regexp_replace(
                regexp_replace(
                replace(replace(replace(replace(replace(replace(replace(
                regexp_replace(
                regexp_replace(
                regexp_replace(
                regexp_replace(
                regexp_replace(html,
                    '(?is)<script[^>]*>.*?</script\\s*>', '', 'g'),
                    '(?is)<style[^>]*>.*?</style\\s*>', '', 'g'),
                    '(?s)<!--.*?-->', '', 'g'),
                    '(?i)<br\\s*/?>|</p\\s*>|</div\\s*>|</h[1-6]\\s*>|</li\\s*>|</tr\\s*>|</blockquote\\s*>|</section\\s*>|</article\\s*>',
                    e'\\n', 'g'),
                    '(?s)<[^>]+>', ' ', 'g'),
                    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                    '&#39;', ''''), '&apos;', ''''), '&nbsp;', ' '),
                    '&amp;', '&'),
                    '[ \\t]+', ' ', 'g'),
                    ' ?\\n ?', e'\\n', 'g'),
                    '\\n{3,}', e'\\n\\n', 'g')),
                    '^\\n+|\\n+$', '', 'g') AS text
            FROM h)
        SELECT doc_id, text, length(text)::BIGINT AS n_chars FROM s"""

# sentence segmentation: the sentinel-insertion formulation (RE2 has no
# lookbehind, so the boundary is a capture-group replacement both
# engines express — the replacement SYNTAX differs ($1 vs \1) but the
# inserted sentinel stream is identical). Plain string: the regex
# brackets would fight an f-string.
LLM_ORACLE_SQL["split_sentences"] = """
        WITH src AS (
            SELECT doc_id,
                   substr(text, 1, 50)
                   || '. Alpha beta gamma. Delta says hello! Echo asks why? and then '
                   || substr(text, 51, 100000) AS text
            FROM documents),
        m AS (
            SELECT doc_id,
                   regexp_replace(text,
                       '([.!?]["'')\\]]?) ([A-Z0-9])',
                       '\\1' || chr(1) || '\\2', 'g') AS t
            FROM src)
        SELECT doc_id,
               unnest(range(0, len(string_split(t, chr(1)))))::INT
                   AS sent_id,
               unnest(string_split(t, chr(1))) AS sentence
        FROM m"""

# sentence-boundary doc segmentation (r8): the split_sentences chain,
# then the pack_sequences next-fit rule — chunk = (cum − nt) // max —
# and an ORDER BY string_agg reassembly per (doc, chunk)
LLM_ORACLE_SQL["split_long_docs"] = """
        WITH src AS (
            SELECT doc_id,
                   substr(text, 1, 50)
                   || '. Alpha beta gamma. Delta says hello! Echo asks why? and then '
                   || substr(text, 51, 100000) AS text
            FROM documents),
        m AS (
            SELECT doc_id,
                   regexp_replace(text,
                       '([.!?]["'')\\]]?) ([A-Z0-9])',
                       '\\1' || chr(1) || '\\2', 'g') AS t
            FROM src),
        sent AS (
            SELECT doc_id,
                   unnest(range(0, len(string_split(t, chr(1)))))::INT
                       AS sent_id,
                   unnest(string_split(t, chr(1))) AS sentence
            FROM m),
        tk AS (
            SELECT doc_id, sent_id, sentence,
                   CASE WHEN trim(sentence) = '' THEN 0
                        ELSE len(string_split_regex(trim(sentence),
                                                    '\\s+')) END AS nt
            FROM sent),
        c AS (
            SELECT doc_id, sent_id, sentence, nt,
                   sum(nt) OVER (PARTITION BY doc_id ORDER BY sent_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS cum
            FROM tk)
        SELECT doc_id, ((cum - nt) // 40)::BIGINT AS chunk_id,
               string_agg(sentence, ' ' ORDER BY sent_id) AS text,
               count(*)::BIGINT AS n_sentences,
               sum(nt)::BIGINT AS n_tokens
        FROM c GROUP BY doc_id, ((cum - nt) // 40)"""
