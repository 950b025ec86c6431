"""Capstone composition test: the training-data pipeline ops chained the
way a real ingest would run them — audited ingest → exact dedup →
quality gate → length-weighted sampling → train/val/test split →
sequence packing — with conservation and determinism asserted at each
stage. Each op is oracle- or fixture-verified alone; this pins that they
compose (column contracts line up, no stage corrupts another's
invariants)."""

from __future__ import annotations

import pyspark.sql.functions as F

from hadoop_invertedindexer_spark.functions import textstats
from hadoop_invertedindexer_spark.operators import sampling
from hadoop_invertedindexer_spark.plans.contract_llm import STOPWORDS
from hadoop_invertedindexer_spark.sources.tables import read_table


def _run_pipeline(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    # 1. exact dedup on content hash (synthetic corpus has no exact dups,
    #    so this is a pass-through — asserted, not assumed)
    deduped = docs.withColumn("h", sampling.md5_hex(F.col("text"))).dropDuplicates(
        ["h"]
    ).drop("h")
    # 2. quality gate
    gated = deduped.where(
        textstats.quality_score(F.col("text"), STOPWORDS) >= 0.5
    )
    # 3. length-weighted Bernoulli sample
    sampled = sampling.weighted_sample(gated, denom=700)
    # 4. deterministic split
    split = sampling.hash_split(sampled)
    # 5. pack the train split into ~2000-char bins
    packed = sampling.pack_sequences(split.where(F.col("split") == "train"), budget=2000)
    return docs, deduped, gated, sampled, split, packed


def test_pipeline_stages_compose_and_conserve(spark, sf_dir):
    docs, deduped, gated, sampled, split, packed = _run_pipeline(spark, sf_dir)
    n_docs = docs.count()
    assert deduped.count() == n_docs  # no exact dups in the corpus
    n_gated, n_sampled = gated.count(), sampled.count()
    assert 0 < n_gated <= n_docs
    assert 0 < n_sampled <= n_gated
    # split covers the sample exactly, no overlap
    assert split.count() == n_sampled
    assert split.groupBy("doc_id").count().where("count > 1").count() == 0
    # packing loses no train docs; a pack overflows the budget by at most
    # one straddling document (offset-binning semantics: a doc joins the
    # pack its start offset falls in)
    train_n = split.where(F.col("split") == "train").count()
    assert packed.count() == train_n
    over = (
        packed.groupBy("source", "pack_id")
        .agg(F.sum("n_chars").alias("sz"), F.max("n_chars").alias("biggest"))
        .where(F.col("sz") - F.col("biggest") >= 2000)
    )
    assert over.count() == 0


def test_pipeline_is_deterministic_end_to_end(spark, sf_dir):
    _, _, _, _, split1, packed1 = _run_pipeline(spark, sf_dir)
    _, _, _, _, split2, packed2 = _run_pipeline(spark, sf_dir)
    a = {(r.doc_id, r.split) for r in split1.select("doc_id", "split").collect()}
    b = {(r.doc_id, r.split) for r in split2.select("doc_id", "split").collect()}
    assert a == b
    pa = {(r.doc_id, r.pack_id) for r in packed1.select("doc_id", "pack_id").collect()}
    pb = {(r.doc_id, r.pack_id) for r in packed2.select("doc_id", "pack_id").collect()}
    assert pa == pb


def test_round5_cleaning_pipeline_composes(spark, sf_dir):
    """Round-5 composition: boilerplate removal → bloom decontamination →
    near-dup clustering → keep-best-copy canonicalization →
    vocab/token-id encoding. Pins column contracts and the invariants
    each stage must preserve for the next."""
    from hadoop_invertedindexer_spark.operators import dedup, vocab
    from hadoop_invertedindexer_spark.operators.clusters import cluster_canonical

    docs = read_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    # 1. boilerplate removal (conservative threshold; full text kept)
    cleaned = dedup.boilerplate_removal(docs, max_df=30).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    assert cleaned.count() == n_docs  # row-preserving, content-reducing

    # 2. bloom decontamination against a pretend eval set (every 50th)
    evalset = docs.where(F.col("doc_id") % 50 == 0)
    flagged = dedup.bloom_decontaminate(
        cleaned.where(F.col("doc_id") % 50 != 0), evalset, n=3
    )
    survivors = cleaned.join(flagged.select("doc_id"), "doc_id", "left_anti")
    n_surv = survivors.count()
    assert 0 < n_surv < n_docs

    # 3. near-dup clusters over survivors → canonical member per cluster
    pairs = dedup.ngram_jaccard_pairs(survivors, n=3, threshold=0.6, max_df=100)
    canon = cluster_canonical(
        pairs, survivors.withColumn("n_chars", F.length("text"))
    )
    # every survivor is in exactly one cluster; canonical ids are survivors
    assert canon.agg(F.sum("n_members")).first()[0] == n_surv
    assert (
        canon.join(survivors, canon.canonical_id == survivors.doc_id, "left_anti")
        .count()
        == 0
    )

    # 4. keep only canonical docs, build vocab, encode
    kept = survivors.join(
        canon.select(F.col("canonical_id").alias("doc_id")), "doc_id"
    )
    v = vocab.build_vocab(kept, max_size=256)
    encoded = vocab.encode_tokens(kept, v)
    # encoding covers every kept doc with nonempty text, token counts
    # conserve, and OOV stays a minority with a corpus-fit vocab
    n_kept_nonempty = kept.where(F.length(F.trim("text")) > 0).count()
    assert encoded.count() == n_kept_nonempty
    tot = encoded.agg(
        F.sum("n_tokens").alias("t"), F.sum("n_oov").alias("o")
    ).first()
    assert tot.o < tot.t / 2


def test_capstone_contract_invariants(spark, sf_dir):
    """The r8 oracled capstone (corpus_filter → dedup_exact → upsample →
    split → pack) — invariants the value hash can't articulate: the
    planted re-ingested copies all die in dedup, every epoch of a doc
    shares its split, and the packed stream conserves Σ(tokens + 1)."""
    from hadoop_invertedindexer_spark.operators import dedup as dd
    from hadoop_invertedindexer_spark.operators import sampling as sp
    from hadoop_invertedindexer_spark.plans.contract_llm import (
        _CAPSTONE_WEIGHTS,
        q_pipeline_capstone,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    planted = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "source"
    )
    src = docs.unionByName(planted)
    verdict = textstats.corpus_filter(src, STOPWORDS)
    kept = src.join(verdict.where(F.col("is_kept")).select("doc_id"), "doc_id")
    keep_ids = dd.dedup_exact(kept).select(F.col("keep_id").alias("doc_id"))
    # every planted copy's ORIGINAL passed/failed the filter identically
    # (same text), so whenever a copy is kept its original is too and
    # dedup must always prefer the original (smaller id)
    assert keep_ids.where(F.col("doc_id") >= 1_000_000).count() == 0
    deduped = kept.join(keep_ids, "doc_id")
    ups = sp.upsample_corpus(deduped, _CAPSTONE_WEIGHTS, strata_col="source")
    split = sp.hash_split(ups)
    assert (
        split.groupBy("doc_id")
        .agg(F.count_distinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
        == 0
    )  # leakage-safe: epochs never straddle splits
    # packed stream conserves sum(doc_tokens + 1) over the train epochs
    packed = q_pipeline_capstone(spark, sf_dir)
    total = packed.agg(F.sum("n_tokens")).collect()[0][0]
    train = split.where(F.col("split") == "train").join(
        deduped.select("doc_id", "text"), "doc_id"
    )
    expect = (
        train.select(
            (
                F.size(
                    F.filter(dd.token_array("text"), lambda t: t != "")
                )
                + 1
            ).alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert total == expect


def test_classifier_distills_the_heuristic_filter(spark, sf_dir):
    """The DCLM/FineWeb-Edu weak-supervision loop: corpus_filter's
    heuristic verdicts become ±1 labels, classifier_train distills them
    into a linear model, and classifier_predict's hard votes must beat
    the majority-class baseline on the training labels (measured: 0.73
    vs 0.64 at sf0.01 — the synthetic corpus' ~31-word shared vocabulary
    limits how much a bag-of-counts model CAN recover of length/
    repetition-driven verdicts, so this pins real-but-partial signal,
    not perfect separation). Everything is hash-deterministic, so the
    accuracy is reproducible, not a flaky statistical bound."""
    docs = read_table(spark, sf_dir, "documents")
    verdicts = textstats.corpus_filter(docs, STOPWORDS, min_tokens=20)
    labeled = docs.join(verdicts.select("doc_id", "is_kept"), "doc_id").select(
        "doc_id",
        "text",
        F.when(F.col("is_kept"), F.lit(1)).otherwise(F.lit(-1)).alias("y"),
    )
    w = textstats.classifier_train(labeled, n_iters=20, n_features=512)
    preds = textstats.classifier_predict(
        labeled, w, n_features=512
    ).join(labeled.select("doc_id", "y"), "doc_id")
    rows = [(r.pred, r.y) for r in preds.collect()]
    assert len(rows) == docs.count()
    n_pos = sum(1 for _, y in rows if y == 1)
    baseline = max(n_pos, len(rows) - n_pos) / len(rows)
    acc = sum(1 for p, y in rows if p == y) / len(rows)
    assert acc > baseline + 0.05, (acc, baseline)


def test_bigram_classifier_distills_at_least_as_well(spark):
    """fastText wordNgrams=2 parity (r10, VERDICT r9 ask 4): the same
    weak-supervision distillation with hashed bigram features must
    match or beat the unigram model's training-set accuracy (measured:
    0.798 vs 0.732, baseline 0.636 — bigrams recover word-ORDER signal
    the bag of counts cannot). Pinned at sf0.01: the batch perceptron's
    final iterate oscillates (no averaging), and at sf0.001's 500 docs
    the comparison measures oscillation phase, not feature quality —
    5,000 docs is where the signal dominates. Deterministic end-to-end,
    so the comparison is exact, not statistical."""
    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    verdicts = textstats.corpus_filter(docs, STOPWORDS, min_tokens=20)
    labeled = docs.join(verdicts.select("doc_id", "is_kept"), "doc_id").select(
        "doc_id",
        "text",
        F.when(F.col("is_kept"), F.lit(1)).otherwise(F.lit(-1)).alias("y"),
    )
    accs = {}
    for ng in (1, 2):
        w = textstats.classifier_train(
            labeled, n_iters=20, n_features=512, word_ngrams=ng
        )
        preds = textstats.classifier_predict(
            labeled, w, n_features=512, word_ngrams=ng
        ).join(labeled.select("doc_id", "y"), "doc_id")
        rows = [(r.pred, r.y) for r in preds.collect()]
        accs[ng] = sum(1 for p, y in rows if p == y) / len(rows)
    n_pos = sum(1 for _, y in rows if y == 1)
    baseline = max(n_pos, len(rows) - n_pos) / len(rows)
    assert accs[2] >= accs[1] >= baseline + 0.05, (accs, baseline)


def test_classifier_gate_extends_distillation(spark):
    """r12 (VERDICT r11 ask 4) e2e: corpus_filter verdicts distill into
    a classifier, the PR sweep picks the cut, and corpus_filter_classifier
    gates the corpus with it — the full quality loop. Three seams:
    (1) the kept set's precision against the distillation labels honors
    the requested floor (the whole point of deriving the cut from the
    sweep); (2) the gate keeps SOMETHING (the floor is attainable on
    this corpus — pinned, so a training regression that collapses the
    margin distribution fails loudly); (3) the classifier verdict
    composes with corpus_filter's reason attribution into one combined
    per-document verdict frame."""
    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    verdicts = textstats.corpus_filter(docs, STOPWORDS, min_tokens=20)
    labeled = docs.join(
        verdicts.select("doc_id", "is_kept"), "doc_id"
    ).select(
        "doc_id",
        "text",
        F.when(F.col("is_kept"), F.lit(1)).otherwise(F.lit(-1)).alias("y"),
    )
    w = textstats.classifier_train(labeled, n_iters=20, n_features=512)
    floor = 800
    gate = textstats.corpus_filter_classifier(
        labeled, w, min_precision_mils=floor, n_features=512
    )
    rows = gate.join(labeled.select("doc_id", "y"), "doc_id").collect()
    kept = [r for r in rows if r.is_kept]
    assert len(kept) > 0
    kept_pos = sum(1 for r in kept if r.y == 1)
    assert kept_pos * 1000 // len(kept) >= floor
    # seam 3: combined attribution — rule reasons first, classifier
    # reason for rule-kept docs that fail the margin
    combined = (
        verdicts.withColumnRenamed("is_kept", "rule_kept")
        .withColumnRenamed("drop_reason", "rule_reason")
        .join(
            gate.select(
                "doc_id",
                F.col("is_kept").alias("clf_kept"),
                F.col("drop_reason").alias("clf_reason"),
            ),
            "doc_id",
        )
        .select(
            "doc_id",
            (F.col("rule_kept") & F.col("clf_kept")).alias("is_kept"),
            F.coalesce("rule_reason", "clf_reason").alias("drop_reason"),
        )
        .collect()
    )
    assert len(combined) == docs.count()
    for r in combined:
        assert (r.drop_reason is None) == r.is_kept
    reasons = {r.drop_reason for r in combined if r.drop_reason}
    assert "classifier_low_margin" in reasons
    assert any(x != "classifier_low_margin" for x in reasons)


def test_data_card_feeds_mixture_plan_and_upsample(spark, sf_dir):
    """r10 (VERDICT r9 ask 9) e2e: data-card report → mixture plan →
    upsample, with token conservation asserted at both seams. Link #1:
    the card's per-source NET (post-dedup) doc/token masses must equal
    mixture_plan's availability over the deduped corpus — the card
    promises 'this is what you have to mix', and the planner must see
    exactly that. Link #2: the upsampled corpus' token mass per source
    must equal Σ nt·copies with copies from the documented md5-60bit
    integer rule (no tokens created or lost beyond the per-doc copy
    counts), and land near the plan's target."""
    import hashlib

    from pyspark.sql import Window

    from hadoop_invertedindexer_spark.operators.dedup import (
        normalized_text,
        token_array,
    )

    docs = read_table(spark, sf_dir, "documents")
    card = sampling.data_card(docs, STOPWORDS).collect()
    net_tokens: dict[str, int] = {}
    net_docs: dict[str, int] = {}
    for r in card:
        net_tokens[r.source] = net_tokens.get(r.source, 0) + r.net_tokens
        net_docs[r.source] = net_docs.get(r.source, 0) + r.net_docs
    deduped = (
        docs.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(normalized_text("text")).orderBy("doc_id")
            ),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    budget = 60_000
    weights = {s: 1000 // len(net_tokens) for s in sorted(net_tokens)}
    plan = {
        r.stratum: r
        for r in sampling.mixture_plan(
            deduped, weights, budget, strata_col="source"
        ).collect()
    }
    assert set(plan) == set(net_tokens)
    for s, row in plan.items():  # conservation link #1: card == plan input
        assert row.avail_tokens == net_tokens[s], s
        assert row.n_docs == net_docs[s], s
    rates = {s: int(plan[s].rate_mils) for s in plan}
    ups = sampling.upsample_corpus(deduped, rates, strata_col="source")
    nt = {
        r.doc_id: (r.source, r.nt)
        for r in deduped.select(
            "doc_id",
            "source",
            F.size(F.filter(token_array("text"), lambda t: t != "")).alias(
                "nt"
            ),
        ).collect()
    }
    got: dict[str, int] = {}
    for r in ups.select("doc_id", "source").collect():
        s, t = nt[r.doc_id]
        got[s] = got.get(s, 0) + t

    def copies(doc_id: int, w: int) -> int:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        return w // 1000 + (1 if h * 1000 < (1 << 60) * (w % 1000) else 0)

    want: dict[str, int] = {}
    for d, (s, t) in nt.items():
        want[s] = want.get(s, 0) + t * copies(d, rates.get(s, 1000))
    assert got == want  # conservation link #2: mass == Σ nt·copies
    # the realized mass lands near the plan's target (fractional copies
    # are per-DOC, so token mass deviates by sampling of doc lengths;
    # everything is deterministic, so this is a fixed measured margin)
    for s, row in plan.items():
        if row.target_tokens > 0:
            assert abs(got.get(s, 0) - row.target_tokens) <= max(
                0.15 * row.target_tokens, 1000
            ), (s, got.get(s, 0), row.target_tokens)
