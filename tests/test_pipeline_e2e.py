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
