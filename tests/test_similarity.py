"""Similarity search: brute-force is oracle-checked in the contract; here
the IVF path is validated by recall against brute force on real data."""

from __future__ import annotations

import pyspark.sql.functions as F

from hadoop_invertedindexer_spark.operators import similarity
from hadoop_invertedindexer_spark.sources.tables import read_table


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    cents = similarity.centroids_by_sampling(emb, every=50)
    bf = similarity.cosine_topk_bruteforce(emb, queries, k=10)
    ivf = similarity.cosine_topk_ivf(emb, queries, cents, k=10, nprobe=4)

    bf_sets: dict[int, set[int]] = {}
    for r in bf.collect():
        bf_sets.setdefault(r.qid, set()).add(r.vec_id)
    ivf_sets: dict[int, set[int]] = {}
    for r in ivf.collect():
        ivf_sets.setdefault(r.qid, set()).add(r.vec_id)

    recalls = [
        len(bf_sets[q] & ivf_sets.get(q, set())) / len(bf_sets[q]) for q in bf_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    # nprobe=4 of ~10 buckets: reasonable recall with a 40% compute budget
    assert mean_recall >= 0.5, f"IVF mean recall {mean_recall:.2f} too low"


def test_bruteforce_topk_shape(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = similarity.cosine_topk_bruteforce(emb, queries, k=10)
    per_q = out.groupBy("qid").count().collect()
    assert all(r["count"] == 10 for r in per_q)
    assert out.where((F.col("cosine") > 1.000001) | (F.col("cosine") < -1.000001)).count() == 0
