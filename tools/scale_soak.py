"""Scale soak: run the headline queries at a scaled-up sf directory
(tools/make_scale_dir.py) and log the candidate-generation counts that
govern whether the bucketed dedup/ANN designs stay sub-quadratic.

Prints one line per query (flushed immediately — the run is long) and a
final JSON blob; compare against bench_baseline.json (sf0.1) to check
per-query growth vs the data growth factor.

Usage: python tools/scale_soak.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hadoop_invertedindexer_spark.operators import dedup, similarity  # noqa: E402
from hadoop_invertedindexer_spark.session import get_spark  # noqa: E402
from hadoop_invertedindexer_spark.sources.tables import read_table  # noqa: E402

# the scale-sensitive subset of bench.py's HEADLINE (golden_corpus_index
# reads the fixed reference corpus, so it is excluded here)
QUERIES = [
    "format_line",
    "tpch_q1_pricing_summary",
    "tpch_q6_forecast_revenue",
    "tpch_q9_product_profit",
    "tpch_q18_large_orders",
    "tpch_q21_waiting_suppliers",
    "tpch_q5_local_supplier",
    "group_distinct",
    "window_rank",
    "topk",
    "events_tumbling",
    "events_session",
    "dedup_exact",
    "dedup_minhash",
    "ngram_jaccard",
    "similarity_bruteforce",
    "tf_idf",
    "bm25_search",
    "phrase_search",
    "cohort_retention",
    "hourly_anomalies",
    "pagerank",
    "decontaminate",
    "pii_redact",
    "bigram_topk",
    "asof_join",
    "range_join",
    # round-5 operators (focused 10x/30x numbers in scale_results_r5*.json)
    "duplicate_passages",
    "bloom_decontaminate",
    "triangle_count",
    "tokens_encode",
    "audio_features",
    "bloom_join_reduction",
    "postings_compressed",
    "events_daily_p95_hist",
    "cluster_canonical",
]


def candidate_counts(spark, sf_dir: str) -> dict[str, int]:
    """The pair/candidate volumes of every bucketed candidate-generation
    design, computed from the same intermediate frames the operators
    build. Sub-quadratic growth of these counts under a 10x corpus is
    the scale argument; a quadratic blow-up here is the failure mode the
    max_df / banding / nprobe bounds exist to prevent."""
    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    out: dict[str, int] = {}
    out["documents"] = docs.count()
    out["embeddings"] = emb.count()

    # ngram-jaccard: join fanout = sum over KEPT shingles (df <= max_df)
    # of C(df, 2) — the exact number of (a, b) row pairs the self-join
    # expands before the per-pair groupBy
    sh = (
        docs.select(
            F.col("doc_id").alias("id"),
            F.explode(dedup.word_ngrams("text", 3)).alias("sh_str"),
        )
        .select("id", F.xxhash64("sh_str").alias("sh"))
        .distinct()
    )
    df_counts = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    out["jaccard_candidate_pairs"] = int(
        df_counts.where(F.col("df") <= 100)
        .select(F.sum(F.col("df") * (F.col("df") - 1) / 2))
        .first()[0]
        or 0
    )
    out["jaccard_shingles_dropped_by_max_df"] = df_counts.where(
        F.col("df") > 100
    ).count()

    # minhash-LSH: candidates = sum over (band, bandhash) buckets of
    # C(n, 2) (pre-dedup pair expansions of the banded equi-join)
    sig = dedup.minhash_signatures(docs, 64, 3)
    rows_per_band = 64 // 16
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda bi: F.struct(
                    bi.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(
                                    F.col("sig"), bi * rows_per_band + 1, rows_per_band
                                ),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("bh"),
                ),
            )
        ).alias("b"),
    ).select("id", "b.band", "b.bh")
    out["minhash_candidate_pairs"] = int(
        banded.groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.sum(F.col("n") * (F.col("n") - 1) / 2))
        .first()[0]
        or 0
    )

    # IVF: scored rows = sum over probed (query, bucket) pairs of the
    # bucket size — the exact row count entering the per-query top-k
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    cents = similarity.centroids_by_sampling(emb, every=50)
    assigned = similarity.ivf_assign(emb, cents)
    bucket_sizes = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("bn"))
    from pyspark.sql import Window

    qw = Window.partitionBy("qid").orderBy(F.desc("qsim"), F.asc("cid"))
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .select(
            "qid", "cid", dedup.cosine_expr(F.col("qvec"), F.col("cvec")).alias("qsim")
        )
        .withColumn("rn", F.row_number().over(qw))
        .where(F.col("rn") <= 4)
    )
    out["ivf_scored_rows"] = int(
        probes.join(bucket_sizes, "cid").select(F.sum("bn")).first()[0] or 0
    )
    out["ivf_queries"] = queries.count()
    out["bruteforce_scored_rows"] = out["ivf_queries"] * out["embeddings"]
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_soak.json"
    # 10x data needs a real driver heap: the default 1g local driver dies
    # building a broadcast that sat comfortably under the 64 MB threshold
    # estimate (tpch_q21's lineitem-derived side at 10x). On a cluster the
    # driver is sized by deployment; in local mode it must be set before
    # the JVM starts, hence here and not in the shared session factory.
    spark = get_spark(
        app_name="hii-scale-soak",
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in QUERIES:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"{name}: {timings[name]}s", flush=True)

    counts = candidate_counts(spark, sf_dir)
    print("candidates:", counts, flush=True)
    result = {"sf_dir": sf_dir, "queries": timings, "candidates": counts,
              "total": round(sum(timings.values()), 3)}
    with open(out_json, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
