"""Deep scale soak for the three superlinear-looking queries only
(dedup_minhash, ngram_jaccard, similarity_bruteforce), one decade beyond
the 10x soak — the round-4 verdict asked whether the max_df and band
bounds still hold when planted duplicate density grows again.

Scope keeps the wall clock bounded:

* full timed runs at 30x documents/embeddings (replica density 30 per
  original — C(30,2)=435 true pairs per original vs 45 at 10x);
* candidate-count AGGREGATES (no pair materialization) at 30x AND 100x —
  at 100x the replica density (100) meets the max_df=100 cap exactly, the
  regime where the stop-shingle bound switches from "never fires on clean
  data" to "actively bounding the blow-up";
* similarity_bruteforce runs at 30x only: its scored-row count is
  analytic (N*Q) and it exists as the documented exact baseline the
  IVF/LSH paths replace.

Usage: python tools/scale_soak_deep.py [src_dir] [out_json]
Writes one JSON blob (also printed) — commit it as scale_deep_results.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hadoop_invertedindexer_spark.operators import dedup  # noqa: E402
from hadoop_invertedindexer_spark.session import get_spark  # noqa: E402
from hadoop_invertedindexer_spark.sources.tables import read_table  # noqa: E402
from tools.make_scale_dir import make_scale_dir  # noqa: E402

RUN_FACTOR = 30          # timed end-to-end runs
COUNT_FACTORS = (30, 100)  # candidate-count aggregates only
QUERIES = ("dedup_minhash", "ngram_jaccard", "similarity_bruteforce")


def dedup_candidate_counts(spark, sf_dir: str, max_df: int = 100) -> dict[str, int]:
    """The bound-governing volumes, as pure aggregates (sum of C(n,2) per
    bucket/shingle) — counts the pairs the joins WOULD expand without
    materializing them, so this stays cheap even where a full run would
    not be."""
    docs = read_table(spark, sf_dir, "documents")
    out: dict[str, int] = {"documents": docs.count()}

    sh = (
        docs.select(
            F.col("doc_id").alias("id"),
            F.explode(dedup.word_ngrams("text", 3)).alias("sh_str"),
        )
        .select("id", F.xxhash64("sh_str").alias("sh"))
        .distinct()
    )
    df_counts = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df")).persist()
    out["jaccard_candidate_pairs"] = int(
        df_counts.where(F.col("df") <= max_df)
        .select(F.sum(F.col("df") * (F.col("df") - 1) / 2))
        .first()[0]
        or 0
    )
    out["jaccard_shingles_dropped_by_max_df"] = df_counts.where(
        F.col("df") > max_df
    ).count()
    out["jaccard_uncapped_pairs"] = int(
        df_counts.select(F.sum(F.col("df") * (F.col("df") - 1) / 2)).first()[0]
        or 0
    )
    df_counts.unpersist()

    sig = dedup.minhash_signatures(docs, 64, 3)
    banded = dedup._banded_signatures(sig, 16, 4, portable=False)
    out["minhash_candidate_pairs"] = int(
        banded.groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.sum(F.col("n") * (F.col("n") - 1) / 2))
        .first()[0]
        or 0
    )
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_soak_deep.json"
    spark = get_spark(
        app_name="hii-scale-soak-deep",
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    spark.range(1000).selectExpr("sum(id)").collect()

    result: dict = {"run_factor": RUN_FACTOR, "queries": {}, "candidates": {}}
    for factor in sorted(set(COUNT_FACTORS) | {RUN_FACTOR}):
        dst = f"/tmp/sfdeep{factor}"
        facts = (
            ("documents", "embeddings") if factor == RUN_FACTOR else ("documents",)
        )
        t0 = time.perf_counter()
        make_scale_dir(src, dst, factor, facts=facts, copy_dims=False)
        print(f"built {dst} in {time.perf_counter() - t0:.1f}s", flush=True)

        if factor in COUNT_FACTORS:
            t0 = time.perf_counter()
            counts = dedup_candidate_counts(spark, dst)
            counts["count_seconds"] = round(time.perf_counter() - t0, 1)
            result["candidates"][str(factor)] = counts
            print(f"{factor}x candidates: {counts}", flush=True)

        if factor == RUN_FACTOR:
            for name in QUERIES:
                t0 = time.perf_counter()
                qs[name](spark, dst).write.format("noop").mode("overwrite").save()
                result["queries"][name] = round(time.perf_counter() - t0, 3)
                print(f"{name} @{factor}x: {result['queries'][name]}s", flush=True)

    with open(out_json, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
