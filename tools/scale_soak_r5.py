"""Focused 10x soak for the round-5 operators (bloom decontamination,
duplicate passages, triangle count, token encoding): wall clock at
sf0.1 and at 10x, plus the bound metrics that govern each design:

* duplicate_passages — count of duplicated-shingle intervals reaching
  the window stage (the only term that could blow up; bounded by true
  cross-doc duplication, not corpus^2);
* bloom_decontaminate — flagged train shingles (bounded by real overlap
  + the fixed false-positive rate of the 2^17-bit filter);
* triangle_count — wedge count after degree-ordered orientation (the
  O(m^{3/2}) bound).

Usage: python tools/scale_soak_r5.py [out_json]
Builds /tmp/sfscale (10x of sf0.1) via make_scale_dir if absent.
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

QUERIES = [
    "duplicate_passages",
    "bloom_decontaminate",
    "triangle_count",
    "tokens_encode",
    "vocab_build",
    "audio_features",
]


def bound_metrics(spark, sf_dir: str) -> dict[str, int]:
    docs = read_table(spark, sf_dir, "documents")
    out = {"documents": docs.count()}
    sh = (
        docs.select(
            F.col("doc_id").alias("id"),
            F.posexplode(dedup.word_ngrams("text", 8)).alias("pos", "sh_str"),
        )
        .select("id", "pos", F.xxhash64("sh_str").alias("sh"))
    )
    out["passage_shingles_total"] = sh.count()
    dup = (
        sh.groupBy("sh")
        .agg(F.count_distinct("id").alias("df"))
        .where(F.col("df") >= 2)
    )
    out["passage_dup_shingles"] = dup.count()
    out["passage_intervals_to_window"] = sh.join(
        dup.select("sh").hint("shuffle_hash"), "sh"
    ).count()

    train = docs.where(F.col("doc_id") % 50 != 0)
    evalset = docs.where(F.col("doc_id") % 50 == 0)
    out["bloom_flagged_shingles"] = (
        dedup.bloom_decontaminate(train, evalset, n=3)
        .agg(F.sum("n_flagged"))
        .first()[0]
        or 0
    )

    li = (
        read_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    x, y = li.alias("x"), li.alias("y")
    e0 = (
        x.join(y, (F.col("x.o") == F.col("y.o")) & (F.col("x.p") < F.col("y.p")))
        .select(
            F.least(F.col("x.p"), F.col("y.p")).alias("a"),
            F.greatest(F.col("x.p"), F.col("y.p")).alias("b"),
        )
        .distinct()
    )
    deg = (
        e0.select(F.col("a").alias("n"))
        .unionAll(e0.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    keyed = e0.join(da, "a").join(db, "b")
    lower = F.struct(F.col("da"), F.col("a")) < F.struct(F.col("db"), F.col("b"))
    oriented = keyed.select(
        F.when(lower, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lower, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )
    out["triangle_edges"] = e0.count()
    out["triangle_wedges"] = int(
        oriented.groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.sum(F.col("n") * (F.col("n") - 1)))
        .first()[0]
        or 0
    )
    return out


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "scale_results_r5.json"
    scale_dir = "/tmp/sfscale"
    if not os.path.isdir(scale_dir):
        print("building 10x dir...", flush=True)
        make_scale_dir("/root/testdata/sf0.1", scale_dir, 10)
    spark = get_spark(
        app_name="soak-r5",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # real warmup: run every soaked query once at sf0.001 so codegen /
    # Arrow / Python-worker startup is paid before any timed run (the
    # first pass otherwise reads ~2x slow and inverts the scale ratios)
    for name in QUERIES:
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    result: dict = {"factor_vs_sf01": 10, "queries": {}, "bounds": {}}
    for sf_name, sf_dir in [("sf0.1", "/root/testdata/sf0.1"), ("10x", scale_dir)]:
        result["queries"][sf_name] = {}
        for name in QUERIES:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            result["queries"][sf_name][name] = dt
            print(f"{sf_name} {name}: {dt}s", flush=True)
        result["bounds"][sf_name] = bound_metrics(spark, sf_dir)
        print(sf_name, result["bounds"][sf_name], flush=True)
    with open(out_json, "w") as fh:
        json.dump(result, fh, indent=1)
    print("wrote", out_json)
    spark.stop()


if __name__ == "__main__":
    main()
