"""Scale soak for the PERSISTED-INDEX incremental MinHash path (VERDICT
r5 item 5): the full-rebuild candidate bounds were audited to 100x, but
``minhash_index_pairs``'s batch-broadcast join and the ``_estimate_pairs``
signature re-attachment had no measured scale point.

At ``FACTOR``x (default 30) documents, split exactly like the contract
query (corpus = doc_id % 10 != 0 indexed once; batch = doc_id % 10 == 0
arrives later) and measure:

* index-build wall (the once-per-corpus cost a daily-ingest deployment
  amortizes away),
* append wall (O(batch) admit step),
* incremental-query wall + result pairs,
* the bound-governing candidate volumes as pure aggregates:
  batch-vs-index band collisions (sum over (band,bh) of n_idx*n_batch),
  batch-internal collisions (sum C(n_batch,2)), and the UNIQUE pair
  count that actually reaches the per-pair 64-element estimate join —
  the number that would stress _estimate_pairs at 100x density.

Usage: python tools/scale_soak_incremental.py [src_dir] [out_json] [factor]
Writes one JSON blob (also printed) — commit as scale_incremental_results.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hadoop_invertedindexer_spark.caching import release_persisted  # noqa: E402
from hadoop_invertedindexer_spark.operators import dedup  # noqa: E402
from hadoop_invertedindexer_spark.session import get_spark  # noqa: E402
from hadoop_invertedindexer_spark.sources.tables import read_table  # noqa: E402
from tools.make_scale_dir import make_scale_dir  # noqa: E402


def candidate_counts(spark, path: str, batch) -> dict[str, int]:
    """Collision volumes without materializing any pair stream."""
    p = spark.read.parquet(f"{path}/params").head()
    idx = spark.read.parquet(f"{path}/banded").select("id", "band", "bh")
    bb = dedup._banded_signatures(
        dedup.minhash_signatures(
            batch, p.num_perm, p.n, portable=p.portable
        ),
        p.bands,
        p.num_perm // p.bands,
        p.portable,
    )
    idx_n = idx.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("ni"))
    bat_n = bb.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("nb"))
    cross = int(
        idx_n.join(bat_n, ["band", "bh"])
        .select(F.sum(F.col("ni") * F.col("nb")))
        .first()[0]
        or 0
    )
    within = int(
        bat_n.select(F.sum(F.col("nb") * (F.col("nb") - 1) / 2)).first()[0]
        or 0
    )
    # the volume that reaches _estimate_pairs: unique pairs after the
    # band fanout collapses (cross+within count every band collision)
    a, b = idx.alias("a"), F.broadcast(bb).alias("b")
    uniq_cross = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
        )
    )
    ba, bbb = bb.alias("a"), bb.alias("b")
    uniq_within = ba.join(
        bbb,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bh") == F.col("b.bh"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    unique_pairs = (
        uniq_cross.union(uniq_within).dropDuplicates(["id_a", "id_b"]).count()
    )
    return {
        "band_collisions_batch_vs_index": cross,
        "band_collisions_batch_internal": within,
        "unique_pairs_into_estimate_join": unique_pairs,
    }


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = (
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_soak_incremental.json"
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    spark = get_spark(
        app_name="hii-scale-soak-incremental",
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    dst = f"/tmp/sfinc{factor}"
    t0 = time.perf_counter()
    make_scale_dir(src, dst, factor, facts=("documents",), copy_dims=False)
    print(f"built {dst} in {time.perf_counter() - t0:.1f}s", flush=True)

    docs = read_table(spark, dst, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    batch = docs.where(F.col("doc_id") % 10 == 0)
    result: dict = {
        "factor": factor,
        "documents": docs.count(),
        "corpus_docs": corpus.count(),
        "batch_docs": batch.count(),
    }

    path = tempfile.mkdtemp(prefix="mhidx_soak_") + "/mh"
    t0 = time.perf_counter()
    dedup.build_minhash_index(corpus, path)  # xxhash64 scale path
    result["index_build_seconds"] = round(time.perf_counter() - t0, 2)
    release_persisted()

    # append a second batch-sized slice to time the admit step (ids must
    # stay unique vs the index, so reuse the batch slice shifted far out)
    shifted = batch.select(
        (F.col("doc_id") + 10_000_000_000).alias("doc_id"), "text"
    )
    t0 = time.perf_counter()
    dedup.append_minhash_index(shifted, path)
    result["append_seconds"] = round(time.perf_counter() - t0, 2)
    release_persisted()
    # drop the appended slice again so the query measures the clean split
    shutil.rmtree(path, ignore_errors=True)
    dedup.build_minhash_index(corpus, path)
    release_persisted()

    t0 = time.perf_counter()
    pairs = dedup.minhash_index_pairs(spark, batch, path, threshold=0.5)
    result["incremental_pairs"] = pairs.count()
    result["incremental_query_seconds"] = round(time.perf_counter() - t0, 2)
    release_persisted()

    t0 = time.perf_counter()
    result.update(candidate_counts(spark, path, batch))
    result["candidate_count_seconds"] = round(time.perf_counter() - t0, 2)
    release_persisted()

    with open(out_json, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
