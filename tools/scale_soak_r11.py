"""Round-11 scale soak (VERDICT r10 ask 4): the pair-join dedup tail —
``winnow_overlap_pairs`` and ``containment_pairs`` stopped at 10x in
scale_results_r10_winnow.json; this takes them to 30x under the
SHIFTED-REPLICA worst case and verifies the ``max_df`` fanout cap is
what keeps the pair join bounded (the claim at dedup.py's
winnow_overlap_pairs/containment_pairs docstrings).

Why shifted replicas are the worst case here: make_scale_dir gives each
replica disjoint doc ids and a distinct leading marker token, so almost
every shingle/fingerprint's document frequency MULTIPLIES by the factor
— at 30x each base key sits in ~30 documents, which is exactly the
regime where (a) genuinely-shared keys fan the self-join into
C(30,2)-sized near-dup cliques (real output — the replicas ARE
near-dups) and (b) any key with base df >= ceil(max_df/30)+1 crosses
``max_df`` and must be DROPPED by the cap before the join (recorded as
capped_keys; without the cap those keys alone would contribute
df^2-scale join rows). The op is quadratic in clique size by problem
statement, so the honest scale posture is: growth tracks the real
near-dup pair volume (n_pairs, recorded), never the stop-key fanout.

Also re-checks the executed 30x plans for join strategy (shuffle-hash /
broadcast / sort-merge counts): Catalyst's size under-estimates are
most broadcast-prone exactly on the post-aggregate df-cap frames, and a
corpus-derived broadcast is the 100 TB OOM hazard (the r4 lesson).

Usage:
  python tools/scale_soak_r11.py pairs-30x [src] [out_json]
Writes scale_results_r11_pairs.json (commit to repo root).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hadoop_invertedindexer_spark.caching import release_persisted  # noqa: E402
from hadoop_invertedindexer_spark.operators import dedup  # noqa: E402
from hadoop_invertedindexer_spark.session import get_spark  # noqa: E402
from tools.make_scale_dir import make_scale_dir  # noqa: E402

MAX_DF = 100


def _scale_dir(src: str, factor: int) -> str:
    if factor == 1:
        return src
    d = f"/tmp/sfr11_{factor}"
    if not os.path.isdir(d):
        make_scale_dir(src, d, factor, facts=("documents",), copy_dims=False)
    return d


def _hygiene(spark) -> None:
    release_persisted()
    spark.catalog.clearCache()


def _docs(spark, d: str):
    return spark.read.parquet(f"{d}/documents.parquet")


def _winnow(docs):
    return dedup.winnow_overlap_pairs(
        docs, k=5, w=4, min_shared=2, max_df=MAX_DF
    )


def _containment(docs):
    return dedup.containment_pairs(
        docs, n=3, threshold=0.8, max_df=MAX_DF
    )


def _capped_keys(docs, kind: str) -> int:
    """How many distinct keys the max_df cap removed — the fanout the
    pair join never sees. Winnow counts over the selected-fingerprint
    stream, containment over the distinct-shingle stream (mirrors each
    op's own df-cap input exactly)."""
    if kind == "winnow":
        per_doc = (
            dedup.winnow_fingerprints(docs, k=5, w=4)
            .select(F.col("doc_id").alias("id"), "fp")
            .distinct()
            .groupBy("fp")
            .agg(F.count(F.lit(1)).alias("df"))
        )
    else:
        per_doc = (
            docs.select(
                F.col("doc_id").alias("id"),
                F.explode(dedup.word_ngrams("text", 3)).alias("s"),
            )
            .select("id", F.xxhash64("s").alias("sh"))
            .distinct()
            .groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
        )
    return per_doc.where(F.col("df") > MAX_DF).count()


def _join_counts(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "shuffle_hash_joins": plan.count("ShuffledHashJoin"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
    }


def pairs_30x_soak(spark, src: str, out_json: str) -> None:
    # untimed 1x warmup: compile codegen per plan (1x otherwise reads
    # HIGHER than 10x — the r8 soak lesson)
    base = _docs(spark, src)
    _winnow(base).write.format("noop").mode("overwrite").save()
    _hygiene(spark)
    _containment(base).write.format("noop").mode("overwrite").save()
    _hygiene(spark)

    result: dict = {"src": src, "mode": "pairs-30x", "max_df": MAX_DF,
                    "factors": {}}
    for factor in (1, 10, 30):
        d = _scale_dir(src, factor)
        docs = _docs(spark, d)
        fres: dict = {"docs": docs.count()}
        for name, build, kind in (
            ("winnow_overlap_pairs", _winnow, "winnow"),
            ("containment_pairs", _containment, "containment"),
        ):
            t0 = time.perf_counter()
            n_pairs = build(docs).count()
            fres[name] = round(time.perf_counter() - t0, 3)
            fres[f"{name}_n_pairs"] = n_pairs
            _hygiene(spark)
            fres[f"{name}_capped_keys"] = _capped_keys(docs, kind)
            _hygiene(spark)
            print(
                f"{name} @{factor}x: {fres[name]}s, pairs={n_pairs}, "
                f"capped={fres[f'{name}_capped_keys']}",
                flush=True,
            )
        if factor == 30:
            fres["plan_pins_30x"] = {
                "winnow_overlap_pairs": _join_counts(_winnow(docs)),
                "containment_pairs": _join_counts(_containment(docs)),
            }
            _hygiene(spark)
        result["factors"][str(factor)] = fres
        with open(out_json, "w") as fh:
            json.dump(result, fh, indent=1)
    print(json.dumps(result))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "pairs-30x"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_json = (
        sys.argv[3]
        if len(sys.argv) > 3
        else "/root/repo/scale_results_r11_pairs.json"
    )
    spark = get_spark(
        app_name=f"hii-scale-soak-r11-{mode}",
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    if mode != "pairs-30x":
        raise SystemExit(f"unknown mode {mode}")
    pairs_30x_soak(spark, src, out_json)
    spark.stop()


if __name__ == "__main__":
    main()
