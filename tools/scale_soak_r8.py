"""Round-8 scale soak (VERDICT r7 asks 7 + scale evidence for the new
r8 operators).

Graph mode (``graph-30x``) — the two r7 gaps: triangle_count and star
CC stopped at 10x in scale_results_r7_graph.json; this runs BOTH at 30x
on the shifted-replica co-purchase graph (topology truly grows — the
parquet-replica trap is documented in SCALE.md), residual probes in
raise mode so a clean exit proves the fixed schedules at 30x.

Ops mode (``r8-ops``) — 1x/10x timed runs of every operator added this
round, with the scale question each answers:

* ``dedup_substrings`` — parquet-replica documents make EVERY window a
  10-way duplicate, the worst case for the sweep stage (which runs only
  on duplicated occurrences) and the reason both unbounded-side joins
  pin shuffle_hash; wall should stay near-linear, never corpus².
* ``ngram_nll`` — capped model tables are size-invariant; the scored
  stream is the only thing that grows. Expect ~linear.
* ``bpe_train`` — trains on the WORD DICTIONARY: replicas multiply
  counts, not vocab, so wall should stay nearly FLAT (the property that
  makes dictionary-space BPE viable at 100 TB).
* ``bpe_encode`` — train (flat) + a linear encode projection.
* ``pipeline_capstone`` — the six-stage chain; expect the sum of its
  parts' growth (~linear, dominated by the verdict signals + pack).
* ``ivf_drift`` — metrics read the stored assignments once; the build
  it sits on is the linear bounded-K assignment proven in r7's soak.
  Runs on an embeddings replica dir.
* ``dedup_paragraphs`` — parquet replicas make every paragraph a
  10-way duplicate: worst case for the canonical-occurrence groupBy
  (every group grows 10x) while the kept set stays 1x. Expect ~linear
  wall, output invariant under replication.
* ``dsir_select`` — both bucket-count tables stay capped at n_buckets
  regardless of corpus size; only the persisted gram stream and the
  (doc, feature) groupBy grow. Expect ~linear.
* ``classifier_score`` — broadcast weight vector is constant-size; the
  token stream + one per-doc aggregate grow. Expect ~linear.
* ``classifier_train`` — the feats build is one linear pass; each of
  the 4 perceptron rounds re-reads the persisted feats (window margin +
  feature agg over shrinking misclassified rows), and the model/delta
  stay ≤ n_features. Expect ~linear in N with a flat per-round model
  cost.
* ``epoch_shuffle`` — one shard-keyed shuffle + per-shard sorts; with
  shards ∝ a constant here, per-shard sort size grows linearly (at real
  scale you grow n_shards with the corpus). Expect ~linear.
* ``perplexity_buckets`` — the milli-cell histogram stays ~|cells|
  regardless of N; the scored stream underneath grows. Expect ~linear
  with the unigram_nll term dominating.

Usage:
  python tools/scale_soak_r8.py graph-30x [src] [out_json]
  python tools/scale_soak_r8.py r8-ops   [src] [out_json]
Writes scale_results_r8*.json (commit to repo root).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

from hadoop_invertedindexer_spark.caching import release_persisted  # noqa: E402
from hadoop_invertedindexer_spark.session import get_spark  # noqa: E402
from tools.make_scale_dir import make_scale_dir  # noqa: E402
from tools.scale_soak_r7 import replicated_edges  # noqa: E402

R8_OPS = [
    "dedup_substrings",
    "decontaminate_substrings",
    "ngram_nll",
    "bpe_train",
    "bpe_encode",
    "pipeline_capstone",
    "ivf_drift",
    "dedup_paragraphs",
    "dsir_select",
    "classifier_score",
    "classifier_train",
    "epoch_shuffle",
    "perplexity_buckets",
]


def graph_30x_soak(spark, src: str, out_json: str) -> None:
    from hadoop_invertedindexer_spark.operators.clusters import (
        connected_components_star,
    )
    from hadoop_invertedindexer_spark.operators.graph import triangle_count

    result: dict = {"src": src, "mode": "graph-30x", "factors": {}}
    for factor in (30,):
        e = replicated_edges(spark, src, factor)
        fres: dict = {"edges": e.count()}
        t0 = time.perf_counter()
        row = triangle_count(e, "a", "b").collect()[0]
        fres["triangle_seconds"] = round(time.perf_counter() - t0, 2)
        fres["n_triangles"] = row.n_triangles
        release_persisted()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        lbl = connected_components_star(
            e, src="a", dst="b", on_residual="raise"
        )
        fres["cc_star_components"] = lbl.select("comp").distinct().count()
        fres["cc_star_seconds"] = round(time.perf_counter() - t0, 2)
        fres["cc_star_residual_probe"] = "clean"
        release_persisted()
        spark.catalog.clearCache()
        print(f"graph {factor}x: {fres}", flush=True)
        result["factors"][str(factor)] = fres
        with open(out_json, "w") as fh:
            json.dump(result, fh, indent=1)
    print(json.dumps(result))


def r8_ops_soak(spark, src: str, out_json: str) -> None:
    qs = entrymod.queries()
    # untimed warmup pass at 1x: whole-stage codegen compiles per plan,
    # and the first-ever execution of each query otherwise eats the JIT
    # cost (measured: dedup_substrings 9.8 s cold vs 7.1 s at TEN times
    # the data — pure compile skew)
    for name in R8_OPS:
        qs[name](spark, src).write.format("noop").mode("overwrite").save()
        release_persisted()
        spark.catalog.clearCache()
    result: dict = {"src": src, "mode": "r8-ops", "factors": {}}
    for factor, d in ((1, src), (10, "/tmp/sfr8_10")):
        if factor != 1 and not os.path.isdir(d):
            make_scale_dir(
                src, d, factor, facts=("documents", "embeddings")
            )
        fres = {}
        for name in R8_OPS:
            t0 = time.perf_counter()
            qs[name](spark, d).write.format("noop").mode("overwrite").save()
            fres[name] = round(time.perf_counter() - t0, 3)
            release_persisted()
            spark.catalog.clearCache()
            print(f"{name} @{factor}x: {fres[name]}s", flush=True)
        result["factors"][str(factor)] = fres
        with open(out_json, "w") as fh:
            json.dump(result, fh, indent=1)
    print(json.dumps(result))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "r8-ops"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    default_out = {
        "graph-30x": "/root/repo/scale_results_r8_graph.json",
        "r8-ops": "/root/repo/scale_results_r8_ops.json",
    }[mode]
    out_json = sys.argv[3] if len(sys.argv) > 3 else default_out
    spark = get_spark(
        app_name=f"hii-scale-soak-r8-{mode}",
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    if mode == "graph-30x":
        graph_30x_soak(spark, src, out_json)
    else:
        r8_ops_soak(spark, src, out_json)
    spark.stop()


if __name__ == "__main__":
    main()
