"""Round-7 scale soak (VERDICT r6 items 1 & 2): the round-6 graph
rewrites and the round-7 bounded-K semantic-dedup assignment, measured
at 10x and 30x of sf0.1.

Graph side (item 2 — kcore's drop-list anti-join + residual extend,
triangle's wedge halving, CC's residual probe changed plans in r6 but
had no scale point):
  * full timed runs of the kcore_nodes / triangle_count /
    cluster_canonical / dedup_clusters_star contract queries at 10x
    (TPC-H facts + documents replicated) and kcore/triangle at 30x;
  * the governing intermediate volumes: oriented-wedge count (the
    largest triangle intermediate, halved in r6), round-1 drop-list
    size and final core size for kcore, and CC rounds-to-fixpoint;
  * residual probes re-run in "raise" mode on the soak graphs — a
    clean exit is the proof the fixed schedules are deep enough at
    30x, not just at sf0.1.

Semantic side (item 1 — the bounded-K default must make assignment
cost linear in N at fixed K):
  * nearest-centroid ASSIGNMENT pass (ivf_assign vs K=64 bounded
    centroids) timed at 1x/10x/30x — the broadcast side stays 64 rows
    by construction, so wall clock should track N, not N^2;
  * the legacy every=50 policy's centroid count at each factor, for
    contrast (C grows with N — the defect the default change removed);
  * the two-level coarse-quantizer route at K=4096 on the 30x corpus
    (a K no flat broadcast pass should pay), with its probe volumes.

Usage: python tools/scale_soak_r7.py [src_dir] [out_json]
Writes scale_results_r7.json-shaped output (commit to repo root).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hadoop_invertedindexer_spark.caching import release_persisted  # noqa: E402
from hadoop_invertedindexer_spark.operators import similarity  # noqa: E402
from hadoop_invertedindexer_spark.operators.clusters import (  # noqa: E402
    connected_components,
)
from hadoop_invertedindexer_spark.operators.dedup import (  # noqa: E402
    ngram_jaccard_pairs,
)
from hadoop_invertedindexer_spark.operators.graph import (  # noqa: E402
    _degrees,
    kcore_nodes,
)
from hadoop_invertedindexer_spark.session import get_spark  # noqa: E402
from hadoop_invertedindexer_spark.sources.tables import read_table  # noqa: E402
from tools.make_scale_dir import make_scale_dir  # noqa: E402

GRAPH_QUERIES = ["kcore_nodes", "triangle_count"]
DOC_QUERIES = ["cluster_canonical", "dedup_clusters_star"]


def _lineitem_edges(spark, sf_dir):
    """The co-purchase edge list the kcore/triangle contract queries
    build (same derivation as relational.q_kcore / q_triangle)."""
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    x, y = li.alias("x"), li.alias("y")
    return x.join(
        y, (F.col("x.o") == F.col("y.o")) & (F.col("x.p") < F.col("y.p"))
    ).select(F.col("x.p").alias("a"), F.col("y.p").alias("b"))


def graph_metrics(spark, sf_dir) -> dict:
    """The intermediate volumes that govern the r6 graph plans."""
    out: dict = {}
    e0 = (
        _lineitem_edges(spark, sf_dir)
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    out["n_edges"] = e0.count()
    deg = _degrees(e0)
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    keyed = e0.join(da, "a").join(db, "b")
    lower_first = F.struct(F.col("da"), F.col("a")) < F.struct(
        F.col("db"), F.col("b")
    )
    # CASE branches must alias struct fields identically or analysis
    # fails with DATA_DIFF_TYPES (same as graph.py's oriented edges)
    oriented = keyed.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(
            lower_first, F.struct(F.col("db").alias("d"), F.col("b").alias("n"))
        ).otherwise(
            F.struct(F.col("da").alias("d"), F.col("a").alias("n"))
        ).alias("dk"),
    ).localCheckpoint(eager=True)
    # the wedge stream the closing join probes — halved in r6 (ky < kz
    # keeps each unordered wedge once); sum over src of C(outdeg, 2)
    out["oriented_wedges"] = int(
        oriented.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .select(F.sum(F.col("d") * (F.col("d") - 1) / 2))
        .first()[0]
        or 0
    )
    # kcore round-1 drop list (the anti-join build side) and core size
    out["kcore_round1_drops"] = _degrees(e0).where(F.col("d") < 80).count()
    out["kcore_nodes_k80"] = kcore_nodes(e0, k=80, iters=8).count()
    # residual probe in raise mode: a clean return proves iters=8 covers
    # the peeling depth on THIS graph (the self-verification guarantee)
    kcore_nodes(e0, k=80, iters=8, on_residual="raise").count()
    out["kcore_residual_probe"] = "clean"
    return out


def cc_metrics(spark, sf_dir) -> dict:
    """CC fixed-schedule coverage on the scaled near-dup pair graph."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.6, max_df=100)
    pairs = pairs.localCheckpoint(eager=True)
    out = {"near_dup_pairs": pairs.count()}
    # raise-mode probe on a 6-round fixed schedule: clean return proves
    # the contract-style schedule exceeds every component diameter here
    connected_components(
        pairs, fixed_iters=6, on_residual="raise"
    ).write.format("noop").mode("overwrite").save()
    out["cc_fixed6_residual_probe"] = "clean"
    return out


def semantic_metrics(spark, sf_dir, factor: int) -> dict:
    """Assignment cost at fixed K=64 (must be ~linear in N) + the
    legacy policy's centroid count for contrast."""
    emb = read_table(spark, sf_dir, "embeddings")
    out: dict = {"embeddings": emb.count()}
    cents = similarity.centroids_bounded(emb, k=64).localCheckpoint(eager=True)
    out["bounded_centroids"] = cents.count()  # 64 at every factor
    out["legacy_every50_centroids"] = emb.where(
        F.col("vec_id") % 50 == 0
    ).count()  # grows with N — the r6 defect
    t0 = time.perf_counter()
    similarity.ivf_assign(emb, cents).write.format("noop").mode(
        "overwrite"
    ).save()
    out["assign_k64_seconds"] = round(time.perf_counter() - t0, 3)
    if factor >= 30:
        # the large-K route: K=4096 is past any sensible flat broadcast
        # of the O(N*K) pass; the two-level assignment probes
        # ~nprobe*coarse_every centroids per vector instead of K
        big_cents = similarity.centroids_bounded(emb, k=4096).localCheckpoint(
            eager=True
        )
        t0 = time.perf_counter()
        similarity.ivf_assign_two_level(
            emb, big_cents, coarse_every=32, nprobe=2
        ).write.format("noop").mode("overwrite").save()
        out["assign_two_level_k4096_seconds"] = round(
            time.perf_counter() - t0, 3
        )
        out["two_level_scored_per_vector"] = 2 * 32 + 4096 // 32
    release_persisted()
    spark.catalog.clearCache()
    return out


def replicated_edges(spark, src_dir: str, factor: int):
    """factor disjoint copies of the sf0.1 co-purchase graph, node ids
    shifted per copy — the TOPOLOGY grows ×factor (the parquet-replica
    route does not: lineitem replicas reuse part keys, so the deduped
    edge set is IDENTICAL at any factor and only the derivation stream
    grows; both curves are reported)."""
    e = (
        _lineitem_edges(spark, src_dir)
        .where(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    shift = e.agg(F.max(F.greatest("a", "b"))).first()[0] + 1
    reps = [
        e.select(
            (F.col("a") + i * shift).alias("a"),
            (F.col("b") + i * shift).alias("b"),
        )
        for i in range(factor)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    return out.localCheckpoint(eager=True)


def graph_replica_soak(spark, src: str, out_json: str) -> None:
    """Timed runs of the r6 graph rewrites on graphs that truly grow:
    kcore at 1x/10x/30x, triangle at 1x/10x, star CC at 1x/10x, all on
    shifted-replica co-purchase graphs, residual probes in raise mode
    (clean = fixed schedules proven deep enough at every factor)."""
    from hadoop_invertedindexer_spark.operators.clusters import (
        connected_components_star,
    )
    from hadoop_invertedindexer_spark.operators.graph import triangle_count

    result: dict = {"src": src, "mode": "graph-replica", "factors": {}}
    for factor in (1, 10, 30):
        e = replicated_edges(spark, src, factor)
        fres: dict = {"edges": e.count()}
        t0 = time.perf_counter()
        fres["kcore_k80_nodes"] = kcore_nodes(
            e, k=80, iters=8, on_residual="raise"
        ).count()
        fres["kcore_seconds"] = round(time.perf_counter() - t0, 2)
        fres["kcore_residual_probe"] = "clean"
        release_persisted()
        spark.catalog.clearCache()
        if factor <= 10:
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
            fres["cc_star_components"] = (
                lbl.select("comp").distinct().count()
            )
            fres["cc_star_seconds"] = round(time.perf_counter() - t0, 2)
            fres["cc_star_residual_probe"] = "clean"
            release_persisted()
            spark.catalog.clearCache()
        print(f"replica {factor}x: {fres}", flush=True)
        result["factors"][str(factor)] = fres
        with open(out_json, "w") as fh:
            json.dump(result, fh, indent=1)
    print(json.dumps(result))


def llm_ops_soak(spark, src: str, out_json: str) -> None:
    """Timed 1x/10x runs of the round-7 LLM-pipeline operators
    (repetition signals, corpus filter, token packing, source overlap):
    all are explode + keyed-groupBy shapes, so wall clock should track
    the corpus (docs ×10, sources constant)."""
    import __spark_entry__ as em

    qs = em.queries()
    names = [
        "repetition_signals",
        "corpus_filter",
        "pack_tokens",
        "source_overlap",
    ]
    result: dict = {"src": src, "mode": "llm-ops", "factors": {}}
    for factor, d in ((1, src), (10, "/tmp/sfr7_10")):
        if factor != 1 and not os.path.isdir(d):
            make_scale_dir(src, d, factor, facts=("documents", "embeddings"))
        fres = {}
        for name in names:
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
    if len(sys.argv) > 1 and sys.argv[1] == "llm-ops":
        spark = get_spark(
            app_name="hii-scale-soak-r7-llm",
            extra_conf={"spark.driver.memory": "16g"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(1000).selectExpr("sum(id)").collect()
        llm_ops_soak(
            spark,
            sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1",
            sys.argv[3]
            if len(sys.argv) > 3
            else "/root/repo/scale_results_r7_llm.json",
        )
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "graph-replica":
        spark = get_spark(
            app_name="hii-scale-soak-r7-graph",
            extra_conf={"spark.driver.memory": "16g"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(1000).selectExpr("sum(id)").collect()
        graph_replica_soak(
            spark,
            sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1",
            sys.argv[3]
            if len(sys.argv) > 3
            else "/root/repo/scale_results_r7_graph.json",
        )
        spark.stop()
        return
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/root/repo/scale_results_r7.json"
    )
    spark = get_spark(
        app_name="hii-scale-soak-r7",
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    spark.range(1000).selectExpr("sum(id)").collect()

    result: dict = {"src": src, "factors": {}}
    for factor in (1, 10, 30):
        if factor == 1:
            dst = src
        else:
            dst = f"/tmp/sfr7_{factor}"
            facts = (
                ("orders", "lineitem", "documents", "embeddings")
                if factor == 10
                else ("orders", "lineitem", "embeddings")
            )
            t0 = time.perf_counter()
            make_scale_dir(src, dst, factor, facts=facts)
            print(f"built {dst} in {time.perf_counter() - t0:.1f}s", flush=True)
            # 30x skips documents (the doc queries' 30x point lives in
            # scale_deep_results_r6.json); copy 1x docs so read_table
            # and the contract queries still resolve
            if "documents" not in facts:
                import shutil

                shutil.copyfile(
                    f"{src}/documents.parquet", f"{dst}/documents.parquet"
                )
            if "events" not in facts:
                import shutil

                shutil.copyfile(
                    f"{src}/events.parquet", f"{dst}/events.parquet"
                )

        fres: dict = {"queries": {}}
        names = GRAPH_QUERIES + (DOC_QUERIES if factor == 10 else [])
        if factor == 1:
            names = []  # sf0.1 timings live in bench_baseline.json
        for name in names:
            t0 = time.perf_counter()
            qs[name](spark, dst).write.format("noop").mode("overwrite").save()
            fres["queries"][name] = round(time.perf_counter() - t0, 3)
            release_persisted()
            spark.catalog.clearCache()
            print(f"{name} @{factor}x: {fres['queries'][name]}s", flush=True)

        if factor > 1:
            t0 = time.perf_counter()
            fres["graph"] = graph_metrics(spark, dst)
            fres["graph"]["metric_seconds"] = round(
                time.perf_counter() - t0, 1
            )
            print(f"{factor}x graph: {fres['graph']}", flush=True)
            release_persisted()
            spark.catalog.clearCache()
        if factor == 10:
            t0 = time.perf_counter()
            fres["cc"] = cc_metrics(spark, dst)
            fres["cc"]["metric_seconds"] = round(time.perf_counter() - t0, 1)
            print(f"{factor}x cc: {fres['cc']}", flush=True)
            release_persisted()
            spark.catalog.clearCache()
        fres["semantic"] = semantic_metrics(spark, dst, factor)
        print(f"{factor}x semantic: {fres['semantic']}", flush=True)
        result["factors"][str(factor)] = fres
        with open(out_json, "w") as fh:
            json.dump(result, fh, indent=1)

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
