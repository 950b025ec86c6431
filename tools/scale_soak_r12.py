"""Round-12 scale soak (VERDICT r11 ask 2): extend the ladder to 100x.

Every prior soak stops at 30x; the brief's bar is "survives 100x". Two
modes, both writing into ONE artifact (scale_results_r12_100x.json) so
the round's scale story lives in one file:

``index-100x`` — the persisted-index lifecycle (build / append /
incremental-query / stats / threshold-compact) for the EXACT and
MINHASH tiers at 1/10/30/100x shifted-replica corpora. The claims under
test, per step:

* ``build_*_index``        — the one-off cost: ~linear in corpus.
* ``append_*_index``       — O(batch): FLAT as the corpus grows 100x
                             (nothing stored is read or rewritten).
* incremental query        — O(batch + one stored-key scan): the scan
                             term grows with the index (honest), the
                             batch term doesn't; at 100x this must
                             stay far below the build cost.
* ``index_tier_stats``     — one count + one distinct per stored
                             table: ~linear scan of fixed-width keys.
* ``maintain_index_tier``  — the r12 loop-closer: the trigger read is
                             metadata-scale; the rotation is the
                             compactor's read-distinct-rewrite
                             (~linear in index size, reclaims exactly
                             the replayed-append dup rows this soak
                             plants: 2 untimed replays per factor).

The exact-tier batch reuses replica-0 texts with shifted ids (appends
are pure dup mass — what compaction reclaims); the minhash batch
replays the SAME append (the documented crash-retry case — shifted ids
would land distinct signature rows and give the compactor nothing).
After a triggered rotation the incremental query is re-run against the
compacted copy and must return the same rows (recorded, untimed).

``pairs-100x`` — one pair-join family at 100x. Full-corpus rows time
``winnow_overlap_pairs`` and ``containment_pairs`` at 1/30/100x with
their r12 cap reports alongside (the saturation that is silent inside
the ops is LOUD in the artifact: at 100x every shingle with base df>=2
crosses max_df=100, so containment saturates toward zero while the
report's dropped_mass_mils says exactly how blind the detector went).
The escalation rows run on a 1000-doc base slice replicated 30x —
sized from the measured df distribution (max slice df=11, so tier 400
un-caps EVERYTHING at 30x and bounds the self-join at
900 * sum(df^2) ~ 137M rows, while the plain cap 100 keeps only
base-df<=3 keys and only 87/1000 docs retain the 80% shingle mass the
containment threshold needs): the plain row shows the suppressed pair
count, the tiered row (max_df_tiers=(100, 400)) shows the recall the
escalation buys back — the r11 ask-1 "nonzero recall at 30x under
escalation" soak row. The FULL corpus is deliberately not escalated at
100x: replicas are genuine near-dups, so full recall there is a
quadratic TRUE answer (~10^4 * sum(df^2) ~ 28G join rows) — the last
tier staying the hard bound is the designed behavior, and the cap
report prices exactly what it costs in recall.

Executed-plan join-strategy counts are recorded at the top factor for
every join-bearing query (the r4 lesson: Catalyst's size
under-estimates are most broadcast-prone on post-aggregate frames;
corpus-side BHJ = the 100 TB OOM hazard; the minhash incremental
query's one BHJ is the DELIBERATE batch-side broadcast and is labeled
as such). Per-step shuffle volume (peak single-stage + total shuffle
write) comes from the Spark UI REST API — "peak shuffle" is the number
that predicts whether a 1000-executor run fits its shuffle disks.

Usage:
  python tools/scale_soak_r12.py index-100x  [src] [out_json]
  python tools/scale_soak_r12.py pairs-100x  [src] [out_json]
  python tools/scale_soak_r12.py substr-100x [src] [out_json]
  python tools/scale_soak_r12.py ann-100x    [src] [out_json]
  python tools/scale_soak_r12.py graph-100x  [src] [out_json]
Writes/merges scale_results_r12_100x.json (commit to repo root).
``substr-100x`` repeats the index-100x lifecycle protocol for the
window + sentence tiers (paragraph shares the sentence code path);
``ann-100x`` does the same for the IVF tier incl. maintain_ivf_index;
``graph-100x`` takes the iterative family (kcore / triangles / star
CC) to a 119.6 M-edge shifted-replica graph with raise-mode residual
probes — together, 100x evidence for every persisted tier and every
iterative schedule in the engine.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hadoop_invertedindexer_spark.caching import release_persisted  # noqa: E402
from hadoop_invertedindexer_spark.operators import dedup  # noqa: E402
from hadoop_invertedindexer_spark.session import get_spark  # noqa: E402
from tools.make_scale_dir import make_scale_dir  # noqa: E402

MAX_DF = 100
ESC_TIERS = (100, 400)
INDEX_FACTORS = (1, 10, 30, 100)
PAIR_FACTORS = (1, 30, 100)


def _scale_dir(src: str, factor: int) -> str:
    if factor == 1:
        return src
    d = f"/tmp/sfr12_{factor}"
    if not os.path.isdir(d):
        make_scale_dir(src, d, factor, facts=("documents",), copy_dims=False)
    return d


def _slice_dir(src: str, n_docs: int = 1000) -> str:
    """A n_docs-doc base corpus (smallest doc_ids) for the escalation
    rows — sized so the un-capped tier's self-join stays bounded."""
    d = f"/tmp/sfr12_slice{n_docs}"
    if not os.path.isdir(d):
        os.makedirs(d, exist_ok=True)
        duckdb.connect().sql(
            f"COPY (SELECT * FROM read_parquet('{src}/documents.parquet')"
            f" ORDER BY doc_id LIMIT {n_docs})"
            f" TO '{d}/documents.parquet' (FORMAT PARQUET)"
        )
    return d


def _hygiene(spark) -> None:
    release_persisted()
    spark.catalog.clearCache()


def _docs(spark, d: str):
    return spark.read.parquet(f"{d}/documents.parquet")


def _shift_ids(docs, by: int):
    return docs.select(
        (F.col("doc_id") + F.lit(by)).alias("doc_id"),
        *[c for c in docs.columns if c != "doc_id"],
    )


def _same_rows(a, b) -> bool:
    """Multiset equality (ADVICE r12): count()-equality cannot detect
    different rows with matching counts, so rotation-equivalence checks
    compare the full row multisets — exceptAll empty in BOTH directions
    (exceptAll is bag semantics, so duplicate-multiplicity differences
    are caught too)."""
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def _join_counts(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "shuffle_hash_joins": plan.count("ShuffledHashJoin"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "broadcast_nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
    }


class ShuffleMeter:
    """Per-step shuffle volume from the UI REST API: mark() a stage-id
    watermark before the step, since() sums/maxes shuffle write bytes
    over the stages the step ran. Best-effort (returns {} if the UI is
    off) — the soak's timings never depend on it."""

    def __init__(self, spark) -> None:
        self.base = spark.sparkContext.uiWebUrl
        self.app = spark.sparkContext.applicationId

    def _stages(self) -> list:
        if not self.base:
            return []
        url = f"{self.base}/api/v1/applications/{self.app}/stages"
        try:
            with urllib.request.urlopen(url, timeout=10) as r:
                return json.load(r)
        except Exception:
            return []

    def mark(self) -> int:
        return max((s["stageId"] for s in self._stages()), default=-1)

    def since(self, mark: int) -> dict:
        wr = [
            s.get("shuffleWriteBytes", 0)
            for s in self._stages()
            if s["stageId"] > mark
        ]
        if not wr:
            return {}
        return {
            "peak_stage_shuffle_write_mb": round(max(wr) / 1e6, 2),
            "total_shuffle_write_mb": round(sum(wr) / 1e6, 2),
        }


def _merge_out(out_json: str, mode: str, payload: dict) -> None:
    merged = {}
    if os.path.exists(out_json):
        with open(out_json) as fh:
            merged = json.load(fh)
    merged[mode] = payload
    with open(out_json, "w") as fh:
        json.dump(merged, fh, indent=1)


def index_100x_soak(spark, src: str, out_json: str) -> None:
    meter = ShuffleMeter(spark)
    batch1 = _docs(spark, src)  # replica-0 texts
    # exact tier batch: fresh ids; even doc_ids keep published texts
    # (append = pure dup mass, the compaction target; they DROP in the
    # incremental query), odd ones get a marker (batch-fresh keepers —
    # so the post-rotation equality check compares nonzero rows)
    ex_batch = _shift_ids(
        batch1.withColumn(
            "text",
            F.when(F.col("doc_id") % 2 == 1, F.concat(F.lit("bx "), "text"))
            .otherwise(F.col("text")),
        ),
        10_000_000,
    )
    mh_batch = _shift_ids(batch1, 20_000_000)  # minhash tier: ids unique vs index

    def timed(fres: dict, key: str, fn):
        m = meter.mark()
        t0 = time.perf_counter()
        out = fn()
        fres[key] = round(time.perf_counter() - t0, 3)
        sh = meter.since(m)
        if sh:
            fres[f"{key}_shuffle"] = sh
        _hygiene(spark)
        return out

    # untimed warmup of the query plans (codegen skew otherwise makes
    # 1x read higher than 10x — the r8 soak lesson)
    wtmp = tempfile.mkdtemp(prefix="r12warm_")
    dedup.build_exact_index(batch1, f"{wtmp}/exidx")
    dedup.dedup_exact_incremental(
        spark, ex_batch, f"{wtmp}/exidx"
    ).write.format("noop").mode("overwrite").save()
    dedup.build_minhash_index(batch1, f"{wtmp}/mhidx")
    dedup.minhash_index_pairs(
        spark, mh_batch, f"{wtmp}/mhidx", threshold=0.5
    ).write.format("noop").mode("overwrite").save()
    _hygiene(spark)

    result: dict = {"src": src, "factors": {}}
    for factor in INDEX_FACTORS:
        corpus = _docs(spark, _scale_dir(src, factor))
        tmp = tempfile.mkdtemp(prefix=f"r12idx_{factor}_")
        fres: dict = {"corpus_docs": corpus.count()}

        # ---- exact tier ----
        expath = f"{tmp}/exidx"
        timed(fres, "exact_build", lambda: dedup.build_exact_index(corpus, expath))
        # real ingest order: query the batch against the index FIRST
        # (timed: O(batch + stored-key scan)), then admit it
        n_inc = timed(
            fres, "exact_incremental_query",
            lambda: dedup.dedup_exact_incremental(spark, ex_batch, expath).count(),
        )
        fres["exact_incremental_rows"] = n_inc
        timed(
            fres, "exact_append_batch",
            lambda: dedup.append_exact_index(ex_batch, expath),
        )
        for _ in range(2):  # replayed appends: the dup mass compaction reclaims
            dedup.append_exact_index(ex_batch, expath)
        stats = timed(
            fres, "exact_tier_stats",
            lambda: index_tier_rows(spark, expath, ("hashes",)),
        )
        fres["exact_dup_mils"] = stats[0]["dup_mils"]
        rot = f"{tmp}/exidx_rot"
        maint = timed(
            fres, "exact_maintain_compact",
            lambda: [
                r.asDict()
                for r in dedup.maintain_index_tier(
                    spark, expath, rot, "exact", max_dup_mils=10
                ).collect()
            ],
        )
        fres["exact_compacted"] = maint[0]["compacted"]
        fres["exact_reclaimed_rows"] = sum(r["reclaimed_rows"] for r in maint)
        # a FRESH probe batch must answer identically against the
        # appended original and the compacted rotation (nonzero rows:
        # 'cx ' texts are unpublished)
        probe = _shift_ids(
            batch1.withColumn("text", F.concat(F.lit("cx "), "text")), 30_000_000
        )
        fres["exact_incremental_equal_after_rotate"] = _same_rows(
            dedup.dedup_exact_incremental(spark, probe, rot),
            dedup.dedup_exact_incremental(spark, probe, expath),
        )
        _hygiene(spark)

        # ---- minhash tier ----
        mhpath = f"{tmp}/mhidx"
        timed(
            fres, "minhash_build",
            lambda: dedup.build_minhash_index(corpus, mhpath),
        )
        # real ingest order: flag the batch's near-dups FIRST, then admit
        n_pairs = timed(
            fres, "minhash_incremental_query",
            lambda: dedup.minhash_index_pairs(
                spark, mh_batch, mhpath, threshold=0.5
            ).count(),
        )
        fres["minhash_incremental_pairs"] = n_pairs
        timed(
            fres, "minhash_append_batch",
            lambda: dedup.append_minhash_index(mh_batch, mhpath),
        )
        for _ in range(2):  # replayed appends (crash-retry): dup signature rows
            dedup.append_minhash_index(mh_batch, mhpath)
        stats = timed(
            fres, "minhash_tier_stats",
            lambda: index_tier_rows(spark, mhpath, ("signatures", "banded")),
        )
        fres["minhash_dup_mils"] = max(r["dup_mils"] for r in stats)
        mrot = f"{tmp}/mhidx_rot"
        maint = timed(
            fres, "minhash_maintain_compact",
            lambda: [
                r.asDict()
                for r in dedup.maintain_index_tier(
                    spark, mhpath, mrot, "minhash", max_dup_mils=10
                ).collect()
            ],
        )
        fres["minhash_compacted"] = maint[0]["compacted"]
        fres["minhash_reclaimed_rows"] = sum(r["reclaimed_rows"] for r in maint)
        # fresh-id probe: identical pairs against the appended original
        # and the compacted rotation
        mh_probe = _shift_ids(batch1, 40_000_000)
        fres["minhash_incremental_equal_after_rotate"] = _same_rows(
            dedup.minhash_index_pairs(spark, mh_probe, mrot, threshold=0.5),
            dedup.minhash_index_pairs(spark, mh_probe, mhpath, threshold=0.5),
        )
        _hygiene(spark)

        if factor == INDEX_FACTORS[-1]:
            fres["plan_joins_100x"] = {
                "dedup_exact_incremental": _join_counts(
                    dedup.dedup_exact_incremental(spark, probe, rot)
                ),
                # BHJ here is the DELIBERATE batch-side broadcast
                # (minhash_index_pairs docstring): the huge index banded
                # table never shuffles
                "minhash_index_pairs": _join_counts(
                    dedup.minhash_index_pairs(spark, mh_probe, mrot, threshold=0.5)
                ),
            }
            _hygiene(spark)
        print(f"index @{factor}x: {json.dumps(fres)}", flush=True)
        result["factors"][str(factor)] = fres
        _merge_out(out_json, "index-100x", result)


def index_tier_rows(spark, path: str, tables: tuple) -> list:
    return [r.asDict() for r in dedup.index_tier_stats(spark, path, tables).collect()]


def substr_100x_soak(spark, src: str, out_json: str) -> None:
    """The window + sentence tiers' lifecycle at 1/30/100x — with
    exact + minhash (index-100x) this completes 100x evidence for the
    persisted-tier pattern across all granularities that have a
    compactor. Same protocol: build from the factor corpus, run a
    FIXED 1x batch (query first, then admit + 2 replayed appends),
    stats, threshold-triggered maintain, fresh-probe equality."""
    meter = ShuffleMeter(spark)
    batch1 = _docs(spark, src)

    def timed(fres: dict, key: str, fn):
        m = meter.mark()
        t0 = time.perf_counter()
        out = fn()
        fres[key] = round(time.perf_counter() - t0, 3)
        sh = meter.since(m)
        if sh:
            fres[f"{key}_shuffle"] = sh
        _hygiene(spark)
        return out

    wtmp = tempfile.mkdtemp(prefix="r12wwarm_")
    dedup.build_window_index(batch1, f"{wtmp}/widx", n=8)
    dedup.decontaminate_substrings_incremental(
        spark, batch1, f"{wtmp}/widx", n=8
    ).write.format("noop").mode("overwrite").save()
    dedup.build_sentence_index(batch1, f"{wtmp}/sidx")
    dedup.dedup_sentences_incremental(
        spark, batch1, f"{wtmp}/sidx"
    ).write.format("noop").mode("overwrite").save()
    _hygiene(spark)

    result: dict = {"src": src, "factors": {}}
    for factor in (1, 30, 100):
        corpus = _docs(spark, _scale_dir(src, factor))
        tmp = tempfile.mkdtemp(prefix=f"r12sub_{factor}_")
        fres: dict = {"corpus_docs": corpus.count()}

        wpath = f"{tmp}/widx"
        timed(fres, "window_build",
              lambda: dedup.build_window_index(corpus, wpath, n=8))
        n_dec = timed(
            fres, "window_incremental_query",
            lambda: dedup.decontaminate_substrings_incremental(
                spark, batch1, wpath, n=8
            ).count(),
        )
        fres["window_incremental_rows"] = n_dec
        timed(fres, "window_append_batch",
              lambda: dedup.append_window_index(batch1, wpath, n=8))
        for _ in range(2):  # replayed appends: dup mass for the compactor
            dedup.append_window_index(batch1, wpath, n=8)
        stats = timed(fres, "window_tier_stats",
                      lambda: index_tier_rows(spark, wpath, ("windows",)))
        fres["window_dup_mils"] = stats[0]["dup_mils"]
        wrot = f"{tmp}/widx_rot"
        maint = timed(
            fres, "window_maintain_compact",
            lambda: [
                r.asDict()
                for r in dedup.maintain_index_tier(
                    spark, wpath, wrot, "window", max_dup_mils=10
                ).collect()
            ],
        )
        fres["window_compacted"] = maint[0]["compacted"]
        fres["window_reclaimed_rows"] = sum(r["reclaimed_rows"] for r in maint)
        fres["window_incremental_equal_after_rotate"] = _same_rows(
            dedup.decontaminate_substrings_incremental(
                spark, batch1, wrot, n=8
            ),
            dedup.decontaminate_substrings_incremental(
                spark, batch1, wpath, n=8
            ),
        )
        _hygiene(spark)

        spath = f"{tmp}/sidx"
        timed(fres, "sentence_build",
              lambda: dedup.build_sentence_index(corpus, spath))
        n_sen = timed(
            fres, "sentence_incremental_query",
            lambda: dedup.dedup_sentences_incremental(
                spark, batch1, spath
            ).count(),
        )
        fres["sentence_incremental_rows"] = n_sen
        timed(fres, "sentence_append_batch",
              lambda: dedup.append_sentence_index(batch1, spath))
        for _ in range(2):
            dedup.append_sentence_index(batch1, spath)
        stats = timed(fres, "sentence_tier_stats",
                      lambda: index_tier_rows(spark, spath, ("sentences",)))
        fres["sentence_dup_mils"] = stats[0]["dup_mils"]
        srot = f"{tmp}/sidx_rot"
        maint = timed(
            fres, "sentence_maintain_compact",
            lambda: [
                r.asDict()
                for r in dedup.maintain_index_tier(
                    spark, spath, srot, "sentence", max_dup_mils=10
                ).collect()
            ],
        )
        fres["sentence_compacted"] = maint[0]["compacted"]
        fres["sentence_reclaimed_rows"] = sum(r["reclaimed_rows"] for r in maint)
        fres["sentence_incremental_equal_after_rotate"] = _same_rows(
            dedup.dedup_sentences_incremental(spark, batch1, srot),
            dedup.dedup_sentences_incremental(spark, batch1, spath),
        )
        _hygiene(spark)
        print(f"substr @{factor}x: {json.dumps(fres)}", flush=True)
        result["factors"][str(factor)] = fres
        _merge_out(out_json, "substr-100x", result)


def ann_100x_soak(spark, src: str, out_json: str) -> None:
    """The IVF tier's lifecycle at 1/10/30/100x — the index-100x
    protocol applied to the ANN family, completing 100x evidence for
    EVERY persisted tier (exact/minhash/window/sentence + this):
    build / query-first fixed batch ops / drift read /
    drift-triggered maintain (r12's maintain_ivf_index). The honest
    growth terms: build is one bounded-K assignment pass (~linear in
    N at fixed k); append is O(batch); the k-NN query scans
    nprobe·(N/k)-row buckets, so it grows ~linearly in N/k (recorded,
    not hidden); drift read is one pruned scan; maintain's rebuild
    re-runs the bounded-K recenter + assignment over stored vectors."""
    from hadoop_invertedindexer_spark.operators import similarity

    meter = ShuffleMeter(spark)

    def edir(factor: int) -> str:
        if factor == 1:
            return src
        d = f"/tmp/sfr12e_{factor}"
        if not os.path.isdir(d):
            make_scale_dir(src, d, factor, facts=("embeddings",),
                           copy_dims=False)
        return d

    def emb(d: str):
        return spark.read.parquet(f"{d}/embeddings.parquet")

    batch = emb(src).select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"), "embedding"
    )
    queries = emb(src).where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )

    def timed(fres: dict, key: str, fn):
        m = meter.mark()
        t0 = time.perf_counter()
        out = fn()
        fres[key] = round(time.perf_counter() - t0, 3)
        sh = meter.since(m)
        if sh:
            fres[f"{key}_shuffle"] = sh
        _hygiene(spark)
        return out

    # untimed warmup of the plans
    wtmp = tempfile.mkdtemp(prefix="r12annwarm_")
    cents = similarity.bounded_centroids_refined(
        emb(src), k=64, sample_mult=4, refine_iters=2
    )
    similarity.build_ivf_index(emb(src), cents, f"{wtmp}/ivf")
    similarity.query_ivf_index(
        spark, f"{wtmp}/ivf", queries, k=10, nprobe=4
    ).write.format("noop").mode("overwrite").save()
    similarity.ivf_index_drift(spark, f"{wtmp}/ivf").collect()
    _hygiene(spark)

    result: dict = {"src": src, "k": 64, "factors": {}}
    for factor in INDEX_FACTORS:
        corpus = emb(edir(factor))
        tmp = tempfile.mkdtemp(prefix=f"r12ann_{factor}_")
        path, dest = f"{tmp}/ivf", f"{tmp}/ivf_rot"
        fres: dict = {"corpus_vectors": corpus.count()}
        timed(
            fres, "ivf_build",
            lambda: similarity.build_ivf_index(
                corpus,
                similarity.bounded_centroids_refined(
                    corpus, k=64, sample_mult=4, refine_iters=2
                ),
                path,
            ),
        )
        n_hits = timed(
            fres, "ivf_query_batch",
            lambda: similarity.query_ivf_index(
                spark, path, queries, k=10, nprobe=4
            ).count(),
        )
        fres["ivf_query_rows"] = n_hits
        timed(
            fres, "ivf_append_batch",
            lambda: similarity.append_ivf_index(batch, path),
        )
        drift = timed(
            fres, "ivf_drift_read",
            lambda: similarity.ivf_index_drift(spark, path).head().asDict(),
        )
        fres["ivf_avg_qerr"] = drift["avg_qerr"]
        fres["ivf_imbalance"] = drift["imbalance"]
        maint = timed(
            fres, "ivf_maintain_rebuild",
            lambda: similarity.maintain_ivf_index(
                spark, path, dest, max_avg_qerr_mils=100,
            ).head().asDict(),
        )
        fres["ivf_rebuilt"] = maint["rebuilt"]
        if maint["rebuilt"]:
            fres["ivf_qerr_after_rebuild"] = (
                similarity.ivf_index_drift(spark, dest).head().asDict()[
                    "avg_qerr"
                ]
            )
            _hygiene(spark)
        print(f"ann @{factor}x: {json.dumps(fres)}", flush=True)
        result["factors"][str(factor)] = fres
        _merge_out(out_json, "ann-100x", result)


def graph_100x_soak(spark, src: str, out_json: str) -> None:
    """The iterative-graph family's 100x point (kcore stopped at 30x in
    scale_results_r7_graph.json, triangle + star CC at 30x in
    _r8_graph.json): 100 disjoint shifted copies of the sf0.1
    co-purchase graph — topology truly x100, ~119.6M undirected edges.
    Residual probes run in RAISE mode, so a clean return PROVES the
    fixed schedules (kcore iters=8, star CC rounds=3+extend) still
    cover the peel depth / fixpoint at 100x; disjoint copies also make
    the expected outputs exact multiples of the 1x values (structural
    self-checks, recorded)."""
    from hadoop_invertedindexer_spark.operators.clusters import (
        connected_components_star,
    )
    from hadoop_invertedindexer_spark.operators.graph import (
        kcore_nodes,
        triangle_count,
    )
    from tools.scale_soak_r7 import replicated_edges

    meter = ShuffleMeter(spark)
    result: dict = {"src": src, "factors": {}}
    for factor in (100,):
        e = replicated_edges(spark, src, factor)
        fres: dict = {"edges": e.count()}

        m = meter.mark()
        t0 = time.perf_counter()
        fres["kcore_k80_nodes"] = kcore_nodes(
            e, k=80, iters=8, on_residual="raise"
        ).count()
        fres["kcore_seconds"] = round(time.perf_counter() - t0, 2)
        fres["kcore_residual_probe"] = "clean"  # raise mode returned
        sh = meter.since(m)
        if sh:
            fres["kcore_shuffle"] = sh
        _hygiene(spark)

        m = meter.mark()
        t0 = time.perf_counter()
        row = triangle_count(e, "a", "b").collect()[0]
        fres["triangle_seconds"] = round(time.perf_counter() - t0, 2)
        fres["n_triangles"] = row.n_triangles
        sh = meter.since(m)
        if sh:
            fres["triangle_shuffle"] = sh
        _hygiene(spark)

        m = meter.mark()
        t0 = time.perf_counter()
        lbl = connected_components_star(
            e, src="a", dst="b", on_residual="raise"
        )
        fres["cc_star_components"] = lbl.select("comp").distinct().count()
        fres["cc_star_seconds"] = round(time.perf_counter() - t0, 2)
        fres["cc_star_residual_probe"] = "clean"
        sh = meter.since(m)
        if sh:
            fres["cc_star_shuffle"] = sh
        _hygiene(spark)

        print(f"graph @{factor}x: {json.dumps(fres)}", flush=True)
        result["factors"][str(factor)] = fres
        _merge_out(out_json, "graph-100x", result)


def _winnow(docs):
    return dedup.winnow_overlap_pairs(docs, k=5, w=4, min_shared=2, max_df=MAX_DF)


def _containment(docs, tiers=None):
    return dedup.containment_pairs(
        docs, n=3, threshold=0.8, max_df=MAX_DF, max_df_tiers=tiers
    )


def pairs_100x_soak(spark, src: str, out_json: str) -> None:
    meter = ShuffleMeter(spark)
    base = _docs(spark, src)  # untimed warmup (codegen per plan)
    _winnow(base).write.format("noop").mode("overwrite").save()
    _hygiene(spark)
    _containment(base).write.format("noop").mode("overwrite").save()
    _hygiene(spark)

    result: dict = {
        "src": src, "max_df": MAX_DF, "esc_tiers": list(ESC_TIERS),
        "factors": {}, "escalation_slice": {},
    }
    for factor in PAIR_FACTORS:
        docs = _docs(spark, _scale_dir(src, factor))
        fres: dict = {"docs": docs.count()}
        for name, build, report in (
            ("winnow_overlap_pairs", _winnow,
             lambda d: dedup.winnow_cap_report(d, k=5, w=4, max_df=MAX_DF)),
            ("containment_pairs", _containment,
             lambda d: dedup.shingle_cap_report(d, n=3, max_df=MAX_DF)),
        ):
            m = meter.mark()
            t0 = time.perf_counter()
            n_pairs = build(docs).count()
            fres[name] = round(time.perf_counter() - t0, 3)
            fres[f"{name}_n_pairs"] = n_pairs
            sh = meter.since(m)
            if sh:
                fres[f"{name}_shuffle"] = sh
            _hygiene(spark)
            fres[f"{name}_cap_report"] = report(docs).head().asDict()
            _hygiene(spark)
            print(f"{name} @{factor}x: {json.dumps(fres[f'{name}_cap_report'])}"
                  f" pairs={n_pairs} wall={fres[name]}", flush=True)
        if factor == PAIR_FACTORS[-1]:
            fres["plan_joins_100x"] = {
                "winnow_overlap_pairs": _join_counts(_winnow(docs)),
                "containment_pairs": _join_counts(_containment(docs)),
            }
            _hygiene(spark)
        result["factors"][str(factor)] = fres
        _merge_out(out_json, "pairs-100x", result)

    # escalation slice @30x: plain cap suppressed vs tiered recovery
    sdir = "/tmp/sfr12s_30"
    if not os.path.isdir(sdir):
        make_scale_dir(_slice_dir(src), sdir, 30, facts=("documents",),
                       copy_dims=False)
    sdocs = _docs(spark, sdir)
    eres: dict = {"base_docs": 1000, "factor": 30, "docs": sdocs.count()}
    for key, tiers in (("plain", None), ("tiered", ESC_TIERS)):
        m = meter.mark()
        t0 = time.perf_counter()
        n_pairs = _containment(sdocs, tiers).count()
        eres[f"containment_{key}"] = round(time.perf_counter() - t0, 3)
        eres[f"containment_{key}_n_pairs"] = n_pairs
        sh = meter.since(m)
        if sh:
            eres[f"containment_{key}_shuffle"] = sh
        _hygiene(spark)
        print(f"escalation {key}: pairs={n_pairs}", flush=True)
    for cap in ESC_TIERS:
        eres[f"cap_report_{cap}"] = (
            dedup.shingle_cap_report(sdocs, n=3, max_df=cap).head().asDict()
        )
        _hygiene(spark)
    eres["plan_joins_tiered"] = _join_counts(_containment(sdocs, ESC_TIERS))
    _hygiene(spark)
    result["escalation_slice"] = eres
    _merge_out(out_json, "pairs-100x", result)
    print(json.dumps(result))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "index-100x"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_json = (
        sys.argv[3]
        if len(sys.argv) > 3
        else "/root/repo/scale_results_r12_100x.json"
    )
    spark = get_spark(
        app_name=f"hii-scale-soak-r12-{mode}",
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    if mode == "index-100x":
        index_100x_soak(spark, src, out_json)
    elif mode == "pairs-100x":
        pairs_100x_soak(spark, src, out_json)
    elif mode == "substr-100x":
        substr_100x_soak(spark, src, out_json)
    elif mode == "graph-100x":
        graph_100x_soak(spark, src, out_json)
    elif mode == "ann-100x":
        ann_100x_soak(spark, src, out_json)
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


if __name__ == "__main__":
    main()
