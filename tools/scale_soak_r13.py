"""Round-13 scale soak — the three 100x evidence gaps VERDICT r12 left:

``ann-100x-shifted`` (ask 5) — re-run the IVF maintenance ladder with a
DRIFTED append instead of iid replicas: the appended mass is a TIGHT
off-distribution cloud (0.1·v + 2.0 per dim — near-constant direction,
which zero-mean base centroids cannot represent), factor-sized like the
corpus. The r12 ladder's `rebuilt=true` was trivial (iid noise keeps
qerr at its floor by construction — SCALE.md:611-617); here the claim
is the real one: the trigger does NOT fire on the healthy pre-append
index at the same threshold, DOES fire after the drifted append, and
the rebuild demonstrably LOWERS both drift metrics (avg_qerr AND
imbalance, post < pre, recorded at every factor incl. 30x and 100x).
Measured signature at 1x: the tight cloud collapses into ONE frozen
bucket — imbalance 1.5 -> 32.5 — while avg_qerr rises only moderately
(0.67 -> 0.71; the cloud sits ~0.26 cos from its least-bad base
centroid, not orthogonal), so the fleet threshold is set on IMBALANCE
(measured healthy value + 1000 mils — derived from history, recorded
in the artifact) and qerr recovery is the quality claim.

``winnow-bounded-100x`` (ask 2) — the declarative per-doc top-k bound
on the winnow pair stream at 1/30/100x: the r12 soak measured the full
stream's 22.3M true pairs / 344.7s wall as irreducible OUTPUT volume;
this row records what the bound buys (emitted pairs ≤ per_doc_k·docs)
and what it costs (winnow_bounded_report's truncated_mils — no silent
caps), plus executed-plan join counts at the top factor (the bound must
not introduce a broadcast of corpus data) and the WindowGroupLimit
rewrite (partial per-partition limits BEFORE the rank exchange — hub
docs never materialize their full neighbor list on one task).

``cap-estimate-100x`` (ask 4) — shingle_cap_recall_estimate at
1/30/100x: the r12 cap report said 980 mils of posting mass dropped at
100x but not how many PAIRS that costs; this row records the
deterministic md5-sampled estimate (sample_inv=100 at scale, per-key
expansion bounded by expand_max_df=2000, mega keys priced closed-form)
— the estimated-missed-pairs number a schedule compares against its
recall budget, priced in advance.

Usage:
  python tools/scale_soak_r13.py ann-100x-shifted    [src] [out_json]
  python tools/scale_soak_r13.py winnow-bounded-100x [src] [out_json]
  python tools/scale_soak_r13.py cap-estimate-100x   [src] [out_json]
  python tools/scale_soak_r13.py ann-ivfpq-100x      [src] [out_json]
Writes/merges scale_results_r13_100x.json (commit to repo root).

``ann-ivfpq-100x`` (r13 session 2) — the IVF-PQ tier's lifecycle at
1/10/30/100x: build wall, on-disk codes-vs-raw byte ratio (the
compression claim measured post-parquet, not quoted from 256/12),
O(batch) appends at the stored contract (per-vector µs flat across
factors), DPP-pruned probed queries with sub-linear wall, and
recall@10 vs exact truth recorded per factor.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hadoop_invertedindexer_spark.operators import dedup  # noqa: E402
from hadoop_invertedindexer_spark.session import get_spark  # noqa: E402
from tools.make_scale_dir import make_scale_dir  # noqa: E402
from tools.scale_soak_r12 import (  # noqa: E402
    ShuffleMeter,
    _docs,
    _hygiene,
    _join_counts,
    _merge_out,
    _scale_dir,
)

INDEX_FACTORS = (1, 10, 30, 100)
PAIR_FACTORS = (1, 30, 100)
PER_DOC_K = 10
MAX_DF = 100


def _timed(meter, fres: dict, key: str, fn, spark):
    m = meter.mark()
    t0 = time.perf_counter()
    out = fn()
    fres[key] = round(time.perf_counter() - t0, 3)
    sh = meter.since(m)
    if sh:
        fres[f"{key}_shuffle"] = sh
    _hygiene(spark)
    return out


# ------------------------------------------------------- ann-100x-shifted


def ann_100x_shifted(spark, src: str, out_json: str) -> None:
    from hadoop_invertedindexer_spark.operators import similarity

    meter = ShuffleMeter(spark)

    def edir(factor: int) -> str:
        if factor == 1:
            return src
        d = f"/tmp/sfr13e_{factor}"
        if not os.path.isdir(d):
            make_scale_dir(src, d, factor, facts=("embeddings",),
                           copy_dims=False)
        return d

    def emb(d: str):
        return spark.read.parquet(f"{d}/embeddings.parquet")

    def drifted(corpus):
        # a TIGHT cloud in the all-ones direction: zero-mean base
        # centroids are nearly orthogonal to it (qerr -> ~1) while one
        # rebuilt centroid inside it represents it almost exactly
        # (within-cloud cosine ~ 1) — drift a rebuild can actually fix
        return corpus.select(
            (F.col("vec_id") + F.lit(100_000_000)).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x * F.lit(0.1) + F.lit(2.0)
            ).cast("array<float>").alias("embedding"),
        )

    # untimed plan warmup
    wtmp = tempfile.mkdtemp(prefix="r13annwarm_")
    w = emb(src)
    similarity.build_ivf_index(
        w,
        similarity.bounded_centroids_refined(
            w, k=64, sample_mult=4, refine_iters=2
        ),
        f"{wtmp}/ivf",
    )
    similarity.ivf_index_drift(spark, f"{wtmp}/ivf").collect()
    _hygiene(spark)

    result: dict = {"src": src, "k": 64, "factors": {}}
    for factor in INDEX_FACTORS:
        corpus = emb(edir(factor))
        tmp = tempfile.mkdtemp(prefix=f"r13ann_{factor}_")
        path, dest = f"{tmp}/ivf", f"{tmp}/ivf_rot"
        fres: dict = {"corpus_vectors": corpus.count()}
        _timed(
            meter, fres, "ivf_build",
            lambda: similarity.build_ivf_index(
                corpus,
                similarity.bounded_centroids_refined(
                    corpus, k=64, sample_mult=4, refine_iters=2
                ),
                path,
            ),
            spark,
        )
        healthy = similarity.ivf_index_drift(spark, path).head()
        fres["qerr_healthy"] = healthy.avg_qerr
        fres["imbalance_healthy"] = healthy.imbalance
        # The measured drift signature of a tight off-distribution
        # cloud under cosine IVF is BUCKET COLLAPSE — the whole cloud
        # lands in one frozen bucket (imbalance 1.5 -> 32.5 at 1x)
        # while avg_qerr rises only moderately (the cloud is ~0.26 cos
        # from its least-bad base centroid, not orthogonal). So the
        # fleet threshold is set on imbalance: measured healthy value
        # + 1000 mils; qerr is recorded as the RECOVERY metric.
        thresh = int(healthy.imbalance * 1000) + 1000
        fres["max_imbalance_mils"] = thresh
        # branch 1: the healthy index must NOT trigger at this threshold
        pre = similarity.maintain_ivf_index(
            spark, path, dest, max_avg_qerr_mils=10**9,
            max_imbalance_mils=thresh,
        ).head()
        fres["healthy_rebuilt"] = pre.rebuilt
        assert pre.rebuilt is False, "healthy index must not trigger"
        # the drifted append: factor-sized (ingest grows with corpus)
        _timed(
            meter, fres, "ivf_append_drifted",
            lambda: similarity.append_ivf_index(drifted(corpus), path),
            spark,
        )
        # branch 2: the drifted index triggers; the rebuild must LOWER
        # both metrics — qerr (centroids now inside the cloud) and
        # imbalance (the cloud splits across many rebuilt buckets)
        maint = _timed(
            meter, fres, "ivf_maintain_rebuild",
            lambda: similarity.maintain_ivf_index(
                spark, path, dest, max_avg_qerr_mils=10**9,
                max_imbalance_mils=thresh,
            ).head().asDict(),
            spark,
        )
        fres["qerr_pre_rebuild"] = maint["avg_qerr"]
        fres["imbalance_pre_rebuild"] = maint["imbalance"]
        fres["drifted_rebuilt"] = maint["rebuilt"]
        assert maint["rebuilt"] is True, "drifted index must trigger"
        post = similarity.ivf_index_drift(spark, dest).head()
        fres["qerr_post_rebuild"] = post.avg_qerr
        fres["imbalance_post_rebuild"] = post.imbalance
        fres["qerr_recovered"] = post.avg_qerr < maint["avg_qerr"]
        fres["imbalance_recovered"] = post.imbalance < maint["imbalance"]
        assert fres["qerr_recovered"], "rebuild must lower avg_qerr"
        assert fres["imbalance_recovered"], "rebuild must lower imbalance"
        print(f"ann-shifted @{factor}x: "
              f"{__import__('json').dumps(fres)}", flush=True)
        result["factors"][str(factor)] = fres
        _merge_out(out_json, "ann-100x-shifted", result)


# ---------------------------------------------------- winnow-bounded-100x


def winnow_bounded_100x(spark, src: str, out_json: str) -> None:
    meter = ShuffleMeter(spark)
    base = _docs(spark, src)  # untimed plan warmup
    dedup.winnow_pairs_bounded(
        base, k=5, w=4, min_shared=2, max_df=MAX_DF, per_doc_k=PER_DOC_K
    ).write.format("noop").mode("overwrite").save()
    _hygiene(spark)

    result: dict = {
        "src": src, "max_df": MAX_DF, "per_doc_k": PER_DOC_K, "factors": {},
    }
    for factor in PAIR_FACTORS:
        docs = _docs(spark, _scale_dir(src, factor))
        fres: dict = {"docs": docs.count()}
        bounded = lambda: dedup.winnow_pairs_bounded(  # noqa: E731
            docs, k=5, w=4, min_shared=2, max_df=MAX_DF,
            per_doc_k=PER_DOC_K,
        )
        n = _timed(
            meter, fres, "winnow_pairs_bounded",
            lambda: bounded().count(), spark,
        )
        fres["bounded_pairs"] = n
        rep = _timed(
            meter, fres, "winnow_bounded_report",
            lambda: dedup.winnow_bounded_report(
                docs, k=5, w=4, min_shared=2, max_df=MAX_DF,
                per_doc_k=PER_DOC_K,
            ).head().asDict(),
            spark,
        )
        fres["report"] = rep
        if factor == PAIR_FACTORS[-1]:
            plan_df = bounded()
            fres["plan_joins_100x"] = _join_counts(plan_df)
            plan = (
                plan_df._jdf.queryExecution().executedPlan().toString()
            )
            fres["window_group_limit_in_plan"] = "WindowGroupLimit" in plan
        print(f"winnow-bounded @{factor}x: "
              f"{__import__('json').dumps(fres)}", flush=True)
        result["factors"][str(factor)] = fres
        _merge_out(out_json, "winnow-bounded-100x", result)


# --------------------------------------------------------- ann-ivfpq-100x


def _dir_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def ann_ivfpq_100x(spark, src: str, out_json: str) -> None:
    """The IVF-PQ tier's lifecycle ladder (r13): build / storage /
    append / probed query / recall at 1/10/30/100x. The claims a 100 TB
    schedule needs before adopting the compressed tier:

    - the codes tier is a small fraction of the raw embedding bytes
      (the 32x raw-float argument, measured post-parquet-compression —
      parquet already compresses floats, so the honest number is the
      on-disk ratio, not 256/12);
    - appends are O(batch) at the stored contract (per-vector cost flat
      across factors);
    - the probed query scans only nprobe/C of the codes (DPP in the
      executed plan at every factor) and its wall grows sub-linearly
      vs the corpus;
    - recall vs exact truth is recorded per factor (the quality point
      of the nprobe=8/m=8 configuration — observed, not asserted: the
      replica ladder keeps the base geometry, so the number should
      hold roughly flat while N grows 100x)."""
    from hadoop_invertedindexer_spark.operators import similarity

    meter = ShuffleMeter(spark)

    def edir(factor: int) -> str:
        if factor == 1:
            return src
        d = f"/tmp/sfr13e_{factor}"
        if not os.path.isdir(d):
            make_scale_dir(src, d, factor, facts=("embeddings",),
                           copy_dims=False)
        return d

    def emb(d: str):
        return spark.read.parquet(f"{d}/embeddings.parquet")

    def queries(corpus):
        return corpus.where(
            (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 3200)
        ).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))

    # untimed plan warmup
    wtmp = tempfile.mkdtemp(prefix="r13pqwarm_")
    w = emb(src)
    similarity.build_ivfpq_index(
        w,
        similarity.bounded_centroids_refined(
            w, k=64, sample_mult=4, refine_iters=2
        ),
        similarity.pq_codebooks(w, m=8, ksub=16),
        f"{wtmp}/ivfpq",
        m=8,
    )
    similarity.query_ivfpq_index(
        spark, f"{wtmp}/ivfpq", queries(w), k=10, nprobe=8
    ).write.format("noop").mode("overwrite").save()
    _hygiene(spark)

    result: dict = {
        "src": src, "k_centroids": 64, "m": 8, "ksub": 16, "nprobe": 8,
        "factors": {},
    }
    for factor in INDEX_FACTORS:
        d = edir(factor)
        corpus = emb(d)
        tmp = tempfile.mkdtemp(prefix=f"r13pq_{factor}_")
        path = f"{tmp}/ivfpq"
        fres: dict = {"corpus_vectors": corpus.count()}
        _timed(
            meter, fres, "ivfpq_build",
            lambda: similarity.build_ivfpq_index(
                corpus,
                similarity.bounded_centroids_refined(
                    corpus, k=64, sample_mult=4, refine_iters=2
                ),
                similarity.pq_codebooks(corpus, m=8, ksub=16),
                path,
                m=8,
            ),
            spark,
        )
        fres["codes_bytes"] = _dir_bytes(f"{path}/codes")
        fres["raw_embedding_bytes"] = _dir_bytes(f"{d}/embeddings.parquet")
        fres["codes_frac_mils"] = (
            fres["codes_bytes"] * 1000 // fres["raw_embedding_bytes"]
        )
        # O(batch) ingest: a 10%-of-corpus batch with disjoint ids,
        # encoded at the STORED centroids/codebooks
        batch = corpus.where(F.col("vec_id") % 10 == 3).select(
            (F.col("vec_id") + F.lit(900_000_000)).alias("vec_id"),
            "embedding",
        )
        fres["batch_vectors"] = batch.count()
        _timed(
            meter, fres, "ivfpq_append",
            lambda: similarity.append_ivfpq_index(batch, path),
            spark,
        )
        fres["append_us_per_vector"] = round(
            fres["ivfpq_append"] * 1e6 / max(fres["batch_vectors"], 1), 1
        )
        q = queries(corpus)
        fres["n_queries"] = q.count()
        qdf = similarity.query_ivfpq_index(spark, path, q, k=10, nprobe=8)
        _timed(
            meter, fres, "ivfpq_query",
            lambda: qdf.write.format("noop").mode("overwrite").save(),
            spark,
        )
        plan = qdf._jdf.queryExecution().executedPlan().toString()
        fres["dpp_in_plan"] = "dynamicpruning" in plan.lower()
        fres["plan_joins"] = _join_counts(qdf)
        assert fres["dpp_in_plan"], "probed codes scan must prune"
        # recall vs exact truth over the PRE-APPEND corpus (truth and
        # candidates must rank the same id universe; the appended
        # replica ids would tie-break nondeterministically against
        # their base twins in the truth ranking)
        truth = similarity.cosine_topk_bruteforce(corpus, q, k=10)
        assigned = similarity.ivf_assign(
            corpus,
            spark.read.parquet(f"{path}/centroids"),
        )
        cand = similarity.ivfpq_adc_topk(
            similarity.ivfpq_encode(
                assigned, spark.read.parquet(f"{path}/codebooks"), m=8
            ),
            spark.read.parquet(f"{path}/codebooks"),
            spark.read.parquet(f"{path}/centroids"),
            q, k=10, nprobe=8, m=8,
        )
        rec = _timed(
            meter, fres, "recall_eval",
            lambda: similarity.ann_recall(truth, cand)
            .agg(F.avg("recall_mils").alias("r"))
            .head(),
            spark,
        )
        fres["recall_mils_avg"] = int(rec.r)
        # maintenance loop at this factor: threshold = measured healthy
        # imbalance + 1000 mils (fleet-style, derived from history);
        # the healthy index must NOT trigger, a tight off-distribution
        # cloud ingest (5% of corpus) MUST (it collapses into ~one
        # frozen bucket), and the corpus-rebuilt rotation must spread
        # the cloud mass back down (centroids land inside the cloud)
        healthy = similarity.ivfpq_index_drift(spark, path).head()
        fres["imbalance_healthy"] = healthy.imbalance
        thresh = int(healthy.imbalance * 1000) + 1000
        fres["max_imbalance_mils"] = thresh
        full = corpus.select("vec_id", "embedding").unionByName(
            batch.select("vec_id", "embedding")
        )
        pre = similarity.maintain_ivfpq_index(
            spark, path, f"{tmp}/ivfpq_rot", full,
            max_imbalance_mils=thresh,
        ).head()
        fres["healthy_rebuilt"] = pre.rebuilt
        assert pre.rebuilt is False, "healthy index must not trigger"
        # drifted ingest: a TIGHT off-distribution cloud (the
        # ann-100x-shifted construction — distinct vectors, so a
        # corpus-rebuild can dedicate centroids inside it and split
        # the collapsed bucket), sized 5% of the corpus
        slab = corpus.where(F.col("vec_id") % 20 == 7).select(
            (F.col("vec_id") + F.lit(950_000_000)).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x * F.lit(0.1) + F.lit(2.0)
            ).cast("array<float>").alias("embedding"),
        )
        similarity.append_ivfpq_index(slab, path)
        maint = _timed(
            meter, fres, "ivfpq_maintain_rebuild",
            lambda: similarity.maintain_ivfpq_index(
                spark, path, f"{tmp}/ivfpq_rot",
                full.unionByName(slab.select("vec_id", "embedding")),
                max_imbalance_mils=thresh,
            ).head().asDict(),
            spark,
        )
        fres["imbalance_pre_rebuild"] = maint["imbalance"]
        fres["drifted_rebuilt"] = maint["rebuilt"]
        assert maint["rebuilt"] is True, "hub-slab index must trigger"
        post = similarity.ivfpq_index_drift(
            spark, f"{tmp}/ivfpq_rot"
        ).head()
        fres["imbalance_post_rebuild"] = post.imbalance
        fres["imbalance_recovered"] = post.imbalance < maint["imbalance"]
        assert fres["imbalance_recovered"], "rebuild must lower imbalance"
        print(f"ann-ivfpq @{factor}x: "
              f"{__import__('json').dumps(fres)}", flush=True)
        result["factors"][str(factor)] = fres
        _merge_out(out_json, "ann-ivfpq-100x", result)


# ------------------------------------------------------- cap-estimate-100x


def cap_estimate_100x(spark, src: str, out_json: str) -> None:
    meter = ShuffleMeter(spark)
    base = _docs(spark, src)  # untimed plan warmup
    dedup.shingle_cap_recall_estimate(
        base, n=3, max_df=MAX_DF, sample_inv=100, expand_max_df=2000
    ).collect()
    _hygiene(spark)

    result: dict = {
        "src": src, "max_df": MAX_DF, "sample_inv": 100,
        "expand_max_df": 2000, "factors": {},
    }
    for factor in PAIR_FACTORS:
        docs = _docs(spark, _scale_dir(src, factor))
        fres: dict = {"docs": docs.count()}
        est = _timed(
            meter, fres, "shingle_cap_recall_estimate",
            lambda: dedup.shingle_cap_recall_estimate(
                docs, n=3, max_df=MAX_DF, sample_inv=100,
                expand_max_df=2000,
            ).head().asDict(),
            spark,
        )
        fres["estimate"] = est
        print(f"cap-estimate @{factor}x: "
              f"{__import__('json').dumps(fres)}", flush=True)
        result["factors"][str(factor)] = fres
        _merge_out(out_json, "cap-estimate-100x", result)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "ann-100x-shifted"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_json = (
        sys.argv[3]
        if len(sys.argv) > 3
        else "/root/repo/scale_results_r13_100x.json"
    )
    spark = get_spark(
        app_name=f"hii-scale-soak-r13-{mode}",
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    if mode == "ann-100x-shifted":
        ann_100x_shifted(spark, src, out_json)
    elif mode == "winnow-bounded-100x":
        winnow_bounded_100x(spark, src, out_json)
    elif mode == "cap-estimate-100x":
        cap_estimate_100x(spark, src, out_json)
    elif mode == "ann-ivfpq-100x":
        ann_ivfpq_100x(spark, src, out_json)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
