"""Round-10 scale soak (VERDICT r9 ask 7): the substring/LLM family
stopped at 10x in scale_results_r8_ops.json — this takes it to 30x
under the replica worst case (parquet replicas make EVERY window a
30-way duplicate: the sweep stage's input is maximal), with the
standard untimed 1x warmup (codegen skew otherwise makes 1x read
higher than 10x) and cache hygiene between runs.

Ops mode (``substring-30x``) — timed 1x/10x/30x of:

* ``dedup_substrings`` / ``decontaminate_substrings`` — the interval
  machinery under maximal duplication; both unbounded-side joins pin
  shuffle_hash, and this soak VERIFIES the pins hold in the 30x plans
  (recorded as shuffle_hash_joins / broadcast_joins counts — Catalyst's
  size estimates are most tempted to broadcast exactly here).
* ``pipeline_capstone`` — the six-stage chain; expect the sum of its
  parts' growth (~linear).
* ``dsir_select`` — capped bucket tables are size-invariant; only the
  gram stream + per-doc groupBy grow. Expect ~linear.
* ``dedup_sentences`` (r10) — the sentence-granularity sweep under the
  same worst case.
* ``classifier_train_bigrams`` (r10) — 4 perceptron rounds over the
  ~2x gram stream; model/delta stay <= n_features. Expect ~linear with
  flat per-round model cost.

Incremental mode (``incremental-30x``) — the O(batch) claims: for each
factor, build the persisted artifact from the factor-replicated corpus
(timed: the one-off cost that scales) then run a FIXED 1x batch against
it (timed: must stay ~flat as the index corpus grows 30x):

* window index: ``build_window_index`` @factor vs
  ``decontaminate_substrings_incremental`` of the fixed batch —
  query cost grows only with the stored-hash scan, never the corpus;
* BPE model: ``build_bpe_model`` @factor (dictionary-space training —
  replicas multiply counts, not vocab, so even the BUILD stays near
  flat) vs ``bpe_encode_incremental`` of the fixed batch (model-sized
  replay: flat by construction — the r10 ask-5 soak row).

Usage:
  python tools/scale_soak_r10.py substring-30x   [src] [out_json]
  python tools/scale_soak_r10.py incremental-30x [src] [out_json]
Writes scale_results_r10_*.json (commit to repo root).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

from hadoop_invertedindexer_spark.caching import release_persisted  # noqa: E402
from hadoop_invertedindexer_spark.session import get_spark  # noqa: E402
from tools.make_scale_dir import make_scale_dir  # noqa: E402

R10_OPS = [
    "dedup_substrings",
    "decontaminate_substrings",
    "pipeline_capstone",
    "dsir_select",
    "dedup_sentences",
    "classifier_train_bigrams",
]

# the ops whose unbounded-side joins pin shuffle_hash — verified in the
# 30x plans, where Catalyst's under-estimates are most broadcast-prone
PIN_CHECKED = ["dedup_substrings", "decontaminate_substrings", "dedup_sentences"]


def _scale_dir(src: str, factor: int) -> str:
    if factor == 1:
        return src
    d = f"/tmp/sfr10_{factor}"
    if not os.path.isdir(d):
        make_scale_dir(src, d, factor, facts=("documents", "embeddings"))
    return d


def _hygiene(spark) -> None:
    release_persisted()
    spark.catalog.clearCache()


def substring_30x_soak(spark, src: str, out_json: str) -> None:
    qs = entrymod.queries()
    for name in R10_OPS:  # untimed 1x warmup: compile codegen per plan
        qs[name](spark, src).write.format("noop").mode("overwrite").save()
        _hygiene(spark)
    result: dict = {"src": src, "mode": "substring-30x", "factors": {}}
    for factor in (1, 10, 30):
        d = _scale_dir(src, factor)
        fres: dict = {}
        for name in R10_OPS:
            t0 = time.perf_counter()
            qs[name](spark, d).write.format("noop").mode("overwrite").save()
            fres[name] = round(time.perf_counter() - t0, 3)
            _hygiene(spark)
            print(f"{name} @{factor}x: {fres[name]}s", flush=True)
        if factor == 30:
            pins: dict = {}
            for name in PIN_CHECKED:
                plan = (
                    qs[name](spark, d)
                    ._jdf.queryExecution()
                    .executedPlan()
                    .toString()
                )
                pins[name] = {
                    "shuffle_hash_joins": plan.count("ShuffledHashJoin"),
                    "broadcast_joins": plan.count("BroadcastHashJoin"),
                }
                _hygiene(spark)
            fres["plan_pins_30x"] = pins
        result["factors"][str(factor)] = fres
        with open(out_json, "w") as fh:
            json.dump(result, fh, indent=1)
    print(json.dumps(result))


def incremental_30x_soak(spark, src: str, out_json: str) -> None:
    from hadoop_invertedindexer_spark.operators import dedup, vocab

    docs_at = {
        f: spark.read.parquet(f"{_scale_dir(src, f)}/documents.parquet")
        for f in (1, 10, 30)
    }
    batch = docs_at[1]  # the FIXED ingest batch every factor queries with
    # untimed warmup of both query plans
    wtmp = tempfile.mkdtemp(prefix="r10warm_")
    dedup.build_window_index(batch, f"{wtmp}/widx", n=8)
    dedup.decontaminate_substrings_incremental(
        spark, batch, f"{wtmp}/widx", n=8
    ).write.format("noop").mode("overwrite").save()
    vocab.build_bpe_model(batch, f"{wtmp}/bpem", num_merges=10)
    vocab.bpe_encode_incremental(spark, batch, f"{wtmp}/bpem").write.format(
        "noop"
    ).mode("overwrite").save()
    _hygiene(spark)

    result: dict = {"src": src, "mode": "incremental-30x", "factors": {}}
    for factor in (1, 10, 30):
        corpus = docs_at[factor]
        tmp = tempfile.mkdtemp(prefix=f"r10inc_{factor}_")
        fres: dict = {"corpus_docs": corpus.count()}
        t0 = time.perf_counter()
        dedup.build_window_index(corpus, f"{tmp}/widx", n=8)
        fres["window_index_build"] = round(time.perf_counter() - t0, 3)
        _hygiene(spark)
        t0 = time.perf_counter()
        dedup.decontaminate_substrings_incremental(
            spark, batch, f"{tmp}/widx", n=8
        ).write.format("noop").mode("overwrite").save()
        fres["decontaminate_batch"] = round(time.perf_counter() - t0, 3)
        _hygiene(spark)
        t0 = time.perf_counter()
        vocab.build_bpe_model(corpus, f"{tmp}/bpem", num_merges=10)
        fres["bpe_model_build"] = round(time.perf_counter() - t0, 3)
        _hygiene(spark)
        t0 = time.perf_counter()
        vocab.bpe_encode_incremental(
            spark, batch, f"{tmp}/bpem"
        ).write.format("noop").mode("overwrite").save()
        fres["bpe_encode_batch"] = round(time.perf_counter() - t0, 3)
        _hygiene(spark)
        print(f"incremental @{factor}x: {fres}", flush=True)
        result["factors"][str(factor)] = fres
        with open(out_json, "w") as fh:
            json.dump(result, fh, indent=1)
    print(json.dumps(result))


def exact_30x_soak(spark, src: str, out_json: str) -> None:
    """The exact-family O(batch) claims (r10 session 2): for each
    factor, build the document-hash index from the factor-replicated
    corpus (timed: the one-off cost — one distinct over 32-byte keys,
    expect ~linear), then run a FIXED 1x batch through
    ``dedup_exact_incremental`` and ``data_card_incremental`` (timed:
    must stay ~flat — per-batch cost is O(batch + one index-hash scan),
    and replicas collapse to the SAME distinct hash set, so even the
    scan term is constant under the replica construction; the honest
    growth story is the index build)."""
    from hadoop_invertedindexer_spark.operators import dedup, sampling
    from hadoop_invertedindexer_spark.plans.contract_llm import STOPWORDS

    docs_at = {
        f: spark.read.parquet(f"{_scale_dir(src, f)}/documents.parquet")
        for f in (1, 10, 30)
    }
    batch = docs_at[1]
    # untimed warmup of both query plans
    wtmp = tempfile.mkdtemp(prefix="r10xwarm_")
    dedup.build_exact_index(batch, f"{wtmp}/exidx")
    dedup.dedup_exact_incremental(
        spark, batch, f"{wtmp}/exidx"
    ).write.format("noop").mode("overwrite").save()
    sampling.data_card_incremental(
        spark, batch, f"{wtmp}/exidx", STOPWORDS
    ).write.format("noop").mode("overwrite").save()
    _hygiene(spark)

    result: dict = {"src": src, "mode": "exact-30x", "factors": {}}
    for factor in (1, 10, 30):
        corpus = docs_at[factor]
        tmp = tempfile.mkdtemp(prefix=f"r10x_{factor}_")
        fres: dict = {"corpus_docs": corpus.count()}
        t0 = time.perf_counter()
        dedup.build_exact_index(corpus, f"{tmp}/exidx")
        fres["exact_index_build"] = round(time.perf_counter() - t0, 3)
        _hygiene(spark)
        t0 = time.perf_counter()
        dedup.dedup_exact_incremental(
            spark, batch, f"{tmp}/exidx"
        ).write.format("noop").mode("overwrite").save()
        fres["dedup_exact_batch"] = round(time.perf_counter() - t0, 3)
        _hygiene(spark)
        t0 = time.perf_counter()
        sampling.data_card_incremental(
            spark, batch, f"{tmp}/exidx", STOPWORDS
        ).write.format("noop").mode("overwrite").save()
        fres["data_card_batch"] = round(time.perf_counter() - t0, 3)
        _hygiene(spark)
        print(f"exact @{factor}x: {fres}", flush=True)
        result["factors"][str(factor)] = fres
        with open(out_json, "w") as fh:
            json.dump(result, fh, indent=1)
    print(json.dumps(result))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "substring-30x"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    default_out = {
        "substring-30x": "/root/repo/scale_results_r10_substring.json",
        "incremental-30x": "/root/repo/scale_results_r10_incremental.json",
        "exact-30x": "/root/repo/scale_results_r10_exact.json",
    }[mode]
    out_json = sys.argv[3] if len(sys.argv) > 3 else default_out
    spark = get_spark(
        app_name=f"hii-scale-soak-r10-{mode}",
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    if mode == "substring-30x":
        substring_30x_soak(spark, src, out_json)
    elif mode == "exact-30x":
        exact_30x_soak(spark, src, out_json)
    else:
        incremental_30x_soak(spark, src, out_json)
    spark.stop()


if __name__ == "__main__":
    main()
