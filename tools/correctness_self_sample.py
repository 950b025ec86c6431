#!/usr/bin/env python3
"""Self-run of the suggested driver correctness rotation (r12, VERDICT
r11 ask #5).

The per-round driver samples 50 contract IDs, and the sample has been
the identical 50 since round 7 — every operator added after r7 passes
the same DuckDB comparison in the suite (tests/test_contract_reference.py
runs ALL oracled entries), but has never had a driver-side CORRECTNESS
row. README.md documents a suggested rotation; this tool produces the
artifact unilaterally: it runs the EXACT comparison the driver runs
(Spark query vs DuckDB oracle at sf0.01 — row count, sorted column
names, canonicalized value multiset) over the suggested 50 plus this
round's new entries, and writes ``CORRECTNESS_SELF_r12.json`` in the
driver's per-query schema::

    {"<query>": {"rows_match": bool, "schema_match": bool,
                 "hash_match": bool, "spark_rows": int,
                 "oracle_rows": int, "err": str | null}, ...}

Usage: ``python tools/correctness_self_sample.py`` (repo root on
PYTHONPATH; ~5-10 min).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "CORRECTNESS_SELF_r12.json")

# The README.md "Suggested driver-sample rotation" table, verbatim —
# a few long-stable anchors plus never-driver-sampled (post-r7) ops.
SUGGESTED_50 = [
    # anchors (r1-r5)
    "format_line", "scan_text", "tpch_q1_pricing_summary",
    "tpch_q9_product_profit", "postings_compressed", "tf_idf",
    # dedup (r5-r11)
    "dedup_exact", "dedup_exact_incremental", "dedup_substrings",
    "decontaminate_substrings_incremental", "dedup_paragraphs_incremental",
    "dedup_sentences", "dedup_sentences_incremental", "dedup_containment",
    "winnow_fingerprints", "winnow_pairs", "dedup_minhash_portable",
    "dedup_urls",
    # contamination / compliance (r8-r10)
    "contamination_report", "contamination_report_sentences_incremental",
    "decontaminate_sentences", "filter_optout",
    # similarity / ANN (r5-r11)
    "similarity_ivf", "similarity_pq", "ann_recall_eval",
    "ann_recall_eval_ivf_read", "ivf_drift_read", "knn_classify",
    # classifier / eval (r8-r11)
    "classifier_train", "classifier_train_bigrams", "classifier_predict",
    "classifier_auc", "classifier_calibration", "classifier_pr_sweep",
    # vocab / tokenizer (r5-r10)
    "bpe_train", "bpe_encode_incremental", "bpe_fertility",
    "vocab_coverage", "tokens_encode",
    # sampling / pipeline (r7-r11)
    "data_card", "data_card_incremental", "mixture_plan",
    "dsir_select_incremental", "pack_tokens", "pack_fill_report",
    "pipeline_capstone",
    # reports / maintenance (r10-r11)
    "dataset_diff", "split_leakage_report", "filter_agreement",
    "index_tier_stats",
]

# This round's additions ride along so the artifact is never a round
# behind the code.
R12_EXTRAS = [
    "maintain_index_tier", "shingle_cap_report", "winnow_cap_report",
    "dedup_containment_escalated", "winnow_pairs_escalated",
    "corpus_filter_classifier", "maintain_ivf_index",
    "minhash_band_report", "maintain_bpe_model", "maintain_dsir_model",
]


def main() -> int:
    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    from hadoop_invertedindexer_spark.caching import release_persisted
    from hadoop_invertedindexer_spark.session import get_spark
    from tests.oracle_harness import canon_rows, duck_connection

    import __spark_entry__ as entry

    spark = get_spark(shuffle_partitions=32)
    con = duck_connection(sf_dir)
    qs, oracles = entry.queries(), entry.oracle_sql()

    sample = SUGGESTED_50 + R12_EXTRAS
    missing = [n for n in sample if n not in qs or n not in oracles]
    if missing:
        print(f"FATAL: sample ids without query/oracle: {missing}")
        return 2

    out: dict[str, dict] = {}
    t_run = time.time()
    for i, name in enumerate(sample, 1):
        rec: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            release_persisted()
            spark.catalog.clearCache()
            odf = con.execute(oracles[name]).df()
            rec["spark_rows"], rec["oracle_rows"] = len(sdf), len(odf)
            rec["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
            rec["rows_match"] = len(sdf) == len(odf)
            rec["hash_match"] = (
                rec["schema_match"] and canon_rows(sdf) == canon_rows(odf)
            )
        except Exception as ex:  # recorded, not raised: the driver's posture
            rec["err"] = f"{type(ex).__name__}: {ex}"[:300]
        out[name] = rec
        ok = rec["err"] is None and rec["hash_match"] and rec["rows_match"]
        print(
            f"[{i:02d}/{len(sample)}] {name}: "
            f"{'PASS' if ok else 'FAIL'} ({time.time() - t0:.1f}s)",
            flush=True,
        )

    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    n_pass = sum(
        1 for r in out.values()
        if r["err"] is None and r["hash_match"] and r["rows_match"]
        and r["schema_match"]
    )
    print(
        f"wrote {OUT}: {n_pass}/{len(out)} pass "
        f"({time.time() - t_run:.0f}s total)"
    )
    spark.stop()
    return 0 if n_pass == len(out) else 1


if __name__ == "__main__":
    raise SystemExit(main())
