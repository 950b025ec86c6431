#!/usr/bin/env python3
"""Driver-protocol correctness self-check, round 15 (optimization 2/2).

No query's semantics changed this round by design, so the r15 sample is
every contract ID whose OPERATORS the round's commits touched
(`3e60ae8` — overlapped index sinks, batched maintainer reads, the
outer-generator sweep + NULL guards in dedup/similarity/vocab;
`a3de09d` — the `_doc_shingles` dedup-at-scan change), PLUS the
driver's own 50-query r14 oracle set (the set whose hashes the r15
driver will re-check). Same comparison as the driver (Spark vs DuckDB
at sf0.01 — row count, sorted column names, canonicalized value
multiset), written in the driver's per-query schema to
``CORRECTNESS_SELF_r15.json``.

Usage: ``python tools/correctness_self_sample_r15.py`` (repo root on
PYTHONPATH; ~10-15 minutes).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "CORRECTNESS_SELF_r15.json")

# contract IDs whose operator internals this round's commits touched
TOUCHED = {
    # a3de09d: _doc_shingles dedup-at-scan (jaccard/containment family)
    "ngram_jaccard", "dedup_containment", "dedup_containment_escalated",
    "jaccard_pairs_bounded", "split_leakage_report", "leakage_safe_split",
    "cluster_canonical", "shingle_cap_report",
    "shingle_cap_recall_estimate", "source_overlap",
    # 3e60ae8: maintain lifecycles (overlapped sinks, batched metadata)
    "maintain_ivfpq_index", "maintain_ivfpq_qerr", "maintain_ivf_index",
    "maintain_index_tier", "maintain_bpe_model", "maintain_dsir_model",
    "index_tier_stats",
    # 3e60ae8: incremental dedup paths over the rebuilt index writers
    "dedup_minhash_incremental", "winnow_pairs_incremental",
    "dedup_sentences_incremental", "dedup_exact_incremental",
    "data_card_incremental",
    # 3e60ae8: outer-generator conversions + NULL guards
    "similarity_pq", "similarity_ivfpq",
    "similarity_ivfpq_rerank_refined", "hybrid_search_rrf_ann",
    "ivfpq_qerr", "pack_fill_report", "pipeline_capstone",
    "content_chunks", "dedup_minhash", "minhash_band_report",
    "similarity_lsh", "minhash_pairs_bounded", "semantic_dedup_bounded",
    "decontaminate", "decontaminate_sentences",
    "decontaminate_substrings", "dedup_substrings",
    "duplicate_passages", "contamination_report",
    "contamination_report_sentences", "bpe_fertility", "bpe_merges",
}


def driver_oracle_set() -> set[str]:
    p = os.path.join(REPO, "CORRECTNESS_r14.json")
    with open(p) as fh:
        return set(json.load(fh).keys())


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

    sample = sorted((TOUCHED | driver_oracle_set()) & set(qs))
    print(
        f"{len(qs)} contract queries; sampling {len(sample)} "
        f"(r15-touched + the driver's r14 oracle set) under the driver "
        f"protocol",
        flush=True,
    )

    out: dict[str, dict] = {}
    n_bad = 0
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
            rec["spark_rows"] = len(sdf)
            if name in oracles:
                odf = con.execute(oracles[name]).df()
                rec["oracle_rows"] = len(odf)
                rec["schema_match"] = (
                    sorted(sdf.columns) == sorted(odf.columns)
                )
                rec["rows_match"] = len(sdf) == len(odf)
                rec["hash_match"] = (
                    rec["schema_match"] and canon_rows(sdf) == canon_rows(odf)
                )
        except Exception as ex:  # recorded, not raised: the driver's posture
            rec["err"] = f"{type(ex).__name__}: {ex}"[:300]
        out[name] = rec
        if name in oracles:
            ok = (
                rec["err"] is None and rec["hash_match"]
                and rec["rows_match"]
            )
        else:
            ok = rec["err"] is None and rec["spark_rows"] is not None
        n_bad += 0 if ok else 1
        print(
            f"[{i:03d}/{len(sample)}] {name}: "
            f"{'OK' if ok else 'FAIL'} ({time.time() - t0:.1f}s)",
            flush=True,
        )

    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(
        f"wrote {OUT}: {len(out) - n_bad}/{len(out)} OK "
        f"in {time.time() - t_run:.0f}s",
        flush=True,
    )
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
