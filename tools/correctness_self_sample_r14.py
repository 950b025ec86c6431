#!/usr/bin/env python3
"""Driver-protocol correctness self-rotation, round 14.

The r13 run closed the cumulative union (every contract ID verified at
least once under the driver's exact protocol). This round adds new IDs
and CHANGES the semantics of three existing entries
(``hybrid_search_rrf`` / ``hybrid_search_rrf_ann`` /
``retrieval_eval_hybrid`` — the exclude_self alignment, ADVICE r13), so
the r14 sample is: every ``queries()`` ID never sampled under the
driver protocol PLUS the changed entries re-run fresh. Same comparison
as the driver (Spark vs DuckDB at sf0.01 — row count, sorted column
names, canonicalized value multiset), written in the driver's
per-query schema to ``CORRECTNESS_SELF_r14.json``.

Usage: ``python tools/correctness_self_sample_r14.py`` (repo root on
PYTHONPATH; a few minutes — the sample is small).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "CORRECTNESS_SELF_r14.json")

# semantics changed this round — re-verify under the driver protocol
# even though earlier rounds sampled them
CHANGED = {
    "hybrid_search_rrf",
    "hybrid_search_rrf_ann",
    "retrieval_eval_hybrid",
    "winnow_pairs",
    "winnow_pairs_escalated",
    "winnow_pairs_bounded",
    "winnow_bounded_report",
    "minhash_pairs_bounded",
}


def already_sampled() -> set[str]:
    seen: set[str] = set()
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(f) as fh:
            seen |= set(json.load(fh).keys())
    for prior in (
        "CORRECTNESS_SELF_r12.json",
        "CORRECTNESS_SELF_r13.json",
        "CORRECTNESS_SELF_r14.json",
    ):
        p = os.path.join(REPO, prior)
        if os.path.exists(p):
            with open(p) as fh:
                seen |= set(json.load(fh).keys())
    return seen


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

    sample = sorted(
        (set(qs) - already_sampled()) | (CHANGED & set(qs))
    )
    print(
        f"{len(qs)} contract queries; sampling {len(sample)} "
        f"(new + changed) under the driver protocol",
        flush=True,
    )

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
        print(
            f"[{i:03d}/{len(sample)}] {name}: "
            f"{'PASS' if ok else 'FAIL'}"
            f"{' (rows-only)' if name not in oracles else ''}"
            f" ({time.time() - t0:.1f}s)",
            flush=True,
        )

    if os.path.exists(OUT):
        with open(OUT) as fh:
            merged = json.load(fh)
        merged.update(out)
        out = merged
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)

    def passed(name: str, r: dict) -> bool:
        if name in oracles:
            return bool(
                r["err"] is None and r["hash_match"] and r["rows_match"]
                and r["schema_match"]
            )
        return r["err"] is None and r["spark_rows"] is not None

    n_pass = sum(1 for n, r in out.items() if passed(n, r))
    print(
        f"wrote {OUT}: {n_pass}/{len(out)} pass "
        f"({time.time() - t_run:.0f}s total); cumulative driver-protocol "
        f"union = {len(already_sampled() | set(out))}/{len(qs)}"
    )
    spark.stop()
    return 0 if n_pass == len(out) else 1


if __name__ == "__main__":
    raise SystemExit(main())
