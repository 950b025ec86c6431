#!/usr/bin/env python3
"""Driver-protocol oracle check for NAMED queries (r14 optimization
loop): every query an optimization touches re-verifies at sf0.01
against its DuckDB oracle — row count, sorted column names,
canonicalized value multiset — before the change is kept. Same
comparison core as tools/correctness_self_sample_r14.py.

Usage: python tools/check_queries.py winnow_pairs classifier_auc ...
Exit 1 on any failure.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    from hadoop_invertedindexer_spark.caching import release_persisted
    from hadoop_invertedindexer_spark.session import get_spark
    from tests.oracle_harness import canon_rows, duck_connection

    import __spark_entry__ as entry

    spark = get_spark(shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    qs, oracles = entry.queries(), entry.oracle_sql()
    n_fail = 0
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            release_persisted()
            spark.catalog.clearCache()
            if name in oracles:
                odf = con.execute(oracles[name]).df()
                ok = (
                    sorted(sdf.columns) == sorted(odf.columns)
                    and len(sdf) == len(odf)
                    and canon_rows(sdf) == canon_rows(odf)
                )
            else:
                ok = True
                print(f"  (rows-only: {len(sdf)} rows)")
        except Exception as ex:
            ok = False
            print(f"  ERR {type(ex).__name__}: {ex}"[:300])
        n_fail += 0 if ok else 1
        print(
            f"[{i:02d}/{len(names)}] {name}: {'PASS' if ok else 'FAIL'}"
            f" ({time.time() - t0:.1f}s)",
            flush=True,
        )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
