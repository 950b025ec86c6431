"""Median-of-3 timings for a subset of bench queries — bench.py's exact
methodology (construction inside the timer, noop sink, cache hygiene
between samples) restricted to the named queries, for the r14
optimization loop's before/after evidence without paying the full
128-query run per iteration.

Usage: python tools/bench_some.py winnow_pairs classifier_auc
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from hadoop_invertedindexer_spark.caching import release_persisted  # noqa: E402
from hadoop_invertedindexer_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    repeats = 3
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    names = [a for a in args if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="hii-bench-some",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    spark.range(1000).selectExpr("sum(id)").collect()
    out = {}
    for name in names:
        samples = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 4))
            release_persisted()
            spark.catalog.clearCache()
        out[name] = {
            "median": round(statistics.median(samples), 3),
            "samples": samples,
        }
        print(f"{name}: {out[name]['median']:.3f}s  {samples}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
