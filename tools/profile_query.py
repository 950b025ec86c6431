"""Per-query job/stage profile for the bench queries (r14 optimization).

Runs one or more HEADLINE queries exactly as bench.py does (construction
inside the timer, noop sink) but with a Py4J SparkListener attached, and
prints a per-job breakdown: description, duration, stages, tasks — so a
5 s query's wall clock can be attributed to actual jobs vs driver-side
gaps (planning, py4j round trips, parquet metadata).

Usage:
    python tools/profile_query.py winnow_pairs classifier_auc
    python tools/profile_query.py --repeats 2 maintain_ivfpq_index
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from hadoop_invertedindexer_spark.caching import release_persisted  # noqa: E402
from hadoop_invertedindexer_spark.session import get_spark  # noqa: E402


def rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
        return json.load(r)


def main() -> None:
    argv = sys.argv[1:]
    repeats = 1
    if "--repeats" in argv:
        i = argv.index("--repeats")
        repeats = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if not a.startswith("--")]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="hii-profile",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    spark.range(1000).selectExpr("sum(id)").collect()

    for name in args:
        for rep in range(repeats):
            jobs_before = {j["jobId"] for j in rest(spark, "jobs")}
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            jobs = [j for j in rest(spark, "jobs") if j["jobId"] not in jobs_before]
            jobs.sort(key=lambda j: j["jobId"])
            tot_job = 0.0
            n_stages = 0
            n_tasks = 0
            print(f"\n=== {name} rep{rep}: wall {wall:.3f}s, {len(jobs)} jobs ===")
            for j in jobs:
                st = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                ct = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")

                # sub-second precision from the GMT fraction; parse
                # defensively — a timestamp with no fractional part made
                # the fixed [19:23] slice yield 'GMT' and crash the
                # profiler mid-run (r14 ADVICE)
                def _frac(ts: str) -> float:
                    mm = re.search(r"\.(\d+)", ts)
                    return float("0." + mm.group(1)) if mm else 0.0

                sfrac = _frac(j["submissionTime"])
                cfrac = _frac(j["completionTime"])
                dur = (time.mktime(ct) + cfrac) - (time.mktime(st) + sfrac)
                tot_job += dur
                n_stages += len(j["stageIds"])
                n_tasks += j["numTasks"]
                desc = (j.get("description") or j["name"])[:100]
                print(
                    f"  job {j['jobId']:>4} {dur:7.3f}s stages={len(j['stageIds']):>2} "
                    f"tasks={j['numTasks']:>4}  {desc}"
                )
            print(
                f"  --- jobs total {tot_job:.3f}s, driver gap "
                f"{wall - tot_job:.3f}s, stages {n_stages}, tasks {n_tasks}"
            )
            release_persisted()
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
