"""Dump .explain("formatted") for bench queries into plans/<round>/.

Usage:
    python tools/explain_query.py before winnow_pairs classifier_auc
    python tools/explain_query.py after  winnow_pairs
    python tools/explain_query.py --round r15 before winnow_pairs

Writes plans/r14/<query>_<tag>.txt. For maintenance queries whose
construction performs the real work eagerly (build/append/maintain
lifecycles returning a one-row report), the returned frame's plan is
degenerate; those are captured anyway plus noted — their evidence lives
in the plans of the operators they call (captured separately where a
change is claimed).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from hadoop_invertedindexer_spark.caching import release_persisted  # noqa: E402
from hadoop_invertedindexer_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    rnd = "r15"
    if "--round" in args:
        i = args.index("--round")
        rnd = args[i + 1]
        args = args[:i] + args[i + 2:]
    tag = args[0]
    names = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        rnd,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name="hii-explain",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        release_persisted()
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
