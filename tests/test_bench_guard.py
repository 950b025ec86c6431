"""The bench regression guard's pure comparison logic (no Spark: the
actual timing runs live in bench.py --check, which the round driver and
humans invoke out-of-band)."""

from __future__ import annotations

import json
import os

import bench


def test_flags_only_real_regressions():
    base = {"q1": 1.0, "q2": 2.0, "q3": 0.5}
    timings = {"q1": 1.4, "q2": 3.1, "q3": 0.74, "brand_new": 99.0}
    # q1 within 1.5x, q2 over (3.1 > 3.0), q3 under (0.74 < 0.75),
    # brand_new has no baseline -> never flagged
    assert bench.check_regressions(timings, base) == ["q2"]


def test_zero_baseline_never_divides():
    assert bench.check_regressions({"q": 5.0}, {"q": 0.0}) == []


def test_missing_baseline_keys_are_reported():
    base = {"q1": 1.0, "q2": 2.0, "q3": 0.5}
    timings = {"q1": 1.0, "brand_new": 1.0}
    # q2/q3 errored or were dropped from HEADLINE: --check must not let
    # them silently pass while their baseline entries still exist
    assert bench.missing_from_timings(timings, base) == ["q2", "q3"]
    assert bench.missing_from_timings(base, base) == []


def test_committed_baseline_parses_and_covers_headline():
    path = bench.BASELINE_PATH
    assert os.path.exists(path), "bench_baseline.json must be committed"
    with open(path) as fh:
        base = json.load(fh)
    assert set(bench.HEADLINE) <= set(base["queries"]), (
        set(bench.HEADLINE) - set(base["queries"])
    )
    assert all(v > 0 for v in base["queries"].values())
