"""The bench regression guard's pure comparison logic (no Spark: the
actual timing runs live in bench.py --check, which the round driver and
humans invoke out-of-band)."""

from __future__ import annotations

import json
import os

import bench


def test_flags_only_real_regressions():
    base = {"q1": 1.0, "q2": 2.0, "q3": 0.5}
    timings = {"q1": 1.4, "q2": 3.6, "q3": 0.74, "brand_new": 99.0}
    # q1 within 1.5x+slack, q2 over (3.6 > 3.0 + 0.5), q3 under,
    # brand_new has no baseline -> never flagged
    assert bench.check_regressions(timings, base) == ["q2"]


def test_abs_slack_absorbs_subsecond_jitter():
    # 0.41s -> 0.65s is 1.6x but only +0.24s: noise, not a regression.
    # The same +0.24s on top of a clear ratio breach still flags.
    base = {"tiny": 0.41, "big": 4.0}
    assert bench.check_regressions({"tiny": 0.65}, base) == []
    assert bench.check_regressions({"big": 6.6}, base) == ["big"]
    # slack is additive, not a floor: a tiny query can still flag
    assert bench.check_regressions({"tiny": 1.2}, base) == ["tiny"]


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
