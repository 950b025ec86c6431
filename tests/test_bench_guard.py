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


def test_stdout_line_stays_under_driver_tail_window():
    # The driver tail-captures ~2000 chars of stdout; the 76-query dict
    # inlined in the headline line made BENCH_r08/r09.json parsed:null.
    # The payload must stay compact REGARDLESS of how many queries run.
    timings = {f"query_with_a_long_name_{i:03d}": 123.456 for i in range(500)}
    payload = bench.build_stdout_payload(9999.999, "0.1", timings)
    line = json.dumps(payload)
    assert len(line) < bench.STDOUT_LINE_BUDGET, len(line)
    # the driver-required keys are present and the full dict is NOT
    assert payload["metric"] == "headline_queries_total"
    assert payload["unit"] == "sec"
    assert payload["n_queries"] == 500
    assert payload["queries_file"] == "bench_queries.json"
    assert "queries" not in payload


def test_queries_file_roundtrips_full_timings(tmp_path):
    timings = {f"q{i}": float(i) for i in range(80)}
    details = {
        f"q{i}": {"start": i * 2.0, "samples": [float(i)] * 3}
        for i in range(80)
    }
    details["q3"]["first_pass"] = 9.0
    details["q3"]["retry"] = {"start": 200.0, "samples": [3.0, 3.0, 3.1]}
    details["q3"]["selection"] = "isolated_retry"
    path = str(tmp_path / "bench_queries.json")
    bench.write_queries_file(
        12.5, "0.1", 3, timings, ["scale_results_r8_ops.json"], path=path,
        details=details, run_started="2026-08-15T00:00:00Z",
    )
    with open(path) as fh:
        doc = json.load(fh)
    assert doc["queries"] == timings
    assert doc["value"] == 12.5
    assert doc["sf"] == 0.1
    assert doc["scale_results_files"] == ["scale_results_r8_ops.json"]
    # the self-diagnosis data survives the roundtrip: offsets, raw
    # samples, and both numbers of a retried query
    assert doc["run_started"] == "2026-08-15T00:00:00Z"
    assert doc["query_details"]["q7"]["start"] == 14.0
    assert doc["query_details"]["q7"]["samples"] == [7.0, 7.0, 7.0]
    assert doc["query_details"]["q3"]["first_pass"] == 9.0
    assert doc["query_details"]["q3"]["retry"]["samples"] == [3.0, 3.0, 3.1]
    # the selection policy travels with the artifact (r11 ADVICE): a
    # retried query commits the isolated measurement, recorded as such
    assert doc["query_details"]["q3"]["selection"] == "isolated_retry"


def test_capture_retry_threshold_is_looser_than_check_gate():
    # capture mode re-measures only clear contention spikes (>2x) while
    # --check keeps gating at 1.5x; an r10-style 4.5-26.5x window always
    # crosses the capture threshold
    assert bench.CAPTURE_RETRY_FACTOR > bench.REGRESSION_FACTOR
    base = {"steady": 2.0, "spiked": 2.0}
    timings = {"steady": 3.6, "spiked": 9.0}  # 1.8x vs 4.5x
    flagged = bench.check_regressions(
        timings, base, factor=bench.CAPTURE_RETRY_FACTOR
    )
    assert flagged == ["spiked"]
    # ...while the check gate would flag both
    assert bench.check_regressions(timings, base) == ["spiked", "steady"]


def test_check_output_path_is_not_the_committed_artifact():
    # a --check run must never dirty bench_queries.json (the driver's
    # r10 check left it modified in the tree); the check file is
    # gitignored
    assert bench.CHECK_PATH != bench.QUERIES_PATH
    assert os.path.basename(bench.CHECK_PATH) == "bench_check_last.json"
    root = os.path.dirname(os.path.abspath(bench.__file__))
    with open(os.path.join(root, ".gitignore")) as fh:
        assert "bench_check_last.json" in fh.read()


def test_plain_capture_path_is_not_the_committed_artifact():
    # r14 (VERDICT r13 watch 3): the driver's per-round plain bench run
    # must leave the tree clean too — only --update-baseline rewrites
    # the committed bench_queries.json, in lockstep with the baseline
    assert bench.CAPTURE_PATH != bench.QUERIES_PATH
    assert bench.CAPTURE_PATH != bench.CHECK_PATH
    assert os.path.basename(bench.CAPTURE_PATH) == "bench_queries_last.json"
    root = os.path.dirname(os.path.abspath(bench.__file__))
    with open(os.path.join(root, ".gitignore")) as fh:
        assert "bench_queries_last.json" in fh.read()


def test_committed_queries_file_carries_diagnosis_details():
    # the artifact must let a reader separate environment from
    # regression WITHOUT re-running: every query needs its start offset
    # and raw samples (r10: a contiguous 15-query contention window was
    # only adjudicable by a judge re-run)
    with open(bench.QUERIES_PATH) as fh:
        doc = json.load(fh)
    assert "query_details" in doc and "run_started" in doc
    for name in doc["queries"]:
        det = doc["query_details"][name]
        assert det["start"] >= 0
        assert len(det["samples"]) >= 1
        assert all(s > 0 for s in det["samples"])


def test_committed_queries_file_exists_and_covers_headline():
    # All 76+ per-query timings must be recoverable from the committed
    # artifact even when the driver only captures the compact stdout line.
    assert os.path.exists(bench.QUERIES_PATH), "bench_queries.json must be committed"
    with open(bench.QUERIES_PATH) as fh:
        doc = json.load(fh)
    assert set(bench.HEADLINE) <= set(doc["queries"]), (
        set(bench.HEADLINE) - set(doc["queries"])
    )
    assert all(v > 0 for v in doc["queries"].values())


def test_committed_baseline_parses_and_covers_headline():
    path = bench.BASELINE_PATH
    assert os.path.exists(path), "bench_baseline.json must be committed"
    with open(path) as fh:
        base = json.load(fh)
    assert set(bench.HEADLINE) <= set(base["queries"]), (
        set(bench.HEADLINE) - set(base["queries"])
    )
    assert all(v > 0 for v in base["queries"].values())
