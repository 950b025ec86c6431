"""Hypothesis property tests for the classifier eval family: the
integer-exact reports must agree with a direct Python reimplementation
for ARBITRARY margin/label sets, not just the planted fixtures —
especially around the floor-vs-truncate division seams (negative mean
margins, clamp boundaries of the linear probability map)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from hadoop_invertedindexer_spark.functions import textstats as ts

HSETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)

scored_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-300, max_value=300),   # margin
        st.sampled_from([1, -1]),                     # y
    ),
    min_size=1,
    max_size=40,
)


def _floordiv(a: int, b: int) -> int:
    return a // b  # python // IS floor division, the oracle convention


def _model_calibration(rows, n_bins: int, scale: int):
    mn = min(m for m, _ in rows)
    mx = max(m for m, _ in rows)
    bins: dict[int, dict] = {}
    for m, y in rows:
        b = _floordiv((m - mn) * n_bins, mx - mn + 1)
        p = min(1000, max(0, _floordiv(500 * (scale + m), scale)))
        d = bins.setdefault(
            b, {"n": 0, "pos": 0, "msum": 0, "psum": 0, "se": 0}
        )
        d["n"] += 1
        d["pos"] += 1 if y == 1 else 0
        d["msum"] += m
        d["psum"] += p
        d["se"] += (p - 1000) ** 2 if y == 1 else p * p
    out = {}
    for b, d in bins.items():
        out[b] = (
            d["n"],
            d["pos"],
            _floordiv(d["msum"] * 1000, d["n"]),
            _floordiv(d["pos"] * 1000, d["n"]),
            _floordiv(d["psum"], d["n"]),
            abs(_floordiv(d["psum"], d["n"]) - _floordiv(d["pos"] * 1000, d["n"])),
            d["se"],
            _floordiv(d["se"], d["n"]),
        )
    return out


@HSETTINGS
@given(
    rows=scored_strategy,
    n_bins=st.integers(min_value=1, max_value=8),
    scale=st.integers(min_value=1, max_value=400),
)
def test_calibration_matches_python_model(spark, rows, n_bins, scale):
    df = spark.createDataFrame(
        [(i, m, y) for i, (m, y) in enumerate(rows)],
        ["doc_id", "margin", "y"],
    )
    got = {
        r.bin: (
            r.n_docs, r.n_pos, r.mean_margin_mils, r.pos_rate_mils,
            r.mean_p_mils, r.gap_mils, r.se_sum, r.brier_micros,
        )
        for r in ts.classifier_calibration(
            df, n_bins=n_bins, scale=scale
        ).collect()
    }
    assert got == _model_calibration(rows, n_bins, scale)


def _model_pr_sweep(rows):
    n_docs = len(rows)
    n_pos = sum(1 for _, y in rows if y == 1)
    out = {}
    # candidate thresholds = distinct margins plus the keep-everything
    # sentinel one below the minimum (r11 ADVICE)
    thresholds = {m for m, _ in rows}
    if rows:
        thresholds.add(min(m for m, _ in rows) - 1)
    for t in thresholds:
        kept = [(m, y) for m, y in rows if m > t]
        tp = sum(1 for _, y in kept if y == 1)
        out[t] = (
            len(kept),
            _floordiv(len(kept) * 1000, n_docs),
            tp,
            _floordiv(tp * 1000, len(kept)) if kept else None,
            _floordiv(tp * 1000, n_pos) if n_pos else None,
        )
    return out


@HSETTINGS
@given(rows=scored_strategy)
def test_pr_sweep_matches_python_model(spark, rows):
    df = spark.createDataFrame(
        [(i, m, y) for i, (m, y) in enumerate(rows)],
        ["doc_id", "margin", "y"],
    )
    got = {
        r.threshold: (
            r.n_kept, r.kept_mils, r.n_pos_kept,
            r.precision_mils, r.recall_mils,
        )
        for r in ts.classifier_pr_sweep(df).collect()
    }
    assert got == _model_pr_sweep(rows)
