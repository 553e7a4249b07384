"""Regression-flag guard for the benchmark scoreboard.

VERDICT r4 #8 done-criterion: a synthetic 25% regression must trip the
cross-round flag (the old 0.6x threshold let a real 26% round-3 drop
sail through), while ~10% sandbox jitter must not. Exercises
``bench._cross_round_compare`` against the committed ``BENCH_r*.json``
driver records — the same inputs the real bench run reads.
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

_spec = importlib.util.spec_from_file_location("yabpe_bench", REPO / "bench.py")
bench = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("yabpe_bench", bench)
_spec.loader.exec_module(bench)

FLAG = "REGRESSION? below 0.8x best prior"


def _best_prior() -> float:
    vals = []
    for p in sorted(REPO.glob("BENCH_r*.json")):
        try:
            vals.append(float(json.loads(p.read_text())["parsed"]["value"]))
        except Exception:
            continue
    if not vals:
        pytest.skip("no BENCH_r*.json driver records in this checkout")
    return max(vals)


def test_synthetic_25pct_regression_trips_flag(capfd):
    best = _best_prior()
    bench._cross_round_compare(best * 0.75)
    assert FLAG in capfd.readouterr().err


def test_10pct_jitter_does_not_trip_flag(capfd):
    best = _best_prior()
    bench._cross_round_compare(best * 0.90)
    err = capfd.readouterr().err
    assert FLAG not in err
    assert "cross-round" in err  # the comparison itself still logs


def test_exact_threshold_boundary(capfd):
    best = _best_prior()
    bench._cross_round_compare(best * 0.80)
    assert FLAG not in capfd.readouterr().err  # flag is strictly-below
