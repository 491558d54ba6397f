"""The bench latency estimator (chain-length regression, VERDICT r4 item 6):
recovers a known per-call latency under a large constant sync cost and
noise, with a CI that brackets the estimate — the properties whose absence
made the round-4 min-envelope estimator produce b8<b1 inversions.
"""

import time

import numpy as np

import bench


def _run(per_call_s, sync_s, jitter_s=0.0, seed=0):
    rng = np.random.default_rng(seed)
    frames = np.zeros((1, 4, 4), dtype=np.uint8)

    def fn(_v, f, _t):
        time.sleep(per_call_s + (rng.random() * jitter_s))
        return f

    def sync(_o):
        time.sleep(sync_s)

    return bench.chained_latency_ms(fn, None, frames, 0.5, sync,
                                    ks=(1, 2, 4, 8), reps=3, n_boot=100)


def test_recovers_slope_under_constant_sync():
    stats = _run(per_call_s=0.002, sync_s=0.010)
    # the 10 ms sync must land in the intercept, not the slope
    assert 1.5 < stats["ms"] < 3.5, stats
    assert stats["ci_lo"] <= stats["ms"] <= stats["ci_hi"], stats
    assert stats["ci_lo"] > 0.5, stats


def test_jitter_lands_in_spread_not_headline():
    stats = _run(per_call_s=0.002, sync_s=0.010, jitter_s=0.004)
    assert 1.5 < stats["ms"] < 5.5, stats
    assert stats["p99"] >= stats["p50"] >= 0, stats
    # no floor-above-median inversion by construction
    assert stats["ms"] <= stats["p99"] * 1.5 + 1.0, stats


def test_monotone_in_work():
    """More per-call work -> larger estimate (the b1/b8 ordering the
    min-envelope estimator violated)."""
    a = _run(per_call_s=0.001, sync_s=0.008)
    b = _run(per_call_s=0.004, sync_s=0.008)
    assert b["ms"] > a["ms"], (a["ms"], b["ms"])
