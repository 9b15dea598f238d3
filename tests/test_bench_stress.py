"""The bench's 500k stress-state secondary metric (bench.py
measure_stress_state) at toy scale.

Regression for the round-5 failure: the train fn donates its TrainState
(donate_argnums=(0,)), and the probe's timed call reused the donated state,
which surfaced on the tunneled TPU backend as an opaque
`INVALID_ARGUMENT: TPU backend error` and silently skipped the metric.
The fix threads the returned state through; this test drives the real
function end-to-end (tiny synthetic state + case) and asserts it returns
a measurement instead of swallowing an exception.
"""

import os

import numpy as np
import pytest

import bench
from r2_gaussian_tpu.dataset.geometry import build_cameras


@pytest.fixture()
def tiny_cache(tmp_path, monkeypatch):
    """Redirect bench's artifact cache so the test neither reads nor
    pollutes .bench_data."""
    monkeypatch.setattr(bench, "CACHE_DIR", str(tmp_path))
    return tmp_path


def test_measure_stress_state_returns_metric(tiny_cache):
    cap, n_act = 2048, 1500
    rng = np.random.default_rng(0)
    np.savez(
        os.path.join(str(tiny_cache), "state_1100.npz"),
        xyz=rng.uniform(-0.5, 0.5, (cap, 3)).astype(np.float32),
        scaling=np.full((cap, 3), -3.0, np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (cap, 1)),
        density=np.full((cap, 1), -2.0, np.float32),
        active=np.arange(cap) < n_act,
        scale_bound=np.array([0.001, 0.5]),
    )
    _, angles, projs, scanner, _ = bench.load_or_make(32, 4, 32, 400)
    cams = build_cameras(angles, projs, [str(i) for i in range(len(angles))],
                         scanner)
    out = bench.measure_stress_state(cams, scanner,
                                     deadline=bench.time.time() + 3600)
    assert out is not None, "stress metric skipped (see stderr traceback)"
    assert out["capacity"] == cap
    assert out["n_gaussians"] == n_act
    assert out["ms_per_it"] > 0


def test_measure_stress_state_missing_state_is_none(tiny_cache):
    _, angles, projs, scanner, _ = bench.load_or_make(32, 4, 32, 400)
    cams = build_cameras(angles, projs, [str(i) for i in range(len(angles))],
                         scanner)
    assert bench.measure_stress_state(
        cams, scanner, deadline=bench.time.time() + 3600) is None
