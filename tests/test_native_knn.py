"""Native C++ KNN vs brute force."""

import numpy as np
import pytest


def brute_knn3(pts):
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    return np.sort(d2, axis=1)[:, :3].mean(1)


def test_native_knn_matches_brute_force():
    from r2_gaussian_tpu.native import knn3_mean_sq_dist

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (3000, 3)).astype(np.float32)
    got = knn3_mean_sq_dist(pts)
    if got is None:
        pytest.skip("native toolchain unavailable")
    want = brute_knn3(pts.astype(np.float64)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_native_knn_clustered():
    from r2_gaussian_tpu.native import knn3_mean_sq_dist

    rng = np.random.default_rng(1)
    # highly nonuniform: two tight clusters + sparse background
    pts = np.concatenate([
        rng.normal(0.5, 0.01, (500, 3)),
        rng.normal(-0.5, 0.005, (500, 3)),
        rng.uniform(-1, 1, (100, 3)),
    ]).astype(np.float32)
    got = knn3_mean_sq_dist(pts)
    if got is None:
        pytest.skip("native toolchain unavailable")
    want = brute_knn3(pts.astype(np.float64)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4)
