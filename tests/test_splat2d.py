"""Pallas splat-block rasterizer vs the dense oracle (interpret mode on CPU):
values and gradients must match exactly (same math, same masks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import activate
from r2_gaussian_tpu.models.preprocess import build_cov3d, preprocess
from r2_gaussian_tpu.models.render import render
from r2_gaussian_tpu.ops.splat2d import SplatConfig, render_pallas
from r2_gaussian_tpu.ops.dense_reference import render_dense


def make_cams(n_det=128, mode="parallel"):
    sc = {
        "mode": mode, "DSD": 7.0, "DSO": 5.0,
        "nDetector": [n_det, n_det],
        "sDetector": [2.0, 2.0] if mode == "parallel" else [4.0, 4.0],
        "nVoxel": [64] * 3, "sVoxel": [2.0] * 3,
        "offOrigin": [0, 0, 0], "offDetector": [0, 0],
    }
    return build_cameras([0.4], np.zeros((1, n_det, n_det), np.float32), ["t"], sc)


def random_gaussians(n, seed=0, sigma_range=(0.02, 0.12)):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(*sigma_range, (n, 3)).astype(np.float32))
    rots = rng.standard_normal((n, 4)).astype(np.float32)
    rots = jnp.asarray(rots / np.linalg.norm(rots, axis=1, keepdims=True))
    dens = jnp.asarray(rng.uniform(0.1, 1.5, n).astype(np.float32))
    return xyz, scales, rots, dens


def prep_for(cams, xyz, scales, rots, dens):
    cov3d = build_cov3d(scales, rots)
    return preprocess(
        xyz, cov3d, dens,
        jnp.asarray(cams.w2c[0]), jnp.asarray(cams.full_proj[0]),
        width=cams.width, height=cams.height,
        tanfovx=cams.tanfovx, tanfovy=cams.tanfovy, mode=cams.mode,
    )


@pytest.mark.parametrize("mode", ["parallel", "cone"])
@pytest.mark.parametrize("n", [50, 300])
def test_forward_matches_dense(mode, n):
    cams = make_cams(mode=mode)
    xyz, scales, rots, dens = random_gaussians(n, seed=n)
    prep = prep_for(cams, xyz, scales, rots, dens)
    ref = render_dense(prep, width=cams.width, height=cams.height)
    got = render_pallas(
        prep, width=cams.width, height=cams.height,
        config=SplatConfig(tiers=((64, 48),), dense_cap=512, dense_chunk=256),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_forward_with_oversized_blocks():
    """Mixed sizes: some gaussians too large for the window -> fallback."""
    cams = make_cams()
    xyz, scales, rots, dens = random_gaussians(80, seed=7, sigma_range=(0.02, 0.45))
    prep = prep_for(cams, xyz, scales, rots, dens)
    ref = render_dense(prep, width=cams.width, height=cams.height)
    got = render_pallas(
        prep, width=cams.width, height=cams.height,
        config=SplatConfig(tiers=((64, 48),), dense_cap=512, dense_chunk=256),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_gradients_match_dense():
    cams = make_cams(n_det=64)
    xyz, scales, rots, dens = random_gaussians(150, seed=3)
    target = jnp.ones((64, 64), jnp.float32) * 0.3

    def loss(backend, xyz, scales, rots, dens):
        out = render(
            xyz, scales, rots, dens,
            w2c=jnp.asarray(cams.w2c[0]), full_proj=jnp.asarray(cams.full_proj[0]),
            width=64, height=64, tanfovx=cams.tanfovx, tanfovy=cams.tanfovy,
            mode=cams.mode, backend=backend,
        )
        return jnp.mean(jnp.abs(out["render"] - target))

    gd = jax.grad(lambda *a: loss("dense", *a), argnums=(0, 1, 2, 3))(
        xyz, scales, rots, dens
    )
    gp = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3))(
        xyz, scales, rots, dens
    )
    for a, b in zip(gd, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-7)


def test_batched_step_path_matches_dense(monkeypatch):
    """The opt-in batched-step kernels (R2G_SPLAT_BATCH) produce the same
    values and gradients as the dense oracle (and hence as the legacy
    ids-compacted path, which the other tests cover)."""
    import r2_gaussian_tpu.ops.splat2d as s2

    monkeypatch.setattr(s2, "SPLAT_BATCH", 2)
    cams = make_cams(mode="cone")
    w, h = cams.width, cams.height
    xyz, scales, rots, dens = random_gaussians(300, seed=13)
    prep = prep_for(cams, xyz, scales, rots, dens)
    ref = np.asarray(render_dense(prep, width=w, height=h))
    got = np.asarray(s2.render_pallas(prep, width=w, height=h,
                                      kernel="direct"))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)

    def loss(fn, xyz, scales, rots, dens):
        p = prep_for(cams, xyz, scales, rots, dens)
        img = (render_dense(p, width=w, height=h) if fn == "dense"
               else s2.render_pallas(p, width=w, height=h, kernel="direct"))
        return jnp.mean(jnp.abs(img - 0.1))

    gd = jax.grad(lambda *a: loss("dense", *a), argnums=(0, 1, 3))(
        xyz, scales, rots, dens)
    gp = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 3))(
        xyz, scales, rots, dens)
    for a, b in zip(gd, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-7)
