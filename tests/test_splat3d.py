"""Pallas splat-block voxelizer vs the dense oracle (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from r2_gaussian_tpu.models.preprocess import build_cov3d
from r2_gaussian_tpu.models.voxel_preprocess import voxel_preprocess
from r2_gaussian_tpu.ops.dense_reference import voxelize_dense
from r2_gaussian_tpu.ops.splat3d import voxelize_pallas


def random_gaussians(n, seed=0, sigma_range=(0.02, 0.08)):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(*sigma_range, (n, 3)).astype(np.float32))
    rots = rng.standard_normal((n, 4)).astype(np.float32)
    rots = jnp.asarray(rots / np.linalg.norm(rots, axis=1, keepdims=True))
    dens = jnp.asarray(rng.uniform(0.1, 1.5, n).astype(np.float32))
    return xyz, scales, rots, dens


def make_prep(xyz, scales, rots, dens, center, n_voxel, s_voxel):
    cov3d = build_cov3d(scales, rots)
    return voxel_preprocess(
        xyz, cov3d, jnp.max(scales, axis=-1), dens,
        center=center, n_voxel=n_voxel, s_voxel=s_voxel,
    )


@pytest.mark.parametrize("n", [60, 300])
def test_voxelize_matches_dense(n):
    xyz, scales, rots, dens = random_gaussians(n, seed=n)
    n_vox = (32, 32, 32)
    s_vox = (0.5, 0.5, 0.5)  # sub-box like the TV query
    center = (0.1, -0.2, 0.05)
    prep = make_prep(xyz, scales, rots, dens, center, n_vox, s_vox)
    ref = voxelize_dense(prep, n_voxel=n_vox)
    got = voxelize_pallas(prep, n_voxel=n_vox)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_voxelize_oversized_fallback():
    xyz, scales, rots, dens = random_gaussians(50, seed=5, sigma_range=(0.02, 0.3))
    n_vox = (32, 32, 32)
    s_vox = (2.0, 2.0, 2.0)
    prep = make_prep(xyz, scales, rots, dens, (0.0, 0.0, 0.0), n_vox, s_vox)
    ref = voxelize_dense(prep, n_voxel=n_vox)
    got = voxelize_pallas(prep, n_voxel=n_vox)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("cap", [128, 256])
def test_query_gather_path(cap):
    """The query-level gather fast path (cheap touch mask -> raw-component
    compaction -> preprocess on the subset; with and without overflow into
    the block-tier fallback) matches the dense oracle, values and grads."""
    from r2_gaussian_tpu.models.render import query

    xyz, scales, rots, dens = random_gaussians(900, seed=7)
    n_vox = (32, 32, 32)
    s_vox = (1.2, 1.2, 1.2)
    center = (0.05, 0.1, -0.15)
    kw = dict(center=center, n_voxel=n_vox, s_voxel=jnp.asarray(s_vox))

    def loss(backend, xyz, scales, rots, dens):
        vol = query(xyz, scales, rots, dens, backend=backend,
                    gather_cap=cap, gather_bcap=8, tv_kernel="direct",
                    **kw)["vol"]
        return jnp.mean(vol * vol)

    prep = make_prep(xyz, scales, rots, dens, center, n_vox, s_vox)
    n_touch = int(np.asarray((prep.weight > 0).sum()))
    if cap == 128:
        assert n_touch > cap  # overflow branch exercised
    ref = np.asarray(query(xyz, scales, rots, dens, backend="dense", **kw)["vol"])
    got = np.asarray(query(xyz, scales, rots, dens, backend="pallas",
                           gather_cap=cap, gather_bcap=8, tv_kernel="direct",
                           **kw)["vol"])
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)
    if n_touch > cap:
        # overflow is value-exact but intentionally non-differentiable for
        # the leftover gaussians (see models/render.query) — skip the full
        # gradient-parity check
        return
    gd = jax.grad(lambda *a: loss("dense", *a), argnums=(0, 1, 3))(
        xyz, scales, rots, dens)
    gp = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 3))(
        xyz, scales, rots, dens)
    for a, b in zip(gd, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-7)


def test_voxelize_gradients_match():
    xyz, scales, rots, dens = random_gaussians(80, seed=2)
    n_vox = (32, 32, 32)
    s_vox = (1.0, 1.0, 1.0)

    def loss(backend, xyz, scales, rots, dens):
        prep = make_prep(xyz, scales, rots, dens, (0.0, 0.0, 0.0), n_vox, s_vox)
        if backend == "dense":
            vol = voxelize_dense(prep, n_voxel=n_vox)
        else:
            vol = voxelize_pallas(prep, n_voxel=n_vox)
        return jnp.mean(jnp.abs(vol - 0.2))

    gd = jax.grad(lambda *a: loss("dense", *a), argnums=(0, 1, 3))(xyz, scales, rots, dens)
    gp = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 3))(xyz, scales, rots, dens)
    for a, b in zip(gd, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-7)
