"""Mehler low-rank 3D box voxelizer vs an untruncated dense evaluation.

The low-rank path renders the untruncated gaussian (no alpha/rect cutoffs
— those are GPU perf hacks in the reference, cuda_voxelizer/forward.cu),
truncating the Mehler series at K_3D terms with the x-(y,z) correlation
pinned to RHO0_3D by the slack-term construction (ops/splat3d.py). The
oracle here is therefore the plain sum of w*exp(-0.5 d^T C d) over the box,
and tolerances reflect the documented series truncation (~3e-3 of peak at
the RHO3_MAX spill threshold).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from r2_gaussian_tpu.models.preprocess import build_cov3d
from r2_gaussian_tpu.models.voxel_preprocess import voxel_preprocess
from r2_gaussian_tpu.ops import splat3d


def random_gaussians(n, seed=0, sigma_range=(0.02, 0.08), aniso=1.0):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32))
    scales = rng.uniform(*sigma_range, (n, 3)).astype(np.float32)
    scales[:, 0] *= aniso
    rots = rng.standard_normal((n, 4)).astype(np.float32)
    rots = jnp.asarray(rots / np.linalg.norm(rots, axis=1, keepdims=True))
    dens = jnp.asarray(rng.uniform(0.1, 1.5, n).astype(np.float32))
    return xyz, jnp.asarray(scales), rots, dens


def make_prep(xyz, scales, rots, dens, center, n_voxel, s_voxel):
    cov3d = build_cov3d(scales, rots)
    return voxel_preprocess(
        xyz, cov3d, jnp.max(scales, axis=-1), dens,
        center=center, n_voxel=n_voxel, s_voxel=s_voxel,
    )


def dense_untruncated(prep, n_voxel):
    """Sum of w * exp(-0.5 d^T C d) over the whole box — no cutoffs."""
    nx, ny, nz = n_voxel
    xs = jnp.arange(nx, dtype=jnp.float32) + 0.5
    ys = jnp.arange(ny, dtype=jnp.float32) + 0.5
    zs = jnp.arange(nz, dtype=jnp.float32) + 0.5
    dx = xs[:, None, None, None] - prep.cx
    dy = ys[None, :, None, None] - prep.cy
    dz = zs[None, None, :, None] - prep.cz
    power = -0.5 * (
        prep.ia * dx * dx + prep.id_ * dy * dy + prep.if_ * dz * dz
    ) - prep.ib * dx * dy - prep.ic * dx * dz - prep.ie * dy * dz
    return jnp.sum(prep.weight * jnp.exp(power), axis=-1)


def lr3_full(prep, n_voxel):
    """Low-rank box + exact-path spill, as models/render.query composes."""
    vol, spill = splat3d.voxelize_lowrank(prep, n_voxel=n_voxel)
    prep_spill = prep._replace(weight=jnp.where(spill, prep.weight, 0.0))
    return vol + splat3d.voxelize_pallas(prep_spill, n_voxel=n_voxel,
                                         window_x=16, window_y=16)


@pytest.mark.parametrize("aniso", [1.0, 4.0])
def test_lowrank_matches_untruncated_dense(aniso):
    xyz, scales, rots, dens = random_gaussians(256, seed=3, aniso=aniso)
    n_vox = (32, 32, 32)
    s_vox = (1.0, 1.0, 1.0)
    prep = make_prep(xyz, scales, rots, dens, (0.0, 0.0, 0.0), n_vox, s_vox)
    ref = np.asarray(dense_untruncated(prep, n_vox))
    got = np.asarray(lr3_full(prep, n_vox))
    # spill-path contributions are cutoff-truncated (exact reference
    # semantics), adding up to ~1.1% of a spilled gaussian's peak at its
    # rect boundary on top of the Mehler truncation
    tol = 6e-3 * float(ref.max()) + 1e-5
    if aniso > 1.0:
        feats, spill = splat3d.build_lowrank_features3(prep)
        assert int(np.asarray(spill).sum()) > 0  # spill path exercised
        tol = 1.5e-2 * float(ref.max()) + 1e-5
    assert np.abs(got - ref).max() < tol


def test_lowrank_gradients_close():
    xyz, scales, rots, dens = random_gaussians(128, seed=11)
    n_vox = (32, 32, 32)
    s_vox = (1.0, 1.0, 1.0)
    tgt = 0.15

    def loss(fn, xyz, scales, rots, dens):
        prep = make_prep(xyz, scales, rots, dens, (0.0, 0.0, 0.0), n_vox,
                         s_vox)
        return jnp.mean(jnp.abs(fn(prep, n_vox) - tgt))

    gd = jax.grad(lambda *a: loss(dense_untruncated, *a), argnums=(0, 1, 3))(
        xyz, scales, rots, dens)
    gp = jax.grad(lambda *a: loss(lr3_full, *a), argnums=(0, 1, 3))(
        xyz, scales, rots, dens)
    for a, b in zip(gd, gp):
        a, b = np.asarray(a), np.asarray(b)
        # truncation-level agreement: relative error of the gradient field
        denom = np.abs(a).max() + 1e-12
        assert np.abs(b - a).max() / denom < 4e-2


def test_query_auto_close_to_direct():
    """query(tv_kernel='auto') stays within truncation tolerance of the
    exact gather path once n exceeds the gather capacity."""
    from r2_gaussian_tpu.models.render import query

    xyz, scales, rots, dens = random_gaussians(900, seed=7)
    n_vox = (32, 32, 32)
    kw = dict(center=(0.0, 0.0, 0.0), n_voxel=n_vox,
              s_voxel=jnp.asarray((1.0, 1.0, 1.0)),
              backend="pallas", gather_cap=1024, gather_bcap=16)
    direct = np.asarray(query(xyz, scales, rots, dens, tv_kernel="direct",
                              **kw)["vol"])
    auto = np.asarray(query(xyz, scales, rots, dens, tv_kernel="auto",
                            **kw)["vol"])
    assert np.abs(auto - direct).max() < 8e-3 * direct.max() + 1e-5
