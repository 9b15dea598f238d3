"""Fused Pallas kernels on real TPU hardware vs the dense oracle.

Shapes are chosen to exercise the production configuration: 512^2 detector,
~16k Morton-sorted gaussians with mid-training footprints, the grouped
(GROUP-wide) low-rank + spill render path, and the low-rank TV box splat.
Tolerances budget for the Mehler truncation (documented in ops/splat2d.py
and ops/splat3d.py) plus bf16 patch matmuls; the direct kernel is compared
tightly. A Mosaic lowering regression (wrong dot precision, broken sublane
slice, VMEM spill producing garbage) fails these loudly.
"""

import numpy as np
import jax
import jax.numpy as jnp

from r2_gaussian_tpu.models.preprocess import build_cov3d, cov3d_components, preprocess
from r2_gaussian_tpu.models.voxel_preprocess import voxel_preprocess
from r2_gaussian_tpu.ops import dense_reference, splat2d, splat3d

W = H = 512


def _morton_sort(xyz):
    q = np.clip(((xyz + 1.0) * 512).astype(np.int64), 0, 1023)

    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    key = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    return np.argsort(key)


def make_population(n=16384, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
    xyz = xyz[_morton_sort(xyz)]
    scales = rng.uniform(0.01, 0.05, (n, 3)).astype(np.float32)
    rots = rng.standard_normal((n, 4)).astype(np.float32)
    rots /= np.linalg.norm(rots, axis=1, keepdims=True)
    dens = rng.uniform(0.05, 1.0, n).astype(np.float32)
    return (jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(rots),
            jnp.asarray(dens))


def make_prep(xyz, scales, rots, dens, w=W, h=H):
    # cone-beam geometry matching the synthetic scanner (dataset/geometry)
    from r2_gaussian_tpu.dataset.geometry import build_cameras

    scanner = dict(
        nVoxel=[256, 256, 256], sVoxel=[2.0, 2.0, 2.0],
        nDetector=[w, h], sDetector=[4.0, 4.0],
        DSD=7.0, DSO=5.0, offOrigin=[0.0, 0.0, 0.0],
        offDetector=[0.0, 0.0], mode="cone",
        dVoxel=[2.0 / 256] * 3, dDetector=[4.0 / w] * 2,
        accuracy=0.5, totalAngle=360.0, startAngle=0.0,
    )
    projs = np.zeros((1, h, w), np.float32)
    cams = build_cameras(np.asarray([0.3]), projs, ["0"], scanner)
    cov3d = cov3d_components(scales, rots)
    return preprocess(
        xyz, cov3d, dens, jnp.asarray(cams.w2c[0]),
        jnp.asarray(cams.full_proj[0]), width=w, height=h,
        tanfovx=cams.tanfovx, tanfovy=cams.tanfovy, mode=cams.mode,
        footprint="tight",
    )


def test_render_lowrank_fwd_bwd_vs_dense():
    xyz, scales, rots, dens = make_population()
    prep = make_prep(xyz, scales, rots, dens)
    ref = np.asarray(jax.jit(lambda p: dense_reference.render_dense(
        p, width=W, height=H, gaussian_chunk=512))(prep))

    img = np.asarray(jax.jit(
        lambda p: splat2d.render_pallas(p, width=W, height=H, kernel="auto")
    )(prep))
    peak = ref.max()
    assert np.isfinite(img).all()
    # low-rank semantics: untruncated gaussians + K_LR Mehler terms + bf16
    # patch matmul; the dense oracle applies the reference cutoffs
    assert np.abs(img - ref).max() < 2e-2 * peak + 1e-4


def test_render_grads_vs_dense_small():
    """Gradient parity at a shape the dense oracle's autodiff can afford on
    a single chip (its backward materializes the full pixel x gaussian pair
    grid — 100 GB at 512^2 x 16k); the Pallas kernels still take the real
    Mosaic lowering at this shape."""
    w = h = 128
    xyz, scales, rots, dens = make_population(n=1024, seed=9)

    def loss(kernel, xyz, scales, rots, dens):
        p = make_prep(xyz, scales, rots, dens, w, h)
        img = (dense_reference.render_dense(p, width=w, height=h)
               if kernel == "dense"
               else splat2d.render_pallas(p, width=w, height=h, kernel=kernel))
        return jnp.mean(jnp.abs(img - 0.1))

    gd = jax.jit(jax.grad(lambda *a: loss("dense", *a), argnums=(0, 1, 3)))(
        xyz, scales, rots, dens)
    gp = jax.jit(jax.grad(lambda *a: loss("auto", *a), argnums=(0, 1, 3)))(
        xyz, scales, rots, dens)
    for a, b in zip(gd, gp):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        denom = np.abs(a).max() + 1e-12
        # Mehler-truncation-level agreement (K_LR terms at RHO_MAX routing)
        assert np.abs(b - a).max() / denom < 8e-2


def test_render_direct_fwd_vs_dense_tight():
    xyz, scales, rots, dens = make_population(n=4096, seed=3)
    prep = make_prep(xyz, scales, rots, dens)
    ref = np.asarray(jax.jit(lambda p: dense_reference.render_dense(
        p, width=W, height=H, gaussian_chunk=512))(prep))
    img = np.asarray(jax.jit(
        lambda p: splat2d.render_pallas(p, width=W, height=H, kernel="direct")
    )(prep))
    # exact cutoff semantics — only f32 summation-order noise
    np.testing.assert_allclose(img, ref, rtol=1e-4, atol=1e-5 * max(ref.max(), 1.0))


def test_tv_box_lowrank_vs_dense():
    xyz, scales, rots, dens = make_population(n=8192, seed=5)
    n_vox = (32, 32, 32)
    s_vox = jnp.asarray((0.25, 0.25, 0.25))
    cov3d = build_cov3d(scales, rots)
    prep = voxel_preprocess(
        xyz, cov3d, jnp.max(scales, axis=-1), dens,
        center=(0.05, -0.1, 0.0), n_voxel=n_vox, s_voxel=s_vox,
    )
    ref = np.asarray(jax.jit(lambda p: dense_reference.voxelize_dense(
        p, n_voxel=n_vox, gaussian_chunk=1024))(prep))

    def lr(prep):
        vol, spill = splat3d.voxelize_lowrank(prep, n_voxel=n_vox)
        pd = prep._replace(weight=jnp.where(spill, prep.weight, 0.0))
        return vol + splat3d.voxelize_pallas(pd, n_voxel=n_vox, window_x=16,
                                             window_y=16)

    got = np.asarray(jax.jit(lr)(prep))
    assert np.isfinite(got).all()
    assert np.abs(got - ref).max() < 1.5e-2 * max(ref.max(), 1e-3) + 1e-4

    direct = np.asarray(jax.jit(
        lambda p: splat3d.voxelize_pallas(p, n_voxel=n_vox)
    )(prep))
    np.testing.assert_allclose(direct, ref, rtol=1e-4,
                               atol=1e-5 * max(ref.max(), 1.0))


def test_batched_step_path_on_tpu(monkeypatch):
    """The R2G_SPLAT_BATCH batched-step path lowers through real Mosaic and
    matches the legacy path bit-for-bit (same bodies, same math, different
    step scheduling)."""
    xyz, scales, rots, dens = make_population(n=8192, seed=11)
    prep = make_prep(xyz, scales, rots, dens)
    legacy = np.asarray(jax.jit(
        lambda p: splat2d.render_pallas(p, width=W, height=H, kernel="auto")
    )(prep))
    monkeypatch.setattr(splat2d, "SPLAT_BATCH", 4)
    batched = np.asarray(jax.jit(
        lambda p: splat2d.render_pallas(p, width=W, height=H, kernel="auto")
    )(prep))
    # identical per-block math; only the f32 accumulation order of block
    # patches into the image differs
    np.testing.assert_allclose(batched, legacy, rtol=1e-5,
                               atol=1e-6 * max(legacy.max(), 1.0))
