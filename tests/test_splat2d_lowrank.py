"""Low-rank (Mehler) rasterizer vs the untruncated dense oracle.

The low-rank kernel's semantics are the untruncated gaussian sum cropped at
block windows; windows are sized to the alpha-aware bounds, so forward
differences vs the full untruncated oracle are bounded by sub-cutoff tails
(<= ALPHA_CUT per pair) plus Mehler truncation (<= ~1e-4 * weight at
|rho| <= 0.3) plus bf16 matmul rounding (~0.5% of local value).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r2_gaussian_tpu.models.preprocess import build_cov3d, preprocess
from r2_gaussian_tpu.ops import dense_reference, splat2d
from r2_gaussian_tpu.dataset.geometry import build_cameras


def random_quats(rng, n):
    q = rng.standard_normal((n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=1, keepdims=True)

W = H = 128


def _make_prep(n=700, seed=0, aniso=0.3):
    rng = np.random.default_rng(seed)
    scanner = {
        "mode": "cone", "DSD": 7.0, "DSO": 5.0,
        "nDetector": [H, W], "sDetector": [4.0, 4.0],
        "nVoxel": [64] * 3, "sVoxel": [2.0] * 3,
        "offOrigin": [0.0, 0.0, 0.0], "offDetector": [0.0, 0.0],
    }
    cams = build_cameras([0.4], np.zeros((1, H, W), np.float32), ["v"], scanner)
    xyz = jnp.asarray(rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32))
    base = rng.uniform(0.02, 0.06, (n, 1))
    scales = jnp.asarray(
        (base * rng.uniform(1 - aniso, 1 + aniso, (n, 3))).astype(np.float32)
    )
    rots = jnp.asarray(random_quats(rng, n))
    dens = jnp.asarray(rng.uniform(0.05, 0.8, n).astype(np.float32))
    args = (xyz, scales, rots, dens)

    def make(xyz, scales, rots, dens):
        cov3d = build_cov3d(scales, rots)
        return preprocess(
            xyz, cov3d, dens, jnp.asarray(cams.w2c[0]),
            jnp.asarray(cams.full_proj[0]), width=W, height=H,
            tanfovx=cams.tanfovx, tanfovy=cams.tanfovy, mode=cams.mode,
            footprint="tight",
        )

    return make, args


def _filter_lowrank(make, args):
    """Keep only gaussians the low-rank path accepts (|rho| <= RHO_MAX), so
    the oracle comparison isolates the Mehler kernel."""
    prep = make(*args)
    fl = splat2d._build_features_lr(prep)
    keep = np.asarray(jnp.abs(fl[4]) <= splat2d.RHO_MAX)
    return tuple(a[jnp.asarray(keep)] for a in args)


def test_lowrank_forward_matches_untruncated_oracle():
    make, args = _make_prep()
    args = _filter_lowrank(make, args)

    prep = make(*args)
    img = splat2d.render_pallas(prep, width=W, height=H, kernel="lowrank")
    ref = dense_reference.render_dense_untruncated(prep, width=W, height=H)
    img, ref = np.asarray(img), np.asarray(ref)
    scale = ref.max()
    assert scale > 0.1
    assert np.abs(img - ref).max() / scale < 5e-3, (
        np.abs(img - ref).max(), scale)


def test_lowrank_gradients_match_oracle():
    make, args = _make_prep(n=300, seed=1)
    args = _filter_lowrank(make, args)
    gt = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (H, W)).astype(np.float32)
    )

    def loss_pallas(*a):
        img = splat2d.render_pallas(make(*a), width=W, height=H,
                                    kernel="lowrank")
        return jnp.mean((img - gt) ** 2)

    def loss_ref(*a):
        img = dense_reference.render_dense_untruncated(make(*a), width=W,
                                                       height=H)
        return jnp.mean((img - gt) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(gp, gr, ["xyz", "scales", "rots", "dens"]):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(b).max() + 1e-12
        assert np.abs(a - b).max() / denom < 2e-2, (
            name, np.abs(a - b).max(), denom)


def test_lowrank_routing_mixes_with_direct():
    """Anisotropic gaussians (|rho| > RHO_MAX) must route to the direct
    kernels and still land on the image."""
    make, args = _make_prep(n=400, seed=3, aniso=3.0)
    prep = make(*args)
    img_auto = np.asarray(
        splat2d.render_pallas(prep, width=W, height=H, kernel="auto"))
    img_direct = np.asarray(
        splat2d.render_pallas(prep, width=W, height=H, kernel="direct"))
    scale = img_direct.max()
    assert scale > 0.05
    # direct vs auto differ only by untruncated-vs-cutoff semantics of the
    # low-rank-routed subset: small relative to the image
    assert np.abs(img_auto - img_direct).max() / scale < 2e-2
