"""Selector-matmul precision modes (R2G_SELDOT) vs the dense oracle.

The default mode is 'highest' (exact f32, covered by test_splat2d.py).
These tests gate the cheaper MXU modes prepared for the 500k-state A/B:
'split2' must be indistinguishable from f32 at test tolerances (hi/lo
mantissa split, ~2^-17 payload error), 'bf16' must stay within its ~2^-8
payload rounding envelope. Both must differentiate.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import r2_gaussian_tpu.ops.splat2d as splat2d
from r2_gaussian_tpu.models.preprocess import build_cov3d, preprocess
from r2_gaussian_tpu.ops.dense_reference import render_dense
from r2_gaussian_tpu.ops.splat2d import SplatConfig, render_pallas

from test_splat2d import make_cams, prep_for, random_gaussians


@pytest.fixture(params=["split2", "bf16"])
def seldot_mode(request):
    prev = splat2d._SELDOT
    splat2d._SELDOT = request.param
    jax.clear_caches()
    yield request.param
    splat2d._SELDOT = prev
    jax.clear_caches()


def test_forward_within_mode_envelope(seldot_mode):
    cams = make_cams(mode="cone")
    xyz, scales, rots, dens = random_gaussians(300, seed=11)
    prep = prep_for(cams, xyz, scales, rots, dens)
    ref = np.asarray(render_dense(prep, width=cams.width, height=cams.height))
    got = np.asarray(render_pallas(
        prep, width=cams.width, height=cams.height,
        config=SplatConfig(tiers=((64, 48),), dense_cap=512, dense_chunk=256),
    ))
    tol = dict(rtol=5e-5, atol=1e-5) if seldot_mode == "split2" else \
        dict(rtol=1.5e-2, atol=4e-3 * max(1.0, ref.max()))
    np.testing.assert_allclose(got, ref, **tol)


def test_gradients_within_mode_envelope(seldot_mode):
    cams = make_cams(n_det=64)
    xyz, scales, rots, dens = random_gaussians(150, seed=3)
    target = jnp.ones((64, 64), jnp.float32) * 0.3

    def loss(render_fn, xyz, scales, rots, dens):
        prep = prep_for(cams, xyz, scales, rots, dens)
        img = render_fn(prep)
        return jnp.mean((img - target) ** 2)

    dense_fn = lambda p: render_dense(p, width=cams.width, height=cams.height)
    pallas_fn = lambda p: render_pallas(
        p, width=cams.width, height=cams.height,
        config=SplatConfig(tiers=((64, 48),), dense_cap=512, dense_chunk=256),
    )
    g_ref = jax.grad(loss, argnums=(1, 2, 3, 4))(dense_fn, xyz, scales, rots, dens)
    g_got = jax.grad(loss, argnums=(1, 2, 3, 4))(pallas_fn, xyz, scales, rots, dens)
    scale_tol = 2e-4 if seldot_mode == "split2" else 3e-2
    for ref, got in zip(g_ref, g_got):
        ref, got = np.asarray(ref), np.asarray(got)
        assert np.isfinite(got).all()
        # gradients span orders of magnitude; gate on the relative L2 error
        denom = max(float(np.linalg.norm(ref)), 1e-12)
        rel = float(np.linalg.norm(got - ref)) / denom
        assert rel < scale_tol, (rel, scale_tol)
