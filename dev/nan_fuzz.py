"""Fuzz the TV query path for forward/backward NaN with extreme gaussians.

Hypothesised chest-run NaN mechanism (round-4): a valid (weight > 0) row
whose f32 determinant lands in the denormal range -> inv_det = inf ->
non-finite conic entries; build_lowrank_features3 spills the row (wq = 0)
but the other features keep the NaN, and the lowrank MXU matmul computes
0 * NaN = NaN into the whole box. Also probes the direct kernels' backward
0*inf path. Usage: python dev/nan_fuzz.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

import numpy as np
import jax
import jax.numpy as jnp

from r2_gaussian_tpu.models.render import query
from r2_gaussian_tpu.utils.losses import tv_3d_loss


def probe(sx, rot45=False, n_pad=256):
    """One crafted near-degenerate gaussian inside a 32^3 TV box, plus
    padding rows, through query fwd + grad."""
    n = n_pad
    xyz = np.zeros((n, 3), np.float32)
    xyz[0] = [0.01, 0.02, -0.01]
    scales = np.full((n, 3), 0.05, np.float32)
    scales[0] = [sx, 0.3, 0.25]
    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0
    if rot45:
        # 45deg about z then 30deg about y: mixes the tiny axis into all
        # entries -> maximal cancellation in the cofactor arithmetic
        c, s = np.cos(np.pi / 8), np.sin(np.pi / 8)
        rots[0] = [c * np.cos(np.pi / 12), 0.0, np.sin(np.pi / 12) * c, s]
        rots[0] /= np.linalg.norm(rots[0])
    dens = np.full((n, 1), 0.5, np.float32)
    active = np.zeros((n,), bool)
    active[:8] = True

    tv_n = 32
    s_voxel = jnp.asarray([0.25, 0.25, 0.25], jnp.float32)
    center = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)

    def f(xyz, scales, rots, dens):
        # gather_cap=128 forces the production gather fast path (the
        # trainer's n=capacity >> GATHER_CAP) at fuzz-sized n
        out = query(xyz, scales, rots, dens, center=center,
                    n_voxel=(tv_n,) * 3, s_voxel=s_voxel,
                    active=jnp.asarray(active), backend="pallas",
                    gather_cap=128, gather_bcap=8)
        return tv_3d_loss(out["vol"], reduction="mean"), out["vol"]

    (tv, vol), grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3),
                                          has_aux=True)(
        jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(rots),
        jnp.asarray(dens))
    gfin = all(bool(np.isfinite(np.asarray(g)).all()) for g in grads)
    return (float(tv), bool(np.isfinite(np.asarray(vol)).all()), gfin)


bad = []
for rot45 in (False, True):
    for sx in np.logspace(-1, -8, 36):
        tv, vfin, gfin = probe(float(sx), rot45)
        tag = "" if (vfin and gfin and np.isfinite(tv)) else "  <-- NON-FINITE"
        if tag:
            bad.append((float(sx), rot45, tv, vfin, gfin))
        print(f"sx={sx:.3e} rot45={rot45}: tv={tv:.6e} vol_finite={vfin} "
              f"grads_finite={gfin}{tag}")
print(f"\n{len(bad)} non-finite configs")
for b in bad[:10]:
    print("  ", b)
