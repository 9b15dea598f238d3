"""TPU-gated regressions for the two round-3 hardware-only failure classes
on the evaluation path (ARCHITECTURE.md "Round-3 findings"):

1. the batched eval render (`render_views`): a lax.scan over chunked views
   whose pallas output must stay in HBM (scoped-VMEM fusion OOM at 512^2),
   combined with active-row compaction at padded training capacities —
   compaction must not change the rendered images;
2. the z-slab full-volume query (`query_volume`) at 256^3: the whole-grid
   single dispatch OOMs scoped VMEM on v5e (64 MB accumulator), so eval
   chunks z-slabs — slab seams must be exact (8-voxel-aligned block
   quantization) and the full 256^3 must execute on hardware.

Both previously compiled fine on CPU/interpret and only failed on the real
Mosaic/XLA:TPU lowering, so the CPU suite cannot guard them. Reference
analog: test.py's full-volume query + per-view render loop (test.py:93-148).
"""

import numpy as np
import jax.numpy as jnp

from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.render import query_volume, render, render_views
from r2_gaussian_tpu.ops import splat2d as _splat2d

# render_views and render dispatch the same kernels but group rows
# differently, so under the reduced-precision selector-dot modes (split2
# default since round 5, ~2^-17 payload rounding per pass) the two paths
# accumulate different roundings; `highest` is exact 6-pass f32.
_RENDER_TOL = 1e-5 if _splat2d._SELDOT == "highest" else 5e-4


def _population(n, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
    scales = rng.uniform(0.01, 0.05, (n, 3)).astype(np.float32)
    rots = rng.standard_normal((n, 4)).astype(np.float32)
    rots /= np.linalg.norm(rots, axis=1, keepdims=True)
    dens = rng.uniform(0.05, 1.0, n).astype(np.float32)
    return xyz, scales, rots, dens


def _cams(n_views=10, det=512):
    scanner = dict(
        nVoxel=[256, 256, 256], sVoxel=[2.0, 2.0, 2.0],
        nDetector=[det, det], sDetector=[4.0, 4.0],
        DSD=7.0, DSO=5.0, offOrigin=[0.0, 0.0, 0.0],
        offDetector=[0.0, 0.0], mode="cone",
        dVoxel=[2.0 / 256] * 3, dDetector=[4.0 / det] * 2,
        accuracy=0.5, totalAngle=360.0, startAngle=0.0,
    )
    angles = np.linspace(0, 2 * np.pi, n_views + 1)[:-1]
    projs = np.zeros((n_views, det, det), np.float32)
    return build_cameras(angles, projs, [str(i) for i in range(n_views)],
                         scanner), scanner


def test_eval_render_compaction_at_padded_capacity():
    """render_views on a capacity-padded state (16k live rows scattered in a
    65k buffer) must equal per-view render() at full capacity: the active-row
    gather (8192-granular padding) and the chunked scan must not change
    values. Runs at the production 512^2 detector shape."""
    n_act, cap = 16384, 65536
    xyz, scales, rots, dens = _population(n_act, seed=1)
    rng = np.random.default_rng(7)
    # scatter the live rows through the padded buffer (post-densify states
    # are prefix-compacted, but the gather must not rely on that)
    perm = np.sort(rng.choice(cap, n_act, replace=False))
    big = lambda a, fill: np.full((cap,) + a.shape[1:], fill, a.dtype)
    xyz_p = big(xyz, 0.0); xyz_p[perm] = xyz
    sc_p = big(scales, 1e-3); sc_p[perm] = scales
    rot_p = big(rots, 0.0); rot_p[:, 0] = 1.0; rot_p[perm] = rots
    den_p = big(dens, 0.0); den_p[perm] = dens
    active = np.zeros(cap, bool); active[perm] = True

    cams, _ = _cams(n_views=10)
    out = render_views(
        jnp.asarray(xyz_p), jnp.asarray(sc_p), jnp.asarray(rot_p),
        jnp.asarray(den_p), cams, active=jnp.asarray(active),
        backend="pallas", chunk=4, footprint="tight", kernel="auto",
    )
    assert out.shape == (10, 512, 512)
    assert np.isfinite(out).all()

    # reference: single-view render at full capacity, no compaction
    for v in (0, 7):
        ref = render(
            jnp.asarray(xyz_p), jnp.asarray(sc_p), jnp.asarray(rot_p),
            jnp.asarray(den_p), w2c=jnp.asarray(cams.w2c[v]),
            full_proj=jnp.asarray(cams.full_proj[v]),
            width=cams.width, height=cams.height,
            tanfovx=cams.tanfovx, tanfovy=cams.tanfovy, mode=cams.mode,
            active=jnp.asarray(active), backend="pallas",
            footprint="tight", kernel="auto",
        )["render"]
        ref = np.asarray(ref)
        scale = max(ref.max(), 1e-9)
        assert np.abs(out[v] - ref).max() / scale < _RENDER_TOL, v


def test_query_volume_256_z_slabs_on_hardware():
    """The full 256^3 eval query must execute on the real chip (the
    unchunked dispatch OOMs scoped VMEM) and slab seams must be exact:
    slab=32 vs slab=64 agree to f32 accumulation tolerance."""
    xyz, scales, rots, dens = _population(4096, seed=2)
    kw = dict(center=(0.0, 0.0, 0.0), s_voxel=(2.0, 2.0, 2.0),
              backend="pallas")
    v32 = np.asarray(query_volume(
        jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(rots),
        jnp.asarray(dens), n_voxel=(256, 256, 256), slab=32, **kw))
    assert v32.shape == (256, 256, 256)
    assert np.isfinite(v32).all()
    assert v32.max() > 0.0
    v64 = np.asarray(query_volume(
        jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(rots),
        jnp.asarray(dens), n_voxel=(256, 256, 256), slab=64, **kw))
    scale = max(v32.max(), 1e-9)
    assert np.abs(v32 - v64).max() / scale < 1e-5
