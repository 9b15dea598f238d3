"""Regression tests for the chest-run TV NaN (round-4 root cause).

The flagship chest run hit one non-finite forward loss in 30k steps
(output/chest_cone_50/snapshot_fw.npz: l1/dssim finite, tv = NaN).
dev/nan_fuzz.py reproduced the class deterministically: a rotated
near-degenerate covariance (thin axis ~1e-5..1e-8 of the fat axes) makes
the f32 conic inversion produce (a) inf entries when det lands in the
denormal range, or (b) finite-but-INDEFINITE entries (negative diagonal).
Pre-fix consequences, all fixed at the source:

  - forward: build_lowrank_features3 spilled such rows (wq=0) but left
    NaN in the other features -> 0 * NaN = NaN through the factor matmul
    -> the whole TV box NaN (models/voxel_preprocess.py conditioning +
    PD gate; feature gating on valid & ~spill in ops/splat3d.py)
  - backward: indefinite ia < 0 clamped to the 1e-20 floor made
    autodiff's ib^2/iaq^2 division partial inf; 0-cotangent * inf = NaN
    poisoning every gradient in the dispatch (PD gate + 1e-12 floor)
  - backward: the direct kernels computed where(ok, gcol, 0) * alpha
    with alpha = w*exp(power) inf on masked voxels -> 0 * inf = NaN
    (reordered to where(ok, gcol * alpha, 0) in ops/splat2d.py and
    ops/splat3d.py; exp clamped in the autodiff'd dense oracle paths)

Reference analog: the CUDA forward only guards det == 0
(cuda_voxelizer/forward.cu) and renders indefinite garbage; culling
ill-conditioned rows is a deliberate, documented deviation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from r2_gaussian_tpu.models.render import cov3d_components, query
from r2_gaussian_tpu.models.voxel_preprocess import voxel_preprocess
from r2_gaussian_tpu.models import preprocess as prep2d
from r2_gaussian_tpu.ops.splat3d import build_lowrank_features3
from r2_gaussian_tpu.utils.losses import tv_3d_loss


def degenerate_cloud(sx, n=128, n_active=8):
    """n-row cloud whose row 0 is a rotated thin-axis gaussian (the NaN
    trigger class) amid healthy rows; only the first n_active are active."""
    xyz = np.zeros((n, 3), np.float32)
    xyz[0] = [0.01, 0.02, -0.01]
    scales = np.full((n, 3), 0.05, np.float32)
    scales[0] = [sx, 0.3, 0.25]
    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0
    c, s = np.cos(np.pi / 8), np.sin(np.pi / 8)
    rots[0] = [c * np.cos(np.pi / 12), 0.0, np.sin(np.pi / 12) * c, s]
    rots[0] /= np.linalg.norm(rots[0])
    dens = np.full((n,), 0.5, np.float32)
    active = np.zeros((n,), bool)
    active[:n_active] = True
    return (jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(rots),
            jnp.asarray(dens), jnp.asarray(active))


S_VOXEL = jnp.asarray([0.25, 0.25, 0.25], jnp.float32)
CENTER = jnp.zeros(3, jnp.float32)


def _prep_of(xyz, scales, rots, dens, active=None):
    cov3d = cov3d_components(scales, rots)
    ms = jnp.max(scales, axis=-1)
    return voxel_preprocess(xyz, cov3d, ms, dens, center=CENTER,
                            n_voxel=(32,) * 3, s_voxel=S_VOXEL, active=active)


def test_preprocess_culls_degenerate_conics():
    """Denormal-det and indefinite conics are culled with neutralized
    entries — nothing non-finite or indefinite escapes the preprocess."""
    for sx in (4e-5, 1e-6, 1e-8):
        xyz, scales, rots, dens, active = degenerate_cloud(sx)
        p = _prep_of(xyz, scales, rots, dens)
        for f in p._fields:
            v = np.asarray(getattr(p, f))
            assert np.isfinite(v).all(), (sx, f)
        # every weight>0 row satisfies the PD minors the gate enforces
        w = np.asarray(p.weight) > 0
        ia, ib, ic = np.asarray(p.ia), np.asarray(p.ib), np.asarray(p.ic)
        id_, ie, if_ = np.asarray(p.id_), np.asarray(p.ie), np.asarray(p.if_)
        assert (ia[w] > 0).all() and (id_[w] > 0).all() and (if_[w] > 0).all()
        assert (ia[w] * id_[w] > ib[w] ** 2).all()
        # culled rows carry the neutral identity conic
        assert (ia[~w] == 1.0).all() and (ib[~w] == 0.0).all()


def test_lowrank_features_finite_with_degenerate_rows():
    """build_lowrank_features3 values AND vjp stay finite when the input
    cloud contains the degenerate trigger rows (pre-fix: NaN features on
    spilled rows / NaN partials through the iaq clamp)."""
    xyz, scales, rots, dens, active = degenerate_cloud(1e-6)

    def f(scales, rots):
        feats, _ = build_lowrank_features3(_prep_of(xyz, scales, rots, dens))
        return sum(jnp.sum(x) for x in feats)

    val, grads = jax.value_and_grad(f, argnums=(0, 1))(scales, rots)
    assert np.isfinite(float(val))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("tv_kernel", ["lowrank", "direct"])
def test_query_gather_fwd_bwd_finite_with_degenerate_rows(tv_kernel):
    """The production TV gather path (the chest-run NaN site): forward
    volume, tv loss, and all input grads finite across the degenerate
    sweep. gather_cap=128 forces the gather fast path at test-sized n
    (the trainer's n = capacity >> GATHER_CAP takes the same code)."""
    xyz, scales, rots, dens, active = degenerate_cloud(1e-6, n=256)

    def f(xyz, scales, rots, dens):
        out = query(xyz, scales, rots, dens, center=CENTER,
                    n_voxel=(32,) * 3, s_voxel=S_VOXEL, active=active,
                    backend="pallas", gather_cap=128, gather_bcap=8,
                    tv_kernel=tv_kernel)
        return tv_3d_loss(out["vol"], reduction="mean"), out["vol"]

    (tv, vol), grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3),
                                          has_aux=True)(xyz, scales, rots,
                                                        dens)
    assert np.isfinite(float(tv))
    assert np.isfinite(np.asarray(vol)).all()
    for name, g in zip(("xyz", "scales", "rots", "dens"), grads):
        assert np.isfinite(np.asarray(g)).all(), name


def test_render2d_preprocess_culls_degenerate_conics():
    """The 2D EWA preprocess applies the same conditioning + PD gate."""
    n = 32
    xyz = np.zeros((n, 3), np.float32)
    xyz[:, 2] = 0.0
    scales = np.full((n, 3), 0.05, np.float32)
    scales[0] = [1e-7, 0.3, 0.25]
    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0
    c, s = np.cos(np.pi / 8), np.sin(np.pi / 8)
    rots[0] = [c, 0.0, s * 0.4, s]
    rots[0] /= np.linalg.norm(rots[0])
    dens = np.full((n,), 0.5, np.float32)

    # a simple cone camera (helper conventions from tests/test_forward_math)
    from r2_gaussian_tpu.dataset.geometry import build_cameras
    from r2_gaussian_tpu.models.preprocess import preprocess
    from r2_gaussian_tpu.models.render import cov3d_components

    scanner = {
        "mode": "cone", "DSD": 7.0, "DSO": 5.0,
        "nDetector": [64, 64], "sDetector": [2.0, 2.0],
        "nVoxel": [64, 64, 64], "sVoxel": [2.0, 2.0, 2.0],
        "offOrigin": [0.0, 0.0, 0.0], "offDetector": [0.0, 0.0],
    }
    cams = build_cameras([0.3], np.zeros((1, 64, 64), np.float32), ["t"],
                         scanner)
    cov3d = cov3d_components(jnp.asarray(scales), jnp.asarray(rots))
    p = preprocess(
        jnp.asarray(xyz), cov3d, jnp.asarray(dens),
        jnp.asarray(cams.w2c[0]), jnp.asarray(cams.full_proj[0]),
        width=64, height=64, tanfovx=float(cams.tanfovx),
        tanfovy=float(cams.tanfovy), mode=1,
    )
    cxx, cxy, cyy = (np.asarray(p.cxx), np.asarray(p.cxy), np.asarray(p.cyy))
    w = np.asarray(p.weight) > 0
    assert np.isfinite(cxx).all() and np.isfinite(cxy).all() \
        and np.isfinite(cyy).all()
    # every row is either a genuine PD conic (valid rows, and rows culled
    # only by mu == 0) or the neutral identity (rows culled by the gate)
    assert (cxx > 0).all() and (cyy > 0).all()
    assert (cxx * cyy > cxy ** 2).all()
    assert w.any()  # the healthy rows do render
