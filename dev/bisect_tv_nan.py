"""Bisect the chest-run TV NaN inside the REAL query gather path.

dev/repro_tv_nan.py (hand compaction, sel = weight>0) is finite on the same
state/box, while the full-dispatch replay NaNs -> the defect lives in the
difference: voxel_touch_mask + compact_lanes + per-stage kernels as wired by
models.render.query. This script runs query() exactly as the trainer's
loss_fn does (full padded buffers, pallas backend, interpret on CPU) and then
toggles one stage at a time.

Usage: python dev/bisect_tv_nan.py <snapshot_fw.npz>
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

from r2_gaussian_tpu.models.gaussians import GaussianParams, activate
from r2_gaussian_tpu.models.render import query
from r2_gaussian_tpu.models.voxel_preprocess import (voxel_preprocess,
                                                     voxel_touch_mask)
from r2_gaussian_tpu.models.render import cov3d_components
from r2_gaussian_tpu.ops import splat3d
from r2_gaussian_tpu.ops.compaction import G, compact_lanes
from r2_gaussian_tpu.utils.losses import tv_3d_loss

snap = np.load(sys.argv[1])
params = GaussianParams(
    xyz=jnp.asarray(snap["xyz"]), scaling=jnp.asarray(snap["scaling"]),
    rotation=jnp.asarray(snap["rotation"]),
    density=jnp.asarray(snap["density"]),
)
active = jnp.asarray(snap["active"])
sb = tuple(snap["scale_bound"]) if snap["scale_bound"].size else None
metrics = snap["metrics"]
bad = int(np.flatnonzero(~np.isfinite(metrics).all(axis=1))[0])
key = jnp.asarray(snap["keys"])[bad]

# trainer-identical box (chest case: 256^3, sVoxel 2.0, offOrigin 0)
tv_n = 32
s_vox = np.asarray([2.0, 2.0, 2.0], np.float32)
n_vox = np.asarray([256.0] * 3, np.float32)
off = np.zeros(3, np.float32)
d_voxel = s_vox / n_vox
tv_s_voxel = jnp.asarray(d_voxel * tv_n)
bbox_lo = jnp.asarray(off - s_vox / 2)
bbox_hi = jnp.asarray(off + s_vox / 2)
u = jax.random.uniform(key, (3,))
center = (bbox_lo + tv_s_voxel / 2) + (bbox_hi - tv_s_voxel - bbox_lo) * u
print("center:", np.asarray(center))

xyz, scales, rots, dens = activate(params, sb)

# 1. the real thing
out = query(xyz, scales, rots, dens, center=center,
            n_voxel=(tv_n,) * 3, s_voxel=tv_s_voxel, active=active,
            backend="pallas")
vol = np.asarray(out["vol"])
print(f"[1] full query: finite={np.isfinite(vol).all()} "
      f"min={np.nanmin(vol):.4e} max={np.nanmax(vol):.4e} "
      f"nan_count={np.isnan(vol).sum()}")
print(f"    tv={float(np.asarray(tv_3d_loss(jnp.asarray(vol)))):.6f}")

# 2. stage replication with the real compaction kernel
cov3d = cov3d_components(scales, rots)
max_scale = jnp.max(scales, axis=-1)
n = xyz.shape[0]
dens1 = dens.reshape(n)
touch = voxel_touch_mask(xyz, max_scale, center=center,
                         n_voxel=(tv_n,) * 3, s_voxel=tv_s_voxel,
                         active=active)
print(f"[2] touch count: {int(np.asarray(touch).sum())}")
comps_raw = [xyz[:, 0], xyz[:, 1], xyz[:, 2], *cov3d, max_scale, dens1]
pad = (-n) % G
if pad:
    comps_raw = [jnp.concatenate([c, jnp.zeros((pad,), c.dtype)])
                 for c in comps_raw]
    touch_p = jnp.concatenate([touch, jnp.zeros((pad,), bool)])
else:
    touch_p = touch
ctr = jnp.asarray(center, jnp.float32)
rot = jax.lax.stop_gradient(
    (jnp.sum(jnp.abs(ctr)) * 7919.0).astype(jnp.int32))
sub, handled = compact_lanes(comps_raw, touch_p, ocap=splat3d.GATHER_CAP,
                             bcap=splat3d.GATHER_BCAP, rotate=rot)
print(f"    handled: {int(np.asarray(handled).sum())}, "
      f"leftover: {int(np.asarray(touch_p & ~handled).sum())}")
for nm, c in zip("x y z sxx sxy sxz syy syz szz ms dens".split(), sub):
    c = np.asarray(c)
    print(f"    sub {nm}: finite={np.isfinite(c).all()} "
          f"min={np.nanmin(c):.4e} max={np.nanmax(c):.4e}")

xyz_sub = jnp.stack(sub[0:3], axis=-1)
cov_sub = tuple(sub[3:9])
prep_sub = voxel_preprocess(xyz_sub, cov_sub, sub[9], sub[10],
                            center=center, n_voxel=(tv_n,) * 3,
                            s_voxel=tv_s_voxel, active=None)
pw = np.asarray(prep_sub.weight)
print(f"[3] prep_sub weight>0: {(pw > 0).sum()}, finite={np.isfinite(pw).all()}")
for nm in ("cx", "cy", "cz", "ia", "ib", "ic", "id_", "ie", "if_"):
    v = np.asarray(getattr(prep_sub, nm))
    vw = v[pw > 0]
    print(f"    prep {nm}: all-finite={np.isfinite(v).all()} "
          f"valid-finite={np.isfinite(vw).all() if vw.size else '-'} "
          f"max|all|={np.nanmax(np.abs(v)):.4e}")

vol_lr, spill3 = splat3d.voxelize_lowrank(prep_sub, n_voxel=(tv_n,) * 3)
vol_lr = np.asarray(vol_lr)
print(f"[4] lowrank vol: finite={np.isfinite(vol_lr).all()} "
      f"nan={np.isnan(vol_lr).sum()}")
prep_spill = prep_sub._replace(
    weight=jnp.where(spill3, prep_sub.weight, 0.0))
vol_sp = np.asarray(splat3d.voxelize_pallas(
    prep_spill, n_voxel=(tv_n,) * 3, window_x=16, window_y=16))
print(f"[5] spill vol: finite={np.isfinite(vol_sp).all()} "
      f"nan={np.isnan(vol_sp).sum()} spilled={int(np.asarray(spill3).sum())}")

# 6. overflow branch
leftover = np.asarray(touch_p[:n] & ~handled[:n])
if leftover.any():
    prep_full = voxel_preprocess(xyz, cov3d, max_scale, dens1, center=ctr,
                                 n_voxel=(tv_n,) * 3, s_voxel=tv_s_voxel,
                                 active=jnp.asarray(leftover))
    vol_of = np.asarray(splat3d.voxelize_pallas(prep_full, n_voxel=(tv_n,) * 3))
    print(f"[6] overflow vol: finite={np.isfinite(vol_of).all()} "
          f"nan={np.isnan(vol_of).sum()}")
else:
    print("[6] overflow branch not taken")
