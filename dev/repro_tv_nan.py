"""Localize the chest-run TV NaN (output/chest_cone_50/snapshot_fw.npz).

The full-dispatch replay (dev/replay_snapshot.py) showed: l1/dssim finite,
tv = NaN at one step -> the NaN is in the 3D TV query path. This script
reconstructs the exact random 32^3 sub-volume of the offending step and runs
the query pipeline stage by stage on CPU (plain jnp for the preprocess;
pallas interpret for the kernels, on the compacted candidate set), printing
where the first non-finite value appears.

Usage: python dev/repro_tv_nan.py <snapshot_fw.npz> [cfg_args.yml]
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
import yaml
import os.path as osp

from r2_gaussian_tpu.models.gaussians import GaussianParams, activate
from r2_gaussian_tpu.models.voxel_preprocess import (voxel_preprocess,
                                                     voxel_touch_mask)
from r2_gaussian_tpu.models.render import cov3d_components
from r2_gaussian_tpu.ops import splat3d
from r2_gaussian_tpu.utils.losses import tv_3d_loss

snap_path = sys.argv[1]
cfg_path = (sys.argv[2] if len(sys.argv) > 2
            else osp.join(osp.dirname(snap_path), "cfg_args.yml"))
snap = np.load(snap_path)
cfg = yaml.safe_load(open(cfg_path))

params = GaussianParams(
    xyz=jnp.asarray(snap["xyz"]), scaling=jnp.asarray(snap["scaling"]),
    rotation=jnp.asarray(snap["rotation"]), density=jnp.asarray(snap["density"]),
)
active = np.asarray(snap["active"])
sb = tuple(snap["scale_bound"]) if snap["scale_bound"].size else None
metrics = snap["metrics"]
bad = int(np.flatnonzero(~np.isfinite(metrics).all(axis=1))[0])
key = jnp.asarray(snap["keys"])[bad]
print(f"bad step row {bad}, metrics {metrics[bad]}")

# reconstruct the TV box exactly as build_train_fn does
tv_n = int(cfg["tv_vol_size"])
d_voxel = np.asarray(cfg.get("dVoxel", [2.0 / 256] * 3), np.float32)
# dVoxel isn't in cfg_args: derive from the scanner the way Scene does
src = cfg.get("source_path", "")
import json
meta = json.load(open(osp.join(src, "meta_data.json"))) if osp.exists(
    osp.join(src, "meta_data.json")) else None
if meta is not None:
    sc = meta["scanner"]
    s_vox = np.asarray(sc["sVoxel"], np.float32)
    n_vox = np.asarray(sc["nVoxel"], np.float32)
    off = np.asarray(sc["offOrigin"], np.float32)
else:
    s_vox = np.asarray([2.0, 2.0, 2.0], np.float32)
    n_vox = np.asarray([256.0] * 3, np.float32)
    off = np.zeros(3, np.float32)
d_voxel = s_vox / n_vox
tv_s_voxel = jnp.asarray(d_voxel * tv_n)
bbox_lo = jnp.asarray(off - s_vox / 2)
bbox_hi = jnp.asarray(off + s_vox / 2)
u = jax.random.uniform(key, (3,))
center = (bbox_lo + tv_s_voxel / 2) + (bbox_hi - tv_s_voxel - bbox_lo) * u
print("tv box center:", np.asarray(center))

xyz, scales, rots, dens = activate(params, sb)
act = jnp.asarray(active)
cov3d = cov3d_components(scales, rots)
max_scale = jnp.max(scales, axis=-1)

names6 = ["sxx", "sxy", "sxz", "syy", "syz", "szz"]
for nm, c in zip(names6, cov3d):
    c = np.asarray(c)[active]
    print(f"cov {nm}: finite={np.isfinite(c).all()} "
          f"min={c.min():.3e} max={c.max():.3e}")

prep = voxel_preprocess(xyz, cov3d, max_scale, dens, center=center,
                        n_voxel=(tv_n,) * 3, s_voxel=tv_s_voxel, active=act)
pa = {k: np.asarray(getattr(prep, k)) for k in
      ("cx", "cy", "cz", "ia", "ib", "ic", "id_", "ie", "if_", "weight")}
sel = pa["weight"] > 0
print(f"candidates in box: {sel.sum()}")
for k, v in pa.items():
    vv = v[sel]
    if vv.size:
        print(f"prep {k}: finite={np.isfinite(vv).all()} "
              f"min={vv.min():.4e} max={vv.max():.4e}")

feats, spill = splat3d.build_lowrank_features3(prep)
spill = np.asarray(spill)
fnames = ["cx", "cy", "cz", "kx", "sb", "sc", "pyy", "pyz", "pzz", "wq"]
for nm, f in zip(fnames, feats):
    f = np.asarray(f)[sel]
    if f.size:
        print(f"lr3 {nm}: finite={np.isfinite(f).all()} "
              f"min={f.min():.4e} max={f.max():.4e}")
print(f"spilled rows: {spill[sel].sum()} / {sel.sum()}")

# exponent scan for the DIRECT kernel semantics on candidates: power =
# -0.5*(ia dx^2 + id dy^2 + if dz^2) - ib dx dy - ic dx dz - ie dy dz over
# the 3-sigma cube; positive power -> exp blowup in the exact path
idx = np.flatnonzero(sel)
worst = None
for i in idx:
    rx, ry, rz = (int(np.asarray(prep.rx)[i]), int(np.asarray(prep.ry)[i]),
                  int(np.asarray(prep.rz)[i]))
    cx, cy, cz = pa["cx"][i], pa["cy"][i], pa["cz"][i]
    xs = np.arange(max(0, int(np.floor(cx - rx))), min(tv_n, int(np.ceil(cx + rx)) + 1))
    ys = np.arange(max(0, int(np.floor(cy - ry))), min(tv_n, int(np.ceil(cy + ry)) + 1))
    zs = np.arange(max(0, int(np.floor(cz - rz))), min(tv_n, int(np.ceil(cz + rz)) + 1))
    if not (len(xs) and len(ys) and len(zs)):
        continue
    dx = (xs + 0.5 - cx)[:, None, None]
    dy = (ys + 0.5 - cy)[None, :, None]
    dz = (zs + 0.5 - cz)[None, None, :]
    power = (-0.5 * (pa["ia"][i] * dx * dx + pa["id_"][i] * dy * dy
                     + pa["if_"][i] * dz * dz)
             - pa["ib"][i] * dx * dy - pa["ic"][i] * dx * dz
             - pa["ie"][i] * dy * dz)
    pmax = float(power.max())
    if worst is None or pmax > worst[1]:
        worst = (i, pmax)
print(f"direct-path max exponent over candidates: row {worst[0]} "
      f"power_max={worst[1]:.4e} (positive => exp blowup)")
i = worst[0]
print(f"  offender: scales={np.asarray(scales)[i]}, dens={float(np.asarray(dens)[i]):.4e}, "
      f"weight={pa['weight'][i]:.4e}, spilled={bool(spill[i])}")
print(f"  conic inverse row: ia={pa['ia'][i]:.4e} ib={pa['ib'][i]:.4e} "
      f"ic={pa['ic'][i]:.4e} id={pa['id_'][i]:.4e} ie={pa['ie'][i]:.4e} "
      f"if={pa['if_'][i]:.4e}")

# now run the REAL kernels in interpret mode on the compacted candidates,
# mirroring the gather fast path (render.query with backend=pallas)
sub_idx = np.flatnonzero(sel)
xyz_sub = jnp.asarray(np.asarray(xyz)[sub_idx])
cov_sub = tuple(jnp.asarray(np.asarray(c)[sub_idx]) for c in cov3d)
ms_sub = jnp.asarray(np.asarray(max_scale)[sub_idx])
dn_sub = jnp.asarray(np.asarray(dens)[sub_idx])
prep_sub = voxel_preprocess(xyz_sub, cov_sub, ms_sub, dn_sub, center=center,
                            n_voxel=(tv_n,) * 3, s_voxel=tv_s_voxel,
                            active=None)
vol_lr, spill3 = splat3d.voxelize_lowrank(prep_sub, n_voxel=(tv_n,) * 3)
vol_lr = np.asarray(vol_lr)
print(f"lowrank vol: finite={np.isfinite(vol_lr).all()} "
      f"min={vol_lr.min():.4e} max={vol_lr.max():.4e}")
prep_spill = prep_sub._replace(
    weight=jnp.where(spill3, prep_sub.weight, 0.0))
vol_sp = np.asarray(splat3d.voxelize_pallas(prep_spill, n_voxel=(tv_n,) * 3,
                                            window_x=16, window_y=16))
print(f"spill (direct) vol: finite={np.isfinite(vol_sp).all()} "
      f"min={vol_sp.min():.4e} max={vol_sp.max():.4e}")
vol = vol_lr + vol_sp
tv = float(np.asarray(tv_3d_loss(jnp.asarray(vol))))
print(f"tv loss on reproduced box: {tv}")
