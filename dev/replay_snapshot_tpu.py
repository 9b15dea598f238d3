"""Replay a --debug dispatch snapshot ON THE TPU with the production pallas
backend, one step at a time, to find the exact step where the non-finite
loss appears; dump the pre-step state and instrument the TV query of the
offending step (lowrank vs spill vs overflow parts, factor ranges).

Usage: python dev/replay_snapshot_tpu.py <snapshot_fw.npz> <source_path>
"""
import sys
import os.path as osp
import types

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

import numpy as np
import jax
import jax.numpy as jnp
import yaml
import os.path as osp

from r2_gaussian_tpu.dataset.scene import Scene
from r2_gaussian_tpu.models.gaussians import (GaussianParams, GaussianAux,
                                              activate)
from r2_gaussian_tpu.pipeline.trainer import Trainer

snap_path, source_path = sys.argv[1], sys.argv[2]
snap = np.load(snap_path)
scene = Scene(source_path, "/tmp/replay_tpu_out", eval_split=True)

params = GaussianParams(
    xyz=jnp.asarray(snap["xyz"]), scaling=jnp.asarray(snap["scaling"]),
    rotation=jnp.asarray(snap["rotation"]), density=jnp.asarray(snap["density"]),
)
aux = GaussianAux(
    active=jnp.asarray(snap["active"]),
    max_radii2d=jnp.asarray(snap["max_radii2d"]),
    xyz_gradient_accum=jnp.asarray(snap["xyz_gradient_accum"]),
    denom=jnp.asarray(snap["denom"]),
)
sb = tuple(snap["scale_bound"]) if snap["scale_bound"].size else None
views = snap["views"]
keys = jnp.asarray(snap["keys"])
skip = jnp.asarray(snap["skip"])
metrics_rec = snap["metrics"]
bad_rec = np.flatnonzero(~np.isfinite(metrics_rec).all(axis=1))
print(f"recorded non-finite rows: {bad_rec.tolist()}", flush=True)

cfg = yaml.safe_load(open(osp.join(osp.dirname(snap_path), "cfg_args.yml")))
opt = types.SimpleNamespace(**cfg)
tr = Trainer(scene.train_cameras, scene.scanner_cfg, opt, sb, params, aux,
             backend="pallas")
fn = tr._get_train_fn(1)
state = tr.state
iter0 = int(snap["iteration"])
prev_params = None
for k in range(len(views)):
    prev_params = jax.tree.map(np.asarray, state.params)
    state, m = fn(state, jnp.asarray(views[k:k + 1]), keys[k:k + 1],
                  skip[k:k + 1], jnp.int32(iter0 + k))
    m = np.asarray(m)[0]
    if k % 10 == 0 or not np.isfinite(m).all():
        print(f"step {k} (view {views[k]}): total {m[0]:.6g} l1 {m[1]:.6g} "
              f"dssim {m[2]:.6g} tv {m[3]:.6g} n_vis {m[4]:.0f}"
              f"{'' if np.isfinite(m).all() else '   <-- NON-FINITE'}",
              flush=True)
    if not np.isfinite(m).all():
        out = osp.join(osp.dirname(snap_path), f"state_step{k}.npz")
        np.savez_compressed(
            out, key=np.asarray(keys[k]), view=views[k], step=k,
            active=np.asarray(state.aux.active),
            scale_bound=snap["scale_bound"], **prev_params._asdict())
        print(f"pre-step params dumped to {out}", flush=True)

        # instrument the TV query of this step
        from r2_gaussian_tpu.models.voxel_preprocess import voxel_preprocess
        from r2_gaussian_tpu.models.render import cov3d_components, query
        from r2_gaussian_tpu.ops import splat3d

        pp = GaussianParams(**{f: jnp.asarray(v) for f, v in
                               prev_params._asdict().items()})
        xyz, scales, rots, dens = activate(pp, sb)
        sc_cfg = scene.scanner_cfg
        tv_n = int(cfg["tv_vol_size"])
        d_vox = np.asarray(sc_cfg["dVoxel"], np.float32)
        tv_sv = jnp.asarray(d_vox * tv_n)
        off = np.asarray(sc_cfg["offOrigin"], np.float32)
        s_vox = np.asarray(sc_cfg["sVoxel"], np.float32)
        lo = jnp.asarray(off - s_vox / 2)
        hi = jnp.asarray(off + s_vox / 2)
        u = jax.random.uniform(keys[k], (3,))
        center = (lo + tv_sv / 2) + (hi - tv_sv - lo) * u
        print("tv center:", np.asarray(center), flush=True)
        act = state.aux.active

        r = query(xyz, scales, rots, dens, center=center,
                  n_voxel=(tv_n,) * 3, s_voxel=tv_sv, active=act,
                  backend="pallas")
        vol = np.asarray(r["vol"])
        print(f"query vol: finite={np.isfinite(vol).all()} "
              f"nan={np.isnan(vol).sum()} inf={np.isinf(vol).sum()} "
              f"max={np.nanmax(vol):.4e}", flush=True)

        cov3d = cov3d_components(scales, rots)
        ms = jnp.max(scales, axis=-1)
        prep = voxel_preprocess(xyz, cov3d, ms, dens, center=center,
                                n_voxel=(tv_n,) * 3, s_voxel=tv_sv,
                                active=act)
        feats, spill = splat3d.build_lowrank_features3(prep)
        w = np.asarray(prep.weight)
        selv = w > 0
        spill = np.asarray(spill)
        names = ["cx", "cy", "cz", "kx", "sbf", "scf", "pyy", "pyz", "pzz",
                 "wq"]
        print(f"candidates {selv.sum()}, spilled {spill.sum()}", flush=True)
        for nm, f in zip(names, feats):
            fv = np.asarray(f)
            a, s = fv[selv], fv[spill] if spill.any() else fv[:0]
            print(f"  {nm}: valid[min {a.min():.3e} max {a.max():.3e} "
                  f"finite {np.isfinite(a).all()}]"
                  + (f" spilled[min {s.min():.3e} max {s.max():.3e}]"
                     if s.size else ""), flush=True)
        # worst-case W-side magnitude proxy per spilled row: |sh|max ~
        # (|sb| + |sc|) * lane radius; He_K(sh) ~ sh^K
        sbf, scf = np.asarray(feats[4]), np.asarray(feats[5])
        shmax = (np.abs(sbf) + np.abs(scf)) * tv_n * np.sqrt(2)
        k3 = splat3d.K_3D - 1
        with np.errstate(over="ignore"):
            he_proxy = shmax ** k3
        print(f"  max |sh| valid {shmax[selv].max():.3e} "
              f"-> He proxy {he_proxy[selv].max():.3e}", flush=True)
        if spill.any():
            print(f"  max |sh| spilled {shmax[spill].max():.3e} "
                  f"-> He proxy {he_proxy[spill].max():.3e} "
                  f"(inf here + wq=0 => 0*inf = NaN in the MXU matmul)",
                  flush=True)
        break
else:
    print("dispatch replayed with NO non-finite metrics", flush=True)
