"""Replay a --debug dispatch snapshot (pipeline/trainer._dump_snapshot) on
CPU and localize the first non-finite value.

Usage: python dev/replay_snapshot.py <snapshot_fw.npz> <source_path>

Rebuilds the exact trainer state from the snapshot, re-runs the offending
dispatch step-by-step on the dense oracle backend with jax_debug_nans, and
prints per-part losses and state statistics so the NaN source (conic
inverse, footprint, SSIM, TV, Adam) can be pinned down.
"""
import sys

sys.path.insert(0, "/root/repo")
from r2_gaussian_tpu.utils.runtime import setup_jax_cache

import os; os.environ.setdefault("JAX_PLATFORMS", "cpu"); setup_jax_cache()

import numpy as np
import jax
import jax.numpy as jnp

from r2_gaussian_tpu.dataset.scene import Scene
from r2_gaussian_tpu.models.gaussians import GaussianParams, GaussianAux, activate
from r2_gaussian_tpu.pipeline.trainer import Trainer

snap_path, source_path = sys.argv[1], sys.argv[2]
snap = np.load(snap_path)
scene = Scene(source_path, "/tmp/replay_out", eval_split=True)

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
metrics = snap["metrics"]
bad = np.flatnonzero(~np.isfinite(metrics).all(axis=1))
print(f"iteration base {snap['iteration']}, views {views.tolist()}")
print(f"non-finite at dispatch rows {bad.tolist()}")
print(f"metrics rows (total l1 dssim tv n_vis):\n{metrics[max(0, bad[0]-2):bad[0]+1]}")

# state statistics (activated)
xyz, scales, rots, dens = activate(params, sb)
act = np.asarray(aux.active)
for name, v in [("xyz", xyz), ("scales", scales), ("dens", dens)]:
    a = np.asarray(v)[act]
    print(f"{name}: min {a.min(axis=0)}, max {a.max(axis=0)}, finite {np.isfinite(a).all()}")
sr = np.asarray(scales)[act]
print(f"scale anisotropy max/min per-gaussian: {float((sr.max(1) / sr.min(1)).max()):.3e}")

# replay the exact dispatch (same views/keys/skip) on the dense oracle,
# one step at a time. Adam moments aren't in the snapshot (fresh moments
# here) — the forward loss and grads don't depend on them.
import types

import yaml, os.path as osp

cfg = yaml.safe_load(open(osp.join(osp.dirname(snap_path), "cfg_args.yml")))
opt = types.SimpleNamespace(**cfg)
tr = Trainer(scene.train_cameras, scene.scanner_cfg, opt, sb, params, aux,
             backend="dense")
fn = tr._get_train_fn(1)
keys = jnp.asarray(snap["keys"])
skip = jnp.asarray(snap["skip"])
state = tr.state
iter0 = int(snap["iteration"])
for k, v in enumerate(views):
    state, m = fn(state, jnp.asarray(views[k:k + 1]),
                  keys[k:k + 1], skip[k:k + 1], jnp.int32(iter0 + k))
    m = np.asarray(m)[0]
    flag = "" if np.isfinite(m).all() else "   <-- NON-FINITE"
    print(f"step {k} (view {v}): total {m[0]:.6g} l1 {m[1]:.6g} "
          f"dssim {m[2]:.6g} tv {m[3]:.6g} n_vis {m[4]:.0f}{flag}")
    if not np.isfinite(m).all():
        # state after this step must still be finite (rejection)
        leaves = jax.tree.leaves(jax.tree.map(np.asarray, state.params))
        print("params finite after rejection:",
              all(np.isfinite(x).all() for x in leaves))
        break
