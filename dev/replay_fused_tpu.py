"""Replay a --debug dispatch snapshot ON THE TPU as the ORIGINAL fused
K-step dispatch (one jit, lax.fori_loop over all steps) — the compilation
the non-finite loss actually occurred in. K=1 replays can miss
fusion-dependent numerics (dev/replay_snapshot_tpu.py was clean on a
snapshot whose recorded K=100 metrics go NaN at row 48).

Usage: python dev/replay_fused_tpu.py <snapshot_fw.npz> <source_path>
"""
import sys
import os.path as osp
import types

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

import numpy as np
import jax.numpy as jnp
import yaml

from r2_gaussian_tpu.dataset.scene import Scene
from r2_gaussian_tpu.models.gaussians import GaussianParams, GaussianAux
from r2_gaussian_tpu.pipeline.trainer import Trainer

snap_path, source_path = sys.argv[1], sys.argv[2]
snap = np.load(snap_path)
scene = Scene(source_path, "/tmp/replay_fused_out", eval_split=True)

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
rec = snap["metrics"]
bad_rec = np.flatnonzero(~np.isfinite(rec).all(axis=1))
print(f"recorded non-finite rows: {bad_rec[:4].tolist()}"
      f"{'...' if len(bad_rec) > 4 else ''} ({len(bad_rec)} total)",
      flush=True)

cfg = yaml.safe_load(open(osp.join(osp.dirname(snap_path), "cfg_args.yml")))
opt = types.SimpleNamespace(**cfg)
tr = Trainer(scene.train_cameras, scene.scanner_cfg, opt, sb, params, aux,
             backend="pallas")
if "adam_step" in snap:  # newer snapshots carry the optimizer moments
    from r2_gaussian_tpu.pipeline.optim import AdamState

    fields = GaussianParams._fields
    tr.state = tr.state._replace(adam=AdamState(
        m=GaussianParams(**{f: jnp.asarray(snap[f"adam_m_{f}"])
                            for f in fields}),
        v=GaussianParams(**{f: jnp.asarray(snap[f"adam_v_{f}"])
                            for f in fields}),
        step=jnp.int32(snap["adam_step"]),
    ))
    print("restored Adam moments from snapshot", flush=True)
else:
    print("WARNING: snapshot predates Adam-moment capture; replay will "
          "diverge from the recorded trajectory after step 0", flush=True)
k = len(views)
fn = tr._get_train_fn(k)
state, metrics = fn(tr.state, jnp.asarray(views), keys, skip,
                    jnp.int32(int(snap["iteration"])))
metrics = np.asarray(metrics)
bad = np.flatnonzero(~np.isfinite(metrics).all(axis=1))
print(f"replayed non-finite rows: {bad[:4].tolist()}"
      f"{'...' if len(bad) > 4 else ''} ({len(bad)} total)", flush=True)
if len(bad):
    b = bad[0]
    print(f"first bad row {b}: {metrics[b]} (recorded: {rec[b]})", flush=True)
    print(f"rows around:\n{metrics[max(0, b - 2):b + 2]}", flush=True)
else:
    print("fused dispatch replayed with NO non-finite metrics", flush=True)
# max |metric - recorded| over finite rows: how closely this compilation
# tracks the original run
both = np.isfinite(metrics).all(axis=1) & np.isfinite(rec).all(axis=1)
if both.any():
    print(f"max |replay - recorded| over {both.sum()} mutually-finite rows: "
          f"{np.abs(metrics[both] - rec[both]).max():.3e}", flush=True)
