"""Regenerate the 500k-gaussian stress state used by the kernel A/Bs and
the speed-of-light census (.bench_data/state_1100.npz).

Trains the flagship bench case with an aggressive densify threshold so the
clone/split events drive the population to the reference's 500k cap by
iteration ~1100 (densify every 100 from 500), then snapshots. Usage:

    python dev/make_stress_state.py [target_iter]
"""
import os.path as osp
import sys
import types

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))
import numpy as np

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import create_from_pcd
from r2_gaussian_tpu.pipeline.trainer import Trainer

TARGET = int(sys.argv[1]) if len(sys.argv) > 1 else 1100
ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..")

d = np.load(osp.join(ROOT, ".bench_data", "slb_256_512_25_50000.npz"),
            allow_pickle=True)
angles, projs, scanner, pts = (d["angles"], d["projs"], d["scanner"].item(),
                               d["pts"])
cams = build_cameras(angles, projs, [str(i) for i in range(len(angles))],
                     scanner)
vol_to_world = float(max(scanner["sVoxel"]))
sb = (0.0005 * vol_to_world, 0.5 * vol_to_world)
params, aux = create_from_pcd(pts[:, :3].astype(np.float32), pts[:, 3], sb,
                              capacity=524_288)
opt = types.SimpleNamespace(
    iterations=30_000,
    position_lr_init=2e-4, position_lr_final=2e-5, position_lr_max_steps=30_000,
    density_lr_init=1e-2, density_lr_final=1e-3, density_lr_max_steps=30_000,
    scaling_lr_init=5e-3, scaling_lr_final=5e-4, scaling_lr_max_steps=30_000,
    rotation_lr_init=1e-3, rotation_lr_final=1e-4, rotation_lr_max_steps=30_000,
    lambda_dssim=0.25, lambda_tv=0.05, tv_vol_size=32,
    density_min_threshold=1e-5,
    densification_interval=100, densify_from_iter=500, densify_until_iter=15_000,
    # near-zero threshold: every gaussian qualifies every event, so the
    # population hits the 500k cap by ~iter 1100 (the stress regime)
    densify_grad_threshold=1e-9, densify_scale_threshold=0.1,
    max_screen_size=None, max_scale=None, max_num_gaussians=500_000,
)
tr = Trainer(cams, scanner, opt, sb, params, aux, backend="auto")
while tr.iteration < TARGET:
    m, n = tr.run_chunk(min(100, TARGET - tr.iteration))
    print(tr.iteration, "loss", float(m[-1, 0]), "n", n, flush=True)
p, a = tr.state.params, tr.state.aux
np.savez_compressed(
    osp.join(ROOT, ".bench_data", "state_1100.npz"),
    xyz=np.asarray(p.xyz), scaling=np.asarray(p.scaling),
    rotation=np.asarray(p.rotation), density=np.asarray(p.density),
    active=np.asarray(a.active), scale_bound=np.asarray(sb),
)
print("saved stress state at iter", TARGET,
      "n_active", int(np.asarray(a.active).sum()))
