"""Per-chunk wall-time timeline of the flagship training protocol.

Replays the exact full_run_30k.py setup but prints the wall time of every
run_chunk(100) (one fused dispatch + at most one densify event), splitting
the end-to-end gap between steady step cost, densify-event cost, and
compile spikes. Optionally snapshots states at the listed iterations
(--snap 5000,10000) in the .bench_data profiler npz format.

Usage: python dev/chunk_timeline.py [max_iter] [--snap it1,it2]
"""
import os.path as osp
import sys
import time
import types

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))
import numpy as np

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import create_from_pcd
from r2_gaussian_tpu.pipeline.trainer import Trainer

ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..")
args = [a for a in sys.argv[1:] if not a.startswith("--")]
MAX_IT = int(args[0]) if args else 10_000
SNAP = []
for a in sys.argv[1:]:
    if a.startswith("--snap"):
        SNAP = [int(v) for v in a.split("=", 1)[1].split(",")] if "=" in a \
            else []
d = np.load(osp.join(ROOT, ".bench_data", "slb_256_512_25_50000.npz"),
            allow_pickle=True)
angles, projs, scanner, pts = (d["angles"], d["projs"], d["scanner"].item(),
                               d["pts"])
cams = build_cameras(angles, projs, [str(i) for i in range(len(angles))],
                     scanner)
vol_to_world = float(max(scanner["sVoxel"]))
sb = (0.0005 * vol_to_world, 0.5 * vol_to_world)
params, aux = create_from_pcd(pts[:, :3].astype(np.float32), pts[:, 3], sb,
                              capacity=262_144)
import os

opt = types.SimpleNamespace(
    iterations=30_000,
    position_lr_init=2e-4, position_lr_final=2e-5,
    position_lr_max_steps=30_000,
    density_lr_init=1e-2, density_lr_final=1e-3, density_lr_max_steps=30_000,
    scaling_lr_init=5e-3, scaling_lr_final=5e-4, scaling_lr_max_steps=30_000,
    rotation_lr_init=1e-3, rotation_lr_final=1e-4,
    rotation_lr_max_steps=30_000,
    lambda_dssim=0.25, lambda_tv=0.05, tv_vol_size=32,
    density_min_threshold=1e-5,
    densification_interval=100, densify_from_iter=500,
    densify_until_iter=15_000,
    # R2G_GRAD_THRESH steers the live-population regime (e.g. 1e-5 drives
    # the flagship case past 200k live for high-capacity trajectories)
    densify_grad_threshold=float(os.environ.get("R2G_GRAD_THRESH", 5e-5)),
    densify_scale_threshold=0.1,
    max_screen_size=None, max_scale=None, max_num_gaussians=500_000,
)
trainer = Trainer(cams, scanner, opt, sb, params, aux, backend="pallas")

t_all = time.time()
while trainer.iteration < MAX_IT:
    t0 = time.time()
    m, n = trainer.run_chunk(100)
    dt = time.time() - t0
    it = trainer.iteration
    print(f"it {it:6d}  chunk {dt * 1000:8.1f} ms  "
          f"({dt * 10:6.2f} ms/it)  n_active {trainer._n_active()}"
          f"  loss {float(np.asarray(m)[-1, 0]):.2e}",
          flush=True)
    if it in SNAP:
        s = trainer.state
        np.savez(osp.join(ROOT, ".bench_data", f"state_slb_{it}.npz"),
                 xyz=np.asarray(s.params.xyz),
                 scaling=np.asarray(s.params.scaling),
                 rotation=np.asarray(s.params.rotation),
                 density=np.asarray(s.params.density),
                 active=np.asarray(s.aux.active),
                 scale_bound=np.asarray(sb, np.float64))
        print(f"snapshotted state_slb_{it}.npz", flush=True)
print(f"total {time.time() - t_all:.1f}s to iter {MAX_IT}")
