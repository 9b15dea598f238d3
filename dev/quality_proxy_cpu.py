"""CPU-scale semiconvergence proxy: orders the 30k-quality remedies when no
TPU is reachable (64^3 blurred shepp-logan, 64^2 cone projections, 25 noisy
views, FDK init — the flagship protocol shrunk 4x per axis, 8k iterations).

Appends one JSON line per eval point to .bench_data/proxy_sweep.jsonl.
Usage: python dev/quality_proxy_cpu.py <tag> [opt_field=value ...]
e.g.   python dev/quality_proxy_cpu.py base
       python dev/quality_proxy_cpu.py ema ema_decay=0.9995
       python dev/quality_proxy_cpu.py tv3x lambda_tv=0.15
       python dev/quality_proxy_cpu.py lrfloor position_lr_final=5e-6
The reduced scale shifts absolute PSNR; only the BETWEEN-variant ordering
and the shape of the iter->PSNR3D curve transfer to the full protocol.
"""
import json
import os.path as osp
import sys
import time
import types

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter

from initialize_pcd import init_pcd
from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import activate, create_from_pcd
from r2_gaussian_tpu.models.render import query_volume
from r2_gaussian_tpu.ops.phantom import shepp_logan_3d
from r2_gaussian_tpu.ops.projector import add_ct_noise, project
from r2_gaussian_tpu.pipeline.trainer import Trainer
from r2_gaussian_tpu.utils.metrics import metric_vol_psnr, metric_vol_ssim

TAG = sys.argv[1] if len(sys.argv) > 1 else "base"
OVERRIDES = dict(kv.split("=", 1) for kv in sys.argv[2:] if "=" in kv)

import os
ITERS = int(os.environ.get("R2G_PROXY_ITERS", 8000))
VOL, DET, N_VIEWS = 64, 64, 25

scanner = {
    "mode": "cone", "DSD": 7.0, "DSO": 5.0,
    "nDetector": [DET, DET], "sDetector": [4.0, 4.0],
    "nVoxel": [VOL] * 3, "sVoxel": [2.0] * 3, "dVoxel": [2.0 / VOL] * 3,
    "offOrigin": [0.0, 0.0, 0.0], "offDetector": [0.0, 0.0],
    "accuracy": 0.5, "totalAngle": 360.0, "startAngle": 0.0,
}
_CACHE = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                  ".bench_data", "proxy64.npz")
if osp.exists(_CACHE):
    _d = np.load(_CACHE)
    vol_gt, angles, projs, pts = _d["vol"], _d["angles"], _d["projs"], _d["pts"]
else:
    vol_gt = gaussian_filter(shepp_logan_3d(VOL), sigma=1.0).astype(np.float32)
    angles = np.linspace(0, 2 * np.pi, N_VIEWS + 1)[:-1]
    projs = np.asarray(project(jnp.asarray(vol_gt), angles, scanner))
    projs = add_ct_noise(projs, poisson=1e4, gaussian=np.array([0.0, 10.0]),
                         seed=0)
    pts = init_pcd(projs, angles, scanner, recon_method="fdk", n_points=3000,
                   density_thresh=0.05, density_rescale=0.15)
    np.savez_compressed(_CACHE, vol=vol_gt, angles=angles, projs=projs, pts=pts)
cams = build_cameras(angles, projs, [str(i) for i in range(N_VIEWS)], scanner)
sb = (0.0005 * 2.0, 0.5 * 2.0)
params, aux = create_from_pcd(pts[:, :3].astype(np.float32), pts[:, 3], sb,
                              capacity=int(os.environ.get("R2G_PROXY_CAP", 8192)))
opt = types.SimpleNamespace(
    iterations=ITERS,
    position_lr_init=2e-4, position_lr_final=2e-5, position_lr_max_steps=ITERS,
    density_lr_init=1e-2, density_lr_final=1e-3, density_lr_max_steps=ITERS,
    scaling_lr_init=5e-3, scaling_lr_final=5e-4, scaling_lr_max_steps=ITERS,
    rotation_lr_init=1e-3, rotation_lr_final=1e-4, rotation_lr_max_steps=ITERS,
    lambda_dssim=0.25, lambda_tv=0.05, tv_vol_size=16,
    density_min_threshold=1e-5,
    densification_interval=100, densify_from_iter=500,
    densify_until_iter=ITERS // 2, densify_grad_threshold=5e-5,
    densify_scale_threshold=0.1, max_screen_size=None, max_scale=None,
    # == capacity: keeps _maybe_grow_capacity from triggering a multi-minute
    # CPU recompile mid-run (the densify budget clamps at this population)
    max_num_gaussians=int(os.environ.get("R2G_PROXY_CAP", 8192)), ema_decay=0.0,
)
for k, v in OVERRIDES.items():
    assert hasattr(opt, k), f"unknown opt field {k}"
    cur = getattr(opt, k)
    setattr(opt, k, type(cur)(v) if cur is not None else float(v))
trainer = Trainer(cams, scanner, opt, sb, params, aux, backend="dense")


def eval3d():
    xyz, scales, rots, dens = activate(trainer.eval_params, sb)
    vol = np.asarray(query_volume(
        xyz, scales, rots, dens, center=scanner["offOrigin"],
        n_voxel=(VOL,) * 3, s_voxel=scanner["sVoxel"],
        active=trainer.state.aux.active, backend="dense"))
    return float(metric_vol_psnr(vol_gt, vol)), float(metric_vol_ssim(vol_gt, vol)[0])


t0 = time.time()
out_path = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    ".bench_data", "proxy_sweep.jsonl")
with open(out_path, "a") as f:
    for target in (1, *range(500, ITERS + 1, 500)):
        while trainer.iteration < target:
            trainer.run_chunk(min(100, target - trainer.iteration))
        p3, s3 = eval3d()
        row = dict(tag=TAG, overrides=OVERRIDES, iter=target,
                   wall_s=round(time.time() - t0, 1), psnr3d=round(p3, 3),
                   ssim3d=round(s3, 4),
                   n=int(np.asarray(jnp.sum(
                       trainer.state.aux.active.astype(jnp.int32)))))
        f.write(json.dumps(row) + "\n")
        f.flush()
        print(json.dumps(row), flush=True)
