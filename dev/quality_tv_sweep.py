"""30k-iteration run on the noisy flagship at a given lambda_tv; appends
one JSON line per eval point to .bench_data/tv_sweep.jsonl. Usage:
python dev/quality_tv_sweep.py <lambda_tv> [tag] [opt_field=value ...]
(extra k=v pairs override any field of the opt namespace below, e.g.
position_lr_final=5e-6 to test a lower late-stage LR floor.)"""
import json
import sys, time, types
sys.path.insert(0, "/root/repo")
from r2_gaussian_tpu.utils.runtime import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np
from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import activate, create_from_pcd
from r2_gaussian_tpu.models.render import query_volume
from r2_gaussian_tpu.pipeline.trainer import Trainer
from r2_gaussian_tpu.utils.metrics import metric_vol_psnr, metric_vol_ssim

LTV = float(sys.argv[1]) if len(sys.argv) > 1 else 0.05
TAG = (sys.argv[2] if len(sys.argv) > 2 and "=" not in sys.argv[2]
       else f"ltv{LTV}")
OVERRIDES = dict(kv.split("=", 1) for kv in sys.argv[2:] if "=" in kv)

d = np.load("/root/repo/.bench_data/slb_256_512_25_50000.npz", allow_pickle=True)
vol_gt, projs, angles, scanner, pts = (d["vol"], d["projs"], d["angles"],
                                       d["scanner"].item(), d["pts"])
cams = build_cameras(angles, projs, [str(i) for i in range(len(angles))], scanner)
vol_to_world = float(max(scanner["sVoxel"]))
sb = (0.0005 * vol_to_world, 0.5 * vol_to_world)
params, aux = create_from_pcd(pts[:, :3].astype(np.float32), pts[:, 3], sb,
                              capacity=262_144)
opt = types.SimpleNamespace(
    iterations=30_000,
    position_lr_init=2e-4, position_lr_final=2e-5, position_lr_max_steps=30_000,
    density_lr_init=1e-2, density_lr_final=1e-3, density_lr_max_steps=30_000,
    scaling_lr_init=5e-3, scaling_lr_final=5e-4, scaling_lr_max_steps=30_000,
    rotation_lr_init=1e-3, rotation_lr_final=1e-4, rotation_lr_max_steps=30_000,
    lambda_dssim=0.25, lambda_tv=LTV, tv_vol_size=32,
    density_min_threshold=1e-5,
    densification_interval=100, densify_from_iter=500, densify_until_iter=15_000,
    densify_grad_threshold=5e-5, densify_scale_threshold=0.1,
    max_screen_size=None, max_scale=None, max_num_gaussians=500_000,
    ema_decay=0.0,
)
for k, v in OVERRIDES.items():
    assert hasattr(opt, k), f"unknown opt field {k}"
    cur = getattr(opt, k)
    setattr(opt, k, type(cur)(v) if cur is not None else float(v))
trainer = Trainer(cams, scanner, opt, sb, params, aux, backend="pallas")


def eval3d():
    xyz, scales, rots, dens = activate(trainer.eval_params, sb)
    vol = np.asarray(query_volume(
        xyz, scales, rots, dens, center=scanner["offOrigin"],
        n_voxel=tuple(int(v) for v in scanner["nVoxel"]),
        s_voxel=scanner["sVoxel"], active=trainer.state.aux.active,
        backend="pallas"))
    return float(metric_vol_psnr(vol_gt, vol)), float(metric_vol_ssim(vol_gt, vol)[0])


t0 = time.time()
with open("/root/repo/.bench_data/tv_sweep.jsonl", "a") as f:
    for target in (1, 2500, 5000, 10000, 15000, 20000, 25000, 30000):
        while trainer.iteration < target:
            m, _ = trainer.run_chunk(min(100, target - trainer.iteration))
        p3, s3 = eval3d()
        row = dict(tag=TAG, lambda_tv=LTV, overrides=OVERRIDES, iter=target,
                   wall_s=round(time.time() - t0, 1), psnr3d=round(p3, 2),
                   ssim3d=round(s3, 4),
                   n=int(np.asarray(trainer.state.aux.n_active)))
        f.write(json.dumps(row) + "\n")
        f.flush()
        print(json.dumps(row), flush=True)
