"""Train the bench case for several thousand iterations on TPU and report
the 3D PSNR trajectory vs the ground-truth volume (quality parity check)."""
import sys, time, types
sys.path.insert(0, "/root/repo")
from r2_gaussian_tpu.utils.runtime import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np
from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import activate, create_from_pcd
from r2_gaussian_tpu.models.render import query_volume
from r2_gaussian_tpu.pipeline.trainer import Trainer
from r2_gaussian_tpu.models.render import render
from r2_gaussian_tpu.utils.metrics import metric_proj, metric_vol_psnr

d = np.load("/root/repo/.bench_data/sl_256_512_25_50000.npz", allow_pickle=True)
vol_gt, projs, angles, scanner, pts = (d["vol"], d["projs"], d["angles"],
                                       d["scanner"].item(), d["pts"])
cams = build_cameras(angles, projs, [str(i) for i in range(len(angles))], scanner)
sb = (0.001, 1.0)
params, aux = create_from_pcd(pts[:, :3].astype(np.float32), pts[:, 3], sb,
                              capacity=262_144)
opt = types.SimpleNamespace(
    iterations=30_000,
    position_lr_init=2e-4, position_lr_final=2e-5, position_lr_max_steps=30_000,
    density_lr_init=1e-2, density_lr_final=1e-3, density_lr_max_steps=30_000,
    scaling_lr_init=5e-3, scaling_lr_final=5e-4, scaling_lr_max_steps=30_000,
    rotation_lr_init=1e-3, rotation_lr_final=1e-4, rotation_lr_max_steps=30_000,
    lambda_dssim=0.25, lambda_tv=0.05, tv_vol_size=32,
    density_min_threshold=1e-5,
    densification_interval=100, densify_from_iter=500, densify_until_iter=15_000,
    densify_grad_threshold=5e-5, densify_scale_threshold=0.1,
    max_screen_size=None, max_scale=None, max_num_gaussians=500_000,
)
trainer = Trainer(cams, scanner, opt, sb, params, aux, backend="pallas")

def eval_psnr():
    xyz, scales, rots, dens = activate(trainer.state.params, sb)
    vol = query_volume(xyz, scales, rots, dens, center=scanner["offOrigin"],
                       n_voxel=tuple(int(v) for v in scanner["nVoxel"]),
                       s_voxel=scanner["sVoxel"], active=trainer.state.aux.active,
                       backend="pallas")
    return metric_vol_psnr(vol_gt, np.asarray(vol))

def eval_psnr2d():
    xyz, scales, rots, dens = activate(trainer.state.params, sb)
    out = []
    for vi in (0, 12):
        img = render(xyz, scales, rots, dens, w2c=jnp.asarray(cams.w2c[vi]),
                     full_proj=jnp.asarray(cams.full_proj[vi]),
                     width=512, height=512, tanfovx=cams.tanfovx,
                     tanfovy=cams.tanfovy, mode=cams.mode,
                     active=trainer.state.aux.active, backend="pallas")["render"]
        out.append(round(float(metric_proj(np.asarray(projs[vi])[None], np.asarray(img)[None])['psnr_2d']), 2))
    return out

t_start = time.time()
evals = [500, 1000, 2000, 3000, 5000, 8000]
for target in evals:
    while trainer.iteration < target:
        k = min(100, target - trainer.iteration)
        m, _ = trainer.run_chunk(k)
    loss = float(np.asarray(m)[-1, 0])
    psnr = eval_psnr()
    n = int(np.asarray(trainer.state.aux.n_active))
    p2d = eval_psnr2d()
    print(f"iter {trainer.iteration}: psnr3d={psnr:.2f} psnr2d={p2d} "
          f"loss={loss:.4f} n={n} wall={time.time()-t_start:.0f}s", flush=True)
