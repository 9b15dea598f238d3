"""Train the band-limited phantom at a given view count (reference's
75/50/25-view table) for 5k iters; report quality trajectory."""
import json, sys, time, types
sys.path.insert(0, "/root/repo")
from r2_gaussian_tpu.utils.runtime import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np
from scipy.ndimage import gaussian_filter
from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import activate, create_from_pcd
from r2_gaussian_tpu.models.render import query_volume
from r2_gaussian_tpu.pipeline.trainer import Trainer
from r2_gaussian_tpu.utils.metrics import metric_vol_psnr, metric_vol_ssim
from r2_gaussian_tpu.ops.phantom import shepp_logan_3d
from r2_gaussian_tpu.ops.projector import project, add_ct_noise
from initialize_pcd import init_pcd

N_VIEWS = int(sys.argv[1]) if len(sys.argv) > 1 else 75
MODE = sys.argv[2] if len(sys.argv) > 2 else "cone"
scanner = {
    "mode": MODE, "DSD": 7.0, "DSO": 5.0,
    "nDetector": [512, 512],
    "sDetector": [4.0, 4.0] if MODE == "cone" else [2.0, 2.0],
    "nVoxel": [256] * 3, "sVoxel": [2.0] * 3, "dVoxel": [2.0 / 256] * 3,
    "offOrigin": [0.0, 0.0, 0.0], "offDetector": [0.0, 0.0],
    "accuracy": 0.5, "totalAngle": 360.0, "startAngle": 0.0,
}
vol_gt = gaussian_filter(shepp_logan_3d(256), sigma=1.0).astype(np.float32)
angles = np.linspace(0, 2 * np.pi, N_VIEWS + 1)[:-1]
projs = np.asarray(project(jnp.asarray(vol_gt), angles, scanner))
projs = add_ct_noise(projs, poisson=1e4, gaussian=np.array([0.0, 10.0]), seed=0)
pts = init_pcd(projs, angles, scanner, recon_method="fdk", n_points=50_000,
               density_thresh=0.05, density_rescale=0.15)
cams = build_cameras(angles, projs, [str(i) for i in range(N_VIEWS)], scanner)
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


def eval3d():
    xyz, scales, rots, dens = activate(trainer.state.params, sb)
    vol = np.asarray(query_volume(
        xyz, scales, rots, dens, center=scanner["offOrigin"],
        n_voxel=(256, 256, 256), s_voxel=scanner["sVoxel"],
        active=trainer.state.aux.active, backend="pallas"))
    ssim, _ = metric_vol_ssim(vol_gt, vol)
    return metric_vol_psnr(vol_gt, vol), float(ssim)


t0 = time.time()
print(f"views={N_VIEWS} mode={MODE}", flush=True)
for target in (1000, 3000, 5000):
    while trainer.iteration < target:
        m, _ = trainer.run_chunk(min(100, target - trainer.iteration))
    p3, s3 = eval3d()
    n = int(np.asarray(trainer.state.aux.n_active))
    print(json.dumps(dict(views=N_VIEWS, mode=MODE, iter=target,
                          psnr3d=round(p3, 2), ssim3d=round(s3, 4), n=n,
                          wall_s=round(time.time() - t0, 1))), flush=True)
