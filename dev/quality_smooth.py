"""Representational-ceiling test: same pipeline on a band-limited (1-voxel
gaussian-blurred) shepp-logan. Real CT volumes (the reference's benchmark
data) are band-limited by detector/recon; piecewise-constant phantoms cap
gaussian-mixture PSNR via O(sigma) edge error."""
import sys, time, types
sys.path.insert(0, "/root/repo")
from r2_gaussian_tpu.utils.runtime import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np
from scipy.ndimage import gaussian_filter
from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import activate, create_from_pcd
from r2_gaussian_tpu.models.render import query_volume
from r2_gaussian_tpu.pipeline.trainer import Trainer
from r2_gaussian_tpu.utils.metrics import metric_vol_psnr
from r2_gaussian_tpu.ops.projector import project, add_ct_noise
from initialize_pcd import init_pcd

d = np.load("/root/repo/.bench_data/sl_256_512_25_50000.npz", allow_pickle=True)
vol0, angles, scanner = d["vol"], d["angles"], d["scanner"].item()
vol_gt = gaussian_filter(np.asarray(vol0), sigma=1.0).astype(np.float32)
noisy = sys.argv[1] == "noisy" if len(sys.argv) > 1 else False
projs = np.asarray(project(jnp.asarray(vol_gt), angles, scanner))
if noisy:
    projs = add_ct_noise(projs, poisson=1e4, gaussian=np.array([0.0, 10.0]),
                         seed=0)
pts = init_pcd(projs, angles, scanner, recon_method="fdk", n_points=50_000,
               density_thresh=0.05, density_rescale=0.15)
cams = build_cameras(angles, projs, [str(i) for i in range(len(angles))],
                     scanner)
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
                       s_voxel=scanner["sVoxel"],
                       active=trainer.state.aux.active, backend="pallas")
    return metric_vol_psnr(vol_gt, np.asarray(vol))


t0 = time.time()
print(f"smooth phantom, noisy={noisy}", flush=True)
for target in (500, 1000, 2000, 3000, 5000):
    while trainer.iteration < target:
        m, _ = trainer.run_chunk(min(100, target - trainer.iteration))
    n = int(np.asarray(trainer.state.aux.n_active))
    print(f"iter {target}: psnr3d={eval_psnr():.2f} "
          f"loss={float(np.asarray(m)[-1, 0]):.4f} n={n} "
          f"wall={time.time()-t0:.0f}s", flush=True)
