import sys, time; sys.path.insert(0, "/root/repo")
import numpy as np, types
import jax
from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import create_from_pcd
from r2_gaussian_tpu.pipeline.densify import resort_spatial
from r2_gaussian_tpu.pipeline.trainer import Trainer

det, n_gauss, n_views = 512, 150_000, 25
scanner = {"mode":"cone","DSD":7.0,"DSO":5.0,"nDetector":[det,det],"sDetector":[4.0,4.0],
           "nVoxel":[256]*3,"sVoxel":[2.0]*3,"dVoxel":[2.0/256]*3,
           "offOrigin":[0.,0.,0.],"offDetector":[0.,0.]}
rng = np.random.default_rng(0)
angles = np.linspace(0, 2*np.pi, n_views+1)[:-1]
images = np.abs(rng.standard_normal((n_views,det,det))).astype(np.float32)
cams = build_cameras(angles, images, [str(i) for i in range(n_views)], scanner)
xyz = np.clip(rng.standard_normal((n_gauss,3))*0.35, -0.95, 0.95)
dens = rng.uniform(0.05,0.5,n_gauss).astype(np.float32)
sb = (0.001, 1.0)
params, aux = create_from_pcd(xyz.astype(np.float32), dens, sb)
opt = types.SimpleNamespace(
    iterations=10_000_000,
    position_lr_init=2e-4, position_lr_final=2e-5, position_lr_max_steps=30000,
    density_lr_init=1e-2, density_lr_final=1e-3, density_lr_max_steps=30000,
    scaling_lr_init=5e-3, scaling_lr_final=5e-4, scaling_lr_max_steps=30000,
    rotation_lr_init=1e-3, rotation_lr_final=1e-4, rotation_lr_max_steps=30000,
    lambda_dssim=0.25, lambda_tv=0.05, tv_vol_size=32,
    density_min_threshold=1e-5, densification_interval=100, densify_from_iter=500,
    densify_until_iter=0, densify_grad_threshold=5e-5, densify_scale_threshold=0.1,
    max_screen_size=None, max_scale=None, max_num_gaussians=500_000)
trainer = Trainer(cams, scanner, opt, sb, params, aux, backend="auto")
p, a, x, _ = resort_spatial(trainer.state.params, trainer.state.adam, trainer.state.aux)
trainer.state = trainer.state._replace(params=p, adam=a, aux=x)
print("compiling 10-step chunk...", flush=True)
t0 = time.time()
m, _ = trainer.run_chunk(10)
np.asarray(m)
print(f"compile+run 10 steps: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
m, _ = trainer.run_chunk(10)
np.asarray(m)
print(f"10 steps: {time.time()-t0:.2f}s -> {10/(time.time()-t0):.1f} it/s", flush=True)
t0 = time.time()
m, _ = trainer.run_chunk(100)
np.asarray(m)
dt = time.time()-t0
print(f"compile+run 100 steps: {dt:.1f}s", flush=True)
t0 = time.time()
m, _ = trainer.run_chunk(100)
np.asarray(m)
dt = time.time()-t0
print(f"100 steps: {dt:.2f}s -> {100/dt:.1f} it/s", flush=True)
print("loss:", float(np.asarray(m)[-1,0]))
