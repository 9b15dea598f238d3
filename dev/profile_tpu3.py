"""Device-true per-step breakdown: toggle statically-gated loss terms."""
import sys, time, types
sys.path.insert(0, "/root/repo")
from r2_gaussian_tpu.utils.runtime import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp
import numpy as np
from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import create_from_pcd
from r2_gaussian_tpu.pipeline.densify import resort_spatial
from r2_gaussian_tpu.pipeline.optim import init_adam
from r2_gaussian_tpu.pipeline.trainer import Trainer

det, n_gauss = 512, 150_000
scanner = {"mode":"cone","DSD":7.0,"DSO":5.0,"nDetector":[det,det],"sDetector":[4.0,4.0],
           "nVoxel":[256]*3,"sVoxel":[2.0]*3,"dVoxel":[2.0/256]*3,
           "offOrigin":[0.,0.,0.],"offDetector":[0.,0.]}
rng = np.random.default_rng(0)
angles = np.linspace(0, 2*np.pi, 26)[:-1]
images = np.abs(rng.standard_normal((25,det,det))).astype(np.float32)
cams = build_cameras(angles, images, [str(i) for i in range(25)], scanner)
xyz = np.clip(rng.standard_normal((n_gauss,3))*0.35, -0.95, 0.95)
dens = rng.uniform(0.05,0.5,n_gauss).astype(np.float32)
sb = (0.001, 1.0)
params0, aux0 = create_from_pcd(xyz.astype(np.float32), dens, sb)
params0, _, aux0 = resort_spatial(params0, init_adam(params0), aux0, scale_bound=sb)

def mkopt(**kw):
    d = dict(iterations=10**7,
        position_lr_init=2e-4, position_lr_final=2e-5, position_lr_max_steps=30000,
        density_lr_init=1e-2, density_lr_final=1e-3, density_lr_max_steps=30000,
        scaling_lr_init=5e-3, scaling_lr_final=5e-4, scaling_lr_max_steps=30000,
        rotation_lr_init=1e-3, rotation_lr_final=1e-4, rotation_lr_max_steps=30000,
        lambda_dssim=0.25, lambda_tv=0.05, tv_vol_size=32,
        density_min_threshold=1e-5, densification_interval=100, densify_from_iter=500,
        densify_until_iter=0, densify_grad_threshold=5e-5, densify_scale_threshold=0.1,
        max_screen_size=None, max_scale=None, max_num_gaussians=500_000)
    d.update(kw)
    return types.SimpleNamespace(**d)

def measure(name, opt, footprint="tight", n=40):
    p = jax.tree.map(jnp.copy, params0)
    a = jax.tree.map(jnp.copy, aux0)
    tr = Trainer(cams, scanner, opt, sb, p, a, backend="pallas",
                 footprint=footprint)
    m, _ = tr.run_chunk(n); np.asarray(m)  # compile+warm
    t0 = time.time(); m, _ = tr.run_chunk(n); np.asarray(m)
    print(f"{name:34s} {(time.time()-t0)/n*1000:8.2f} ms/it", flush=True)

measure("full (l1+ssim+tv)", mkopt())
measure("no tv", mkopt(lambda_tv=0.0))
measure("no ssim", mkopt(lambda_dssim=0.0))
measure("l1 only", mkopt(lambda_tv=0.0, lambda_dssim=0.0))
measure("full, tile footprint", mkopt(), footprint="tile")
