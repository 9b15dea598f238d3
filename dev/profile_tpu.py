"""Sub-op timing breakdown of the train step at bench scale (TPU, run solo)."""
import sys, time, types
sys.path.insert(0, "/root/repo")
from r2_gaussian_tpu.utils.runtime import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp
import numpy as np
from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import activate, create_from_pcd
from r2_gaussian_tpu.models.render import render, query
from r2_gaussian_tpu.ops.splat2d import render_pallas
from r2_gaussian_tpu.models.preprocess import build_cov3d, preprocess
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
opt = types.SimpleNamespace(iterations=10**7,
    position_lr_init=2e-4, position_lr_final=2e-5, position_lr_max_steps=30000,
    density_lr_init=1e-2, density_lr_final=1e-3, density_lr_max_steps=30000,
    scaling_lr_init=5e-3, scaling_lr_final=5e-4, scaling_lr_max_steps=30000,
    rotation_lr_init=1e-3, rotation_lr_final=1e-4, rotation_lr_max_steps=30000,
    lambda_dssim=0.25, lambda_tv=0.05, tv_vol_size=32,
    density_min_threshold=1e-5, densification_interval=100, densify_from_iter=500,
    densify_until_iter=0, densify_grad_threshold=5e-5, densify_scale_threshold=0.1,
    max_screen_size=None, max_scale=None, max_num_gaussians=500_000)
trainer = Trainer(cams, scanner, opt, sb, params, aux, backend="pallas")
p, a, x, _ = resort_spatial(trainer.state.params, trainer.state.adam, trainer.state.aux, scale_bound=sb)
trainer.state = trainer.state._replace(params=p, adam=a, aux=x)
params, aux = trainer.state.params, trainer.state.aux

w2c = jnp.asarray(cams.w2c[0]); fp = jnp.asarray(cams.full_proj[0])
act = activate(params, sb)

def tmr(name, fn, *args, n=20):
    r = fn(*args); jax.tree.map(lambda t: t.block_until_ready() if hasattr(t,'block_until_ready') else t, r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    jax.tree.map(lambda t: t.block_until_ready() if hasattr(t,'block_until_ready') else t, r)
    dt = (time.time()-t0)/n*1000
    print(f"{name:28s} {dt:8.2f} ms", flush=True)
    return r

xyzA, scalesA, rotsA, densA = act

@jax.jit
def fwd(xyz, scales, rots, dens):
    return render(xyz, scales, rots, dens, w2c=w2c, full_proj=fp,
                  width=det, height=det, tanfovx=cams.tanfovx, tanfovy=cams.tanfovy,
                  mode=cams.mode, active=aux.active, backend="pallas")["render"]

@jax.jit
def fwd_loss(xyz, scales, rots, dens):
    img = render(xyz, scales, rots, dens, w2c=w2c, full_proj=fp,
                 width=det, height=det, tanfovx=cams.tanfovx, tanfovy=cams.tanfovy,
                 mode=cams.mode, active=aux.active, backend="pallas")["render"]
    return jnp.sum(jnp.abs(img - jnp.asarray(images[0])))

grad_render = jax.jit(jax.grad(fwd_loss, argnums=(0,1,2,3)))

@jax.jit
def tv_fwd(xyz, scales, rots, dens):
    return query(xyz, scales, rots, dens, center=(0.,0.,0.), n_voxel=(32,32,32),
                 s_voxel=(0.25,0.25,0.25), active=aux.active, backend="pallas")["vol"]

@jax.jit
def tv_loss(xyz, scales, rots, dens):
    v = tv_fwd(xyz, scales, rots, dens)
    return jnp.sum(jnp.abs(v))

grad_tv = jax.jit(jax.grad(tv_loss, argnums=(0,1,2,3)))

# tier occupancy
cov3d = build_cov3d(scalesA, rotsA)
prep = preprocess(xyzA, cov3d, densA, w2c=w2c, full_proj=fp, width=det, height=det,
                  tanfovx=cams.tanfovx, tanfovy=cams.tanfovy, mode=cams.mode,
                  active=aux.active, footprint="tight")
_, tier_aux = render_pallas(prep, width=det, height=det, return_aux=True)
print("tier occupancy:", {k: int(v) for k, v in tier_aux.items()}, flush=True)

tmr("render fwd", fwd, *act)
tmr("render fwd+bwd", grad_render, *act)
tmr("tv query fwd", tv_fwd, *act)
tmr("tv query fwd+bwd", grad_tv, *act)

def step10():
    m, _ = trainer.run_chunk(10)
    return m
m = step10(); np.asarray(m)
t0=time.time(); m = step10(); np.asarray(m)
print(f"{'full step (x10 chunk)':28s} {(time.time()-t0)/10*1000:8.2f} ms", flush=True)
