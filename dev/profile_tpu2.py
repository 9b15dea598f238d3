"""Narrow isolation: where do render-fwd 39ms and tv-fwd 32ms go?"""
import sys, time
sys.path.insert(0, "/root/repo")
from r2_gaussian_tpu.utils.runtime import setup_jax_cache
setup_jax_cache()
import functools
import jax, jax.numpy as jnp
import numpy as np
from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import activate, create_from_pcd
from r2_gaussian_tpu.models.preprocess import build_cov3d, preprocess
from r2_gaussian_tpu.models.voxel_preprocess import voxel_preprocess
from r2_gaussian_tpu.ops import splat2d, splat3d
from r2_gaussian_tpu.pipeline.densify import resort_spatial
from r2_gaussian_tpu.pipeline.optim import init_adam

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
params, aux = create_from_pcd(xyz.astype(np.float32), dens, sb)
params, _, aux = resort_spatial(params, init_adam(params), aux, scale_bound=sb)
w2c = jnp.asarray(cams.w2c[0]); fp = jnp.asarray(cams.full_proj[0])
xyzA, scalesA, rotsA, densA = activate(params, sb)

def tmr(name, fn, *args, n=20):
    r = fn(*args)
    jax.tree.map(lambda t: t.block_until_ready() if hasattr(t,'block_until_ready') else t, r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    jax.tree.map(lambda t: t.block_until_ready() if hasattr(t,'block_until_ready') else t, r)
    print(f"{name:36s} {(time.time()-t0)/n*1000:8.2f} ms", flush=True)
    return r

@jax.jit
def prep2d(xyz, scales, rots, dens):
    cov3d = build_cov3d(scales, rots)
    return preprocess(xyz, cov3d, dens, w2c=w2c, full_proj=fp, width=det, height=det,
                      tanfovx=cams.tanfovx, tanfovy=cams.tanfovy, mode=cams.mode,
                      active=aux.active, footprint="tight")

@jax.jit
def kernels2d(xyz, scales, rots, dens):
    p = prep2d(xyz, scales, rots, dens)
    return splat2d.render_pallas(p, width=det, height=det)

@functools.partial(jax.jit, static_argnums=(4,))
def kernels2d_cfg(xyz, scales, rots, dens, cfg):
    p = prep2d(xyz, scales, rots, dens)
    return splat2d.render_pallas(p, width=det, height=det, config=cfg)

@jax.jit
def prep3d(xyz, scales, rots, dens):
    cov3d = build_cov3d(scales, rots)
    ms = jnp.max(scales, axis=-1)
    return voxel_preprocess(xyz, cov3d, ms, dens, center=(0.,0.,0.),
                            n_voxel=(32,32,32), s_voxel=(0.25,0.25,0.25),
                            active=aux.active)

@functools.partial(jax.jit, static_argnums=(4,))
def vox_cap(xyz, scales, rots, dens, cap):
    p = prep3d(xyz, scales, rots, dens)
    return splat3d.voxelize_pallas(p, n_voxel=(32,32,32), candidate_cap=cap)

args = (xyzA, scalesA, rotsA, densA)
tmr("2d preprocess only", prep2d, *args)
tmr("2d full (tiers+fallback)", kernels2d, *args)
from r2_gaussian_tpu.ops.splat2d import SplatConfig
tmr("2d dense_cap=256", kernels2d_cfg, *args, SplatConfig(dense_cap=256, dense_chunk=256))
tmr("2d tier0 only big caps", kernels2d_cfg, *args,
    SplatConfig(tiers=((64, 56),), dense_cap=256, dense_chunk=256))
tmr("3d preprocess only", prep3d, *args)
tmr("3d voxelize cap=1024", vox_cap, *args, 1024)
tmr("3d voxelize cap=128", vox_cap, *args, 128)
