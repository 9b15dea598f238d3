"""Where do the ~30ms of non-kernel time per train step go? (run solo)"""
import sys, time, types
sys.path.insert(0, "/root/repo")
from r2_gaussian_tpu.utils.runtime import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np
from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import activate, create_from_pcd
from r2_gaussian_tpu.models.preprocess import build_cov3d, preprocess
from r2_gaussian_tpu.ops.splat2d import render_pallas, _build_features
from r2_gaussian_tpu.pipeline.optim import adam_update, group_lrs, init_adam

d = np.load("/root/repo/.bench_data/sl_256_512_25_50000.npz", allow_pickle=True)
projs, angles, scanner, pts = d["projs"], d["angles"], d["scanner"].item(), d["pts"]
det = 512
cams = build_cameras(angles, projs, [str(i) for i in range(len(angles))], scanner)
sb = (0.001, 1.0)
params, aux = create_from_pcd(pts[:, :3].astype(np.float32), pts[:, 3], sb)
adam = init_adam(params)
w2c = jnp.asarray(cams.w2c[0]); fp = jnp.asarray(cams.full_proj[0])
gt = jnp.asarray(projs[0])

opt = types.SimpleNamespace(
    position_lr_init=2e-4, position_lr_final=2e-5, position_lr_max_steps=30000,
    density_lr_init=1e-2, density_lr_final=1e-3, density_lr_max_steps=30000,
    scaling_lr_init=5e-3, scaling_lr_final=5e-4, scaling_lr_max_steps=30000,
    rotation_lr_init=1e-3, rotation_lr_final=1e-4, rotation_lr_max_steps=30000)

def prep_of(params):
    xyz, scales, rots, dens = activate(params, sb)
    cov3d = build_cov3d(scales, rots)
    return preprocess(xyz, cov3d, dens, w2c=w2c, full_proj=fp, width=det,
                      height=det, tanfovx=cams.tanfovx, tanfovy=cams.tanfovy,
                      mode=cams.mode, active=aux.active, footprint="tight")

def tmr(name, fn, *args, n=30):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name:40s} {(time.time()-t0)/n*1000:8.2f} ms", flush=True)

g_prep = jax.jit(jax.grad(lambda p: sum(jnp.sum(x) for x in prep_of(p)[:4])))
g_feat = jax.jit(jax.grad(lambda p: jnp.sum(_build_features(prep_of(p)))))
g_rend = jax.jit(jax.grad(
    lambda p: jnp.sum(jnp.abs(render_pallas(prep_of(p), width=det, height=det) - gt))))

@jax.jit
def adam_only(params, adam):
    lrs = group_lrs(opt, jnp.int32(1000))
    return adam_update(params, params, adam, lrs)

tmr("grad(preprocess sum)", g_prep, params)
tmr("grad(features sum)", g_feat, params)
tmr("grad(render+l1) [full]", g_rend, params)
tmr("adam_update", adam_only, params, adam)
