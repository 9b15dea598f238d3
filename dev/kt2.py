import sys
sys.path.insert(0, "/root/repo")
from r2_gaussian_tpu.utils.runtime import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np
from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import activate, create_from_pcd
from r2_gaussian_tpu.models.preprocess import build_cov3d, preprocess
from r2_gaussian_tpu.ops.splat2d import render_pallas
from r2_gaussian_tpu.ops.dense_reference import render_dense
from r2_gaussian_tpu.pipeline.densify import resort_spatial
from r2_gaussian_tpu.pipeline.optim import init_adam

d = np.load("/root/repo/.bench_data/sl_256_512_25_50000.npz", allow_pickle=True)
projs, angles, scanner, pts = d["projs"], d["angles"], d["scanner"].item(), d["pts"]
det = 512
cams = build_cameras(angles, projs, [str(i) for i in range(len(angles))], scanner)
sb = (0.001, 1.0)
params, aux = create_from_pcd(pts[:, :3].astype(np.float32), pts[:, 3], sb)
params, _, aux = resort_spatial(params, init_adam(params), aux, scale_bound=sb)
xyzA, scalesA, rotsA, densA = activate(params, sb)
w2c = jnp.asarray(cams.w2c[0]); fp = jnp.asarray(cams.full_proj[0])

@jax.jit
def prep_fn(xyz, scales, rots, dens):
    cov3d = build_cov3d(scales, rots)
    return preprocess(xyz, cov3d, dens, w2c=w2c, full_proj=fp, width=det, height=det,
                      tanfovx=cams.tanfovx, tanfovy=cams.tanfovy, mode=cams.mode,
                      active=aux.active, footprint="tight")
prep = prep_fn(xyzA, scalesA, rotsA, densA)
print("prep ok", flush=True)
f = jax.jit(lambda p: render_pallas(p, width=det, height=det))
img = np.asarray(f(prep)); print("fwd ok", img.sum(), flush=True)

mask = jnp.cos(jnp.arange(det*det).reshape(det,det)*0.01)
def loss(weight):
    return jnp.sum(render_pallas(prep._replace(weight=weight), width=det, height=det) * mask)
g1 = np.asarray(jax.jit(jax.grad(loss))(prep.weight)); print("bwd ok", flush=True)
import time
for tag, fn, arg in (("fwd", f, prep), ("bwd", jax.jit(jax.grad(loss)), prep.weight)):
    r = fn(arg); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(20): r = fn(arg)
    jax.block_until_ready(r)
    print(tag, "time/call ms:", (time.time()-t0)/20*1000, flush=True)
