import sys
sys.path.insert(0, "/root/repo")
from r2_gaussian_tpu.utils.runtime import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np
from r2_gaussian_tpu.models.gaussians import activate, create_from_pcd
from r2_gaussian_tpu.models.render import query
from r2_gaussian_tpu.pipeline.densify import resort_spatial
from r2_gaussian_tpu.pipeline.optim import init_adam

d = np.load("/root/repo/.bench_data/sl_256_512_25_50000.npz", allow_pickle=True)
pts = d["pts"]
sb = (0.001, 1.0)
params, aux = create_from_pcd(pts[:, :3].astype(np.float32), pts[:, 3], sb)
params, _, aux = resort_spatial(params, init_adam(params), aux, scale_bound=sb)
xyzA, scalesA, rotsA, densA = activate(params, sb)

@jax.jit
def tv_fwd(xyz, scales, rots, dens, center):
    return query(xyz, scales, rots, dens, center=center, n_voxel=(32, 32, 32),
                 s_voxel=(0.25, 0.25, 0.25), active=aux.active,
                 backend="pallas")["vol"]

v = np.asarray(tv_fwd(xyzA, scalesA, rotsA, densA, jnp.zeros(3)))
print("tv fwd ok", v.sum(), flush=True)

def loss(dens, center):
    vol = query(xyzA, scalesA, rotsA, dens, center=center, n_voxel=(32, 32, 32),
                s_voxel=(0.25, 0.25, 0.25), active=aux.active, backend="pallas")["vol"]
    return jnp.sum(jnp.abs(vol))

g = jax.jit(jax.grad(loss))
rng = np.random.default_rng(0)
for i in range(12):
    c = jnp.asarray(rng.uniform(-0.8, 0.8, 3).astype(np.float32))
    gv = np.asarray(g(densA, c))
    print(f"tv bwd ok {i} sum={gv.sum():.4f}", flush=True)
print("ALL OK", flush=True)
