"""Isolate the TV-query cost: kernel grid size (candidate_cap) vs glue."""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))
import numpy as np

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()
import jax
import jax.numpy as jnp

from r2_gaussian_tpu.models.gaussians import GaussianAux, GaussianParams, activate
from r2_gaussian_tpu.models.preprocess import cov3d_components
from r2_gaussian_tpu.models.voxel_preprocess import voxel_preprocess
from r2_gaussian_tpu.ops import splat3d

ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..")
STATE = sys.argv[1] if len(sys.argv) > 1 else "state_1100.npz"

d = np.load(osp.join(ROOT, ".bench_data", "slb_256_512_25_50000.npz"),
            allow_pickle=True)
scanner = d["scanner"].item()
s = np.load(osp.join(ROOT, ".bench_data", STATE))
sb = tuple(float(v) for v in s["scale_bound"])
params = GaussianParams(
    xyz=jnp.asarray(s["xyz"]), scaling=jnp.asarray(s["scaling"]),
    rotation=jnp.asarray(s["rotation"]), density=jnp.asarray(s["density"]),
)
active = jnp.asarray(s["active"])
xyz, scales, rots, dens = activate(params, sb)
xyz, scales, rots, dens = jax.device_put((xyz, scales, rots, dens))

center = jnp.asarray([0.1, 0.05, -0.1])
sv = jnp.asarray(np.asarray(scanner["dVoxel"]) * 32)


def timeit(f, *a, reps=20):
    o = f(*a)
    _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
    t0 = time.time()
    for _i in range(reps):
        o = f(*a)
    _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
    return (time.time() - t0) / reps * 1000


def prep_only(xyz, scales, rots, dens):
    cov3d = cov3d_components(scales, rots)
    max_scale = jnp.max(scales, axis=-1)
    p = voxel_preprocess(xyz, cov3d, max_scale, dens, center=center,
                        n_voxel=(32, 32, 32), s_voxel=sv, active=active)
    return p.weight.sum()


def q_cap(cap):
    def f(xyz, scales, rots, dens):
        cov3d = cov3d_components(scales, rots)
        max_scale = jnp.max(scales, axis=-1)
        p = voxel_preprocess(xyz, cov3d, max_scale, dens, center=center,
                            n_voxel=(32, 32, 32), s_voxel=sv, active=active)
        return splat3d.voxelize_pallas(p, n_voxel=(32, 32, 32),
                                       candidate_cap=cap).sum()
    return f


# how many blocks actually overlap?
cov3d = cov3d_components(scales, rots)
max_scale = jnp.max(scales, axis=-1)
p = voxel_preprocess(xyz, cov3d, max_scale, dens, center=center,
                    n_voxel=(32, 32, 32), s_voxel=sv, active=active)
w = np.asarray(p.weight).reshape(-1, 128) > 0
print("blocks with any valid member:", int(np.any(w, 1).sum()),
      "of", w.shape[0])

print(f"preprocess only          : {timeit(jax.jit(prep_only), xyz, scales, rots, dens):7.2f} ms")
for cap in (None, 1024, 512, 256):
    f = jax.jit(q_cap(cap))
    fb = jax.jit(jax.grad(q_cap(cap), argnums=(0, 1, 2, 3)))
    print(f"fwd cap={str(cap):5s}          : {timeit(f, xyz, scales, rots, dens):7.2f} ms")
    print(f"fwd+bwd cap={str(cap):5s}      : {timeit(fb, xyz, scales, rots, dens):7.2f} ms")
