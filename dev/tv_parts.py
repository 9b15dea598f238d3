"""Decompose the gather-path TV query cost at a saved state."""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))
import numpy as np

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()
import jax
import jax.numpy as jnp

from r2_gaussian_tpu.models.gaussians import GaussianParams, activate
from r2_gaussian_tpu.models.preprocess import cov3d_components
from r2_gaussian_tpu.models.voxel_preprocess import voxel_preprocess, voxel_touch_mask
from r2_gaussian_tpu.models.render import query
from r2_gaussian_tpu.ops import splat3d
from r2_gaussian_tpu.ops.compaction import G, compact_lanes

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
n = xyz.shape[0]

center = jnp.asarray([0.1, 0.05, -0.1])
sv = jnp.asarray(np.asarray(scanner["dVoxel"]) * 32)

cov3d = cov3d_components(scales, rots)
max_scale = jnp.max(scales, axis=-1)
touch = voxel_touch_mask(xyz, max_scale, center=center, n_voxel=(32, 32, 32),
                         s_voxel=sv, active=active)
tn = np.asarray(touch)
t2 = tn.reshape(-1, G)
print(f"touched lanes: {tn.sum()}  touched blocks: {(t2.any(1)).sum()} of {t2.shape[0]}")


def timeit(f, *a, reps=20):
    o = f(*a)
    jax.block_until_ready(o)
    t0 = time.time()
    for _i in range(reps):
        o = f(*a)
    jax.block_until_ready(o)
    return (time.time() - t0) / reps * 1000


# 1. touch mask alone
f_touch = jax.jit(lambda xyz, ms: voxel_touch_mask(
    xyz, ms, center=center, n_voxel=(32, 32, 32), s_voxel=sv, active=active))
print(f"touch mask fwd          : {timeit(f_touch, xyz, max_scale):7.2f} ms")

# 2. compaction alone (fwd and fwd+bwd)
dens1 = dens.reshape(n)


def comp_only(xyz, cov3d, max_scale, dens1):
    comps_raw = [xyz[:, 0], xyz[:, 1], xyz[:, 2], *cov3d, max_scale, dens1]
    tch = voxel_touch_mask(xyz, max_scale, center=center, n_voxel=(32, 32, 32),
                           s_voxel=sv, active=active)
    sub, handled = compact_lanes(comps_raw, tch, ocap=16384, bcap=1024)
    return sum(c.sum() for c in sub)


print(f"touch+compact fwd       : {timeit(jax.jit(comp_only), xyz, cov3d, max_scale, dens1):7.2f} ms")
print(f"touch+compact fwd+bwd   : {timeit(jax.jit(jax.grad(comp_only, argnums=(0, 1, 2, 3))), xyz, cov3d, max_scale, dens1):7.2f} ms")


# 3. full gather-path query (as trainer uses)
def q(xyz, scales, rots, dens):
    return query(xyz, scales, rots, dens, center=center, n_voxel=(32, 32, 32),
                 s_voxel=sv, active=active, backend="pallas")["vol"].sum()


print(f"query(gather) fwd       : {timeit(jax.jit(q), xyz, scales, rots, dens):7.2f} ms")
print(f"query(gather) fwd+bwd   : {timeit(jax.jit(jax.grad(q, argnums=(0, 1, 2, 3))), xyz, scales, rots, dens):7.2f} ms")


# 4. splat on compacted 16k only (pre-gathered, constant)
comps_raw = [xyz[:, 0], xyz[:, 1], xyz[:, 2], *cov3d, max_scale, dens1]
sub, handled = jax.jit(lambda: compact_lanes(comps_raw, touch, ocap=16384, bcap=1024))()
sub = jax.device_put([np.asarray(c) for c in sub])
print(f"handled lanes: {int(np.asarray(handled).sum())}")


def splat_sub(sub0, sub1, sub2, c0, c1, c2, c3, c4, c5, ms_s, dn_s):
    xyz_sub = jnp.stack([sub0, sub1, sub2], axis=-1)
    prep_sub = voxel_preprocess(
        xyz_sub, (c0, c1, c2, c3, c4, c5), ms_s, dn_s,
        center=center, n_voxel=(32, 32, 32), s_voxel=sv, active=None)
    return splat3d.voxelize_pallas(prep_sub, n_voxel=(32, 32, 32),
                                   window_x=16, window_y=16).sum()


print(f"splat16k fwd            : {timeit(jax.jit(splat_sub), *sub):7.2f} ms")
print(f"splat16k fwd+bwd        : {timeit(jax.jit(jax.grad(splat_sub, argnums=tuple(range(11)))), *sub):7.2f} ms")
