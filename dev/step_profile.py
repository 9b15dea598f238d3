"""Decompose the training-step cost at a saved state: render-only vs +ssim
vs +tv vs full, plus TV-query and optimizer in isolation."""
import os
import os.path as osp
import sys
import time
import types

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))
import numpy as np

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()
import jax
import jax.numpy as jnp

from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import GaussianAux, GaussianParams, activate
from r2_gaussian_tpu.models.render import query
from r2_gaussian_tpu.pipeline.optim import init_adam
from r2_gaussian_tpu.pipeline.trainer import TrainState, make_train_fn

ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..")
STATE = sys.argv[1] if len(sys.argv) > 1 else "state_1100.npz"
KERNEL = sys.argv[2] if len(sys.argv) > 2 else "auto"

d = np.load(osp.join(ROOT, ".bench_data", "slb_256_512_25_50000.npz"),
            allow_pickle=True)
scanner, projs, angles = d["scanner"].item(), d["projs"], d["angles"]
cams = build_cameras(angles, projs, [str(i) for i in range(len(angles))], scanner)
s = np.load(osp.join(ROOT, ".bench_data", STATE))
sb = tuple(float(v) for v in s["scale_bound"])
params = GaussianParams(
    xyz=jnp.asarray(s["xyz"]), scaling=jnp.asarray(s["scaling"]),
    rotation=jnp.asarray(s["rotation"]), density=jnp.asarray(s["density"]),
)
cap = params.xyz.shape[0]
aux = GaussianAux(
    active=jnp.asarray(s["active"]),
    max_radii2d=jnp.zeros(cap), xyz_gradient_accum=jnp.zeros(cap),
    denom=jnp.zeros(cap),
)
print("n_active", int(np.asarray(aux.active).sum()))


def mkopt(**kw):
    dd = dict(
        iterations=10**7,
        position_lr_init=2e-4, position_lr_final=2e-5, position_lr_max_steps=30000,
        density_lr_init=1e-2, density_lr_final=1e-3, density_lr_max_steps=30000,
        scaling_lr_init=5e-3, scaling_lr_final=5e-4, scaling_lr_max_steps=30000,
        rotation_lr_init=1e-3, rotation_lr_final=1e-4, rotation_lr_max_steps=30000,
        lambda_dssim=0.25, lambda_tv=0.05, tv_vol_size=32,
        density_min_threshold=1e-5, densification_interval=100,
        densify_from_iter=500, densify_until_iter=0,
        densify_grad_threshold=5e-5, densify_scale_threshold=0.1,
        max_screen_size=None, max_scale=None, max_num_gaussians=500_000,
    )
    dd.update(kw)
    return types.SimpleNamespace(**dd)


K = 20
rngk = jax.random.PRNGKey(0)
views = jnp.arange(K, dtype=jnp.int32) % len(cams)
keys = jax.random.split(rngk, K)
skip = jnp.zeros(K, bool)


N_ROWS = int(os.environ.get("R2G_NROWS", "0")) or None  # trainer row bucket


def measure(name, opt):
    fn = make_train_fn(cameras=cams, scanner_cfg=scanner, opt_cfg=opt,
                       scale_bound=sb, backend="pallas", steps_per_call=K,
                       footprint="tight", kernel=KERNEL, n_rows=N_ROWS)
    def fresh():
        return TrainState(params=jax.tree.map(jnp.copy, params),
                          adam=init_adam(params),
                          aux=jax.tree.map(jnp.copy, aux))
    st, m = fn(fresh(), views, keys, skip, jnp.int32(0))
    _ = np.asarray(m)
    st = fresh()
    t0 = time.time()
    st, m = fn(st, views, keys, skip, jnp.int32(0))
    _ = np.asarray(m)
    print(f"{name:28s} {(time.time() - t0) / K * 1000:8.1f} ms/it", flush=True)


# R2G_PROFILE_ONLY=full: skip the decomposition arms (each arm is a fresh
# XLA executable — through the tunnel's remote AOT compiler a cold shape
# costs minutes, so A/B sweeps over kernel configs measure just the full
# step)
if os.environ.get("R2G_PROFILE_ONLY") == "full":
    measure("full", mkopt())
    sys.exit(0)
measure("l1 only", mkopt(lambda_tv=0.0, lambda_dssim=0.0))
measure("l1+ssim", mkopt(lambda_tv=0.0))
measure("l1+tv", mkopt(lambda_dssim=0.0))
measure("full", mkopt())

# TV query alone (fwd + bwd)
xyz, scales, rots, dens = activate(params, sb)
center = jnp.asarray([0.1, 0.05, -0.1])
sv = jnp.asarray(np.asarray(scanner["dVoxel"]) * 32)


def tvq(xyz, scales, rots, dens):
    return query(xyz, scales, rots, dens, center=center, n_voxel=(32, 32, 32),
                 s_voxel=sv, active=aux.active, backend="pallas")["vol"].sum()


def timeit(f, *a, reps=10):
    o = f(*a); _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
    t0 = time.time()
    for _i in range(reps):
        o = f(*a)
    _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
    return (time.time() - t0) / reps * 1000


print(f"tv query fwd: {timeit(jax.jit(tvq), xyz, scales, rots, dens):.1f} ms")
print(f"tv query fwd+bwd: {timeit(jax.jit(jax.grad(tvq, argnums=(0, 1, 2, 3))), xyz, scales, rots, dens):.1f} ms")
