"""Isolate per-dispatch overhead from per-iteration compute: time the full
train fn at several steps-per-call K on the same saved state, plus a no-op
donated-carry dispatch round-trip (tunnel RTT + runtime launch floor).

If ms/it falls as K grows, the gap is fixed per-dispatch cost (tunnel RTT,
host sync, XLA launch); if flat, the step is genuinely compute-bound.
"""
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
from r2_gaussian_tpu.models.gaussians import GaussianAux, GaussianParams
from r2_gaussian_tpu.pipeline.optim import init_adam
from r2_gaussian_tpu.pipeline.trainer import TrainState, make_train_fn

ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..")
STATE = sys.argv[1] if len(sys.argv) > 1 else "state_slb_1100.npz"

# --- no-op dispatch round-trip -------------------------------------------
x = jnp.zeros((8, 128), jnp.float32)


@jax.jit
def _noop(a):
    return a + 1.0


_ = np.asarray(_noop(x))
t0 = time.time()
REPS = 20
for _i in range(REPS):
    _ = np.asarray(_noop(x))  # sync every dispatch: full round-trip
print(f"noop dispatch+sync round-trip: "
      f"{(time.time() - t0) / REPS * 1000:.2f} ms", flush=True)

t0 = time.time()
y = x
for _i in range(REPS):
    y = _noop(y)  # async chain, one final sync
_ = np.asarray(y)
print(f"noop async-chained dispatch:   "
      f"{(time.time() - t0) / REPS * 1000:.2f} ms", flush=True)

# --- train-fn K sweep ------------------------------------------------------
d = np.load(osp.join(ROOT, ".bench_data", "slb_256_512_25_50000.npz"),
            allow_pickle=True)
scanner, projs, angles = d["scanner"].item(), d["projs"], d["angles"]
cams = build_cameras(angles, projs, [str(i) for i in range(len(angles))],
                     scanner)
s = np.load(osp.join(ROOT, ".bench_data", STATE))
sb = tuple(float(v) for v in s["scale_bound"])
params = GaussianParams(
    xyz=jnp.asarray(s["xyz"]), scaling=jnp.asarray(s["scaling"]),
    rotation=jnp.asarray(s["rotation"]), density=jnp.asarray(s["density"]),
)
cap = params.xyz.shape[0]
aux = GaussianAux(active=jnp.asarray(s["active"]), max_radii2d=jnp.zeros(cap),
                  xyz_gradient_accum=jnp.zeros(cap), denom=jnp.zeros(cap))
opt = types.SimpleNamespace(
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
N_ROWS = int(os.environ.get("R2G_NROWS", "0")) or None

for K in (10, 20, 50, 100):
    fn = make_train_fn(cameras=cams, scanner_cfg=scanner, opt_cfg=opt,
                       scale_bound=sb, backend="pallas", steps_per_call=K,
                       footprint="tight", kernel="auto", n_rows=N_ROWS)
    views = jnp.arange(K, dtype=jnp.int32) % len(cams)
    keys = jax.random.split(jax.random.PRNGKey(0), K)
    skip = jnp.zeros(K, bool)

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
    dt1 = (time.time() - t0) / K * 1000
    # and a 3-dispatch chain with one sync, state carried (bench-like)
    st = fresh()
    t0 = time.time()
    for _i in range(3):
        st, m = fn(st, views, keys, skip, jnp.int32(0))
    _ = np.asarray(m)
    dt3 = (time.time() - t0) / (3 * K) * 1000
    print(f"K={K:4d}  one-dispatch {dt1:6.2f} ms/it   "
          f"3-chained {dt3:6.2f} ms/it", flush=True)
