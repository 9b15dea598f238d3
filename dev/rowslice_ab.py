"""A/B the trainer row-slice bucket (n_rows) at a saved steady state:
full-capacity step vs params[:n_rows] hot path. Validates metric
equivalence on the real lowering and measures the ms/it win.

Usage: python dev/rowslice_ab.py [state.npz] [n_rows]
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))
import numpy as np

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()
import jax
import jax.numpy as jnp
import types

from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import GaussianAux, GaussianParams
from r2_gaussian_tpu.pipeline.optim import init_adam
from r2_gaussian_tpu.pipeline.trainer import TrainState, make_train_fn

ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..")
STATE = sys.argv[1] if len(sys.argv) > 1 else "state_slb_1100.npz"
N_ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 65536

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
active = np.asarray(s["active"])
n_act = int(active.sum())
print(f"capacity {cap}  n_active {n_act}  bucket {N_ROWS}")
assert active[:n_act].all() and not active[n_act:].any(), "not prefix-compacted"
assert n_act <= N_ROWS < cap
aux = GaussianAux(
    active=jnp.asarray(active),
    max_radii2d=jnp.zeros(cap), xyz_gradient_accum=jnp.zeros(cap),
    denom=jnp.zeros(cap),
)

opt_dict = dict(
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

K = 20
views = jnp.arange(K, dtype=jnp.int32) % len(cams)
keys = jax.random.split(jax.random.PRNGKey(0), K)
skip = jnp.zeros(K, bool)
opt = types.SimpleNamespace(**opt_dict)


def run(n_rows):
    fn = make_train_fn(cameras=cams, scanner_cfg=scanner, opt_cfg=opt,
                       scale_bound=sb, backend="pallas", steps_per_call=K,
                       footprint="tight", kernel="auto", n_rows=n_rows)
    def fresh():
        return TrainState(params=jax.tree.map(jnp.copy, params),
                          adam=init_adam(params),
                          aux=jax.tree.map(jnp.copy, aux))
    st, m = fn(fresh(), views, keys, skip, jnp.int32(0))
    m = np.asarray(m)
    reps, t0 = 3, time.time()
    for _ in range(reps):
        st2, m2 = fn(fresh(), views, keys, skip, jnp.int32(0))
        m2 = np.asarray(m2)
    ms = (time.time() - t0) / (reps * K) * 1000
    # exclude the fresh() copies from timing? they are host-side tree copies
    # of device arrays (cheap vs 20 fused steps); acceptable for an A/B.
    return ms, m2, jax.tree.map(np.asarray, st2.params)


ms_full, m_full, p_full = run(None)
print(f"full capacity : {ms_full:7.2f} ms/it")
ms_sl, m_sl, p_sl = run(N_ROWS)
print(f"sliced {N_ROWS:6d}: {ms_sl:7.2f} ms/it  ({ms_full / ms_sl:.2f}x)")
dm = np.abs(m_full - m_sl).max()
print(f"metrics max |diff| {dm:.3e}")
dp = max(float(np.abs(getattr(p_full, f) - getattr(p_sl, f)).max())
         for f in p_full._fields)
print(f"params  max |diff| {dp:.3e}")
# Losses must match to reduction-order tolerance. Params may differ by
# O(lr) on elements whose near-zero gradient flips sign under the other
# shape's reduction tiling (Adam's first step is exactly lr*sign(g)) —
# same as the CPU analysis in tests/test_row_slice.py.
assert dm < 1e-5, "sliced losses diverge from full capacity"
assert dp < 5e-3, "sliced params diverge beyond Adam sign-step noise"
print("ROWSLICE AB OK")
