"""Trace one full train dispatch at a saved state; print top device ops."""
import os
import os.path as osp
import sys, time, types, glob, gzip, json, collections

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
STATE = sys.argv[1] if len(sys.argv) > 1 else "state_1100.npz"
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
K = 10
N_ROWS = int(os.environ.get("R2G_NROWS", "0")) or None  # trainer row bucket
fn = make_train_fn(cameras=cams, scanner_cfg=scanner, opt_cfg=opt,
                   scale_bound=sb, backend="pallas", steps_per_call=K,
                   footprint="tight", kernel="auto", n_rows=N_ROWS)
views = jnp.arange(K, dtype=jnp.int32) % len(cams)
keys = jax.random.split(jax.random.PRNGKey(0), K)
skip = jnp.zeros(K, bool)


def fresh():
    return TrainState(params=jax.tree.map(jnp.copy, params),
                      adam=init_adam(params), aux=jax.tree.map(jnp.copy, aux))


st, m = fn(fresh(), views, keys, skip, jnp.int32(0))
_ = np.asarray(m)
import shutil
shutil.rmtree("/tmp/jax_trace2", ignore_errors=True)
with jax.profiler.trace("/tmp/jax_trace2"):
    st, m = fn(fresh(), views, keys, skip, jnp.int32(0))
    _ = np.asarray(m)

f = glob.glob("/tmp/jax_trace2/**/*.trace.json.gz", recursive=True)[0]
with gzip.open(f) as fh:
    tr = json.load(fh)
ev = [e for e in tr['traceEvents'] if e.get('ph') == 'X' and e.get('pid') == 3]
durs = collections.defaultdict(float)
cnts = collections.Counter()
for e in ev:
    durs[e['name']] += e.get('dur', 0)
    cnts[e['name']] += 1
top = sorted(durs.items(), key=lambda kv: -kv[1])[:35]
for name, dur in top:
    print(f"{dur/1000/K:9.3f} ms/it x{cnts[name]//K:5d}  {name[:90]}")
