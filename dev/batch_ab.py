"""A/B the batched-step splat path (R2G_SPLAT_BATCH) against the legacy
ids-compacted path at a saved state. Usage:
    R2G_SPLAT_BATCH=4 python dev/batch_ab.py state_1100.npz
(the env var is read at import; run once per setting and compare)."""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))
import numpy as np

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()
import jax
import jax.numpy as jnp

import r2_gaussian_tpu.ops.splat2d as s2
from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import GaussianParams, activate
from r2_gaussian_tpu.models.preprocess import cov3d_components, preprocess
from r2_gaussian_tpu.models.render import render

ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..")
STATE = sys.argv[1] if len(sys.argv) > 1 else "state_1100.npz"

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
active = jnp.asarray(s["active"])
xyz, scales, rots, dens = activate(params, sb)
w2c = jnp.asarray(cams.w2c[0])
fp = jnp.asarray(cams.full_proj[0])
W, H = cams.width, cams.height
kw = dict(w2c=w2c, full_proj=fp, width=W, height=H, tanfovx=cams.tanfovx,
          tanfovy=cams.tanfovy, mode=cams.mode, active=active,
          backend="pallas", footprint="tight", kernel="auto")


def timeit(f, *a, reps=20):
    o = f(*a)
    jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(reps):
        o = f(*a)
    jax.block_until_ready(o)
    return (time.time() - t0) / reps * 1000


def fwd(xyz, scales, rots, dens):
    return render(xyz, scales, rots, dens, **kw)["render"].sum()


print(f"SPLAT_BATCH={s2.SPLAT_BATCH}")
print(f"render fwd      : {timeit(jax.jit(fwd), xyz, scales, rots, dens):7.2f} ms")
print(f"render fwd+bwd  : {timeit(jax.jit(jax.grad(fwd, argnums=(0, 1, 2, 3))), xyz, scales, rots, dens):7.2f} ms")
