"""Measure pad-step overhead of the tier grids: render with ~0 active
gaussians at full padded capacity — all cost is grid pads + glue."""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))
import numpy as np

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()
import jax
import jax.numpy as jnp

from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import GaussianParams, activate
from r2_gaussian_tpu.models.render import render

ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..")
d = np.load(osp.join(ROOT, ".bench_data", "slb_256_512_25_50000.npz"),
            allow_pickle=True)
scanner, projs, angles = d["scanner"].item(), d["projs"], d["angles"]
cams = build_cameras(angles, projs, [str(i) for i in range(len(angles))],
                     scanner)
s = np.load(osp.join(ROOT, ".bench_data", "state_1100.npz"))
sb = tuple(float(v) for v in s["scale_bound"])
params = GaussianParams(
    xyz=jnp.asarray(s["xyz"]), scaling=jnp.asarray(s["scaling"]),
    rotation=jnp.asarray(s["rotation"]), density=jnp.asarray(s["density"]),
)
n = params.xyz.shape[0]
xyz, scales, rots, dens = activate(params, sb)
kw = dict(w2c=jnp.asarray(cams.w2c[0]), full_proj=jnp.asarray(cams.full_proj[0]),
          width=cams.width, height=cams.height, tanfovx=cams.tanfovx,
          tanfovy=cams.tanfovy, mode=cams.mode, backend="pallas",
          footprint="tight", kernel="auto")


def timeit(f, *a, reps=20):
    o = f(*a)
    _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
    t0 = time.time()
    for _i in range(reps):
        o = f(*a)
    _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
    return (time.time() - t0) / reps * 1000


for frac in (0.0, 0.01, 1.0):
    k = int(n * frac)
    active = jnp.arange(n) < k

    def fwd(xyz, scales, rots, dens, active=active):
        return render(xyz, scales, rots, dens, active=active, **kw)["render"].sum()

    t_f = timeit(jax.jit(fwd), xyz, scales, rots, dens)
    t_fb = timeit(jax.jit(jax.grad(fwd, argnums=(0, 1, 2, 3))), xyz, scales,
                  rots, dens)
    print(f"active={frac:5.2f} fwd {t_f:7.2f} ms   fwd+bwd {t_fb:7.2f} ms",
          flush=True)
