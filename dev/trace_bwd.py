"""Capture a jax.profiler trace of the lr-multi bwd at count=0 and full."""
import glob
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
d = np.load(osp.join(ROOT, ".bench_data", "sl_256_512_25_50000.npz"),
            allow_pickle=True)
scanner = d["scanner"].item()
projs, angles = d["projs"], d["angles"]
cams = build_cameras(angles, projs, [str(i) for i in range(len(angles))],
                     scanner)
s = np.load(osp.join(ROOT, ".bench_data", "state_1100.npz"))
sb = tuple(float(v) for v in s["scale_bound"])
params = GaussianParams(
    xyz=jnp.asarray(s["xyz"]), scaling=jnp.asarray(s["scaling"]),
    rotation=jnp.asarray(s["rotation"]), density=jnp.asarray(s["density"]),
)
active = jnp.asarray(s["active"])
xyz, scales, rots, dens = activate(params, sb)
kw = dict(w2c=jnp.asarray(cams.w2c[0]), full_proj=jnp.asarray(cams.full_proj[0]),
          width=cams.width, height=cams.height, tanfovx=cams.tanfovx,
          tanfovy=cams.tanfovy, mode=cams.mode, backend="pallas",
          footprint="tight", kernel="auto", active=active)


def fwd(xyz, scales, rots, dens):
    return render(xyz, scales, rots, dens, **kw)["render"].sum()


fb = jax.jit(jax.grad(fwd, argnums=(0, 1, 2, 3)))
o = fb(xyz, scales, rots, dens)
_ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]

with jax.profiler.trace("/tmp/jax_trace"):
    for _i in range(5):
        o = fb(xyz, scales, rots, dens)
    _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
print("trace done")
print(glob.glob("/tmp/jax_trace/**/*", recursive=True)[:20])
