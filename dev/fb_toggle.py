"""Toggle the dense fallback + measure render fwd+bwd directly."""
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
from r2_gaussian_tpu.models.preprocess import cov3d_components, preprocess
from r2_gaussian_tpu.ops import splat2d

ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..")
d = np.load(osp.join(ROOT, ".bench_data", "slb_256_512_25_50000.npz"),
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
W, H = cams.width, cams.height
w2c = jnp.asarray(cams.w2c[0])
fp = jnp.asarray(cams.full_proj[0])


def timeit(f, *a, reps=20):
    o = f(*a)
    _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
    t0 = time.time()
    for _i in range(reps):
        o = f(*a)
    _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
    return (time.time() - t0) / reps * 1000


for dense_cap in (4096, 0):
    cfg = splat2d.SplatConfig(dense_cap=dense_cap)

    def fwd(xyz, scales, rots, dens, cfg=cfg):
        cov3d = cov3d_components(scales, rots)
        prep = preprocess(xyz, cov3d, dens, w2c, fp, width=W, height=H,
                          tanfovx=cams.tanfovx, tanfovy=cams.tanfovy,
                          mode=cams.mode, active=active, footprint="tight")
        return splat2d.render_pallas(prep, width=W, height=H, config=cfg,
                                     kernel="auto").sum()

    print(f"dense_cap={dense_cap}: fwd {timeit(jax.jit(fwd), xyz, scales, rots, dens):7.2f} ms   "
          f"fwd+bwd {timeit(jax.jit(jax.grad(fwd, argnums=(0, 1, 2, 3))), xyz, scales, rots, dens):7.2f} ms",
          flush=True)
