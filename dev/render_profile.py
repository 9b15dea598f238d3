"""Render-path cost split at a saved state: preprocess / fwd / fwd+bwd,
plus per-tier block occupancy."""
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
from r2_gaussian_tpu.models.render import render
from r2_gaussian_tpu.ops import splat2d

ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..")
STATE = sys.argv[1] if len(sys.argv) > 1 else "state_1100.npz"
KERNEL = sys.argv[2] if len(sys.argv) > 2 else "auto"

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
xyz, scales, rots, dens = jax.device_put((xyz, scales, rots, dens))
w2c = jnp.asarray(cams.w2c[0])
fp = jnp.asarray(cams.full_proj[0])
W, H = cams.width, cams.height
kw = dict(w2c=w2c, full_proj=fp, width=W, height=H, tanfovx=cams.tanfovx,
          tanfovy=cams.tanfovy, mode=cams.mode, active=active,
          backend="pallas", footprint="tight", kernel=KERNEL)


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
    p = preprocess(xyz, cov3d, dens, w2c, fp, width=W, height=H,
                   tanfovx=cams.tanfovx, tanfovy=cams.tanfovy, mode=cams.mode,
                   active=active, footprint="tight")
    return p.weight.sum()


def fwd(xyz, scales, rots, dens):
    return render(xyz, scales, rots, dens, **kw)["render"].sum()


print(f"preprocess only : {timeit(jax.jit(prep_only), xyz, scales, rots, dens):7.2f} ms")
print(f"render fwd      : {timeit(jax.jit(fwd), xyz, scales, rots, dens):7.2f} ms")
print(f"render fwd+bwd  : {timeit(jax.jit(jax.grad(fwd, argnums=(0, 1, 2, 3))), xyz, scales, rots, dens):7.2f} ms")

# tier occupancy
cov3d = cov3d_components(scales, rots)
p = preprocess(xyz, cov3d, dens, w2c, fp, width=W, height=H,
               tanfovx=cams.tanfovx, tanfovy=cams.tanfovy, mode=cams.mode,
               active=active, footprint="tight")
img, aux = splat2d.render_pallas(p, width=W, height=H, return_aux=True,
                                 kernel=KERNEL)
for k, v in aux.items():
    try:
        print(f"{k}: {int(v)}")
    except TypeError:
        print(f"{k}: {v}")
# footprint stats
r = np.asarray(p.radius)
r = r[r > 0]
print(f"radius px: p50={np.percentile(r, 50):.0f} p90={np.percentile(r, 90):.0f}"
      f" p99={np.percentile(r, 99):.0f} max={r.max()} n_vis={r.size}")
area = np.minimum(2.0 * r, 512) ** 2
print(f"sum footprint area: {area.sum() / 1e6:.0f} M pairs")
