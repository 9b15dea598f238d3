"""Kernel-only profiler at a saved training state.

Measures render forward / forward+backward wall time and reports tier
occupancy + evaluated-pair accounting for the current splat2d kernel,
plus the footprint-area floor (sum of px_bounds areas), weight and
conic-correlation distributions (for alpha-shrink / low-rank headroom).
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

from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import GaussianParams, activate
from r2_gaussian_tpu.models.preprocess import build_cov3d, preprocess
from r2_gaussian_tpu.ops import splat2d

ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..")
STATE = sys.argv[1] if len(sys.argv) > 1 else "state_1100.npz"
KERNEL = sys.argv[2] if len(sys.argv) > 2 else "direct"

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
active = jnp.asarray(s["active"])
print("n_active", int(np.asarray(active).sum()), "cap", params.xyz.shape[0])

xyz, scales, rots, dens = activate(params, sb)
w2c, fp = jnp.asarray(cams.w2c[0]), jnp.asarray(cams.full_proj[0])
W = H = 512

def prep_fn(xyz, scales, rots, dens):
    cov3d = build_cov3d(scales, rots)
    return preprocess(xyz, cov3d, dens, w2c, fp, width=W, height=H,
                      tanfovx=cams.tanfovx, tanfovy=cams.tanfovy,
                      mode=cams.mode, active=active, footprint="tight")

prep = jax.jit(prep_fn)(xyz, scales, rots, dens)

# --- distribution stats -------------------------------------------------
wgt = np.asarray(prep.weight)
live = wgt > 0
b = np.asarray(prep.px_bounds)[live]
area = (b[:, 1] - b[:, 0]) * (b[:, 3] - b[:, 2])
print(f"footprint-area floor: {area.sum()/1e6:.0f} M pairs")
print("weight pct:", {q: float(np.percentile(wgt[live], q)) for q in (1, 10, 50, 90, 99)})
conic = np.asarray(prep.conic)[live]
rho2 = conic[:, 1] ** 2 / np.maximum(conic[:, 0] * conic[:, 2], 1e-30)
print("|rho| pct:", {q: round(float(np.sqrt(np.percentile(rho2, q))), 3)
                     for q in (50, 75, 90, 99, 100)})
# alpha-aware effective radius vs 3-sigma
r3 = np.asarray(prep.radius)[live].astype(np.float64)
lam1 = (r3 / 3.0) ** 2
ln_t = np.log(np.maximum(wgt[live], 1e-30) / 1e-5)
r_alpha = np.sqrt(np.maximum(2 * lam1 * ln_t, 0.0))
r_eff = np.minimum(r3, np.ceil(r_alpha))
print(f"alpha-aware area: {np.sum((2*r_eff+1)**2)/1e6:.0f} M "
      f"(3-sigma {np.sum((2*r3+1)**2)/1e6:.0f} M)")

# --- tier occupancy + evaluated pairs -----------------------------------
img, aux = splat2d.render_pallas(prep, width=W, height=H, return_aux=True, kernel=KERNEL)
cfg = splat2d.DEFAULT_CONFIG
tiers = [(min(wh, (H // 16) * 16), min(ww, W)) for wh, ww in cfg.tiers]
if H % 16 == 0:
    tiers.append((H, W))
seen, tu = set(), []
for t in tiers:
    if t not in seen:
        seen.add(t)
        tu.append(t)
pairs = 0
for i, t in enumerate(tu):
    cnt = int(np.asarray(aux.get(f"tier{i}_blocks", 0)))
    scnt = int(np.asarray(aux.get(f"spill_tier{i}_blocks", 0)))
    lcnt = int(np.asarray(aux.get(f"lr_tier{i}_blocks", 0)))
    pairs += (cnt + lcnt + scnt) * t[0] * t[1] * splat2d.G
    print(f"tier {t}: {cnt} direct / {scnt} spill / {lcnt} lowrank blocks")
print(f"fallback: {int(np.asarray(aux['fallback_count']))} spill_count: {int(np.asarray(aux.get('spill_count', 0)))}")
print(f"kernel evaluated pairs: {pairs/1e6:.0f} M")

# --- timings -------------------------------------------------------------
fwd = jax.jit(lambda *a: splat2d.render_pallas(prep_fn(*a), width=W, height=H, kernel=KERNEL))
gt = jnp.asarray(projs[0])

def loss(*a):
    return jnp.abs(fwd(*a) - gt).mean()

g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
args = (xyz, scales, rots, dens)

def timeit(f, touch, reps=10):
    o = f(*args); _ = np.asarray(touch(o))
    t0 = time.time()
    for _i in range(reps):
        o = f(*args)
    _ = np.asarray(touch(o))
    return (time.time() - t0) / reps * 1000

print(f"fwd: {timeit(fwd, lambda o: o[0, 0]):.1f} ms")
print(f"fwd+bwd: {timeit(g, lambda o: o[0][0, 0]):.1f} ms")
