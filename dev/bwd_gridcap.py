"""Measure lr-kernel fwd/bwd wall time vs the static ids-capacity (grid
size): isolates the per-grid-step cost of the backward's pad steps, which
motivates slicing the train-path row count to an n_active bucket (the state
is Morton-compacted at densify events, so active rows are a prefix)."""
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
s = np.load(osp.join(ROOT, ".bench_data", "state_slb_1100.npz"))
sb = tuple(float(v) for v in s["scale_bound"])
params = GaussianParams(
    xyz=jnp.asarray(s["xyz"]), scaling=jnp.asarray(s["scaling"]),
    rotation=jnp.asarray(s["rotation"]), density=jnp.asarray(s["density"]),
)
active = jnp.asarray(s["active"])
xyz, scales, rots, dens = activate(params, sb)
W, H = cams.width, cams.height


def timeit(f, *a, reps=20):
    o = f(*a)
    _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
    t0 = time.time()
    for _i in range(reps):
        o = f(*a)
    _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
    return (time.time() - t0) / reps * 1000


cov3d = cov3d_components(scales, rots)
prep = preprocess(xyz, cov3d, dens, jnp.asarray(cams.w2c[0]),
                  jnp.asarray(cams.full_proj[0]), width=W, height=H,
                  tanfovx=cams.tanfovx, tanfovy=cams.tanfovy, mode=cams.mode,
                  active=active, footprint="tight")

gg = splat2d.G * splat2d.GROUP
comps_lr = splat2d._pad_components(splat2d._build_features_lr(prep)[0]
                                   if isinstance(splat2d._build_features_lr(prep), tuple)
                                   else splat2d._build_features_lr(prep), 0)
n = comps_lr[0].shape[0]
nb = n // gg
kdata_lr = splat2d._kdata_from_components(comps_lr, nb, gg)
_, bxlo, bxhi, bylo, byhi, lhas = splat2d._block_bboxes(comps_lr, nb, gg)

tiers = [(64, 56), (112, 104), (176, 168), (240, 232), (336, 328), (512, 512)]
nt = len(tiers)
tier_of = jnp.full((nb,), nt, jnp.int32)
origin = jnp.zeros((nb,), jnp.int32)
assigned = jnp.zeros((nb,), bool)
for ti, (wh, ww) in enumerate(tiers):
    ox = jnp.clip(bxlo.astype(jnp.int32), 0, W - ww)
    oy = jnp.clip((bylo.astype(jnp.int32) // 8) * 8, 0, ((H - wh) // 8) * 8)
    fits = (bxhi <= (ox + ww).astype(jnp.float32)) & (
        byhi <= (oy + wh).astype(jnp.float32))
    mine = fits & ~assigned & lhas
    assigned = assigned | mine
    tier_of = jnp.where(mine, ti, tier_of)
    origin = jnp.where(mine, ox | (oy << 16), origin)
ids_full = jnp.nonzero(assigned, size=nb, fill_value=nb)[0].astype(jnp.int32)
safe = jnp.minimum(ids_full, nb - 1)
origins_full = jnp.where(ids_full < nb, origin[safe], 0).astype(jnp.int32)
tsel_full = jnp.where(ids_full < nb, tier_of[safe], 0).astype(jnp.int32)
count = jnp.sum(assigned.astype(jnp.int32))[None]
print("nb:", nb, "assigned blocks:", int(count[0]), "gg:", gg)

for cap in (nb, nb // 2, nb // 4, 288):
    ids = ids_full[:cap]
    origins = origins_full[:cap]
    tsel = tsel_full[:cap]
    kdata, idsd, orgd, tsd = jax.device_put((kdata_lr, ids, origins, tsel))

    def call(kd):
        return splat2d._splat_multi_lr(kd, idsd, orgd, tsd, count, H, W,
                                       tuple(tiers)).sum()

    f = jax.jit(call)
    fb = jax.jit(jax.grad(call))
    print(f"cap={cap:5d}: fwd {timeit(f, kdata):7.2f} ms   "
          f"fwd+bwd {timeit(fb, kdata):7.2f} ms", flush=True)
