"""Bisect the lr backward cost: raw pallas bwd call alone, + mask epilogue,
via custom_vjp grad — at the steady-state population."""
import functools
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))
import numpy as np

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def timeit(f, *a, reps=30):
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
feats = splat2d._build_features_lr(prep)
comps_lr = splat2d._pad_components(
    feats[0] if isinstance(feats, tuple) else feats, 0)
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
ids = jnp.nonzero(assigned, size=nb, fill_value=nb)[0].astype(jnp.int32)
safe = jnp.minimum(ids, nb - 1)
origins = jnp.where(ids < nb, origin[safe], 0).astype(jnp.int32)
tsel = jnp.where(ids < nb, tier_of[safe], 0).astype(jnp.int32)
count = jnp.sum(assigned.astype(jnp.int32))[None]
print("nb:", nb, "assigned:", int(count[0]))
kdata_lr, ids, origins, tsel = jax.device_put((kdata_lr, ids, origins, tsel))
gimg = jnp.ones((H, W), jnp.float32)
cap = nb
nbp1 = kdata_lr.shape[0]
NF = splat2d.NF


def raw_bwd(kd, gi):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(cap,),
        in_specs=splat2d._multi_specs(cap, H, W, True, gg=gg),
        out_specs=splat2d._grad_rows_out_spec(NF, gg=gg),
        scratch_shapes=[pltpu.VMEM((max(ww for _, ww in tiers),
                                    splat2d.K_LR * gg), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(splat2d._bwd_kernel_lr_multi, tiers=tuple(tiers),
                          height=H, width=W),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbp1, NF, gg), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=splat2d._VMEM_LIMIT),
    )(ids, origins, tsel, count, kd, gi)


print(f"raw pallas bwd:        {timeit(jax.jit(raw_bwd), kdata_lr, gimg):7.2f} ms")


def bwd_masked(kd, gi):
    return splat2d._mask_unvisited_rows(raw_bwd(kd, gi), ids)


print(f"raw bwd + mask:        {timeit(jax.jit(bwd_masked), kdata_lr, gimg):7.2f} ms")


def mask_only(x):
    return splat2d._mask_unvisited_rows(x, ids)


x0 = jnp.zeros((nbp1, NF, gg), jnp.float32)
print(f"mask only:             {timeit(jax.jit(mask_only), x0):7.2f} ms")


def fwd_only(kd):
    return splat2d._splat_multi_lr(kd, ids, origins, tsel, count, H, W,
                                   tuple(tiers))


print(f"fwd (custom_vjp prim): {timeit(jax.jit(fwd_only), kdata_lr):7.2f} ms")


def grad_full(kd):
    return jax.grad(lambda k: fwd_only(k).sum())(kd)


print(f"grad via custom_vjp:   {timeit(jax.jit(grad_full), kdata_lr):7.2f} ms")
