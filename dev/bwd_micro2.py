"""Split the lr bwd fixed cost: raw bwd pallas call vs dstep[inv] gather."""
import os.path as osp
import sys
import time
import functools

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))
import numpy as np

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from r2_gaussian_tpu.ops import splat2d
from r2_gaussian_tpu.ops.splat2d import (G, NF, K_LR, _VMEM_LIMIT,
                                         _bwd_kernel_lr_multi, _multi_specs,
                                         _pad_parked_out_spec)

H = W = 512
nb = 4096
tiers = ((112, 104),)
rng = np.random.default_rng(0)
kdata = jnp.asarray(rng.standard_normal((nb + 1, NF, G)).astype(np.float32))
gimg = jnp.asarray(rng.standard_normal((H, W)).astype(np.float32))
ids = jnp.arange(nb + 1, dtype=jnp.int32)[:nb] * 0 + nb  # all pads
origins = jnp.zeros((nb,), jnp.int32)
tsel = jnp.zeros((nb,), jnp.int32)
count0 = jnp.zeros((1,), jnp.int32)


def timeit(f, *a, reps=20):
    o = f(*a)
    _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
    t0 = time.time()
    for _i in range(reps):
        o = f(*a)
    _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
    return (time.time() - t0) / reps * 1000


def raw_bwd(kdata, gimg):
    cap = nb
    max_ww = max(ww for _, ww in tiers)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(cap,),
        in_specs=_multi_specs(cap, H, W, True),
        out_specs=_pad_parked_out_spec(NF),
        scratch_shapes=[pltpu.VMEM((max_ww, K_LR * G), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel_lr_multi, tiers=tiers, height=H,
                          width=W),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap + 1, NF, G), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(ids, origins, tsel, count0, kdata, gimg)


print(f"raw bwd call (all pads): {timeit(jax.jit(raw_bwd), kdata, gimg):7.2f} ms",
      flush=True)

dstep = jnp.asarray(rng.standard_normal((nb + 1, NF, G)).astype(np.float32))
inv = jnp.asarray(rng.integers(0, nb, nb + 1).astype(np.int32))


def rowgather(dstep):
    return dstep[inv]


print(f"dstep[inv] row gather   : {timeit(jax.jit(rowgather), dstep):7.2f} ms",
      flush=True)
