"""Micro-profile the gather-path glue ops at N=524288, CAP=16384."""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))
import numpy as np

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()
import jax
import jax.numpy as jnp

N, CAP = 524288, 16384
rng = np.random.default_rng(0)
mask = jnp.asarray(rng.random(N) < 0.002)
comps = [jnp.asarray(rng.standard_normal(N).astype(np.float32))
         for _ in range(16)]
g16 = [jnp.asarray(rng.standard_normal(CAP).astype(np.float32))
       for _ in range(16)]


def timeit(f, *a, reps=50):
    o = f(*a)
    _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
    t0 = time.time()
    for _i in range(reps):
        o = f(*a)
    _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
    return (time.time() - t0) / reps * 1000


def f_cumsum(m):
    return jnp.cumsum(m.astype(jnp.int32))


def f_nonzero(m):
    return jnp.nonzero(m, size=CAP, fill_value=N)[0]


def f_inv_scatter(m):
    idx = jnp.nonzero(m, size=CAP, fill_value=N)[0]
    inv = jnp.full((N + 1,), CAP, jnp.int32)
    return inv.at[idx].set(jnp.arange(CAP, dtype=jnp.int32), mode="drop")


def f_inv_cnt(m):
    cnt = jnp.cumsum(m.astype(jnp.int32))
    return jnp.where(m & (cnt <= CAP), cnt - 1, CAP)


def f_gather16(m, *cs):
    idx = jnp.nonzero(m, size=CAP, fill_value=N)[0]
    return [jnp.concatenate([c, jnp.zeros((1,), c.dtype)])[idx] for c in cs]


def f_bwd_gather16(m, *gs):
    cnt = jnp.cumsum(m.astype(jnp.int32))
    inv = jnp.where(m & (cnt <= CAP), cnt - 1, CAP)
    return [jnp.concatenate([g, jnp.zeros((1,), g.dtype)])[inv] for g in gs]


print(f"cumsum           : {timeit(jax.jit(f_cumsum), mask):7.2f} ms")
print(f"nonzero cap16k   : {timeit(jax.jit(f_nonzero), mask):7.2f} ms")
print(f"inv via scatter  : {timeit(jax.jit(f_inv_scatter), mask):7.2f} ms")
print(f"inv via cnt      : {timeit(jax.jit(f_inv_cnt), mask):7.2f} ms")
print(f"fwd 16x gather   : {timeit(jax.jit(f_gather16), mask, *comps):7.2f} ms")
print(f"bwd 16x gather   : {timeit(jax.jit(f_bwd_gather16), mask, *g16):7.2f} ms")
