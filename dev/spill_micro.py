"""Is the render bwd dominated by the spill nonzero+gather glue?"""
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
mask = jnp.asarray(rng.random(N) < 0.005)
comps = [jnp.asarray(rng.standard_normal(N).astype(np.float32))
         for _ in range(10)]


def timeit(f, *a, reps=30):
    o = f(*a)
    _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
    t0 = time.time()
    for _i in range(reps):
        o = f(*a)
    _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
    return (time.time() - t0) / reps * 1000


def spill_fwd(*cs):
    spill = mask & (jnp.cumsum(mask.astype(jnp.int32)) <= CAP)
    sidx = jnp.nonzero(spill, size=CAP, fill_value=N)[0]
    ext = [jnp.concatenate([c, jnp.zeros((1,), c.dtype)]) for c in cs]
    sub = [c[sidx] for c in ext]
    return sum(s.sum() for s in sub)


print(f"spill glue fwd    : {timeit(jax.jit(spill_fwd), *comps):7.2f} ms")
print(f"spill glue fwd+bwd: {timeit(jax.jit(jax.grad(spill_fwd, argnums=tuple(range(10)))), *comps):7.2f} ms")
