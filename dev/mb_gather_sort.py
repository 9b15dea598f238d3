"""Microbench: XLA gather / sort / segment-sum costs that gate the
tile-binned rasterizer design."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 262_144
M = 1_048_576


def t(fn, *args, reps=20):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps * 1000


rng = np.random.default_rng(0)
feats16 = jnp.asarray(rng.standard_normal((N, 16)).astype(np.float32))
feats8 = feats16[:, :8]
idx_rand = jnp.asarray(rng.integers(0, N, M).astype(np.int32))
idx_sorted = jnp.sort(idx_rand)
# morton-local-ish: sorted blocks of 128 shuffled
ib = np.sort(rng.integers(0, N, M).astype(np.int32)).reshape(-1, 128)
ib = ib[rng.permutation(ib.shape[0])]
idx_blocky = jnp.asarray(ib.reshape(-1))

print("gather (N,16) by 1M rand  ", t(lambda f, i: f[i], feats16, idx_rand), "ms")
print("gather (N,16) by 1M sorted", t(lambda f, i: f[i], feats16, idx_sorted), "ms")
print("gather (N,16) by 1M blocky", t(lambda f, i: f[i], feats16, idx_blocky), "ms")
print("gather (N,8)  by 1M rand  ", t(lambda f, i: f[i], feats8, idx_rand), "ms")
print("take_along 1d (N,) x16 cols",
      t(lambda f, i: jnp.stack([f[:, k][i] for k in range(16)], 1), feats16, idx_rand), "ms")

keys = jnp.asarray(rng.integers(0, 1 << 30, M).astype(np.uint32))
pay1 = jnp.asarray(rng.integers(0, N, M).astype(np.int32))
payf = feats16[:M % N + 0][: 0]  # unused
print("sort 1M keys              ", t(lambda k: jax.lax.sort((k,), num_keys=1), keys), "ms")
print("sort 1M keys+1 payload    ",
      t(lambda k, p: jax.lax.sort((k, p), num_keys=1), keys, pay1), "ms")
print("sort 1M keys+4 payloads   ",
      t(lambda k, p: jax.lax.sort((k, p, p, p, p), num_keys=1), keys, pay1), "ms")
print("argsort 1M                ", t(lambda k: jnp.argsort(k), keys), "ms")

segs = jnp.asarray(np.sort(rng.integers(0, N, M)).astype(np.int32))
vals = jnp.asarray(rng.standard_normal((M, 10)).astype(np.float32))
print("segment_sum 1M->262k x10  ",
      t(lambda v, s: jax.ops.segment_sum(v, s, num_segments=N), vals, segs), "ms")
print("scatter-add 1M->262k x10  ",
      t(lambda v, s: jnp.zeros((N, 10), jnp.float32).at[s].add(v), vals, segs), "ms")

# cumsum/bincount for counting-sort style binning
tiles = jnp.asarray(rng.integers(0, 1024, M).astype(np.int32))
print("bincount 1M->1024         ", t(lambda s: jnp.bincount(s, length=1024), tiles), "ms")
one = jnp.ones((M,), jnp.int32)
print("cumsum 1M                 ", t(lambda x: jnp.cumsum(x), one), "ms")
