"""Microbench: Pallas dynamic-offset patch accumulate into a VMEM image.

Simulates the per-gaussian-window design: each grid step handles a block of
128 gaussians; for each gaussian, add a (W, W) patch into a (512, 512) VMEM
image at a per-gaussian dynamic (oy, ox) offset. Measures the cost of
unaligned dynamic-slice read-modify-writes (sublane offset arbitrary, lane
offset arbitrary) — the one primitive that would make pair-optimal
per-gaussian windows viable.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = W = 512
G = 128  # gaussians per block


def kernel(oxy_ref, data_ref, out_ref, img, *, win, nsteps, align):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        img[...] = jnp.zeros_like(img)

    base = jax.lax.broadcasted_iota(jnp.int32, (win, win), 0).astype(jnp.float32) + data_ref[0, 0, 0]

    def one(g, acc):
        packed = oxy_ref[i * G + g]
        ox = packed & 0xFFFF
        oy = packed >> 16
        if align:
            ox = pl.multiple_of(ox, 128)
            oy = pl.multiple_of(oy, 8)
        patch = base * acc
        cur = img[pl.ds(oy, win), pl.ds(ox, win)]
        img[pl.ds(oy, win), pl.ds(ox, win)] = cur + patch
        return acc + 1.0

    jax.lax.fori_loop(0, G, one, 0.0)

    @pl.when(i == nsteps - 1)
    def _():
        out_ref[...] = img[...]


def run(nblocks, win, align):
    rng = np.random.default_rng(0)
    if align:
        ox = rng.integers(0, (W - win) // 128 + 1, nblocks * G) * 128
        oy = rng.integers(0, (H - win) // 8, nblocks * G) * 8
    else:
        ox = rng.integers(0, W - win, nblocks * G)
        oy = rng.integers(0, H - win, nblocks * G)
    oxy = jnp.asarray((ox | (oy << 16)).astype(np.int32))
    data = jnp.asarray(rng.standard_normal((nblocks, 8, G)).astype(np.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((1, 8, G), lambda i, o: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((H, W), lambda i, o: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((H, W), jnp.float32)],
    )
    f = pl.pallas_call(
        functools.partial(kernel, win=win, nsteps=nblocks, align=align),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    jf = jax.jit(lambda o, d: f(o, d))
    out = jf(oxy, data); _ = np.asarray(out[0, 0])
    reps = 10
    t0 = time.time()
    prev = jnp.float32(0)
    for _ in range(reps):
        out = jf(oxy + (prev.astype(jnp.int32) & 0), data)
        prev = out[0, 0]
    _ = np.asarray(prev)
    dt = (time.time() - t0) / reps * 1000
    n_patch = nblocks * G
    print(f"win={win:3d} align={align} blocks={nblocks}: {dt:7.2f} ms "
          f"({dt * 1e6 / n_patch:7.0f} ns/patch, "
          f"{n_patch * win * win / dt / 1e6:7.1f} Mpx/ms)")


for win in (32, 48, 64):
    run(512, win, False)
run(512, 48, True)
run(1500, 48, False)
