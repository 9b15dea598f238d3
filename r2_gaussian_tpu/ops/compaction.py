"""Pallas lane compaction: gather masked gaussians into dense blocks.

The splat kernels consume SoA feature blocks of G=128 lanes. Sub-selecting a
sparse population (the TV query's box-touching gaussians, the renderer's
anisotropy spill) with XLA `nonzero` + per-component gathers costs ~1 ms per
(N,) component at N=512k on v5e, and the gather's autodiff scatter-add
backward is worse — the index ops range over N. This kernel instead
compacts *in-kernel*: the grid visits only blocks containing masked lanes
(scalar-prefetched ids, the same trick as the splat kernels), computes
within-block target positions with a lane-prefix matmul, and places lanes
with a 0/1 selector matmul — so the cost scales with the number of touched
blocks, not with N. The backward is the mirrored kernel (selector
transposed) plus an inverse-permutation row gather; no scatter-add anywhere.

Compaction preserves order (block order x lane order), so Morton-sorted
inputs stay Morton-sorted — downstream block bboxes remain tight.

Replaces the reference's CUB stream-compaction idioms
(rasterizer_impl.cu:70-111) with an MXU-native formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 128


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def _selector(data, f):
    """(F+1, G) block (mask = last row, 0/1) -> (G, 2G) placement selector
    T[l, c] = mask[l] * (c == shift + prefix[l]), plus the window row-slot
    shift s from the packed meta value f = s."""
    m = data[-1:]  # (1, G)
    k_i = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
    l_i = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    upper = (k_i < l_i).astype(jnp.float32)
    p = jax.lax.dot(m, upper, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)  # (1, G) prefix count
    # (1, G) -> (G, 1) without a transpose (Mosaic-unfriendly):
    # col[l] = sum_c row[0, c] * onehot[c, l]
    onehot = (k_i == l_i).astype(jnp.float32)
    pcolT = jax.lax.dot_general(
        onehot, p, dimension_numbers=(((0,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (G, 1)
    mcolT = jax.lax.dot_general(
        onehot, m, dimension_numbers=(((0,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (G, 1)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (G, 2 * G), 1)
    tgt = pcolT.astype(jnp.int32) + f
    return jnp.where(c_i == tgt, mcolT, 0.0)


def _compact_fwd_kernel(ids_ref, meta_ref, count_ref, data_ref, out_ref, acc,
                        *, nrows, nsteps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    @pl.when(i < count_ref[0])
    def _():
        ob = meta_ref[i] & 0xFFFF
        s = meta_ref[i] >> 16
        data = data_ref[0]  # (F+1, G)
        sel = _selector(data, s)
        window = jax.lax.dot(data, sel, precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)  # (F+1, 2G)
        base = pl.multiple_of(ob * G, G)
        acc[:, pl.ds(base, 2 * G)] = acc[:, pl.ds(base, 2 * G)] + window

    @pl.when(i == nsteps - 1)
    def _():
        out_ref[...] = acc[...]


def _compact_bwd_kernel(ids_ref, meta_ref, count_ref, data_ref, gout_ref,
                        dout_ref, dacc, *, nrows, nsteps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dacc[...] = jnp.zeros_like(dacc)

    @pl.when(i < count_ref[0])
    def _():
        ob = meta_ref[i] & 0xFFFF
        s = meta_ref[i] >> 16
        data = data_ref[0]
        sel = _selector(data, s)
        base = pl.multiple_of(ob * G, G)
        win = gout_ref[:, pl.ds(base, 2 * G)]  # (F+1, 2G)
        dblock = jax.lax.dot_general(
            win, sel, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (F+1, G)
        # the mask row carries no gradient (it was 0/1 metadata)
        zero_last = jax.lax.broadcasted_iota(jnp.int32, (nrows, G), 0) < nrows - 1
        dacc[ids_ref[i]] = jnp.where(zero_last, dblock, 0.0)

    @pl.when(i == nsteps - 1)
    def _():
        dout_ref[...] = dacc[...]


_VMEM_LIMIT = 100 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _compact_call(kdata, ids, meta, count, ocap, bcap):
    return _compact_fwd_impl(kdata, ids, meta, count, ocap, bcap)


def _compact_fwd_impl(kdata, ids, meta, count, ocap, bcap):
    nrows = kdata.shape[1]
    out_w = ocap + G
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bcap,),
        in_specs=[
            pl.BlockSpec((1, nrows, G), lambda i, ids, m, c: (ids[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nrows, out_w), lambda i, ids, m, c: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nrows, out_w), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_compact_fwd_kernel, nrows=nrows, nsteps=bcap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrows, out_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(ids, meta, count, kdata)


def _compact_fwd(kdata, ids, meta, count, ocap, bcap):
    out = _compact_fwd_impl(kdata, ids, meta, count, ocap, bcap)
    return out, (kdata, ids, meta, count)


def _compact_bwd(ocap, bcap, res, gout):
    kdata, ids, meta, count = res
    nb1, nrows = kdata.shape[0], kdata.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bcap,),
        in_specs=[
            pl.BlockSpec((1, nrows, G), lambda i, ids, m, c: (ids[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nrows, ocap + G), lambda i, ids, m, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb1, nrows, G), lambda i, ids, m, c: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nb1, nrows, G), jnp.float32)],
    )
    dkdata = pl.pallas_call(
        functools.partial(_compact_bwd_kernel, nrows=nrows, nsteps=bcap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb1, nrows, G), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(ids, meta, count, kdata, gout)
    return dkdata, None, None, None


_compact_call.defvjp(_compact_fwd, _compact_bwd)


@jax.custom_vjp
def take_unique(c, idx):
    """Gather c[idx] whose backward is a unique-indices scatter (cost scales
    with len(idx), not len(c) — the autodiff default scatter-add ranges over
    len(c): measured ~4 ms per (512k,) array on v5e vs ~0.6 ms for this).
    idx entries must be unique among valid positions; idx == len(c) reads
    padded zeros."""
    return jnp.concatenate([c, jnp.zeros((1,), c.dtype)])[idx]


def _take_unique_fwd(c, idx):
    return take_unique(c, idx), (idx, c.shape[0])


def _take_unique_bwd(res, g):
    idx, n = res
    grad = jnp.zeros((n,), g.dtype)
    return grad.at[idx].set(g, mode="drop", unique_indices=True), None


take_unique.defvjp(_take_unique_fwd, _take_unique_bwd)


def compact_lanes(comps, mask, *, ocap: int, bcap: int, rotate: int | None = None):
    """Compact the masked lanes of an SoA component list into dense blocks.

    comps: list of (N,) f32 arrays, N % G == 0. mask: (N,) bool.
    ocap: output capacity (multiple of G); bcap: max source blocks visited.
    rotate: optional (traced) block offset — blocks are visited in rotated
      order ((idx - rotate) mod nb ascending). When the caller's fallback
      for overflow is gradient-free (the TV query), rotation by a fresh
      random offset each call makes the dropped set stochastic instead of
      always the tail of the Morton order (which is a spatial corner).

    Returns (comps_sub, handled):
      comps_sub — list of (ocap,) arrays, the masked entries compacted in
        visit order (block-major, lane order preserved); tail zeros.
      handled — (N,) bool: entries represented in comps_sub. Entries whose
        source block fell beyond bcap, or would overflow ocap, are left for
        the caller's fallback path. Blocks are never split: a source block
        is either fully handled (all its masked lanes) or not at all.
    """
    assert ocap % G == 0
    n = comps[0].shape[0]
    nb = n // G
    # The grid cannot usefully visit more blocks than exist: with the
    # trainer's row bucket the caller's capacity-sized bcap (e.g. the TV
    # query's 1024) can exceed nb (512 at a 65536 bucket) and every extra
    # grid step is pure per-step overhead, fwd and bwd.
    bcap = min(bcap, nb)
    mask2 = mask.reshape(nb, G)
    bc = jnp.sum(mask2.astype(jnp.int32), axis=1)  # (nb,)
    btouch = bc > 0
    if rotate is None:
        bidx = jnp.nonzero(btouch, size=bcap, fill_value=nb)[0].astype(jnp.int32)
    else:
        perm = (jnp.arange(nb, dtype=jnp.int32) + rotate) % nb
        pos = jnp.nonzero(btouch[perm], size=bcap, fill_value=nb)[0]
        perm_ext = jnp.concatenate([perm, jnp.full((1,), nb, jnp.int32)])
        bidx = perm_ext[pos].astype(jnp.int32)
    bcg = jnp.where(bidx < nb, bc[jnp.minimum(bidx, nb - 1)], 0)
    offs = jnp.cumsum(bcg) - bcg  # exclusive prefix
    keep = (offs + bcg <= ocap) & (bidx < nb)  # a prefix of the real entries
    count = jnp.sum(keep.astype(jnp.int32))[None]
    meta = ((offs // G) | ((offs % G) << 16)).astype(jnp.int32)
    ids = jnp.where(keep, bidx, nb).astype(jnp.int32)

    kdata = jnp.concatenate(
        [c.reshape(nb, 1, G) for c in comps]
        + [jax.lax.stop_gradient(mask2.astype(jnp.float32)).reshape(nb, 1, G)],
        axis=1,
    )
    kdata = jnp.concatenate(
        [kdata, jnp.zeros((1, kdata.shape[1], G), kdata.dtype)], 0
    )
    out = _compact_call(kdata, ids, jax.lax.stop_gradient(meta),
                        jax.lax.stop_gradient(count), ocap, bcap)
    comps_sub = [out[f, :ocap] for f in range(len(comps))]

    kept_blocks = jnp.zeros((nb + 1,), bool).at[ids].set(keep, mode="drop")[:nb]
    handled = (kept_blocks[:, None] & mask2).reshape(n)
    return comps_sub, handled
