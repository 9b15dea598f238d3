"""Pallas TPU rasterizer: tiered "splat-block" architecture.

Design (see ARCHITECTURE.md): gaussians are kept Morton-sorted so that each
contiguous block of G=128 is spatially local. Kernels grid over blocks (the
TPU grid is sequential on a core), evaluate each block's gaussians on a
fixed-size pixel window anchored at the block's projected bounding box, and
accumulate patches into a VMEM-resident image. No per-iteration sort, no
gathers, no atomics: backward recomputes the window and reduces each
gaussian's gradient inside its single owner block (deterministic, unlike
the reference CUDA backward's atomicAdd — backward.cu:562-572).

Window sizes are tiered: every block is assigned per iteration (cheap XLA
bbox math) to the smallest window tier that covers its bbox; blocks too big
for the largest tier take an exact dense fallback. Tier membership is
passed as scalar-prefetched block-id lists, so each tier's kernel only
touches its own blocks (padded grid steps are skipped via a count guard).

Exact output semantics match the reference rasterizer: per-gaussian
16x16-tile-quantized footprints, power<=0 and alpha>=1e-5 cutoffs
(cuda_rasterizer/forward.cu:294-395).

Block data layout: [NB, NF=10, G] feature-major so each feature is a (1, G)
row broadcast against (P, G) pixel columns — both broadcasts are
lane/sublane-natural on the VPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.preprocess import Preprocessed

G = 128  # gaussians per block
NF = 10  # mx, my, cxx, cxy, cyy, w, xlo, xhi, ylo, yhi
RC = 16  # window row-chunk processed per inner step
ALPHA_CUT = 1e-5
_UNROLL_MAX = 12  # row-chunk loops longer than this stay rolled (registers)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


# ---------------------------------------------------------------------------
# in-kernel helpers


def _col_selector(ox, ww: int, width: int):
    """(ww, width) 0/1 f32 matrix placing window column i at image column
    ox+i. Lane offsets can't be proven aligned for direct dynamic slicing on
    TPU, so patch placement is an exact selector matmul instead."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (ww, width), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ww, width), 1)
    return (cols - rows == ox).astype(jnp.float32)


def _place(patch, sel):
    """(RC, ww) @ (ww, width) at full f32 precision (sel is 0/1)."""
    return jax.lax.dot(patch, sel, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)


def _extract(rows, sel):
    """(RC, width) x selector -> (RC, ww) window columns."""
    return jax.lax.dot(rows, sel.T, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)


def _to_grid(col, rc: int, ww: int):
    """(rc*ww, 1) pixel column -> (rc, ww) grid without a shape cast (Mosaic
    rejects sublane-merging reshapes): grid = B1^T @ (col * M2)."""
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (rc * ww, rc), 0)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (rc * ww, rc), 1)
    b1t = (p_iota // ww == r_iota).astype(jnp.float32).T  # (rc, P)
    p2 = jax.lax.broadcasted_iota(jnp.int32, (rc * ww, ww), 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (rc * ww, ww), 1)
    m2 = (p2 % ww == c2).astype(jnp.float32)
    return jax.lax.dot(b1t, col * m2, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)


def _to_column(grid, rc: int, ww: int):
    """(rc, ww) -> (rc*ww, 1) pixel column without a shape cast:
    col = sum((B1 @ grid) * M2, axis=1)."""
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (rc * ww, rc), 0)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (rc * ww, rc), 1)
    b1 = (p_iota // ww == r_iota).astype(jnp.float32)
    rows = jax.lax.dot(b1, grid, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)  # (P, ww)
    p2 = jax.lax.broadcasted_iota(jnp.int32, (rc * ww, ww), 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (rc * ww, ww), 1)
    m2 = (p2 % ww == c2).astype(jnp.float32)
    return jnp.sum(rows * m2, axis=1, keepdims=True)


def _unpack_features(data):
    """(NF, G) block -> tuple of (1, G) feature rows."""
    return (data[0:1], data[1:2], data[2:3], data[3:4], data[4:5], data[5:6],
            data[6:7], data[7:8], data[8:9], data[9:10])


# ---------------------------------------------------------------------------
# kernels


def _fwd_kernel(ids_ref, origin_ref, count_ref, data_ref, out_ref, img, *,
                wh, ww, rc, height, width, nsteps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        img[...] = jnp.zeros_like(img)

    @pl.when(i < count_ref[0])
    def _():
        packed = origin_ref[i]
        ox = packed & 0xFFFF
        oy = pl.multiple_of(packed >> 16, 8)
        mx, my, cxx, cxy, cyy, w, xlo, xhi, ylo, yhi = _unpack_features(data_ref[0])

        plin = jax.lax.broadcasted_iota(jnp.int32, (rc * ww, 1), 0)
        wxf = (plin % ww).astype(jnp.float32)
        wyf = (plin // ww).astype(jnp.float32)
        pxf = wxf + ox.astype(jnp.float32)
        sel = _col_selector(ox, ww, width)

        def one_chunk(step, _):
            y0 = pl.multiple_of(oy + step * rc, 8)
            pyf = wyf + y0.astype(jnp.float32)
            dx = pxf - mx  # (P, G)
            dy = pyf - my
            power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
            alpha = w * jnp.exp(power)
            ok = (
                (pxf >= xlo) & (pxf < xhi) & (pyf >= ylo) & (pyf < yhi)
                & (power <= 0.0) & (alpha >= ALPHA_CUT)
            )
            contrib = jnp.sum(jnp.where(ok, alpha, 0.0), axis=1, keepdims=True)
            patch = _to_grid(contrib, rc, ww)
            rows = _place(patch, sel)  # (RC, width)
            cur = img[pl.ds(y0, rc), :]
            img[pl.ds(y0, rc), :] = cur + rows
            return 0

        n_chunks = wh // rc
        if n_chunks <= _UNROLL_MAX:
            for step in range(n_chunks):
                one_chunk(step, 0)
        else:
            # big windows: rolled loop keeps live registers bounded (Mosaic
            # spills catastrophically on a 64-step unroll)
            jax.lax.fori_loop(0, n_chunks, one_chunk, 0)

    @pl.when(i == nsteps - 1)
    def _():
        out_ref[...] = img[...]


def _bwd_kernel(ids_ref, origin_ref, count_ref, data_ref, gimg_ref, dout_ref, *,
                wh, ww, rc, height, width):
    i = pl.program_id(0)
    dout_ref[0] = jnp.zeros((NF, G), jnp.float32)

    @pl.when(i < count_ref[0])
    def _():
        packed = origin_ref[i]
        ox = packed & 0xFFFF
        oy = pl.multiple_of(packed >> 16, 8)
        mx, my, cxx, cxy, cyy, w, xlo, xhi, ylo, yhi = _unpack_features(data_ref[0])

        plin = jax.lax.broadcasted_iota(jnp.int32, (rc * ww, 1), 0)
        wxf = (plin % ww).astype(jnp.float32)
        wyf = (plin // ww).astype(jnp.float32)
        pxf = wxf + ox.astype(jnp.float32)
        sel = _col_selector(ox, ww, width)

        def one_chunk(step, acc):
            dmx, dmy, dcxx, dcxy, dcyy, dw = acc
            y0 = pl.multiple_of(oy + step * rc, 8)
            pyf = wyf + y0.astype(jnp.float32)
            gi = _extract(gimg_ref[pl.ds(y0, rc), :], sel)  # (rc, ww)
            gcol = _to_column(gi, rc, ww)  # (P, 1)
            dx = pxf - mx
            dy = pyf - my
            power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
            e = jnp.exp(power)
            alpha = w * e
            ok = (
                (pxf >= xlo) & (pxf < xhi) & (pyf >= ylo) & (pyf < yhi)
                & (power <= 0.0) & (alpha >= ALPHA_CUT)
            )
            galpha = jnp.where(ok, gcol, 0.0)
            gpow = galpha * alpha  # dL/dpower = gI * w * e
            return (
                dmx + jnp.sum(gpow * (cxx * dx + cxy * dy), axis=0)[None],
                dmy + jnp.sum(gpow * (cyy * dy + cxy * dx), axis=0)[None],
                dcxx + jnp.sum(gpow * (-0.5 * dx * dx), axis=0)[None],
                dcxy + jnp.sum(gpow * (-dx * dy), axis=0)[None],
                dcyy + jnp.sum(gpow * (-0.5 * dy * dy), axis=0)[None],
                dw + jnp.sum(galpha * e, axis=0)[None],
            )

        zeros = jnp.zeros((1, G), jnp.float32)
        acc = (zeros, zeros, zeros, zeros, zeros, zeros)
        n_chunks = wh // rc
        if n_chunks <= _UNROLL_MAX:
            for step in range(n_chunks):
                acc = one_chunk(step, acc)
        else:
            acc = jax.lax.fori_loop(0, n_chunks, one_chunk, acc)
        dmx, dmy, dcxx, dcxy, dcyy, dw = acc
        dout_ref[0] = jnp.concatenate(
            [dmx, dmy, dcxx, dcxy, dcyy, dw, zeros, zeros, zeros, zeros], axis=0
        )


# ---------------------------------------------------------------------------
# pallas_call wrappers with custom VJP (one tier = one call)


def _rc_for(ww: int) -> int:
    """Row-chunk height: bounds in-kernel temporaries to ~rc*ww*G floats."""
    return 16 if ww <= 104 else 8


_VMEM_LIMIT = 100 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _splat_tier(data_ext, ids, origins, count, height, width, wh, ww):
    """data_ext: [NB+1, NF, G] (last row all-zero sentinel); ids: [CAP]
    block ids (pad = NB); origins: [CAP] packed (ox | oy<<16); count: [1]."""
    return _splat_tier_fwd_impl(data_ext, ids, origins, count, height, width, wh, ww)


def _splat_tier_fwd_impl(data_ext, ids, origins, count, height, width, wh, ww):
    cap = ids.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cap,),
        in_specs=[
            pl.BlockSpec((1, NF, G), lambda i, ids, o, c: (ids[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((height, width), lambda i, ids, o, c: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((height, width), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, wh=wh, ww=ww, rc=_rc_for(ww),
                          height=height, width=width, nsteps=cap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((height, width), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(ids, origins, count, data_ext)


def _splat_tier_fwd(data_ext, ids, origins, count, height, width, wh, ww):
    img = _splat_tier_fwd_impl(data_ext, ids, origins, count, height, width, wh, ww)
    return img, (data_ext, ids, origins, count)


def _splat_tier_bwd(height, width, wh, ww, res, gimg):
    data_ext, ids, origins, count = res
    cap = ids.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cap,),
        in_specs=[
            pl.BlockSpec((1, NF, G), lambda i, ids, o, c: (ids[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((height, width), lambda i, ids, o, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NF, G), lambda i, ids, o, c: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    dstep = pl.pallas_call(
        functools.partial(_bwd_kernel, wh=wh, ww=ww, rc=_rc_for(ww),
                          height=height, width=width),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap, NF, G), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(ids, origins, count, data_ext, gimg)
    return _scatter_steps_to_blocks(dstep, ids, data_ext.shape[0]), None, None, None


_splat_tier.defvjp(_splat_tier_fwd, _splat_tier_bwd)


def _scatter_steps_to_blocks(dstep, ids, nbp1):
    """Route per-grid-step gradient blocks [CAP, F, G] back to block rows
    [NBP1, F, G] via an inverse permutation + row gather. Each real block id
    appears at most once in `ids` (it's a compaction), so this is equivalent
    to (but far cheaper on TPU than) a 3D scatter-add.

    Blocks absent from `ids` read step cap-1: if count < cap that step is a
    pad whose output is all-zero; if count == cap every block is present and
    the default is fully overwritten. Pad ids point at row nbp1-1, the
    appended all-zero sentinel block whose cotangent is discarded downstream.
    """
    cap = ids.shape[0]
    inv = jnp.full((nbp1,), cap - 1, jnp.int32)
    inv = inv.at[ids].set(jnp.arange(cap, dtype=jnp.int32), mode="drop")
    return dstep[inv]


# ---------------------------------------------------------------------------
# high-level entry: block building + tier routing (all XLA, differentiable)


class SplatConfig(NamedTuple):
    # (window_h, window_w) per tier, ascending; window_h % rc == 0.
    # A terminal full-frame tier is appended automatically (when the image
    # height allows), so every block is covered and the dense fallback is an
    # (almost always empty) safety net rather than a hot path.
    tiers: tuple = ((64, 56), (112, 104), (176, 168), (240, 232), (336, 328))
    # fallback capacity for gaussians in blocks beyond all tiers (0 disables;
    # the fallback is cond-gated, so it only costs when actually populated)
    dense_cap: int = 4096
    dense_chunk: int = 512


DEFAULT_CONFIG = SplatConfig()


def _build_features(prep: Preprocessed):
    """Per-gaussian feature rows [N, NF] (differentiable where it matters).
    The footprint bounds come straight from preprocess (tile-quantized or
    tight — same kernel either way)."""
    bounds = jax.lax.stop_gradient(prep.px_bounds)
    return jnp.stack(
        [
            prep.mean2d[:, 0],
            prep.mean2d[:, 1],
            prep.conic[:, 0],
            prep.conic[:, 1],
            prep.conic[:, 2],
            prep.weight,
            bounds[:, 0], bounds[:, 1], bounds[:, 2], bounds[:, 3],
        ],
        axis=1,
    )


def _dense_fallback(feats, idx, count, height, width, chunk: int):
    """Exact contribution of up to dense_cap gaussians gathered by idx,
    evaluated against the full image in chunks to bound memory."""
    f = feats[idx]  # [K, NF]; rows beyond count have weight forced to 0
    k = f.shape[0]
    live = jnp.arange(k) < count
    f = f.at[:, 5].set(jnp.where(live, f[:, 5], 0.0))
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)

    def one_chunk(carry, fc):
        dx = xs[None, :, None] - fc[None, None, :, 0]
        dy = ys[:, None, None] - fc[None, None, :, 1]
        power = (
            -0.5 * (fc[None, None, :, 2] * dx * dx + fc[None, None, :, 4] * dy * dy)
            - fc[None, None, :, 3] * dx * dy
        )
        alpha = fc[None, None, :, 5] * jnp.exp(power)
        ok = (
            (xs[None, :, None] >= fc[None, None, :, 6])
            & (xs[None, :, None] < fc[None, None, :, 7])
            & (ys[:, None, None] >= fc[None, None, :, 8])
            & (ys[:, None, None] < fc[None, None, :, 9])
            & (power <= 0.0)
            & (alpha >= ALPHA_CUT)
        )
        return carry + jnp.sum(jnp.where(ok, alpha, 0.0), axis=2), None

    n_chunks = max(k // chunk, 1)
    fcs = f[: n_chunks * chunk].reshape(n_chunks, -1, NF)
    img, _ = jax.lax.scan(one_chunk, jnp.zeros((height, width), jnp.float32), fcs)
    return img


def render_pallas(
    prep: Preprocessed, *, width: int, height: int,
    config: SplatConfig = DEFAULT_CONFIG, return_aux: bool = False
):
    """Render via tiered splat-block kernels; blocks beyond the largest tier
    take an exact dense fallback. Returns [H, W] (+ diagnostics if
    return_aux)."""
    tiers = [
        (min(wh, (height // 16) * 16), min(ww, width)) for wh, ww in config.tiers
    ]
    # terminal full-frame tier: covers any block, making the dense fallback
    # an empty safety net (requires height % rc == 0 for the row loop)
    if height % _rc_for(width) == 0:
        tiers.append((height, width))
    # drop now-duplicate tiers after clamping (small images)
    seen, tiers_u = set(), []
    for t in tiers:
        if t not in seen:
            seen.add(t)
            tiers_u.append(t)
    tiers = tiers_u
    assert config.dense_cap % config.dense_chunk == 0
    n = prep.mean2d.shape[0]
    pad = (-n) % G
    feats = _build_features(prep)
    if pad:
        feats = jnp.concatenate([feats, jnp.zeros((pad, NF), feats.dtype)], 0)
    npad = feats.shape[0]
    nb = npad // G

    fb = feats.reshape(nb, G, NF)
    valid = fb[:, :, 5] > 0.0  # weight > 0
    big = jnp.float32(1e9)
    bxlo = jnp.min(jnp.where(valid, fb[:, :, 6], big), axis=1)
    bxhi = jnp.max(jnp.where(valid, fb[:, :, 7], -big), axis=1)
    bylo = jnp.min(jnp.where(valid, fb[:, :, 8], big), axis=1)
    byhi = jnp.max(jnp.where(valid, fb[:, :, 9], -big), axis=1)
    has_any = jnp.any(valid, axis=1)

    kdata = jnp.swapaxes(fb, 1, 2)  # [NB, NF, G]
    kdata = jnp.concatenate([kdata, jnp.zeros((1, NF, G), kdata.dtype)], 0)

    img = None
    assigned = ~has_any  # empty blocks need no tier
    aux = {}
    for ti, (wh, ww) in enumerate(tiers):
        ox = jnp.clip(bxlo.astype(jnp.int32), 0, width - ww)
        oy = jnp.clip(
            (bylo.astype(jnp.int32) // 8) * 8, 0, ((height - wh) // 8) * 8
        )
        fits = (bxhi <= (ox + ww).astype(jnp.float32)) & (
            byhi <= (oy + wh).astype(jnp.float32)
        )
        mine = fits & ~assigned & has_any
        assigned = assigned | mine
        ids = jnp.nonzero(mine, size=nb, fill_value=nb)[0].astype(jnp.int32)
        safe = jnp.minimum(ids, nb - 1)
        origins = jnp.where(
            ids < nb, (ox[safe] | (oy[safe] << 16)), 0
        ).astype(jnp.int32)
        count = jnp.sum(mine.astype(jnp.int32))[None]
        tier_img = _splat_tier(
            kdata, ids, jax.lax.stop_gradient(origins),
            jax.lax.stop_gradient(count), height, width, wh, ww,
        )
        img = tier_img if img is None else img + tier_img
        if return_aux:
            aux[f"tier{ti}_blocks"] = count[0]

    # dense fallback for gaussians in blocks beyond all tiers; cond-gated so
    # well-sorted populations (fallback empty) skip it at runtime entirely
    gmask = ((~assigned)[:, None] & valid).reshape(npad)
    count = jnp.sum(gmask.astype(jnp.int32))
    if config.dense_cap > 0:
        idx = jnp.nonzero(gmask, size=config.dense_cap, fill_value=0)[0]
        img_fb = jax.lax.cond(
            count > 0,
            lambda f, ix, c: _dense_fallback(f, ix, c, height, width,
                                             config.dense_chunk),
            lambda f, ix, c: jnp.zeros((height, width), jnp.float32),
            feats, idx, count,
        )
        out = img + img_fb
    else:
        out = img
    if return_aux:
        aux["fallback_count"] = count
        aux["fallback_dropped"] = jnp.maximum(count - config.dense_cap, 0)
        return out, aux
    return out
