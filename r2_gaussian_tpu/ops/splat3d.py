"""Pallas TPU voxelizer: splat-block architecture in 3D.

Splats gaussian blocks into a voxel grid, used for the per-iteration TV-loss
query (random 32^3 sub-volume, reference train.py:128-142) and for
full-volume evaluation (256^3, chunked over z-slabs by the caller).

Volume layout in-kernel: (Vx, Vy*Vz) — z is lane-minor, so a per-block
window spanning the full z range of the (slab of the) volume maps to a
contiguous lane slice. Only blocks that overlap the target box are visited:
the caller compacts overlapping block ids in XLA and passes them as
scalar-prefetch, so the grid size is the (static) candidate capacity, not
the total block count.

Exact semantics of the reference voxelizer (cuda_voxelizer/forward.cu):
8^3-block-quantized footprints, power<=0 and alpha>=1e-6 cutoffs, voxel
centers at index+0.5, no mu factor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.voxel_preprocess import VoxelPreprocessed
from .splat2d import (
    G,
    _BWD_VMEM,
    _bwd_whole_out_spec,
    _col_selector,
    _extract,
    _grad_rows_out_spec,
    _mask_unvisited_rows,
    _on_tpu,
    _place,
    _to_column,
    _to_grid,
)

NF3 = 16  # cx cy cz ia ib ic id ie if w xlo xhi ylo yhi zlo zhi
ALPHA_CUT_3D = 1e-6


def _chunk3(wx: int, wy: int, vz: int, target_px: int = 2048):
    """(rcx, rcy): x/y rows per inner step, bounding per-step temporaries to
    ~target_px*G floats (the Mosaic register allocator spills catastrophically
    if the whole (wx*wy*vz, G) window is materialized at once)."""
    rcx = 8 if wx >= 8 else wx
    rcy = max(1, min(wy, target_px // (rcx * vz)))
    while wy % rcy:
        rcy -= 1
    return rcx, rcy


def _aligned3(rcy: int, vz: int) -> bool:
    """True when y-window lane offsets can be kept 128-aligned, enabling
    direct dynamic lane slices of the volume scratch. The alternative
    (0/1 selector matmuls over the full scratch width) costs
    O(width) VMEM/flops per chunk — at 256-slab width that spilled 162MB."""
    return 128 % vz == 0 and (rcy * vz) % 128 == 0


_UNROLL3 = 12  # chunk loops longer than this stay rolled (register pressure)


def _fwd3_kernel(ids_ref, origin_ref, count_ref, data_ref, out_ref, vol, *, wx,
                 wy, vz, vxs, vys, z_off, nsteps):
    """ids_ref: block id per grid step; origin_ref: packed (ox | oy<<16)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        vol[...] = jnp.zeros_like(vol)

    @pl.when(i < count_ref[0])
    def _run():
        _fwd3_body(ids_ref, origin_ref, data_ref, vol, i, wx=wx, wy=wy, vz=vz,
                   vys=vys, z_off=z_off)

    @pl.when(i == nsteps - 1)
    def _():
        out_ref[...] = vol[...]


def _quant8(wx: int, rcx: int, rcy: int, vz: int, z_off) -> tuple:
    """(xq8, yq8): whether the whole-chunk cube-quantized x/y rect tests are
    valid — footprint bounds are multiples of 8 (8^3 cube quantization,
    reference cuda_voxelizer getCube), so when a chunk's x (resp. y) range is
    an aligned 8-row span, the per-voxel rect compare collapses to a (1, G)
    whole-chunk test. x origins are always 8-aligned (sublane constraint);
    y origins are 8-aligned only on the aligned3 path with vz >= 16."""
    del z_off
    xq8 = rcx == 8 and wx % 8 == 0
    yq8 = rcy == 8 and _aligned3(rcy, vz) and (128 // vz) <= 8
    return xq8, yq8


def _fwd3_body(ids_ref, origin_ref, data_ref, vol, i, *, wx, wy, vz, vys, z_off):
    ox = pl.multiple_of(origin_ref[i] & 0xFFFF, 8)
    oy = origin_ref[i] >> 16
    data = data_ref[0]  # (NF3, G)
    cx, cy, cz = data[0:1], data[1:2], data[2:3]
    ia, ib, ic = data[3:4], data[4:5], data[5:6]
    id_, ie, if_ = data[6:7], data[7:8], data[8:9]
    w = data[9:10]
    xlo, xhi = data[10:11], data[11:12]
    ylo, yhi = data[12:13], data[13:14]
    zlo, zhi = data[14:15], data[15:16]
    ib2, ic2, ie2 = ib + ib, ic + ic, ie + ie

    rcx, rcy = _chunk3(wx, wy, vz)
    aligned = _aligned3(rcy, vz)
    xq8, yq8 = _quant8(wx, rcx, rcy, vz, z_off)
    p = jax.lax.broadcasted_iota(jnp.int32, (rcx * rcy * vz, 1), 0)
    lz = p % vz
    ly = (p // vz) % rcy
    lx = p // (vz * rcy)
    vzf = lz.astype(jnp.float32) + (0.5 + z_off)
    okz = (vzf >= zlo) & (vzf < zhi)  # (P, G), chunk-invariant
    nsx, nsy = wx // rcx, wy // rcy

    def one_chunk(step, _):
        sx, sy = step // nsy, step % nsy
        x0 = pl.multiple_of(ox + sx * rcx, 8)
        y0 = oy + sy * rcy
        vxf = (lx + x0).astype(jnp.float32) + 0.5
        vyf = (ly + y0).astype(jnp.float32) + 0.5
        dx = vxf - cx  # (P, G)
        dy = vyf - cy
        dz = vzf - cz
        # Horner-factored quadratic: 3 mults + FMA chains instead of the
        # expanded 10-term form (VPU-bound kernel; ops are the budget)
        power = -0.5 * (
            dx * (ia * dx + ib2 * dy + ic2 * dz)
            + dy * (id_ * dy + ie2 * dz)
            + dz * (if_ * dz)
        )
        alpha = w * jnp.exp(power)
        if xq8:
            x0f = x0.astype(jnp.float32)
            okx = (xlo <= x0f) & (xhi >= x0f + rcx)  # (1, G)
        else:
            okx = (vxf >= xlo) & (vxf < xhi)
        if yq8:
            y0f = y0.astype(jnp.float32)
            oky = (ylo <= y0f) & (yhi >= y0f + rcy)  # (1, G)
        else:
            oky = (vyf >= ylo) & (vyf < yhi)
        ok = (okx & oky) & okz & (power <= 0.0) & (alpha >= ALPHA_CUT_3D)
        contrib = jnp.sum(jnp.where(ok, alpha, 0.0), axis=1, keepdims=True)
        patch = _to_grid(contrib, rcx, rcy * vz)
        if aligned:
            l0 = pl.multiple_of(y0 * vz, 128)
            cur = vol[pl.ds(x0, rcx), pl.ds(l0, rcy * vz)]
            vol[pl.ds(x0, rcx), pl.ds(l0, rcy * vz)] = cur + patch
        else:
            sel = _col_selector(y0 * vz, rcy * vz, vys * vz)
            rows = _place(patch, sel)
            cur = vol[pl.ds(x0, rcx), :]
            vol[pl.ds(x0, rcx), :] = cur + rows
        return 0

    if nsx * nsy <= _UNROLL3:
        for step in range(nsx * nsy):
            one_chunk(step, 0)
    else:
        jax.lax.fori_loop(0, nsx * nsy, one_chunk, 0)


def _bwd3_kernel(ids_ref, origin_ref, count_ref, data_ref, gvol_ref, dout_ref,
                 *, wx, wy, vz, vys, z_off):
    i = pl.program_id(0)
    dout_ref[0] = jnp.zeros((NF3, G), jnp.float32)

    @pl.when(i < count_ref[0])
    def _run():
        _bwd3_body(ids_ref, origin_ref, data_ref, gvol_ref, dout_ref, i,
                   wx=wx, wy=wy, vz=vz, vys=vys, z_off=z_off)


def _bwd3_kernel_vm(ids_ref, origin_ref, count_ref, data_ref, gvol_ref,
                    dout_ref, dacc, *, wx, wy, vz, vys, z_off, nsteps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dacc[...] = jnp.zeros_like(dacc)

    @pl.when(i < count_ref[0])
    def _run():
        _bwd3_body(ids_ref, origin_ref, data_ref, gvol_ref, dacc, i,
                   wx=wx, wy=wy, vz=vz, vys=vys, z_off=z_off,
                   row=ids_ref[i])

    @pl.when(i == nsteps - 1)
    def _():
        dout_ref[...] = dacc[...]


def _bwd3_body(ids_ref, origin_ref, data_ref, gvol_ref, dout_ref, i, *, wx, wy,
               vz, vys, z_off, row=0):
    ox = pl.multiple_of(origin_ref[i] & 0xFFFF, 8)
    oy = origin_ref[i] >> 16
    data = data_ref[0]
    cx, cy, cz = data[0:1], data[1:2], data[2:3]
    ia, ib, ic = data[3:4], data[4:5], data[5:6]
    id_, ie, if_ = data[6:7], data[7:8], data[8:9]
    w = data[9:10]
    xlo, xhi = data[10:11], data[11:12]
    ylo, yhi = data[12:13], data[13:14]
    zlo, zhi = data[14:15], data[15:16]
    ib2, ic2, ie2 = ib + ib, ic + ic, ie + ie

    rcx, rcy = _chunk3(wx, wy, vz)
    aligned = _aligned3(rcy, vz)
    xq8, yq8 = _quant8(wx, rcx, rcy, vz, z_off)
    p = jax.lax.broadcasted_iota(jnp.int32, (rcx * rcy * vz, 1), 0)
    lz = p % vz
    ly = (p // vz) % rcy
    lx = p // (vz * rcy)
    vzf = lz.astype(jnp.float32) + (0.5 + z_off)
    okz = (vzf >= zlo) & (vzf < zhi)
    nsx, nsy = wx // rcx, wy // rcy

    def rsum(x):
        return jnp.sum(x, axis=0)[None]

    # Accumulate the 10 weighted moments of gpow = dL/dpower instead of the
    # per-parameter gradient expressions: the chain from moments to
    # (center, conic, weight) grads is (1, G) math applied once after the
    # chunk loop, so the per-pair work in the loop is minimal.
    def one_chunk(step, acc):
        s0, sx_, sy_, sz_, sxx, sxy, sxz, syy, syz, szz = acc
        sx, sy = step // nsy, step % nsy
        x0 = pl.multiple_of(ox + sx * rcx, 8)
        y0 = oy + sy * rcy
        vxf = (lx + x0).astype(jnp.float32) + 0.5
        vyf = (ly + y0).astype(jnp.float32) + 0.5
        if aligned:
            l0 = pl.multiple_of(y0 * vz, 128)
            gv = gvol_ref[pl.ds(x0, rcx), pl.ds(l0, rcy * vz)]
        else:
            sel = _col_selector(y0 * vz, rcy * vz, vys * vz)
            gv = _extract(gvol_ref[pl.ds(x0, rcx), :], sel)
        gcol = _to_column(gv, rcx, rcy * vz)

        dx = vxf - cx
        dy = vyf - cy
        dz = vzf - cz
        power = -0.5 * (
            dx * (ia * dx + ib2 * dy + ic2 * dz)
            + dy * (id_ * dy + ie2 * dz)
            + dz * (if_ * dz)
        )
        alpha = w * jnp.exp(power)
        if xq8:
            x0f = x0.astype(jnp.float32)
            okx = (xlo <= x0f) & (xhi >= x0f + rcx)
        else:
            okx = (vxf >= xlo) & (vxf < xhi)
        if yq8:
            y0f = y0.astype(jnp.float32)
            oky = (ylo <= y0f) & (yhi >= y0f + rcy)
        else:
            oky = (vyf >= ylo) & (vyf < yhi)
        ok = (okx & oky) & okz & (power <= 0.0) & (alpha >= ALPHA_CUT_3D)
        # gcol*alpha INSIDE the where: alpha can be inf/NaN on masked voxels
        # (power overflow on an extreme conic) and where(ok, gcol, 0)*alpha
        # would turn that into 0*inf = NaN (dev/nan_fuzz.py)
        gpow = jnp.where(ok, gcol * alpha, 0.0)
        gx = gpow * dx
        gy = gpow * dy
        gz = gpow * dz
        return (
            s0 + rsum(gpow),
            sx_ + rsum(gx), sy_ + rsum(gy), sz_ + rsum(gz),
            sxx + rsum(gx * dx), sxy + rsum(gx * dy), sxz + rsum(gx * dz),
            syy + rsum(gy * dy), syz + rsum(gy * dz), szz + rsum(gz * dz),
        )

    zero = jnp.zeros((1, G), jnp.float32)
    acc = (zero,) * 10
    if nsx * nsy <= _UNROLL3:
        for step in range(nsx * nsy):
            acc = one_chunk(step, acc)
    else:
        acc = jax.lax.fori_loop(0, nsx * nsy, one_chunk, acc)
    s0, sx_, sy_, sz_, sxx, sxy, sxz, syy, syz, szz = acc
    dcx = ia * sx_ + ib * sy_ + ic * sz_
    dcy = ib * sx_ + id_ * sy_ + ie * sz_
    dcz = ic * sx_ + ie * sy_ + if_ * sz_
    dia, did, dif = -0.5 * sxx, -0.5 * syy, -0.5 * szz
    dib, dic, die = -sxy, -sxz, -syz
    # dL/dw = sum(galpha * e) = sum(gpow) / w (w == 0 rows carry no grad)
    dw = jnp.where(w > 0.0, s0 / jnp.where(w > 0.0, w, 1.0), 0.0)
    dout_ref[row] = jnp.concatenate(
        [dcx, dcy, dcz, dia, dib, dic, did, die, dif, dw,
         zero, zero, zero, zero, zero, zero], axis=0
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _splat3_blocks(data, ids, origins, count, vxs, vys, vz, wx, wy, z_off):
    return _splat3_fwd_impl(data, ids, origins, count, vxs, vys, vz, wx, wy, z_off)


def _splat3_fwd_impl(data, ids, origins, count, vxs, vys, vz, wx, wy, z_off):
    cap = ids.shape[0]
    interpret = not _on_tpu()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cap,),
        in_specs=[
            pl.BlockSpec((1, NF3, G), lambda i, ids, o, c: (ids[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((vxs, vys * vz), lambda i, ids, o, c: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((vxs, vys * vz), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_fwd3_kernel, wx=wx, wy=wy, vz=vz, vxs=vxs, vys=vys,
                          z_off=z_off, nsteps=cap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((vxs, vys * vz), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ids, origins, count, data)


def _splat3_fwd(data, ids, origins, count, vxs, vys, vz, wx, wy, z_off):
    vol = _splat3_fwd_impl(data, ids, origins, count, vxs, vys, vz, wx, wy, z_off)
    return vol, (data, ids, origins, count)


def _splat3_bwd(vxs, vys, vz, wx, wy, z_off, res, gvol):
    data, ids, origins, count = res
    cap = ids.shape[0]
    nbp1 = data.shape[0]
    interpret = not _on_tpu()
    in_specs = [
        pl.BlockSpec((1, NF3, G), lambda i, ids, o, c: (ids[i], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((vxs, vys * vz), lambda i, ids, o, c: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if _BWD_VMEM:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(cap,),
            in_specs=in_specs,
            out_specs=_bwd_whole_out_spec(nbp1, NF3),
            scratch_shapes=[pltpu.VMEM((nbp1, NF3, G), jnp.float32)],
        )
        return pl.pallas_call(
            functools.partial(_bwd3_kernel_vm, wx=wx, wy=wy, vz=vz, vys=vys,
                              z_off=z_off, nsteps=cap),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nbp1, NF3, G), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(ids, origins, count, data, gvol), None, None, None
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cap,),
        in_specs=in_specs,
        out_specs=_grad_rows_out_spec(NF3),
    )
    dkdata = pl.pallas_call(
        functools.partial(_bwd3_kernel, wx=wx, wy=wy, vz=vz, vys=vys, z_off=z_off),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbp1, NF3, G), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ids, origins, count, data, gvol)
    return _mask_unvisited_rows(dkdata, ids), None, None, None


_splat3_blocks.defvjp(_splat3_fwd, _splat3_bwd)


def _voxelize_block_tiers(comps, nb, candidate_cap, nx, ny, nz,
                          window_x, window_y, vol0=None):
    """Tier-routed splat of a padded NF3-component list (each (nb*G,)).

    Blocks are routed to the smallest (x, y) window tier covering their
    bounding box; the terminal tier is the full (nx, ny) plane, so every
    overlapping block is rendered exactly — nothing is ever dropped."""
    cb = [c.reshape(nb, G) for c in comps]
    valid = cb[9] > 0.0
    big = jnp.float32(1e9)

    def bmin(c):
        return jnp.min(jnp.where(valid, cb[c], big), axis=1)

    def bmax(c):
        return jnp.max(jnp.where(valid, cb[c], -big), axis=1)

    bxlo, bxhi = bmin(10), bmax(11)
    bylo, byhi = bmin(12), bmax(13)
    bzlo, bzhi = bmin(14), bmax(15)
    has_any = jnp.any(valid, axis=1)

    # overlap with the box [0,nx)x[0,ny)x[0,nz)
    overlap = has_any & (bxlo < nx) & (bxhi > 0) & (bylo < ny) & (byhi > 0) \
        & (bzlo < nz) & (bzhi > 0)

    # window tiers, ending with the full plane (catches any block)
    tiers, seen = [], set()
    for wx_t, wy_t in ((window_x, window_y), (2 * window_x, 2 * window_y),
                       (4 * window_x, 4 * window_y), (nx, ny)):
        t = (min(wx_t, nx), min(wy_t, ny))
        if t not in seen:
            seen.add(t)
            tiers.append(t)

    vol = vol0
    assigned = ~overlap  # non-overlapping blocks need no tier
    for wx, wy in tiers:
        # x origin 8-aligned (sublane dynamic-slice constraint); window
        # carries up to 7 rows of slack for it
        ox = jnp.clip((bxlo.astype(jnp.int32) // 8) * 8, 0,
                      max(((nx - wx) // 8) * 8, 0))
        rcx, rcy = _chunk3(wx, wy, nz)
        if _aligned3(rcy, nz):
            # y origin quantized so lane offsets (oy*vz) stay 128-aligned
            # and the kernel can slice the volume scratch directly; at least
            # 8 so the kernel's whole-chunk cube-quantized y test is valid
            q = max(8, 128 // nz)
            oy = jnp.clip((bylo.astype(jnp.int32) // q) * q, 0,
                          max(((ny - wy) // q) * q, 0))
        else:
            oy = jnp.clip(bylo.astype(jnp.int32), 0, max(ny - wy, 0))
        fits = (jnp.minimum(bxhi, nx) <= (ox + wx).astype(jnp.float32)) & (
            jnp.minimum(byhi, ny) <= (oy + wy).astype(jnp.float32)
        )
        mine = fits & ~assigned
        assigned = assigned | mine

        # compact this tier's block ids (+ origins); pad steps point at an
        # appended all-zero block (index nb)
        ids = jnp.nonzero(mine, size=candidate_cap, fill_value=nb)[0]
        safe = jnp.minimum(ids, nb - 1)
        ids = ids.astype(jnp.int32)
        origins = (ox[safe] | (oy[safe] << 16)).astype(jnp.int32)

        w_tier = jnp.where(mine[:, None], cb[9], 0.0).reshape(nb, 1, G)
        kdata = jnp.concatenate(
            [c.reshape(nb, 1, G) for c in comps[:9]] + [w_tier]
            + [c.reshape(nb, 1, G) for c in comps[10:]],
            axis=1,
        )  # [NB, NF3, G]
        kdata = jnp.concatenate([kdata, jnp.zeros((1, NF3, G), kdata.dtype)], 0)

        count = jnp.sum(mine.astype(jnp.int32))[None]
        vol2d = _splat3_blocks(
            kdata, ids, origins, jax.lax.stop_gradient(count),
            nx, ny, nz, wx, wy, 0,
        )
        vol = vol2d if vol is None else vol + vol2d
    return vol


def _build_features3(prep: VoxelPreprocessed):
    """Component list of NF3 (N,) arrays (see splat2d layout note)."""
    b = 8.0  # BLOCK3D
    return [
        prep.cx, prep.cy, prep.cz,
        prep.ia, prep.ib, prep.ic, prep.id_, prep.ie, prep.if_,
        prep.weight,
        prep.cube_min_x.astype(jnp.float32) * b,
        prep.cube_max_x.astype(jnp.float32) * b,
        prep.cube_min_y.astype(jnp.float32) * b,
        prep.cube_max_y.astype(jnp.float32) * b,
        prep.cube_min_z.astype(jnp.float32) * b,
        prep.cube_max_z.astype(jnp.float32) * b,
    ]


GATHER_CAP = 16384  # compacted fast-path capacity for small-box queries
GATHER_BCAP = 1024  # max source blocks visited by the compaction kernel


def voxelize_pallas(
    prep: VoxelPreprocessed,
    *,
    n_voxel,
    window_x: int = 32,
    window_y: int = 32,
    candidate_cap: int | None = None,
):
    """Voxelize into [nx, ny, nz] via the block-tier path (every block with
    a box-touching member is visited with a tiered window). Small-box
    queries should be routed through models/render.query's gather fast
    path, which compacts the touching gaussians BEFORE preprocessing and
    calls this on the compacted population.
    candidate_cap=None sizes each tier's grid to the total block count."""
    nx, ny, nz = (int(v) for v in n_voxel)
    n = prep.cx.shape[0]
    pad = (-n) % G
    comps = _build_features3(prep)
    if pad:
        comps = [jnp.concatenate([c, jnp.zeros((pad,), c.dtype)]) for c in comps]
    nb = (n + pad) // G
    if candidate_cap is None:
        candidate_cap = nb
    vol = _voxelize_block_tiers(comps, nb, candidate_cap, nx, ny, nz,
                                window_x, window_y)
    return vol.reshape(nx, ny, nz)


# ---------------------------------------------------------------------------
# Low-rank (Mehler) small-box voxelizer — the TV-loss hot path.
#
# A 3D gaussian factorizes across x vs (y, z): with t = ib*dy + ic*dz,
#   -2 q = ia dx^2 + 2 dx t + R(dy, dz),   R = id dy^2 + 2 ie dy dz + if dz^2
# Insert a free slack lambda*t^2 and apply Mehler's identity to the bivariate
# (dx, t) part with a CHOSEN correlation rho0 (lambda = 1/(rho0^2 ia) makes
# any rho0 work):
#   exp(q) = sum_k U_k(x) * W_k(y, z)
#   U_k(x)    = c_k He_k(xh) e^{-xh^2/2},  c_k = w sqrt(1-rho0^2) (-rho0)^k/k!
#   W_k(y, z) = He_k(sh) * E,              E = exp(-1/2 Schur(dy, dz))
# with xh = sqrt(ia(1-rho0^2)) dx, sh = ks (ib dy + ic dz),
# ks = sqrt(1-rho0^2)/(rho0 sqrt(ia)), and Schur = R - t^2/ia the Schur
# complement of the conic (PSD whenever the conic is — the leftover
# sh-envelope e^{-sh^2/2} merges exactly into it). The whole box then
# evaluates as ONE MXU matmul per 128-gaussian block:
#   vol[x, (y,z)] = U[(x), (k,g)] @ W[(y,z), (k,g)]^T
# replacing ~50 us of VPU pair math per block with ~2 us of factor
# construction — the voxelizer analog of the 2D Mehler rasterizer above.
#
# Truncation: K_3D terms at rho0 = 0.45. The series error scales with
# r* = ((1-rho0^2)/rho0^2) rho3^2/(1-rho3^2) where rho3^2 = (beta^T R^-1
# beta)/ia is the partial correlation of x with (y, z) (beta = (ib, ic));
# gaussians with rho3 > RHO3_MAX spill to the exact block-tier path.
# Untruncated-gaussian semantics (no alpha/rect cutoffs), same argument as
# the 2D low-rank path (reference cutoffs are GPU perf hacks, not physics).

RHO0_3D = 0.45
K_3D = 6
RHO3_MAX = 0.6  # spill threshold on the x-(y,z) partial correlation
NF3L = 10  # cx cy cz kx sb sc pyy pyz pzz wq


def build_lowrank_features3(prep: VoxelPreprocessed):
    """Differentiable per-gaussian low-rank features (list of NF3L (N,)
    arrays) + the spill mask (high x-(y,z) correlation -> exact path).
    Inputs of invalid rows (weight == 0) are sanitized BEFORE any sqrt or
    division so no NaN can leak into values or gradients."""
    r0 = RHO0_3D
    om = 1.0 - r0 * r0
    valid = prep.weight > 0.0
    # floor 1e-12 (not 1e-20): valid rows have a PD conic with ia bounded
    # well above it (preprocess gate), and a tighter floor keeps autodiff's
    # ib^2/iaq^2 division partials finite even on garbage rows
    iaq = jnp.maximum(jnp.where(valid, prep.ia, 1.0), 1e-12)
    ib = jnp.where(valid, prep.ib, 0.0)
    ic = jnp.where(valid, prep.ic, 0.0)
    idq = jnp.where(valid, prep.id_, 1.0)
    ie = jnp.where(valid, prep.ie, 0.0)
    ifq = jnp.where(valid, prep.if_, 1.0)
    sqia = jnp.sqrt(iaq)
    kx = sqia * jnp.sqrt(om)
    ks = jnp.sqrt(om) / (r0 * sqia)
    sb = ks * ib
    sc = ks * ic
    pyy = -0.5 * (idq - ib * ib / iaq)
    pyz = -(ie - ib * ic / iaq)
    pzz = -0.5 * (ifq - ic * ic / iaq)
    wq = prep.weight * jnp.sqrt(om)

    # rho3^2 = (beta^T R^-1 beta) / ia, beta = (ib, ic), R = [[id, ie],
    # [ie, if]] — the partial correlation driving the truncation error
    detr = jnp.maximum(idq * ifq - ie * ie, 1e-30)
    g = (ib * (ifq * ib - ie * ic) + ic * (idq * ic - ie * ib)) / detr
    rho3sq = g / iaq
    # The Schur form (-2pyy, -pyz; -pyz, -2pzz) is PSD whenever the conic
    # is, but the cofactor inverse is computed in f32 and extreme
    # anisotropy (thin plates: scale ratios ~1e3, seen on chest-like data)
    # can cancel it into an indefinite matrix — exp(+huge) -> inf -> NaN
    # through the MXU factor matmul. Spill such rows to the exact path,
    # whose power<=0 cutoff masks them per-voxel.
    psd = (pyy <= 0.0) & (pzz <= 0.0) & (4.0 * pyy * pzz >= pyz * pyz)
    spill = valid & ((rho3sq > RHO3_MAX * RHO3_MAX) | ~psd)
    wq = jnp.where(spill, 0.0, wq)
    # Gate the OTHER features on ~spill too, not just wq: a spilled row can
    # carry non-finite pyy/pyz (e.g. ib*ib overflow on an extreme-anisotropy
    # conic), and wq = 0 does not stop 0 * NaN = NaN inside the factor
    # matmul (the chest-run TV NaN; reproduced by dev/nan_fuzz.py). Spilled
    # rows render on the exact path, so zeroing their lowrank features is
    # value- and grad-exact.
    good = valid & ~spill
    zero = jnp.zeros_like(wq)
    feats = [
        jnp.where(good, prep.cx, zero),
        jnp.where(good, prep.cy, zero),
        jnp.where(good, prep.cz, zero),
        jnp.where(good, kx, 1.0),
        jnp.where(good, sb, zero),
        jnp.where(good, sc, zero),
        jnp.where(good, pyy, zero),
        jnp.where(good, pyz, zero),
        jnp.where(good, pzz, zero),
        wq,
    ]
    return feats, jax.lax.stop_gradient(spill)


def _lr3_factors(d, nx: int, vz: int, nlanes: int):
    """In-kernel U (x side) and W ((y,z) side) factor column lists for one
    (NF3L, G) block, plus the intermediates the backward chains need."""
    cx, cy, cz = d[0:1], d[1:2], d[2:3]
    kx, sb, sc = d[3:4], d[4:5], d[5:6]
    pyy, pyz, pzz = d[6:7], d[7:8], d[8:9]
    wq = d[9:10]
    r0 = RHO0_3D

    xi = jax.lax.broadcasted_iota(jnp.int32, (nx, 1), 0).astype(jnp.float32)
    dx = (xi + 0.5) - cx  # (nx, G)
    xh = kx * dx
    ex = jnp.exp(-0.5 * (xh * xh))
    us = [wq * ex]
    for k in range(1, K_3D):
        # u_k = (-rho0/k) xh u_{k-1} - (rho0^2/k) u_{k-2} (coefficients and
        # envelope folded into the Hermite recurrence)
        u = (-r0 / k) * (xh * us[-1])
        if k > 1:
            u = u - (r0 * r0 / k) * us[-2]
        us.append(u)

    li = jax.lax.broadcasted_iota(jnp.int32, (nlanes, 1), 0)
    lyf = (li // vz).astype(jnp.float32) + 0.5
    lzf = (li % vz).astype(jnp.float32) + 0.5
    dy = lyf - cy  # (nlanes, G)
    dz = lzf - cz
    sh = sb * dy + sc * dz
    # The Schur exponent is <= 0 for a PSD Schur complement, so the clamp
    # is exact on healthy rows; it bounds residual f32 wobble (indefinite
    # rows are already spilled in build_lowrank_features3, but per-voxel
    # cancellation can still nudge the exponent past 0 -> exp overflow).
    # The hand-written backward reuses these ws and masks the D-channel
    # cotangent where the clamp is active (_lr3_bwd_kernel), so value and
    # grad stay consistent on clamped voxels too.
    ee = jnp.exp(jnp.minimum(dy * (pyy * dy + pyz * dz) + pzz * (dz * dz), 0.0))
    ws = [ee]
    for k in range(1, K_3D):
        w_ = sh * ws[-1]
        if k > 1:
            w_ = w_ - (k - 1) * ws[-2]
        ws.append(w_)
    return us, ws, dx, xh, dy, dz, sh


def _lr3_fwd_kernel(count_ref, data_ref, out_ref, vol, *, nx, vz, nlanes,
                    nsteps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        vol[...] = jnp.zeros_like(vol)

    @pl.when(i < count_ref[0])
    def _():
        us, ws, *_ = _lr3_factors(data_ref[0], nx, vz, nlanes)
        patch = jax.lax.dot_general(
            jnp.concatenate(us, axis=1).astype(jnp.bfloat16),
            jnp.concatenate(ws, axis=1).astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (nx, nlanes)
        vol[...] = vol[...] + patch

    @pl.when(i == nsteps - 1)
    def _():
        out_ref[...] = vol[...]


def _lr3_grad_row(d, gvol_ref, *, nx, vz, nlanes):
    """Gradient row (NF3L, G) of one feature block w.r.t. the low-rank
    TV-query output cotangent held in gvol_ref."""
    if True:  # keep the original body's indentation
        kx, sb, sc = d[3:4], d[4:5], d[5:6]
        pyy, pyz, pzz = d[6:7], d[7:8], d[8:9]
        wq = d[9:10]
        r0 = RHO0_3D
        us, ws, dx, xh, dy, dz, sh = _lr3_factors(d, nx, vz, nlanes)
        gg = d.shape[-1]
        g16 = gvol_ref[...].astype(jnp.bfloat16)
        dU = jax.lax.dot_general(
            g16, jnp.concatenate(ws, axis=1).astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (nx, K*G)
        dW = jax.lax.dot_general(
            g16, jnp.concatenate(us, axis=1).astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (nlanes, K*G)
        dUk = [dU[:, k * gg:(k + 1) * gg] for k in range(K_3D)]
        dWk = [dW[:, k * gg:(k + 1) * gg] for k in range(K_3D)]

        def rsum(x):
            return jnp.sum(x, axis=0)[None]

        # U side: d u_k/d xh = -rho0 u_{k-1} - xh u_k (telescoped; exact)
        d_xh = dUk[0] * (-xh * us[0])
        a_sum = dUk[0] * us[0]
        for k in range(1, K_3D):
            d_xh = d_xh + dUk[k] * ((-r0) * us[k - 1] - xh * us[k])
            a_sum = a_sum + dUk[k] * us[k]
        dcx = -(kx * rsum(d_xh))
        dkx = rsum(d_xh * dx)
        swq = jnp.where(wq > 0.0, wq, 1.0)
        dwq = jnp.where(wq > 0.0, rsum(a_sum) / swq, 0.0)

        # W side: d W_k/d sh = k W_{k-1}; d W_k/d D = W_k (E = e^D indep of sh)
        d_sh = dWk[1] * ws[0]
        dd = dWk[0] * ws[0]
        for k in range(1, K_3D):
            dd = dd + dWk[k] * ws[k]
            if k > 1:
                d_sh = d_sh + (1.0 * k) * (dWk[k] * ws[k - 1])
        # exactness under the exp clamp in _lr3_factors: where min(expo, 0)
        # is active E == 1 is constant, so dE/dD = 0 there, not E — mask the
        # D-channel cotangent (indefinite rows are already spilled upstream;
        # this closes the residual f32-wobble boundary)
        expo = dy * (pyy * dy + pyz * dz) + pzz * (dz * dz)
        dd = dd * (expo < 0.0).astype(dd.dtype)
        gy = dd * dy
        gz = dd * dz
        s1, s4, s5 = rsum(d_sh), rsum(gy), rsum(gz)
        dsb = rsum(d_sh * dy)
        dsc = rsum(d_sh * dz)
        dpyy = rsum(gy * dy)
        dpyz = rsum(gy * dz)
        dpzz = rsum(gz * dz)
        dcy = -(sb * s1 + 2.0 * (pyy * s4) + pyz * s5)
        dcz = -(sc * s1 + pyz * s4 + 2.0 * (pzz * s5))
        return jnp.concatenate(
            [dcx, dcy, dcz, dkx, dsb, dsc, dpyy, dpyz, dpzz, dwq], axis=0
        )


def _lr3_bwd_kernel_vm(count_ref, data_ref, gvol_ref, dout_ref, dacc, *, nx,
                       vz, nlanes, nsteps):
    """Whole-output VMEM-accumulator variant (default): grad rows build up
    in scratch, one flush at the end."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dacc[...] = jnp.zeros_like(dacc)

    @pl.when(i < count_ref[0])
    def _():
        dacc[i] = _lr3_grad_row(data_ref[0], gvol_ref, nx=nx, vz=vz,
                                nlanes=nlanes)

    @pl.when(i == nsteps - 1)
    def _():
        dout_ref[...] = dacc[...]


def _lr3_bwd_kernel(count_ref, data_ref, gvol_ref, dout_ref, *, nx, vz,
                    nlanes, nsteps):
    """Per-step-DMA variant (R2G_BWD_VMEM=0 hardware escape hatch): each
    step writes its own grad row; rows past the live count write zeros."""
    i = pl.program_id(0)
    live = i < count_ref[0]

    @pl.when(live)
    def _():
        dout_ref[0] = _lr3_grad_row(data_ref[0], gvol_ref, nx=nx, vz=vz,
                                    nlanes=nlanes)

    @pl.when(jnp.logical_not(live))
    def _():
        dout_ref[...] = jnp.zeros_like(dout_ref)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _lr3_call(kdata, count, nx, ny, nz):
    return _lr3_fwd_impl(kdata, count, nx, ny, nz)


def _lr3_fwd_impl(kdata, count, nx, ny, nz):
    nb = kdata.shape[0]
    nlanes = ny * nz
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, NF3L, G), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nx, nlanes), lambda i, c: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nx, nlanes), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_lr3_fwd_kernel, nx=nx, vz=nz, nlanes=nlanes,
                          nsteps=nb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nx, nlanes), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=not _on_tpu(),
    )(count, kdata)


def _lr3_fwd(kdata, count, nx, ny, nz):
    return _lr3_fwd_impl(kdata, count, nx, ny, nz), (kdata, count)


def _lr3_bwd(nx, ny, nz, res, gvol):
    kdata, count = res
    nb = kdata.shape[0]
    nlanes = ny * nz
    in_specs = [
        pl.BlockSpec((1, NF3L, G), lambda i, c: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nx, nlanes), lambda i, c: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if _BWD_VMEM:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((nb, NF3L, G), lambda i, c: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((nb, NF3L, G), jnp.float32)],
        )
        kern = functools.partial(_lr3_bwd_kernel_vm, nx=nx, vz=nz,
                                 nlanes=nlanes, nsteps=nb)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, NF3L, G), lambda i, c: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        kern = functools.partial(_lr3_bwd_kernel, nx=nx, vz=nz,
                                 nlanes=nlanes, nsteps=nb)
    dkdata = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, NF3L, G), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=not _on_tpu(),
    )(count, kdata, gvol)
    return dkdata, None


_lr3_call.defvjp(_lr3_fwd, _lr3_bwd)

# VMEM budget: W factors are (ny*nz, K_3D*G) f32 + bf16 — restrict the
# low-rank path to boxes whose lane extent fits comfortably
LR3_MAX_LANES = 1024
LR3_MAX_ROWS = 64


def voxelize_lowrank(prep: VoxelPreprocessed, *, n_voxel):
    """Low-rank voxelization of a small box. Returns (vol [nx,ny,nz],
    spill mask (N,)): spilled gaussians (high x-(y,z) correlation) are NOT
    rendered here — route them through voxelize_pallas."""
    nx, ny, nz = (int(v) for v in n_voxel)
    assert ny * nz <= LR3_MAX_LANES and nx <= LR3_MAX_ROWS, (nx, ny, nz)
    feats, spill = build_lowrank_features3(prep)
    n = feats[0].shape[0]
    pad = (-n) % G
    if pad:
        feats = [jnp.concatenate([c, jnp.zeros((pad,), c.dtype)])
                 for c in feats]
    nb = (n + pad) // G
    kdata = jnp.concatenate([c.reshape(nb, 1, G) for c in feats], axis=1)
    bmask = jnp.any(feats[9].reshape(nb, G) > 0.0, axis=1)
    count = jnp.max(jnp.where(bmask, jnp.arange(nb, dtype=jnp.int32) + 1, 0))
    vol = _lr3_call(kdata, jax.lax.stop_gradient(count)[None], nx, ny, nz)
    return vol.reshape(nx, ny, nz), spill
