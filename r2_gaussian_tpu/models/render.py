"""High-level render / query ops (equivalent of reference
gaussian/render_query.py).

`render` projects gaussians into one view; `query` voxelizes into a 3D grid.
Both take activated parameter arrays and are fully differentiable. The
`backend` flag selects the dense jnp oracle or the Pallas TPU kernels.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import dense_reference
from ..utils.runtime import retry_transient
from .preprocess import cov3d_components, preprocess
from .voxel_preprocess import voxel_preprocess, voxel_touch_mask


def _resolve_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    import jax

    try:
        return "pallas" if jax.devices()[0].platform == "tpu" else "dense"
    except RuntimeError:
        return "dense"


def render(
    xyz,
    scales,
    rotations,
    densities,
    *,
    w2c,
    full_proj,
    width: int,
    height: int,
    tanfovx: float,
    tanfovy: float,
    mode: int,
    active=None,
    mean2d_offset_ndc=None,
    backend: str = "auto",
    footprint: str = "tile",
    kernel: str = "direct",
):
    """Render one X-ray projection.

    Returns dict(render=[H,W], radii=[N] int32) — `radii > 0` is the
    reference's visibility_filter (render_query.py:145-160).

    kernel (pallas backend only): "direct" = exact reference cutoff
    semantics; "auto"/"lowrank" = Mehler MXU kernels for near-isotropic
    blocks (untruncated semantics, see ops/splat2d.py).
    """
    cov3d = cov3d_components(scales, rotations)
    prep = preprocess(
        xyz,
        cov3d,
        densities,
        w2c,
        full_proj,
        width=width,
        height=height,
        tanfovx=tanfovx,
        tanfovy=tanfovy,
        mode=mode,
        active=active,
        mean2d_offset_ndc=mean2d_offset_ndc,
        footprint=footprint,
    )
    backend = _resolve_backend(backend)
    if backend == "dense":
        image = dense_reference.render_dense(prep, width=width, height=height)
    elif backend == "pallas":
        from ..ops import splat2d

        image = splat2d.render_pallas(
            prep, width=width, height=height, kernel=kernel
        )
    else:
        raise ValueError(f"unknown backend {backend}")
    return {"render": image, "radii": prep.radius, "prep": prep}


@partial(
    jax.jit,
    static_argnames=("width", "height", "mode", "backend", "footprint",
                     "kernel"),
)
def _render_views_jit(xyz, scales, rotations, densities, active, w2cs,
                      full_projs, tanfovx, tanfovy, *, width, height, mode,
                      backend, footprint, kernel):
    def one(_, mats):
        w2c, fp = mats
        img = render(
            xyz, scales, rotations, densities, w2c=w2c, full_proj=fp,
            width=width, height=height, tanfovx=tanfovx, tanfovy=tanfovy,
            mode=mode, active=active, backend=backend, footprint=footprint,
            kernel=kernel,
        )["render"]
        # Keep the splat kernel's custom-call from fusing with the scan's
        # dynamic-update-slice: XLA:TPU stack-allocates that fused
        # [chunk, H, W] output in scoped VMEM inside the while body
        # (22.7 MB > the 16 MB scoped limit at 512^2 -> compile OOM on
        # v5e). The barrier materializes the per-view image in HBM first.
        return None, jax.lax.optimization_barrier(img)

    _, imgs = jax.lax.scan(one, None, (w2cs, full_projs))
    return imgs


def render_views(xyz, scales, rotations, densities, cams, *, active=None,
                 backend: str = "auto", chunk: int | None = None,
                 footprint: str = "tile", kernel: str = "direct"):
    """Render every view of a camera stack in chunked multi-view dispatches.

    The eval/test path used to dispatch one view at a time, paying a host
    sync (and, on the tunneled TPU, round-trip latency) per view — ~100x for
    the reference's test protocol. Here a lax.scan renders `chunk` views per
    dispatch; the last chunk is padded by repeating the final view so every
    dispatch shares one compiled shape. Dimensions are taken from `cams`
    itself, so distinct splits never share a stale closure (each distinct
    (width, height, mode) combination gets its own jit cache entry).

    The scan body carries an optimization barrier (see `one` below) so the
    stacked [chunk, H, W] output stays in HBM rather than scoped VMEM.
    Default chunk is 8 (R2G_EVAL_CHUNK to override): enough to amortize
    dispatch latency ~10x while keeping each dispatch's footprint small.

    Returns a numpy array [n_views, H, W].
    """
    import numpy as np

    n_views = len(cams)
    backend = _resolve_backend(backend)
    if chunk is None:
        chunk = int(os.environ.get("R2G_EVAL_CHUNK", "8"))
    chunk = max(1, min(chunk, n_views))

    # Compact to the active rows before dispatching: the training state is
    # capacity-padded (e.g. 262k rows for ~57k live gaussians) and splat
    # cost scales with rows, so eval renders at full capacity waste ~4x.
    # Padding the gather to an 8192 multiple bounds the jit cache to a few
    # entries as the model densifies. Row order is preserved (a subset of
    # a Morton-sorted state stays Morton-sorted).
    if active is not None:
        mask = np.asarray(active)
        n_act = int(mask.sum())
        pad_to = max(8192, -(-n_act // 8192) * 8192)
        if pad_to < mask.size:
            idx = np.zeros(pad_to, np.int32)
            idx[:n_act] = np.flatnonzero(mask)
            take = jnp.asarray(idx)
            xyz = jnp.take(xyz, take, axis=0)
            scales = jnp.take(scales, take, axis=0)
            rotations = jnp.take(rotations, take, axis=0)
            densities = jnp.take(densities, take, axis=0)
            new_mask = np.zeros(pad_to, bool)
            new_mask[:n_act] = True
            active = jnp.asarray(new_mask)
    w2cs = np.asarray(cams.w2c, np.float32)
    fps = np.asarray(cams.full_proj, np.float32)
    pad = (-n_views) % chunk
    if pad:
        w2cs = np.concatenate([w2cs, np.repeat(w2cs[-1:], pad, axis=0)])
        fps = np.concatenate([fps, np.repeat(fps[-1:], pad, axis=0)])
    out = []
    for i in range(0, n_views + pad, chunk):
        out.append(np.asarray(retry_transient(
            _render_views_jit,
            xyz, scales, rotations, densities, active,
            jnp.asarray(w2cs[i:i + chunk]), jnp.asarray(fps[i:i + chunk]),
            cams.tanfovx, cams.tanfovy,
            width=cams.width, height=cams.height, mode=cams.mode,
            backend=backend, footprint=footprint, kernel=kernel,
        )))
    return np.concatenate(out, axis=0)[:n_views]


def query_volume(
    xyz,
    scales,
    rotations,
    densities,
    *,
    center,
    n_voxel,
    s_voxel,
    active=None,
    backend: str = "auto",
    slab: int = 32,
):
    """Full-volume query chunked over z-slabs so the kernel's VMEM-resident
    accumulator stays bounded (a 256^3 grid is 64 MB; a 32-slab is 8 MB).
    Slab boundaries are 8-voxel aligned so the reference's block-quantized
    footprint semantics are preserved exactly."""
    import numpy as np

    nx, ny, nz = (int(v) for v in n_voxel)
    if nz <= slab:
        return retry_transient(
            query, xyz, scales, rotations, densities,
            center=center, n_voxel=n_voxel, s_voxel=s_voxel,
            active=active, backend=backend,
        )["vol"]
    assert slab % 8 == 0 and nz % slab == 0, (nz, slab)
    center = np.asarray(center, np.float64)
    s_vox = np.asarray(s_voxel, np.float64)
    d_z = s_vox[2] / nz
    out = []
    for z0 in range(0, nz, slab):
        c_slab = center.copy()
        c_slab[2] = center[2] - s_vox[2] / 2 + (z0 + slab / 2) * d_z
        s_slab = np.array([s_vox[0], s_vox[1], d_z * slab])
        out.append(
            retry_transient(
                query, xyz, scales, rotations, densities,
                center=c_slab, n_voxel=(nx, ny, slab), s_voxel=s_slab,
                active=active, backend=backend,
            )["vol"]
        )
    return jnp.concatenate(out, axis=2)


def query(
    xyz,
    scales,
    rotations,
    densities,
    *,
    center,
    n_voxel,
    s_voxel,
    active=None,
    backend: str = "auto",
    gather_cap: int | None = None,
    gather_bcap: int | None = None,
    tv_kernel: str = "auto",
):
    """Voxelize gaussians into an [nx,ny,nz] grid (reference
    render_query.py:27-77). n_voxel must be static python ints.

    tv_kernel: "auto"/"lowrank" = Mehler low-rank box splat on the gather
    fast path (one MXU matmul per block, untruncated semantics);
    "direct" = exact reference cutoff semantics.

    Small-box pallas queries (the per-iteration TV loss: a random 32^3
    sub-volume) take a gather fast path: a cheap box-overlap mask selects
    candidates, the lane-compaction kernel gathers their RAW components,
    and only the compacted <= gather_cap gaussians get the expensive conic
    inverse preprocess + splat. Overflow beyond the gather capacity falls
    back to the full block-tier path — value-exact but non-differentiable
    (see the comment below)."""
    from ..ops import splat3d

    cov3d = cov3d_components(scales, rotations)
    max_scale = jnp.max(scales, axis=-1)
    backend = _resolve_backend(backend)
    nx, ny, nz = (int(v) for v in n_voxel)
    n = xyz.shape[0]
    densities = densities.reshape(n)  # accept (N,) or (N, 1)
    if gather_cap is None:
        gather_cap = splat3d.GATHER_CAP
    if gather_bcap is None:
        gather_bcap = splat3d.GATHER_BCAP
    use_gather = backend == "pallas" and nx <= 64 and ny <= 64 and n > gather_cap
    if not use_gather:
        prep = voxel_preprocess(
            xyz, cov3d, max_scale, densities,
            center=center, n_voxel=n_voxel, s_voxel=s_voxel, active=active,
        )
        if backend == "dense":
            vol = dense_reference.voxelize_dense(prep, n_voxel=n_voxel)
        elif backend == "pallas":
            vol = splat3d.voxelize_pallas(prep, n_voxel=n_voxel)
        else:
            raise ValueError(f"unknown backend {backend}")
        return {"vol": vol, "radii": prep.radii}

    from ..ops.compaction import G, compact_lanes

    dens1 = densities.reshape(n)
    touch = voxel_touch_mask(
        xyz, max_scale, center=center, n_voxel=n_voxel, s_voxel=s_voxel,
        active=active,
    )
    comps_raw = [xyz[:, 0], xyz[:, 1], xyz[:, 2], *cov3d, max_scale, dens1]
    pad = (-n) % G
    if pad:
        comps_raw = [jnp.concatenate([c, jnp.zeros((pad,), c.dtype)])
                     for c in comps_raw]
        touch_p = jnp.concatenate([touch, jnp.zeros((pad,), bool)])
    else:
        touch_p = touch
    # Rotate the block visit order by a center-derived pseudo-random offset:
    # when more gaussians touch the box than the gather capacity, the
    # leftover (gradient-free fallback, below) is then a stochastic subset
    # across iterations instead of always the tail of the Morton order —
    # which is a spatial corner, so the fixed-order drop would systematically
    # starve one region of TV gradients during early training.
    ctr = (center if hasattr(center, "dtype")
           else jnp.asarray(center, jnp.float32))
    rot = jax.lax.stop_gradient(
        (jnp.sum(jnp.abs(ctr)) * 7919.0).astype(jnp.int32))
    sub, handled = compact_lanes(comps_raw, touch_p, ocap=gather_cap,
                                 bcap=gather_bcap, rotate=rot)
    xyz_sub = jnp.stack(sub[0:3], axis=-1)
    cov_sub = tuple(sub[3:9])
    prep_sub = voxel_preprocess(
        xyz_sub, cov_sub, sub[9], sub[10],
        center=center, n_voxel=n_voxel, s_voxel=s_voxel, active=None,
    )
    if (tv_kernel in ("auto", "lowrank")
            and ny * nz <= splat3d.LR3_MAX_LANES
            and nx <= splat3d.LR3_MAX_ROWS):
        # Mehler low-rank box splat: the whole box is one MXU matmul per
        # block (untruncated-gaussian semantics, like the 2D low-rank
        # rasterizer). High x-(y,z)-correlation gaussians spill to the
        # exact block-tier path; its weights are masked to the spill so
        # the pass is a no-op (count 0) when nothing spills.
        vol, spill3 = splat3d.voxelize_lowrank(prep_sub, n_voxel=n_voxel)
        prep_spill = prep_sub._replace(
            weight=jnp.where(spill3, prep_sub.weight, 0.0))
        vol = vol + splat3d.voxelize_pallas(
            prep_spill, n_voxel=n_voxel, window_x=16, window_y=16)
    else:
        # gathered gaussians are Morton-local -> tight block bboxes ->
        # small window tiers
        vol = splat3d.voxelize_pallas(prep_sub, n_voxel=n_voxel, window_x=16,
                                      window_y=16)

    # The overflow branch is value-exact but non-differentiable
    # (stop_gradient operands): a lax.cond's backward materializes zero
    # cotangents for every differentiable operand each iteration even when
    # never taken (~0.3 ms/MB on v5e). Overflow fires only when more than
    # gather_cap gaussians touch the random box (early training, giant
    # radii); each iteration's box samples a different subset, so TV
    # gradient coverage is stochastic rather than truncated.
    leftover = jax.lax.stop_gradient(touch_p[:n] & ~handled[:n])
    sg = jax.lax.stop_gradient
    operands = (sg(xyz), tuple(sg(c) for c in cov3d), sg(max_scale),
                sg(dens1), sg(center if hasattr(center, "dtype")
                              else jnp.asarray(center, jnp.float32)))

    def overflow(ops):
        xyz_, cov_, ms_, dn_, ctr = ops
        prep_full = voxel_preprocess(
            xyz_, cov_, ms_, dn_, center=ctr, n_voxel=n_voxel,
            s_voxel=s_voxel, active=leftover,
        )
        return splat3d.voxelize_pallas(prep_full, n_voxel=n_voxel)

    vol = vol + jax.lax.cond(
        jnp.any(leftover),
        overflow,
        lambda ops: jnp.zeros((nx, ny, nz), jnp.float32),
        operands,
    )
    # per-gaussian integer radii for API parity (diagnostics only; computed
    # without the det!=0 degeneracy cull the full preprocess applies)
    s_vox = jnp.asarray(s_voxel, jnp.float32)
    inv_d = jnp.asarray([nx, ny, nz], jnp.float32) / s_vox
    radii = jnp.where(
        touch[:, None],
        jnp.ceil(3.0 * max_scale[:, None] * inv_d[None, :]), 0.0
    ).astype(jnp.int32)
    return {"vol": vol, "radii": radii}
