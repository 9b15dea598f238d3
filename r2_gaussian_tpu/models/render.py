"""High-level render / query ops (equivalent of reference
gaussian/render_query.py).

`render` projects gaussians into one view; `query` voxelizes into a 3D grid.
Both take activated parameter arrays and are fully differentiable. The
`backend` flag selects the dense jnp oracle or the Pallas TPU kernels.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp

from ..ops import dense_reference
from .preprocess import cov3d_components, preprocess
from .voxel_preprocess import voxel_preprocess


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
        return query(
            xyz, scales, rotations, densities,
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
            query(
                xyz, scales, rotations, densities,
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
):
    """Voxelize gaussians into an [nx,ny,nz] grid (reference
    render_query.py:27-77). n_voxel must be static python ints."""
    cov3d = cov3d_components(scales, rotations)
    max_scale = jnp.max(scales, axis=-1)
    prep = voxel_preprocess(
        xyz,
        cov3d,
        max_scale,
        densities,
        center=center,
        n_voxel=n_voxel,
        s_voxel=s_voxel,
        active=active,
    )
    backend = _resolve_backend(backend)
    if backend == "dense":
        vol = dense_reference.voxelize_dense(prep, n_voxel=n_voxel)
    elif backend == "pallas":
        from ..ops import splat3d

        vol = splat3d.voxelize_pallas(prep, n_voxel=n_voxel)
    else:
        raise ValueError(f"unknown backend {backend}")
    return {"vol": vol, "radii": prep.radii}
