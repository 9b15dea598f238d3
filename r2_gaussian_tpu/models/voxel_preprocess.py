"""Per-Gaussian voxel-space preprocessing for the 3D voxelizer.

Re-derivation of the reference cuda_voxelizer/forward.cu preprocess:
  - voxel-space covariance Sigma_vox[i,j] = Sigma[i,j]/(dVoxel_i dVoxel_j)
    (forward.cu:109-118), inverted to a 6-term 3D conic (forward.cu:120-135)
  - per-axis integer radii ceil(3*max_scale/dVoxel) (forward.cu:137-143)
  - voxel-space center (p - center + sVoxel/2)/dVoxel (forward.cu:145-147)
  - out-of-grid cull and 8x8x8-block cube rect (auxiliary.h getCube);
    like the rasterizer's 16x16 tiles, the 8-voxel block granularity is
    part of the output semantics and is reproduced exactly
  - voxel centers at index + 0.5 (forward.cu:206); contribution
    density * exp(-0.5 d^T Sigma_vox^-1 d) with alpha cutoff 1e-6 and NO mu
    factor (point evaluation, forward.cu:274-298)

Computed component-wise on (N,) arrays (see models/preprocess.py layout
note); stacked views are compatibility properties.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

BLOCK3D = 8  # reference cuda_voxelizer/config.h:16-18


class VoxelPreprocessed(NamedTuple):
    """Component-wise fields, each (N,) f32 unless noted."""

    cx: jnp.ndarray  # gaussian center in (fractional) voxel units
    cy: jnp.ndarray
    cz: jnp.ndarray
    ia: jnp.ndarray  # inverse voxel-space covariance (3D conic) entries:
    ib: jnp.ndarray  # [[ia, ib, ic], [ib, id, ie], [ic, ie, if]]
    ic: jnp.ndarray
    id_: jnp.ndarray
    ie: jnp.ndarray
    if_: jnp.ndarray
    weight: jnp.ndarray  # density (0 for culled)
    rx: jnp.ndarray  # int32 per-axis voxel radii (0 for culled)
    ry: jnp.ndarray
    rz: jnp.ndarray
    cube_min_x: jnp.ndarray  # int32 block-space rect, inclusive
    cube_min_y: jnp.ndarray
    cube_min_z: jnp.ndarray
    cube_max_x: jnp.ndarray  # int32 block-space rect, exclusive
    cube_max_y: jnp.ndarray
    cube_max_z: jnp.ndarray

    @property
    def center_vox(self):
        return jnp.stack([self.cx, self.cy, self.cz], -1)

    @property
    def conic(self):
        return jnp.stack(
            [self.ia, self.ib, self.ic, self.id_, self.ie, self.if_], -1
        )

    @property
    def radii(self):
        return jnp.stack([self.rx, self.ry, self.rz], -1)

    @property
    def cube_min(self):
        return jnp.stack([self.cube_min_x, self.cube_min_y, self.cube_min_z], -1)

    @property
    def cube_max(self):
        return jnp.stack([self.cube_max_x, self.cube_max_y, self.cube_max_z], -1)


def voxel_touch_mask(
    xyz: jnp.ndarray,
    max_scale: jnp.ndarray,
    *,
    center,
    n_voxel,
    s_voxel,
    active: jnp.ndarray | None = None,
):
    """Cheap conservative box-overlap mask mirroring voxel_preprocess's cull
    (everything except the det != 0 degeneracy check, which requires the
    covariance inverse): in_range & (touched blocks > 0) & active. A
    superset of (weight > 0); used to gather candidates before running the
    expensive conic-inverse preprocess on the compacted subset only."""
    import numpy as np

    center = jnp.asarray(center, jnp.float32)
    s_vox = jnp.asarray(s_voxel, jnp.float32)
    nvf = tuple(float(v) for v in np.asarray(n_voxel, np.float64))
    ix = nvf[0] / s_vox[0]
    iy = nvf[1] / s_vox[1]
    iz = nvf[2] / s_vox[2]
    rfx = jnp.ceil(3.0 * max_scale * ix)
    rfy = jnp.ceil(3.0 * max_scale * iy)
    rfz = jnp.ceil(3.0 * max_scale * iz)
    cx = (xyz[:, 0] - center[0] + s_vox[0] / 2) * ix
    cy = (xyz[:, 1] - center[1] + s_vox[1] / 2) * iy
    cz = (xyz[:, 2] - center[2] + s_vox[2] / 2) * iz
    grid = tuple(int(v) for v in (np.asarray(n_voxel) + BLOCK3D - 1) // BLOCK3D)
    in_range = (
        (cx + rfx >= 0) & (cx - rfx <= nvf[0])
        & (cy + rfy >= 0) & (cy - rfy <= nvf[1])
        & (cz + rfz >= 0) & (cz - rfz <= nvf[2])
    )

    def cmin(cc, rr, g):
        return jnp.clip(((cc - rr) / BLOCK3D).astype(jnp.int32), 0, g)

    def cmax(cc, rr, g):
        return jnp.clip(
            ((cc + rr + BLOCK3D - 1) / BLOCK3D).astype(jnp.int32), 0, g
        )

    touched = (
        (cmax(cx, rfx, grid[0]) - cmin(cx, rfx, grid[0]))
        * (cmax(cy, rfy, grid[1]) - cmin(cy, rfy, grid[1]))
        * (cmax(cz, rfz, grid[2]) - cmin(cz, rfz, grid[2]))
    )
    mask = in_range & (touched > 0)
    if active is not None:
        mask = mask & active
    return mask


def voxel_preprocess(
    xyz: jnp.ndarray,
    cov3d,
    max_scale: jnp.ndarray,
    density: jnp.ndarray,
    *,
    center,
    n_voxel,
    s_voxel,
    active: jnp.ndarray | None = None,
) -> VoxelPreprocessed:
    """n_voxel: static (nx, ny, nz); center/s_voxel: arrays or floats [3].

    cov3d: [N,3,3] or a 6-tuple of (N,) components (sxx, sxy, sxz, syy,
    syz, szz) — prefer the tuple on TPU."""
    if isinstance(cov3d, tuple):
        sxx, sxy, sxz, syy, syz, szz = cov3d
    else:
        sxx, sxy, sxz = cov3d[:, 0, 0], cov3d[:, 0, 1], cov3d[:, 0, 2]
        syy, syz, szz = cov3d[:, 1, 1], cov3d[:, 1, 2], cov3d[:, 2, 2]
    import numpy as np

    # center / s_voxel may be traced (the TV loss draws a random sub-volume
    # center inside the jitted train step); n_voxel is static.
    center = jnp.asarray(center, jnp.float32)
    s_vox = jnp.asarray(s_voxel, jnp.float32)
    nvf = tuple(float(v) for v in np.asarray(n_voxel, np.float64))
    ix = nvf[0] / s_vox[0]
    iy = nvf[1] / s_vox[1]
    iz = nvf[2] / s_vox[2]

    a = sxx * (ix * ix)
    b = sxy * (ix * iy)
    c = sxz * (ix * iz)
    d = syy * (iy * iy)
    e = syz * (iy * iz)
    f = szz * (iz * iz)
    det = a * d * f + 2 * b * c * e - a * e * e - f * b * b - d * c * c
    det_ok = det != 0.0
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    ia = (d * f - e * e) * inv_det
    ib = (c * e - b * f) * inv_det
    ic = (b * e - c * d) * inv_det
    id_ = (a * f - c * c) * inv_det
    ie = (b * c - a * e) * inv_det
    if_ = (a * d - b * b) * inv_det

    rfx = jnp.ceil(3.0 * max_scale * ix)
    rfy = jnp.ceil(3.0 * max_scale * iy)
    rfz = jnp.ceil(3.0 * max_scale * iz)
    cx = (xyz[:, 0] - center[0] + s_vox[0] / 2) * ix
    cy = (xyz[:, 1] - center[1] + s_vox[1] / 2) * iy
    cz = (xyz[:, 2] - center[2] + s_vox[2] / 2) * iz

    grid = tuple(int(v) for v in (np.asarray(n_voxel) + BLOCK3D - 1) // BLOCK3D)
    in_range = (
        (cx + rfx >= 0) & (cx - rfx <= nvf[0])
        & (cy + rfy >= 0) & (cy - rfy <= nvf[1])
        & (cz + rfz >= 0) & (cz - rfz <= nvf[2])
    )

    def cmin(cc, rr, g):
        return jnp.clip(((cc - rr) / BLOCK3D).astype(jnp.int32), 0, g)

    def cmax(cc, rr, g):
        return jnp.clip(
            ((cc + rr + BLOCK3D - 1) / BLOCK3D).astype(jnp.int32), 0, g
        )

    cminx, cminy, cminz = cmin(cx, rfx, grid[0]), cmin(cy, rfy, grid[1]), cmin(cz, rfz, grid[2])
    cmaxx, cmaxy, cmaxz = cmax(cx, rfx, grid[0]), cmax(cy, rfy, grid[1]), cmax(cz, rfz, grid[2])
    touched = (cmaxx - cminx) * (cmaxy - cminy) * (cmaxz - cminz)

    valid = det_ok & in_range & (touched > 0)
    if active is not None:
        valid = valid & active
    weight = jnp.where(valid, density, 0.0)
    zero = jnp.zeros_like(rfx)
    return VoxelPreprocessed(
        cx=cx, cy=cy, cz=cz,
        ia=ia, ib=ib, ic=ic, id_=id_, ie=ie, if_=if_,
        weight=weight,
        rx=jnp.where(valid, rfx, zero).astype(jnp.int32),
        ry=jnp.where(valid, rfy, zero).astype(jnp.int32),
        rz=jnp.where(valid, rfz, zero).astype(jnp.int32),
        cube_min_x=cminx, cube_min_y=cminy, cube_min_z=cminz,
        cube_max_x=cmaxx, cube_max_y=cmaxy, cube_max_z=cmaxz,
    )
