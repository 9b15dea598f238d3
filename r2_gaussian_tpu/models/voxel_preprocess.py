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
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

BLOCK3D = 8  # reference cuda_voxelizer/config.h:16-18


class VoxelPreprocessed(NamedTuple):
    center_vox: jnp.ndarray  # [N,3] gaussian center in (fractional) voxel units
    conic: jnp.ndarray  # [N,6] (ia, ib, ic, id, ie, if) inverse voxel-space cov
    weight: jnp.ndarray  # [N] density (0 for culled)
    radii: jnp.ndarray  # [N,3] int32 per-axis voxel radii (0 for culled)
    cube_min: jnp.ndarray  # [N,3] int32 block-space rect, inclusive
    cube_max: jnp.ndarray  # [N,3] int32 block-space rect, exclusive


def voxel_preprocess(
    xyz: jnp.ndarray,
    cov3d: jnp.ndarray,
    max_scale: jnp.ndarray,
    density: jnp.ndarray,
    *,
    center,
    n_voxel,
    s_voxel,
    active: jnp.ndarray | None = None,
) -> VoxelPreprocessed:
    """n_voxel: static (nx, ny, nz); center/s_voxel: arrays or floats [3]."""
    center = jnp.asarray(center, xyz.dtype)
    s_voxel = jnp.asarray(s_voxel, xyz.dtype)
    n_voxel_f = jnp.asarray(n_voxel, xyz.dtype)
    d_voxel = s_voxel / n_voxel_f  # [3]

    inv_d = 1.0 / d_voxel
    cov_vox = cov3d * (inv_d[None, :, None] * inv_d[None, None, :])
    a, b, c = cov_vox[:, 0, 0], cov_vox[:, 0, 1], cov_vox[:, 0, 2]
    d, e, f = cov_vox[:, 1, 1], cov_vox[:, 1, 2], cov_vox[:, 2, 2]
    det = a * d * f + 2 * b * c * e - a * e * e - f * b * b - d * c * c
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    conic = (
        jnp.stack(
            [
                d * f - e * e,
                c * e - b * f,
                b * e - c * d,
                a * f - c * c,
                b * c - a * e,
                a * d - b * b,
            ],
            -1,
        )
        / det_safe[:, None]
    )

    radii_f = jnp.ceil(3.0 * max_scale[:, None] * inv_d[None, :])  # [N,3]
    center_vox = (xyz - center[None, :] + s_voxel[None, :] / 2) * inv_d[None, :]

    n_vox_i = jnp.asarray(n_voxel, jnp.int32)
    grid = (n_vox_i + BLOCK3D - 1) // BLOCK3D  # blocks per axis
    in_range = jnp.all(
        (center_vox + radii_f >= 0) & (center_vox - radii_f <= n_voxel_f[None, :]),
        axis=-1,
    )
    cube_min = jnp.clip(
        ((center_vox - radii_f) / BLOCK3D).astype(jnp.int32), 0, grid[None, :]
    )
    cube_max = jnp.clip(
        ((center_vox + radii_f + BLOCK3D - 1) / BLOCK3D).astype(jnp.int32),
        0,
        grid[None, :],
    )
    touched = jnp.prod(cube_max - cube_min, axis=-1)

    valid = det_ok & in_range & (touched > 0)
    if active is not None:
        valid = valid & active
    weight = jnp.where(valid, density, 0.0)
    radii = jnp.where(valid[:, None], radii_f, 0.0).astype(jnp.int32)
    return VoxelPreprocessed(
        center_vox=center_vox,
        conic=conic,
        weight=weight,
        radii=radii,
        cube_min=cube_min,
        cube_max=cube_max,
    )
