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
# Conic conditioning cull: rows whose inverse-covariance entries exceed this
# (in 1/voxel^2 units; sigma ~3e-5 voxels) are treated as degenerate and
# culled, BEFORE the entries can overflow downstream kernels (see
# voxel_preprocess below and dev/nan_fuzz.py).
CONIC_MAX_3D = 1e9


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
    det_ok = jnp.isfinite(det) & (det != 0.0)
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    ia = (d * f - e * e) * inv_det
    ib = (c * e - b * f) * inv_det
    ic = (b * e - c * d) * inv_det
    id_ = (a * f - c * c) * inv_det
    ie = (b * c - a * e) * inv_det
    if_ = (a * d - b * b) * inv_det
    # Conic conditioning gate (root cause of the chest-run TV NaN,
    # reproduced by dev/nan_fuzz.py): a rotated near-degenerate covariance
    # can land det in the f32 denormal range, making inv_det (and the conic
    # entries) inf — or, one notch less extreme, finite-but-huge entries
    # whose Hermite powers overflow inside the low-rank kernels. Such rows
    # are culled (CONIC_MAX = 1e9 in voxel units corresponds to a sigma of
    # ~3e-5 voxels — far below anything renderable) and their conic is
    # replaced by the identity so no non-finite value can reach a kernel;
    # kernels mask weight == 0 rows, so values and grads are unchanged.
    conic_mag = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(ia), jnp.abs(ib)), jnp.abs(ic)),
        jnp.maximum(jnp.maximum(jnp.abs(id_), jnp.abs(ie)), jnp.abs(if_)),
    )
    # Positive-definiteness gate: f32 inversion of a near-degenerate
    # covariance can yield a finite but INDEFINITE conic (negative
    # diagonal); such rows are meaningless to render, and their garbage
    # values blow up autodiff partials downstream (0-cotangent * inf
    # partial = NaN in build_lowrank_features3 — dev/nan_fuzz.py). The
    # pairwise 2x2 minors + positive diagonal are necessary PD conditions;
    # healthy rows satisfy them with ~1e-7 relative margin even at conic
    # correlation 0.99999. (The reference CUDA only guards det == 0 and
    # renders indefinite garbage; culling is strictly saner.)
    pd_ok = (
        (ia > 0.0) & (id_ > 0.0) & (if_ > 0.0)
        & (ia * id_ > ib * ib) & (ia * if_ > ic * ic) & (id_ * if_ > ie * ie)
    )
    det_ok = det_ok & (conic_mag <= CONIC_MAX_3D) & pd_ok

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
    one = jnp.ones_like(ia)
    zf = jnp.zeros_like(ia)
    return VoxelPreprocessed(
        cx=jnp.where(valid, cx, zf),
        cy=jnp.where(valid, cy, zf),
        cz=jnp.where(valid, cz, zf),
        ia=jnp.where(valid, ia, one), ib=jnp.where(valid, ib, zf),
        ic=jnp.where(valid, ic, zf), id_=jnp.where(valid, id_, one),
        ie=jnp.where(valid, ie, zf), if_=jnp.where(valid, if_, one),
        weight=weight,
        rx=jnp.where(valid, rfx, zero).astype(jnp.int32),
        ry=jnp.where(valid, rfy, zero).astype(jnp.int32),
        rz=jnp.where(valid, rfz, zero).astype(jnp.int32),
        cube_min_x=cminx, cube_min_y=cminy, cube_min_z=cminz,
        cube_max_x=cmaxx, cube_max_y=cmaxy, cube_max_z=cmaxz,
    )
