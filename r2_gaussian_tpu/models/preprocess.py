"""Per-Gaussian projection preprocessing (differentiable, vectorized jnp).

Re-derivation of the reference CUDA preprocess (cuda_rasterizer/forward.cu):
  - quaternion -> rotation, covariance assembly (forward.cu:161-195)
  - EWA ray-space covariance with the 3x3 Jacobian kept, NO low-pass
    dilation (forward.cu:77-137)
  - rectification factor mu = sqrt(2*pi * det3(cov)/det2(cov_2x2)),
    clamped to 0 when mu^2 < 0 (forward.cu:139-155, Eq. 7 of the paper)
  - conic = inverse 2x2 covariance, 3-sigma pixel radius from the largest
    eigenvalue (forward.cu:260-274)
  - near culling at view z <= 0.2 (auxiliary.h in_frustum)
  - 16x16 tile rectangle (auxiliary.h getRect)

TPU layout note: everything here is computed COMPONENT-WISE on (N,) arrays.
Batched-small-matrix forms ((N,3,3) einsums, (N,4) quaternions) put the
small axis in the 128-lane dimension, wasting >40x lanes and forcing
relayouts — measured 30-50 ms per op at N=512k vs ~1 ms for the whole
component-wise preprocess. The backward pass is supplied by XLA autodiff.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

TILE = 16  # reference config.h BLOCK_X/BLOCK_Y
TWO_PI = 6.283185307179586
# Conic conditioning cull threshold (1/px^2); see the gate in preprocess()
CONIC_MAX_2D = 1e9
# Per-pixel contribution cutoff (reference forward.cu:294-395 skips
# alpha < 1e-5). Shared with the splat kernels.
ALPHA_CUT = 1e-5


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[N,4] (w,x,y,z), assumed normalized -> [N,3,3]. (Row-major stack;
    used by densify's split sampling, not the render hot path.)"""
    rows = quat_rot_components(q[:, 0], q[:, 1], q[:, 2], q[:, 3])
    return jnp.stack(
        [jnp.stack(rows[0:3], -1), jnp.stack(rows[3:6], -1), jnp.stack(rows[6:9], -1)],
        -2,
    )


def quat_rot_components(r, x, y, z):
    """Rotation matrix entries (row-major 9-tuple) from quaternion
    components, each an (N,) array (forward.cu:170-183)."""
    return (
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    )


def cov3d_components(scales: jnp.ndarray, rotations: jnp.ndarray):
    """World covariance Sigma = R diag(s^2) R^T as its 6 unique entries
    (sxx, sxy, sxz, syy, syz, szz), each (N,)."""
    rr = quat_rot_components(
        rotations[:, 0], rotations[:, 1], rotations[:, 2], rotations[:, 3]
    )
    s0, s1, s2 = scales[:, 0] ** 2, scales[:, 1] ** 2, scales[:, 2] ** 2

    def entry(i, j):
        return (
            rr[3 * i] * s0 * rr[3 * j]
            + rr[3 * i + 1] * s1 * rr[3 * j + 1]
            + rr[3 * i + 2] * s2 * rr[3 * j + 2]
        )

    return entry(0, 0), entry(0, 1), entry(0, 2), entry(1, 1), entry(1, 2), entry(2, 2)


def build_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray) -> jnp.ndarray:
    """[N,3,3] world covariance (compat wrapper over cov3d_components)."""
    sxx, sxy, sxz, syy, syz, szz = cov3d_components(scales, rotations)
    row0 = jnp.stack([sxx, sxy, sxz], -1)
    row1 = jnp.stack([sxy, syy, syz], -1)
    row2 = jnp.stack([sxz, syz, szz], -1)
    return jnp.stack([row0, row1, row2], -2)


def ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """auxiliary.h:45-48 (the -1 compensates for the half pixel)."""
    return ((v + 1.0) * size - 1.0) * 0.5


class Preprocessed(NamedTuple):
    """Per-Gaussian render primitives, component-wise (all (N,) f32 unless
    noted). Invalid rows have weight == 0 and a degenerate rect."""

    mx: jnp.ndarray  # pixel-space center x
    my: jnp.ndarray  # pixel-space center y
    cxx: jnp.ndarray  # conic (inverse 2D covariance) entries
    cxy: jnp.ndarray
    cyy: jnp.ndarray
    weight: jnp.ndarray  # density * mu (0 for culled)
    mu: jnp.ndarray  # rectification factor
    radius: jnp.ndarray  # int32 3-sigma pixel radius (0 for culled)
    xlo: jnp.ndarray  # pixel-space footprint bounds
    xhi: jnp.ndarray
    ylo: jnp.ndarray
    yhi: jnp.ndarray
    depth: jnp.ndarray  # view-space z
    rect_min_x: jnp.ndarray  # int32 tile-space rect (inclusive)
    rect_min_y: jnp.ndarray
    rect_max_x: jnp.ndarray  # int32 tile-space rect (exclusive)
    rect_max_y: jnp.ndarray

    # -- stacked-view compatibility properties --------------------------
    @property
    def mean2d(self):
        return jnp.stack([self.mx, self.my], -1)

    @property
    def conic(self):
        return jnp.stack([self.cxx, self.cxy, self.cyy], -1)

    @property
    def px_bounds(self):
        return jnp.stack([self.xlo, self.xhi, self.ylo, self.yhi], -1)

    @property
    def rect_min(self):
        return jnp.stack([self.rect_min_x, self.rect_min_y], -1)

    @property
    def rect_max(self):
        return jnp.stack([self.rect_max_x, self.rect_max_y], -1)


def preprocess(
    xyz: jnp.ndarray,
    cov3d,
    density: jnp.ndarray,
    w2c: jnp.ndarray,
    full_proj: jnp.ndarray,
    *,
    width: int,
    height: int,
    tanfovx: float,
    tanfovy: float,
    mode: int,
    active: jnp.ndarray | None = None,
    mean2d_offset_ndc: jnp.ndarray | None = None,
    footprint: str = "tile",
) -> Preprocessed:
    """Project N gaussians into one view.

    cov3d: either an [N,3,3] covariance or a 6-tuple of (N,) components
    (sxx, sxy, sxz, syy, syz, szz) — prefer the tuple on TPU.

    `mean2d_offset_ndc` is a zeros-valued [N,2] hook whose cotangent equals
    the reference's "viewspace point gradient" used for densification
    (NDC-space; see backward.cu:562-563).

    `footprint` selects the per-gaussian contribution mask:
      - "tile": reference-exact 16x16-tile-quantized rects;
      - "tight": alpha-aware 3-sigma box (see px_bounds comment below).
    """
    if isinstance(cov3d, tuple):
        sxx, sxy, sxz, syy, syz, szz = cov3d
    else:
        sxx, sxy, sxz = cov3d[:, 0, 0], cov3d[:, 0, 1], cov3d[:, 0, 2]
        syy, syz, szz = cov3d[:, 1, 1], cov3d[:, 1, 2], cov3d[:, 2, 2]
    px, py, pz = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    focal_x = width / (2.0 * tanfovx)
    focal_y = height / (2.0 * tanfovy)

    # View transform components (w2c rows are constants)
    w = w2c
    tx = w[0, 0] * px + w[0, 1] * py + w[0, 2] * pz + w[0, 3]
    ty = w[1, 0] * px + w[1, 1] * py + w[1, 2] * pz + w[1, 3]
    tz = w[2, 0] * px + w[2, 1] * py + w[2, 2] * pz + w[2, 3]

    fp = full_proj
    hx = fp[0, 0] * px + fp[0, 1] * py + fp[0, 2] * pz + fp[0, 3]
    hy = fp[1, 0] * px + fp[1, 1] * py + fp[1, 2] * pz + fp[1, 3]
    hw = fp[3, 0] * px + fp[3, 1] * py + fp[3, 2] * pz + fp[3, 3]
    inv_w = 1.0 / (hw + 1e-7)
    ndc_x = hx * inv_w
    ndc_y = hy * inv_w

    # Ray-space covariance via the (3-row) EWA Jacobian (forward.cu:77-131):
    # T = J @ W3 (W3 = w2c[:3,:3]), cov_ray = T Sigma T^T — all expanded
    # component-wise.
    if mode == 0:  # parallel beam: J = diag(fx, fy, 1)
        j00 = jnp.full_like(tz, focal_x)
        j02 = jnp.zeros_like(tz)
        j11 = jnp.full_like(tz, focal_y)
        j12 = jnp.zeros_like(tz)
        j20 = jnp.zeros_like(tz)
        j21 = jnp.zeros_like(tz)
        j22 = jnp.ones_like(tz)
    else:  # cone beam
        lim_x, lim_y = 1.3 * tanfovx, 1.3 * tanfovy
        inv_tz = 1.0 / tz
        txc = jnp.clip(tx * inv_tz, -lim_x, lim_x) * tz
        tyc = jnp.clip(ty * inv_tz, -lim_y, lim_y) * tz
        length = jnp.sqrt(txc * txc + tyc * tyc + tz * tz)
        inv_len = 1.0 / length
        j00 = focal_x * inv_tz
        j02 = -(focal_x * txc) * inv_tz * inv_tz
        j11 = focal_y * inv_tz
        j12 = -(focal_y * tyc) * inv_tz * inv_tz
        j20 = txc * inv_len
        j21 = tyc * inv_len
        j22 = tz * inv_len
    # T rows (J has zeros at (0,1) and (1,0)):
    # T[0,:] = j00*W[0,:] + j02*W[2,:]
    # T[1,:] = j11*W[1,:] + j12*W[2,:]
    # T[2,:] = j20*W[0,:] + j21*W[1,:] + j22*W[2,:]
    t00 = j00 * w[0, 0] + j02 * w[2, 0]
    t01 = j00 * w[0, 1] + j02 * w[2, 1]
    t02 = j00 * w[0, 2] + j02 * w[2, 2]
    t10 = j11 * w[1, 0] + j12 * w[2, 0]
    t11 = j11 * w[1, 1] + j12 * w[2, 1]
    t12 = j11 * w[1, 2] + j12 * w[2, 2]
    t20 = j20 * w[0, 0] + j21 * w[1, 0] + j22 * w[2, 0]
    t21 = j20 * w[0, 1] + j21 * w[1, 1] + j22 * w[2, 1]
    t22 = j20 * w[0, 2] + j21 * w[1, 2] + j22 * w[2, 2]

    def sig_dot(a0, a1, a2, b0, b1, b2):
        """a^T Sigma b for row vectors a, b given per-component."""
        return (
            a0 * (sxx * b0 + sxy * b1 + sxz * b2)
            + a1 * (sxy * b0 + syy * b1 + syz * b2)
            + a2 * (sxz * b0 + syz * b1 + szz * b2)
        )

    a = sig_dot(t00, t01, t02, t00, t01, t02)  # cov_ray[0,0]
    b = sig_dot(t00, t01, t02, t10, t11, t12)  # cov_ray[0,1]
    c = sig_dot(t00, t01, t02, t20, t21, t22)  # cov_ray[0,2]
    d = sig_dot(t10, t11, t12, t10, t11, t12)  # cov_ray[1,1]
    e = sig_dot(t10, t11, t12, t20, t21, t22)  # cov_ray[1,2]
    f = sig_dot(t20, t21, t22, t20, t21, t22)  # cov_ray[2,2]

    # mu = sqrt(2 pi det3 / det2), 0 when the square is non-positive
    # (forward.cu:139-155).
    diamond = a * d - b * b
    circ = a * d * f + 2 * b * c * e - a * e * e - f * b * b - d * c * c
    mu_sq = TWO_PI * circ / diamond
    mu = jnp.where(mu_sq > 0, jnp.sqrt(jnp.where(mu_sq > 0, mu_sq, 1.0)), 0.0)

    # Conic and radius (forward.cu:260-274)
    det = a * d - b * b
    det_ok = jnp.isfinite(det) & (det != 0.0)
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    cxx = d * inv_det
    cxy = -b * inv_det
    cyy = a * inv_det
    # Conic conditioning gate: a near-degenerate projected covariance can
    # land det in the f32 denormal range -> inf conic entries, or
    # finite-but-huge entries whose Hermite powers overflow inside the
    # low-rank kernels (the 3D analog caused the chest-run TV NaN; see
    # models/voxel_preprocess.py and dev/nan_fuzz.py). CONIC_MAX_2D = 1e9
    # per-pixel^2 corresponds to sigma ~3e-5 px — far below renderable.
    conic_mag = jnp.maximum(jnp.maximum(jnp.abs(cxx), jnp.abs(cxy)),
                            jnp.abs(cyy))
    # Positive-definiteness gate (see voxel_preprocess.py): an indefinite
    # f32 conic is garbage to render and poisons autodiff partials in the
    # low-rank feature builder. det > 0 with positive diagonal <=> PD here.
    pd_ok = (cxx > 0.0) & (cyy > 0.0) & (cxx * cyy > cxy * cxy)
    det_ok = det_ok & (conic_mag <= CONIC_MAX_2D) & pd_ok
    mid = 0.5 * (a + d)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    # Pixel-space center; densification-stat hook added in NDC space.
    if mean2d_offset_ndc is not None:
        ndc_x = ndc_x + mean2d_offset_ndc[:, 0]
        ndc_y = ndc_y + mean2d_offset_ndc[:, 1]
    mx = ndc2pix(ndc_x, width)
    my = ndc2pix(ndc_y, height)

    # Tile rect (auxiliary.h getRect), 16x16 tiles.
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    rmin_x = jnp.clip(((mx - radius_f) / TILE).astype(jnp.int32), 0, grid_x)
    rmin_y = jnp.clip(((my - radius_f) / TILE).astype(jnp.int32), 0, grid_y)
    rmax_x = jnp.clip(((mx + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, grid_x)
    rmax_y = jnp.clip(((my + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, grid_y)
    tiles_touched = (rmax_x - rmin_x) * (rmax_y - rmin_y)

    valid = (tz > 0.2) & det_ok & (tiles_touched > 0)
    if active is not None:
        valid = valid & active
    weight = jnp.where(valid, density * mu, 0.0)
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    # Neutralize culled rows' conic and center so no non-finite value can
    # reach a kernel (weight == 0 masks their contribution; values and
    # grads of valid rows are unchanged — see voxel_preprocess.py note)
    one = jnp.ones_like(cxx)
    zf = jnp.zeros_like(cxx)
    cxx = jnp.where(valid, cxx, one)
    cxy = jnp.where(valid, cxy, zf)
    cyy = jnp.where(valid, cyy, one)
    mx = jnp.where(valid, mx, zf)
    my = jnp.where(valid, my, zf)

    if footprint == "tile":
        xlo = rmin_x.astype(jnp.float32) * TILE
        xhi = rmax_x.astype(jnp.float32) * TILE
        ylo = rmin_y.astype(jnp.float32) * TILE
        yhi = rmax_y.astype(jnp.float32) * TILE
    elif footprint == "tight":
        # Alpha-aware effective radius: every pixel with alpha >= ALPHA_CUT
        # lies within sqrt(2*lambda1*ln(w/ALPHA_CUT)) of the center (lambda1
        # bounds the marginal variances), so shrinking the 3-sigma box to
        # that radius drops only contributions the per-pixel cutoff already
        # zeroes — output-identical, but far smaller kernel windows for dim
        # gaussians. `radius` (used for visibility/prune stats) keeps the
        # reference's 3-sigma semantics.
        w_all = density * mu
        ln_t = jnp.log(jnp.maximum(w_all, 1e-30) / ALPHA_CUT)
        r_alpha = jnp.ceil(jnp.sqrt(jnp.maximum(2.0 * lambda1 * ln_t, 0.0)))
        r_eff = jnp.minimum(radius_f, r_alpha)
        xlo = jnp.maximum(mx - r_eff, 0.0)
        xhi = jnp.minimum(mx + r_eff + 1.0, float(width))
        ylo = jnp.maximum(my - r_eff, 0.0)
        yhi = jnp.minimum(my + r_eff + 1.0, float(height))
    else:
        raise ValueError(f"unknown footprint {footprint}")

    return Preprocessed(
        mx=mx,
        my=my,
        cxx=cxx,
        cxy=cxy,
        cyy=cyy,
        weight=weight,
        mu=mu,
        radius=radius,
        xlo=xlo,
        xhi=xhi,
        ylo=ylo,
        yhi=yhi,
        depth=tz,
        rect_min_x=rmin_x,
        rect_min_y=rmin_y,
        rect_max_x=rmax_x,
        rect_max_y=rmax_y,
    )
