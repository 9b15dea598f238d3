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
  - 16x16 tile rectangle (auxiliary.h getRect) -- this tile granularity is
    part of the reference's *output semantics* (a Gaussian contributes to
    every pixel of every tile its rect covers, subject to the alpha cutoff),
    so we reproduce it exactly.

Unlike the CUDA code, the backward pass is supplied by XLA autodiff of this
function; tests validate gradients against finite differences.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

TILE = 16  # reference config.h BLOCK_X/BLOCK_Y
TWO_PI = 6.283185307179586


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[N,4] (w,x,y,z), assumed normalized -> [N,3,3].

    The kernel does not renormalize (forward.cu:170); normalization is the
    model's rotation activation.
    """
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1),
            jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1),
            jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )


def build_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray) -> jnp.ndarray:
    """World covariance Sigma = R diag(s^2) R^T, [N,3,3].

    Full f32 precision: TPU f32 matmuls default to bf16 MXU passes, which
    loses ~0.2% here and visibly perturbs the conic — these tiny 3x3
    contractions must run at HIGHEST precision (negligible cost).
    """
    rot = quat_to_rotmat(rotations)
    m = rot * scales[:, None, :]  # R @ diag(s)
    return jnp.einsum("nij,nkj->nik", m, m, precision="highest")


def ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """auxiliary.h:45-48 (the -1 compensates for the half pixel)."""
    return ((v + 1.0) * size - 1.0) * 0.5


class Preprocessed(NamedTuple):
    """Per-Gaussian render primitives. All [N,...]; invalid rows have
    weight == 0 and a degenerate off-screen rect."""

    mean2d: jnp.ndarray  # [N,2] pixel-space center
    conic: jnp.ndarray  # [N,3] (cxx, cxy, cyy) of inverse 2D covariance
    weight: jnp.ndarray  # [N] density * mu (0 for culled)
    mu: jnp.ndarray  # [N] rectification factor
    radius: jnp.ndarray  # [N] int32 pixel radius (0 for culled)
    rect_min: jnp.ndarray  # [N,2] int32 tile-space rect (x, y), inclusive
    rect_max: jnp.ndarray  # [N,2] int32 tile-space rect, exclusive
    depth: jnp.ndarray  # [N] view-space z
    px_bounds: jnp.ndarray  # [N,4] pixel-space footprint (xlo, xhi, ylo, yhi)


def preprocess(
    xyz: jnp.ndarray,
    cov3d: jnp.ndarray,
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

    `mean2d_offset_ndc` is a zeros-valued [N,2] hook whose cotangent equals
    the reference's "viewspace point gradient" used for densification
    (NDC-space, i.e. d pix/d ndc = W/2 folded in; see backward.cu:562-563).

    `footprint` selects the per-gaussian contribution mask:
      - "tile": reference-exact — a gaussian contributes to every pixel of
        every 16x16 tile its 3-sigma rect touches (subject to the alpha
        cutoff), matching cuda_rasterizer getRect semantics bit-for-bit;
      - "tight": pixels within the 3-sigma box [mean-r, mean+r] only. This
        drops the <=0.011*w contributions in tile-corner slivers beyond
        3 sigma (they only exist as a side effect of the reference's tile
        binning) and shrinks every kernel window by up to 32px. PSNR-
        equivalent; the default for training via configs.
    """
    n = xyz.shape[0]
    focal_x = width / (2.0 * tanfovx)
    focal_y = height / (2.0 * tanfovy)

    # View and NDC transforms (HIGHEST precision: see build_cov3d)
    hi = "highest"
    p_view = jnp.einsum("ni,ji->nj", xyz, w2c[:3, :3], precision=hi) + w2c[:3, 3]
    p_hom = (
        jnp.einsum("ni,ji->nj", xyz, full_proj[:3, :3], precision=hi)
        + full_proj[:3, 3]
    )
    w_hom = jnp.einsum("ni,i->n", xyz, full_proj[3, :3], precision=hi) + full_proj[3, 3]
    p_ndc = p_hom / (w_hom + 1e-7)[:, None]

    # Ray-space covariance via the (3-row) EWA Jacobian (forward.cu:77-131).
    tx, ty, tz = p_view[:, 0], p_view[:, 1], p_view[:, 2]
    if mode == 0:  # parallel beam: J = diag(fx, fy, 1)
        j_mats = jnp.zeros((n, 3, 3), xyz.dtype)
        j_mats = j_mats.at[:, 0, 0].set(focal_x)
        j_mats = j_mats.at[:, 1, 1].set(focal_y)
        j_mats = j_mats.at[:, 2, 2].set(1.0)
    else:  # cone beam
        lim_x, lim_y = 1.3 * tanfovx, 1.3 * tanfovy
        txc = jnp.clip(tx / tz, -lim_x, lim_x) * tz
        tyc = jnp.clip(ty / tz, -lim_y, lim_y) * tz
        length = jnp.sqrt(txc * txc + tyc * tyc + tz * tz)
        zeros = jnp.zeros_like(tz)
        j_mats = jnp.stack(
            [
                jnp.stack([focal_x / tz, zeros, -(focal_x * txc) / (tz * tz)], -1),
                jnp.stack([zeros, focal_y / tz, -(focal_y * tyc) / (tz * tz)], -1),
                jnp.stack([txc / length, tyc / length, tz / length], -1),
            ],
            -2,
        )
    t_mats = jnp.einsum("nij,jk->nik", j_mats, w2c[:3, :3], precision=hi)  # J @ R
    cov_ray = jnp.einsum(
        "nij,njk,nlk->nil", t_mats, cov3d, t_mats, precision=hi
    )  # [N,3,3]

    # mu = sqrt(2 pi det3 / det2), 0 when the square is non-positive
    # (forward.cu:139-155).
    a, b, c = cov_ray[:, 0, 0], cov_ray[:, 0, 1], cov_ray[:, 0, 2]
    d, e, f = cov_ray[:, 1, 1], cov_ray[:, 1, 2], cov_ray[:, 2, 2]
    diamond = a * d - b * b
    circ = a * d * f + 2 * b * c * e - a * e * e - f * b * b - d * c * c
    mu_sq = TWO_PI * circ / diamond
    mu = jnp.where(mu_sq > 0, jnp.sqrt(jnp.where(mu_sq > 0, mu_sq, 1.0)), 0.0)

    # Conic and radius (forward.cu:260-274)
    det = a * d - b * b
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([d / det_safe, -b / det_safe, a / det_safe], -1)
    mid = 0.5 * (a + d)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    # Pixel-space center; densification-stat hook added in NDC space.
    ndc_xy = p_ndc[:, :2]
    if mean2d_offset_ndc is not None:
        ndc_xy = ndc_xy + mean2d_offset_ndc
    mean2d = jnp.stack(
        [ndc2pix(ndc_xy[:, 0], width), ndc2pix(ndc_xy[:, 1], height)], -1
    )

    # Tile rect (auxiliary.h getRect), 16x16 tiles.
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    rmin_x = jnp.clip(((mean2d[:, 0] - radius_f) / TILE).astype(jnp.int32), 0, grid_x)
    rmin_y = jnp.clip(((mean2d[:, 1] - radius_f) / TILE).astype(jnp.int32), 0, grid_y)
    rmax_x = jnp.clip(
        ((mean2d[:, 0] + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, grid_x
    )
    rmax_y = jnp.clip(
        ((mean2d[:, 1] + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, grid_y
    )
    tiles_touched = (rmax_x - rmin_x) * (rmax_y - rmin_y)

    valid = (p_view[:, 2] > 0.2) & det_ok & (tiles_touched > 0)
    if active is not None:
        valid = valid & active
    weight = jnp.where(valid, density * mu, 0.0)
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    if footprint == "tile":
        px_bounds = jnp.stack(
            [
                rmin_x.astype(jnp.float32) * TILE,
                rmax_x.astype(jnp.float32) * TILE,
                rmin_y.astype(jnp.float32) * TILE,
                rmax_y.astype(jnp.float32) * TILE,
            ],
            -1,
        )
    elif footprint == "tight":
        px_bounds = jnp.stack(
            [
                jnp.maximum(mean2d[:, 0] - radius_f, 0.0),
                jnp.minimum(mean2d[:, 0] + radius_f + 1.0, float(width)),
                jnp.maximum(mean2d[:, 1] - radius_f, 0.0),
                jnp.minimum(mean2d[:, 1] + radius_f + 1.0, float(height)),
            ],
            -1,
        )
    else:
        raise ValueError(f"unknown footprint {footprint}")

    return Preprocessed(
        mean2d=mean2d,
        conic=conic,
        weight=weight,
        mu=mu,
        radius=radius,
        rect_min=jnp.stack([rmin_x, rmin_y], -1),
        rect_max=jnp.stack([rmax_x, rmax_y], -1),
        depth=p_view[:, 2],
        px_bounds=px_bounds,
    )
