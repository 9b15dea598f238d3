"""Dense (brute-force) reference implementations of the rasterizer and
voxelizer in pure jnp.

These are the correctness oracles for the Pallas kernels: O(N * pixels),
exact reference semantics (tile-quantized footprints, power and alpha
cutoffs), fully differentiable via XLA autodiff. Also used directly for
small scenes and in tests (CPU backend).

Semantics (matching the reference CUDA renderers):
  rasterizer (cuda_rasterizer/forward.cu:294-395): a gaussian contributes
    w * exp(power) to pixel p iff
      - the gaussian survived preprocess culling (weight > 0),
      - p's 16x16 tile lies inside the gaussian's tile rect,
      - power <= 0 and alpha = w * exp(power) >= 1e-5.
  voxelizer (cuda_voxelizer/forward.cu:195-310): same with 8^3 blocks,
    alpha cutoff 1e-6, voxel centers at index+0.5, no power>0 case for a
    valid PSD conic but the mask is kept for parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.preprocess import TILE, Preprocessed
from ..models.voxel_preprocess import BLOCK3D, VoxelPreprocessed

ALPHA_CUT_2D = 1e-5  # forward.cu:374
ALPHA_CUT_3D = 1e-6  # cuda_voxelizer/forward.cu:291


def _render_chunk(prep: Preprocessed, px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """Contribution of all gaussians in `prep` to pixels (px, py) [P]."""
    dx = px[:, None] - prep.mean2d[None, :, 0]  # [P, N]
    dy = py[:, None] - prep.mean2d[None, :, 1]
    cxx, cxy, cyy = prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2]
    power = (
        -0.5 * (cxx[None, :] * dx * dx + cyy[None, :] * dy * dy)
        - cxy[None, :] * dx * dy
    )
    in_rect = (
        (px[:, None] >= prep.px_bounds[None, :, 0])
        & (px[:, None] < prep.px_bounds[None, :, 1])
        & (py[:, None] >= prep.px_bounds[None, :, 2])
        & (py[:, None] < prep.px_bounds[None, :, 3])
    )
    # exp clamped at 0 so autodiff's where-cotangent never sees inf on
    # masked pixels (0*inf = NaN); exact for contributing pixels, which
    # already require power <= 0 (dev/nan_fuzz.py)
    alpha = prep.weight[None, :] * jnp.exp(jnp.minimum(power, 0.0))
    ok = in_rect & (power <= 0.0) & (alpha >= ALPHA_CUT_2D)
    return jnp.sum(jnp.where(ok, alpha, 0.0), axis=1)


def render_dense(
    prep: Preprocessed, *, width: int, height: int, gaussian_chunk: int = 4096
) -> jnp.ndarray:
    """Render an [H, W] projection by brute force, chunked over gaussians."""
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    px = jnp.tile(xs, height)
    py = jnp.repeat(ys, width)

    n = prep.mean2d.shape[0]
    if n <= gaussian_chunk:
        img = _render_chunk(prep, px, py)
    else:
        pad = (-n) % gaussian_chunk
        padded = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0
            ).reshape((-1, gaussian_chunk) + a.shape[1:]),
            prep,
        )

        def body(carry, chunk):
            return carry + _render_chunk(chunk, px, py), None

        img, _ = jax.lax.scan(body, jnp.zeros_like(px), padded)
    return img.reshape(height, width)


def render_dense_untruncated(
    prep: Preprocessed, *, width: int, height: int, gaussian_chunk: int = 4096
) -> jnp.ndarray:
    """Untruncated oracle: every gaussian contributes w*exp(power) at every
    pixel (no rect/power/alpha cutoffs). This is the semantics target of the
    low-rank Mehler kernel (splat2d), which only crops at block windows
    sized to the alpha-aware bounds — so kernel vs oracle differences are
    bounded by the sub-cutoff tails plus the Mehler truncation error."""
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    px = jnp.tile(xs, height)
    py = jnp.repeat(ys, width)

    def chunk(prep_c):
        dx = px[:, None] - prep_c.mean2d[None, :, 0]
        dy = py[:, None] - prep_c.mean2d[None, :, 1]
        cxx, cxy, cyy = prep_c.conic[:, 0], prep_c.conic[:, 1], prep_c.conic[:, 2]
        power = (
            -0.5 * (cxx[None] * dx * dx + cyy[None] * dy * dy)
            - cxy[None] * dx * dy
        )
        # exact for a PSD conic (power <= 0 holds); bounds f32
        # cancellation on degenerate rows, mirroring the kernels
        return jnp.sum(prep_c.weight[None] * jnp.exp(jnp.minimum(power, 0.0)),
                       axis=1)

    n = prep.mean2d.shape[0]
    if n <= gaussian_chunk:
        img = chunk(prep)
    else:
        pad = (-n) % gaussian_chunk
        padded = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0
            ).reshape((-1, gaussian_chunk) + a.shape[1:]),
            prep,
        )
        img, _ = jax.lax.scan(
            lambda c, p: (c + chunk(p), None), jnp.zeros_like(px), padded
        )
    return img.reshape(height, width)


def _voxel_chunk(
    prep: VoxelPreprocessed, vx: jnp.ndarray, vy: jnp.ndarray, vz: jnp.ndarray
) -> jnp.ndarray:
    dx = vx[:, None] - prep.center_vox[None, :, 0]  # [V, N]
    dy = vy[:, None] - prep.center_vox[None, :, 1]
    dz = vz[:, None] - prep.center_vox[None, :, 2]
    ia, ib, ic = prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2]
    id_, ie, if_ = prep.conic[:, 3], prep.conic[:, 4], prep.conic[:, 5]
    power = (
        -0.5 * (ia[None] * dx * dx + id_[None] * dy * dy + if_[None] * dz * dz)
        - ib[None] * dx * dy
        - ic[None] * dx * dz
        - ie[None] * dy * dz
    )
    bx = ((vx - 0.5)[:, None] / BLOCK3D).astype(jnp.int32)
    by = ((vy - 0.5)[:, None] / BLOCK3D).astype(jnp.int32)
    bz = ((vz - 0.5)[:, None] / BLOCK3D).astype(jnp.int32)
    in_cube = (
        (bx >= prep.cube_min[None, :, 0])
        & (bx < prep.cube_max[None, :, 0])
        & (by >= prep.cube_min[None, :, 1])
        & (by < prep.cube_max[None, :, 1])
        & (bz >= prep.cube_min[None, :, 2])
        & (bz < prep.cube_max[None, :, 2])
    )
    # exp clamp: same masked-inf autodiff guard as _render_chunk above
    alpha = prep.weight[None, :] * jnp.exp(jnp.minimum(power, 0.0))
    ok = in_cube & (power <= 0.0) & (alpha >= ALPHA_CUT_3D)
    return jnp.sum(jnp.where(ok, alpha, 0.0), axis=1)


def voxelize_dense(
    prep: VoxelPreprocessed, *, n_voxel, gaussian_chunk: int = 4096,
    voxel_chunk: int = 262144
) -> jnp.ndarray:
    """Voxelize into an [nx, ny, nz] grid by brute force (output layout
    [x][y][z], matching cuda_voxelizer/forward.cu:204). Chunked over BOTH
    gaussians and voxels so the [V, N] pair grid stays bounded — a full
    256^3 query over 50k gaussians would otherwise materialize hundreds of
    GB (the voxel loop is a lax.map, so peak memory is one
    voxel_chunk x gaussian_chunk tile)."""
    nx, ny, nz = int(n_voxel[0]), int(n_voxel[1]), int(n_voxel[2])
    ix = jnp.arange(nx, dtype=jnp.float32) + 0.5
    iy = jnp.arange(ny, dtype=jnp.float32) + 0.5
    iz = jnp.arange(nz, dtype=jnp.float32) + 0.5
    vx = jnp.repeat(ix, ny * nz)
    vy = jnp.tile(jnp.repeat(iy, nz), nx)
    vz = jnp.tile(iz, nx * ny)

    n = prep.center_vox.shape[0]

    def all_gaussians(vx, vy, vz):
        if n <= gaussian_chunk:
            return _voxel_chunk(prep, vx, vy, vz)
        pad = (-n) % gaussian_chunk
        padded = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0
            ).reshape((-1, gaussian_chunk) + a.shape[1:]),
            prep,
        )

        def body(carry, chunk):
            return carry + _voxel_chunk(chunk, vx, vy, vz), None

        vol, _ = jax.lax.scan(body, jnp.zeros_like(vx), padded)
        return vol

    nvox = vx.shape[0]
    if nvox <= voxel_chunk:
        vol = all_gaussians(vx, vy, vz)
    else:
        vpad = (-nvox) % voxel_chunk
        def padv(a):
            return jnp.concatenate(
                [a, jnp.zeros((vpad,), a.dtype)]).reshape(-1, voxel_chunk)

        vol = jax.lax.map(
            lambda args: all_gaussians(*args), (padv(vx), padv(vy), padv(vz))
        ).reshape(-1)[:nvox]
    return vol.reshape(nx, ny, nz)
