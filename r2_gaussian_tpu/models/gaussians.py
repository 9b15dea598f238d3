"""Gaussian parameter state: padded SoA pytree + activations + IO.

Equivalent of the reference GaussianModel (gaussian/gaussian_model.py) in a
functional, XLA-friendly form:
  - raw parameters in fixed-capacity padded arrays with an `active` mask and
    a live count, so every training op has static shapes;
  - activations: density = softplus (gaussian_model.py:61), rotation =
    L2-normalize (:64), scale = exp, or a bounded sigmoid into
    [scale_min*vol, scale_max*vol] when scale_bound is set (:44-58);
  - checkpoints saved as point_cloud.pickle with raw (pre-activation) arrays
    and keys {xyz, density, scale, rotation, scale_bound}
    (gaussian_model.py:263-281), interchangeable with the reference.
"""

from __future__ import annotations

import os
import os.path as osp
import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-5


class GaussianParams(NamedTuple):
    """Raw (pre-activation) parameters, padded to fixed capacity C."""

    xyz: jnp.ndarray  # [C, 3]
    scaling: jnp.ndarray  # [C, 3] raw
    rotation: jnp.ndarray  # [C, 4] raw quaternion (w, x, y, z)
    density: jnp.ndarray  # [C, 1] raw

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]


class GaussianAux(NamedTuple):
    """Non-optimized per-gaussian state."""

    active: jnp.ndarray  # [C] bool
    max_radii2d: jnp.ndarray  # [C] f32
    xyz_gradient_accum: jnp.ndarray  # [C] f32
    denom: jnp.ndarray  # [C] f32

    @property
    def n_active(self) -> jnp.ndarray:
        return jnp.sum(self.active.astype(jnp.int32))


# ---------------------------------------------------------------------------
# activations


def softplus(x):
    return jax.nn.softplus(x)


def inverse_softplus(x):
    # log(exp(x) - 1), stable: x + log1p(-exp(-x))
    x = jnp.asarray(x)
    return x + jnp.log(-jnp.expm1(-x))


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


def scale_activation(raw, scale_bound):
    if scale_bound is None:
        return jnp.exp(raw)
    lo, hi = scale_bound
    return jax.nn.sigmoid(raw) * (hi - lo) + lo


def scale_inverse_activation(s, scale_bound):
    if scale_bound is None:
        return jnp.log(s)
    lo, hi = scale_bound
    return inverse_sigmoid(jax.nn.relu((s - lo) / (hi - lo)))


def activate(params: GaussianParams, scale_bound):
    """raw -> (xyz, scales, rotations(normalized), densities[C])."""
    scales = scale_activation(params.scaling, scale_bound)
    norm = jnp.linalg.norm(params.rotation, axis=-1, keepdims=True)
    rotations = params.rotation / jnp.maximum(norm, 1e-12)
    densities = softplus(params.density[:, 0])
    return params.xyz, scales, rotations, densities


# ---------------------------------------------------------------------------
# construction


def mean_sq_dist_knn3(points: np.ndarray, chunk: int = 4096) -> np.ndarray:
    """Mean squared distance to the 3 nearest neighbors (simple-knn
    distCUDA2 equivalent, used once at init: gaussian_model.py:145-150).

    Uses the native C++ grid-hash KNN (r2_gaussian_tpu/native) when
    available — O(N) vs this brute-force O(N^2) numpy fallback."""
    from ..native import knn3_mean_sq_dist

    native = knn3_mean_sq_dist(points)
    if native is not None:
        return native
    n = points.shape[0]
    out = np.empty(n, np.float32)
    sq = np.sum(points**2, axis=1)
    for i in range(0, n, chunk):
        blk = points[i : i + chunk]
        d2 = sq[i : i + chunk, None] + sq[None, :] - 2.0 * blk @ points.T
        d2[np.arange(blk.shape[0]), np.arange(i, i + blk.shape[0])] = np.inf
        np.maximum(d2, 0.0, out=d2)
        part = np.partition(d2, 3, axis=1)[:, :3]
        out[i : i + chunk] = part.mean(axis=1)
    return out


def next_capacity(n: int, cap_min: int = 16384) -> int:
    c = cap_min
    while c < n:
        c *= 2
    return c


def _morton_np(xyz: np.ndarray, lo=-1.0, hi=1.0) -> np.ndarray:
    """Host-side 30-bit Morton code (see pipeline/densify.morton_code)."""
    q = np.clip((xyz - lo) / (hi - lo), 0.0, 0.999999)
    q = (q * 1024).astype(np.int64)

    def part1by2(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return part1by2(q[:, 0]) | (part1by2(q[:, 1]) << 1) | (part1by2(q[:, 2]) << 2)


def create_from_pcd(
    xyz: np.ndarray,
    density: np.ndarray,
    scale_bound,
    capacity: int | None = None,
) -> tuple[GaussianParams, GaussianAux]:
    """Initialize from an [N,3] point cloud + [N] densities
    (gaussian_model.py:133-164): isotropic scales from sqrt(mean sq dist to
    3-NN) clamped to [0.001, scale_bound], identity quaternions,
    inverse-softplus densities."""
    n = xyz.shape[0]
    cap = capacity or next_capacity(n)
    xyz = np.asarray(xyz, np.float32)
    density = np.asarray(density, np.float32).reshape(-1)
    # Spatial (Morton) sort: the splat-block kernels rely on consecutive
    # gaussians being neighbors — an unsorted cloud makes every block's
    # bounding window span the whole image (~6x slower per step).
    order = np.argsort(_morton_np(xyz), kind="stable")
    xyz, density = xyz[order], density[order]
    dist = np.sqrt(np.maximum(mean_sq_dist_knn3(xyz.astype(np.float32)), 0.001**2))
    # Robustness: isolated FDK-noise samples have huge 3-NN distances; a
    # sigma~volume gaussian carries ~sigma^3 spurious mass, stays visible in
    # every view, and densifies without bound. Cap at a multiple of the
    # median neighbor distance.
    dist = np.minimum(dist, 8.0 * float(np.median(dist)))
    if scale_bound is not None:
        dist = np.clip(dist, scale_bound[0] + EPS, scale_bound[1] - EPS)
    scales_raw = np.asarray(
        scale_inverse_activation(jnp.asarray(dist, jnp.float32), scale_bound)
    )

    def pad(a, fill=0.0):
        out = np.full((cap,) + a.shape[1:], fill, np.float32)
        out[:n] = a
        return out

    density = density.reshape(n, 1)
    density_raw = np.asarray(inverse_softplus(jnp.asarray(density, jnp.float32)))
    rots = np.zeros((cap, 4), np.float32)
    rots[:, 0] = 1.0
    params = GaussianParams(
        xyz=jnp.asarray(pad(xyz.astype(np.float32))),
        scaling=jnp.asarray(pad(np.repeat(scales_raw[:, None], 3, axis=1))),
        rotation=jnp.asarray(rots),
        # raw density of inactive rows: very negative -> softplus ~ 0
        density=jnp.asarray(pad(density_raw, fill=-20.0)),
    )
    active = np.zeros(cap, bool)
    active[:n] = True
    aux = GaussianAux(
        active=jnp.asarray(active),
        max_radii2d=jnp.zeros(cap, jnp.float32),
        xyz_gradient_accum=jnp.zeros(cap, jnp.float32),
        denom=jnp.zeros(cap, jnp.float32),
    )
    return params, aux


# ---------------------------------------------------------------------------
# IO (reference-compatible pickle format)


def save_point_cloud(path: str, params: GaussianParams, aux: GaussianAux, scale_bound):
    """Write the reference's point_cloud.pickle format
    (gaussian_model.py:263-281): raw arrays for live gaussians only."""
    os.makedirs(osp.dirname(path), exist_ok=True)
    mask = np.asarray(aux.active)
    out = {
        "xyz": np.asarray(params.xyz)[mask],
        "density": np.asarray(params.density)[mask],
        "scale": np.asarray(params.scaling)[mask],
        "rotation": np.asarray(params.rotation)[mask],
        "scale_bound": None if scale_bound is None else np.asarray(scale_bound),
    }
    with open(path, "wb") as f:
        pickle.dump(out, f, pickle.HIGHEST_PROTOCOL)


def load_point_cloud(path: str, capacity: int | None = None):
    """Load a reference-format point_cloud.pickle -> (params, aux, scale_bound)."""
    with open(path, "rb") as f:
        data = pickle.load(f)
    n = data["xyz"].shape[0]
    cap = capacity or next_capacity(n)

    def pad(a, fill=0.0):
        a = np.asarray(a, np.float32)
        out = np.full((cap,) + a.shape[1:], fill, np.float32)
        out[:n] = a
        return out

    rots = pad(data["rotation"])
    rots[n:, 0] = 1.0
    params = GaussianParams(
        xyz=jnp.asarray(pad(data["xyz"])),
        scaling=jnp.asarray(pad(data["scale"])),
        rotation=jnp.asarray(rots),
        density=jnp.asarray(pad(data["density"], fill=-20.0)),
    )
    active = np.zeros(cap, bool)
    active[:n] = True
    aux = GaussianAux(
        active=jnp.asarray(active),
        max_radii2d=jnp.zeros(cap, jnp.float32),
        xyz_gradient_accum=jnp.zeros(cap, jnp.float32),
        denom=jnp.zeros(cap, jnp.float32),
    )
    sb = data.get("scale_bound")
    return params, aux, (None if sb is None else np.asarray(sb))
