"""JAX forward projector: line integrals of a voxel volume (TIGRE `Ax`
equivalent, reference utils/ct_utils.py + data_generator usage).

Rays are defined in exactly the convention of the gaussian rasterizer
(models/preprocess.py): pixel (row v, col u) maps to NDC via the inverse of
ndc2pix, and NDC maps to camera-frame directions via tan(fov/2) (cone) or
directly to camera-plane offsets (parallel). Data generated with this
projector is therefore self-consistent with the renderer — the same
geometry the reference achieves via TIGRE plus axis flips
(ct_utils.py:17-26, generate_data.py:52-54).

Volume layout [x][y][z]; voxel centers at (idx + 0.5)*dVoxel - sVoxel/2 +
offOrigin (matching the voxelizer, cuda_voxelizer/forward.cu:206).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..dataset.geometry import angle2pose


def _trilinear(vol, pts, off_origin, s_voxel, n_voxel):
    """Sample vol [nx,ny,nz] at world points [.., 3]; zero outside."""
    n_vox = jnp.asarray(n_voxel, jnp.float32)
    d_vox = jnp.asarray(s_voxel, jnp.float32) / n_vox
    idx = (pts - jnp.asarray(off_origin, jnp.float32) + jnp.asarray(s_voxel, jnp.float32) / 2) / d_vox - 0.5
    return jax.scipy.ndimage.map_coordinates(
        vol, [idx[..., 0], idx[..., 1], idx[..., 2]], order=1, mode="constant", cval=0.0
    )


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "mode", "n_samples", "tanfovx", "tanfovy", "dsd"),
)
def _project_one(
    vol,
    c2w,
    *,
    width,
    height,
    mode,
    tanfovx,
    tanfovy,
    dsd,
    off_origin,
    s_voxel,
    n_samples,
):
    ndc_x = (2 * jnp.arange(width, dtype=jnp.float32) + 1) / width - 1
    ndc_y = (2 * jnp.arange(height, dtype=jnp.float32) + 1) / height - 1
    gx, gy = jnp.meshgrid(ndc_x, ndc_y)  # [H,W]
    rot, cam = c2w[:3, :3], c2w[:3, 3]
    if mode == 0:  # parallel: rays along camera z through plane point (x,y)
        origin_cam = jnp.stack([gx, gy, jnp.zeros_like(gx)], -1)
        origins = origin_cam @ rot.T + cam
        dirs = jnp.broadcast_to(rot[:, 2], origins.shape)
    else:  # cone: rays from the source through the detector
        dir_cam = jnp.stack([gx * tanfovx, gy * tanfovy, jnp.ones_like(gx)], -1)
        dirs = dir_cam @ rot.T
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        origins = jnp.broadcast_to(cam, dirs.shape)

    # slab intersection with the volume AABB
    lo = jnp.asarray(off_origin, jnp.float32) - jnp.asarray(s_voxel, jnp.float32) / 2
    hi = jnp.asarray(off_origin, jnp.float32) + jnp.asarray(s_voxel, jnp.float32) / 2
    inv_d = 1.0 / jnp.where(jnp.abs(dirs) < 1e-9, 1e-9, dirs)
    t_lo = (lo - origins) * inv_d
    t_hi = (hi - origins) * inv_d
    t0 = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
    t1 = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
    seg = jnp.maximum(t1 - t0, 0.0)

    ts = (jnp.arange(n_samples, dtype=jnp.float32) + 0.5) / n_samples  # [S]
    n_vox = vol.shape

    def row(o_row, d_row, t0_row, seg_row):
        pts = o_row[:, None, :] + (t0_row[:, None] + ts[None, :] * seg_row[:, None])[
            ..., None
        ] * d_row[:, None, :]  # [W,S,3]
        vals = _trilinear(vol, pts, off_origin, s_voxel, n_vox)
        return jnp.sum(vals, axis=-1) * seg_row / n_samples

    return jax.lax.map(
        lambda args: row(*args), (origins, dirs, t0, seg)
    )  # [H,W]


def project(vol, angles, scanner_cfg, n_samples: int | None = None):
    """Project a volume at the given angles -> [V, H, W] (numpy).

    scanner_cfg must already be in scene-scaled units (as produced by the
    readers) or any self-consistent unit system.
    """
    mode = 0 if scanner_cfg["mode"] == "parallel" else 1
    height, width = int(scanner_cfg["nDetector"][0]), int(scanner_cfg["nDetector"][1])
    dsd = float(scanner_cfg["DSD"])
    s_det = scanner_cfg["sDetector"]
    if mode == 1:
        tanfovx = float(s_det[1] / 2 / dsd)
        tanfovy = float(s_det[0] / 2 / dsd)
    else:
        tanfovx = tanfovy = 1.0
    n_vox = np.asarray(scanner_cfg["nVoxel"])
    d_min = float(np.min(np.asarray(scanner_cfg["sVoxel"]) / n_vox))
    if n_samples is None:
        accuracy = float(scanner_cfg.get("accuracy", 0.5))
        max_path = float(np.linalg.norm(scanner_cfg["sVoxel"]))
        n_samples = int(np.ceil(max_path / (accuracy * d_min)))
    vol = jnp.asarray(vol, jnp.float32)
    out = []
    for a in np.asarray(angles, np.float64):
        c2w = jnp.asarray(angle2pose(scanner_cfg["DSO"], float(a)), jnp.float32)
        img = _project_one(
            vol,
            c2w,
            width=width,
            height=height,
            mode=mode,
            tanfovx=tanfovx,
            tanfovy=tanfovy,
            dsd=dsd,
            off_origin=jnp.asarray(scanner_cfg["offOrigin"], jnp.float32),
            s_voxel=jnp.asarray(scanner_cfg["sVoxel"], jnp.float32),
            n_samples=n_samples,
        )
        out.append(np.asarray(img))
    return np.stack(out)


def add_ct_noise(projs, poisson=1e4, gaussian=(0.0, 10.0), seed=0):
    """TIGRE-style CT noise: Poisson photon statistics + Gaussian electronic
    noise in the count domain (reference generate_data.py:56-62)."""
    rng = np.random.default_rng(seed)
    m = projs.max()
    photons = poisson * np.exp(-projs / m)
    noisy = rng.poisson(photons).astype(np.float64)
    noisy += rng.normal(gaussian[0], gaussian[1], size=projs.shape)
    noisy = np.maximum(noisy, 1.0)
    out = -np.log(noisy / poisson) * m
    return np.maximum(out, 0.0).astype(np.float32)
