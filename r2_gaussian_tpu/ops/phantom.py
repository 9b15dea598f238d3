"""3D phantoms for synthetic data generation and tests."""

from __future__ import annotations

import numpy as np

# Standard 3D Shepp-Logan (Kak & Slaney variant, positive densities for CT):
# (value, x0, y0, z0, a, b, c, phi_deg) — phi rotates about z.
_SHEPP_LOGAN = [
    (1.0, 0, 0, 0, 0.69, 0.92, 0.81, 0),
    (-0.8, 0, -0.0184, 0, 0.6624, 0.874, 0.78, 0),
    (-0.2, 0.22, 0, 0, 0.11, 0.31, 0.22, -18),
    (-0.2, -0.22, 0, 0, 0.16, 0.41, 0.28, 18),
    (0.1, 0, 0.35, -0.15, 0.21, 0.25, 0.41, 0),
    (0.1, 0, 0.1, 0.25, 0.046, 0.046, 0.05, 0),
    (0.1, 0, -0.1, 0.25, 0.046, 0.046, 0.05, 0),
    (0.1, -0.08, -0.605, 0, 0.046, 0.023, 0.05, 0),
    (0.1, 0, -0.606, 0, 0.023, 0.023, 0.02, 0),
    (0.1, 0.06, -0.605, 0, 0.023, 0.046, 0.02, 0),
]


def shepp_logan_3d(n: int = 128, dtype=np.float32) -> np.ndarray:
    """[n,n,n] Shepp-Logan phantom in [0, ~1], layout [x][y][z],
    voxel centers at (idx+0.5)/n*2 - 1."""
    coords = (np.arange(n) + 0.5) / n * 2 - 1
    x, y, z = np.meshgrid(coords, coords, coords, indexing="ij")
    vol = np.zeros((n, n, n), np.float64)
    for val, x0, y0, z0, a, b, c, phi in _SHEPP_LOGAN:
        p = np.deg2rad(phi)
        xr = (x - x0) * np.cos(p) + (y - y0) * np.sin(p)
        yr = -(x - x0) * np.sin(p) + (y - y0) * np.cos(p)
        zr = z - z0
        vol += val * ((xr / a) ** 2 + (yr / b) ** 2 + (zr / c) ** 2 <= 1.0)
    return np.clip(vol, 0, None).astype(dtype)


def gaussian_blobs(n: int = 64, n_blobs: int = 6, seed: int = 0, dtype=np.float32):
    """Smooth random blob phantom (useful for fast convergence tests)."""
    rng = np.random.default_rng(seed)
    coords = (np.arange(n) + 0.5) / n * 2 - 1
    x, y, z = np.meshgrid(coords, coords, coords, indexing="ij")
    vol = np.zeros((n, n, n), np.float64)
    for _ in range(n_blobs):
        c = rng.uniform(-0.5, 0.5, 3)
        s = rng.uniform(0.08, 0.25, 3)
        amp = rng.uniform(0.3, 1.0)
        vol += amp * np.exp(
            -0.5 * (((x - c[0]) / s[0]) ** 2 + ((y - c[1]) / s[1]) ** 2 + ((z - c[2]) / s[2]) ** 2)
        )
    vol /= max(vol.max(), 1e-9)
    return vol.astype(dtype)
