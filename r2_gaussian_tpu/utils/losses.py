"""Training losses: L1, D-SSIM, 3D total variation.

SSIM matches the reference exactly (utils/loss_utils.py:45-104): 11x11
Gaussian window sigma=1.5, zero ('same') padding, C1=0.01^2, C2=0.03^2.
The window is separable so we use two 1D depthwise convolutions.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def tv_3d_loss(vol, reduction: str = "mean"):
    """Total variation over a 3D volume (reference loss_utils.py:19-34)."""
    dx = jnp.abs(jnp.diff(vol, axis=0))
    dy = jnp.abs(jnp.diff(vol, axis=1))
    dz = jnp.abs(jnp.diff(vol, axis=2))
    tv = jnp.sum(dx) + jnp.sum(dy) + jnp.sum(dz)
    if reduction == "mean":
        a, b, c = vol.shape
        total = (a - 1) * b * c + a * (b - 1) * c + a * b * (c - 1)
        tv = tv / total
    return tv


@functools.lru_cache(maxsize=None)
def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _banded_blur_matrix(n: int, window_size: int, sigma: float) -> np.ndarray:
    """[n, n] banded matrix B with B[i, j] = w[j - i + r]: B @ x is the 1D
    'same' zero-padded gaussian blur along the leading axis."""
    w = _gaussian_window(window_size, sigma)
    r = window_size // 2
    b = np.zeros((n, n), np.float32)
    for k in range(window_size):
        d = k - r
        idx = np.arange(max(0, -d), min(n, n - d))
        b[idx, idx + d] = w[k]
    return b


def _filter2d_same(img, window_size=11, sigma=1.5):
    """'same' (zero-padded) separable gaussian blur of [H,W], computed as a
    banded-matrix sandwich Bh @ img @ Bw^T. Single-channel
    conv_general_dilated can't use the MXU (channels=1) and costs ~ms per
    call on TPU; two f32 matmuls with constant banded operands cost ~us."""
    h, w_ = img.shape
    bh = jnp.asarray(_banded_blur_matrix(h, window_size, sigma))
    bw = jnp.asarray(_banded_blur_matrix(w_, window_size, sigma))
    x = lax.dot(bh, img, precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    return lax.dot_general(
        x, bw, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    )


def ssim(img1, img2, window_size: int = 11):
    """Mean SSIM of two [H,W] (or [...,H,W] reshaped to 2D) images."""
    img1 = img1.reshape(img1.shape[-2], img1.shape[-1])
    img2 = img2.reshape(img2.shape[-2], img2.shape[-1])
    blur = lambda x: _filter2d_same(x, window_size)
    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = blur(img1 * img1) - mu1_sq
    sigma2_sq = blur(img2 * img2) - mu2_sq
    sigma12 = blur(img1 * img2) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)
