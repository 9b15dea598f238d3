"""Losses/metrics vs independent oracles (torch CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from r2_gaussian_tpu.utils.losses import l1_loss, ssim, tv_3d_loss
from r2_gaussian_tpu.utils.metrics import metric_proj, metric_vol_psnr, metric_vol_ssim


def torch_ssim(img1, img2, window_size=11, sigma=1.5):
    """Independent SSIM oracle: 2D gaussian window, zero-padded depthwise
    conv, C1=0.01^2 C2=0.03^2 (the standard formulation)."""
    import torch
    import torch.nn.functional as F

    xs = torch.arange(window_size, dtype=torch.float64)
    g = torch.exp(-((xs - window_size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    win = (g[:, None] @ g[None, :])[None, None]
    a = torch.from_numpy(np.asarray(img1, np.float64))[None, None]
    b = torch.from_numpy(np.asarray(img2, np.float64))[None, None]
    pad = window_size // 2
    mu1 = F.conv2d(a, win, padding=pad)
    mu2 = F.conv2d(b, win, padding=pad)
    s11 = F.conv2d(a * a, win, padding=pad) - mu1**2
    s22 = F.conv2d(b * b, win, padding=pad) - mu2**2
    s12 = F.conv2d(a * b, win, padding=pad) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / ((mu1**2 + mu2**2 + c1) * (s11 + s22 + c2))
    return float(m.mean())


def test_ssim_matches_torch_oracle():
    rng = np.random.default_rng(0)
    a = rng.random((37, 45)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal((37, 45)), 0, 1).astype(np.float32)
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    want = torch_ssim(a, b)
    assert got == pytest.approx(want, abs=2e-5)
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(1.0, abs=1e-5)


def test_tv_3d():
    rng = np.random.default_rng(1)
    v = rng.random((5, 6, 7)).astype(np.float32)
    got = float(tv_3d_loss(jnp.asarray(v), reduction="mean"))
    dx = np.abs(np.diff(v, axis=0)).sum()
    dy = np.abs(np.diff(v, axis=1)).sum()
    dz = np.abs(np.diff(v, axis=2)).sum()
    total = 4 * 6 * 7 + 5 * 5 * 7 + 5 * 6 * 6
    assert got == pytest.approx((dx + dy + dz) / total, rel=1e-5)


def test_metric_vol():
    rng = np.random.default_rng(2)
    gt = rng.random((16, 16, 16)).astype(np.float32)
    pred = np.clip(gt + 0.01 * rng.standard_normal(gt.shape), 0, 1).astype(np.float32)
    p = metric_vol_psnr(gt, pred)
    mse = np.mean((gt - pred) ** 2)
    assert p == pytest.approx(10 * np.log10(1.0 / mse), rel=1e-4)
    s, per_axis = metric_vol_ssim(gt, pred)
    assert 0.5 < s <= 1.0 and len(per_axis) == 3


def test_metric_proj_normalizes_per_slice():
    rng = np.random.default_rng(3)
    gt = rng.random((3, 24, 24)).astype(np.float32)
    out = metric_proj(gt, gt * 2.0)  # scale-invariant due to per-slice max norm
    assert out["psnr_2d"] > 80
    assert out["ssim_2d"] == pytest.approx(1.0, abs=1e-4)
