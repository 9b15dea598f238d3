"""Evaluation metrics, matching the reference's quirks exactly
(r2_gaussian/utils/image_utils.py):

- metric_vol psnr: whole-volume MSE against pixel_max=1.0 (:99-104)
- metric_vol ssim: mean per-slice SSIM along each of the 3 axes, skipping
  slices whose GT max is 0, then mean of the 3 axis means (:105-132)
- metric_proj: per-projection PSNR/SSIM after normalizing BOTH slices by
  the GT slice max; slices with empty GT count 0 and are excluded from the
  denominator (:136-183)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .losses import ssim


def psnr(pred, target, pixel_max: float = 1.0):
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(pixel_max**2 / mse)


@jax.jit
def _ssim_slices(gt_stack, pred_stack):
    """[S,H,W] stacks -> per-slice ssim + nonempty mask."""
    vals = jax.vmap(ssim)(gt_stack, pred_stack)
    nonempty = jnp.max(gt_stack, axis=(1, 2)) > 0
    return jnp.where(nonempty, vals, 0.0), nonempty


def metric_vol_psnr(vol_gt, vol_pred, pixel_max: float = 1.0) -> float:
    return float(psnr(jnp.asarray(vol_pred), jnp.asarray(vol_gt), pixel_max))


def metric_vol_psnr_masked(vol_gt, vol_pred, thresh: float = 0.05,
                           dilate: int = 2, pixel_max: float = 1.0):
    """PSNR restricted to the (dilated) GT object support.

    The reference's psnr() accepts an ROI mask (image_utils.py:60-87); this
    builds the canonical one: voxels where GT > thresh, morphologically
    dilated so the object boundary (where most reconstruction error lives)
    stays inside the ROI. Purpose: when the "GT" is itself a pseudo-GT
    (e.g. an FDK reconstruction from all raw views, generate_real.py —
    real_dataset protocol), the whole-volume PSNR is floored by background
    streak/noise texture a gaussian model rightly does not reproduce;
    masking to the object separates model error from that floor.
    Returns (psnr_masked, mask_fraction)."""
    from scipy.ndimage import binary_dilation

    gt = np.asarray(vol_gt)
    pred = np.asarray(vol_pred)
    mask = gt > thresh
    if dilate > 0:
        mask = binary_dilation(mask, iterations=dilate)
    frac = float(mask.mean())
    if not mask.any():
        return float("nan"), 0.0
    mse = float(np.mean((pred[mask] - gt[mask]) ** 2))
    return float(10.0 * np.log10(pixel_max**2 / mse)), frac


def metric_vol_ssim(vol_gt, vol_pred, slice_chunk: int = 64):
    """3D SSIM: mean over slices along each axis (skip empty), then mean of
    the 3 axis values. Returns (mean, [axis0, axis1, axis2])."""
    vol_gt = jnp.asarray(vol_gt)
    vol_pred = jnp.asarray(vol_pred)
    axis_means = []
    for axis in range(3):
        gt = jnp.moveaxis(vol_gt, axis, 0)
        pr = jnp.moveaxis(vol_pred, axis, 0)
        vals, mask = [], []
        for i in range(0, gt.shape[0], slice_chunk):
            v, m = _ssim_slices(gt[i : i + slice_chunk], pr[i : i + slice_chunk])
            vals.append(v)
            mask.append(m)
        vals = jnp.concatenate(vals)
        mask = jnp.concatenate(mask)
        axis_means.append(float(jnp.sum(vals) / jnp.sum(mask)))
    return float(np.mean(axis_means)), axis_means


def metric_proj(gt_images, pred_images):
    """[V,H,W] stacks -> dict(psnr, ssim, per-view lists).

    Each projection is normalized by its own GT max before scoring
    (reference image_utils.py:160-183; note the reference normalizes each
    slice by its own max — GT by GT's, prediction by prediction's)."""
    gt_images = jnp.asarray(gt_images)
    pred_images = jnp.asarray(pred_images)
    psnrs, ssims, oks = [], [], []
    for i in range(gt_images.shape[0]):
        g, p = gt_images[i], pred_images[i]
        gmax, pmax = jnp.max(g), jnp.max(p)
        ok = gmax > 0
        gn = g / jnp.where(ok, gmax, 1.0)
        pn = p / jnp.where(pmax > 0, pmax, 1.0)
        psnrs.append(float(jnp.where(ok, psnr(pn, gn, 1.0), 0.0)))
        ssims.append(float(jnp.where(ok, ssim(gn, pn), 0.0)))
        oks.append(bool(ok))
    cnt = max(sum(oks), 1)
    return {
        "psnr_2d": float(np.sum(psnrs) / cnt),
        "ssim_2d": float(np.sum(ssims) / cnt),
        "psnr_2d_projs": psnrs,
        "ssim_2d_projs": ssims,
    }
