"""FDK reconstruction sanity: project a phantom, reconstruct, compare."""

import numpy as np
import pytest

from r2_gaussian_tpu.ops.fdk import fdk
from r2_gaussian_tpu.ops.phantom import gaussian_blobs
from r2_gaussian_tpu.ops.projector import project
from r2_gaussian_tpu.utils.metrics import metric_vol_psnr


def scanner(mode, n=32, n_det=48):
    return {
        "mode": mode, "DSD": 7.0, "DSO": 5.0,
        "nDetector": [n_det, n_det],
        "sDetector": [2.0, 2.0] if mode == "parallel" else [4.0, 4.0],
        "nVoxel": [n, n, n], "sVoxel": [2.0, 2.0, 2.0],
        "offOrigin": [0.0, 0.0, 0.0], "offDetector": [0.0, 0.0],
        "accuracy": 0.5,
    }


@pytest.mark.parametrize("mode", ["parallel", "cone"])
def test_fdk_reconstructs_phantom(mode):
    sc = scanner(mode)
    vol = gaussian_blobs(32, n_blobs=3, seed=1)
    angles = np.linspace(0, 2 * np.pi, 61)[:-1]
    projs = project(vol, angles, sc)
    rec = np.asarray(fdk(projs, angles, sc))
    assert rec.shape == vol.shape
    # scale sanity: FDK should be approximately calibrated (not off by 2x)
    dens_ratio = rec[vol > 0.3].mean() / vol[vol > 0.3].mean()
    assert 0.6 < dens_ratio < 1.6, dens_ratio
    psnr = metric_vol_psnr(vol, np.clip(rec, 0, None))
    assert psnr > 18.0, psnr


def test_fdk_view_chunk_equivalence():
    """Host-chunked backprojection (view_chunk, incl. a zero-padded short
    final chunk) must match the single-dispatch result to f32 re-association
    tolerance — guards the production many-view ingest path
    (data_generator/generate_real.py pseudo-GT FDK)."""
    sc = scanner("cone")
    vol = gaussian_blobs(32, n_blobs=3, seed=2)
    angles = np.linspace(0, 2 * np.pi, 26)[:-1]  # 25 views, chunk 10 -> 10/10/5
    projs = project(vol, angles, sc)
    whole = np.asarray(fdk(projs, angles, sc))
    chunked = np.asarray(fdk(projs, angles, sc, view_chunk=10))
    scale = max(abs(whole).max(), 1e-9)
    assert np.abs(whole - chunked).max() / scale < 1e-5
