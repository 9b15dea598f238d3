"""Classical iterative reconstruction algorithms (TIGRE-equivalent set:
sart / ossart / asd_pocs / os_asd_pocs / cgls) on a tiny phantom."""

import numpy as np
import pytest

from r2_gaussian_tpu.ops.classical import (
    RECON_ALGS,
    asd_pocs,
    cgls,
    os_asd_pocs,
    ossart,
    sart,
)
from r2_gaussian_tpu.ops.phantom import gaussian_blobs
from r2_gaussian_tpu.ops.projector import project
from r2_gaussian_tpu.utils.metrics import metric_vol_psnr

N = 24
N_DET = 32


@pytest.fixture(scope="module")
def problem():
    sc = {
        "mode": "cone", "DSD": 7.0, "DSO": 5.0,
        "nDetector": [N_DET, N_DET], "sDetector": [4.0, 4.0],
        "nVoxel": [N, N, N], "sVoxel": [2.0, 2.0, 2.0],
        "offOrigin": [0.0, 0.0, 0.0], "offDetector": [0.0, 0.0],
        "accuracy": 0.5,
    }
    vol = gaussian_blobs(N, n_blobs=3, seed=1)
    angles = np.linspace(0, 2 * np.pi, 31)[:-1]
    projs = np.asarray(project(vol, angles, sc))
    return sc, vol, angles, projs


def test_registry_has_full_reference_set():
    # reference ct_utils.py:60-175 dispatches exactly these methods
    assert set(RECON_ALGS) == {
        "fdk", "sart", "ossart", "asd_pocs", "os_asd_pocs", "cgls"
    }


def test_ossart_converges_and_beats_one_sart_sweep(problem):
    sc, vol, angles, projs = problem
    rec_os = np.asarray(ossart(projs, angles, sc, n_iter=2, blocksize=10))
    psnr_os = metric_vol_psnr(vol, np.clip(rec_os, 0, None))
    assert psnr_os > 18.0, psnr_os
    # ordered subsets apply more (smaller) updates per sweep than the
    # simultaneous variant -> faster early convergence
    rec_sart = np.asarray(sart(projs, angles, sc, n_iter=2))
    psnr_sart = metric_vol_psnr(vol, np.clip(rec_sart, 0, None))
    assert psnr_os > psnr_sart, (psnr_os, psnr_sart)


def test_sart_warm_start(problem):
    sc, vol, angles, projs = problem
    a = np.asarray(sart(projs, angles, sc, n_iter=2))
    # second call continues with the decayed relaxation (lmbda_red applied
    # once after the first sweep)
    b = np.asarray(sart(projs, angles, sc, n_iter=1, lmbda=1.0 * 0.999,
                        vol0=sart(projs, angles, sc, n_iter=1)))
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6)


def test_asd_pocs_reconstructs_and_denoises(problem):
    sc, vol, angles, projs = problem
    rng = np.random.default_rng(0)
    noisy = projs + rng.normal(0, 0.02, projs.shape).astype(np.float32)
    rec = np.asarray(asd_pocs(noisy, angles, sc, n_iter=3, tviter=10))
    psnr = metric_vol_psnr(vol, np.clip(rec, 0, None))
    assert psnr > 18.0, psnr
    # the TV step must actually regularize: beat the same budget of pure SART
    rec_sart = np.asarray(sart(noisy, angles, sc, n_iter=3))
    tv = lambda v: np.abs(np.diff(v, axis=0)).mean()  # noqa: E731
    assert tv(rec) < tv(rec_sart), (tv(rec), tv(rec_sart))


def test_os_asd_pocs_runs(problem):
    sc, vol, angles, projs = problem
    rec = np.asarray(
        os_asd_pocs(projs, angles, sc, n_iter=2, tviter=5, blocksize=10)
    )
    psnr = metric_vol_psnr(vol, np.clip(rec, 0, None))
    assert psnr > 17.0, psnr


def test_cgls_still_converges(problem):
    sc, vol, angles, projs = problem
    rec = np.asarray(cgls(projs, angles, sc, n_iter=8))
    psnr = metric_vol_psnr(vol, np.clip(rec, 0, None))
    assert psnr > 18.0, psnr
