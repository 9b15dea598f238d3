"""TPU-gated guard for the row-bucket hot path (trainer n_rows slicing) at
production shapes: 512^2 detector, 262144-row capacity, ~20k live rows so
the bucket (32768) really slices.

The CPU suite (tests/test_row_slice.py) proves the invariant under the
interpret-mode kernels, but the known hazard of this path is exactly the
class only real Mosaic lowering exhibits: a 32768- vs 262144-row dispatch
tiles its reductions differently, and a near-zero gradient whose SIGN flips
under the different tiling diverges by a full Adam step immediately
(ARCHITECTURE.md round-4 note). So this test asserts, on hardware:

  (a) with all learning rates at 0 (state frozen): the forward losses and
      the accumulated densify statistics (xyz_gradient_accum, max_radii2d,
      denom) of the sliced and full-capacity steps agree tightly — these
      are pure fwd+bwd functions of identical states;
  (b) with real learning rates across a densify event: loss trajectories
      agree to reduction-order tolerance and the discrete densify
      decisions (n_active, active mask) are identical.

Reference analog: the reference has no such path (CUDA rasterizer reads
exactly N gaussians per launch); the slicing is a TPU static-shape
adaptation, so this guard is about self-consistency, not parity.
"""

import types

import numpy as np
import jax.numpy as jnp

from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import create_from_pcd
from r2_gaussian_tpu.pipeline.trainer import Trainer

CAP = 262_144
N_LIVE = 20_000


def _opt(iterations=60, **kw):
    o = types.SimpleNamespace(
        iterations=iterations,
        position_lr_init=2e-4, position_lr_final=2e-5, position_lr_max_steps=iterations,
        density_lr_init=1e-2, density_lr_final=1e-3, density_lr_max_steps=iterations,
        scaling_lr_init=5e-3, scaling_lr_final=5e-4, scaling_lr_max_steps=iterations,
        rotation_lr_init=1e-3, rotation_lr_final=1e-4, rotation_lr_max_steps=iterations,
        lambda_dssim=0.25, lambda_tv=0.05, tv_vol_size=32,
        density_min_threshold=1e-5,
        densification_interval=10, densify_from_iter=5, densify_until_iter=50,
        densify_grad_threshold=5e-5, densify_scale_threshold=0.1,
        # budget-clamp growth below the 32768 bucket so the sliced trainer
        # keeps ONE static shape across the event (no mid-test recompile)
        max_screen_size=None, max_scale=None, max_num_gaussians=30_000,
    )
    for k, v in kw.items():
        setattr(o, k, v)
    return o


def _cams(n_views=5, det=512):
    scanner = dict(
        nVoxel=[256, 256, 256], sVoxel=[2.0, 2.0, 2.0],
        nDetector=[det, det], sDetector=[4.0, 4.0],
        DSD=7.0, DSO=5.0, offOrigin=[0.0, 0.0, 0.0],
        offDetector=[0.0, 0.0], mode="cone",
        dVoxel=[2.0 / 256] * 3, dDetector=[4.0 / det] * 2,
        accuracy=0.5, totalAngle=360.0, startAngle=0.0,
    )
    angles = np.linspace(0, 2 * np.pi, n_views + 1)[:-1]
    # synthetic but structured targets: a smooth radial bump per view, so
    # the L1/SSIM gradients carry real spatial signal (pure-zero targets
    # push only density and under-exercise the position/scale backward)
    yy, xx = np.meshgrid(np.linspace(-1, 1, det), np.linspace(-1, 1, det),
                         indexing="ij")
    base = np.exp(-3.0 * (xx ** 2 + yy ** 2)).astype(np.float32)
    projs = np.stack([base * (0.5 + 0.1 * i) for i in range(n_views)])
    return build_cameras(angles, projs, [str(i) for i in range(n_views)],
                         scanner), scanner


def _trainers(opt):
    cams, scanner = _cams()
    rng = np.random.default_rng(11)
    pos = rng.uniform(-0.6, 0.6, (N_LIVE, 3)).astype(np.float32)
    dens = rng.uniform(0.05, 0.5, N_LIVE).astype(np.float32)
    p1, a1 = create_from_pcd(pos, dens, None, capacity=CAP)
    p2, a2 = create_from_pcd(pos, dens, None, capacity=CAP)
    tr_sliced = Trainer(cams, scanner, opt, None, p1, a1, backend="pallas",
                        seed=0)
    assert tr_sliced._row_bucket() == 32768
    tr_full = Trainer(cams, scanner, opt, None, p2, a2, backend="pallas",
                      seed=0)
    tr_full._row_bucket = lambda: None
    return tr_sliced, tr_full


def test_sliced_stats_match_full_capacity_on_hardware():
    """(a): lr=0, no densify event — fwd losses and densify stats of the
    32768-row and 262144-row dispatches must agree on real Mosaic tilings."""
    opt = _opt(densify_from_iter=1000)
    for g in ("position", "density", "scaling", "rotation"):
        setattr(opt, f"{g}_lr_init", 0.0)
        setattr(opt, f"{g}_lr_final", 0.0)
    tr_sliced, tr_full = _trainers(opt)
    m1, _ = tr_sliced.run_chunk(10)
    m2, _ = tr_full.run_chunk(10)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                               rtol=1e-5, atol=1e-8)
    n = N_LIVE
    for f in ("xyz_gradient_accum", "max_radii2d", "denom"):
        a = np.asarray(getattr(tr_sliced.state.aux, f))[:n]
        b = np.asarray(getattr(tr_full.state.aux, f))[:n]
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-10, err_msg=f)
        # rows above the bucket carry no live state in either run
        tail = np.asarray(getattr(tr_sliced.state.aux, f))[n:]
        assert not tail.any(), f


def test_sliced_trajectory_matches_full_capacity_on_hardware():
    """(b): real LRs across a densify event at iter 10 — loss trajectories
    to reduction-order tolerance, discrete densify decisions identical."""
    tr_sliced, tr_full = _trainers(_opt())
    losses1, losses2 = [], []
    for _ in range(3):  # 3 chunks of 10, event after the first
        m1, _ = tr_sliced.run_chunk(10)
        m2, _ = tr_full.run_chunk(10)
        losses1.append(np.asarray(m1))
        losses2.append(np.asarray(m2))
    m1, m2 = np.concatenate(losses1), np.concatenate(losses2)
    np.testing.assert_allclose(m1, m2, rtol=2e-3, atol=1e-7)
    n1 = int(tr_sliced.state.aux.n_active)
    n2 = int(tr_full.state.aux.n_active)
    assert n1 == n2 and n1 > N_LIVE  # event fired, same decision
    np.testing.assert_array_equal(
        np.asarray(tr_sliced.state.aux.active),
        np.asarray(tr_full.state.aux.active))
