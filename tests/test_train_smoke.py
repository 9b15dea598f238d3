"""End-to-end smoke test: generate a tiny synthetic scene with the JAX
projector, train a few hundred iterations with the dense backend, verify the
loss decreases and 3D reconstruction PSNR improves over the initialization."""

import types

import numpy as np
import jax.numpy as jnp
import pytest

from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import activate, create_from_pcd
from r2_gaussian_tpu.models.render import query
from r2_gaussian_tpu.ops.phantom import gaussian_blobs
from r2_gaussian_tpu.ops.projector import project
from r2_gaussian_tpu.pipeline.trainer import Trainer
from r2_gaussian_tpu.utils.metrics import metric_vol_psnr


def small_opt_cfg(iterations=300):
    return types.SimpleNamespace(
        iterations=iterations,
        position_lr_init=0.0002, position_lr_final=0.00002, position_lr_max_steps=iterations,
        density_lr_init=0.01, density_lr_final=0.001, density_lr_max_steps=iterations,
        scaling_lr_init=0.005, scaling_lr_final=0.0005, scaling_lr_max_steps=iterations,
        rotation_lr_init=0.001, rotation_lr_final=0.0001, rotation_lr_max_steps=iterations,
        lambda_dssim=0.25, lambda_tv=0.05, tv_vol_size=8,
        density_min_threshold=1e-5,
        densification_interval=100, densify_from_iter=99, densify_until_iter=250,
        densify_grad_threshold=5e-5, densify_scale_threshold=0.1,
        max_screen_size=None, max_scale=None, max_num_gaussians=2000,
    )


@pytest.fixture(scope="module")
def tiny_scene():
    vol = gaussian_blobs(24, n_blobs=4, seed=3)
    scanner = {
        "mode": "parallel", "DSD": 7.0, "DSO": 5.0,
        "nDetector": [24, 24], "sDetector": [2.0, 2.0],
        "nVoxel": [24, 24, 24], "sVoxel": [2.0, 2.0, 2.0],
        "dVoxel": [2.0 / 24] * 3,
        "offOrigin": [0.0, 0.0, 0.0], "offDetector": [0.0, 0.0],
        "accuracy": 0.5, "totalAngle": 360.0, "startAngle": 0.0,
    }
    angles = np.linspace(0, 2 * np.pi, 9)[:-1]
    projs = project(vol, angles, scanner)
    cams = build_cameras(angles, projs, [f"{i}" for i in range(8)], scanner)
    return vol, scanner, cams


def init_from_volume(vol, scanner, n_points=400, seed=0, scale_bound=None):
    rng = np.random.default_rng(seed)
    idx = np.argwhere(vol > 0.05)
    pick = idx[rng.choice(len(idx), n_points, replace=False)]
    d_vox = np.asarray(scanner["sVoxel"]) / np.asarray(scanner["nVoxel"])
    pos = pick * d_vox - np.asarray(scanner["sVoxel"]) / 2 + np.asarray(scanner["offOrigin"])
    dens = vol[pick[:, 0], pick[:, 1], pick[:, 2]] * 0.15
    return create_from_pcd(pos.astype(np.float32), dens, scale_bound, capacity=1024)


def vol_psnr(trainer, scanner, vol_gt, scale_bound):
    xyz, scales, rots, dens = activate(trainer.state.params, scale_bound)
    out = query(
        xyz, scales, rots, dens,
        center=scanner["offOrigin"], n_voxel=tuple(scanner["nVoxel"]),
        s_voxel=scanner["sVoxel"], active=trainer.state.aux.active, backend="dense",
    )
    return metric_vol_psnr(vol_gt, np.asarray(out["vol"]))


def test_training_improves_psnr(tiny_scene):
    vol, scanner, cams = tiny_scene
    scale_bound = (0.0005 * 2.0, 0.5 * 2.0)
    params, aux = init_from_volume(vol, scanner, scale_bound=scale_bound)
    opt = small_opt_cfg()
    trainer = Trainer(cams, scanner, opt, scale_bound, params, aux, backend="dense")

    psnr0 = vol_psnr(trainer, scanner, vol, scale_bound)
    first_losses = None
    for chunk in range(3):
        metrics, n_active = trainer.run_chunk(100)
        metrics = np.asarray(metrics)
        if first_losses is None:
            first_losses = metrics[:10, 0].mean()
    last_losses = metrics[-10:, 0].mean()
    psnr1 = vol_psnr(trainer, scanner, vol, scale_bound)

    assert np.all(np.isfinite(metrics))
    assert last_losses < first_losses * 0.9, (first_losses, last_losses)
    assert psnr1 > psnr0 + 1.0, (psnr0, psnr1)
    assert trainer.iteration == 300
    # densification ran (iteration 100 and 200 qualify: >99, <250)
    assert n_active is None or n_active > 0


def test_nonfinite_loss_rejects_update(tiny_scene):
    """A non-finite loss must not poison the state: the step is rejected
    (params, Adam moments, densify stats all carried through unchanged).
    Every projection is NaN here, so every step's loss is non-finite and
    the parameters must come out bit-identical to the initialization."""
    import jax

    vol, scanner, cams = tiny_scene
    bad_projs = np.full_like(np.asarray(cams.images), np.nan)
    angles = np.linspace(0, 2 * np.pi, 9)[:-1]
    bad_cams = build_cameras(angles, bad_projs,
                             [f"{i}" for i in range(8)], scanner)
    params, aux = init_from_volume(vol, scanner)
    trainer = Trainer(bad_cams, scanner, small_opt_cfg(), None, params, aux,
                      backend="dense")
    p0 = jax.tree.map(np.asarray, trainer.state.params)
    metrics, _ = trainer.run_chunk(6)
    assert not np.isfinite(metrics[:, 0]).any()  # losses were non-finite
    p1 = jax.tree.map(np.asarray, trainer.state.params)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(a, b)
