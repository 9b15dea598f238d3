"""evaluate() must write gt/render/diff image panels and a density
histogram to TensorBoard at test iterations (reference train.py:241-361),
in addition to the scalar metrics and yml reports."""

import os.path as osp
import types

import numpy as np
import pytest

from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.ops.phantom import gaussian_blobs
from r2_gaussian_tpu.ops.projector import project
from r2_gaussian_tpu.pipeline.trainer import Trainer

from test_train_smoke import init_from_volume, small_opt_cfg

tbx = pytest.importorskip("tensorboardX")


def test_eval_writes_panels_and_histogram(tmp_path):
    import train as train_cli

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

    scale_bound = (0.0005 * 2.0, 0.5 * 2.0)
    params, aux = init_from_volume(vol, scanner, scale_bound=scale_bound)
    trainer = Trainer(cams, scanner, small_opt_cfg(), scale_bound, params, aux,
                      backend="dense")
    scene = types.SimpleNamespace(
        model_path=str(tmp_path), scanner_cfg=scanner, vol_gt=vol,
        train_cameras=cams, test_cameras=None,
    )
    writer = tbx.SummaryWriter(str(tmp_path))
    train_cli.evaluate(trainer, scene, iteration=5, tb_writer=writer,
                       backend="dense")
    writer.close()

    from tensorboardX.event_file_writer import EventFileWriter  # noqa: F401
    from tensorboard.backend.event_processing import event_accumulator

    acc = event_accumulator.EventAccumulator(str(tmp_path))
    acc.Reload()
    images = set(acc.Tags().get("images", []))
    hists = set(acc.Tags().get("histograms", []))
    assert any(t.startswith("render_train/gt_render_diff") for t in images), images
    assert any(
        t.startswith("reconstruction/slice-gt_pred_diff") for t in images
    ), images
    assert "scene/density_histogram" in hists, hists
    assert osp.exists(osp.join(str(tmp_path), "eval", "iter_000005",
                               "eval2d_render_train.yml"))
    assert osp.exists(osp.join(str(tmp_path), "eval", "iter_000005",
                               "eval3d.yml"))
