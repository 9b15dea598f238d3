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


def test_export_ellipsoids_ply(tmp_path):
    import numpy as np

    from r2_gaussian_tpu.utils.plot_utils import export_ellipsoids_ply

    rng = np.random.default_rng(0)
    n = 64
    q = rng.standard_normal((n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    path = str(tmp_path / "g.ply")
    nv, nf = export_ellipsoids_ply(
        path, rng.uniform(-1, 1, (n, 3)), rng.uniform(0.01, 0.05, (n, 3)), q,
        rng.uniform(0.1, 1, n), active=np.ones(n, bool), subdiv=0)
    data = open(path, "rb").read()
    head = data[:400].decode("ascii", "ignore")
    assert f"element vertex {nv}" in head and f"element face {nf}" in head
    # binary payload size: 15 B/vertex (3 f32 + 3 u8), 13 B/face (u8 + 3 i32)
    assert len(data) == head.index("end_header\n") + len("end_header\n") \
        + nv * 15 + nf * 13


def test_debug_snapshot_on_nonfinite(tmp_path, tiny_trainer=None):
    """--debug dumps the first bad dispatch's inputs on a non-finite loss
    and training continues (the trainer rejects non-finite updates, so the
    state stays clean — dump-and-continue, not dump-and-abort)."""
    import numpy as np

    from r2_gaussian_tpu.dataset.geometry import build_cameras
    from r2_gaussian_tpu.models.gaussians import create_from_pcd
    from r2_gaussian_tpu.pipeline.trainer import Trainer
    import types

    scanner = dict(
        nVoxel=[32, 32, 32], sVoxel=[2.0, 2.0, 2.0], nDetector=[32, 32],
        sDetector=[4.0, 4.0], DSD=7.0, DSO=5.0, offOrigin=[0.0, 0.0, 0.0],
        offDetector=[0.0, 0.0], mode="cone", dVoxel=[2.0 / 32] * 3,
        dDetector=[4.0 / 32] * 2, accuracy=0.5, totalAngle=360.0,
        startAngle=0.0,
    )
    projs = np.full((2, 32, 32), np.nan, np.float32)  # poisoned measurements
    cams = build_cameras(np.asarray([0.0, 1.0]), projs, ["0", "1"], scanner)
    rng = np.random.default_rng(0)
    params, aux = create_from_pcd(
        rng.uniform(-0.5, 0.5, (100, 3)).astype(np.float32),
        rng.uniform(0.1, 1.0, 100).astype(np.float32), (0.001, 1.0),
        capacity=128)
    opt = types.SimpleNamespace(
        iterations=100, position_lr_init=2e-4, position_lr_final=2e-5,
        position_lr_max_steps=100, density_lr_init=1e-2, density_lr_final=1e-3,
        density_lr_max_steps=100, scaling_lr_init=5e-3, scaling_lr_final=5e-4,
        scaling_lr_max_steps=100, rotation_lr_init=1e-3,
        rotation_lr_final=1e-4, rotation_lr_max_steps=100, lambda_dssim=0.25,
        lambda_tv=0.0, tv_vol_size=8, density_min_threshold=1e-5,
        densification_interval=50, densify_from_iter=10, densify_until_iter=0,
        densify_grad_threshold=5e-5, densify_scale_threshold=0.1,
        max_screen_size=None, max_scale=None, max_num_gaussians=128,
    )
    tr = Trainer(cams, scanner, opt, (0.001, 1.0), params, aux,
                 backend="dense", debug_dir=str(tmp_path))
    tr.run_chunk(2)
    snap = np.load(tmp_path / "snapshot_fw.npz")
    assert snap["xyz"].shape == (128, 3)
    assert np.isfinite(snap["xyz"]).all()  # pre-dispatch state, not the NaNs
    assert snap["views"].shape == (2,)
    mtime = (tmp_path / "snapshot_fw.npz").stat().st_mtime_ns
    tr.run_chunk(2)  # still non-finite; must not crash or re-dump
    assert (tmp_path / "snapshot_fw.npz").stat().st_mtime_ns == mtime


def test_render_views_matches_per_view():
    """The chunked multi-view eval dispatch (models/render.py:render_views)
    must reproduce per-view render() exactly, including the padded last
    chunk (7 views, chunk=3 -> pad 2)."""
    import jax.numpy as jnp

    from r2_gaussian_tpu.dataset.geometry import build_cameras
    from r2_gaussian_tpu.models.render import render, render_views

    det = 24
    scanner = {
        "mode": "cone", "DSD": 7.0, "DSO": 5.0,
        "nDetector": [det, det], "sDetector": [4.0, 4.0],
        "nVoxel": [24] * 3, "sVoxel": [2.0] * 3,
        "dVoxel": [2.0 / 24] * 3,
        "offOrigin": [0.0, 0.0, 0.0], "offDetector": [0.0, 0.0],
    }
    n_views = 7
    angles = np.linspace(0, 2 * np.pi, n_views + 1)[:-1]
    cams = build_cameras(angles, np.zeros((n_views, det, det), np.float32),
                         [str(i) for i in range(n_views)], scanner)
    rng = np.random.default_rng(2)
    n = 128
    xyz = jnp.asarray(rng.uniform(-0.6, 0.6, (n, 3)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.02, 0.08, (n, 3)).astype(np.float32))
    rots = rng.standard_normal((n, 4)).astype(np.float32)
    rots = jnp.asarray(rots / np.linalg.norm(rots, axis=1, keepdims=True))
    dens = jnp.asarray(rng.uniform(0.1, 1.0, n).astype(np.float32))
    active = jnp.asarray(rng.random(n) < 0.8)

    batched = render_views(xyz, scales, rots, dens, cams, active=active,
                           backend="dense", chunk=3)
    assert batched.shape == (n_views, det, det)
    for i in range(n_views):
        ref = np.asarray(render(
            xyz, scales, rots, dens,
            w2c=jnp.asarray(cams.w2c[i]), full_proj=jnp.asarray(cams.full_proj[i]),
            width=det, height=det, tanfovx=cams.tanfovx, tanfovy=cams.tanfovy,
            mode=cams.mode, active=active, backend="dense",
        )["render"])
        # scan-vs-standalone XLA fusion differences are ~1e-7 absolute
        np.testing.assert_allclose(batched[i], ref, rtol=1e-5, atol=5e-7)


def test_render_views_compacts_active_rows():
    """render_views gathers the active rows out of a capacity-padded state
    before dispatching (capacity 16384, 120 live rows -> one 8192 gather)
    and must still reproduce per-view render() on the full padded state."""
    import jax.numpy as jnp

    from r2_gaussian_tpu.dataset.geometry import build_cameras
    from r2_gaussian_tpu.models.render import render, render_views

    det = 16
    scanner = {
        "mode": "cone", "DSD": 7.0, "DSO": 5.0,
        "nDetector": [det, det], "sDetector": [4.0, 4.0],
        "nVoxel": [16] * 3, "sVoxel": [2.0] * 3,
        "dVoxel": [2.0 / 16] * 3,
        "offOrigin": [0.0, 0.0, 0.0], "offDetector": [0.0, 0.0],
    }
    n_views = 3
    angles = np.linspace(0, 2 * np.pi, n_views + 1)[:-1]
    cams = build_cameras(angles, np.zeros((n_views, det, det), np.float32),
                         [str(i) for i in range(n_views)], scanner)
    rng = np.random.default_rng(7)
    cap = 16384
    xyz = jnp.asarray(rng.uniform(-0.6, 0.6, (cap, 3)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.02, 0.08, (cap, 3)).astype(np.float32))
    rots = rng.standard_normal((cap, 4)).astype(np.float32)
    rots = jnp.asarray(rots / np.linalg.norm(rots, axis=1, keepdims=True))
    dens = jnp.asarray(rng.uniform(0.1, 1.0, cap).astype(np.float32))
    mask = np.zeros(cap, bool)
    mask[rng.choice(cap, 120, replace=False)] = True
    active = jnp.asarray(mask)

    batched = render_views(xyz, scales, rots, dens, cams, active=active,
                           backend="dense", chunk=2)
    assert batched.shape == (n_views, det, det)
    for i in range(n_views):
        ref = np.asarray(render(
            xyz, scales, rots, dens,
            w2c=jnp.asarray(cams.w2c[i]), full_proj=jnp.asarray(cams.full_proj[i]),
            width=det, height=det, tanfovx=cams.tanfovx, tanfovy=cams.tanfovy,
            mode=cams.mode, active=active, backend="dense",
        )["render"])
        np.testing.assert_allclose(batched[i], ref, rtol=1e-5, atol=5e-7)
