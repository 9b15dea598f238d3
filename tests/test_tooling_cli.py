"""Execution smokes for the batch/visualization tooling CLIs.

Each script gets at least one end-to-end subprocess run on tiny CPU shapes
(reference tooling equivalents: scripts/run_r2_gaussian.py -> train_all.py,
traditional method baselines, raw-CT preprocessing, matplotlib viz).
Shares one tiny generated case per module to keep the suite fast.
"""

import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))


def run_cli(args, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable] + args, cwd=ROOT, env=env, timeout=timeout,
        capture_output=True, text=True,
    )
    assert r.returncode == 0, (
        f"{args[0]} failed rc={r.returncode}\nstdout:\n{r.stdout[-3000:]}"
        f"\nstderr:\n{r.stderr[-3000:]}"
    )
    return r.stdout


@pytest.fixture(scope="module")
def tiny_case(tmp_path_factory):
    """One tiny synthetic case (16x16 detector, 16^3 volume, 4+2 views)."""
    root = tmp_path_factory.mktemp("tooling_data")
    case = root / "tiny_cone"
    scanner = osp.join(ROOT, "data_generator", "scanner", "cone_beam.yml")
    small = root / "scanner16.yml"
    with open(scanner) as f:
        txt = f.read().replace("[512, 512]", "[16, 16]")
    small.write_text(txt)
    run_cli([
        "data_generator/generate_synthetic.py", "--scanner", str(small),
        "--vol_size", "16", "--output", str(case),
        "--n_train", "4", "--n_test", "2",
    ])
    run_cli(["initialize_pcd.py", "--data", str(case), "--n_points", "100",
             "--density_thresh", "0.01"])
    return case


def test_run_traditional_methods(tiny_case, tmp_path):
    out = tmp_path / "trad"
    run_cli([
        "scripts/run_traditional_methods.py", "--data", str(tiny_case),
        "--output", str(out), "--methods", "fdk", "sart",
        "--sart_iters", "2",
    ])
    for m in ("fdk", "sart"):
        vol = np.load(out / m / f"vol_{m}.npy")
        assert vol.shape == (16, 16, 16) and np.isfinite(vol).all()
    import json

    with open(out / "traditional_methods.json") as f:
        report = json.load(f)
    assert np.isfinite(report["sart"]["psnr_3d"])


def test_train_all_batch_driver(tiny_case, tmp_path):
    data_root = tiny_case.parent
    out_root = tmp_path / "outputs"
    run_cli([
        "scripts/train_all.py", "--data_root", str(data_root),
        "--output_root", str(out_root), "--extra",
        "--iterations", "4", "--initial_capacity", "512",
        "--test_iterations", "4", "--save_iterations", "4",
    ])
    assert (out_root / tiny_case.name / "eval" / "iter_000004").is_dir()
    # second invocation must skip the existing output
    out2 = run_cli([
        "scripts/train_all.py", "--data_root", str(data_root),
        "--output_root", str(out_root), "--extra", "--iterations", "4",
    ])
    assert "skip" in out2


def test_plot_volume_and_visualize_scene(tiny_case, tmp_path):
    png = tmp_path / "slices.png"
    run_cli(["scripts/plot_volume.py", "--vol",
             str(tiny_case / "vol_gt.npy"), "--output", str(png),
             "--n_slices", "4"])
    assert png.stat().st_size > 0
    vis = tmp_path / "scene.png"
    run_cli(["scripts/visualize_scene.py", "--data", str(tiny_case),
             "--output", str(vis), "--n_proj", "2"])
    assert vis.stat().st_size > 0


def test_process_raw_data_npy(tmp_path):
    """HU-domain .npy volume -> clipped/normalized cube (the chest-phantom
    ingest path; reference data_generator/process_*.py)."""
    rng = np.random.default_rng(0)
    hu = rng.uniform(-1200.0, 2500.0, (12, 10, 14)).astype(np.float32)
    src = tmp_path / "raw_vol.npy"
    np.save(src, hu)
    out = tmp_path / "cube.npy"
    run_cli(["data_generator/process_raw_data.py", "--input", str(src),
             "--output", str(out), "--size", "16"])
    vol = np.load(out)
    assert vol.shape == (16, 16, 16)
    assert 0.0 <= vol.min() and vol.max() <= 1.0
