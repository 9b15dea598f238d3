"""End-to-end CLI pipeline smokes on tiny CPU shapes.

Two ingest paths the unit suite otherwise never drives end to end:
  1. the FIPS real-scan path (reference real_dataset/generate_data.py):
     config.txt + .mat projections -> generate_real.py -> initialize_pcd.py
     -> train.py -> test.py,
  2. the NAF pickle path (reference dataset_readers.py:194-308 +
     scripts/ours_to_naf_format.py): meta_data.json dataset -> converter ->
     a training run from the pickle scene.
"""

import json
import os
import os.path as osp
import pickle
import subprocess
import sys

import numpy as np
import pytest
import yaml

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))


def run_cli(args, cwd=ROOT, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "")
    r = subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env, timeout=timeout,
        capture_output=True, text=True,
    )
    assert r.returncode == 0, (
        f"{args[0]} failed rc={r.returncode}\nstdout:\n{r.stdout[-3000:]}"
        f"\nstderr:\n{r.stderr[-3000:]}"
    )
    return r.stdout


@pytest.fixture(scope="module")
def fips_style_raw(tmp_path_factory):
    """Synthesize a FIPS-style raw scan dir: config.txt + per-view .mat files
    (key 'img', values pre-rescale ~[0, 400]), 64x64 raw detector."""
    import scipy.io

    raw = tmp_path_factory.mktemp("fips_raw")
    n_proj, det = 12, 64
    with open(raw / "config.txt", "w") as f:
        f.write(
            "NumberImages= 12\n"
            "AngleInterval= 30.0\n"
            "AngleFirst= 0.0\n"
            "AngleLast= 330.0\n"
            "DistanceSourceDetector= 700.0\n"
            "DistanceSourceOrigin= 500.0\n"
            "PixelSizeUnit= mm\n"
            "PixelSize= 1.0\n"
        )
    # A centered, rotationally-symmetric blob: its cone-beam projection is
    # approximately the same smooth 2D gaussian from every angle, which is
    # all the smoke needs (FDK of it is a ball). Values sized so that after
    # the ingest rescale (/400 * object_scale 50) the pixels are O(1).
    yy, xx = np.meshgrid(np.arange(det), np.arange(det), indexing="ij")
    r2 = (yy - det / 2 + 5) ** 2 + (xx - det / 2) ** 2  # +5: detector shift
    base = 320.0 * np.exp(-r2 / (2 * 10.0 ** 2))
    rng = np.random.default_rng(0)
    for i in range(n_proj):
        img = base * (1.0 + 0.02 * rng.standard_normal((det, det)))
        scipy.io.savemat(raw / f"proj_{i:04d}.mat", {"img": img.astype(np.float64)})
    return raw


def test_real_ingest_full_pipeline(fips_style_raw, tmp_path):
    """generate_real.py -> initialize_pcd.py -> train.py -> test.py, all as
    subprocess CLI calls (the exact user surface), tiny shapes."""
    case = tmp_path / "real_case"
    run_cli([
        "data_generator/generate_real.py",
        "--data", str(fips_style_raw), "--output", str(case),
        "--n_train", "8", "--n_test", "4", "--proj_subsample", "4",
        "--n_voxel", "32",
    ])
    # ingest wrote the meta_data.json layout
    with open(case / "meta_data.json") as f:
        meta = json.load(f)
    assert len(meta["proj_train"]) == 8 and len(meta["proj_test"]) == 4
    vol_gt = np.load(case / "vol_gt.npy")
    assert vol_gt.shape == (32, 32, 32) and np.isfinite(vol_gt).all()
    assert vol_gt.max() > 0.5  # FDK pseudo-GT found the blob

    run_cli([
        "initialize_pcd.py", "--data", str(case),
        "--recon_method", "fdk", "--n_points", "200",
        "--density_thresh", "0.01",
    ])
    init = np.load(case / f"init_{case.name}.npy")
    assert init.shape == (200, 4) and np.isfinite(init).all()

    model = tmp_path / "real_model"
    run_cli([
        "train.py", "--source_path", str(case), "--model_path", str(model),
        "--iterations", "12", "--test_iterations", "12",
        "--save_iterations", "12", "--initial_capacity", "1024",
    ])
    with open(model / "eval" / "iter_000012" / "eval3d.yml") as f:
        m3 = yaml.safe_load(f)
    assert np.isfinite(m3["psnr_3d"])
    assert osp.exists(model / "point_cloud" / "iteration_12" / "point_cloud.pickle")

    run_cli(["test.py", "--model_path", str(model), "--skip_render_train"])
    with open(model / "test" / "iter_000012" / "eval3d.yml") as f:
        t3 = yaml.safe_load(f)
    assert np.isfinite(t3["psnr_3d"])
    assert osp.exists(model / "test" / "iter_000012" / "volume" / "vol_pred.nii.gz")


@pytest.fixture(scope="module")
def tiny_blender_case(tmp_path_factory):
    """A tiny meta_data.json dataset rendered with the JAX projector."""
    from r2_gaussian_tpu.ops.phantom import gaussian_blobs
    from r2_gaussian_tpu.ops.projector import project

    case = tmp_path_factory.mktemp("naf_src") / "tiny_case"
    os.makedirs(case / "proj_train")
    os.makedirs(case / "proj_test")
    det, nvox = 24, 24
    scanner = {
        "mode": "cone", "DSD": 7.0, "DSO": 5.0,
        "nDetector": [det, det], "sDetector": [4.0, 4.0],
        "nVoxel": [nvox] * 3, "sVoxel": [2.0] * 3,
        "dVoxel": [2.0 / nvox] * 3,
        "offOrigin": [0.0, 0.0, 0.0], "offDetector": [0.0, 0.0],
        "accuracy": 0.5, "totalAngle": 360.0, "startAngle": 0.0,
        "filter": None, "noise": False,
    }
    vol = gaussian_blobs(nvox, n_blobs=4, seed=3)
    files = {"proj_train": [], "proj_test": []}
    rng = np.random.default_rng(1)
    for split, angles in [
        ("proj_train", np.linspace(0, 2 * np.pi, 9)[:-1]),
        ("proj_test", rng.uniform(0, 2 * np.pi, 3)),
    ]:
        projs = np.asarray(project(vol, angles, scanner))
        for i, ang in enumerate(angles):
            name = f"{split}_{i:04d}.npy"
            np.save(case / split / name, projs[i].astype(np.float32))
            files[split].append(
                {"file_path": f"{split}/{name}", "angle": float(ang)}
            )
    np.save(case / "vol_gt.npy", vol.astype(np.float32))
    meta = {"scanner": scanner, "vol": "vol_gt.npy",
            "bbox": [[-1, -1, -1], [1, 1, 1]],
            "proj_train": files["proj_train"],
            "proj_test": files["proj_test"]}
    with open(case / "meta_data.json", "w") as f:
        json.dump(meta, f)
    return case


def test_naf_roundtrip_and_training(tiny_blender_case, tmp_path):
    """ours_to_naf_format.py converts a meta_data.json dataset to the NAF
    pickle; the NAF reader then feeds an actual (short) training run."""
    case = tiny_blender_case
    pkl = tmp_path / "tiny_case.pickle"
    run_cli([
        "scripts/ours_to_naf_format.py", "--data", str(case),
        "--output", str(pkl),
    ])
    with open(pkl, "rb") as f:
        data = pickle.load(f)
    assert data["numTrain"] == 8 and data["numVal"] == 3
    assert data["DSD"] == pytest.approx(7000.0)  # m -> mm

    # NAF pickle scene -> init (random: FDK from 8 views of a 24-grid is
    # noisy) -> short training run straight from the pickle path.
    run_cli([
        "initialize_pcd.py", "--data", str(pkl),
        "--recon_method", "random", "--n_points", "300",
    ])
    assert osp.exists(tmp_path / "init_tiny_case.npy")

    model = tmp_path / "naf_model"
    run_cli([
        "train.py", "--source_path", str(pkl), "--model_path", str(model),
        "--iterations", "12", "--test_iterations", "12",
        "--save_iterations", "12", "--initial_capacity", "1024",
    ])
    with open(model / "eval" / "iter_000012" / "eval3d.yml") as f:
        m3 = yaml.safe_load(f)
    assert np.isfinite(m3["psnr_3d"])
    with open(model / "eval" / "iter_000012" / "eval2d_render_test.yml") as f:
        m2 = yaml.safe_load(f)
    assert np.isfinite(m2["psnr_2d"])
