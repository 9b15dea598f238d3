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

def test_check_proj_and_volume(tiny_case, tmp_path):
    out = tmp_path / "proj.png"
    stdout = run_cli(["data_generator/check_proj.py", str(tiny_case),
                      str(out)])
    assert out.stat().st_size > 0 and "finite=True" in stdout
    vout = tmp_path / "vol.png"
    stdout = run_cli(["data_generator/check_volume.py",
                      str(tiny_case / "vol_gt.npy"), str(vout)])
    assert vout.stat().st_size > 0 and "finite=True" in stdout
    for ax in (0, 1):
        assert (tmp_path / f"vol_ax{ax}.png").stat().st_size > 0


def test_process_raw_data_case_table(tmp_path):
    """--case mode consuming the raw_metadata table (reference 15-case
    synthetic protocol, raw_metadata.py:1-155): decode a tiny synthetic
    .raw dump through a real table entry's decode parameters."""
    sys.path.insert(0, osp.join(ROOT, "data_generator"))
    from raw_metadata import RAW_CASES

    assert len(RAW_CASES) == 15
    # synthesize the 0_foot raw dump at reduced size: patch a copy of the
    # table via env is overkill — instead write the real file shape but
    # tiny dtype extent is fixed by the table, so write the real shape
    info = RAW_CASES["0_jaw"]
    root = tmp_path / "raw_root"
    root.mkdir()
    rng = np.random.default_rng(0)
    vol = rng.integers(0, 255, info["shape"][::-1], dtype=np.uint8)
    vol.tofile(root / info["path"])
    out = tmp_path / "cases"
    run_cli(["data_generator/process_raw_data.py", "--case", "0_jaw",
             "--raw_root", str(root), "--output", str(out), "--size", "16"])
    v = np.load(out / "0_jaw.npy")
    assert v.shape == (16, 16, 16)
    assert 0.0 <= v.min() and v.max() <= 1.0


def test_generate_real_all_batch(tmp_path):
    """Batch FIPS ingest driver (reference generate_data_all.py): one tiny
    synthetic FIPS-style case dir through the loop, then skip-if-done.
    Case fabrication mirrors tests/test_e2e_cli.py::fips_style_raw."""
    import scipy.io as sio

    case = tmp_path / "fips" / "tiny_shell"
    case.mkdir(parents=True)
    det, n_proj = 32, 8
    (case / "config.txt").write_text(
        f"NumberImages= {n_proj}\n"
        f"AngleInterval= {360.0 / n_proj}\n"
        "AngleFirst= 0.0\n"
        f"AngleLast= {360.0 - 360.0 / n_proj}\n"
        "DistanceSourceDetector= 700.0\n"
        "DistanceSourceOrigin= 500.0\n"
        "PixelSizeUnit= mm\n"
        "PixelSize= 1.0\n")
    yy, xx = np.meshgrid(np.arange(det), np.arange(det), indexing="ij")
    r2 = (yy - det / 2 + 5) ** 2 + (xx - det / 2) ** 2
    base = 320.0 * np.exp(-r2 / (2 * 6.0 ** 2))
    for i in range(n_proj):
        sio.savemat(case / f"proj_{i:04d}.mat",
                    {"img": base.astype(np.float64)})
    out_root = tmp_path / "real_out"
    run_cli(["data_generator/generate_real_all.py",
             "--data", str(case.parent), "--output", str(out_root),
             "--n_train", "3", "--n_test", "2", "--proj_subsample", "2",
             "--n_voxel", "16"])
    out_case = out_root / "cone_ntrain_3_angle_360" / "tiny_shell"
    assert (out_case / "meta_data.json").exists()
    stdout = run_cli(["data_generator/generate_real_all.py",
                      "--data", str(case.parent), "--output", str(out_root),
                      "--n_train", "3", "--n_test", "2"])
    assert "skip" in stdout


def test_train_all_saxnerf_driver(tiny_case, tmp_path):
    """SAX-NeRF batch driver (reference scripts/train_all_saxnerf.py):
    convert the tiny case to a NAF pickle, then train it through the
    driver with the tuned config."""
    naf_dir = tmp_path / "sax"
    naf_dir.mkdir()
    pickle_path = naf_dir / "tiny.pickle"
    run_cli(["scripts/ours_to_naf_format.py", "--data", str(tiny_case),
             "--output", str(pickle_path)])
    run_cli(["initialize_pcd.py", "--data", str(pickle_path),
             "--n_points", "100", "--density_thresh", "0.01"])
    out_root = tmp_path / "sax_out"
    run_cli(["scripts/train_all_saxnerf.py", "--source", str(naf_dir),
             "--output", str(out_root), "--extra",
             "--iterations", "4", "--initial_capacity", "512",
             "--test_iterations", "4"])
    assert (out_root / "tiny" / "eval" / "iter_000004").is_dir()
