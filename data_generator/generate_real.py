"""Real-scan (FIPS open CT data) ingest (reference
data_generator/real_dataset/generate_data.py equivalent).

Parses the scanner config.txt, subsamples/crops the raw .mat projections,
applies the dataset's documented 5-pixel vertical shift, rescales to scene
units, selects train/test views, reconstructs a pseudo-GT volume via FDK
from ALL views, and writes the meta_data.json layout.
"""

import argparse
import glob
import json
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

from r2_gaussian_tpu.ops.fdk import fdk


def parse_config(path, proj_subsample, object_scale):
    cfg = {}
    with open(path) as f:
        for line in f:
            if "NumberImages" in line:
                cfg["n_proj"] = int(line.split("=")[-1])
            elif "AngleInterval" in line:
                cfg["angle_interval"] = float(line.split("=")[-1])
            elif "AngleFirst" in line:
                cfg["angle_start"] = float(line.split("=")[-1])
            elif "AngleLast" in line:
                cfg["angle_last"] = float(line.split("=")[-1])
            elif "DistanceSourceDetector" in line:
                cfg["DSD"] = float(line.split("=")[-1]) / 1000 * object_scale
            elif "DistanceSourceOrigin" in line:
                cfg["DSO"] = float(line.split("=")[-1]) / 1000 * object_scale
            elif "PixelSize" in line and "PixelSizeUnit" not in line:
                cfg["dDetector"] = (
                    float(line.split("=")[-1]) * proj_subsample / 1000 * object_scale
                )
    return cfg


def downsample_crop(proj, factor):
    if factor == 1.0:
        return proj
    h, w = proj.shape
    hn, wn = int(h / factor), int(w / factor)
    # area-style downsampling via reshape-mean when factor divides evenly,
    # else strided sampling
    fy, fx = h // hn, w // wn
    if hn * fy == h and wn * fx == w:
        proj = proj[: hn * fy, : wn * fx].reshape(hn, fy, wn, fx).mean((1, 3))
    else:
        proj = proj[:: int(factor), :: int(factor)][:hn, :wn]
    a, b = proj.shape
    if a > b:
        off = (a - b) // 2
        proj = proj[off : off + b, :]
    elif b > a:
        off = (b - a) // 2
        proj = proj[:, off : off + a]
    return proj


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--n_train", type=int, default=50)
    parser.add_argument("--n_test", type=int, default=100)
    parser.add_argument("--proj_subsample", type=float, default=4.0)
    parser.add_argument("--proj_rescale", type=float, default=400.0)
    parser.add_argument("--object_scale", type=float, default=50.0)
    parser.add_argument("--n_voxel", type=int, default=256)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import scipy.io

    rng = np.random.default_rng(args.seed)
    cfg = parse_config(
        osp.join(args.data, "config.txt"), args.proj_subsample, args.object_scale
    )
    angles = np.concatenate([
        np.arange(cfg["angle_start"], cfg["angle_last"], cfg["angle_interval"]),
        [cfg["angle_last"]],
    ]) / 180.0 * np.pi
    n_proj = cfg["n_proj"]
    train_ids = np.linspace(0, n_proj - 1, args.n_train).astype(int)
    rest = np.setdiff1d(np.arange(n_proj), train_ids)
    test_ids = np.sort(rng.choice(rest, min(args.n_test, len(rest)), replace=False))

    mats = sorted(glob.glob(osp.join(args.data, "*.mat")))
    assert len(mats) >= n_proj, f"found {len(mats)} .mat files, expected {n_proj}"
    os.makedirs(args.output, exist_ok=True)
    for sub in ("proj_train", "proj_test"):
        os.makedirs(osp.join(args.output, sub), exist_ok=True)

    all_projs, files = [], {"proj_train": [], "proj_test": []}
    for i in range(n_proj):
        proj = scipy.io.loadmat(mats[i])["img"] / args.proj_rescale * args.object_scale
        proj = np.maximum(proj.astype(np.float32), 0)
        shifted = np.zeros_like(proj)  # documented 5-px detector shift
        shifted[:-5] = proj[5:]
        proj = downsample_crop(shifted, args.proj_subsample)
        all_projs.append(proj)
        name = osp.basename(mats[i]).split(".")[0] + ".npy"
        for split, ids in [("proj_train", train_ids), ("proj_test", test_ids)]:
            if i in ids:
                np.save(osp.join(args.output, split, name), proj)
                files[split].append(
                    {"file_path": osp.join(split, name), "angle": float(angles[i])}
                )

    n_det = all_projs[0].shape
    s_det = (np.array(n_det) * cfg["dDetector"]).tolist()
    # cubic volume sized to the cone-beam FOV at the origin
    s_vox = float(s_det[0] * cfg["DSO"] / cfg["DSD"])
    scanner = {
        "mode": "cone", "filter": None,
        "DSD": cfg["DSD"], "DSO": cfg["DSO"],
        "nDetector": list(n_det), "sDetector": s_det,
        "nVoxel": [args.n_voxel] * 3, "sVoxel": [s_vox] * 3,
        "offOrigin": [0, 0, 0], "offDetector": [0, 0],
        "accuracy": 0.5,
        "totalAngle": cfg["angle_last"] - cfg["angle_start"],
        "startAngle": cfg["angle_start"],
        "noise": False,
    }

    # pseudo-GT: FDK from ALL views (reference generate_data.py:147-163);
    # chunk the many-view backprojection into bounded device dispatches
    vol = np.clip(np.asarray(fdk(np.stack(all_projs), angles, scanner,
                                 view_chunk=60)), 0, None)
    vol = vol / max(vol.max(), 1e-9)
    np.save(osp.join(args.output, "vol_gt.npy"), vol.astype(np.float32))

    meta = {
        "scanner": scanner, "vol": "vol_gt.npy",
        "bbox": [[-1, -1, -1], [1, 1, 1]],
        "proj_train": files["proj_train"], "proj_test": files["proj_test"],
    }
    with open(osp.join(args.output, "meta_data.json"), "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=4)
    print(f"Wrote real-scan dataset to {args.output}")


if __name__ == "__main__":
    main()
