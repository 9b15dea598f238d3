"""Synthetic CT dataset generator (reference
data_generator/synthetic_dataset/generate_data.py equivalent, TIGRE replaced
by the JAX forward projector).

Writes the meta_data.json format consumed by the readers:
  vol_gt.npy, proj_train/*.npy, proj_test/*.npy, meta_data.json
"""

import argparse
import json
import os
import os.path as osp
import sys

import numpy as np
import yaml

sys.path.append(osp.dirname(osp.dirname(osp.abspath(__file__))))

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

from r2_gaussian_tpu.ops import phantom as phantom_mod
from r2_gaussian_tpu.ops.projector import add_ct_noise, project


def generate(vol, scanner_cfg, output_path, n_train=50, n_test=100, seed=0,
             case_name="case"):
    rng = np.random.default_rng(seed)
    total = scanner_cfg["totalAngle"] / 180 * np.pi
    start = scanner_cfg["startAngle"] / 180 * np.pi
    angles_train = np.linspace(0, total, n_train + 1)[:-1] + start
    angles_test = np.sort(rng.random(n_test) * 2 * np.pi) + start

    projs_train = project(vol, angles_train, scanner_cfg)
    if scanner_cfg.get("noise"):
        projs_train = add_ct_noise(
            projs_train,
            poisson=scanner_cfg.get("possion_noise", 1e4),
            gaussian=np.asarray(scanner_cfg.get("gaussian_noise", [0, 10])),
            seed=seed,
        )
    projs_test = project(vol, angles_test, scanner_cfg)

    os.makedirs(output_path, exist_ok=True)
    np.save(osp.join(output_path, "vol_gt.npy"), vol)
    files = {}
    for split, projs, angles in [
        ("proj_train", projs_train, angles_train),
        ("proj_test", projs_test, angles_test),
    ]:
        os.makedirs(osp.join(output_path, split), exist_ok=True)
        files[split] = []
        for i in range(projs.shape[0]):
            name = osp.join(split, f"{split}_{i:04d}.npy")
            np.save(osp.join(output_path, name), projs[i])
            files[split].append({"file_path": name, "angle": float(angles[i])})
    meta = {
        "scanner": scanner_cfg,
        "vol": "vol_gt.npy",
        "bbox": [[-1, -1, -1], [1, 1, 1]],
        "proj_train": files["proj_train"],
        "proj_test": files["proj_test"],
    }
    with open(osp.join(output_path, "meta_data.json"), "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=4)
    print(f"Generated case {case_name} at {output_path}")


def main():
    parser = argparse.ArgumentParser(description="Synthetic data generator")
    parser.add_argument("--vol", type=str, default=None,
                        help="Path to GT volume .npy; default: Shepp-Logan phantom")
    parser.add_argument("--phantom", type=str, default="shepp_logan",
                        choices=["shepp_logan", "blobs"])
    parser.add_argument("--vol_size", type=int, default=256)
    parser.add_argument("--scanner", type=str, required=True,
                        help="Path to scanner yml")
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--n_train", type=int, default=50)
    parser.add_argument("--n_test", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--blur", type=float, default=0.0,
                        help="gaussian blur sigma (voxels) applied to the GT "
                             "volume; band-limits piecewise-constant phantoms "
                             "like real (detector/recon-limited) CT data")
    args = parser.parse_args()

    with open(args.scanner) as f:
        scanner_cfg = yaml.safe_load(f)
    if args.vol:
        vol = np.load(args.vol).astype(np.float32)
        name = osp.basename(args.vol)[:-4]
    elif args.phantom == "shepp_logan":
        vol = phantom_mod.shepp_logan_3d(args.vol_size)
        name = "shepp_logan"
    else:
        vol = phantom_mod.gaussian_blobs(args.vol_size)
        name = "blobs"
    if args.blur > 0:
        from scipy.ndimage import gaussian_filter

        vol = gaussian_filter(vol, sigma=args.blur).astype(np.float32)
    scanner_cfg["nVoxel"] = [int(v) for v in vol.shape]
    generate(vol, scanner_cfg, args.output, args.n_train, args.n_test, args.seed,
             case_name=f"{name}_{scanner_cfg['mode']}")


if __name__ == "__main__":
    main()
