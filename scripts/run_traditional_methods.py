"""Classical-method baselines (reference scripts/run_traditional_methods.py):
reconstruct with fdk/sart/ossart/asd_pocs/os_asd_pocs/cgls, report 3D
metrics and test-set reprojection 2D metrics, dump results per method.
Default method list matches the reference (:47): fdk, sart, asd_pocs."""

import argparse
import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

from r2_gaussian_tpu.dataset.scene import Scene
from r2_gaussian_tpu.ops.classical import recon_volume
from r2_gaussian_tpu.ops.projector import project
from r2_gaussian_tpu.utils.metrics import metric_proj, metric_vol_psnr, metric_vol_ssim


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--methods", nargs="+",
                        default=["fdk", "sart", "asd_pocs"])
    parser.add_argument("--sart_iters", type=int, default=20)
    parser.add_argument("--cgls_iters", type=int, default=60)
    parser.add_argument("--pocs_iters", type=int, default=10)
    args = parser.parse_args()

    scene = Scene(args.data, eval_split=True)
    cams = scene.train_cameras
    report = {}
    for method in args.methods:
        out_dir = osp.join(args.output, method)
        os.makedirs(out_dir, exist_ok=True)
        t0 = time.time()
        kw = {}
        if method in ("sart", "ossart"):
            kw["n_iter"] = args.sart_iters
        if method == "cgls":
            kw["n_iter"] = args.cgls_iters
        if method in ("asd_pocs", "os_asd_pocs"):
            kw["n_iter"] = args.pocs_iters
        vol = recon_volume(cams.images, cams.angles, scene.scanner_cfg, method, **kw)
        wall = time.time() - t0
        np.save(osp.join(out_dir, f"vol_{method}.npy"), vol)
        entry = {"time_s": round(wall, 2)}
        if scene.vol_gt is not None:
            entry["psnr_3d"] = metric_vol_psnr(scene.vol_gt, np.clip(vol, 0, None))
            entry["ssim_3d"] = metric_vol_ssim(scene.vol_gt, np.clip(vol, 0, None))[0]
        if scene.test_cameras is not None and len(scene.test_cameras) > 0:
            reproj = project(
                np.clip(vol, 0, None), scene.test_cameras.angles, scene.scanner_cfg
            )
            m = metric_proj(scene.test_cameras.images, reproj)
            entry["psnr_2d"] = m["psnr_2d"]
            entry["ssim_2d"] = m["ssim_2d"]
        report[method] = entry
        print(method, entry)
    with open(osp.join(args.output, "traditional_methods.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
