"""Synthesize a production-scale FIPS-style raw scan for the real-data
protocol run (VERDICT r4 item 6): config.txt + per-view .mat projections at
RAW detector resolution, shaped exactly like the open FIPS CT releases the
reference ingests (real_dataset/generate_data.py:26-163): 0.4 mm pixels,
1024^2 raw detector, 240 views over 360 deg, the documented 5-pixel vertical
detector shift baked in, intensities scaled so the ingest's
`/proj_rescale * object_scale` recovers true line integrals (FDK pseudo-GT
max ~= 1 without renormalization distortion).

The phantom is the procedural head volume (data/volumes/head.npy, staged by
dev/stage_datasets.sh) placed in the scene geometry the ingest will derive
from config.txt, so the whole chain — mat decode, shift correction,
area-downsample to 512^2, FDK-from-all-views pseudo-GT, train/test split —
is exercised at full production scale with a known ground truth.

Usage (solo on the TPU host):
    python dev/make_fips_raw.py [--output data/raw_fips] [--views 240]
"""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import numpy as np

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

from r2_gaussian_tpu.ops.projector import project

ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..")

# config.txt values (mm, FIPS conventions). With the ingest defaults
# proj_subsample=2, object_scale=50: DSD=35, DSO=25 scene units,
# dDetector=0.04, sDetector=20.48, sVoxel=20.48*25/35=14.63.
DSD_MM, DSO_MM, PIXEL_MM = 700.0, 500.0, 0.4
RAW_DET = 1024
RESCALE = 400.0 / 50.0  # ingest divides by proj_rescale/object_scale


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", default=osp.join(ROOT, "data", "raw_fips"))
    ap.add_argument("--vol", default=osp.join(ROOT, "data", "volumes",
                                              "head.npy"))
    ap.add_argument("--views", type=int, default=240)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import scipy.io

    scale = 50.0  # object_scale the ingest will apply
    dsd, dso = DSD_MM / 1000 * scale, DSO_MM / 1000 * scale
    d_det_raw = PIXEL_MM / 1000 * scale
    s_det = RAW_DET * d_det_raw
    s_vox = s_det * dso / dsd
    n_vox = 256
    scanner = {
        "mode": "cone", "DSD": dsd, "DSO": dso,
        "nDetector": [RAW_DET, RAW_DET], "sDetector": [s_det, s_det],
        "nVoxel": [n_vox] * 3, "sVoxel": [s_vox] * 3,
        "dVoxel": [s_vox / n_vox] * 3,
        "offOrigin": [0.0, 0.0, 0.0], "offDetector": [0.0, 0.0],
        "accuracy": 0.5, "totalAngle": 360.0, "startAngle": 0.0,
    }

    vol = np.load(args.vol).astype(np.float32)
    if vol.shape != (n_vox,) * 3:
        from scipy.ndimage import zoom

        vol = zoom(vol, [n_vox / s for s in vol.shape], order=1)
    vol = np.clip(vol / max(vol.max(), 1e-9), 0, None).astype(np.float32)

    interval = 360.0 / args.views
    angle_last = 360.0 - interval
    angles_deg = np.concatenate([
        np.arange(0.0, angle_last, interval), [angle_last]])
    assert len(angles_deg) == args.views
    angles = angles_deg / 180.0 * np.pi

    os.makedirs(args.output, exist_ok=True)
    with open(osp.join(args.output, "config.txt"), "w") as f:
        f.write(
            f"NumberImages= {args.views}\n"
            f"AngleInterval= {interval}\n"
            f"AngleFirst= 0.0\n"
            f"AngleLast= {angle_last}\n"
            f"DistanceSourceDetector= {DSD_MM}\n"
            f"DistanceSourceOrigin= {DSO_MM}\n"
            f"PixelSizeUnit= mm\n"
            f"PixelSize= {PIXEL_MM}\n"
        )

    rng = np.random.default_rng(args.seed)
    chunk = 8
    for i0 in range(0, args.views, chunk):
        sub = angles[i0:i0 + chunk]
        projs = np.asarray(project(vol, sub, scanner))
        for j, p in enumerate(projs):
            i = i0 + j
            # detector-readout noise typical of the real scans (~0.5%)
            p = p * (1.0 + 0.005 * rng.standard_normal(p.shape)).astype(
                np.float32)
            raw = np.zeros_like(p)
            raw[5:] = p[:-5]  # the scanner's 5-px shift the ingest undoes
            scipy.io.savemat(
                osp.join(args.output, f"proj_{i:04d}.mat"),
                {"img": (np.maximum(raw, 0) * RESCALE).astype(np.float64)})
        print(f"projected views {i0}..{i0 + len(sub) - 1}", flush=True)
    print(f"Wrote FIPS-style raw scan ({args.views} views, {RAW_DET}^2) to "
          f"{args.output}")


if __name__ == "__main__":
    main()
