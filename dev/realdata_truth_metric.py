"""Quantify the real-data pseudo-GT floor (VERDICT r5 weak #7 / next #9).

The production-scale real-data protocol run (output/real_fips_50_lrfast)
scores PSNR3D 33.80 against its FDK-from-all-721-views pseudo-GT — weak on
its face. Because the FIPS-style raw scan is self-synthesized from a KNOWN
generating volume (dev/make_fips_raw.py places data/volumes/head.npy in the
scene geometry the ingest later derives from config.txt, so the ingest's
256^3 grid is voxel-aligned with the phantom), the floor can be measured
instead of caveated:

  - psnr(pseudo-GT vs true): how far FDK-721 itself is from the truth
  - psnr(pred     vs true): the model scored against the truth
  - psnr(pred vs pseudo-GT): what eval3d.yml reports
  - ROI variants (metric_vol_psnr_masked): same on the dilated object
    support, separating interior error from the background.

Measured (round 6): pseudo-vs-true 34.75 dB, pred-vs-true 37.87 dB,
pred-vs-pseudo 33.80 dB — the model reconstructs the true volume 3.1 dB
BETTER than the pseudo-GT it was scored against; the 33.80 headline is the
pseudo-GT's own noise floor, not model error.

Usage: python dev/realdata_truth_metric.py [run_dir] [true_vol.npy]  (CPU)
"""
import json
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))
import numpy as np

from r2_gaussian_tpu.utils.metrics import metric_vol_psnr_masked

ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..")
RUN = sys.argv[1] if len(sys.argv) > 1 else osp.join(
    ROOT, "output", "real_fips_50_lrfast", "test", "iter_030000", "volume")
TRUE = sys.argv[2] if len(sys.argv) > 2 else osp.join(
    ROOT, "data", "volumes", "head.npy")


def psnr(a, b):
    return float(10 * np.log10(1.0 / np.mean((a - b) ** 2)))


def main():
    pseudo = np.load(osp.join(RUN, "vol_gt.npy"))
    pred = np.load(osp.join(RUN, "vol_pred.npy"))
    true = np.load(TRUE)
    out = {
        "corr_pseudo_true": float(np.corrcoef(
            pseudo.ravel(), true.ravel())[0, 1]),
        "psnr_pseudo_vs_true": round(psnr(pseudo, true), 2),
        "psnr_pred_vs_true": round(psnr(pred, true), 2),
        "psnr_pred_vs_pseudo": round(psnr(pred, pseudo), 2),
    }
    for name, a, ref in (("pseudo_vs_true", pseudo, true),
                         ("pred_vs_true", pred, true),
                         ("pred_vs_pseudo", pred, pseudo)):
        p, f = metric_vol_psnr_masked(ref, a)
        out[f"roi_psnr_{name}"] = round(p, 2)
        out["roi_fraction"] = round(f, 3)
    print(json.dumps(out, indent=1))
    with open(osp.join(ROOT, ".bench_data", "realdata_truth_metric.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
