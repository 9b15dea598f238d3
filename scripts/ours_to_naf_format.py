"""Convert a meta_data.json dataset into the NAF pickle format
(reference scripts/ours_to_naf_format.py; NAF scanners are in mm while
projections stay in m, so geometry keys are multiplied by 1000)."""

import argparse
import json
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, required=True,
                        help="dataset dir containing meta_data.json")
    parser.add_argument("--output", type=str, required=True,
                        help="output .pickle path")
    args = parser.parse_args()

    with open(osp.join(args.data, "meta_data.json")) as f:
        meta = json.load(f)
    sc = meta["scanner"]
    m2mm = 1000.0
    d_voxel = np.array(sc.get(
        "dVoxel", np.array(sc["sVoxel"]) / np.array(sc["nVoxel"])
    ))
    d_det = np.array(sc.get(
        "dDetector", np.array(sc["sDetector"]) / np.array(sc["nDetector"])
    ))

    def split(name):
        frames = meta[name]
        angles = np.array([fr["angle"] for fr in frames])
        projs = np.stack([
            np.load(osp.join(args.data, fr["file_path"])) for fr in frames
        ]).astype(np.float32)
        return angles, projs

    tr_angles, tr_projs = split("proj_train")
    te_angles, te_projs = split("proj_test")

    out = {
        "numTrain": len(tr_angles),
        "numVal": len(te_angles),
        "DSD": sc["DSD"] * m2mm,
        "DSO": sc["DSO"] * m2mm,
        "nDetector": list(sc["nDetector"]),
        "dDetector": (d_det * m2mm).tolist(),
        "nVoxel": list(sc["nVoxel"]),
        "dVoxel": (d_voxel * m2mm).tolist(),
        "offOrigin": (np.array(sc["offOrigin"]) * m2mm).tolist(),
        "offDetector": (np.array(sc["offDetector"]) * m2mm).tolist(),
        "totalAngle": sc["totalAngle"],
        "startAngle": sc["startAngle"],
        "accuracy": sc.get("accuracy", 0.5),
        "mode": sc["mode"],
        "filter": None,
        "train": {"angles": tr_angles, "projections": tr_projs},
        "val": {"angles": te_angles, "projections": te_projs},
        "image": np.load(osp.join(args.data, meta["vol"])).astype(np.float32),
    }
    with open(args.output, "wb") as f:
        pickle.dump(out, f, pickle.HIGHEST_PROTOCOL)
    print(f"Wrote {args.output}")


if __name__ == "__main__":
    main()
