"""Batch synthetic dataset generation (reference
data_generator/synthetic_dataset/generate_data_all.py equivalent): loop
generate_synthetic over every processed volume in a directory, for each
scanner config and training-view count.

    python data_generator/generate_synthetic_all.py \
        --vol_dir data/volumes --output_dir data/synthetic \
        --scanners cone_beam [parallel_beam] --n_trains 25 50 75
"""

import argparse
import glob
import os.path as osp
import subprocess
import sys

HERE = osp.dirname(osp.abspath(__file__))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vol_dir", type=str, required=True,
                   help="directory of processed [0,1] volumes (*.npy)")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--scanners", type=str, nargs="+", default=["cone_beam"])
    p.add_argument("--n_trains", type=int, nargs="+", default=[25, 50, 75])
    p.add_argument("--n_test", type=int, default=100)
    p.add_argument("--skip_existing", action="store_true", default=True)
    args = p.parse_args()

    vols = sorted(glob.glob(osp.join(args.vol_dir, "*.npy")))
    if not vols:
        sys.exit(f"no volumes found in {args.vol_dir}")
    for vol in vols:
        case = osp.splitext(osp.basename(vol))[0]
        for scanner in args.scanners:
            mode = scanner.split("_")[0]
            for n_train in args.n_trains:
                out = osp.join(args.output_dir, f"{case}_{mode}_{n_train}")
                if args.skip_existing and osp.exists(
                        osp.join(out, "meta_data.json")):
                    print(f"skip {out} (exists)")
                    continue
                cmd = [
                    sys.executable, osp.join(HERE, "generate_synthetic.py"),
                    "--vol", vol,
                    "--scanner", osp.join(HERE, "scanner", f"{scanner}.yml"),
                    "--output", out,
                    "--n_train", str(n_train), "--n_test", str(args.n_test),
                ]
                print(" ".join(cmd), flush=True)
                subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
