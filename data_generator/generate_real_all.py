"""Batch real-dataset (FIPS) ingest (reference
data_generator/real_dataset/generate_data_all.py:1-64): loop every case dir
under --data (each holding the FIPS config.txt + .mat projections) through
generate_real.py, writing to
--output/cone_ntrain_<n_train>_angle_360/<case>/ as the reference does."""

import argparse
import os
import os.path as osp
import subprocess
import sys

HERE = osp.dirname(osp.abspath(__file__))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str,
                        default=osp.join(HERE, "FIPS_processed"))
    parser.add_argument("--output", type=str, default="data/real_dataset")
    parser.add_argument("--n_train", type=int, default=75)
    parser.add_argument("--n_test", type=int, default=100)
    parser.add_argument("--proj_subsample", type=float, default=4.0)
    parser.add_argument("--proj_rescale", type=float, default=400.0)
    parser.add_argument("--object_scale", type=float, default=50.0)
    parser.add_argument("--n_voxel", type=int, default=256)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    cases = sorted(
        n for n in os.listdir(args.data)
        if osp.isdir(osp.join(args.data, n))
    )
    if not cases:
        raise ValueError(f"{args.data} holds no case dirs")

    for name in cases:
        out = osp.join(args.output,
                       f"cone_ntrain_{args.n_train}_angle_360", name)
        if osp.exists(osp.join(out, "meta_data.json")):
            print(f"skip {name} (exists)")
            continue
        os.makedirs(out, exist_ok=True)
        cmd = [sys.executable, osp.join(HERE, "generate_real.py"),
               "--data", osp.join(args.data, name), "--output", out,
               "--n_train", str(args.n_train), "--n_test", str(args.n_test),
               "--proj_subsample", str(args.proj_subsample),
               "--proj_rescale", str(args.proj_rescale),
               "--object_scale", str(args.object_scale),
               "--n_voxel", str(args.n_voxel), "--seed", str(args.seed)]
        print(" ".join(cmd))
        ret = subprocess.run(cmd).returncode
        if ret != 0:
            print(f"case {name} failed with code {ret}")


if __name__ == "__main__":
    main()
