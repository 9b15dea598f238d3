"""Batch training over a SAX-NeRF pickle dataset (reference
scripts/train_all_saxnerf.py:1-39): glob *.pickle under --source, train each
case into --output/<case>, applying a shared config. The reference defaults
to scripts/saxnerf.yml (its tuned SAX-NeRF setting,
assets/results.md:72: densify_grad_threshold=3e-5)."""

import argparse
import glob
import os.path as osp
import subprocess
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--source", type=str, default="data/sax-nerf",
                        help="dir holding <case>.pickle files")
    parser.add_argument("--output", type=str, default="output/saxnerf")
    parser.add_argument("--config", type=str,
                        default=osp.join(ROOT, "scripts", "saxnerf.yml"))
    parser.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                        help="extra args forwarded to train.py")
    args = parser.parse_args()

    case_paths = sorted(glob.glob(osp.join(args.source, "*.pickle")))
    if not case_paths:
        raise ValueError(f"{args.source} holds no *.pickle case")

    for case_path in case_paths:
        name = osp.basename(case_path).rsplit(".", 1)[0]
        if name.startswith("init_"):
            continue
        out = osp.join(args.output, name)
        if osp.exists(out):
            print(f"skip {name} (output exists)")
            continue
        cmd = [sys.executable, osp.join(ROOT, "train.py"),
               "--source_path", case_path, "--model_path", out]
        if args.config:
            cmd += ["--config", args.config]
        cmd += args.extra
        print(" ".join(cmd))
        ret = subprocess.run(cmd).returncode
        if ret != 0:
            print(f"case {name} failed with code {ret}")


if __name__ == "__main__":
    main()
