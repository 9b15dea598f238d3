"""Batch training driver (reference scripts/train_all.py): run train.py for
every case under a data root, skipping cases whose output dir already exists
(crude resumability, as in the reference)."""

import argparse
import os
import os.path as osp
import subprocess
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))


def find_cases(data_root):
    cases = []
    for name in sorted(os.listdir(data_root)):
        p = osp.join(data_root, name)
        if osp.isdir(p) and osp.exists(osp.join(p, "meta_data.json")):
            cases.append((name, p))
        elif name.endswith((".pickle", ".pkl")) and not name.startswith("init_"):
            cases.append((name.rsplit(".", 1)[0], p))
    return cases


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, required=True)
    parser.add_argument("--output_root", type=str, required=True)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                        help="extra args forwarded to train.py")
    args = parser.parse_args()

    for name, path in find_cases(args.data_root):
        out = osp.join(args.output_root, name)
        if osp.exists(out):
            print(f"skip {name} (output exists)")
            continue
        cmd = [sys.executable, osp.join(ROOT, "train.py"),
               "--source_path", path, "--model_path", out]
        if args.config:
            cmd += ["--config", args.config]
        cmd += args.extra
        print(" ".join(cmd))
        ret = subprocess.run(cmd).returncode
        if ret != 0:
            print(f"case {name} failed with code {ret}")


if __name__ == "__main__":
    main()
