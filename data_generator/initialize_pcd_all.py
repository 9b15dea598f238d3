"""Batch point-cloud initialization (reference
data_generator/initialize_pcd_all.py): run initialize_pcd.py for every case
under a data root, skipping cases whose init file already exists."""

import argparse
import os
import os.path as osp
import subprocess
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)

from initialize_pcd import default_init_path  # noqa: E402


def find_cases(data_root):
    cases = []
    for name in sorted(os.listdir(data_root)):
        p = osp.join(data_root, name)
        if osp.isdir(p) and osp.exists(osp.join(p, "meta_data.json")):
            cases.append(p)
        elif name.endswith((".pickle", ".pkl")) and not name.startswith("init_"):
            cases.append(p)
    return cases


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, required=True)
    parser.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                        help="extra args forwarded to initialize_pcd.py")
    args = parser.parse_args()

    for path in find_cases(args.data_root):
        try:
            out = default_init_path(path)
        except ValueError:
            continue
        if osp.exists(out):
            print(f"skip {path} (init exists)")
            continue
        cmd = [sys.executable, osp.join(ROOT, "initialize_pcd.py"),
               "--data", path] + args.extra
        print(" ".join(cmd))
        ret = subprocess.run(cmd).returncode
        if ret != 0:
            print(f"case {path} failed with code {ret}")


if __name__ == "__main__":
    main()
