"""Collect queue artifacts into RESULTS.md-ready markdown tables.

Scans output/<case>/eval/iter_*/ (training-time evals), output/<case>/test/
(offline test.py evals), and .bench_data/tv_sweep.jsonl, and prints one
markdown table per case plus the TV-sweep table. Run any time; prints only
what exists. Usage: python dev/collect_results.py [output_dir]
"""
import glob
import json
import os.path as osp
import sys

import yaml

ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..")
OUT = sys.argv[1] if len(sys.argv) > 1 else osp.join(ROOT, "output")


def load_yml(path):
    try:
        with open(path) as f:
            return yaml.safe_load(f)
    except OSError:
        return None


def fmt(v, nd=2):
    return f"{v:.{nd}f}" if isinstance(v, (int, float)) else "—"


def case_table(case_dir):
    rows = []
    for it_dir in sorted(glob.glob(osp.join(case_dir, "eval", "iter_*"))):
        it = int(osp.basename(it_dir).split("_")[1])
        m3 = load_yml(osp.join(it_dir, "eval3d.yml")) or {}
        m2 = load_yml(osp.join(it_dir, "eval2d_render_test.yml")) or {}
        rows.append((it, m3.get("psnr_3d"), m3.get("ssim_3d"),
                     m2.get("psnr_2d"), m2.get("ssim_2d")))
    if not rows:
        return
    print(f"\n### {osp.basename(case_dir)} (train-time evals)\n")
    print("| iter | PSNR3D | SSIM3D | PSNR2D(test) | SSIM2D(test) |")
    print("|---|---|---|---|---|")
    for it, p3, s3, p2, s2 in rows:
        print(f"| {it} | {fmt(p3)} | {fmt(s3, 4)} | {fmt(p2)} | {fmt(s2, 4)} |")
    for it_dir in sorted(glob.glob(osp.join(case_dir, "test", "iter_*"))):
        it = int(osp.basename(it_dir).split("_")[1])
        m3 = load_yml(osp.join(it_dir, "eval3d.yml")) or {}
        m2 = load_yml(osp.join(it_dir, "eval2d_render_test.yml")) or {}
        print(f"\ntest.py @ iter {it}: PSNR3D {fmt(m3.get('psnr_3d'))}, "
              f"SSIM3D {fmt(m3.get('ssim_3d'), 4)}, "
              f"PSNR2D(test) {fmt(m2.get('psnr_2d'))}, "
              f"SSIM2D(test) {fmt(m2.get('ssim_2d'), 4)}")


def tv_sweep_table():
    path = osp.join(ROOT, ".bench_data", "tv_sweep.jsonl")
    if not osp.exists(path):
        return
    runs = {}
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            runs.setdefault(r["tag"], {})[r["iter"]] = r
    if not runs:
        return
    iters = sorted({it for rs in runs.values() for it in rs})
    print("\n### lambda_tv sweep (noisy 25-view flagship, PSNR3D)\n")
    print("| iter | " + " | ".join(runs) + " |")
    print("|---|" + "---|" * len(runs))
    for it in iters:
        cells = [fmt(runs[t].get(it, {}).get("psnr3d")) for t in runs]
        print(f"| {it} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    for case_dir in sorted(glob.glob(osp.join(OUT, "*"))):
        if osp.isdir(case_dir):
            case_table(case_dir)
    tv_sweep_table()
