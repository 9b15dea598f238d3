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
_args = [a for a in sys.argv[1:] if not a.startswith("--")]
OUT = _args[0] if _args else osp.join(ROOT, "output")


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


def matrix_table():
    """Headline grid mirroring the reference's assets/results.md: one row
    per (phantom, beam, views, preset-arm), final-30k offline metrics."""
    import re

    rows = []
    for case_dir in sorted(glob.glob(osp.join(OUT, "*"))):
        name = osp.basename(case_dir)
        m = re.fullmatch(r"(\w+?)_(cone|parallel)_(\d+)(_lrfast)?", name)
        if not m:
            continue
        m3 = load_yml(osp.join(case_dir, "test", "iter_030000", "eval3d.yml"))
        m2 = load_yml(
            osp.join(case_dir, "test", "iter_030000",
                     "eval2d_render_test.yml")) or {}
        if not m3:
            continue
        # peak train-time PSNR3D across eval checkpoints, to show the
        # final-vs-peak semiconvergence gap per arm
        peak = None
        for it_dir in glob.glob(osp.join(case_dir, "eval", "iter_*")):
            e = load_yml(osp.join(it_dir, "eval3d.yml")) or {}
            p = e.get("psnr_3d")
            if isinstance(p, (int, float)):
                peak = p if peak is None else max(peak, p)
        rows.append((m.group(1), m.group(2), int(m.group(3)),
                     "lrfast" if m.group(4) else "default",
                     m3.get("psnr_3d"), m3.get("ssim_3d"),
                     m2.get("psnr_2d"), m2.get("ssim_2d"), peak))
    if not rows:
        return
    print("\n### Quality-protocol matrix (offline test.py @ iter 30000)\n")
    print("| case | beam | views | preset | PSNR3D | SSIM3D | PSNR2D(test)"
          " | SSIM2D(test) | peak PSNR3D (train evals) |")
    print("|---|---|---|---|---|---|---|---|---|")
    for c, b, nv, arm, p3, s3, p2, s2, pk in sorted(rows):
        print(f"| {c} | {b} | {nv} | {arm} | {fmt(p3)} | {fmt(s3, 4)} "
              f"| {fmt(p2)} | {fmt(s2, 4)} | {fmt(pk)} |")


if __name__ == "__main__":
    if "--matrix" in sys.argv:
        matrix_table()
    else:
        for case_dir in sorted(glob.glob(osp.join(OUT, "*"))):
            if osp.isdir(case_dir):
                case_table(case_dir)
        tv_sweep_table()
