"""Router simulator: evaluated-pairs cost of candidate block orderings.

Loads a saved training state, runs the real preprocess (pure jnp, CPU-safe)
for a few views, then simulates the splat-block tier router offline for
candidate (ordering, GROUP, tier-ladder) configurations, reporting the
evaluated gaussian-pixel pairs sum(window_area x gaussians_per_block) each
one would dispatch vs the per-gaussian footprint-area floor. This is the
search tool for the round-6 footprint-aware blocking work: the round-5
census measured 992-1179 M evaluated pairs against an ~85 M floor (12x,
.bench_data/kernel_profile_30k.log) — block granularity of the sort-free
design. Pure host math: candidates are ranked here in seconds, and only
the winners get hardware A/Bs (dev/step_profile.py).

Usage: python dev/block_sim.py [state.npz]  (CPU; JAX_PLATFORMS=cpu ok)
"""
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import jax.numpy as jnp

from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import GaussianParams, activate
from r2_gaussian_tpu.models.preprocess import cov3d_components, preprocess
from r2_gaussian_tpu.pipeline.densify import morton_code

ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..")
STATE = sys.argv[1] if len(sys.argv) > 1 else "state_slb_10000.npz"

TIERS_DEFAULT = ((64, 56), (80, 72), (112, 104), (144, 136), (176, 168),
                 (240, 232), (336, 328), (512, 512))
# finer ladder: reduces tier quantization overshoot (a 120x110 bbox lands
# in (144,136) = +37% area). Steps ~1.15-1.25x apart.
TIERS_FINE = ((48, 40), (64, 56), (80, 72), (96, 88), (112, 104),
              (128, 120), (144, 136), (176, 168), (208, 200), (240, 232),
              (288, 280), (336, 328), (416, 408), (512, 512))
# lane ladder: window WIDTH quantized to the hardware's 128-lane boundary
# (the patch matmul + placement compute on ww lanes pads to 128 anyway, so
# nominal ww below the boundary is free capacity); HEIGHT stays fine
# (row-chunk granularity is real work). Hardware A/B showed MORE tiers is
# slower per se (g2_fine l1-only 23.1 vs 15.9 ms), so the ladder stays at
# 8 tiers.
TIERS_LANE = ((48, 128), (72, 128), (112, 128), (144, 256), (208, 256),
              (288, 384), (408, 512), (512, 512))

H = W = 512


def load(state):
    d = np.load(osp.join(ROOT, ".bench_data", "slb_256_512_25_50000.npz"),
                allow_pickle=True)
    scanner, projs, angles = d["scanner"].item(), d["projs"], d["angles"]
    cams = build_cameras(angles, projs, [str(i) for i in range(len(angles))],
                         scanner)
    s = np.load(osp.join(ROOT, ".bench_data", state))
    sb = tuple(float(v) for v in s["scale_bound"])
    params = GaussianParams(
        xyz=jnp.asarray(s["xyz"]), scaling=jnp.asarray(s["scaling"]),
        rotation=jnp.asarray(s["rotation"]), density=jnp.asarray(s["density"]))
    active = np.asarray(s["active"])
    return cams, params, active, sb


def footprints(cams, params, active, sb, view):
    xyz, scales, rots, dens = activate(params, sb)
    cov3d = cov3d_components(scales, rots)
    prep = preprocess(
        xyz, cov3d, dens, jnp.asarray(cams.w2c[view]),
        jnp.asarray(cams.full_proj[view]), width=W, height=H,
        tanfovx=cams.tanfovx, tanfovy=cams.tanfovy, mode=cams.mode,
        active=jnp.asarray(active), footprint="tight")
    return {k: np.asarray(getattr(prep, k))
            for k in ("mx", "my", "xlo", "xhi", "ylo", "yhi", "weight")}


def route(order, fp, gg, tiers):
    """Mirror splat2d._run_tiers + _block_bboxes on the host. Returns
    (evaluated_pairs, per-tier block counts, n_unassigned_blocks)."""
    w = fp["weight"][order]
    xlo, xhi = fp["xlo"][order], fp["xhi"][order]
    ylo, yhi = fp["ylo"][order], fp["yhi"][order]
    n = len(w)
    pad = (-n) % gg
    if pad:
        z = np.zeros(pad)
        w = np.concatenate([w, z])
        xlo, xhi = np.concatenate([xlo, z]), np.concatenate([xhi, z])
        ylo, yhi = np.concatenate([ylo, z]), np.concatenate([yhi, z])
    nb = len(w) // gg
    v = (w > 0).reshape(nb, gg)
    big = 1e9
    bxlo = np.where(v, xlo.reshape(nb, gg), big).min(1)
    bxhi = np.where(v, xhi.reshape(nb, gg), -big).max(1)
    bylo = np.where(v, ylo.reshape(nb, gg), big).min(1)
    byhi = np.where(v, yhi.reshape(nb, gg), -big).max(1)
    has = v.any(1)
    assigned = np.zeros(nb, bool)
    pairs = 0
    eff_pairs = 0  # ww rounded up to the 128-lane boundary: what the
    # patch-matmul / placement compute actually spans
    counts = []
    for wh, ww in tiers:
        ox = np.clip(bxlo.astype(np.int64), 0, W - ww)
        oy = np.clip((bylo.astype(np.int64) // 8) * 8, 0,
                     ((H - wh) // 8) * 8)
        fits = (bxhi <= ox + ww) & (byhi <= oy + wh)
        mine = fits & ~assigned & has
        assigned |= mine
        counts.append(int(mine.sum()))
        pairs += int(mine.sum()) * wh * ww * gg
        eff_pairs += int(mine.sum()) * wh * (-(-ww // 128) * 128) * gg
    return pairs, eff_pairs, counts, int((has & ~assigned).sum())


def main():
    cams, params, active, sb = load(STATE)
    xyz = np.asarray(params.xyz)
    scales = np.asarray(
        activate(params, sb)[1])
    max_sc = scales.max(1)
    n_act = int(active.sum())
    print(f"state {STATE}: n_active {n_act}")

    views = [0, 7, 12, 19]
    fps = [footprints(cams, params, active, sb, v) for v in views]
    floor = np.mean([
        ((f["xhi"] - f["xlo"]) * (f["yhi"] - f["ylo"]))[f["weight"] > 0].sum()
        for f in fps])
    print(f"footprint-area floor: {floor / 1e6:.0f} M pairs (mean over views)")
    # per-view projected footprint radius (for classifier design)
    r = [np.maximum(f["xhi"] - f["xlo"], f["yhi"] - f["ylo"]) / 2 for f in fps]
    rv = np.concatenate([ri[f["weight"] > 0] for ri, f in zip(r, fps)])
    print("projected radius pct:",
          {p: round(float(np.percentile(rv, p)), 1)
           for p in (10, 50, 75, 90, 95, 99, 100)})
    print("world max-scale pct:",
          {p: round(float(np.percentile(max_sc[active], p)), 4)
           for p in (10, 50, 75, 90, 95, 99, 100)})

    mc = np.asarray(morton_code(jnp.asarray(xyz)))

    def eval_order(name, order, gg, tiers):
        tot, eff, una = 0.0, 0.0, 0
        for f in fps:
            p, ep, counts, u = route(order, f, gg, tiers)
            tot += p
            eff += ep
            una += u
        tot /= len(fps)
        eff /= len(fps)
        print(f"{name:45s} gg={gg:4d} pairs {tot / 1e6:6.0f} M  "
              f"eff {eff / 1e6:6.0f} M ({eff / floor:5.1f}x)  unass {una}")
        return eff

    ladders = {"default": TIERS_DEFAULT, "fine": TIERS_FINE,
               "lane": TIERS_LANE}

    oversize = (max_sc > 0.09).astype(np.int64)
    order = np.lexsort((mc, oversize, ~active))
    for lname, tiers in ladders.items():
        for gg in (256, 128):
            eval_order(f"[{lname}] (oversize@0.09, morton)", order, gg,
                       tiers)


if __name__ == "__main__":
    main()
