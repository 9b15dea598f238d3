"""Empirical footprint distribution at a realistic trained state.

Loads the cached bench case, trains to a given iteration, then reports the
per-view distribution of 3-sigma radii / footprint areas and resulting pair
counts for candidate kernel architectures (block windows vs tile binning at
several tile sizes vs per-gaussian windows).
"""
import os.path as osp
import sys
import types

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))
import numpy as np

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()
import jax
import jax.numpy as jnp

from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import activate, create_from_pcd
from r2_gaussian_tpu.models.preprocess import build_cov3d, preprocess
from r2_gaussian_tpu.pipeline.trainer import Trainer

TARGET_ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 1100

d = np.load(osp.join(osp.dirname(osp.abspath(__file__)), "..", ".bench_data",
                     "sl_256_512_25_50000.npz"), allow_pickle=True)
vol, angles, projs, scanner, pts = (d["vol"], d["angles"], d["projs"],
                                    d["scanner"].item(), d["pts"])
cams = build_cameras(angles, projs, [str(i) for i in range(len(angles))], scanner)
vol_to_world = float(max(scanner["sVoxel"]))
sb = (0.0005 * vol_to_world, 0.5 * vol_to_world)
params, aux = create_from_pcd(pts[:, :3].astype(np.float32), pts[:, 3], sb,
                              capacity=262_144)
opt = types.SimpleNamespace(
    iterations=30_000,
    position_lr_init=2e-4, position_lr_final=2e-5, position_lr_max_steps=30_000,
    density_lr_init=1e-2, density_lr_final=1e-3, density_lr_max_steps=30_000,
    scaling_lr_init=5e-3, scaling_lr_final=5e-4, scaling_lr_max_steps=30_000,
    rotation_lr_init=1e-3, rotation_lr_final=1e-4, rotation_lr_max_steps=30_000,
    lambda_dssim=0.25, lambda_tv=0.05, tv_vol_size=32,
    density_min_threshold=1e-5,
    densification_interval=100, densify_from_iter=500, densify_until_iter=15_000,
    densify_grad_threshold=5e-5, densify_scale_threshold=0.1,
    max_screen_size=None, max_scale=None, max_num_gaussians=500_000,
)
trainer = Trainer(cams, scanner, opt, sb, params, aux, backend="auto")
while trainer.iteration < TARGET_ITERS:
    trainer.run_chunk(min(100, TARGET_ITERS - trainer.iteration))
print(f"trained to {trainer.iteration}, n_active="
      f"{int(np.asarray(trainer.state.aux.n_active))}")

p = trainer.state.params
xyz, scales, rots, dens = activate(p, sb)
cov3d = build_cov3d(scales, rots)
active = trainer.state.aux.active

w2c = jnp.asarray(cams.w2c[0])
fp = jnp.asarray(cams.full_proj[0])
prep = preprocess(np.asarray(xyz), cov3d, dens, w2c, fp, width=512, height=512,
                  tanfovx=cams.tanfovx, tanfovy=cams.tanfovy, mode=cams.mode,
                  active=active, footprint="tight")
r = np.asarray(prep.radius)
w = np.asarray(prep.weight)
live = (w > 0) & np.asarray(active)
r = r[live].astype(np.float64)
n = r.size
print(f"visible gaussians: {n}")
print("radius percentiles:", {q: round(float(np.percentile(r, q)), 1)
                              for q in (10, 25, 50, 75, 90, 99, 100)})
wpx = 2 * r + 1
area = wpx ** 2
print(f"sum footprint area (=ideal pairs): {area.sum()/1e6:.1f} M")
for T in (8, 16, 32):
    tiles = (np.floor((np.asarray(prep.mean2d)[live, 0] + r) / T)
             - np.floor((np.asarray(prep.mean2d)[live, 0] - r) / T) + 1) * (
        np.floor((np.asarray(prep.mean2d)[live, 1] + r) / T)
        - np.floor((np.asarray(prep.mean2d)[live, 1] - r) / T) + 1)
    print(f"tile {T:2d}: entries={tiles.sum()/1e6:.2f} M, "
          f"pairs={tiles.sum()*T*T/1e6:.0f} M")
# per-gaussian windows, rounded to tiers
for tiers in ([16, 32, 64, 128], [24, 48, 96, 192]):
    wq = np.select([wpx <= t for t in tiers], tiers, default=512)
    print(f"per-gaussian window tiers {tiers}: pairs={np.sum(wq**2)/1e6:.0f} M,"
          f" counts={[int((wq==t).sum()) for t in tiers + [512]]}")
