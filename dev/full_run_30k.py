"""Full 30k-iteration training on the bench case (band-limited shepp-logan,
512^2 cone, 25 views, CT noise) with reference-style eval points. Produces
the headline quality + wall-clock record.

2D metric protocol (matches the quality matrix / reference test.py): the
`psnr2d`/`ssim2d` columns score HELD-OUT test projections (clean, fresh
angles — datagen adds CT noise to training projections only, both here and
in the reference generate_data.py:54-69) with the reference's per-slice-max
normalization (image_utils.py:136-183). The against-noisy-training-views
number the old harness reported is kept as `psnr2d_train_noisy` — it is a
different (lower, noise-floored) quantity, not comparable across tables.

Usage: python dev/full_run_30k.py [--preset lrfast] [--tag NAME]
Writes .bench_data/full_run_30k<_tag>.json.
"""
import json
import sys, time, types
sys.path.insert(0, "/root/repo")
from r2_gaussian_tpu.utils.runtime import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np
from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import activate, create_from_pcd
from r2_gaussian_tpu.models.render import query_volume, render
from r2_gaussian_tpu.ops.projector import project
from r2_gaussian_tpu.pipeline.trainer import Trainer
from r2_gaussian_tpu.utils.metrics import (metric_proj, metric_vol_psnr,
                                            metric_vol_ssim)

PRESET = ""
TAG = ""
argv = sys.argv[1:]
while argv:
    a = argv.pop(0)
    if a == "--preset":
        PRESET = argv.pop(0)
    elif a == "--tag":
        TAG = argv.pop(0)

d = np.load("/root/repo/.bench_data/slb_256_512_25_50000.npz", allow_pickle=True)
vol_gt, projs, angles, scanner, pts = (d["vol"], d["projs"], d["angles"],
                                       d["scanner"].item(), d["pts"])
cams = build_cameras(angles, projs, [str(i) for i in range(len(angles))], scanner)
# held-out test views: clean projections at fresh uniformly-random angles
# (reference datagen protocol: test split is noise-free, generate_data.py)
rng = np.random.default_rng(1234)
angles_test = np.sort(rng.uniform(0, 2 * np.pi, 20)).astype(np.float64)
projs_test = np.asarray(project(vol_gt, angles_test, scanner))
cams_test = build_cameras(angles_test, projs_test,
                          [f"t{i}" for i in range(len(angles_test))], scanner)
vol_to_world = float(max(scanner["sVoxel"]))
sb = (0.0005 * vol_to_world, 0.5 * vol_to_world)
params, aux = create_from_pcd(pts[:, :3].astype(np.float32), pts[:, 3], sb,
                              capacity=262_144)
opt_kw = dict(
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
if PRESET == "lrfast":
    opt_kw.update(
        position_lr_final=5e-6, density_lr_final=2e-4, scaling_lr_final=1e-4,
        rotation_lr_final=2e-5,
        position_lr_max_steps=10_000, density_lr_max_steps=10_000,
        scaling_lr_max_steps=10_000, rotation_lr_max_steps=10_000,
        ema_decay=0.999,
    )
elif PRESET:
    raise SystemExit(f"unknown preset {PRESET!r}")
opt = types.SimpleNamespace(**opt_kw)
trainer = Trainer(cams, scanner, opt, sb, params, aux, backend="pallas")


def eval3d():
    xyz, scales, rots, dens = activate(trainer.eval_params, sb)
    vol = np.asarray(query_volume(
        xyz, scales, rots, dens, center=scanner["offOrigin"],
        n_voxel=tuple(int(v) for v in scanner["nVoxel"]),
        s_voxel=scanner["sVoxel"], active=trainer.state.aux.active,
        backend="pallas"))
    psnr = metric_vol_psnr(vol_gt, vol)
    ssim, _ = metric_vol_ssim(vol_gt, vol)
    return float(psnr), float(ssim)


def eval2d(cs, gt_projs, stride=1):
    xyz, scales, rots, dens = activate(trainer.eval_params, sb)
    ps, ss = [], []
    for vi in range(0, len(cs), stride):
        img = render(xyz, scales, rots, dens, w2c=jnp.asarray(cs.w2c[vi]),
                     full_proj=jnp.asarray(cs.full_proj[vi]),
                     width=cs.width, height=cs.height, tanfovx=cs.tanfovx,
                     tanfovy=cs.tanfovy, mode=cs.mode,
                     active=trainer.state.aux.active, backend="pallas")["render"]
        m = metric_proj(np.asarray(gt_projs[vi])[None], np.asarray(img)[None])
        ps.append(m["psnr_2d"]); ss.append(m["ssim_2d"])
    return float(np.mean(ps)), float(np.mean(ss))


t0 = time.time()
eval_s = 0.0  # checkpoint evals are not training time; report both clocks
record = []
for target in (1, 5000, 10000, 20000, 30000):
    while trainer.iteration < target:
        m, _ = trainer.run_chunk(min(100, target - trainer.iteration))
    wall = time.time() - t0
    te = time.time()
    p3, s3 = eval3d()
    p2, s2 = eval2d(cams_test, projs_test)
    p2n, _ = eval2d(cams, projs, stride=5)
    n = int(np.asarray(trainer.state.aux.n_active))
    row = dict(iter=target, wall_s=round(wall, 1),
               train_s=round(wall - eval_s, 1), psnr3d=round(p3, 2),
               ssim3d=round(s3, 4), psnr2d=round(p2, 2), ssim2d=round(s2, 4),
               psnr2d_train_noisy=round(p2n, 2), n=n)
    eval_s += time.time() - te
    record.append(row)
    print(json.dumps(row), flush=True)
print("final wall", round(time.time() - t0, 1), "s; eval overhead",
      round(eval_s, 1), "s")
suffix = f"_{TAG}" if TAG else ""
with open(f"/root/repo/.bench_data/full_run_30k{suffix}.json", "w") as f:
    json.dump({"preset": PRESET or "default", "rows": record,
               "eval_overhead_s": round(eval_s, 1)}, f, indent=1)
