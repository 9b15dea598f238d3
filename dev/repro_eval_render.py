"""Repro/regression probe for the batched eval render on real TPU.

Compiles and runs the exact program that OOM'd scoped VMEM on v5e
(jit(_render_views_jit): lax.scan over a view chunk at 512^2 around the
splat2d pallas kernel, models/render.py). Run solo under the TPU advisory
lock:

    flock .bench_data/tpu.lock timeout 900 python dev/repro_eval_render.py

Prints one OK line with the wall time per view on success; any compile-side
scoped-vmem OOM raises out of render_views.
"""
import sys, time

sys.path.insert(0, "/root/repo")
from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()
import numpy as np

from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import activate, create_from_pcd
from r2_gaussian_tpu.models.render import render_views

d = np.load("/root/repo/.bench_data/slb_256_512_25_50000.npz", allow_pickle=True)
projs, angles, scanner, pts = d["projs"], d["angles"], d["scanner"].item(), d["pts"]
cams = build_cameras(angles, projs, [str(i) for i in range(len(angles))], scanner)
vol_to_world = float(max(scanner["sVoxel"]))
sb = (0.0005 * vol_to_world, 0.5 * vol_to_world)
params, aux = create_from_pcd(pts[:, :3].astype(np.float32), pts[:, 3], sb,
                              capacity=262_144)
xyz, scales, rots, dens = activate(params, sb)

t0 = time.time()
imgs = render_views(xyz, scales, rots, dens, cams, active=aux.active,
                    backend="pallas")
compile_and_run = time.time() - t0
t0 = time.time()
imgs = render_views(xyz, scales, rots, dens, cams, active=aux.active,
                    backend="pallas")
warm = time.time() - t0
assert np.all(np.isfinite(imgs)), "non-finite render"
print(f"OK views={imgs.shape} cold={compile_and_run:.1f}s "
      f"warm={warm:.2f}s ({warm / len(cams) * 1e3:.1f} ms/view)")
