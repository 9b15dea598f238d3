"""Bisect the TPU worker crash: run trainer configs on the real bench case."""
import sys, time, types, traceback
sys.path.insert(0, "/root/repo")
from r2_gaussian_tpu.utils.runtime import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np
from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import create_from_pcd
from r2_gaussian_tpu.pipeline.trainer import Trainer

d = np.load("/root/repo/.bench_data/sl_256_512_25_50000.npz", allow_pickle=True)
projs, angles, scanner, pts = d["projs"], d["angles"], d["scanner"].item(), d["pts"]
cams = build_cameras(angles, projs, [str(i) for i in range(len(angles))], scanner)
sb = (0.001, 1.0)

def mkopt(**kw):
    o = dict(iterations=10**7,
        position_lr_init=2e-4, position_lr_final=2e-5, position_lr_max_steps=30000,
        density_lr_init=1e-2, density_lr_final=1e-3, density_lr_max_steps=30000,
        scaling_lr_init=5e-3, scaling_lr_final=5e-4, scaling_lr_max_steps=30000,
        rotation_lr_init=1e-3, rotation_lr_final=1e-4, rotation_lr_max_steps=30000,
        lambda_dssim=0.25, lambda_tv=0.05, tv_vol_size=32,
        density_min_threshold=1e-5, densification_interval=100, densify_from_iter=500,
        densify_until_iter=0, densify_grad_threshold=5e-5, densify_scale_threshold=0.1,
        max_screen_size=None, max_scale=None, max_num_gaussians=500_000)
    o.update(kw)
    return types.SimpleNamespace(**o)

def run(name, opt, chunk=10, cap=None):
    try:
        params, aux = create_from_pcd(pts[:, :3].astype(np.float32), pts[:, 3], sb,
                                      capacity=cap)
        tr = Trainer(cams, scanner, opt, sb, params, aux, backend="pallas")
        m, _ = tr.run_chunk(chunk); np.asarray(m)
        t0 = time.time(); m, _ = tr.run_chunk(chunk); np.asarray(m)
        print(f"{name:28s} OK {(time.time()-t0)/chunk*1000:7.2f} ms/it "
              f"loss={float(np.asarray(m)[-1,0]):.4f}", flush=True)
        return True
    except Exception as e:
        print(f"{name:28s} FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
        return False

run("full chunk100", mkopt(), chunk=100)
run("full chunk100 cap262k", mkopt(), chunk=100, cap=262_144)
run("l1 only cap262k", mkopt(lambda_dssim=0.0, lambda_tv=0.0), cap=262_144)
