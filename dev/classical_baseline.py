"""PSNR3D of classical recon (FDK, SART) on the bench case for context."""
import sys
sys.path.insert(0, "/root/repo")
from r2_gaussian_tpu.utils.runtime import setup_jax_cache
setup_jax_cache()
import jax.numpy as jnp
import numpy as np
from r2_gaussian_tpu.ops.classical import recon_volume
from r2_gaussian_tpu.ops.projector import project
from r2_gaussian_tpu.utils.metrics import metric_vol_psnr

d = np.load("/root/repo/.bench_data/sl_256_512_25_50000.npz", allow_pickle=True)
vol_gt, projs, angles, scanner = (d["vol"], d["projs"], d["angles"],
                                  d["scanner"].item())
clean = np.asarray(project(jnp.asarray(vol_gt), angles, scanner))
for name, p in (("noisy", projs), ("clean", clean)):
    v = np.asarray(recon_volume(p, angles, scanner, method="fdk"))
    print(f"fdk {name}: psnr3d={metric_vol_psnr(vol_gt, v):.2f}", flush=True)
v = np.asarray(recon_volume(clean, angles, scanner, method="sart", n_iter=15))
print(f"sart clean: psnr3d={metric_vol_psnr(vol_gt, v):.2f}", flush=True)
