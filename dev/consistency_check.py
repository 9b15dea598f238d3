"""Consistency: render(gaussians) must match project(voxelize(gaussians)).

If the gaussian X-ray renderer and the ray-driven projector (used for
synthetic datagen + FDK adjoint) disagree geometrically or in scale,
training fits inconsistent data and 3D PSNR degrades while 2D loss falls.
CPU, dense backend, coarse grids."""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.render import render, query
from r2_gaussian_tpu.ops.projector import project

det, nvox = 64, 64
for mode in ("cone", "parallel"):
    scanner = {"mode": mode, "DSD": 7.0, "DSO": 5.0,
               "nDetector": [det, det],
               "sDetector": [4.0, 4.0] if mode == "cone" else [2.0, 2.0],
               "nVoxel": [nvox]*3, "sVoxel": [2.0]*3, "dVoxel": [2.0/nvox]*3,
               "offOrigin": [0.,0.,0.], "offDetector": [0.,0.], "accuracy": 0.5}
    rng = np.random.default_rng(0)
    n = 40
    xyz = jnp.asarray(rng.uniform(-0.5, 0.5, (n,3)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.04, 0.09, (n,3)).astype(np.float32))
    rots = rng.standard_normal((n,4)).astype(np.float32)
    rots = jnp.asarray(rots/np.linalg.norm(rots,axis=1,keepdims=True))
    dens = jnp.asarray(rng.uniform(0.3, 1.0, n).astype(np.float32))

    vol = query(xyz, scales, rots, dens, center=(0.,0.,0.), n_voxel=(nvox,)*3,
                s_voxel=(2.,2.,2.), backend="dense")["vol"]
    angles = np.array([0.0, 0.9, 2.3])
    projs_vol = np.asarray(project(np.asarray(vol), angles, scanner))

    cams = build_cameras(angles, projs_vol, ["a","b","c"], scanner)
    for vi in range(3):
        img = np.asarray(render(
            xyz, scales, rots, dens, w2c=jnp.asarray(cams.w2c[vi]),
            full_proj=jnp.asarray(cams.full_proj[vi]), width=det, height=det,
            tanfovx=cams.tanfovx, tanfovy=cams.tanfovy, mode=cams.mode,
            backend="dense", footprint="tight")["render"])
        ref = projs_vol[vi]
        denom = max(ref.max(), 1e-9)
        err = np.abs(img - ref).max() / denom
        # correlation + scale
        a, b = img.ravel(), ref.ravel()
        corr = float(np.corrcoef(a, b)[0, 1])
        scale = float(a.sum() / max(b.sum(), 1e-9))
        print(f"{mode} view{vi}: maxrelerr={err:.3f} corr={corr:.5f} "
              f"masssum_ratio={scale:.4f}", flush=True)
