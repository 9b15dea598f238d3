"""Benchmark: sustained training throughput on the flagship workload.

Measures the full jitted training step (render fwd+bwd via the Pallas
splat-block kernels, SSIM+L1+TV losses, Adam) at reference benchmark scale:
512x512 cone-beam projections, 256^3 scene, mid-training gaussian count.

Prints ONE JSON line. Baseline: the reference trains 30k iterations in
5-15 min on an RTX 3090 (README.md:316) => ~33-100 it/s; vs_baseline is
measured against the midpoint ~50 it/s.
"""

import json
import os.path as osp
import sys
import time
import types

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import numpy as np


def main():
    import jax

    from r2_gaussian_tpu.utils.runtime import setup_jax_cache

    setup_jax_cache()
    import jax.numpy as jnp

    from r2_gaussian_tpu.dataset.geometry import build_cameras
    from r2_gaussian_tpu.models.gaussians import create_from_pcd
    from r2_gaussian_tpu.pipeline.densify import resort_spatial
    from r2_gaussian_tpu.pipeline.trainer import Trainer

    on_tpu = jax.devices()[0].platform == "tpu"
    # benchmark scale (reference default: 512^2 projections, 256^3 volume)
    det = 512 if on_tpu else 64
    n_gauss = 150_000 if on_tpu else 2_000
    n_views = 25
    steps = 300 if on_tpu else 30

    scanner = {
        "mode": "cone", "DSD": 7.0, "DSO": 5.0,
        "nDetector": [det, det], "sDetector": [4.0, 4.0],
        "nVoxel": [256] * 3, "sVoxel": [2.0] * 3,
        "dVoxel": [2.0 / 256] * 3,
        "offOrigin": [0.0, 0.0, 0.0], "offDetector": [0.0, 0.0],
    }
    rng = np.random.default_rng(0)
    angles = np.linspace(0, 2 * np.pi, n_views + 1)[:-1]
    images = np.abs(rng.standard_normal((n_views, det, det))).astype(np.float32)
    cams = build_cameras(angles, images, [str(i) for i in range(n_views)], scanner)

    # mid-training-like gaussian population (clustered, mixed scales)
    xyz = np.clip(rng.standard_normal((n_gauss, 3)) * 0.35, -0.95, 0.95)
    dens = rng.uniform(0.05, 0.5, n_gauss).astype(np.float32)
    scale_bound = (0.0005 * 2.0, 0.5 * 2.0)
    params, aux = create_from_pcd(xyz.astype(np.float32), dens, scale_bound)

    opt = types.SimpleNamespace(
        iterations=10_000_000,
        position_lr_init=2e-4, position_lr_final=2e-5, position_lr_max_steps=30000,
        density_lr_init=1e-2, density_lr_final=1e-3, density_lr_max_steps=30000,
        scaling_lr_init=5e-3, scaling_lr_final=5e-4, scaling_lr_max_steps=30000,
        rotation_lr_init=1e-3, rotation_lr_final=1e-4, rotation_lr_max_steps=30000,
        lambda_dssim=0.25, lambda_tv=0.05, tv_vol_size=32,
        density_min_threshold=1e-5,
        densification_interval=100, densify_from_iter=500, densify_until_iter=0,
        densify_grad_threshold=5e-5, densify_scale_threshold=0.1,
        max_screen_size=None, max_scale=None, max_num_gaussians=500_000,
    )
    trainer = Trainer(cams, scanner, opt, scale_bound, params, aux, backend="auto")
    # spatial sort for kernel block locality (normally done at densify events)
    p, a, x = resort_spatial(trainer.state.params, trainer.state.adam,
                             trainer.state.aux)
    trainer.state = trainer.state._replace(params=p, adam=a, aux=x)

    # warmup (compile)
    trainer.run_chunk(min(steps, 100))
    t0 = time.time()
    done = 0
    while done < steps:
        k = min(100, steps - done)
        metrics, _ = trainer.run_chunk(k)
        done += k
    np.asarray(metrics)  # sync
    dt = time.time() - t0
    its = steps / dt

    result = {
        "metric": "train_iters_per_sec",
        "value": round(its, 2),
        "unit": "it/s",
        "vs_baseline": round(its / 50.0, 3),
        "detail": {
            "n_gaussians": n_gauss,
            "detector": det,
            "platform": jax.devices()[0].platform,
            "projected_time_to_30k_min": round(30000 / its / 60, 2),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
