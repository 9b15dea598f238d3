"""Point-cloud initialization CLI (reference initialize_pcd.py equivalent).

Reconstructs a rough volume with JAX FDK (instead of TIGRE), thresholds it,
uniformly samples n_points voxels, rescales densities, and writes the
[N, 4] (xyz + density) .npy the training CLI consumes. Also supports a
random initialization and an optional 3D-PSNR evaluation of the init.
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from r2_gaussian_tpu.dataset.scene import Scene
from r2_gaussian_tpu.ops.fdk import fdk
from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()


def init_pcd(projs, angles, scanner_cfg, recon_method="fdk", n_points=50000,
             density_thresh=0.05, density_rescale=0.15, random_density_max=1.0,
             seed=0):
    """Sample an [N,4] point cloud (reference initialize_pcd.py:36-89)."""
    rng = np.random.default_rng(seed)
    if recon_method == "random":
        pos = np.asarray(scanner_cfg["offOrigin"])[None] + np.asarray(
            scanner_cfg["sVoxel"]
        )[None] * (rng.random((n_points, 3)) - 0.5)
        dens = rng.random(n_points) * random_density_max
        return np.concatenate([pos, dens[:, None]], axis=-1).astype(np.float32)
    if recon_method != "fdk":
        raise ValueError("--recon_method must be fdk or random")
    vol = np.asarray(fdk(projs, angles, scanner_cfg))
    mask = vol > density_thresh
    idx = np.argwhere(mask)
    assert idx.shape[0] >= n_points, (
        "Valid voxels less than target number of sampling. Check threshold"
    )
    pick = idx[rng.choice(len(idx), n_points, replace=False)]
    d_vox = np.asarray(scanner_cfg["dVoxel"])
    s_vox = np.asarray(scanner_cfg["sVoxel"])
    off = np.asarray(scanner_cfg["offOrigin"])
    pos = pick * d_vox - s_vox / 2 + off
    dens = vol[pick[:, 0], pick[:, 1], pick[:, 2]] * density_rescale
    return np.concatenate([pos, dens[:, None]], axis=-1).astype(np.float32)


def default_init_path(data_path: str) -> str:
    if osp.exists(osp.join(data_path, "meta_data.json")):
        return osp.join(data_path, "init_" + osp.basename(osp.normpath(data_path)) + ".npy")
    if data_path.split(".")[-1] in ("pickle", "pkl"):
        return osp.join(
            osp.dirname(data_path),
            "init_" + osp.basename(data_path).split(".")[0] + ".npy",
        )
    raise ValueError(f"Could not recognize scene type: {data_path}")


def main():
    parser = argparse.ArgumentParser(description="Generate initialization parameters")
    parser.add_argument("--data", type=str, required=True)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--recon_method", type=str, default="fdk",
                        choices=["fdk", "random"])
    parser.add_argument("--n_points", type=int, default=50000)
    parser.add_argument("--density_thresh", type=float, default=0.05)
    parser.add_argument("--density_rescale", type=float, default=0.15)
    parser.add_argument("--random_density_max", type=float, default=1.0)
    parser.add_argument("--evaluate", action="store_true", default=False)
    parser.add_argument("--scale_min", type=float, default=0.0005)
    parser.add_argument("--scale_max", type=float, default=0.5)
    args = parser.parse_args()

    scene = Scene(args.data, eval_split=False)
    cams = scene.train_cameras
    save_path = args.output or default_init_path(args.data)
    assert not osp.exists(save_path), (
        f"Initialization file {save_path} exists! Delete it first."
    )

    out = init_pcd(
        cams.images, cams.angles, scene.scanner_cfg,
        recon_method=args.recon_method, n_points=args.n_points,
        density_thresh=args.density_thresh, density_rescale=args.density_rescale,
        random_density_max=args.random_density_max,
    )
    os.makedirs(osp.dirname(osp.abspath(save_path)), exist_ok=True)
    np.save(save_path, out)
    print(f"Initialization saved in {save_path}.")

    if args.evaluate and scene.vol_gt is not None:
        import jax.numpy as jnp

        from r2_gaussian_tpu.models.gaussians import activate, create_from_pcd
        from r2_gaussian_tpu.models.render import query_volume
        from r2_gaussian_tpu.utils.metrics import metric_vol_psnr

        vol_to_world = max(scene.scanner_cfg["sVoxel"])
        scale_bound = None
        if args.scale_min and args.scale_max:
            scale_bound = (args.scale_min * vol_to_world, args.scale_max * vol_to_world)
        params, aux = create_from_pcd(out[:, :3], out[:, 3], scale_bound)
        xyz, scales, rots, dens = activate(params, scale_bound)
        # z-slab-chunked query: the full-volume pallas kernel's 256^3 f32
        # scratch (64 MB) pushed total program vmem past the 128 MB chip
        # budget; query_volume bounds the slab accumulator to 8 MB.
        vol_pred = query_volume(
            xyz, scales, rots, dens,
            center=scene.scanner_cfg["offOrigin"],
            n_voxel=tuple(int(v) for v in scene.scanner_cfg["nVoxel"]),
            s_voxel=scene.scanner_cfg["sVoxel"],
            active=aux.active,
            backend="pallas" if jnp.zeros(1).devices().pop().platform == "tpu" else "dense",
        )
        psnr = metric_vol_psnr(scene.vol_gt, np.asarray(vol_pred))
        print(f"3D PSNR for initial Gaussians: {psnr}")


if __name__ == "__main__":
    main()
