"""Export a trained gaussian model as an ellipsoid mesh (binary PLY).

Headless equivalent of the reference's interactive open3d ellipsoid viewer
(r2_gaussian/utils/plot_utils.py:18-98): open the PLY in MeshLab, Blender,
or 3D Slicer. Usage:

    python scripts/export_ellipsoids.py --model_path <dir> [--iteration -1]
        [--output gaussians.ply] [--max_gaussians 20000] [--sigma 1.0]
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

from r2_gaussian_tpu.models.gaussians import activate, load_point_cloud
from r2_gaussian_tpu.utils.plot_utils import export_ellipsoids_ply


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--max_gaussians", type=int, default=20000)
    p.add_argument("--sigma", type=float, default=1.0,
                   help="ellipsoid radius in standard deviations")
    args = p.parse_args()

    pc_dir = osp.join(args.model_path, "point_cloud")
    it = args.iteration
    if it == -1:
        it = max(int(d.split("_")[-1]) for d in os.listdir(pc_dir)
                 if d.startswith("iteration_"))
    pc_path = osp.join(pc_dir, f"iteration_{it}", "point_cloud.pickle")
    params, aux, scale_bound = load_point_cloud(pc_path)
    xyz, scales, rots, dens = activate(
        params, None if scale_bound is None else tuple(scale_bound))
    out = args.output or osp.join(args.model_path, f"gaussians_{it}.ply")
    nv, nf = export_ellipsoids_ply(
        out, np.asarray(xyz), np.asarray(scales), np.asarray(rots),
        np.asarray(dens), active=np.asarray(aux.active),
        max_gaussians=args.max_gaussians, sigma=args.sigma)
    print(f"Wrote {out} ({nv} vertices, {nf} faces)")


if __name__ == "__main__":
    main()
