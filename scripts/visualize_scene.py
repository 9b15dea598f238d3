"""Scene geometry visualization CLI (reference scripts/visualize_scene.py).

The reference draws textured camera frusta + a marching-cubes volume mesh in
open3d; headless here, so we plot the scanner geometry (source orbit, camera
positions/orientations, volume bbox) as a matplotlib 3D figure, plus a grid
of the training projections.
"""

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

from r2_gaussian_tpu.dataset.scene import Scene


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, required=True)
    parser.add_argument("--output", type=str, default="scene_vis.png")
    parser.add_argument("--n_proj", type=int, default=8)
    args = parser.parse_args()

    scene = Scene(args.data, eval_split=False)
    cams = scene.train_cameras

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(12, 5))
    ax = fig.add_subplot(1, 2, 1, projection="3d")
    # camera centers: last column of c2w = inverse of w2c
    centers = []
    for w2c in np.asarray(cams.w2c):
        c2w = np.linalg.inv(w2c)
        centers.append(c2w[:3, 3])
    centers = np.stack(centers)
    ax.scatter(*centers.T, s=12, c=np.arange(len(centers)), cmap="viridis",
               label="sources")
    lo, hi = scene.bbox
    # volume bbox wireframe
    for sx in (lo[0], hi[0]):
        for sy in (lo[1], hi[1]):
            ax.plot([sx, sx], [sy, sy], [lo[2], hi[2]], "k-", lw=0.6)
        ax.plot([sx, sx], [lo[1], hi[1]], [lo[2], lo[2]], "k-", lw=0.6)
        ax.plot([sx, sx], [lo[1], hi[1]], [hi[2], hi[2]], "k-", lw=0.6)
    for sz in (lo[2], hi[2]):
        ax.plot([lo[0], hi[0]], [lo[1], lo[1]], [sz, sz], "k-", lw=0.6)
        ax.plot([lo[0], hi[0]], [hi[1], hi[1]], [sz, sz], "k-", lw=0.6)
    ax.set_box_aspect((1, 1, 1))
    ax.set_title(f"{len(centers)} train views, mode={scene.scanner_cfg['mode']}")
    ax.legend()

    ax2 = fig.add_subplot(1, 2, 2)
    n = min(args.n_proj, len(cams))
    imgs = np.asarray(cams.images[:n])
    rows = int(np.ceil(n / 4))
    h, w = imgs.shape[1:]
    panel = np.zeros((rows * h, 4 * w), np.float32)
    for i in range(n):
        r, c = divmod(i, 4)
        panel[r * h:(r + 1) * h, c * w:(c + 1) * w] = imgs[i]
    ax2.imshow(panel, cmap="gray")
    ax2.set_title("train projections")
    ax2.axis("off")
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"Wrote {args.output}")


if __name__ == "__main__":
    main()
