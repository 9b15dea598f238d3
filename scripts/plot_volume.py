"""Volume visualization CLI (reference scripts/plot_volume.py).

The reference renders with pyvista (GPU, interactive); this environment is
headless, so we render maximum-intensity projections along the three axes
plus a slice grid to a png.
"""

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()

from r2_gaussian_tpu.utils.plot_utils import save_slice_grid


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--vol", type=str, required=True, help=".npy volume")
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--n_slices", type=int, default=8)
    args = parser.parse_args()

    vol = np.load(args.vol)
    out = args.output or args.vol.rsplit(".", 1)[0] + ".png"

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(10, 3.4))
    for ax, axis in zip(axes, range(3)):
        ax.imshow(vol.max(axis=axis), cmap="gray")
        ax.set_title(f"MIP axis {axis}", fontsize=9)
        ax.axis("off")
    fig.tight_layout()
    mip_path = out.rsplit(".", 1)[0] + "_mip.png"
    fig.savefig(mip_path, dpi=120)
    plt.close(fig)
    save_slice_grid(out, vol, n_slices=args.n_slices, axis=2)
    print(f"Wrote {mip_path} and {out}")


if __name__ == "__main__":
    main()
