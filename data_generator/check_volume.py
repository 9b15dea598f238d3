"""Dataset sanity check: load a ground-truth volume and write a slice-grid
PNG (headless equivalent of the reference's data_generator/check_volume.py,
which opens an interactive pyvista volume render — no display exists here;
for a real 3D view use scripts/plot_volume.py or the exported PLY from
scripts/export_ellipsoids.py).

Usage: python data_generator/check_volume.py <vol.npy | case_dir> [out.png]
"""

import json
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from r2_gaussian_tpu.utils.plot_utils import save_slice_grid


def main():
    path = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "check_volume.png"
    if osp.isdir(path):
        with open(osp.join(path, "meta_data.json")) as f:
            meta = json.load(f)
        path = osp.join(path, meta["vol"])
    vol = np.load(path)
    print(f"volume {vol.shape}, range [{vol.min():.4f}, {vol.max():.4f}], "
          f"finite={np.isfinite(vol).all()}")
    for axis in range(3):
        base, ext = osp.splitext(out)
        p = out if axis == 2 else f"{base}_ax{axis}{ext}"
        save_slice_grid(p, vol, n_slices=6, axis=axis)
        print(f"axis-{axis} slice grid written to {p}")


if __name__ == "__main__":
    main()
