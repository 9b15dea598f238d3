"""Dataset sanity check: load a case's training projections and write a
slice-grid PNG (headless equivalent of the reference's
data_generator/check_proj.py, which opens an interactive matplotlib viewer
via show_one_volume — no display exists here, so the grid goes to a file).

Usage: python data_generator/check_proj.py <case_or_proj_dir> [out.png]
Accepts either a case dir (meta_data.json; uses its train split) or a bare
dir of .npy projections (the reference's layout)."""

import json
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from r2_gaussian_tpu.utils.plot_utils import save_slice_grid


def load_projs(path):
    meta_path = osp.join(path, "meta_data.json")
    if osp.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        files = [osp.join(path, fr["file_path"]) for fr in meta["proj_train"]]
    else:
        files = [osp.join(path, n) for n in sorted(os.listdir(path))
                 if n.endswith(".npy")]
    if not files:
        raise ValueError(f"no projections found under {path}")
    return np.stack([np.load(f) for f in files], axis=-1)


def main():
    path = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "check_proj.png"
    projs = load_projs(path)
    print(f"{projs.shape[-1]} projections of {projs.shape[:2]}, "
          f"range [{projs.min():.4f}, {projs.max():.4f}], "
          f"finite={np.isfinite(projs).all()}")
    save_slice_grid(out, projs, n_slices=min(12, projs.shape[-1]), axis=2)
    print(f"slice grid written to {out}")


if __name__ == "__main__":
    main()
