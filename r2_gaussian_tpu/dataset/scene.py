"""Scene: cameras + GT volume + scanner config + save logic
(reference r2_gaussian/dataset/__init__.py)."""

from __future__ import annotations

import os
import os.path as osp

import numpy as np

from .readers import SceneInfo, read_scene


class Scene:
    def __init__(self, source_path: str, model_path: str | None = None,
                 eval_split: bool = True):
        self.source_path = source_path
        self.model_path = model_path
        info: SceneInfo = read_scene(source_path, eval_split)
        self.train_cameras = info.train_cameras
        self.test_cameras = info.test_cameras
        self.vol_gt = info.vol_gt
        self.scanner_cfg = info.scanner_cfg
        self.scene_scale = info.scene_scale
        off = np.asarray(self.scanner_cfg["offOrigin"], np.float64)
        s_vox = np.asarray(self.scanner_cfg["sVoxel"], np.float64)
        self.bbox = np.stack([off - s_vox / 2, off + s_vox / 2])

    def save(self, iteration: int, params, aux, scale_bound, vol_pred=None):
        """Write point_cloud/iteration_N/{point_cloud.pickle, vol_gt.npy,
        vol_pred.npy} (reference dataset/__init__.py:79-93)."""
        from ..models.gaussians import save_point_cloud

        out = osp.join(self.model_path, "point_cloud", f"iteration_{iteration}")
        os.makedirs(out, exist_ok=True)
        save_point_cloud(osp.join(out, "point_cloud.pickle"), params, aux, scale_bound)
        if vol_pred is not None:
            if self.vol_gt is not None:
                np.save(osp.join(out, "vol_gt.npy"), np.asarray(self.vol_gt))
            np.save(osp.join(out, "vol_pred.npy"), np.asarray(vol_pred))
