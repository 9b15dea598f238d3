"""Scene readers: Blender-style meta_data.json and NAF pickle formats.

Faithful to the reference's conventions (r2_gaussian/dataset/dataset_readers.py):
  - the scene is rescaled so the volume of interest spans [-1,1]^3
    (scene_scale = 2/max(sVoxel)); the scale is applied to 8 geometry keys
    AND to projection pixel values (line integrals scale with length),
  - NAF scanners are in mm while projections are in m -> /1000,
  - detector dims are [v, u] ordered.
"""

from __future__ import annotations

import dataclasses
import json
import os.path as osp
import pickle

import numpy as np

from .geometry import Cameras, build_cameras

_SCALE_KEYS = [
    "dVoxel",
    "sVoxel",
    "sDetector",
    "dDetector",
    "offOrigin",
    "offDetector",
    "DSD",
    "DSO",
]


@dataclasses.dataclass
class SceneInfo:
    train_cameras: Cameras
    test_cameras: Cameras | None
    vol_gt: np.ndarray | None  # [X, Y, Z]
    scanner_cfg: dict
    scene_scale: float


def _rescale_scanner(scanner_cfg: dict) -> float:
    scene_scale = 2.0 / max(np.atleast_1d(scanner_cfg["sVoxel"]))
    for key in _SCALE_KEYS:
        scanner_cfg[key] = (np.array(scanner_cfg[key], dtype=np.float64) * scene_scale).tolist()
    return float(scene_scale)


def read_blender_scene(path: str, eval_split: bool = True) -> SceneInfo:
    """Read a meta_data.json scene (reference dataset_readers.py:43-90)."""
    with open(osp.join(path, "meta_data.json")) as f:
        meta = json.load(f)
    scanner = meta["scanner"]
    if "dVoxel" not in scanner:
        scanner["dVoxel"] = (
            np.array(scanner["sVoxel"]) / np.array(scanner["nVoxel"])
        ).tolist()
    if "dDetector" not in scanner:
        scanner["dDetector"] = (
            np.array(scanner["sDetector"]) / np.array(scanner["nDetector"])
        ).tolist()
    scene_scale = _rescale_scanner(scanner)

    def load_split(split):
        frames = meta.get("proj_" + split, [])
        if not frames:
            return None
        angles, images, names = [], [], []
        for fr in frames:
            angles.append(fr["angle"])
            img_path = osp.join(path, fr["file_path"])
            images.append(np.load(img_path).astype(np.float32) * scene_scale)
            names.append(osp.basename(fr["file_path"]).split(".")[0])
        return build_cameras(angles, np.stack(images), names, scanner)

    train = load_split("train")
    test = load_split("test") if eval_split else None
    vol = None
    if "vol" in meta:
        vol_path = osp.join(path, meta["vol"])
        if osp.exists(vol_path):
            vol = np.load(vol_path).astype(np.float32)
    return SceneInfo(train, test, vol, scanner, scene_scale)


def read_naf_scene(path: str, eval_split: bool = True) -> SceneInfo:
    """Read a NAF/SAX-NeRF pickle scene (reference dataset_readers.py:194-308).

    NAF stores scanner geometry in mm and projections in m -> /1000 on all
    geometry keys before the [-1,1]^3 rescale.
    """
    with open(path, "rb") as f:
        data = pickle.load(f)
    mm = 1000.0
    scanner = {
        "DSD": data["DSD"] / mm,
        "DSO": data["DSO"] / mm,
        "nVoxel": list(data["nVoxel"]),
        "dVoxel": (np.array(data["dVoxel"]) / mm).tolist(),
        "sVoxel": (np.array(data["nVoxel"]) * np.array(data["dVoxel"]) / mm).tolist(),
        "nDetector": list(data["nDetector"]),
        "dDetector": (np.array(data["dDetector"]) / mm).tolist(),
        "sDetector": (
            np.array(data["nDetector"]) * np.array(data["dDetector"]) / mm
        ).tolist(),
        "offOrigin": (np.array(data["offOrigin"]) / mm).tolist(),
        "offDetector": (np.array(data["offDetector"]) / mm).tolist(),
        "totalAngle": data["totalAngle"],
        "startAngle": data["startAngle"],
        "accuracy": data["accuracy"],
        "mode": data["mode"],
        "filter": None,
    }
    scene_scale = _rescale_scanner(scanner)

    def load_split(split, n, uid_offset):
        key = split
        if split == "test":
            key = "val" if "val" in data else "test"
        if key not in data or n == 0:
            return None
        angles = np.asarray(data[key]["angles"][:n])
        projs = np.asarray(data[key]["projections"][:n], dtype=np.float32) * scene_scale
        names = [f"{i + uid_offset:04d}" for i in range(n)]
        return build_cameras(angles, projs, names, scanner)

    n_train = int(data["numTrain"])
    n_val = int(data["numVal"])
    train = load_split("train", n_train, 0)
    test = load_split("test", n_val, n_train) if eval_split else None
    vol = np.asarray(data["image"], dtype=np.float32) if "image" in data else None
    return SceneInfo(train, test, vol, scanner, scene_scale)


def read_scene(source_path: str, eval_split: bool = True) -> SceneInfo:
    if osp.exists(osp.join(source_path, "meta_data.json")):
        return read_blender_scene(source_path, eval_split)
    if source_path.split(".")[-1] in ("pickle", "pkl"):
        return read_naf_scene(source_path, eval_split)
    raise ValueError(f"Could not recognize scene type: {source_path}")
