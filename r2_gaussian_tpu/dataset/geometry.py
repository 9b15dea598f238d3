"""Scanner geometry: poses, view and projection matrices.

Host-side (numpy). Conventions follow the reference implementation so that
datasets and trained models are interchangeable:
  - angle2pose: reference r2_gaussian/dataset/dataset_readers.py:156-191
  - projection matrices: reference r2_gaussian/utils/graphics_utils.py:95-142
  - pixel mapping ndc2pix: reference cuda_rasterizer/auxiliary.h:45-48
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

MODE_ID = {"parallel": 0, "cone": 1}

# Near-plane cull threshold used by the rasterizer
# (reference cuda_rasterizer/auxiliary.h in_frustum: p_view.z <= 0.2).
NEAR_Z = 0.2


def angle2pose(DSO: float, angle: float) -> np.ndarray:
    """Camera-to-world transform for a circular scanner trajectory.

    The source sits at (DSO*cos(angle), DSO*sin(angle), 0) and the camera
    frame is built by rotating -90deg about x, +90deg about z, then `angle`
    about z (all fixed axes). Matches reference dataset_readers.py:156-191.
    """
    c, s = np.cos(angle), np.sin(angle)
    rx = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], dtype=np.float64)  # Rx(-90)
    rz90 = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float64)  # Rz(90)
    rza = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float64)
    rot = rza @ rz90 @ rx
    pose = np.eye(4)
    pose[:3, :3] = rot
    pose[:3, 3] = [DSO * c, DSO * s, 0.0]
    return pose


def projection_matrix(fovx: float, fovy: float, mode: int) -> np.ndarray:
    """NDC projection. Identity for parallel beam; OpenGL-style perspective
    with znear=0.01, zfar=100 for cone beam (reference graphics_utils.py:95-142).
    """
    if mode == MODE_ID["parallel"]:
        return np.eye(4)
    if mode == MODE_ID["cone"]:
        znear, zfar = 0.01, 100.0
        th_y = math.tan(fovy / 2)
        th_x = math.tan(fovx / 2)
        top, right = th_y * znear, th_x * znear
        p = np.zeros((4, 4))
        p[0, 0] = znear / right
        p[1, 1] = znear / top
        p[2, 2] = zfar / (zfar - znear)
        p[2, 3] = -(zfar * znear) / (zfar - znear)
        p[3, 2] = 1.0
        return p
    raise ValueError(f"Unsupported mode {mode}")


def fov_from_detector(sDetector, DSD):
    """(FovX, FovY) from detector size. Detector dims are [v, u] ordered
    (reference dataset_readers.py:130-132)."""
    fovx = 2 * np.arctan2(sDetector[1] / 2, DSD)
    fovy = 2 * np.arctan2(sDetector[0] / 2, DSD)
    return float(fovx), float(fovy)


@dataclasses.dataclass
class Cameras:
    """A stacked set of views for one scene (all share H, W, mode).

    Arrays are stacked along the leading view axis so a jitted train step can
    `dynamic_index` a view. w2c/full_proj are plain math-convention matrices
    applied as `p' = M @ [p;1]` (the reference stores them transposed for its
    right-multiplying GLM kernels; we do not).
    """

    w2c: np.ndarray  # [V, 4, 4] world -> camera
    full_proj: np.ndarray  # [V, 4, 4] proj @ w2c
    cam_center: np.ndarray  # [V, 3]
    angles: np.ndarray  # [V]
    images: np.ndarray  # [V, H, W] measured projections
    image_names: list
    mode: int
    height: int
    width: int
    tanfovx: float
    tanfovy: float
    FovX: float
    FovY: float

    def __len__(self):
        return self.w2c.shape[0]


def build_cameras(angles, images, image_names, scanner_cfg) -> Cameras:
    mode = MODE_ID[scanner_cfg["mode"]]
    fovx, fovy = fov_from_detector(scanner_cfg["sDetector"], scanner_cfg["DSD"])
    proj = projection_matrix(fovx, fovy, mode)
    w2cs, fulls, centers = [], [], []
    for a in angles:
        c2w = angle2pose(scanner_cfg["DSO"], float(a))
        w2c = np.linalg.inv(c2w)
        w2cs.append(w2c)
        fulls.append(proj @ w2c)
        centers.append(c2w[:3, 3])
    images = np.asarray(images, dtype=np.float32)
    if images.ndim == 2:
        images = images[None]
    # tan fov: mode 0 uses 1.0 so focal = W/2 (reference render_query.py:104-111)
    if mode == MODE_ID["parallel"]:
        tanx = tany = 1.0
    else:
        tanx, tany = math.tan(fovx / 2), math.tan(fovy / 2)
    return Cameras(
        w2c=np.stack(w2cs).astype(np.float32),
        full_proj=np.stack(fulls).astype(np.float32),
        cam_center=np.stack(centers).astype(np.float32),
        angles=np.asarray(angles, dtype=np.float32),
        images=images,
        image_names=list(image_names),
        mode=mode,
        height=int(scanner_cfg["nDetector"][0]),
        width=int(scanner_cfg["nDetector"][1]),
        tanfovx=float(tanx),
        tanfovy=float(tany),
        FovX=fovx,
        FovY=fovy,
    )
