"""Visualization helpers (reference utils/plot_utils.py equivalents).

The reference relies on open3d/pyvista for interactive 3D viewers; this
environment is headless so those entry points are gated. The TB image
panels (gt/pred/diff slices) are matplotlib-rendered to numpy arrays.
"""

from __future__ import annotations

import numpy as np


def show_two_slice(gt, pred, title1="gt", title2="pred", vmin=None, vmax=None,
                   save=True):
    """Render a (gt | pred | diff) panel to a numpy RGB image for
    TensorBoard (reference plot_utils.py show_two_slice)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return np.zeros((4, 4, 3), np.uint8)

    gt = np.asarray(gt)
    pred = np.asarray(pred)
    fig, axes = plt.subplots(1, 3, figsize=(9, 3.2))
    for ax, img, title in zip(
        axes, [gt, pred, gt - pred], [title1, title2, "diff"]
    ):
        kw = {}
        if title != "diff" and vmin is not None:
            kw = {"vmin": float(vmin), "vmax": float(vmax)}
        im = ax.imshow(img, cmap="gray" if title != "diff" else "bwr", **kw)
        ax.set_title(title, fontsize=8)
        ax.axis("off")
        fig.colorbar(im, ax=ax, fraction=0.045)
    fig.tight_layout()
    fig.canvas.draw()
    out = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return out


def save_slice_grid(path, vol, n_slices=6, axis=2):
    """Save a grid of volume slices as one png."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    vol = np.asarray(vol)
    idx = np.linspace(0, vol.shape[axis] - 1, n_slices).astype(int)
    fig, axes = plt.subplots(1, n_slices, figsize=(2.2 * n_slices, 2.4))
    for ax, i in zip(np.atleast_1d(axes), idx):
        sl = np.take(vol, i, axis=axis)
        ax.imshow(sl, cmap="gray")
        ax.set_title(f"{i}", fontsize=7)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def show_one_volume(vol):  # pragma: no cover - interactive in the reference
    """Interactive volume browser placeholder (reference uses matplotlib
    sliders / open3d; headless here)."""
    print("show_one_volume: headless environment; use save_slice_grid instead")


def show_two_volume(v1, v2, title1="a", title2="b"):  # pragma: no cover
    print("show_two_volume: headless environment; use save_slice_grid instead")


def export_ellipsoids_ply(path, xyz, scales, rotations, densities,
                          active=None, max_gaussians=20000, subdiv=1,
                          sigma=1.0):
    """Export the gaussian cloud as an ellipsoid mesh in binary PLY.

    Headless stand-in for the reference's interactive open3d ellipsoid
    viewer (plot_utils.py:18-98): each gaussian becomes an icosphere scaled
    by sigma * S and rotated by R, with a per-vertex grayscale color from
    its (normalized) density. Viewable in MeshLab / Blender / 3D Slicer.
    Inputs are ACTIVATED parameters ([N,3] xyz, [N,3] scales, [N,4] unit
    quaternions wxyz, [N] or [N,1] densities).
    """
    import struct

    xyz = np.asarray(xyz, np.float32)
    scales = np.asarray(scales, np.float32)
    rots = np.asarray(rotations, np.float32)
    dens = np.asarray(densities, np.float32).reshape(-1)
    if active is not None:
        keep = np.asarray(active, bool)
        xyz, scales, rots, dens = xyz[keep], scales[keep], rots[keep], dens[keep]
    n = xyz.shape[0]
    if n > max_gaussians:  # densest first, like the reference's subsample
        idx = np.argsort(-dens)[:max_gaussians]
        xyz, scales, rots, dens = xyz[idx], scales[idx], rots[idx], dens[idx]
        n = max_gaussians

    # unit icosphere
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], np.float32)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], np.int64)
    for _ in range(max(0, subdiv)):
        cache, new_faces = {}, []

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                cache[key] = len(cache) + len(verts_l)
                mids.append((verts_l[a] + verts_l[b]) / 2)
            return cache[key]

        verts_l = [v for v in verts]
        mids = []
        for f in faces:
            a, b, c = (int(v) for v in f)
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.asarray(verts_l + mids, np.float32)
        verts /= np.linalg.norm(verts, axis=1, keepdims=True)
        faces = np.asarray(new_faces, np.int64)

    # per-gaussian rotation matrices from wxyz quaternions
    # (gaussian_utils.py:75-100 convention)
    w, x, y, z = rots[:, 0], rots[:, 1], rots[:, 2], rots[:, 3]
    R = np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=1).reshape(n, 3, 3)
    sv = verts[None, :, :] * (sigma * scales)[:, None, :]  # [n, V, 3]
    world = np.einsum("nij,nvj->nvi", R, sv) + xyz[:, None, :]

    dmax = float(dens.max()) if n else 1.0
    gray = np.clip(dens / max(dmax, 1e-9) * 255.0, 0, 255).astype(np.uint8)
    nv, nf = verts.shape[0], faces.shape[0]
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n * nv}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        f"element face {n * nf}\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    )
    vert_dtype = np.dtype([("p", np.float32, 3), ("c", np.uint8, 3)])
    vbuf = np.empty(n * nv, vert_dtype)
    vbuf["p"] = world.reshape(-1, 3)
    vbuf["c"] = np.repeat(gray, nv)[:, None].repeat(3, axis=1)
    face_dtype = np.dtype([("k", np.uint8), ("v", np.int32, 3)])
    fbuf = np.empty(n * nf, face_dtype)
    fbuf["k"] = 3
    fbuf["v"] = (faces[None, :, :] + (np.arange(n) * nv)[:, None, None]).reshape(-1, 3)
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(vbuf.tobytes())
        f.write(fbuf.tobytes())
    return n * nv, n * nf
