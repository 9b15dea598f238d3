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
