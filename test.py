"""Offline evaluation CLI (reference test.py equivalent).

Loads a trained model dir (merging CLI args over saved cfg_args), renders
train/test projections (saved as png+npy), evaluates 2D metrics, queries the
full volume, evaluates 3D metrics, saves volume slices and npy/nii.gz
exports, and writes YAML metric reports.
"""

import os
import os.path as osp
import sys
import time
from argparse import ArgumentParser

import numpy as np

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import jax

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()
import yaml

from r2_gaussian_tpu.dataset.scene import Scene
from r2_gaussian_tpu.models.gaussians import activate, load_point_cloud
from r2_gaussian_tpu.models.render import query_volume
from r2_gaussian_tpu.pipeline.config import (
    ModelParams,
    PipelineParams,
    get_combined_args,
)
from r2_gaussian_tpu.utils.metrics import (metric_proj, metric_vol_psnr,
                                           metric_vol_psnr_masked,
                                           metric_vol_ssim)


def search_max_iteration(pc_dir: str) -> int:
    iters = [
        int(d.split("_")[-1])
        for d in os.listdir(pc_dir)
        if d.startswith("iteration_")
    ]
    return max(iters)


def save_image(path, arr, vmin=None, vmax=None):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(path, arr, cmap="gray", vmin=vmin, vmax=vmax)
    except ImportError:
        pass


def evaluate_render(name, cams, xyz, scales, rots, dens, active, out_dir,
                    backend):
    """Renders every view in chunked multi-view dispatches (one lax.scan
    dispatch per 25 views — the old per-view dispatch paid ~100 host syncs
    for the reference's test protocol); png+npy writes then run on a thread
    pool (reference test.py:190-212 multithread_write)."""
    import concurrent.futures as cf

    from r2_gaussian_tpu.models.render import render_views

    os.makedirs(out_dir, exist_ok=True)

    def write_one(stem, img):
        np.save(stem + ".npy", img)
        save_image(stem + ".png", img)

    t0 = time.time()
    imgs = render_views(xyz, scales, rots, dens, cams, active=active,
                        backend=backend)
    t_render = time.time() - t0
    with cf.ThreadPoolExecutor(max_workers=4) as pool:
        futures = [
            pool.submit(write_one, osp.join(out_dir, f"{cams.image_names[i]}"),
                        imgs[i])
            for i in range(len(cams))
        ]
        for i, fut in enumerate(futures):
            try:
                fut.result()
            except Exception as e:  # noqa: BLE001 — per-image retry once
                print(f"write retry for view {i}: {e}")
                write_one(osp.join(out_dir, f"{cams.image_names[i]}"), imgs[i])
    m = metric_proj(cams.images, imgs)
    with open(osp.join(osp.dirname(out_dir), f"eval2d_{name}.yml"), "w") as f:
        yaml.dump(
            {"psnr_2d": m["psnr_2d"], "ssim_2d": m["ssim_2d"],
             "psnr_2d_projs": m["psnr_2d_projs"], "ssim_2d_projs": m["ssim_2d_projs"]},
            f, default_flow_style=False, sort_keys=False,
        )
    print(f"{name}: psnr2d {m['psnr_2d']:.3f}, ssim2d {m['ssim_2d']:.3f} "
          f"({len(cams)} views rendered in {t_render:.2f}s incl. compile)")
    return m


def evaluate_volume(scene, xyz, scales, rots, dens, active, out_dir, backend):
    os.makedirs(out_dir, exist_ok=True)
    cfg = scene.scanner_cfg
    vol_pred = np.asarray(query_volume(
        xyz, scales, rots, dens,
        center=cfg["offOrigin"], n_voxel=tuple(int(v) for v in cfg["nVoxel"]),
        s_voxel=cfg["sVoxel"], active=active, backend=backend,
    ))
    np.save(osp.join(out_dir, "vol_pred.npy"), vol_pred)
    # .nii.gz export for 3D Slicer (reference test.py:140-148); built-in
    # NIfTI-1 writer, no SimpleITK needed.
    from r2_gaussian_tpu.utils.nifti import write_nifti

    d_voxel = [float(s) / int(n) for s, n in zip(cfg["sVoxel"], cfg["nVoxel"])]
    write_nifti(osp.join(out_dir, "vol_pred.nii.gz"), vol_pred, spacing=d_voxel)
    report = {}
    if scene.vol_gt is not None:
        np.save(osp.join(out_dir, "vol_gt.npy"), np.asarray(scene.vol_gt))
        psnr_3d = metric_vol_psnr(scene.vol_gt, vol_pred)
        ssim_3d, ssim_ax = metric_vol_ssim(scene.vol_gt, vol_pred)
        # ROI metric: PSNR on the dilated GT object support. Separates model
        # error from the background streak/noise floor when the GT is an
        # FDK pseudo-GT (real-data protocol) — see metric_vol_psnr_masked.
        psnr_3d_roi, roi_frac = metric_vol_psnr_masked(scene.vol_gt, vol_pred)
        report = {"psnr_3d": psnr_3d, "ssim_3d": ssim_3d,
                  "ssim_3d_x": ssim_ax[0], "ssim_3d_y": ssim_ax[1],
                  "ssim_3d_z": ssim_ax[2],
                  "psnr_3d_roi": psnr_3d_roi, "roi_fraction": roi_frac}
        with open(osp.join(osp.dirname(out_dir), "eval3d.yml"), "w") as f:
            yaml.dump(report, f, default_flow_style=False, sort_keys=False)
        print(f"volume: psnr3d {psnr_3d:.3f}, ssim3d {ssim_3d:.3f}")
        slice_dir = osp.join(out_dir, "slices")
        os.makedirs(slice_dir, exist_ok=True)
        gt = np.asarray(scene.vol_gt)
        for i in np.linspace(0, vol_pred.shape[2] - 1, 7).astype(int):
            save_image(osp.join(slice_dir, f"slice_{i:03d}_pred.png"), vol_pred[..., i],
                       vmin=float(gt[..., i].min()), vmax=float(gt[..., i].max()))
            save_image(osp.join(slice_dir, f"slice_{i:03d}_gt.png"), gt[..., i])
    return report


def main():
    parser = ArgumentParser(description="Testing script parameters")
    lp = ModelParams(parser, sentinel=True)
    pp = PipelineParams(parser)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_render_train", action="store_true")
    parser.add_argument("--skip_render_test", action="store_true")
    # reference test.py:224: skip the full-volume reconstruction eval
    parser.add_argument("--skip_recon", action="store_true")
    args = get_combined_args(parser)
    model = lp.extract(args)
    pipe = pp.extract(args)

    scene = Scene(model.source_path, model.model_path, eval_split=model.eval)
    it = args.iteration
    pc_dir = osp.join(model.model_path, "point_cloud")
    if it == -1:
        it = search_max_iteration(pc_dir)
    pc_path = osp.join(pc_dir, f"iteration_{it}", "point_cloud.pickle")
    params, aux, scale_bound = load_point_cloud(pc_path)
    print(f"Loaded {pc_path} ({int(np.asarray(aux.active).sum())} gaussians)")
    xyz, scales, rots, dens = activate(params, None if scale_bound is None else tuple(scale_bound))

    out_base = osp.join(model.model_path, "test", f"iter_{it:06d}")
    backend = pipe.backend
    if not args.skip_render_train and scene.train_cameras is not None:
        evaluate_render("render_train", scene.train_cameras, xyz,
                        scales, rots, dens, aux.active,
                        osp.join(out_base, "render_train"), backend)
    if not args.skip_render_test and scene.test_cameras is not None:
        evaluate_render("render_test", scene.test_cameras, xyz,
                        scales, rots, dens, aux.active,
                        osp.join(out_base, "render_test"), backend)
    if not args.skip_recon:
        evaluate_volume(scene, xyz, scales, rots, dens, aux.active,
                        osp.join(out_base, "volume"), backend)


if __name__ == "__main__":
    main()
