"""Training CLI (reference train.py equivalent).

Same argument surface and output layout: model dir with cfg_args,
point_cloud/iteration_N/point_cloud.pickle (+ vol_gt/vol_pred.npy),
eval/iter_NNNNNN/{eval2d_render_train.yml, eval2d_render_test.yml,
eval3d.yml}, ckpt/chkpntN.pickle, TensorBoard events.

TPU-first differences: iterations run in multi-step XLA dispatches
(pipeline/trainer.py), the rasterizer/voxelizer are Pallas splat-block
kernels on TPU (dense-jnp on CPU), and checkpoints are framework-native
pickles rather than torch .pth.
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
import jax.numpy as jnp
import yaml
from tqdm import tqdm

from r2_gaussian_tpu.dataset.scene import Scene
from r2_gaussian_tpu.models.gaussians import activate, create_from_pcd, load_point_cloud
from r2_gaussian_tpu.models.render import query_volume, render_views
from r2_gaussian_tpu.pipeline.checkpoint import load_checkpoint, save_checkpoint
from r2_gaussian_tpu.pipeline.config import (
    ModelParams,
    OptimizationParams,
    PipelineParams,
    load_yaml_config,
)
from r2_gaussian_tpu.pipeline.trainer import Trainer, TrainState
from r2_gaussian_tpu.pipeline.optim import group_lrs, init_adam
from r2_gaussian_tpu.utils.logging_utils import prepare_output_and_logger
from r2_gaussian_tpu.utils.metrics import metric_proj, metric_vol_psnr, metric_vol_ssim
from r2_gaussian_tpu.utils.plot_utils import show_two_slice


def find_init_file(dataset) -> str:
    """Resolve the initialization point cloud (reference
    gaussian/initialize.py:13-47): --ply_path, else init_<case>.npy."""
    if dataset.ply_path:
        return dataset.ply_path
    src = dataset.source_path
    if osp.exists(osp.join(src, "meta_data.json")):
        return osp.join(src, "init_" + osp.basename(osp.normpath(src)) + ".npy")
    if src.split(".")[-1] in ("pickle", "pkl"):
        return osp.join(
            osp.dirname(src), "init_" + osp.basename(src).split(".")[0] + ".npy"
        )
    raise ValueError(f"Could not recognize scene type: {src}")


def initialize_gaussians(dataset, scale_bound, capacity=None):
    init_path = find_init_file(dataset)
    assert osp.exists(init_path), (
        f"Initialization file {init_path} not found. Run initialize_pcd.py first "
        "(or pass --ply_path)."
    )
    if init_path.endswith(".npy"):
        pts = np.load(init_path)
        return create_from_pcd(pts[:, :3], pts[:, 3], scale_bound,
                               capacity=capacity)
    params, aux, sb = load_point_cloud(init_path)
    return params, aux


def evaluate(trainer, scene, iteration, tb_writer, backend):
    """2D/3D evaluation at test iterations (reference train.py:241-355)."""
    eval_path = osp.join(scene.model_path, "eval", f"iter_{iteration:06d}")
    os.makedirs(eval_path, exist_ok=True)
    # eval_params = Polyak average when --ema_decay > 0, live params otherwise
    xyz, scales, rots, dens = activate(trainer.eval_params, trainer.scale_bound)
    active = trainer.state.aux.active

    results = {}
    for name, cams in [
        ("render_train", scene.train_cameras),
        ("render_test", scene.test_cameras),
    ]:
        if cams is None or len(cams) == 0:
            continue
        # chunked multi-view dispatches; per-split dims come from `cams`
        # itself (no shared closure between splits)
        imgs = render_views(
            xyz, scales, rots, dens, cams, active=active, backend=backend,
        )
        if tb_writer:
            # gt/render/diff panels for ~5 evenly spaced views
            # (reference train.py:258-305)
            show_idx = np.linspace(0, len(cams), 7).astype(int)[1:-1]
            panels = [
                show_two_slice(
                    cams.images[i], imgs[i], f"view {i} gt", f"view {i} render",
                    vmin=cams.images[i].min() if iteration != 1 else None,
                    vmax=cams.images[i].max() if iteration != 1 else None,
                )
                for i in np.unique(show_idx)
            ]
            tb_writer.add_image(
                f"{name}/gt_render_diff", np.concatenate(panels, axis=0),
                global_step=iteration, dataformats="HWC",
            )
        m = metric_proj(cams.images, imgs)
        results[name] = m
        with open(osp.join(eval_path, f"eval2d_{name}.yml"), "w") as f:
            yaml.dump(
                {"psnr_2d": m["psnr_2d"], "ssim_2d": m["ssim_2d"],
                 "psnr_2d_projs": m["psnr_2d_projs"],
                 "ssim_2d_projs": m["ssim_2d_projs"]},
                f, default_flow_style=False, sort_keys=False,
            )
        if tb_writer:
            tb_writer.add_scalar(f"{name}/psnr_2d", m["psnr_2d"], iteration)
            tb_writer.add_scalar(f"{name}/ssim_2d", m["ssim_2d"], iteration)

    psnr_3d = ssim_3d = None
    if scene.vol_gt is not None:
        cfg = scene.scanner_cfg
        vol_pred = np.asarray(query_volume(
            xyz, scales, rots, dens,
            center=cfg["offOrigin"], n_voxel=tuple(int(v) for v in cfg["nVoxel"]),
            s_voxel=cfg["sVoxel"], active=active, backend=backend,
        ))
        psnr_3d = metric_vol_psnr(scene.vol_gt, vol_pred)
        ssim_3d, ssim_ax = metric_vol_ssim(scene.vol_gt, vol_pred)
        with open(osp.join(eval_path, "eval3d.yml"), "w") as f:
            yaml.dump(
                {"psnr_3d": psnr_3d, "ssim_3d": ssim_3d,
                 "ssim_3d_x": ssim_ax[0], "ssim_3d_y": ssim_ax[1],
                 "ssim_3d_z": ssim_ax[2]},
                f, default_flow_style=False, sort_keys=False,
            )
        if tb_writer:
            # gt/pred/diff slice panels (reference train.py:330-352)
            nz = vol_pred.shape[2]
            slice_idx = np.unique(np.linspace(0, nz, 7).astype(int)[1:-1])
            panels = [
                show_two_slice(
                    scene.vol_gt[..., i], vol_pred[..., i],
                    f"slice {i} gt", f"slice {i} pred",
                    vmin=scene.vol_gt[..., i].min(),
                    vmax=scene.vol_gt[..., i].max(),
                )
                for i in slice_idx
            ]
            tb_writer.add_image(
                "reconstruction/slice-gt_pred_diff",
                np.concatenate(panels, axis=0), global_step=iteration,
                dataformats="HWC",
            )
            tb_writer.add_scalar("reconstruction/psnr_3d", psnr_3d, iteration)
            tb_writer.add_scalar("reconstruction/ssim_3d", ssim_3d, iteration)
    if tb_writer:
        # activated density histogram over live gaussians
        # (reference train.py:357-360); non-finite values would make
        # tensorboardX raise on an empty histogram, and a diverged run
        # should keep evaluating rather than crash at the logging call
        dvals = np.asarray(dens)[np.asarray(active)]
        dvals = dvals[np.isfinite(dvals)]
        if dvals.size:
            tb_writer.add_histogram(
                "scene/density_histogram", dvals, global_step=iteration,
            )
        else:
            tqdm.write(f"[ITER {iteration}] WARNING: no finite densities "
                       "among active gaussians — skipping histogram")
    p2 = results.get("render_test", results.get("render_train", {}))
    tqdm.write(
        f"[ITER {iteration}] Evaluating: psnr3d {psnr_3d if psnr_3d is not None else float('nan'):.3f}, "
        f"ssim3d {ssim_3d if ssim_3d is not None else float('nan'):.3f}, "
        f"psnr2d {p2.get('psnr_2d', float('nan')):.3f}, "
        f"ssim2d {p2.get('ssim_2d', float('nan')):.3f}"
    )
    return psnr_3d


def save_model(trainer, scene, iteration, backend):
    xyz, scales, rots, dens = activate(trainer.eval_params, trainer.scale_bound)
    cfg = scene.scanner_cfg
    vol_pred = np.asarray(query_volume(
        xyz, scales, rots, dens,
        center=cfg["offOrigin"], n_voxel=tuple(int(v) for v in cfg["nVoxel"]),
        s_voxel=cfg["sVoxel"], active=trainer.state.aux.active, backend=backend,
    ))
    scene.save(
        iteration, trainer.eval_params, trainer.state.aux, trainer.scale_bound,
        vol_pred=vol_pred,
    )


def training(dataset, opt, pipe, tb_writer, testing_iterations, saving_iterations,
             checkpoint_iterations, start_checkpoint, n_devices: int = 1):
    scene = Scene(dataset.source_path, dataset.model_path, eval_split=dataset.eval)
    scanner_cfg = scene.scanner_cfg
    volume_to_world = max(scanner_cfg["sVoxel"])
    scale_bound = None
    if dataset.scale_min > 0 and dataset.scale_max > 0:
        scale_bound = (
            dataset.scale_min * volume_to_world,
            dataset.scale_max * volume_to_world,
        )

    backend = pipe.backend
    params, aux = initialize_gaussians(
        dataset, scale_bound, capacity=int(opt.initial_capacity) or None
    )
    mesh = None
    if n_devices > 1:
        # Gaussian-axis sharding over the device mesh: each chip renders a
        # partial image from its shard, psum over ICI (exact — the X-ray
        # accumulation is order-independent). See parallel/train_sharded.py.
        from r2_gaussian_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(n_devices)
    trainer = Trainer(
        scene.train_cameras, scanner_cfg, opt, scale_bound, params, aux,
        backend=backend, footprint=pipe.footprint, mesh=mesh,
        debug_dir=scene.model_path if pipe.debug else None,
    )
    if start_checkpoint:
        state, it, sb = load_checkpoint(start_checkpoint)
        # reconcile the checkpoint's EMA with this run's --ema_decay: drop it
        # when averaging is off, seed it from the live params when the
        # checkpoint predates averaging
        if trainer.ema_decay <= 0:
            state = state._replace(ema=None)
        elif state.ema is None:
            state = state._replace(ema=jax.tree.map(jnp.copy, state.params))
        if mesh is not None:
            from r2_gaussian_tpu.parallel.sharding import shard_train_state

            state = shard_train_state(state, mesh)
        trainer.state = state
        trainer.iteration = it
        print(f"Load checkpoint {osp.basename(start_checkpoint)}.")

    ckpt_dir = osp.join(scene.model_path, "ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)

    events = sorted(
        set(testing_iterations) | set(saving_iterations)
        | set(checkpoint_iterations) | {opt.iterations}
    )
    events = [e for e in events if e > trainer.iteration]

    progress = tqdm(total=opt.iterations, initial=trainer.iteration, desc="Train")
    t_start = time.time()
    iters_done = trainer.iteration
    while trainer.iteration < opt.iterations:
        next_event = min(
            [e for e in events if e > trainer.iteration] + [opt.iterations]
        )
        # densify boundaries also end a dispatch
        di = opt.densification_interval
        next_boundary = ((trainer.iteration // di) + 1) * di
        target = min(next_event, next_boundary, opt.iterations)
        gap = target - trainer.iteration
        # decompose into standard dispatch sizes to bound recompiles
        t_chunk = time.time()
        it_before = trainer.iteration
        for size in (100, 10, 1):
            while gap >= size and (trainer.iteration + size) <= target:
                metrics, n_active = trainer.run_chunk(size)
                gap -= size
        chunk_elapsed = time.time() - t_chunk
        it = trainer.iteration
        metrics = np.asarray(metrics)
        progress.update(it - iters_done)
        iters_done = it
        progress.set_postfix({
            "loss": f"{metrics[-1, 0]:.1e}",
            "pts": f"{int(trainer.state.aux.n_active):.1e}" if n_active is None else f"{n_active:.1e}",
        })
        if tb_writer:
            tb_writer.add_scalar("train/loss_total", float(metrics[-1, 0]), it)
            tb_writer.add_scalar("train/loss_render", float(metrics[-1, 1]), it)
            tb_writer.add_scalar("train/loss_dssim", float(metrics[-1, 2]), it)
            tb_writer.add_scalar("train/loss_tv", float(metrics[-1, 3]), it)
            tb_writer.add_scalar(
                "train/total_points", int(trainer.state.aux.n_active), it
            )
            tb_writer.add_scalar(
                "train/iters_per_sec", iters_done / max(time.time() - t_start, 1e-9), it
            )
            # reference-observable parity scalars: per-group LR (reference
            # train.py:209 logs each param group's lr every iteration) and
            # per-iteration wall time in ms (reference train.py:236 logs the
            # CUDA-event elapsed time as train/iter_time)
            lrs = group_lrs(opt, it)
            for group in ("xyz", "density", "scaling", "rotation"):
                tb_writer.add_scalar(
                    f"train/lr_{group}", float(getattr(lrs, group)), it
                )
            tb_writer.add_scalar(
                "train/iter_time",
                1e3 * chunk_elapsed / max(it - it_before, 1), it,
            )
        if it in testing_iterations:
            evaluate(trainer, scene, it, tb_writer, backend)
        if it in saving_iterations or it == opt.iterations:
            tqdm.write(f"[ITER {it}] Saving Gaussians")
            save_model(trainer, scene, it, backend)
        if it in checkpoint_iterations:
            tqdm.write(f"[ITER {it}] Saving Checkpoint")
            save_checkpoint(
                osp.join(ckpt_dir, f"chkpnt{it}.pickle"), trainer.state, it,
                trainer.scale_bound,
            )
    progress.close()
    wall = time.time() - t_start
    print(f"Training complete: {trainer.iteration} iters in {wall:.1f}s "
          f"({trainer.iteration / wall:.1f} it/s)")
    return trainer, scene


if __name__ == "__main__":
    parser = ArgumentParser(description="Training script parameters")
    lp = ModelParams(parser)
    op = OptimizationParams(parser)
    pp = PipelineParams(parser)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[5_000, 10_000, 20_000])
    parser.add_argument("--save_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--n_devices", type=int, default=1,
                        help="shard the gaussians over this many devices "
                             "(gaussian-axis mesh, psum render)")
    # reference train.py:373,402 --detect_anomaly (torch autograd anomaly
    # mode); the JAX analog re-runs NaN-producing jitted ops op-by-op to
    # locate the primitive. Debug tool — slows training substantially.
    parser.add_argument("--detect_anomaly", action="store_true", default=False)
    args = parser.parse_args()
    args.save_iterations.append(args.iterations)
    args.test_iterations.append(args.iterations)
    args.test_iterations.append(1)

    np.random.seed(args.seed)
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    args_dict = vars(args)
    if args.config is not None:
        print(f"Loading configuration file from {args.config}")
        for key, val in load_yaml_config(args.config).items():
            args_dict[key] = val

    tb_writer = prepare_output_and_logger(args)
    print("Optimizing " + args.model_path)
    training(
        lp.extract(args), op.extract(args), pp.extract(args), tb_writer,
        args.test_iterations, args.save_iterations, args.checkpoint_iterations,
        args.start_checkpoint, n_devices=args.n_devices,
    )
    print("Training complete.")
