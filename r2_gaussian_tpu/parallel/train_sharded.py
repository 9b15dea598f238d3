"""Sharded training step: data-parallel over gaussians (the model's natural
"tensor parallel" axis), exact w.r.t. the single-chip step.

Each device renders a partial image from its gaussian shard; `psum` over ICI
yields the full projection; the loss is computed replicated; autodiff flows
the replicated image cotangent back into each shard's gaussians. Adam state
and densification stats live shard-local. TV loss shards the same way
(partial sub-volumes psum'd).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.gaussians import GaussianParams, activate
from ..models.render import query, render
from ..utils.losses import l1_loss, ssim, tv_3d_loss
from .sharding import make_mesh


def make_sharded_train_step(
    *,
    mesh,
    cameras,
    scanner_cfg,
    opt_cfg,
    scale_bound,
    backend: str = "dense",
    axis: str = "g",
):
    """Build a shard_mapped single-iteration train step.

    Returns step(params, adam_m, adam_v, active, view_idx, key, iteration)
    -> (params', adam_m', adam_v', metrics) with gaussian-axis sharding on
    params/adam/active.
    """
    import numpy as np

    from ..pipeline.optim import BETA1, BETA2, EPS, group_lrs

    width, height = cameras.width, cameras.height
    tanfovx, tanfovy, mode = cameras.tanfovx, cameras.tanfovy, cameras.mode
    lambda_dssim = float(opt_cfg.lambda_dssim)
    lambda_tv = float(opt_cfg.lambda_tv)
    tv_n = int(opt_cfg.tv_vol_size)
    d_voxel = np.asarray(scanner_cfg["dVoxel"], np.float32)
    tv_s_voxel = jnp.asarray(d_voxel * tv_n)
    off = np.asarray(scanner_cfg["offOrigin"], np.float32)
    s_vox = np.asarray(scanner_cfg["sVoxel"], np.float32)
    bbox_lo = jnp.asarray(off - s_vox / 2)
    bbox_hi = jnp.asarray(off + s_vox / 2)
    sb = None if scale_bound is None else tuple(float(x) for x in scale_bound)

    w2c_all = jnp.asarray(cameras.w2c)
    proj_all = jnp.asarray(cameras.full_proj)
    images_all = jnp.asarray(cameras.images)

    def loss_fn(params_shard, active_shard, view_idx, key_tv):
        xyz, scales, rots, dens = activate(params_shard, sb)
        img = render(
            xyz, scales, rots, dens,
            w2c=w2c_all[view_idx], full_proj=proj_all[view_idx],
            width=width, height=height, tanfovx=tanfovx, tanfovy=tanfovy,
            mode=mode, active=active_shard, backend=backend,
        )["render"]
        img = jax.lax.psum(img, axis)  # exact: order-independent sum
        gt = images_all[view_idx]
        total = l1_loss(img, gt)
        if lambda_dssim > 0:
            total = total + lambda_dssim * (1.0 - ssim(img, gt))
        if lambda_tv > 0:
            u = jax.random.uniform(key_tv, (3,))
            center = (bbox_lo + tv_s_voxel / 2) + (bbox_hi - tv_s_voxel - bbox_lo) * u
            vol = query(
                xyz, scales, rots, dens,
                center=center, n_voxel=(tv_n, tv_n, tv_n), s_voxel=tv_s_voxel,
                active=active_shard, backend=backend,
            )["vol"]
            vol = jax.lax.psum(vol, axis)
            total = total + lambda_tv * tv_3d_loss(vol, reduction="mean")
        return total

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(), P(), P()),
        out_specs=(P(axis), P(axis), P(axis), P()),
        check_vma=False,
    )
    def step(params, m, v, active, view_idx, key, iteration):
        total, grads = jax.value_and_grad(loss_fn)(params, active, view_idx, key)
        lrs = group_lrs(opt_cfg, iteration)
        bc1 = 1.0 - BETA1 ** (iteration.astype(jnp.float32))
        bc2 = 1.0 - BETA2 ** (iteration.astype(jnp.float32))

        def upd(p, g, m_, v_, lr):
            m2 = BETA1 * m_ + (1 - BETA1) * g
            v2 = BETA2 * v_ + (1 - BETA2) * g * g
            return p - lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + EPS), m2, v2

        out = jax.tree.map(upd, params, grads, m, v, lrs)
        new_p = GaussianParams(*(t[0] for t in out))
        new_m = GaussianParams(*(t[1] for t in out))
        new_v = GaussianParams(*(t[2] for t in out))
        return new_p, new_m, new_v, total

    return step


def dryrun(n_devices: int, n_per_device: int = 256, det: int = 64):
    """Build an n-device mesh, jit the sharded training step with real
    gaussian-axis shardings, and execute ONE step on tiny shapes."""
    import types

    import numpy as np

    from ..dataset.geometry import build_cameras
    from ..models.gaussians import create_from_pcd
    from .sharding import shard_gaussians

    mesh = make_mesh(n_devices)
    scanner = {
        "mode": "cone", "DSD": 7.0, "DSO": 5.0,
        "nDetector": [det, det], "sDetector": [4.0, 4.0],
        "nVoxel": [32, 32, 32], "sVoxel": [2.0, 2.0, 2.0],
        "dVoxel": [2.0 / 32] * 3,
        "offOrigin": [0.0, 0.0, 0.0], "offDetector": [0.0, 0.0],
    }
    angles = np.linspace(0, 2 * np.pi, 5)[:-1]
    images = np.abs(np.random.default_rng(0).standard_normal(
        (4, det, det))).astype(np.float32)
    cams = build_cameras(angles, images, [str(i) for i in range(4)], scanner)

    n = n_devices * n_per_device
    rng = np.random.default_rng(1)
    xyz = rng.uniform(-0.7, 0.7, (n, 3)).astype(np.float32)
    dens = rng.uniform(0.1, 0.5, n).astype(np.float32)
    scale_bound = (0.001, 1.0)
    params, aux = create_from_pcd(xyz, dens, scale_bound, capacity=n)

    opt = types.SimpleNamespace(
        position_lr_init=2e-4, position_lr_final=2e-5, position_lr_max_steps=100,
        density_lr_init=1e-2, density_lr_final=1e-3, density_lr_max_steps=100,
        scaling_lr_init=5e-3, scaling_lr_final=5e-4, scaling_lr_max_steps=100,
        rotation_lr_init=1e-3, rotation_lr_final=1e-4, rotation_lr_max_steps=100,
        lambda_dssim=0.25, lambda_tv=0.05, tv_vol_size=8,
    )
    step = make_sharded_train_step(
        mesh=mesh, cameras=cams, scanner_cfg=scanner, opt_cfg=opt,
        scale_bound=scale_bound, backend="dense",
    )
    zeros = jax.tree.map(jnp.zeros_like, params)
    params = shard_gaussians(params, mesh)
    m = shard_gaussians(zeros, mesh)
    v = shard_gaussians(jax.tree.map(jnp.zeros_like, params), mesh)
    active = shard_gaussians(aux.active, mesh)

    p2, m2, v2, loss = jax.jit(step)(
        params, m, v, active, jnp.int32(0), jax.random.PRNGKey(0), jnp.int32(1)
    )
    jax.block_until_ready(p2)
    assert jnp.isfinite(loss), loss
    moved = float(jnp.abs(p2.xyz - params.xyz).max())
    assert moved > 0, "sharded step did not update parameters"
    return float(loss)
