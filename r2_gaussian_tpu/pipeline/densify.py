"""Adaptive density control: clone / split / prune over padded buffers.

Reimplements the reference GaussianModel densification
(gaussian_model.py:430-556) as a single jitted function on fixed-capacity
arrays. Semantics preserved:

  - grads = xyz_gradient_accum / denom (NDC-space mean-2D gradient norms),
    NaN -> 0
  - clone (small & high-grad): duplicate; BOTH copies get half the
    activated density (R2-Gaussian-specific, gaussian_model.py:474-501)
  - split (large & high-grad): 2 children sampled from the gaussian's own
    distribution, scales /(0.8*2), density /2; originals removed
    (gaussian_model.py:430-472)
  - clone/split only while n_active < max_num_gaussians; prune always runs:
    density < min, outside bbox, screen-size, world-size
    (gaussian_model.py:503-550)
  - optimizer moments: carried for survivors, zeroed for new gaussians;
    densification stats reset iff clone/split ran (densification_postfix)
  - torch leaves param.grad=None after the surgery so the reference skips
    that iteration's Adam step; the trainer replicates this via skip flags.

TPU-specific addition: the compaction sort key is (inactive, radius-class,
Morton code of position), which keeps the SoA arrays spatially coherent —
the splat-block kernels rely on consecutive gaussians being neighbors.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.gaussians import (
    GaussianAux,
    GaussianParams,
    inverse_softplus,
    scale_activation,
    scale_inverse_activation,
    softplus,
)
from ..models.preprocess import quat_to_rotmat
from .optim import AdamState


class DensifyConfig(NamedTuple):
    grad_threshold: float
    min_density: float
    max_screen_size: float | None
    max_scale: float | None
    max_num_gaussians: int
    densify_scale_threshold: float | None  # absolute (already * volume size)


def morton_code(xyz: jnp.ndarray, lo=-1.0, hi=1.0) -> jnp.ndarray:
    """30-bit Morton code of positions for spatial compaction."""
    q = jnp.clip((xyz - lo) / (hi - lo), 0.0, 0.999999)
    q = (q * 1024).astype(jnp.int32)  # 10 bits per axis

    def part1by2(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return (
        part1by2(q[:, 0]) | (part1by2(q[:, 1]) << 1) | (part1by2(q[:, 2]) << 2)
    )


OVERSIZE_SCALE = 0.09  # world units; ~ footprint beyond the largest window


def size_class(max_scale: jnp.ndarray) -> jnp.ndarray:
    """0 = normal, 1 = oversize. Blocks are formed from consecutive sorted
    gaussians; segregating only the (few) gaussians whose own footprint
    exceeds every kernel window tier keeps them from dragging whole blocks
    into the dense fallback, while preserving full Morton locality for the
    rest (finer size bucketing measurably *hurts* — it fragments locality)."""
    return (max_scale > OVERSIZE_SCALE).astype(jnp.int32)


def _compaction_order(xyz, max_scale, active):
    """lexsort: active first, then size class, then Morton code."""
    return jnp.lexsort(
        (morton_code(xyz), size_class(max_scale), ~active)
    )


@partial(jax.jit, static_argnames=("cfg", "scale_bound"), donate_argnums=(1, 2, 3))
def densify_and_prune(
    key,
    params: GaussianParams,
    adam: AdamState,
    aux: GaussianAux,
    bbox,  # [2,3]
    cfg: DensifyConfig,
    scale_bound,
    ema: GaussianParams | None = None,
):
    """One densification event. Returns (params, adam, aux, ema, n_active).

    `ema` (optional, framework extension beyond the reference): the
    Polyak-averaged evaluation parameters ride the same row surgery as the
    live parameters — survivors keep their average; rows the event rewrites
    discontinuously (split children; clone density halving) re-sync so the
    averaged model stays a faithful mixture: a clone halves the EMA density
    in activated space (preserving the averaged xyz/scale/rot history in
    both copies), a split resets both children's EMA to the fresh child
    parameters. With ema_decay=0 this keeps ema ≡ params through events
    (tested invariant)."""
    cap = params.capacity
    act = aux.active
    n_active = jnp.sum(act.astype(jnp.int32))

    grad_avg = aux.xyz_gradient_accum / aux.denom
    grad_avg = jnp.where(jnp.isnan(grad_avg), 0.0, grad_avg)

    scales = scale_activation(params.scaling, scale_bound)
    max_sc = jnp.max(scales, axis=-1)
    density_act = softplus(params.density[:, 0])

    do_densify = cfg.densify_scale_threshold is not None
    if do_densify:
        can = n_active < cfg.max_num_gaussians
        hot = act & (grad_avg >= cfg.grad_threshold) & can
        # Budget-clamp the event so the population never exceeds
        # max_num_gaussians (the reference only gates the event start,
        # gaussian_model.py:512, so a single event can overshoot up to 2x;
        # bounded growth keeps the fixed-capacity buffers and dispatch
        # length under control).
        budget = jnp.maximum(cfg.max_num_gaussians - n_active, 0)
        hot = hot & (jnp.cumsum(hot.astype(jnp.int32)) <= budget)
        clone_mask = hot & (max_sc <= cfg.densify_scale_threshold)
        split_mask = hot & (max_sc > cfg.densify_scale_threshold)
    else:
        clone_mask = jnp.zeros(cap, bool)
        split_mask = jnp.zeros(cap, bool)

    # --- originals, modified in place ---
    half_density_raw = inverse_softplus(jnp.maximum(density_act * 0.5, 1e-12))[:, None]
    orig_density = jnp.where(clone_mask[:, None], half_density_raw, params.density)

    # split child parameters (used for both children; independent noise)
    rot_mats = quat_to_rotmat(
        params.rotation / jnp.maximum(jnp.linalg.norm(params.rotation, axis=-1, keepdims=True), 1e-12)
    )
    k1, k2 = jax.random.split(key)
    child_scale_raw = scale_inverse_activation(
        jnp.maximum(scales / (0.8 * 2.0), 1e-12), scale_bound
    )

    def child_xyz(k):
        noise = jax.random.normal(k, (cap, 3)) * scales
        return params.xyz + jnp.einsum("nij,nj->ni", rot_mats, noise, precision="highest")

    child1_xyz = child_xyz(k1)
    child2_xyz = child_xyz(k2)

    # child1 replaces the original slot where split
    sm = split_mask[:, None]
    orig_xyz = jnp.where(sm, child1_xyz, params.xyz)
    orig_scaling = jnp.where(sm, child_scale_raw, params.scaling)
    orig_density = jnp.where(sm, half_density_raw, orig_density)
    orig_active = act  # split originals replaced, clones stay -> still active

    # --- new rows: clone copy or split child2 ---
    new_mask = clone_mask | split_mask
    new_xyz = jnp.where(sm, child2_xyz, params.xyz)
    new_scaling = jnp.where(sm, child_scale_raw, params.scaling)
    new_density = half_density_raw  # both clone and split children use half
    new_rotation = params.rotation
    new_radii = aux.max_radii2d

    ext = GaussianParams(
        xyz=jnp.concatenate([orig_xyz, new_xyz]),
        scaling=jnp.concatenate([orig_scaling, new_scaling]),
        rotation=jnp.concatenate([params.rotation, new_rotation]),
        density=jnp.concatenate([orig_density, new_density]),
    )
    if ema is not None:
        cm = clone_mask[:, None]
        ema_half_density = inverse_softplus(
            jnp.maximum(softplus(ema.density) * 0.5, 1e-12)
        )
        # originals: split -> child1 params; clone -> keep average, halve density
        ema_orig_xyz = jnp.where(sm, orig_xyz, ema.xyz)
        ema_orig_scaling = jnp.where(sm, orig_scaling, ema.scaling)
        ema_orig_rotation = jnp.where(sm, params.rotation, ema.rotation)
        ema_orig_density = jnp.where(
            sm, half_density_raw, jnp.where(cm, ema_half_density, ema.density)
        )
        # new rows: split -> child2 params; clone copy -> inherit the
        # original's (density-halved) average
        ema_new_xyz = jnp.where(sm, new_xyz, ema.xyz)
        ema_new_scaling = jnp.where(sm, new_scaling, ema.scaling)
        ema_new_rotation = jnp.where(sm, params.rotation, ema.rotation)
        ema_new_density = jnp.where(sm, half_density_raw, ema_half_density)
        ext_ema = GaussianParams(
            xyz=jnp.concatenate([ema_orig_xyz, ema_new_xyz]),
            scaling=jnp.concatenate([ema_orig_scaling, ema_new_scaling]),
            rotation=jnp.concatenate([ema_orig_rotation, ema_new_rotation]),
            density=jnp.concatenate([ema_orig_density, ema_new_density]),
        )
    ext_active = jnp.concatenate([orig_active, new_mask])
    ext_radii = jnp.concatenate([aux.max_radii2d, new_radii])
    ext_accum = jnp.concatenate([aux.xyz_gradient_accum, jnp.zeros(cap)])
    ext_denom = jnp.concatenate([aux.denom, jnp.zeros(cap)])
    zeros_new = jax.tree.map(lambda a: jnp.zeros_like(a), params)
    ext_m = jax.tree.map(lambda a, z: jnp.concatenate([a, z]), adam.m, zeros_new)
    ext_v = jax.tree.map(lambda a, z: jnp.concatenate([a, z]), adam.v, zeros_new)

    # --- prune on the extended state (reference prunes after clone+split) ---
    ext_scales = scale_activation(ext.scaling, scale_bound)
    ext_density_act = softplus(ext.density[:, 0])
    prune = ext_density_act < cfg.min_density
    prune |= jnp.any((ext.xyz < bbox[0][None]) | (ext.xyz > bbox[1][None]), axis=-1)
    if cfg.max_screen_size is not None:
        prune |= ext_radii > cfg.max_screen_size
    if cfg.max_scale is not None:
        prune |= jnp.max(ext_scales, axis=-1) > cfg.max_scale
    ext_active &= ~prune

    # --- compact back to capacity, sorted by (active, size, Morton) ---
    order = _compaction_order(
        ext.xyz, jnp.max(ext_scales, axis=-1), ext_active
    )[:cap]

    def take(a):
        return a[order]

    new_params = jax.tree.map(take, ext)
    new_ema = None if ema is None else jax.tree.map(take, ext_ema)
    new_m = jax.tree.map(take, ext_m)
    new_v = jax.tree.map(take, ext_v)
    new_active = ext_active[order]
    did_densify = do_densify and True  # postfix ran iff densify allowed
    if do_densify:
        reset = can
        new_accum = jnp.where(reset, 0.0, ext_accum[order])
        new_denom = jnp.where(reset, 0.0, ext_denom[order])
    else:
        new_accum = ext_accum[order]
        new_denom = ext_denom[order]

    new_aux = GaussianAux(
        active=new_active,
        max_radii2d=ext_radii[order],
        xyz_gradient_accum=new_accum,
        denom=new_denom,
    )
    new_adam = AdamState(m=new_m, v=new_v, step=adam.step)
    return (new_params, new_adam, new_aux, new_ema,
            jnp.sum(new_active.astype(jnp.int32)))


@partial(jax.jit, donate_argnums=(0, 1, 2), static_argnames=("scale_bound",))
def resort_spatial(params: GaussianParams, adam: AdamState, aux: GaussianAux,
                   scale_bound=None, ema: GaussianParams | None = None):
    """Re-sort live gaussians by (size class, Morton code) — no densify.
    Used to restore block locality for the splat kernels when positions have
    drifted. Returns (params, adam, aux, ema)."""
    max_sc = jnp.max(scale_activation(params.scaling, scale_bound), axis=-1)
    order = _compaction_order(params.xyz, max_sc, aux.active)
    take = lambda a: a[order]
    return (
        jax.tree.map(take, params),
        AdamState(m=jax.tree.map(take, adam.m), v=jax.tree.map(take, adam.v), step=adam.step),
        GaussianAux(
            active=aux.active[order],
            max_radii2d=aux.max_radii2d[order],
            xyz_gradient_accum=aux.xyz_gradient_accum[order],
            denom=aux.denom[order],
        ),
        None if ema is None else jax.tree.map(take, ema),
    )


def reset_density(params, adam: AdamState, cap: float = 1.0):
    """Clamp activated densities to <= cap and zero the density optimizer
    moments (reference gaussian_model.py:283-291 reset_density +
    replace_tensor_to_optimizer). Defined for API parity — like the
    reference, the default training loop never calls it; it is the standard
    3DGS opacity-reset tool adapted to the softplus density activation."""
    from ..models.gaussians import inverse_softplus, softplus

    new_raw = inverse_softplus(jnp.minimum(softplus(params.density), cap))
    params = params._replace(density=new_raw)
    adam = adam._replace(
        m=adam.m._replace(density=jnp.zeros_like(adam.m.density)),
        v=adam.v._replace(density=jnp.zeros_like(adam.v.density)),
    )
    return params, adam
