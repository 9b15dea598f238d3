"""Optimizer: Adam (eps 1e-15) with per-group log-linear LR decay, operating
on the padded GaussianParams pytree.

Matches the reference training_setup (gaussian_model.py:188-251):
4 param groups {xyz, density, scaling, rotation}, each with
get_expon_lr_func(lr_init, lr_final, max_steps) (gaussian_utils.py:13-46).
Implemented manually (rather than optax) so densification can do the same
optimizer-state surgery the reference does: moment rows are carried through
permutations, zeroed for new gaussians, with a global step count per group
(torch keeps a per-tensor step that survives surgery).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianParams

BETA1, BETA2, EPS = 0.9, 0.999, 1e-15


class AdamState(NamedTuple):
    m: GaussianParams  # first moments
    v: GaussianParams  # second moments
    step: jnp.ndarray  # scalar int32 (global step count, torch-style)


def init_adam(params: GaussianParams) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(m=zeros, v=jax.tree.map(jnp.zeros_like, params), step=jnp.int32(0))


def expon_lr(step, lr_init: float, lr_final: float, max_steps: int,
             lr_delay_steps: int = 0, lr_delay_mult: float = 1.0):
    """Log-linear interpolation from lr_init to lr_final, with optional
    reverse-cosine warmup over the first lr_delay_steps (reference
    gaussian_utils.py:13-46; delay unused by the default config but part of
    the schedule spec)."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    return delay_rate * log_lerp


def group_lrs(opt_cfg, iteration, spatial_lr_scale: float = 1.0) -> GaussianParams:
    """Learning rate for each param-group leaf at `iteration`."""
    s = spatial_lr_scale
    delay = dict(
        lr_delay_steps=int(getattr(opt_cfg, "position_lr_delay_steps", 0)),
        lr_delay_mult=float(getattr(opt_cfg, "position_lr_delay_mult", 1.0)),
    )
    return GaussianParams(
        xyz=expon_lr(iteration, opt_cfg.position_lr_init * s,
                     opt_cfg.position_lr_final * s, opt_cfg.position_lr_max_steps,
                     **delay),
        density=expon_lr(iteration, opt_cfg.density_lr_init * s,
                         opt_cfg.density_lr_final * s, opt_cfg.density_lr_max_steps),
        scaling=expon_lr(iteration, opt_cfg.scaling_lr_init * s,
                         opt_cfg.scaling_lr_final * s, opt_cfg.scaling_lr_max_steps),
        rotation=expon_lr(iteration, opt_cfg.rotation_lr_init * s,
                          opt_cfg.rotation_lr_final * s, opt_cfg.rotation_lr_max_steps),
    )


def adam_update(
    params: GaussianParams,
    grads: GaussianParams,
    state: AdamState,
    lrs: GaussianParams,
) -> tuple[GaussianParams, AdamState]:
    step = state.step + 1
    bc1 = 1.0 - BETA1 ** step.astype(jnp.float32)
    bc2 = 1.0 - BETA2 ** step.astype(jnp.float32)

    def upd(p, g, m, v, lr):
        m = BETA1 * m + (1 - BETA1) * g
        v = BETA2 * v + (1 - BETA2) * (g * g)
        mhat = m / bc1
        vhat = v / bc2
        return p - lr * mhat / (jnp.sqrt(vhat) + EPS), m, v

    new = jax.tree.map(
        upd, params, grads, state.m, state.v, lrs,
        is_leaf=lambda x: isinstance(x, jnp.ndarray),
    )
    new_p = GaussianParams(*(t[0] for t in new))
    new_m = GaussianParams(*(t[1] for t in new))
    new_v = GaussianParams(*(t[2] for t in new))
    return new_p, AdamState(m=new_m, v=new_v, step=step)
