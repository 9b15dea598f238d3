"""Multi-chip scale-out: gaussian-sharded rendering and training.

The reference is strictly single-GPU (SURVEY.md §2.1: no distributed
anything). The natural TPU scale-out exploits the order-independence of
X-ray accumulation: shard the gaussian SoA arrays over a mesh axis, let
each device render a partial image from its shard, and `psum` the partial
images over ICI. This is exact — the render is a pure sum over gaussians —
and the backward shards for free (each device owns its gaussians' grads;
the image cotangent is replicated).

The train step runs under shard_map: parameters, Adam moments and
densification stats are sharded on the gaussian axis; loss reductions psum.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "g") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise RuntimeError(
            f"make_mesh: need {n} devices but only {len(devs)} visible "
            f"(platform={devs[0].platform}). For CPU-mesh testing set "
            f"JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_"
            f"device_count={n} before JAX initializes."
        )
    return Mesh(np.array(devs[:n]), (axis,))


def shard_gaussians(tree, mesh: Mesh, axis: str = "g"):
    """Place a gaussian SoA pytree with the leading axis sharded over the
    mesh. Capacities must be divisible by the mesh size."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def psum_grad_exact(x, axis: str):
    """`lax.psum` with an explicitly-correct transpose for use under
    `shard_map(check_vma=False)`.

    With vma checking off, JAX transposes psum to psum, so a replicated
    cotangent gets multiplied by the mesh size (measured: Adam moments off
    by exactly n_devices). The true linearization of a sum over shards is
    identity per shard — the loss cotangent is already replicated after the
    forward psum, and each shard's partial image contributes with unit
    weight."""

    @jax.custom_vjp
    def f(x):
        return jax.lax.psum(x, axis)

    def fwd(x):
        return jax.lax.psum(x, axis), None

    def bwd(_, ct):
        return (ct,)

    f.defvjp(fwd, bwd)
    return f(x)


def train_state_specs(axis: str = "g", with_ema: bool = False):
    """PartitionSpec pytree matching pipeline.trainer.TrainState: every
    per-gaussian leaf sharded on its leading (capacity) axis, the Adam step
    counter replicated. `with_ema` mirrors whether the state carries Polyak
    evaluation parameters (opt.ema_decay > 0) — they shard like params."""
    from ..models.gaussians import GaussianAux, GaussianParams
    from ..pipeline.optim import AdamState
    from ..pipeline.trainer import TrainState

    g = P(axis)
    gp = GaussianParams(xyz=g, scaling=g, rotation=g, density=g)
    return TrainState(
        params=gp,
        adam=AdamState(m=gp, v=gp, step=P()),
        aux=GaussianAux(active=g, max_radii2d=g, xyz_gradient_accum=g, denom=g),
        ema=gp if with_ema else None,
    )


def shard_train_state(state, mesh: Mesh, axis: str = "g"):
    """Place a TrainState on the mesh with gaussian-axis sharding."""
    specs = train_state_specs(axis, with_ema=state.ema is not None)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), state, specs
    )


def replicate_train_state(state, mesh: Mesh):
    """All-gather a sharded TrainState to fully-replicated placement (used at
    densification events, where the global budget cumsum and compaction sort
    need every gaussian; events are rare — every densification_interval)."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, rep), state)


def sharded_render_fn(render_one_shard, mesh: Mesh, axis: str = "g"):
    """Wrap a per-shard render closure (params_shard, active_shard) -> image
    into a shard_mapped all-device render with a psum over partial images."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
    )
    def fn(params_shard, active_shard):
        img = render_one_shard(params_shard, active_shard)
        return jax.lax.psum(img, axis)

    return fn
