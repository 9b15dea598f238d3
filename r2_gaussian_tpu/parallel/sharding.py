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
