"""Runtime setup helpers: persistent compilation cache + determinism.

The hosting TPU environment compiles through a remote AOT service, so cold
compiles of the multi-kernel train step are expensive (minutes). The
persistent cache amortizes them across processes/runs.
"""

from __future__ import annotations

import os
import os.path as osp


def setup_jax_cache(cache_dir: str | None = None):
    import jax

    # The hosting environment's TPU plugin can register itself as the default
    # platform even when JAX_PLATFORMS=cpu is exported; re-apply the user's
    # choice so CLIs are runnable on CPU-only machines.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)

    cache_dir = cache_dir or os.environ.get(
        "R2G_JAX_CACHE",
        osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
                 ".jax_cache"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def safe_state(seed: int = 0, quiet: bool = False):
    """Deterministic seeding (reference general_utils.py:35-64)."""
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
