"""Runtime setup helpers: persistent compilation cache + determinism.

The hosting TPU environment compiles through a remote AOT service, so cold
compiles of the multi-kernel train step are expensive (minutes). The
persistent cache amortizes them across processes/runs.
"""

from __future__ import annotations

import os
import os.path as osp


def _cache_subdir(plat: str | None) -> str:
    """Partition the persistent cache by platform, and for CPU by a machine
    fingerprint: XLA:CPU AOT results encode the compile machine's ISA
    features, and entries written by a different host load with feature
    mismatches — measured here as a >50x compile-time blowup (a det-64
    train step: 11 s cold vs >10 min through a foreign-host cache), with
    XLA warning the loaded code may SIGILL. TPU entries come from the
    remote AOT service and stay shared."""
    plat = (plat or "axon").split(",")[0].strip() or "axon"
    if plat != "cpu":
        return "tpu"
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return "cpu-" + hashlib.sha1(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    return "cpu-generic"


def setup_jax_cache(cache_dir: str | None = None):
    import jax

    # The hosting environment's TPU plugin can register itself as the default
    # platform even when JAX_PLATFORMS=cpu is exported; re-apply the user's
    # choice so CLIs are runnable on CPU-only machines.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)

    base = cache_dir or os.environ.get(
        "R2G_JAX_CACHE",
        osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
                 ".jax_cache"),
    )
    full = osp.join(base, _cache_subdir(plat))
    os.makedirs(full, exist_ok=True)
    # one-time migration of pre-partition entries: tunnel-compiled TPU
    # executables are minutes each and must stay warm; foreign-host CPU
    # entries parked there are dead weight (keys never match on TPU)
    try:
        os.makedirs(osp.join(base, "tpu"), exist_ok=True)
        for name in os.listdir(base):
            if name.endswith("-cache") and osp.isfile(osp.join(base, name)):
                os.replace(osp.join(base, name), osp.join(base, "tpu", name))
    except OSError:
        pass
    jax.config.update("jax_compilation_cache_dir", full)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# Error-message markers of the transient remote-AOT-compile failure class
# observed on the tunneled TPU (the compile helper subprocess sporadically
# exits 1 and the dispatch raises INTERNAL with an HTTP 500). Compilation is
# idempotent and happens before donated buffers are consumed, so re-issuing
# the same dispatch is safe; markers are kept narrow so genuine executable
# errors (OOM, lowering bugs) still raise immediately.
_TRANSIENT_MARKERS = ("remote_compile", "tpu_compile_helper", "HTTP 500")


def retry_transient(fn, *args, **kwargs):
    """Call fn(*args, **kwargs), retrying with backoff when it dies in the
    transient remote-compile failure class. A 30k-iteration training run
    crosses dozens of first-compile points (new dispatch shapes after
    capacity growth, eval renders, full-volume queries); without this, one
    flaky compile-service response kills an hours-long run."""
    import time

    # clamp: a mis-set R2G_COMPILE_RETRIES=0 must not silently skip the call
    # and return None (that would poison Trainer.run_chunk's state far from
    # the cause) — at least one attempt always runs
    attempts = max(1, int(os.environ.get("R2G_COMPILE_RETRIES", 4)))
    first_exc = None
    for attempt in range(attempts):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # jax.errors.JaxRuntimeError et al.
            msg = str(e)
            # the dispatches this wraps donate their input buffers; if a
            # marker-matching failure ever surfaced AFTER donation, the
            # retry hits deleted buffers — re-raise the ORIGINAL failure so
            # the root cause isn't masked by the confusing secondary error
            if first_exc is not None and (
                    "deleted" in msg.lower() or "donat" in msg.lower()):
                raise first_exc
            if (attempt == attempts - 1
                    or not any(m in msg for m in _TRANSIENT_MARKERS)):
                raise
            first_exc = e
            import sys

            print(f"transient compile failure (attempt {attempt + 1}/"
                  f"{attempts}), retrying: {msg.splitlines()[0][:200]}",
                  file=sys.stderr, flush=True)
            time.sleep(10.0 * (attempt + 1))


def safe_state(seed: int = 0, quiet: bool = False):
    """Deterministic seeding (reference general_utils.py:35-64)."""
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
