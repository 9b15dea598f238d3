"""TPU-gated kernel regression tests (VERDICT r1 weak #4).

The main suite (tests/) pins JAX to CPU + Pallas interpret mode, so Mosaic
lowering regressions (dot-precision selectors, sublane reshapes, VMEM
spills) only surface when the kernels are hand-run on hardware. This
directory runs the fused kernels on a real TPU at one realistic shape and
compares against the dense oracle. Run it solo on the TPU host:

    python -m pytest tests_tpu/ -q

Every test skips cleanly when no TPU is attached, so including the
directory in a CPU-only CI run is harmless (it just skips).
"""

import pytest

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()
import jax  # noqa: E402


def _tpu_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


@pytest.fixture(scope="session", autouse=True)
def require_tpu():
    if not _tpu_available():
        pytest.skip("no TPU attached", allow_module_level=False)


@pytest.fixture(autouse=True)
def free_device_memory():
    """Large dense-oracle intermediates + jit executables can pin most of
    HBM across tests (pytest also keeps failure frames alive); clear
    between tests so one failure doesn't cascade into OOMs."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
