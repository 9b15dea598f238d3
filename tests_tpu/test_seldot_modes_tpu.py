"""R2G_SELDOT precision modes on real hardware (Mosaic lowering + numerics).

The CPU suite gates these modes in interpret mode (tests/test_seldot_modes.py);
this validates the actual Mosaic lowering of the DEFAULT-precision bf16
selector dots at a production shape, against the same render under the
default 'highest' mode. split2 must be f32-indistinguishable at image
tolerances; bf16 must stay inside its ~2^-8 payload-rounding envelope.
"""

import numpy as np
import jax
import pytest

from r2_gaussian_tpu.ops import splat2d

from test_kernel_regression import H, W, make_population, make_prep


@pytest.mark.parametrize("mode,rtol,atol_frac", [
    ("split2", 5e-5, 1e-5),
    ("bf16", 1.5e-2, 4e-3),
])
def test_seldot_mode_matches_highest_on_tpu(mode, rtol, atol_frac):
    xyz, scales, rots, dens = make_population(n=16384, seed=3)
    prep = make_prep(xyz, scales, rots, dens)

    def run():
        return np.asarray(jax.jit(
            lambda p: splat2d.render_pallas(p, width=W, height=H, kernel="auto")
        )(prep))

    prev = splat2d._SELDOT
    try:
        splat2d._SELDOT = "highest"
        jax.clear_caches()
        ref = run()
        splat2d._SELDOT = mode
        jax.clear_caches()
        got = run()
    finally:
        splat2d._SELDOT = prev
        jax.clear_caches()

    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=rtol,
                               atol=atol_frac * max(1.0, float(ref.max())))
