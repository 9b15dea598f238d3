"""Lane-compaction kernel vs a numpy reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from r2_gaussian_tpu.ops.compaction import G, compact_lanes


def ref_compact(comps, mask, ocap, bcap):
    """Numpy oracle mirroring the documented semantics."""
    n = comps[0].shape[0]
    nb = n // G
    m2 = mask.reshape(nb, G)
    bc = m2.sum(1)
    touched = [b for b in range(nb) if bc[b] > 0][:bcap]
    out = [np.zeros(ocap, np.float32) for _ in comps]
    handled = np.zeros(n, bool)
    pos = 0
    for b in touched:
        if pos + bc[b] > ocap:
            break
        for l in range(G):
            if m2[b, l]:
                for f, c in enumerate(comps):
                    out[f][pos] = c[b * G + l]
                handled[b * G + l] = True
                pos += 1
    return out, handled


@pytest.mark.parametrize("seed,density,ocap,bcap", [
    (0, 0.05, 2 * G, 8),    # plenty of room
    (1, 0.5, 2 * G, 8),     # ocap overflow mid-list
    (2, 0.9, G, 2),         # bcap overflow
    (3, 0.0, G, 4),         # empty mask
])
def test_compact_matches_reference(seed, density, ocap, bcap):
    rng = np.random.default_rng(seed)
    n = 8 * G
    comps = [rng.standard_normal(n).astype(np.float32) for _ in range(5)]
    mask = rng.random(n) < density
    got, handled = compact_lanes([jnp.asarray(c) for c in comps],
                                 jnp.asarray(mask), ocap=ocap, bcap=bcap)
    ref, ref_handled = ref_compact(comps, mask, ocap, bcap)
    np.testing.assert_array_equal(np.asarray(handled), ref_handled)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), b, rtol=0, atol=0)


def test_compact_gradients():
    rng = np.random.default_rng(4)
    n = 4 * G
    comps = [rng.standard_normal(n).astype(np.float32) for _ in range(3)]
    mask = rng.random(n) < 0.2
    w = rng.standard_normal((3, 2 * G)).astype(np.float32)

    def loss_pallas(*cs):
        sub, _ = compact_lanes(list(cs), jnp.asarray(mask), ocap=2 * G, bcap=8)
        return sum(jnp.sum(s * w[i]) for i, s in enumerate(sub))

    def loss_ref(*cs):
        sub, _ = ref_compact([np.asarray(c) for c in cs], mask, 2 * G, 8)
        return sum(float((s * w[i]).sum()) for i, s in enumerate(sub))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(*map(jnp.asarray, comps))
    # finite-difference-free oracle: the map is linear, grad = scatter of w
    _, handled = ref_compact(comps, mask, 2 * G, 8)
    pos = np.flatnonzero(handled)
    for f in range(3):
        expect = np.zeros(n, np.float32)
        expect[pos] = w[f, : len(pos)]
        np.testing.assert_allclose(np.asarray(gp[f]), expect, rtol=1e-6,
                                   atol=1e-6)
