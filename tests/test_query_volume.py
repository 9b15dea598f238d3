"""query_volume slab chunking must agree with a single whole-grid query."""

import numpy as np
import jax.numpy as jnp

from r2_gaussian_tpu.models.render import query, query_volume


def _random_gaussians(n=300, seed=0):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.02, 0.1, (n, 3)).astype(np.float32))
    rots = rng.standard_normal((n, 4)).astype(np.float32)
    rots = jnp.asarray(rots / np.linalg.norm(rots, axis=1, keepdims=True))
    dens = jnp.asarray(rng.uniform(0.1, 1.0, n).astype(np.float32))
    return xyz, scales, rots, dens


def test_slab_chunking_matches_whole_grid():
    xyz, scales, rots, dens = _random_gaussians()
    kw = dict(center=(0.0, 0.0, 0.0), s_voxel=(2.0, 2.0, 2.0))
    whole = query(xyz, scales, rots, dens, n_voxel=(32, 32, 32),
                  backend="dense", **kw)["vol"]
    slabbed = query_volume(xyz, scales, rots, dens, n_voxel=(32, 32, 32),
                           backend="dense", slab=8, **kw)
    np.testing.assert_allclose(np.asarray(slabbed), np.asarray(whole),
                               rtol=1e-5, atol=1e-6)


def test_slab_pallas_matches_dense():
    xyz, scales, rots, dens = _random_gaussians(seed=3)
    kw = dict(center=(0.0, 0.0, 0.0), s_voxel=(2.0, 2.0, 2.0))
    dense = query_volume(xyz, scales, rots, dens, n_voxel=(32, 32, 32),
                         backend="dense", slab=16, **kw)
    pallas = query_volume(xyz, scales, rots, dens, n_voxel=(32, 32, 32),
                          backend="pallas", slab=16, **kw)
    err = np.abs(np.asarray(pallas) - np.asarray(dense)).max()
    scale = max(float(np.asarray(dense).max()), 1e-9)
    assert err / scale < 1e-5
