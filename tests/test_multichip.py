"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_train_step_runs_and_matches_replicated():
    from r2_gaussian_tpu.parallel.train_sharded import dryrun

    loss = dryrun(8, n_per_device=64, det=32)
    assert np.isfinite(loss)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_sharded_render_matches_single_device():
    """Gaussian-sharded render psum must equal the single-device render
    (exact: the X-ray accumulation is order independent)."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from r2_gaussian_tpu.dataset.geometry import build_cameras
    from r2_gaussian_tpu.models.render import render
    from r2_gaussian_tpu.parallel.sharding import make_mesh, shard_gaussians

    det = 48
    scanner = {
        "mode": "parallel", "DSD": 7.0, "DSO": 5.0,
        "nDetector": [det, det], "sDetector": [2.0, 2.0],
        "nVoxel": [32] * 3, "sVoxel": [2.0] * 3,
        "offOrigin": [0, 0, 0], "offDetector": [0, 0],
    }
    cams = build_cameras([0.7], np.zeros((1, det, det), np.float32), ["v"], scanner)
    rng = np.random.default_rng(0)
    n = 256
    xyz = jnp.asarray(rng.uniform(-0.7, 0.7, (n, 3)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.02, 0.1, (n, 3)).astype(np.float32))
    rots = rng.standard_normal((n, 4)).astype(np.float32)
    rots = jnp.asarray(rots / np.linalg.norm(rots, axis=1, keepdims=True))
    dens = jnp.asarray(rng.uniform(0.1, 1.0, n).astype(np.float32))
    w2c, fp = jnp.asarray(cams.w2c[0]), jnp.asarray(cams.full_proj[0])

    def render_one(xyz, scales, rots, dens):
        return render(
            xyz, scales, rots, dens, w2c=w2c, full_proj=fp,
            width=det, height=det, tanfovx=1.0, tanfovy=1.0, mode=0,
            backend="dense",
        )["render"]

    ref = render_one(xyz, scales, rots, dens)

    mesh = make_mesh(4)

    @partial(jax.shard_map, mesh=mesh, in_specs=(P("g"),) * 4, out_specs=P())
    def sharded(xyz, scales, rots, dens):
        return jax.lax.psum(render_one(xyz, scales, rots, dens), "g")

    args = [shard_gaussians(a, mesh) for a in (xyz, scales, rots, dens)]
    got = jax.jit(sharded)(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)
