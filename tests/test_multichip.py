"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_train_step_runs_and_matches_replicated():
    from r2_gaussian_tpu.parallel.train_sharded import dryrun

    r = dryrun(8, n_per_device=64, det=32)
    assert np.isfinite(r["loss"])
    assert r["capacity"][1] > r["capacity"][0]
    assert r["equiv_ok"], r["worst_leaf"]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_trainer_matches_single_device_across_densify():
    """Full-step equivalence: the mesh-sharded Trainer must reproduce the
    single-device trajectory (params, Adam moments, densify stats, active
    mask) across multiple dispatches INCLUDING a densification event, within
    f32 summation-order tolerance."""
    from r2_gaussian_tpu.parallel.sharding import make_mesh
    from r2_gaussian_tpu.parallel.train_sharded import tiny_problem
    from r2_gaussian_tpu.pipeline.trainer import Trainer

    n = 1024  # divisible by 8 devices * 128-gaussian blocks
    prob = tiny_problem(n, det=32)

    single = Trainer(*prob, backend="dense", seed=3)
    sharded = Trainer(*tiny_problem(n, det=32), backend="dense", seed=3,
                      mesh=make_mesh(8))

    # opt densifies every 4 iters from iter 2: run 2 dispatches = 8 iters,
    # crossing events at iters 4 and 8.
    m1, n1 = single.run_chunk(8)
    m2, n2 = sharded.run_chunk(8)

    assert n1 == n2 and n1 is not None
    np.testing.assert_allclose(m2, m1, rtol=2e-4, atol=1e-5)

    from r2_gaussian_tpu.parallel.train_sharded import per_leaf_equivalence

    # Budgets live in train_sharded.leaf_budget (rotation quaternions get a
    # wider atol: psum summation-order noise amplified through Adam's
    # m/sqrt(v) normalization); the driver dryrun asserts the same check.
    ok, report = per_leaf_equivalence(single.state, sharded.state)
    assert ok, {k: v for k, v in report.items() if v["budget_frac"] > 1.0}


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_trainer_pallas_backend():
    """The Pallas splat kernels must run (and differentiate) under
    shard_map ACROSS a densification event: 8 iterations with
    backend='pallas' (interpret mode on CPU) cross the iter-4 and iter-8
    densify boundaries, exercising pallas + shard_map +
    replicate->densify->reshard together, and must match the single-device
    pallas trajectory."""
    from r2_gaussian_tpu.parallel.sharding import make_mesh
    from r2_gaussian_tpu.parallel.train_sharded import tiny_problem
    from r2_gaussian_tpu.pipeline.trainer import Trainer

    n = 1024
    single = Trainer(*tiny_problem(n, det=32), backend="pallas", seed=5)
    sharded = Trainer(*tiny_problem(n, det=32), backend="pallas", seed=5,
                      mesh=make_mesh(8))
    m1, n1 = single.run_chunk(8)
    m2, n2 = sharded.run_chunk(8)
    assert n1 == n2 and n1 is not None
    np.testing.assert_allclose(m2, m1, rtol=2e-4, atol=1e-5)
    act1 = np.asarray(single.state.aux.active)
    act2 = np.asarray(sharded.state.aux.active)
    np.testing.assert_array_equal(act2, act1)
    np.testing.assert_allclose(
        np.asarray(sharded.state.params.xyz)[act2],
        np.asarray(single.state.params.xyz)[act1],
        rtol=1e-3, atol=1e-6,
    )


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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_checkpoint_restore_into_sharded_trainer(tmp_path):
    """train.py's --start_checkpoint + --n_devices path (train.py:224-232):
    a single-device checkpoint restored into a mesh-sharded Trainer via
    shard_train_state must continue on the single-device trajectory."""
    from r2_gaussian_tpu.parallel.sharding import make_mesh, shard_train_state
    from r2_gaussian_tpu.parallel.train_sharded import tiny_problem
    from r2_gaussian_tpu.pipeline.checkpoint import (load_checkpoint,
                                                     save_checkpoint)
    from r2_gaussian_tpu.pipeline.trainer import Trainer

    n = 1024
    single = Trainer(*tiny_problem(n, det=32), backend="dense", seed=13)
    single.run_chunk(4)  # crosses the iter-4 densify event
    ckpt = tmp_path / "chkpnt4.pickle"
    save_checkpoint(str(ckpt), single.state, single.iteration,
                    single.scale_bound)
    m_ref, n_ref = single.run_chunk(4)

    mesh = make_mesh(8)
    sharded = Trainer(*tiny_problem(n, det=32), backend="dense", seed=13,
                      mesh=mesh)
    state, it, _ = load_checkpoint(str(ckpt))
    sharded.state = shard_train_state(state, mesh)
    sharded.iteration = it
    m_new, n_new = sharded.run_chunk(4)

    assert n_ref == n_new
    np.testing.assert_allclose(np.asarray(m_new), np.asarray(m_ref),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sharded.state.params.xyz),
        np.asarray(single.state.params.xyz), rtol=1e-3, atol=1e-6)
