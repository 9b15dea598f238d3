"""Polyak/EMA evaluation parameters (opt.ema_decay — framework extension
beyond the reference): update recursion, densify-event row surgery,
checkpoint roundtrip, and sharded equivalence."""

import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from r2_gaussian_tpu.parallel.train_sharded import tiny_problem
from r2_gaussian_tpu.pipeline.checkpoint import load_checkpoint, save_checkpoint
from r2_gaussian_tpu.pipeline.trainer import Trainer


def with_ema(prob, decay):
    cams, scanner, opt, scale_bound, params, aux = prob
    opt = types.SimpleNamespace(**vars(opt), ema_decay=decay)
    return cams, scanner, opt, scale_bound, params, aux


def assert_tree_allclose(a, b, **tol):
    for (pa, la), (_, lb) in zip(
        jax.tree_util.tree_flatten_with_path(a)[0],
        jax.tree_util.tree_flatten_with_path(b)[0],
    ):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   err_msg=str(pa), **tol)


def test_ema_decay_zero_tracks_params_through_densify():
    """With decay=0 the average IS the last iterate, and the densify-event
    EMA surgery must preserve that identity exactly (clone halving, split
    children, prune, compaction reorder)."""
    trainer = Trainer(*with_ema(tiny_problem(256, det=32), 1e-9), seed=2)
    # make decay exactly 0 in the traced update: rebuild with decay 0 but an
    # ema present (Trainer only creates ema when decay > 0)
    trainer2 = Trainer(*with_ema(tiny_problem(256, det=32), 0.0), seed=2)
    trainer2.state = trainer2.state._replace(
        ema=jax.tree.map(jnp.copy, trainer2.state.params))
    # 8 iters cross densify events at iters 4 and 8 (tiny_problem opt)
    trainer2.run_chunk(8)
    assert trainer2.state.ema is not None
    assert_tree_allclose(trainer2.state.ema, trainer2.state.params,
                         rtol=0, atol=0)


def test_ema_update_recursion():
    """ema_k = d * ema_{k-1} + (1-d) * params_k on non-densify iterations."""
    d = 0.75
    trainer = Trainer(*with_ema(tiny_problem(256, det=32), d), seed=4)
    # tiny_problem densifies from iter 2 every 4: iterations 1..3 include
    # only the iter-? boundary... run single steps and track manually,
    # skipping iterations where the trainer skipped the update.
    ema_ref = jax.tree.map(np.asarray, trainer.state.params)
    for _ in range(3):
        it = trainer.iteration + 1
        trainer.run_chunk(1)
        skipped = trainer._is_densify_iter(it)
        if not skipped:
            p = jax.tree.map(np.asarray, trainer.state.params)
            ema_ref = jax.tree.map(lambda e, q: d * e + (1 - d) * q, ema_ref, p)
        assert_tree_allclose(trainer.state.ema, ema_ref, rtol=2e-6, atol=1e-7)


def test_ema_checkpoint_roundtrip(tmp_path):
    trainer = Trainer(*with_ema(tiny_problem(256, det=32), 0.9), seed=7)
    trainer.run_chunk(5)  # crosses the iter-4 event
    path = str(tmp_path / "ck.pickle")
    save_checkpoint(path, trainer.state, trainer.iteration, trainer.scale_bound)
    state, it, _ = load_checkpoint(path)
    assert it == 5 and state.ema is not None
    assert_tree_allclose(state.ema, trainer.state.ema, rtol=0, atol=0)

    # pre-EMA checkpoints load with ema=None
    noema = Trainer(*tiny_problem(256, det=32), seed=7)
    save_checkpoint(path, noema.state, 0, noema.scale_bound)
    state, _, _ = load_checkpoint(path)
    assert state.ema is None


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ema_sharded_matches_single():
    """The EMA leaves shard like params and the sharded trajectory must
    reproduce the single-device average across densify events."""
    from r2_gaussian_tpu.parallel.sharding import make_mesh

    n = 1024
    single = Trainer(*with_ema(tiny_problem(n, det=32), 0.9), seed=5,
                     backend="dense")
    sharded = Trainer(*with_ema(tiny_problem(n, det=32), 0.9), seed=5,
                      backend="dense", mesh=make_mesh(8))
    single.run_chunk(8)
    sharded.run_chunk(8)
    act1 = np.asarray(single.state.aux.active)
    act2 = np.asarray(sharded.state.aux.active)
    np.testing.assert_array_equal(act2, act1)
    np.testing.assert_allclose(
        np.asarray(sharded.state.ema.xyz)[act2],
        np.asarray(single.state.ema.xyz)[act1], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sharded.state.ema.density)[act2],
        np.asarray(single.state.ema.density)[act1], rtol=1e-3, atol=1e-5)
