"""Checkpoint restore edge cases.

The capacity-flexible restore path (pipeline/checkpoint.py) must tolerate a
restore into a config whose max_num_gaussians is SMALLER than the
checkpoint's live count: densification growth must stop (budget 0), pruning
must still work, and _maybe_grow_capacity must not assume n <= limit.
"""

import numpy as np

from r2_gaussian_tpu.parallel.train_sharded import tiny_problem
from r2_gaussian_tpu.pipeline.checkpoint import load_checkpoint, save_checkpoint
from r2_gaussian_tpu.pipeline.trainer import Trainer


def test_restore_into_smaller_budget_config(tmp_path):
    prob = tiny_problem(256, det=32)
    trainer = Trainer(*prob, backend="dense", seed=7)
    # run across two densify events (iters 4 and 8) so n grows beyond 256
    trainer.run_chunk(8)
    n_grown = int(trainer.state.aux.n_active)
    assert n_grown > 256, "precondition: densify must have grown the model"

    ckpt = tmp_path / "chkpnt8.pickle"
    save_checkpoint(str(ckpt), trainer.state, trainer.iteration,
                    trainer.scale_bound)

    # New config: budget below the checkpoint's live count.
    cams, scanner, opt, scale_bound, params, aux = tiny_problem(256, det=32)
    opt.max_num_gaussians = n_grown - 32
    restored = Trainer(cams, scanner, opt, scale_bound, params, aux,
                       backend="dense", seed=7)
    state, it, sb = load_checkpoint(str(ckpt))
    restored.state = state
    restored.iteration = it
    assert (sb is None and scale_bound is None) or tuple(sb) == tuple(scale_bound)

    # cross two more densify events with n_active > max_num_gaussians
    metrics, n_after = restored.run_chunk(8)
    assert np.all(np.isfinite(np.asarray(metrics)))
    # densification growth is budget-clamped to zero past the limit; only
    # pruning may change the count (reference gaussian_model.py:503-516)
    assert n_after <= n_grown
    assert restored.state.params.capacity >= n_after


def test_restore_roundtrip_continues_identically(tmp_path):
    """Save at iter 4, restore into a fresh trainer, and the next chunk must
    match the uninterrupted trajectory exactly (same jitted step, same
    rng derivation from the iteration counter)."""
    trainer_a = Trainer(*tiny_problem(256, det=32), backend="dense", seed=11)
    trainer_a.run_chunk(4)
    ckpt = tmp_path / "chkpnt4.pickle"
    save_checkpoint(str(ckpt), trainer_a.state, trainer_a.iteration,
                    trainer_a.scale_bound)
    m_ref, n_ref = trainer_a.run_chunk(4)

    cams, scanner, opt, scale_bound, params, aux = tiny_problem(256, det=32)
    trainer_b = Trainer(cams, scanner, opt, scale_bound, params, aux,
                        backend="dense", seed=11)
    state, it, _ = load_checkpoint(str(ckpt))
    trainer_b.state = state
    trainer_b.iteration = it
    m_new, n_new = trainer_b.run_chunk(4)

    assert n_ref == n_new
    np.testing.assert_allclose(np.asarray(m_new), np.asarray(m_ref),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(trainer_b.state.params.xyz),
        np.asarray(trainer_a.state.params.xyz), rtol=1e-6, atol=1e-7)
