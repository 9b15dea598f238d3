"""Row-slice hot path (trainer n_rows bucket): the train step may run
render/TV on params[:n_rows] because active rows are a prefix of the padded
arrays. Guards (a) the prefix invariant densify must maintain and (b) exact
equivalence of the sliced and full-capacity steps."""

import types

import numpy as np
import jax.numpy as jnp

from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.gaussians import (
    GaussianAux,
    GaussianParams,
    create_from_pcd,
    inverse_softplus,
)
from r2_gaussian_tpu.ops.phantom import gaussian_blobs
from r2_gaussian_tpu.ops.projector import project
from r2_gaussian_tpu.pipeline.densify import DensifyConfig, densify_and_prune
from r2_gaussian_tpu.pipeline.optim import init_adam
from r2_gaussian_tpu.pipeline.trainer import Trainer

import jax


def test_active_rows_stay_a_prefix_after_densify():
    """Clone/split/prune + compaction must leave actives as a prefix (the
    row-slice bucket relies on it; densify.py _compaction_order sorts
    ~active last)."""
    cap, n = 64, 20
    rng = np.random.default_rng(0)
    xyz = np.zeros((cap, 3), np.float32)
    xyz[:n] = rng.uniform(-0.5, 0.5, (n, 3))
    scaling = np.full((cap, 3), np.log(0.05), np.float32)
    rotation = np.zeros((cap, 4), np.float32)
    rotation[:, 0] = 1
    density = np.array(inverse_softplus(jnp.full((cap, 1), 0.5)))
    # rows 3..7 fall below the prune threshold -> holes before compaction
    density[3:8] = np.array(inverse_softplus(jnp.full((5, 1), 1e-7)))
    params = GaussianParams(jnp.asarray(xyz), jnp.asarray(scaling),
                            jnp.asarray(rotation), jnp.asarray(density))
    active = np.zeros(cap, bool)
    active[:n] = True
    grads = np.zeros(cap, np.float32)
    grads[:n] = rng.uniform(0, 2e-4, n)  # some above threshold -> clone/split
    aux = GaussianAux(
        active=jnp.asarray(active),
        max_radii2d=jnp.zeros(cap),
        xyz_gradient_accum=jnp.asarray(grads),
        denom=jnp.ones(cap),
    )
    cfg = DensifyConfig(
        grad_threshold=1e-4, min_density=1e-5, max_screen_size=None,
        max_scale=None, max_num_gaussians=60, densify_scale_threshold=0.1,
    )
    bbox = jnp.asarray([[-1.0, -1, -1], [1.0, 1, 1]])
    p, a, x, e, n_new = densify_and_prune(
        jax.random.PRNGKey(1), params, init_adam(params), aux, bbox, cfg,
        None,
    )
    act = np.asarray(x.active)
    n_new = int(n_new)
    assert act[:n_new].all()
    assert not act[n_new:].any()


def _scene():
    vol = gaussian_blobs(24, n_blobs=4, seed=3)
    scanner = {
        "mode": "cone", "DSD": 7.0, "DSO": 5.0,
        "nDetector": [24, 24], "sDetector": [2.0, 2.0],
        "nVoxel": [24, 24, 24], "sVoxel": [2.0, 2.0, 2.0],
        "dVoxel": [2.0 / 24] * 3,
        "offOrigin": [0.0, 0.0, 0.0], "offDetector": [0.0, 0.0],
        "accuracy": 0.5, "totalAngle": 360.0, "startAngle": 0.0,
    }
    angles = np.linspace(0, 2 * np.pi, 7)[:-1]
    projs = project(vol, angles, scanner)
    cams = build_cameras(angles, projs, [f"{i}" for i in range(6)], scanner)
    return scanner, cams


def _opt(iterations=60):
    return types.SimpleNamespace(
        iterations=iterations,
        position_lr_init=2e-4, position_lr_final=2e-5, position_lr_max_steps=iterations,
        density_lr_init=1e-2, density_lr_final=1e-3, density_lr_max_steps=iterations,
        scaling_lr_init=5e-3, scaling_lr_final=5e-4, scaling_lr_max_steps=iterations,
        rotation_lr_init=1e-3, rotation_lr_final=1e-4, rotation_lr_max_steps=iterations,
        lambda_dssim=0.25, lambda_tv=0.05, tv_vol_size=8,
        density_min_threshold=1e-5,
        densification_interval=25, densify_from_iter=10, densify_until_iter=50,
        densify_grad_threshold=5e-5, densify_scale_threshold=0.1,
        max_screen_size=None, max_scale=None, max_num_gaussians=2000,
    )


def _trainers(opt):
    scanner, cams = _scene()
    rng = np.random.default_rng(1)
    pos = rng.uniform(-0.4, 0.4, (300, 3)).astype(np.float32)
    dens = rng.uniform(0.05, 0.4, 300).astype(np.float32)
    # capacity 32768 with 300 live rows -> bucket 8192 < capacity: the
    # sliced fn really slices
    p1, a1 = create_from_pcd(pos, dens, None, capacity=32768)
    p2, a2 = create_from_pcd(pos, dens, None, capacity=32768)
    tr_sliced = Trainer(cams, scanner, opt, None, p1, a1, backend="dense",
                        seed=0)
    assert tr_sliced._row_bucket() == 8192
    tr_full = Trainer(cams, scanner, opt, None, p2, a2, backend="dense",
                      seed=0)
    tr_full._row_bucket = lambda: None
    return tr_sliced, tr_full, p1


def test_sliced_fwd_bwd_matches_full_capacity():
    """The sliced hot path must compute the same forward losses AND the
    same backward densify statistics as the full-capacity step. Run with
    all learning rates at 0 so params never move (no Adam amplification of
    CPU reduction-order noise — on TPU the shapes are bit-exact, but CPU
    tiles 8192- vs 32768-row reductions differently) and compare the
    accumulated d2-gradient norms / radii / visibility denominators, which
    are pure functions of the fwd+bwd at each identical state."""
    opt = _opt()
    for g in ("position", "density", "scaling", "rotation"):
        setattr(opt, f"{g}_lr_init", 0.0)
        setattr(opt, f"{g}_lr_final", 0.0)
    opt.densify_from_iter = 100  # no event: keep states identical
    tr_sliced, tr_full, p1 = _trainers(opt)
    m1, n1 = tr_sliced.run_chunk(40)
    m2, n2 = tr_full.run_chunk(40)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                               rtol=1e-6, atol=1e-9)
    assert n1 == n2
    for f in ("xyz_gradient_accum", "max_radii2d", "denom"):
        np.testing.assert_allclose(
            np.asarray(getattr(tr_sliced.state.aux, f)),
            np.asarray(getattr(tr_full.state.aux, f)),
            rtol=1e-5, atol=1e-9, err_msg=f,
        )
    for f in p1._fields:  # lr=0: params must be exactly untouched
        np.testing.assert_array_equal(
            np.asarray(getattr(tr_sliced.state.params, f)),
            np.asarray(getattr(tr_full.state.params, f)), err_msg=f,
        )


def test_sliced_dynamics_match_at_trajectory_level():
    """Full 40-iteration dynamics crossing the densify event at iter 25.
    Per-element param equality is NOT a property of the optimization on
    CPU: with Adam eps=1e-15 the first step is exactly lr*sign(g), so any
    near-zero gradient whose sign flips under a different reduction order
    diverges by a full lr immediately (on TPU the run is bit-exact). What
    must hold anywhere: identical per-chunk losses to reduction-order
    tolerance, identical discrete densify decisions, and an equally good
    final state."""
    tr_sliced, tr_full, _ = _trainers(_opt())
    m1, n1 = tr_sliced.run_chunk(40)
    m2, n2 = tr_full.run_chunk(40)
    m1, m2 = np.asarray(m1), np.asarray(m2)
    np.testing.assert_allclose(m1, m2, rtol=1e-3, atol=1e-7)
    assert n1 == n2
    assert int(tr_sliced.state.aux.n_active) > 300  # densify event crossed
    assert (int(tr_sliced.state.aux.n_active)
            == int(tr_full.state.aux.n_active))
    np.testing.assert_array_equal(
        np.asarray(tr_sliced.state.aux.active),
        np.asarray(tr_full.state.aux.active),
    )
