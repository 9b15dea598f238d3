"""Multi-chip training: the REAL trainer under gaussian-axis sharding.

The reference is strictly single-GPU (SURVEY.md §2.1: no distributed
anything). The natural TPU scale-out exploits the order-independence of
X-ray accumulation: shard the gaussian SoA arrays over a mesh axis, let each
device render a partial image / TV sub-volume from its shard, and `psum`
over ICI — exact, because the render is a pure sum over gaussians.

This module does NOT re-implement the train step. `pipeline.trainer.Trainer`
takes a `mesh` argument and runs its own jitted K-step body (Pallas or dense
backend, shared Adam via pipeline.optim, densification stats, skip flags)
under `jax.shard_map`; densification events all-gather, run the global
jitted event, and re-shard contiguous row ranges. Single-chip and sharded
trajectories are therefore identical up to f32 summation order
(tests/test_multichip.py asserts full-step equivalence across a densify
event).
"""

from __future__ import annotations

import numpy as np

from .sharding import make_mesh


def tiny_problem(n_gauss: int, det: int = 32, n_views: int = 4, seed: int = 0):
    """A small synthetic scene + gaussian init for dryruns and tests."""
    import types

    import jax.numpy as jnp

    from ..dataset.geometry import build_cameras
    from ..models.gaussians import create_from_pcd
    from ..ops.dense_reference import render_dense
    from ..models.preprocess import cov3d_components, preprocess

    scanner = {
        "mode": "cone", "DSD": 7.0, "DSO": 5.0,
        "nDetector": [det, det], "sDetector": [4.0, 4.0],
        "nVoxel": [32, 32, 32], "sVoxel": [2.0, 2.0, 2.0],
        "dVoxel": [2.0 / 32] * 3,
        "offOrigin": [0.0, 0.0, 0.0], "offDetector": [0.0, 0.0],
    }
    rng = np.random.default_rng(seed)
    gt_xyz = rng.uniform(-0.5, 0.5, (n_gauss, 3)).astype(np.float32)
    gt_dens = rng.uniform(0.2, 0.8, n_gauss).astype(np.float32)

    angles = np.linspace(0, 2 * np.pi, n_views + 1)[:-1]
    # Render self-consistent "measurements" from a perturbed copy so the
    # first training steps have meaningful gradients.
    cams0 = build_cameras(
        angles, np.zeros((n_views, det, det), np.float32),
        [str(i) for i in range(n_views)], scanner,
    )
    scale_bound = (0.005, 0.5)
    params, aux = create_from_pcd(gt_xyz, gt_dens, scale_bound, capacity=n_gauss)
    from ..models.gaussians import activate

    xyz, scales, rots, dens = activate(params, scale_bound)
    # Render measurements from a perturbed copy, NOT the init itself:
    # otherwise the training residual is pure f32 rounding noise and
    # equivalence tests would be comparing summation-order artifacts.
    dens = dens * jnp.asarray(
        rng.uniform(0.7, 1.4, dens.shape[0]).astype(np.float32)
    )
    xyz = xyz + jnp.asarray(
        rng.normal(0.0, 0.01, (dens.shape[0], 3)).astype(np.float32)
    )
    imgs = []
    for i in range(n_views):
        cov3d = cov3d_components(scales, rots)
        prep = preprocess(
            xyz, cov3d, dens, jnp.asarray(cams0.w2c[i]),
            jnp.asarray(cams0.full_proj[i]), width=det, height=det,
            tanfovx=cams0.tanfovx, tanfovy=cams0.tanfovy, mode=cams0.mode,
            active=aux.active,
        )
        imgs.append(np.asarray(render_dense(prep, width=det, height=det)))
    cams = build_cameras(
        angles, np.stack(imgs), [str(i) for i in range(n_views)], scanner
    )

    opt = types.SimpleNamespace(
        iterations=10_000,
        position_lr_init=2e-4, position_lr_final=2e-5, position_lr_max_steps=100,
        density_lr_init=1e-2, density_lr_final=1e-3, density_lr_max_steps=100,
        scaling_lr_init=5e-3, scaling_lr_final=5e-4, scaling_lr_max_steps=100,
        rotation_lr_init=1e-3, rotation_lr_final=1e-4, rotation_lr_max_steps=100,
        lambda_dssim=0.25, lambda_tv=0.05, tv_vol_size=8,
        densify_from_iter=2, densification_interval=4, densify_until_iter=100,
        densify_grad_threshold=1e-7, densify_scale_threshold=0.1,
        density_min_threshold=1e-5, max_screen_size=None, max_scale=None,
        max_num_gaussians=500_000,
    )
    return cams, scanner, opt, scale_bound, params, aux


def canonical_state_rows(state):
    """Active rows of every per-gaussian leaf of a TrainState, in a
    canonical (content-sorted) order, as numpy arrays.

    The densify compaction sorts by Morton code; f32 summation-order noise
    (~1e-8) can flip a Morton bit and permute a few rows between a sharded
    and a single-device trajectory, so rows are matched by sorting on their
    (position, density, scaling) content instead of buffer order. Exact
    clone duplicates (densify copies the whole params row, so every param
    key ties) are disambiguated by total Adam-moment magnitude: the fresh
    clone starts with zeroed moments while the original keeps its history,
    which orders the pair identically in both trajectories. Shared by the
    sharded-vs-single equivalence test (tests/test_multichip.py) and the
    driver dryrun below."""
    import jax

    act = np.asarray(state.aux.active)
    n_act = int(act.sum())
    xyz = np.asarray(state.params.xyz)[act]
    den = np.asarray(state.params.density)[act, 0]
    scal = np.asarray(state.params.scaling)[act]
    mom = np.zeros(n_act, np.float64)
    for leaf in jax.tree_util.tree_leaves(state.adam):
        leaf = np.asarray(leaf)
        if leaf.ndim >= 1 and leaf.shape[0] == act.shape[0]:
            mom += np.abs(leaf[act].astype(np.float64)).reshape(n_act, -1).sum(1)
    order = np.lexsort(
        (mom, scal[:, 2], scal[:, 1], scal[:, 0], den,
         xyz[:, 2], xyz[:, 1], xyz[:, 0]))
    out = {}
    for name in ("params", "adam", "aux"):
        tree = jax.tree.map(np.asarray, getattr(state, name))
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = name + jax.tree_util.keystr(path)
            if leaf.ndim >= 1 and leaf.shape[0] == act.shape[0]:
                out[key] = leaf[act][order]
            else:
                out[key] = leaf
    return out


def leaf_budget(key):
    """(rtol, atol) equivalence budget for a canonical state leaf. Rotation
    gradients of near-isotropic gaussians are differences of
    near-cancelling terms; psum summation-order noise is amplified through
    Adam's m/sqrt(v) normalization into ~1e-4 wiggle on the (order-1)
    quaternions. Everything else matches to f32 tolerance."""
    return (2e-3, 2e-3) if "rotation" in key else (2e-3, 2e-5)


def per_leaf_equivalence(state_a, state_b):
    """Per-leaf sharded-vs-single deltas, each normalized against its
    rtol/atol budget. Returns (ok, report) where report[key] =
    {max_abs, rtol, atol, budget_frac} and budget_frac <= 1 means the leaf
    is within budget (max over elements of |a-b| / (atol + rtol*|a|))."""
    a = canonical_state_rows(state_a)
    b = canonical_state_rows(state_b)
    assert a.keys() == b.keys()
    report = {}
    ok = True
    for key in a:
        x, y = np.asarray(a[key], np.float64), np.asarray(b[key], np.float64)
        assert x.shape == y.shape, (key, x.shape, y.shape)
        if x.size == 0 or not np.issubdtype(x.dtype, np.floating):
            continue
        rtol, atol = leaf_budget(key)
        d = np.abs(x - y)
        frac = float((d / (atol + rtol * np.abs(x))).max())
        report[key] = {"max_abs": float(d.max()), "rtol": rtol, "atol": atol,
                       "budget_frac": round(frac, 4)}
        ok = ok and frac <= 1.0
    return ok, report


def summarize_dryrun(n_devices: int, r: dict) -> str:
    """One unambiguous pass/fail line for the driver artifact: every leaf's
    delta is reported as a fraction of its own rtol/atol budget (<= 1
    passes), so no raw near-zero-denominator relative number appears."""
    worst_key, worst = r["worst_leaf"]
    n_leaves = len(r["leaf_deltas"])
    return (
        f"dryrun_multichip({n_devices}): sharded chunk OK across densify + "
        f"capacity growth {r['capacity'][0]}->{r['capacity'][1]}, "
        f"loss={r['loss']:.4f}, n_active={r['n_active']}; sharded-vs-single "
        f"full-state equivalence: PASS — all {n_leaves} state leaves within "
        f"their rtol/atol budgets; worst leaf {worst_key}: max_abs="
        f"{worst['max_abs']:.2e} at {100 * worst['budget_frac']:.1f}% of its "
        f"budget (rtol={worst['rtol']:g}, atol={worst['atol']:g})"
    )


def dryrun(n_devices: int, n_per_device: int = 128, det: int = 32,
           backend: str = "pallas") -> dict:
    """Build an n-device mesh and run the FULL sharded training step — the
    production Trainer's jitted shard_map body (render + TV-query psum,
    densification stats, skip flags, shared Adam) — for one dispatch chunk
    that crosses a densification event AND a capacity-growth (buffer
    doubling) event, on tiny shapes. Then runs the identical problem on a
    single device and reports the sharded-vs-single trajectory deltas.

    backend defaults to "pallas" so the driver-checked multi-chip artifact
    lowers the actual production splat kernels under shard_map (interpret
    mode on the virtual CPU mesh), not just the dense oracle path.

    Returns {loss, n_active, capacity: (before, after), equiv_ok,
    max_abs_delta, worst_leaf, leaf_deltas} — the sharded-vs-single
    full-state equivalence measurement (params + Adam moments + densify
    stats over canonically matched rows), each leaf checked against its
    rtol/atol budget from `leaf_budget` (budget_frac <= 1 passes).
    """
    from ..pipeline.trainer import Trainer

    mesh = make_mesh(n_devices)
    # capacity must be divisible by n_devices*128 (block-aligned shards)
    n = max(n_devices * n_per_device, n_devices * 128)
    sharded = Trainer(*tiny_problem(n, det=det), backend=backend, mesh=mesh,
                      seed=3)
    cap0 = int(sharded.state.params.capacity)
    # 8 iterations: crosses the iter-4 densify boundary -> exercises the
    # sharded step, the replicate->densify->reshard path, a capacity
    # doubling (init is at full capacity and every gaussian clones under
    # the 1e-7 grad threshold), and a second sharded dispatch after the
    # event.
    metrics, n_active = sharded.run_chunk(8)
    cap1 = int(sharded.state.params.capacity)
    loss = float(metrics[-1, 0])
    assert np.isfinite(loss), loss
    assert n_active is not None and n_active > 0, n_active
    assert cap1 > cap0, (
        f"dryrun did not cross a capacity-growth event ({cap0} -> {cap1})")

    single = Trainer(*tiny_problem(n, det=det), backend=backend, seed=3)
    m1, n1 = single.run_chunk(8)
    assert n1 == n_active, (n1, n_active)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(metrics),
                               rtol=2e-4, atol=1e-5)
    ok, report = per_leaf_equivalence(single.state, sharded.state)
    assert ok, {k: v for k, v in report.items() if v["budget_frac"] > 1.0}
    worst = max(report, key=lambda k: report[k]["budget_frac"])
    return {
        "loss": loss, "n_active": int(n_active),
        "capacity": (cap0, cap1),
        "equiv_ok": ok,
        "max_abs_delta": max(v["max_abs"] for v in report.values()),
        "worst_leaf": (worst, report[worst]),
        "leaf_deltas": report,
    }
