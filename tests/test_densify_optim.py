"""Densification and optimizer unit tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from r2_gaussian_tpu.models.gaussians import (
    GaussianAux,
    GaussianParams,
    inverse_softplus,
    softplus,
)
from r2_gaussian_tpu.pipeline.densify import DensifyConfig, densify_and_prune
from r2_gaussian_tpu.pipeline.optim import (
    AdamState,
    adam_update,
    expon_lr,
    init_adam,
)


def make_state(n, cap=16, seed=0):
    rng = np.random.default_rng(seed)
    xyz = np.zeros((cap, 3), np.float32)
    xyz[:n] = rng.uniform(-0.5, 0.5, (n, 3))
    scaling = np.full((cap, 3), np.log(0.05), np.float32)  # raw (exp activation)
    rotation = np.zeros((cap, 4), np.float32)
    rotation[:, 0] = 1
    density = np.asarray(
        inverse_softplus(jnp.full((cap, 1), 0.5))
    )
    params = GaussianParams(
        jnp.asarray(xyz), jnp.asarray(scaling), jnp.asarray(rotation), jnp.asarray(density)
    )
    active = np.zeros(cap, bool)
    active[:n] = True
    aux = GaussianAux(
        active=jnp.asarray(active),
        max_radii2d=jnp.zeros(cap),
        xyz_gradient_accum=jnp.zeros(cap),
        denom=jnp.zeros(cap),
    )
    return params, init_adam(params), aux


BBOX = jnp.asarray([[-1.0, -1, -1], [1.0, 1, 1]])
CFG = DensifyConfig(
    grad_threshold=1e-4,
    min_density=1e-5,
    max_screen_size=None,
    max_scale=None,
    max_num_gaussians=1000,
    densify_scale_threshold=0.2,
)


def test_clone_small_high_grad():
    params, adam, aux = make_state(4)
    # gaussian 0 gets a high gradient stat; scale 0.05 <= 0.2 -> clone
    aux = aux._replace(
        xyz_gradient_accum=aux.xyz_gradient_accum.at[0].set(1.0),
        denom=aux.denom.at[0].set(1.0),
    )
    p, a, x, _, n = densify_and_prune(
        jax.random.PRNGKey(0), params, adam, aux, BBOX, CFG, None
    )
    assert int(n) == 5
    # both copies carry half density
    dens = softplus(p.density[:, 0])[np.asarray(x.active)]
    assert np.sum(np.isclose(np.sort(dens), 0.25)) == 2
    # stats reset after densification
    assert float(jnp.sum(x.xyz_gradient_accum)) == 0
    assert float(jnp.sum(x.denom)) == 0


def test_split_large_high_grad():
    params, adam, aux = make_state(4)
    # big (0.25 > 0.2) -> split; centered so children stay inside the bbox
    params = params._replace(
        scaling=params.scaling.at[1].set(np.log(0.25)),
        xyz=params.xyz.at[1].set(jnp.zeros(3)),
    )
    aux = aux._replace(
        xyz_gradient_accum=aux.xyz_gradient_accum.at[1].set(1.0),
        denom=aux.denom.at[1].set(1.0),
    )
    p, a, x, _, n = densify_and_prune(
        jax.random.PRNGKey(0), params, adam, aux, BBOX, CFG, None
    )
    # one split: -1 original +2 children = net +1
    assert int(n) == 5
    scales = np.exp(np.asarray(p.scaling))[np.asarray(x.active)]
    # children have scale 0.25/1.6
    assert np.sum(np.isclose(scales.max(1), 0.25 / 1.6)) == 2
    assert not np.any(np.isclose(scales.max(1), 0.25))


def test_prune_low_density_and_bbox():
    params, adam, aux = make_state(6)
    params = params._replace(
        density=params.density.at[2].set(-30.0),  # softplus ~ 0 < 1e-5
        xyz=params.xyz.at[3].set(jnp.asarray([2.0, 0, 0])),  # outside bbox
    )
    p, a, x, _, n = densify_and_prune(
        jax.random.PRNGKey(0), params, adam, aux, BBOX, CFG, None
    )
    assert int(n) == 4


def test_densify_stops_at_max():
    params, adam, aux = make_state(4)
    cfg = CFG._replace(max_num_gaussians=4)
    aux = aux._replace(
        xyz_gradient_accum=aux.xyz_gradient_accum.at[0].set(1.0),
        denom=aux.denom.at[0].set(1.0),
    )
    p, a, x, _, n = densify_and_prune(
        jax.random.PRNGKey(0), params, adam, aux, BBOX, cfg, None
    )
    assert int(n) == 4  # no clone happened
    # stats NOT reset when densification was skipped (no postfix ran)
    assert float(jnp.sum(x.xyz_gradient_accum)) == pytest.approx(1.0)


def test_adam_matches_torch_formula():
    params, adam, aux = make_state(2, cap=4)
    g = jax.tree.map(lambda a: jnp.ones_like(a) * 0.1, params)
    lrs = GaussianParams(
        xyz=jnp.float32(0.01), density=jnp.float32(0.01),
        scaling=jnp.float32(0.01), rotation=jnp.float32(0.01),
    )
    p1, s1 = adam_update(params, g, adam, lrs)
    # first step: m=0.1g*... -> update = lr * g/ (|g| + eps) = lr (bias-corrected)
    delta = np.asarray(p1.xyz - params.xyz)
    assert np.allclose(delta, -0.01, atol=1e-6)
    assert int(s1.step) == 1


def test_expon_lr_endpoints():
    assert float(expon_lr(0, 1e-2, 1e-3, 100)) == pytest.approx(1e-2, rel=1e-5)
    assert float(expon_lr(100, 1e-2, 1e-3, 100)) == pytest.approx(1e-3, rel=1e-5)
    assert float(expon_lr(50, 1e-2, 1e-3, 100)) == pytest.approx(
        np.sqrt(1e-2 * 1e-3), rel=1e-5
    )


def test_expon_lr_delay_warmup():
    # reference gaussian_utils.py:13-46: reverse-cosine ease-in scales the
    # schedule by lr_delay_mult at step 0, back to 1x at lr_delay_steps
    lr0 = float(expon_lr(0, 1e-2, 1e-3, 100, lr_delay_steps=10,
                         lr_delay_mult=0.1))
    assert lr0 == pytest.approx(1e-3, rel=1e-5)  # 0.1 * lr_init
    lr10 = float(expon_lr(10, 1e-2, 1e-3, 100, lr_delay_steps=10,
                          lr_delay_mult=0.1))
    undelayed = float(expon_lr(10, 1e-2, 1e-3, 100))
    assert lr10 == pytest.approx(undelayed, rel=1e-5)
    # mid-warmup follows lr_delay_mult + (1-m) sin(pi/2 * s/S)
    lr5 = float(expon_lr(5, 1e-2, 1e-3, 100, lr_delay_steps=10,
                         lr_delay_mult=0.1))
    expect = (0.1 + 0.9 * np.sin(0.5 * np.pi * 0.5)) * float(
        expon_lr(5, 1e-2, 1e-3, 100))
    assert lr5 == pytest.approx(expect, rel=1e-5)


def test_reset_density():
    import numpy as np

    from r2_gaussian_tpu.pipeline.densify import reset_density

    params, _adam, _aux = make_state(12)
    rng = np.random.default_rng(3)
    params = params._replace(density=jnp.asarray(
        rng.uniform(-2.0, 3.0, params.density.shape).astype(np.float32)))
    adam = init_adam(params)
    adam = adam._replace(m=adam.m._replace(
        density=jnp.ones_like(adam.m.density)))
    p2, a2 = reset_density(params, adam, cap=0.5)
    act = np.asarray(softplus(p2.density))
    assert act.max() <= 0.5 + 1e-5
    # untouched where already below the cap
    before = np.asarray(softplus(params.density))
    keep = before <= 0.5
    np.testing.assert_allclose(act[keep], before[keep], rtol=1e-5)
    assert np.all(np.asarray(a2.m.density) == 0.0)
    # other groups' moments untouched
    np.testing.assert_array_equal(np.asarray(a2.m.xyz),
                                  np.asarray(adam.m.xyz))
