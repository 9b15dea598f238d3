"""Classical CT reconstruction algorithms (TIGRE equivalents: fdk, sart,
ossart, cgls — reference utils/ct_utils.py:60-215,
scripts/run_traditional_methods.py).

The forward operator A is the JAX ray-driven projector (ops/projector.py);
its exact adjoint A^T comes free as the VJP of the (order-1, differentiable)
trilinear sampling — no hand-written backprojector needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..dataset.geometry import angle2pose
from .fdk import fdk
from .projector import _project_one


def _make_ops(scanner_cfg, angles, n_voxel):
    """Return (A, At) closures mapping vol [nx,ny,nz] <-> projs [V,H,W]."""
    mode = 0 if scanner_cfg["mode"] == "parallel" else 1
    height, width = (int(v) for v in scanner_cfg["nDetector"])
    dsd = float(scanner_cfg["DSD"])
    s_det = scanner_cfg["sDetector"]
    tanfovx = float(s_det[1] / 2 / dsd) if mode else 1.0
    tanfovy = float(s_det[0] / 2 / dsd) if mode else 1.0
    n_vox = np.asarray(n_voxel)
    d_min = float(np.min(np.asarray(scanner_cfg["sVoxel"]) / n_vox))
    accuracy = float(scanner_cfg.get("accuracy", 0.5))
    max_path = float(np.linalg.norm(scanner_cfg["sVoxel"]))
    n_samples = int(np.ceil(max_path / (accuracy * d_min)))
    c2ws = jnp.asarray(
        np.stack([angle2pose(scanner_cfg["DSO"], float(a)) for a in angles]),
        jnp.float32,
    )
    off = jnp.asarray(scanner_cfg["offOrigin"], jnp.float32)
    s_vox = jnp.asarray(scanner_cfg["sVoxel"], jnp.float32)

    def project_all(vol):
        def one(c2w):
            return _project_one(
                vol, c2w, width=width, height=height, mode=mode,
                tanfovx=tanfovx, tanfovy=tanfovy, dsd=dsd,
                off_origin=off, s_voxel=s_vox, n_samples=n_samples,
            )
        return jax.lax.map(one, c2ws)

    a_fn = jax.jit(project_all)

    @jax.jit
    def at_fn(projs):
        _, vjp = jax.vjp(project_all, jnp.zeros(tuple(n_voxel), jnp.float32))
        return vjp(projs)[0]

    return a_fn, at_fn


def sart(projs, angles, scanner_cfg, n_iter: int = 20, lmbda: float = 1.0,
         lmbda_red: float = 0.999, n_voxel=None, nonneg: bool = True):
    """SART (simultaneous variant, TIGRE algs.sart equivalent): row- and
    column-normalized Landweber iterations with relaxation decay."""
    n_voxel = tuple(int(v) for v in (n_voxel or scanner_cfg["nVoxel"]))
    a_fn, at_fn = _make_ops(scanner_cfg, angles, n_voxel)
    projs = jnp.asarray(projs, jnp.float32)
    ones_vol = jnp.ones(n_voxel, jnp.float32)
    row_norm = a_fn(ones_vol)  # A 1
    col_norm = at_fn(jnp.ones_like(projs))  # A^T 1
    inv_row = jnp.where(row_norm > 1e-6, 1.0 / row_norm, 0.0)
    inv_col = jnp.where(col_norm > 1e-6, 1.0 / col_norm, 0.0)

    @jax.jit
    def step(vol, lam):
        resid = (projs - a_fn(vol)) * inv_row
        upd = at_fn(resid) * inv_col
        vol = vol + lam * upd
        return jnp.maximum(vol, 0.0) if nonneg else vol

    vol = jnp.zeros(n_voxel, jnp.float32)
    lam = lmbda
    for _ in range(n_iter):
        vol = step(vol, lam)
        lam = lam * lmbda_red
    return vol


def cgls(projs, angles, scanner_cfg, n_iter: int = 60, n_voxel=None):
    """CGLS on the normal equations (TIGRE algs.cgls equivalent)."""
    n_voxel = tuple(int(v) for v in (n_voxel or scanner_cfg["nVoxel"]))
    a_fn, at_fn = _make_ops(scanner_cfg, angles, n_voxel)
    b = jnp.asarray(projs, jnp.float32)

    x = jnp.zeros(n_voxel, jnp.float32)
    r = b - a_fn(x)
    s = at_fn(r)
    p = s
    gamma = jnp.sum(s * s)
    for _ in range(n_iter):
        q = a_fn(p)
        alpha = gamma / jnp.maximum(jnp.sum(q * q), 1e-30)
        x = x + alpha * p
        r = r - alpha * q
        s = at_fn(r)
        gamma_new = jnp.sum(s * s)
        beta = gamma_new / jnp.maximum(gamma, 1e-30)
        gamma = gamma_new
        p = s + beta * p
    return x


RECON_ALGS = {
    "fdk": lambda projs, angles, cfg, **kw: fdk(projs, angles, cfg),
    "sart": sart,
    "cgls": cgls,
}


def recon_volume(projs, angles, scanner_cfg, method: str = "fdk", **kw):
    """Reconstruct with a classical method (reference ct_utils.py:17-26)."""
    if method not in RECON_ALGS:
        raise ValueError(f"Unsupported reconstruction method {method}")
    return np.asarray(RECON_ALGS[method](projs, angles, scanner_cfg, **kw))
