"""FDK / FBP reconstruction in JAX (TIGRE `algs.fdk` equivalent, used for
point-cloud initialization: reference utils/ct_utils.py:17-26,
initialize_pcd.py:59-89).

Cone beam: Feldkamp-Davis-Kress — cosine weighting on a virtual detector
through the origin, row-wise Ram-Lak filtering (FFT linear convolution),
distance-weighted backprojection. Parallel beam: classical FBP.

Geometry matches the forward projector (ops/projector.py) and hence the
renderer: pixel (row v, col u) <-> NDC via ndc2pix inverse.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..dataset.geometry import angle2pose


def _ramlak_kernel(n: int, du: float) -> np.ndarray:
    """Discrete spatial-domain Ram-Lak kernel (classical FBP filter)."""
    idx = np.arange(-n + 1, n)
    h = np.zeros_like(idx, np.float64)
    h[idx == 0] = 1.0 / (4.0 * du * du)
    odd = idx % 2 != 0
    h[odd] = -1.0 / (np.pi * idx[odd] * du) ** 2
    return h


def _filter_rows(projs, du: float) -> jnp.ndarray:
    """Ramp-filter each detector row (last axis) by FFT linear convolution.
    projs: [..., W].

    Runs on the host with numpy: FFT is unsupported by some TPU runtimes
    (and this is one-time initialization work, not the training hot path).
    """
    projs = np.asarray(projs, np.float64)
    w = projs.shape[-1]
    h = _ramlak_kernel(w, du)
    size = int(2 ** np.ceil(np.log2(2 * w)))
    # keep the kernel's linear phase (it is laid out shifted by w-1)
    hf = np.fft.rfft(h, size)
    pf = np.fft.rfft(projs, size, axis=-1)
    q = np.fft.irfft(pf * hf, size, axis=-1)
    # linear convolution: output sample i aligns at offset (w-1)
    return jnp.asarray(q[..., w - 1 : 2 * w - 1] * du, jnp.float32)


@functools.partial(jax.jit, static_argnames=("mode", "n_voxel", "z_chunk",
                                              "fdk_weight"))
def _backproject(
    filtered,  # [V, H, W]
    c2ws,  # [V, 4, 4]
    *,
    mode: int,
    n_voxel,
    s_voxel,
    off_origin,
    dso: float,
    tanfovx: float,
    tanfovy: float,
    d_theta: float,
    z_chunk: int = 16,
    fdk_weight: bool = True,
):
    nx, ny, nz = n_voxel
    nv, height, width = filtered.shape
    s_vox = jnp.asarray(s_voxel, jnp.float32)
    off = jnp.asarray(off_origin, jnp.float32)
    d_vox = s_vox / jnp.asarray(n_voxel, jnp.float32)

    xs = (jnp.arange(nx) + 0.5) * d_vox[0] - s_vox[0] / 2 + off[0]
    ys = (jnp.arange(ny) + 0.5) * d_vox[1] - s_vox[1] / 2 + off[1]
    zs = (jnp.arange(nz) + 0.5) * d_vox[2] - s_vox[2] / 2 + off[2]

    w2cs = jnp.linalg.inv(c2ws)

    def one_slab(z0, zc):
        z_sl = jax.lax.dynamic_slice_in_dim(zs, z0, zc)
        px, py, pz = jnp.meshgrid(xs, ys, z_sl, indexing="ij")
        pts = jnp.stack([px, py, pz, jnp.ones_like(px)], -1)  # [nx,ny,zc,4]

        def per_view(carry, inp):
            proj, w2c = inp
            view = jnp.einsum("ij,xyzj->xyzi", w2c[:3], pts)
            xv, yv, zv = view[..., 0], view[..., 1], view[..., 2]
            if mode == 0:
                ndc_x, ndc_y = xv, yv
                weight = 1.0
            else:
                ndc_x = xv / zv / tanfovx
                ndc_y = yv / zv / tanfovy
                weight = (dso / zv) ** 2 if fdk_weight else 1.0
            # pix = ((ndc+1)*S-1)/2
            fx = ((ndc_x + 1.0) * width - 1.0) * 0.5
            fy = ((ndc_y + 1.0) * height - 1.0) * 0.5
            val = jax.scipy.ndimage.map_coordinates(
                proj, [fy, fx], order=1, mode="constant", cval=0.0
            )
            return carry + weight * val, None

        acc, _ = jax.lax.scan(
            per_view, jnp.zeros((nx, ny, zc), jnp.float32), (filtered, w2cs)
        )
        return acc * (d_theta / 2.0) if fdk_weight else acc

    # final slab may be short: dynamic_slice would clamp the start and
    # silently duplicate voxels, so pass each slab's true length
    slabs = [one_slab(z0, min(z_chunk, nz - z0)) for z0 in range(0, nz, z_chunk)]
    return jnp.concatenate(slabs, axis=2)


def fdk(projs, angles, scanner_cfg, n_voxel=None, view_chunk=None):
    """Reconstruct a volume from projections [V, H, W] at `angles`.

    `view_chunk`: optional host-level chunking of the backprojection into
    several device dispatches of `view_chunk` views each (partial sums
    accumulate on the host). The single-dispatch program at many-view
    production scale (e.g. the 240-view pseudo-GT FDK in
    data_generator/generate_real.py, reference real_dataset/
    generate_data.py:147-163) is large enough to take down constrained TPU
    runtimes; chunking bounds each dispatch. Same math — the sum over views
    is associative (f32 rounding order differs negligibly).

    Returns [nx, ny, nz] (same layout as the GT volumes)."""
    mode = 0 if scanner_cfg["mode"] == "parallel" else 1
    n_voxel = tuple(int(v) for v in (n_voxel or scanner_cfg["nVoxel"]))
    dso = float(scanner_cfg["DSO"])
    dsd = float(scanner_cfg["DSD"])
    s_det = np.asarray(scanner_cfg["sDetector"], np.float64)  # [v, u]
    height, width = projs.shape[1], projs.shape[2]

    projs = jnp.asarray(projs, jnp.float32)
    if mode == 1:
        # virtual detector through the origin
        scale = dso / dsd
        du = float(s_det[1] / width * scale)
        dv = float(s_det[0] / height * scale)
        us = (np.arange(width) + 0.5) * (s_det[1] * scale) / width - s_det[1] * scale / 2
        vs = (np.arange(height) + 0.5) * (s_det[0] * scale) / height - s_det[0] * scale / 2
        uu, vv = np.meshgrid(us, vs)
        cosw = dso / np.sqrt(dso**2 + uu**2 + vv**2)
        projs = projs * jnp.asarray(cosw, jnp.float32)[None]
        tanfovx = float(s_det[1] / 2 / dsd)
        tanfovy = float(s_det[0] / 2 / dsd)
    else:
        # parallel: detector spans NDC [-1,1] (identity projection)
        du = 2.0 / width
        tanfovx = tanfovy = 1.0

    filtered = _filter_rows(projs, du)
    angles = np.asarray(angles, np.float64)
    d_theta = float(2 * np.pi / max(len(angles), 1)) if len(angles) > 1 else 2 * np.pi
    # use actual spacing when angles are uniform over a partial arc
    if len(angles) > 2:
        d_theta = float(np.median(np.abs(np.diff(np.sort(angles)))))
    c2ws = jnp.asarray(
        np.stack([angle2pose(dso, float(a)) for a in angles]), jnp.float32
    )
    kw = dict(
        mode=mode,
        n_voxel=n_voxel,
        s_voxel=np.asarray(scanner_cfg["sVoxel"], np.float32),
        off_origin=np.asarray(scanner_cfg["offOrigin"], np.float32),
        dso=dso,
        tanfovx=tanfovx,
        tanfovy=tanfovy,
        d_theta=d_theta,
    )
    nv = filtered.shape[0]
    if view_chunk is None or nv <= view_chunk:
        return _backproject(filtered, c2ws, **kw)
    acc = None
    for v0 in range(0, nv, view_chunk):
        f_c = filtered[v0 : v0 + view_chunk]
        c_c = c2ws[v0 : v0 + view_chunk]
        if f_c.shape[0] < view_chunk:  # pad to one static shape (one compile)
            pad = view_chunk - f_c.shape[0]
            f_c = jnp.concatenate([f_c, jnp.zeros((pad,) + f_c.shape[1:],
                                                  f_c.dtype)])
            # repeat a real pose for the zero-padded views: a degenerate
            # (identity) pose puts voxels at zv=0 -> inf weight * NaN lookup;
            # with a valid pose the zero projection contributes exactly 0
            c_c = jnp.concatenate([c_c, jnp.tile(c_c[-1:], (pad, 1, 1))])
        part = np.asarray(_backproject(f_c, c_c, **kw))
        acc = part if acc is None else acc + part
    return jnp.asarray(acc)


def backproject(projs, angles, scanner_cfg, n_voxel=None):
    """Plain (unfiltered, unweighted) voxel-driven backprojection — the
    A^T operator for iterative methods (TIGRE's Atb equivalent; like TIGRE,
    the pair (ray-driven A, voxel-driven A^T) is an unmatched adjoint,
    which SART/CGLS-style methods tolerate by construction). The autodiff
    adjoint of the ray projector is exact but stacks per-sample gather
    residuals (~65 GB at 25x512^2x887 samples) — unusable at full scale."""
    mode = 0 if scanner_cfg["mode"] == "parallel" else 1
    n_voxel = tuple(int(v) for v in (n_voxel or scanner_cfg["nVoxel"]))
    dso = float(scanner_cfg["DSO"])
    dsd = float(scanner_cfg["DSD"])
    s_det = np.asarray(scanner_cfg["sDetector"], np.float64)
    if mode == 1:
        tanfovx = float(s_det[1] / 2 / dsd)
        tanfovy = float(s_det[0] / 2 / dsd)
    else:
        tanfovx = tanfovy = 1.0
    c2ws = jnp.asarray(
        np.stack([angle2pose(dso, float(a)) for a in angles]), jnp.float32
    )
    return _backproject(
        jnp.asarray(projs, jnp.float32),
        c2ws,
        mode=mode,
        n_voxel=n_voxel,
        s_voxel=np.asarray(scanner_cfg["sVoxel"], np.float32),
        off_origin=np.asarray(scanner_cfg["offOrigin"], np.float32),
        dso=dso,
        tanfovx=tanfovx,
        tanfovy=tanfovy,
        d_theta=1.0,
        fdk_weight=False,
    )
