"""Speed-of-light bound for the 500k-state render step (VERDICT r2 #5).

Two halves, both measured on the real chip:

1. Microbenchmarks — in-register Pallas loops (no HBM traffic inside the
   timed loop) for the three resources the splat kernels spend:
     - VPU transcendental throughput (exp/s),
     - VPU fma throughput (flop/s),
     - MXU f32-HIGHEST matmul throughput (flop/s, the precision the
       selector/placement/Mehler matmuls actually use),
   plus a streaming HBM read (GB/s).

2. Work census — per-tier block counts from the production router
   (render_pallas(return_aux=True, kernel="auto")) at the saved
   500k-gaussian stress state, converted into exp counts / MXU flops /
   HBM bytes for the forward and backward splat passes.

Prints one JSON line: per-resource lower bounds (work / measured
throughput), their max (perfect-overlap bound) and sum (serial bound), and
the measured step time for comparison. The written analysis goes in
ARCHITECTURE.md ("Speed-of-light accounting").

Usage: python dev/mfu_bound.py [state.npz]   (solo on the TPU host)
"""
import functools
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))
import numpy as np

from r2_gaussian_tpu.utils.runtime import setup_jax_cache

setup_jax_cache()
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..")
STATE = sys.argv[1] if len(sys.argv) > 1 else "state_1100.npz"
ON_TPU = jax.devices()[0].platform == "tpu"


def timed(fn, *args, reps=20):
    # Sync via a device->host FETCH, not block_until_ready: on the tunneled
    # axon platform block_until_ready returns without waiting for device
    # execution (measured: a 256 MB HBM stream "finished" in 25 us, and
    # loop-kernel m-vs-2m deltas vanished below dispatch jitter — the
    # round-4/round-5 garbage-rate artifacts). np.asarray forces the real
    # round trip; its cost is constant across trip counts, so the
    # _diff_rate subtraction cancels it.
    _ = np.asarray(fn(*args))  # warm-up / compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = np.asarray(out)
    return (time.perf_counter() - t0) / reps


# -- 1. microbenchmarks ------------------------------------------------------

R, C = 256, 1024  # VMEM-resident working block


def _loop_kernel(x_ref, o_ref, *, m, body):
    def step(_, x):
        return body(x)

    o_ref[...] = jax.lax.fori_loop(0, m, step, x_ref[...])


def _loop_call(x, m, body):
    return pl.pallas_call(
        functools.partial(_loop_kernel, m=m, body=body),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=not ON_TPU,
    )(x)


def _diff_rate(make_fn, args, work_per_extra_m, m):
    """Rate via the difference of m and 2m loop iterations (subtracts
    dispatch + in/out DMA, which are identical). The difference is only
    trusted when it rises clearly above timing noise — through the tunneled
    runtime dispatch jitter can exceed small kernel deltas, which silently
    produced astronomically floored rates in the round-4 artifact. Retries
    with 4x and 16x the trip count, then reports None (unmeasured). The
    round-5 rerun showed the tunnel's per-dispatch jitter is ~0.1 ms — the
    same scale as millisecond-class kernel deltas — so the delta is only
    accepted once it clears a full millisecond AND 10% of the larger time;
    the trip-count ladder escalates until the kernel signal dominates."""
    for mm in (m, 4 * m, 16 * m):
        f1, f2 = make_fn(mm), make_fn(2 * mm)
        t1, t2 = timed(f1, *args), timed(f2, *args)
        dt = t2 - t1
        print(f"  diff-timing m={mm}: t1={t1 * 1e3:.3f} ms "
              f"t2={t2 * 1e3:.3f} ms dt={dt * 1e3:.3f} ms",
              file=sys.stderr, flush=True)
        if dt > 0.1 * t2 and dt > 1e-3:
            return work_per_extra_m * mm / dt
    return None


def bench_loop(body, elems_per_iter, m=16384):
    x = jnp.full((R, C), 0.5, jnp.float32)
    return _diff_rate(
        lambda mm: jax.jit(functools.partial(_loop_call, m=mm, body=body)),
        (x,), elems_per_iter, m)


# Register-resident multi-accumulator variant (round 6). The (R, C) VMEM
# block loop above carries its whole 1 MB block through VMEM every trip, so
# it measures a VMEM-bandwidth-bound *dependent chain* — a conservative
# envelope the real kernels demonstrably outrun by overlapping (the round-5
# overlap "bound" of 12.0 ms exceeded the measured 9.4 ms step; VERDICT r5
# weak #3). Here each accumulator is a single (8, 128) vreg and P chains
# update independently per trip, so the measurement is issue-throughput
# bound, not latency or VMEM bound — a true per-unit ceiling.
P_CHAINS = 8
RR, CC = 8, 128


def _reg_kernel(x_ref, o_ref, *, m, op):
    accs = tuple(x_ref[i] for i in range(P_CHAINS))

    def step(_, accs):
        return tuple(op(a, i) for i, a in enumerate(accs))

    accs = jax.lax.fori_loop(0, m, step, accs)
    tot = accs[0]
    for a in accs[1:]:
        tot = tot + a
    o_ref[...] = tot


def bench_reg(op, flops_per_elem_per_chain, m=65536):
    x = jnp.full((P_CHAINS, RR, CC), 0.5, jnp.float32) \
        + jnp.arange(P_CHAINS, dtype=jnp.float32)[:, None, None] * 1e-3

    def call(x, mm):
        return pl.pallas_call(
            functools.partial(_reg_kernel, m=mm, op=op),
            out_shape=jax.ShapeDtypeStruct((RR, CC), jnp.float32),
            interpret=not ON_TPU,
        )(x)

    return _diff_rate(
        lambda mm: jax.jit(functools.partial(call, mm=mm)),
        (x,), flops_per_elem_per_chain * P_CHAINS * RR * CC, m)


def _mxu_kernel(x_ref, w_ref, o_ref, *, m, precision):
    def step(_, x):
        if precision == "bf16":
            return jax.lax.dot(
                x.astype(jnp.bfloat16), w_ref[...].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        return jax.lax.dot(x, w_ref[...], precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)

    o_ref[...] = jax.lax.fori_loop(0, m, step, x_ref[...])


def bench_mxu(n=512, m=1024, precision="highest"):
    rng = np.random.default_rng(0)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w = jnp.asarray(0.999 * q, jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, n)) / n, jnp.float32)

    def call(x, w, mm):
        return pl.pallas_call(
            functools.partial(_mxu_kernel, m=mm, precision=precision),
            out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
            interpret=not ON_TPU,
        )(x, w)

    return _diff_rate(
        lambda mm: jax.jit(functools.partial(call, mm=mm)),
        (x, w), 2 * n * n * n, m)


def bench_hbm(mb=256):
    # materialize the buffer ON DEVICE (a jitted fill): a concrete
    # jnp.ones of this size can be staged host-side and a 256 MB upload
    # through the tunnel takes tens of minutes (the round-5 census "hang")
    x = jax.jit(lambda: jnp.ones((mb * 1024 * 1024 // 4,), jnp.float32))()
    f = jax.jit(lambda x: jnp.sum(x * 1.000001))  # read-only stream
    t = timed(f, x)
    return mb / 1024 / t  # GB/s read


# -- 2. work census ----------------------------------------------------------


def census():
    from r2_gaussian_tpu.dataset.geometry import build_cameras
    from r2_gaussian_tpu.models.gaussians import GaussianParams, activate
    from r2_gaussian_tpu.models.preprocess import cov3d_components, preprocess
    from r2_gaussian_tpu.ops import splat2d

    d = np.load(osp.join(ROOT, ".bench_data", "slb_256_512_25_50000.npz"),
                allow_pickle=True)
    scanner, projs, angles = d["scanner"].item(), d["projs"], d["angles"]
    cams = build_cameras(angles, projs, [str(i) for i in range(len(angles))],
                         scanner)
    s = np.load(osp.join(ROOT, ".bench_data", STATE))
    sb = tuple(float(v) for v in s["scale_bound"])
    params = GaussianParams(
        xyz=jnp.asarray(s["xyz"]), scaling=jnp.asarray(s["scaling"]),
        rotation=jnp.asarray(s["rotation"]), density=jnp.asarray(s["density"]),
    )
    xyz, scales, rots, dens = activate(params, sb)
    active = jnp.asarray(s["active"])
    H = W = int(scanner["nDetector"][0])
    cov3d = cov3d_components(scales, rots)
    prep = preprocess(
        xyz, cov3d, dens, jnp.asarray(cams.w2c[0]),
        jnp.asarray(cams.full_proj[0]), width=W, height=H,
        tanfovx=cams.tanfovx, tanfovy=cams.tanfovy, mode=cams.mode,
        active=active)
    _, aux = splat2d.render_pallas(prep, width=W, height=H, return_aux=True,
                                   kernel="auto")
    tiers = [tuple(int(v) for v in np.asarray(t)) for t in aux["tiers"]]
    gg = int(np.asarray(aux["gg"]))

    work = dict(exp=0.0, vpu=0.0, mxu_bf16=0.0, mxu_f32=0.0, hbm_bytes=0.0)
    K = splat2d.K_LR
    for tag, lr in (("lr_", True), ("spill_", False), ("", False)):
        for ti, (wh, ww) in enumerate(tiers):
            key = f"{tag}tier{ti}_blocks"
            if key not in aux:
                continue
            nbk = float(np.asarray(aux[key]))
            if nbk == 0:
                continue
            g = gg if tag != "spill_" else splat2d.G
            area, bufw = wh * ww, splat2d._buf_width(ww, W)
            if lr:
                rc = splat2d._rc_lr(wh)
                nch = wh // rc
                # fwd: factor lines exp((ww+wh), g) + Hermite recurrence
                # (~3K flops/elem); patch matmul bf16 (rc, K*g)@(K*g, ww)
                # per chunk; _place f32-HIGHEST (rc, ww)@(ww, bufw)
                work["exp"] += nbk * (ww + wh) * g
                work["vpu"] += nbk * (ww + wh) * g * 3 * K
                work["mxu_bf16"] += nbk * 2 * area * K * g
                work["mxu_f32"] += nbk * nch * 2 * rc * ww * bufw
                # bwd: factor recompute; per chunk _extract f32 (rc, bufw)@
                # (bufw, ww), dU + dV bf16 matmuls (2 x 2*rc*ww*K*g), and
                # _he_series on (rc, g) (~6K flops/elem); final _he_series
                # + param chain on the (ww, g) lines
                work["exp"] += nbk * (ww + wh) * g
                work["vpu"] += nbk * (wh * g * 6 * K + ww * g * 9 * K
                                      + (ww + wh) * g * 3 * K)
                work["mxu_bf16"] += nbk * 2 * 2 * area * K * g
                work["mxu_f32"] += nbk * nch * 2 * rc * bufw * ww
            else:
                rc = splat2d._rc_for(ww)
                nch = wh // rc
                pairs = area * g
                # fwd: 1 exp + ~12 VPU flops per (pixel, gaussian) pair;
                # _to_grid (2 selector matmuls over (rc*ww)) + _place
                work["exp"] += nbk * pairs
                work["vpu"] += nbk * pairs * 12
                work["mxu_f32"] += nbk * nch * (
                    2 * rc * (rc * ww) * ww + rc * ww * ww  # _to_grid
                    + 2 * rc * ww * bufw)  # _place
                # bwd: recompute pair grid + 6 moment reductions (~30
                # flops/pair); _extract + _to_column selector matmuls
                work["exp"] += nbk * pairs
                work["vpu"] += nbk * pairs * 30
                work["mxu_f32"] += nbk * nch * (
                    2 * rc * bufw * ww  # _extract
                    + 2 * (rc * ww) * rc * ww + rc * ww * ww)  # _to_column
            # kdata read fwd + read bwd + grad rows write
            work["hbm_bytes"] += nbk * 3 * splat2d.NF * g * 4
    work["hbm_bytes"] += 3 * H * W * 4  # image out fwd, gimg in + grad out
    counts = {k: float(np.asarray(v)) for k, v in aux.items()
              if k not in ("tiers", "gg")}
    return work, counts, tiers, gg


def main():
    rates = {}
    if ON_TPU:
        # ceilings: independent register chains (issue-throughput bound)
        rates["exp_per_s"] = bench_reg(lambda a, i: jnp.exp(-a), 1.0)
        rates["vpu_flops"] = bench_reg(lambda a, i: a * 1.000001 + 1e-6, 2.0)
        # the old VMEM-block dependent-chain envelopes, kept for the record
        # (NOT used in the bounds: they are what real kernels outrun)
        rates["exp_per_s_dependent_chain"] = bench_loop(
            lambda x: jnp.exp(-x), R * C)
        rates["vpu_flops_dependent_chain"] = bench_loop(
            lambda x: x * 1.000001 + 1e-6, 2 * R * C)
        rates["mxu_f32_flops"] = bench_mxu(precision="highest")
        rates["mxu_bf16_flops"] = bench_mxu(precision="bf16")
        rates["hbm_read_gbs"] = bench_hbm()
    work, counts, tiers, gg = census()
    out = {"state": STATE, "tiers": tiers, "gg": gg, "rates": rates,
           "work": work, "tier_counts": counts}
    valid = {k: v for k, v in rates.items() if v}
    unmeasured = sorted(set(rates) - set(valid))
    if unmeasured:
        out["unmeasured_rates"] = unmeasured
    if valid:
        per = {"exp_ms": ("exp", "exp_per_s", 1.0),
               "vpu_ms": ("vpu", "vpu_flops", 1.0),
               "mxu_f32_ms": ("mxu_f32", "mxu_f32_flops", 1.0),
               "mxu_bf16_ms": ("mxu_bf16", "mxu_bf16_flops", 1.0),
               "hbm_ms": ("hbm_bytes", "hbm_read_gbs", 1e9)}
        bounds = {k: 1e3 * work[w] / (valid[r] * s)
                  for k, (w, r, s) in per.items() if r in valid}
        # exp shares the VPU with the elementwise flops; the MXU precisions
        # share the MXU — the overlap bound takes each UNIT's total. With
        # unmeasured rates both bounds are LOWER bounds of the true bounds.
        bounds["overlap_bound_ms"] = max(
            bounds.get("exp_ms", 0.0) + bounds.get("vpu_ms", 0.0),
            bounds.get("mxu_f32_ms", 0.0) + bounds.get("mxu_bf16_ms", 0.0),
            bounds.get("hbm_ms", 0.0))
        bounds["serial_bound_ms"] = sum(
            v for k, v in bounds.items() if k.endswith("_ms")
            and not k.endswith("bound_ms"))
        out["bounds"] = bounds
    print(json.dumps(out))


if __name__ == "__main__":
    main()
