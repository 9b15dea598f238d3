"""Benchmark: sustained real-training throughput on the flagship workload.

Trains the actual pipeline (FDK-initialized gaussians, L1+SSIM+TV losses,
adaptive density control, Pallas splat kernels) on a synthetic Shepp-Logan
case at reference benchmark scale: 512x512 cone-beam projections, 256^3
volume, 25 views (the reference's sparsest benchmark setting,
assets/results.md:26). The phantom is band-limited (1-voxel gaussian blur)
to match the characteristics of the reference's benchmark data (real CT
volumes, detector/recon band-limited): on the raw piecewise-constant
phantom a gaussian mixture caps at ~27 dB PSNR3D from O(sigma) edge error,
while the band-limited variant reaches the reference's 35-41 dB range and
produces a comparable densification trajectory (the speed-relevant part).
Measures steady it/s over iterations 600-1100 with densification events
included, which is the regime that dominates the reference's 5-15 min
time-to-30k (README.md:316 => ~33-100 it/s on an RTX 3090; vs_baseline is
measured against the midpoint ~50 it/s).

Capture hardening (round 4): the process that the driver invokes is a thin
WATCHDOG that never imports jax. It spawns the real bench as a child
(`bench.py --worker`), enforces a wall-clock budget (BENCH_BUDGET_S,
default 1020 s), and converts every failure mode — child hang, tunnel
death, SIGTERM from an outer `timeout` — into ONE structured JSON line on
stdout before the external kill can land. The worker checkpoints a running
throughput measurement to .bench_data/bench_progress.json after every
chunk, so even a mid-measurement kill yields a real (partial) number
instead of an empty capture.

The generated case + FDK init are cached under .bench_data/ so repeat runs
skip datagen. Set BENCH_REGEN=1 to force regeneration.
"""

import json
import os
import os.path as osp
import signal
import sys
import time
import types

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import numpy as np

CACHE_DIR = osp.join(osp.dirname(osp.abspath(__file__)), ".bench_data")
PROGRESS_PATH = osp.join(CACHE_DIR, "bench_progress.json")
PRIORITY_PATH = osp.join(CACHE_DIR, "bench_priority")


# --------------------------------------------------------------------------
# watchdog parent — no jax, guaranteed to print one JSON line and exit 0
# --------------------------------------------------------------------------

def _last_measured_metadata():
    """Newest mid-round measurement, surfaced as skip-line metadata (value
    stays null — a cached number is not a live driver measurement)."""
    try:
        import glob

        cands = sorted(glob.glob(osp.join(CACHE_DIR, "bench_r*_early.json")),
                       key=osp.getmtime)
        if not cands:
            return None
        with open(cands[-1]) as f:
            for line in reversed(f.read().strip().splitlines()):
                try:
                    prior = json.loads(line)
                except ValueError:
                    continue
                if prior.get("value") is not None:
                    prior["artifact"] = osp.basename(cands[-1])
                    prior["measured_at"] = time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ",
                        time.gmtime(osp.getmtime(cands[-1])))
                    return prior
    except Exception:
        pass
    return None


def _read_progress():
    try:
        with open(PROGRESS_PATH) as f:
            return json.loads(f.read())
    except Exception:
        return None


def _skip_json(reason):
    out = {
        "metric": "train_iters_per_sec", "value": None, "unit": "it/s",
        "vs_baseline": None, "skipped": True, "reason": reason[:400],
    }
    lm = _last_measured_metadata()
    if lm:
        out["last_measured"] = lm
    return out


def _emit_best(reason, started_at):
    """Best-available JSON: a live partial measurement from the progress
    file beats a skip line; a skip line still carries last_measured."""
    prog = _read_progress()
    if (prog and prog.get("started_at", 0) >= started_at - 1
            and prog.get("value")):
        prog.pop("started_at", None)
        prog["partial"] = True
        prog.setdefault("detail", {})["watchdog_reason"] = reason[:200]
        return prog
    phase = (prog or {}).get("phase", "no progress file")
    return _skip_json(f"{reason}; worker phase: {phase}")


def watchdog():
    import subprocess
    import threading

    budget = int(os.environ.get("BENCH_BUDGET_S", 1020))
    margin = 20  # print + flush headroom before any outer `timeout` kill
    started_at = time.time()
    deadline = started_at + budget - margin
    os.makedirs(CACHE_DIR, exist_ok=True)

    env = dict(os.environ)
    env["BENCH_DEADLINE"] = str(deadline - 10)  # worker self-budgets too
    child = subprocess.Popen(
        [sys.executable, "-u", osp.abspath(__file__), "--worker"],
        stdout=subprocess.PIPE, stderr=sys.stderr, text=True, env=env)

    final = {}

    def pump():
        for line in child.stdout:
            line = line.strip()
            if not line:
                continue
            try:
                d = json.loads(line)
                if isinstance(d, dict) and "metric" in d:
                    final["json"] = d
                    continue
            except ValueError:
                pass
            print(line, file=sys.stderr, flush=True)

    t = threading.Thread(target=pump, daemon=True)
    t.start()

    done = threading.Event()

    def finish(reason):
        if done.is_set():
            return
        done.set()
        try:
            child.kill()
        except Exception:
            pass
        out = final.get("json") or _emit_best(reason, started_at)
        print(json.dumps(out), flush=True)

    def on_signal(signum, frame):
        finish(f"terminated by signal {signum}")
        os._exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
        signal.signal(sig, on_signal)

    try:
        child.wait(timeout=max(1.0, deadline - time.time()))
        t.join(timeout=10)
        if final.get("json"):
            done.set()
            print(json.dumps(final["json"]), flush=True)
        else:
            finish(f"worker exited rc={child.returncode} without JSON")
    except Exception:
        finish(f"wall-clock budget {budget}s exhausted")


# --------------------------------------------------------------------------
# worker — the real bench
# --------------------------------------------------------------------------

def make_case(det, n_views, vol_size, seed=0):
    from r2_gaussian_tpu.ops.phantom import shepp_logan_3d
    from r2_gaussian_tpu.ops.projector import add_ct_noise, project

    scanner = {
        "mode": "cone", "DSD": 7.0, "DSO": 5.0,
        "nDetector": [det, det], "sDetector": [4.0, 4.0],
        "nVoxel": [vol_size] * 3, "sVoxel": [2.0] * 3,
        "dVoxel": [2.0 / vol_size] * 3,
        "offOrigin": [0.0, 0.0, 0.0], "offDetector": [0.0, 0.0],
        "accuracy": 0.5, "totalAngle": 360.0, "startAngle": 0.0,
    }
    from scipy.ndimage import gaussian_filter

    vol = gaussian_filter(shepp_logan_3d(vol_size), sigma=1.0).astype(
        np.float32)
    angles = np.linspace(0, 2 * np.pi, n_views + 1)[:-1]
    projs = np.asarray(project(vol, angles, scanner))
    projs = add_ct_noise(projs, poisson=1e4, gaussian=np.array([0.0, 10.0]),
                         seed=seed)
    return vol, angles, projs, scanner


def load_or_make(det, n_views, vol_size, n_points):
    os.makedirs(CACHE_DIR, exist_ok=True)
    tag = f"slb_{vol_size}_{det}_{n_views}_{n_points}"
    path = osp.join(CACHE_DIR, tag + ".npz")
    if osp.exists(path) and not os.environ.get("BENCH_REGEN"):
        d = np.load(path, allow_pickle=True)
        return (d["vol"], d["angles"], d["projs"], d["scanner"].item(),
                d["pts"])
    vol, angles, projs, scanner = make_case(det, n_views, vol_size)
    from initialize_pcd import init_pcd

    pts = init_pcd(projs, angles, scanner, recon_method="fdk",
                   n_points=n_points, density_thresh=0.05,
                   density_rescale=0.15)
    np.savez_compressed(path, vol=vol, angles=angles, projs=projs,
                        scanner=scanner, pts=pts)
    return vol, angles, projs, scanner, pts


def probe_backend(attempts=None, probe_timeout=None):
    """Check the JAX backend comes up, in a subprocess with a hard timeout.

    The tunneled TPU backend can HANG jax.devices() (not just raise) when
    the tunnel is down, and init errors of the UNAVAILABLE class are often
    transient — so probe out-of-process with retries + backoff. Returns the
    platform string ("tpu"/"cpu"/...) or None if the backend never came up.
    """
    import subprocess

    attempts = attempts or int(os.environ.get("BENCH_PROBE_ATTEMPTS", 2))
    probe_timeout = probe_timeout or int(
        os.environ.get("BENCH_PROBE_TIMEOUT", 90))
    last_err = ""
    for attempt in range(attempts):
        _progress({"phase": f"backend probe {attempt + 1}/{attempts}"})
        try:
            # mirror the main process's platform selection: sitecustomize
            # bakes the axon platform into jax.config at interpreter start,
            # so a bare JAX_PLATFORMS env var would NOT steer the probe —
            # setup_jax_cache() re-applies it (utils/runtime.py)
            probe_code = (
                "import sys; sys.path.insert(0, "
                f"{osp.dirname(osp.abspath(__file__))!r}); "
                "from r2_gaussian_tpu.utils.runtime import setup_jax_cache; "
                "setup_jax_cache(); "
                "import jax; print(jax.devices()[0].platform)"
            )
            r = subprocess.run(
                [sys.executable, "-c", probe_code],
                capture_output=True, text=True, timeout=probe_timeout)
            if r.returncode == 0 and r.stdout.strip():
                return r.stdout.strip().splitlines()[-1]
            last_err = (r.stderr or "").strip().splitlines()[-1:] or ["rc!=0"]
            last_err = last_err[0]
        except subprocess.TimeoutExpired:
            last_err = f"jax.devices() hung >{probe_timeout}s (tunnel down?)"
        if attempt < attempts - 1:
            wait = 15
            print(f"backend probe failed ({last_err}); retry in {wait}s",
                  file=sys.stderr, flush=True)
            time.sleep(wait)
    print(json.dumps(_skip_json(
        f"JAX backend unavailable after {attempts} probes: {last_err}")))
    return None


def acquire_tpu_lock(timeout_s: int | None = None):
    """Serialize against the evidence queue (dev/round4_tpu_queue.sh): the
    tunneled TPU serves ONE process; a bench launched while a queue step is
    mid-run would contend and can fail both. The bench has PRIORITY: it
    drops a `bench_priority` marker that queue steps check before starting
    (they wait while it is fresh), waits a short bounded time for any
    in-flight step, then proceeds regardless (a stale holder must not turn
    the bench into a guaranteed skip). The fd is returned only to keep the
    lock alive for the process lifetime."""
    import fcntl

    timeout_s = timeout_s if timeout_s is not None else int(
        os.environ.get("R2G_TPU_LOCK_TIMEOUT", 240))
    os.makedirs(CACHE_DIR, exist_ok=True)
    with open(PRIORITY_PATH, "w") as pf:
        pf.write(f"{os.getpid()} {time.time()}\n")
    f = open(osp.join(CACHE_DIR, "tpu.lock"), "w")
    deadline = time.time() + timeout_s
    while True:
        try:
            fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
            return f
        except OSError:
            if time.time() >= deadline:
                print("tpu.lock still held after timeout; proceeding",
                      file=sys.stderr, flush=True)
                return f
            _progress({"phase": "waiting for tpu.lock"})
            time.sleep(5)


_progress_base = {"started_at": time.time()}


def _progress(update):
    """Atomically checkpoint worker progress for the watchdog parent."""
    _progress_base.update(update)
    try:
        tmp = PROGRESS_PATH + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps(_progress_base))
        os.replace(tmp, PROGRESS_PATH)
    except OSError:
        pass


def measure_stress_state(cams, scanner, deadline):
    """Secondary metric: full train-step latency at a saved ~500k-gaussian
    stress state (.bench_data/state_1100.npz, built by dev/make_stress_state
    .py / dev/stage_round5.sh). Driver-verifies the capacity-scaling story
    that was previously [dev]-only (RESULTS.md). Returns ms/it or None; never
    raises (the headline metric must print regardless)."""
    path = osp.join(CACHE_DIR, "state_1100.npz")
    if not osp.exists(path) or time.time() > deadline - 200:
        return None
    try:
        import jax
        import jax.numpy as jnp

        from r2_gaussian_tpu.models.gaussians import GaussianAux, GaussianParams
        from r2_gaussian_tpu.pipeline.optim import init_adam
        from r2_gaussian_tpu.pipeline.trainer import TrainState, make_train_fn

        jax.clear_caches()
        _progress({"phase": "stress-state secondary metric"})
        s = np.load(path)
        sb = tuple(float(v) for v in s["scale_bound"])
        params = GaussianParams(
            xyz=jnp.asarray(s["xyz"]), scaling=jnp.asarray(s["scaling"]),
            rotation=jnp.asarray(s["rotation"]),
            density=jnp.asarray(s["density"]))
        cap = params.xyz.shape[0]
        act_np = np.asarray(s["active"])
        n_act = int(act_np.sum())
        # row-bucket validity requires the compacted-prefix invariant the
        # trainer asserts (trainer._n_active): a state whose active rows are
        # not a prefix would silently slice off live gaussians and report an
        # optimistic ms/it — refuse to measure instead.
        if not act_np[:n_act].all():
            print("stress-state metric skipped: active rows are not a "
                  "compacted prefix", file=sys.stderr, flush=True)
            return None
        aux = GaussianAux(
            active=jnp.asarray(s["active"]), max_radii2d=jnp.zeros(cap),
            xyz_gradient_accum=jnp.zeros(cap), denom=jnp.zeros(cap))
        bucket = 8192
        while bucket < n_act:
            bucket *= 2
        n_rows = None if bucket >= cap else bucket  # trainer._row_bucket rule
        opt = _bench_opt(densify_until_iter=0)
        K = 20
        fn = make_train_fn(cameras=cams, scanner_cfg=scanner, opt_cfg=opt,
                           scale_bound=sb, backend="pallas",
                           steps_per_call=K, footprint="tight",
                           kernel="auto", n_rows=n_rows)
        views = jnp.arange(K, dtype=jnp.int32) % len(cams)
        keys = jax.random.split(jax.random.PRNGKey(0), K)
        skip = jnp.zeros(K, bool)
        st = TrainState(params=params, adam=init_adam(params), aux=aux)
        # the train fn DONATES the state (donate_argnums=(0,)): thread the
        # returned state into the timed call instead of reusing the donated
        # one (reuse surfaced as an opaque TPU InvalidArgument in round 5)
        st, m = fn(st, views, keys, skip, jnp.int32(0))  # compile + warm
        _ = np.asarray(m)
        if time.time() > deadline - 30:
            return None
        t0 = time.time()
        st, m = fn(st, views, keys, skip, jnp.int32(0))
        _ = np.asarray(m)
        return {"ms_per_it": round((time.time() - t0) / K * 1000, 2),
                "n_gaussians": n_act, "capacity": cap}
    except Exception as e:  # noqa: BLE001 — strictly best-effort
        import traceback
        traceback.print_exc()
        print(f"stress-state metric skipped: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)
        return None


def _bench_opt(**kw):
    d = dict(
        iterations=30_000,
        position_lr_init=2e-4, position_lr_final=2e-5, position_lr_max_steps=30_000,
        density_lr_init=1e-2, density_lr_final=1e-3, density_lr_max_steps=30_000,
        scaling_lr_init=5e-3, scaling_lr_final=5e-4, scaling_lr_max_steps=30_000,
        rotation_lr_init=1e-3, rotation_lr_final=1e-4, rotation_lr_max_steps=30_000,
        lambda_dssim=0.25, lambda_tv=0.05, tv_vol_size=32,
        density_min_threshold=1e-5,
        densification_interval=100, densify_from_iter=500,
        densify_until_iter=15_000,
        densify_grad_threshold=5e-5, densify_scale_threshold=0.1,
        max_screen_size=None, max_scale=None, max_num_gaussians=500_000,
    )
    d.update(kw)
    return types.SimpleNamespace(**d)


def worker():
    deadline = float(os.environ.get("BENCH_DEADLINE", time.time() + 1e9))
    os.makedirs(CACHE_DIR, exist_ok=True)
    _progress({"phase": "starting"})
    _lock = acquire_tpu_lock()  # noqa: F841 — held for process lifetime
    platform = probe_backend()
    if platform is None:
        return  # structured skip JSON already printed; exit 0

    _progress({"phase": "importing jax + building case"})
    from r2_gaussian_tpu.utils.runtime import setup_jax_cache

    setup_jax_cache()
    import jax

    from r2_gaussian_tpu.dataset.geometry import build_cameras
    from r2_gaussian_tpu.models.gaussians import create_from_pcd
    from r2_gaussian_tpu.pipeline.trainer import Trainer

    on_tpu = jax.devices()[0].platform == "tpu"
    det = 512 if on_tpu else 64
    vol_size = 256 if on_tpu else 64
    n_views = 25
    n_points = 50_000 if on_tpu else 3_000
    warm_iters = 700 if on_tpu else 60
    bench_iters = 500 if on_tpu else 40

    vol, angles, projs, scanner, pts = load_or_make(det, n_views, vol_size,
                                                    n_points)
    cams = build_cameras(angles, projs, [str(i) for i in range(n_views)],
                         scanner)

    vol_to_world = float(max(scanner["sVoxel"]))
    scale_bound = (0.0005 * vol_to_world, 0.5 * vol_to_world)
    # pre-size the padded buffers so capacity growth (a recompile) does not
    # land inside the measured window
    cap = 262_144 if on_tpu else None
    params, aux = create_from_pcd(pts[:, :3].astype(np.float32), pts[:, 3],
                                  scale_bound, capacity=cap)
    opt = _bench_opt()
    trainer = Trainer(cams, scanner, opt, scale_bound, params, aux,
                      backend="auto")

    verbose = bool(os.environ.get("BENCH_VERBOSE"))
    baseline = 50.0  # RTX 3090 midpoint it/s

    # Per-step cost is a function of the STATE and ramps as footprints
    # spread during training (ARCHITECTURE.md round-5 findings, measured
    # 8.5 -> 16.9 ms/it between iters 1.1k and 10k pre-round-6), so a
    # single early window over-projects. The headline is therefore
    # SUSTAINED-HONEST: after the early window the worker keeps training to
    # a late-state iteration and measures a second window there; the
    # headline value and projected_time_to_30k_min integrate the measured
    # wall clock plus the late rate for the remaining iterations. Both raw
    # windows are reported in detail.
    def result(it_per_sec, done_iters, loss, *, early=None, late=None,
               train_wall=None, at_iter=None):
        detail = {
            "case": "shepp_logan_blurred_cone_25view",
            "detector": det, "volume": vol_size,
            # host-cached count: result() runs after every chunk and a
            # device fetch of the n_active reduction is a full tunnel
            # round trip
            "n_gaussians": trainer._n_active(),
            "platform": "tpu" if on_tpu else "cpu",
            "measured_iters":
                f"{warm_iters + 1}-{warm_iters + done_iters}",
            "capacity": int(trainer.state.params.capacity),
            "projected_time_to_30k_min":
                round(30_000 / it_per_sec / 60, 2),
            "loss": loss,
        }
        if early is not None:
            detail["early_window_it_s"] = round(early, 2)
        if late is not None and train_wall is not None:
            detail["late_window_it_s"] = round(late, 2)
            detail["late_window_at_iter"] = at_iter
            # honest projection: measured wall clock through the late
            # window (warmup compiles + densify era + ramp included) plus
            # the late-state rate for the remaining iterations
            proj_s = train_wall + max(30_000 - at_iter, 0) / late
            detail["projected_time_to_30k_min"] = round(proj_s / 60, 2)
            it_per_sec = 30_000 / proj_s
            detail["sustained"] = True
        else:
            detail["sustained"] = False  # early-window extrapolation only
        return {
            "metric": "train_iters_per_sec",
            "value": round(it_per_sec, 2),
            "unit": "it/s",
            "vs_baseline": round(it_per_sec / baseline, 3),
            "detail": detail,
        }

    # warmup: compiles + first densify events (run_chunk syncs per dispatch)
    t_train0 = time.time()  # train wall clock incl. compiles, excl. datagen
    while trainer.iteration < warm_iters:
        tc = time.time()
        _progress({"phase": f"warmup iter {trainer.iteration}/{warm_iters}"})
        k = min(100, warm_iters - trainer.iteration)
        _, n = trainer.run_chunk(k)
        if verbose:
            print(f"warm it={trainer.iteration} {time.time() - tc:.2f}s"
                  f" n_active={n}", file=sys.stderr, flush=True)
        # a cold compile cache can eat the whole budget in warmup; a short
        # measurement window still beats no number
        if time.time() > deadline - 120 and trainer.iteration >= 200:
            print(f"warmup truncated at iter {trainer.iteration} "
                  "(deadline approaching)", file=sys.stderr, flush=True)
            warm_iters = trainer.iteration
            break

    t0 = time.time()
    done = 0
    loss = float("nan")
    while done < bench_iters:
        tc = time.time()
        k = min(100, bench_iters - done)
        m, n = trainer.run_chunk(k)
        done += k
        loss = float(np.asarray(m)[-1, 0])
        wall = time.time() - t0
        # checkpoint a live partial number for the watchdog after every chunk
        prog = result(done / wall, done, loss)
        prog["phase"] = f"measuring {done}/{bench_iters}"
        _progress(prog)
        if verbose:
            print(f"bench it={trainer.iteration} {time.time() - tc:.2f}s"
                  f" n_active={n}", file=sys.stderr, flush=True)
        if time.time() > deadline - 45 and done >= 100:
            print(f"measurement truncated at {done}/{bench_iters} iters "
                  "(deadline)", file=sys.stderr, flush=True)
            bench_iters = done
            break
    wall = time.time() - t0
    early_rate = bench_iters / wall
    out = result(early_rate, bench_iters, loss, early=early_rate)

    # --- late-state window: continue the protocol toward iter 10k and
    # re-measure, so the headline reflects the sustained (footprint-spread)
    # regime rather than the fastest phase. Deadline-guarded: on a cold
    # machine that spent the budget compiling, the early-window result above
    # still stands (marked sustained: false).
    late_target = 10_000 if on_tpu else 200
    late_window = 300 if on_tpu else 40
    while (trainer.iteration < late_target
           and time.time() < deadline - 150):
        k = min(500, late_target - trainer.iteration)
        trainer.run_chunk(k)
        prog = dict(out)
        prog["phase"] = f"continuing to late window {trainer.iteration}"
        _progress(prog)
    if trainer.iteration >= (3000 if on_tpu else late_target):
        t0 = time.time()
        m, _ = trainer.run_chunk(late_window)
        late_wall = time.time() - t0
        loss = float(np.asarray(m)[-1, 0])
        out = result(early_rate, bench_iters, loss, early=early_rate,
                     late=late_window / late_wall,
                     train_wall=time.time() - t_train0,
                     at_iter=trainer.iteration)
    # checkpoint the headline BEFORE the stress probe: its compile+warm call
    # is not deadline-boundable once started, and the watchdog must be able
    # to emit the final number if the probe hangs past the budget
    _progress(dict(out, phase="headline ready; stress probe"))
    # secondary metric: 500k-gaussian stress-state step latency (best-effort,
    # folded into the single JSON line's detail — driver contract holds)
    del trainer
    stress = measure_stress_state(cams, scanner, deadline)
    if stress is not None:
        out["detail"]["stress_500k"] = stress
    print(json.dumps(out), flush=True)


def main():
    if "--worker" in sys.argv:
        try:
            worker()
        except Exception as e:  # noqa: BLE001 — parent parses stdout
            import traceback

            traceback.print_exc()
            print(json.dumps(_skip_json(
                f"{type(e).__name__}: {str(e)[:300]}")))
    else:
        watchdog()


if __name__ == "__main__":
    main()
