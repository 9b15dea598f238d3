"""Training driver: jitted multi-step train function + host-side loop.

The reference trains one view per iteration with per-iteration Python/CUDA
round trips (train.py:97-219). Here `densification_interval` (default 100)
iterations run inside ONE XLA dispatch (`lax.fori_loop`), which amortizes
host/device round-trip latency (~28 ms on the measured TPU tunnel) to ~0.3
ms/iter; view order, RNG keys and skip flags are precomputed per dispatch.

Loss = L1 + lambda_dssim * (1 - SSIM) + lambda_tv * TV(random 32^3 query)
(reference train.py:117-142). Densification statistics are harvested from
the cotangent of an NDC-space zero offset on the projected means, matching
the reference's screenspace_points trick (render_query.py:91-100,
backward.cu:562-563).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dataset.geometry import Cameras
from ..models.gaussians import GaussianAux, GaussianParams, activate
from ..models.render import query, render
from ..utils.runtime import retry_transient
from ..utils.losses import l1_loss, ssim, tv_3d_loss
from .densify import DensifyConfig, densify_and_prune
from .optim import AdamState, adam_update, group_lrs, init_adam


class TrainState(NamedTuple):
    params: GaussianParams
    adam: AdamState
    aux: GaussianAux
    # Polyak/EMA-averaged evaluation parameters (framework extension beyond
    # the reference; enabled by opt.ema_decay > 0, None otherwise). Averaging
    # the iterates is the classical counter to noise semiconvergence in
    # iterative CT: the noise-fitting component of late iterations is
    # high-frequency in iteration index and averages out, while the signal
    # component has converged. Rows ride the densify surgery (densify.py).
    ema: GaussianParams | None = None


def make_train_fn(
    *,
    cameras: Cameras,
    scanner_cfg: dict,
    opt_cfg,
    scale_bound,
    backend: str,
    steps_per_call: int,
    footprint: str = "tile",
    kernel: str = "auto",
    mesh=None,
    shard_axis: str = "g",
    n_rows: int | None = None,
):
    """Build the jitted K-step training function for fixed-capacity state.

    `n_rows` (single-chip only): static row-count bucket >= the live
    gaussian count. Densify events keep active rows a prefix of the arrays
    (densify.py `_compaction_order` sorts actives first), so the render/TV
    hot path can run on `params[:n_rows]` instead of the full padded
    capacity — at the measured steady state (61k live in a 262k buffer)
    the capacity-proportional XLA glue (EWA preprocess, feature build,
    block routing) was ~2.4 ms of a ~14 ms step. Adam, EMA and the
    densify-stat updates also run at bucket width and land in the
    full-capacity carry via in-place prefix writes: gradients beyond
    n_rows are exactly zero (inactive rows are never rendered) and spawn
    zeroes Adam moments, so the only dropped work is decay of dead rows
    nobody reads.

    With `mesh`, the identical step body runs under shard_map with the
    gaussian axis sharded over the mesh: each device renders/voxelizes its
    shard and the partial image / TV sub-volume are psum'd over ICI — exact,
    because X-ray accumulation is an order-independent sum (SURVEY.md §2.1).
    Adam moments and densification stats stay shard-local; loss scalars and
    the Adam step counter are replicated."""
    width, height = cameras.width, cameras.height
    tanfovx, tanfovy, mode = cameras.tanfovx, cameras.tanfovy, cameras.mode
    lambda_dssim = float(opt_cfg.lambda_dssim)
    lambda_tv = float(opt_cfg.lambda_tv)
    ema_decay = float(getattr(opt_cfg, "ema_decay", 0.0) or 0.0)
    use_tv = lambda_tv > 0
    tv_n = int(opt_cfg.tv_vol_size)
    d_voxel = np.asarray(scanner_cfg["dVoxel"], np.float32)
    tv_s_voxel = jnp.asarray(d_voxel * tv_n)
    off = np.asarray(scanner_cfg["offOrigin"], np.float32)
    s_vox = np.asarray(scanner_cfg["sVoxel"], np.float32)
    bbox_lo = jnp.asarray(off - s_vox / 2)
    bbox_hi = jnp.asarray(off + s_vox / 2)
    sb = None if scale_bound is None else tuple(float(x) for x in scale_bound)

    w2c_all = jnp.asarray(cameras.w2c)
    proj_all = jnp.asarray(cameras.full_proj)
    images_all = jnp.asarray(cameras.images)
    if mesh is not None:
        from ..parallel.sharding import psum_grad_exact
        assert n_rows is None, "row slicing is single-chip only"

    def loss_fn(params, d2, active, view_idx, key_tv):
        # `params`/`active` arrive already sliced to the row bucket when
        # n_rows is set (see body below), so the softplus/sigmoid/normalize
        # and the whole render/TV path run on the live bucket only.
        xyz, scales, rots, dens = activate(params, sb)
        out = render(
            xyz, scales, rots, dens,
            w2c=w2c_all[view_idx], full_proj=proj_all[view_idx],
            width=width, height=height, tanfovx=tanfovx, tanfovy=tanfovy,
            mode=mode, active=active, mean2d_offset_ndc=d2, backend=backend,
            footprint=footprint, kernel=kernel,
        )
        img = out["render"]
        if mesh is not None:
            img = psum_grad_exact(img, shard_axis)
        gt = images_all[view_idx]
        l1 = l1_loss(img, gt)
        total = l1
        dssim = jnp.float32(0.0)
        if lambda_dssim > 0:
            dssim = 1.0 - ssim(img, gt)
            total = total + lambda_dssim * dssim
        tv = jnp.float32(0.0)
        if use_tv:
            u = jax.random.uniform(key_tv, (3,))
            center = (bbox_lo + tv_s_voxel / 2) + (bbox_hi - tv_s_voxel - bbox_lo) * u
            vol = query(
                xyz, scales, rots, dens,
                center=center, n_voxel=(tv_n, tv_n, tv_n), s_voxel=tv_s_voxel,
                active=active, backend=backend,
            )["vol"]
            if mesh is not None:
                vol = psum_grad_exact(vol, shard_axis)
            tv = tv_3d_loss(vol, reduction="mean")
            total = total + lambda_tv * tv
        return total, (out["radii"], l1, dssim, tv)

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

    def train_steps_body(state: TrainState, view_indices, keys, skip_update, iter0):
        """Run K = steps_per_call iterations. view_indices [K] int32,
        keys [K] PRNG keys, skip_update [K] bool, iter0 scalar (iterations
        are 1-indexed: step k is iteration iter0 + k + 1)."""

        def body(k, carry):
            state, metrics = carry
            iteration = iter0 + k + 1
            # Hot-path (bucket) views of the state. With n_rows set, the
            # ENTIRE per-step pipeline — activate, render, TV, backward,
            # Adam, EMA, densify stats — runs at bucket width; full-capacity
            # arrays are only touched by in-place prefix writes (the loop
            # carry is donated, so XLA updates the prefix without copying
            # the tail). Rows beyond n_rows are inactive: never visible,
            # exactly-zero gradients, and (since spawn zeroes moments) any
            # Adam tail update would only decay dead rows nobody reads.
            sl = ((lambda a: a[:n_rows]) if n_rows is not None
                  else (lambda a: a))
            p_h = jax.tree.map(sl, state.params)
            d2 = jnp.zeros((p_h.xyz.shape[0], 2), jnp.float32)
            (total, (radii, l1, dssim, tv)), (gp, gd2) = grad_fn(
                p_h, d2, sl(state.aux.active), view_indices[k], keys[k]
            )

            # A non-finite loss means the grads are poison: reject the whole
            # step (params, Adam moments, EMA, densify stats) instead of
            # letting one bad iteration NaN the state permanently. The
            # reference leaves this to --detect_anomaly; here rejection is
            # one predicated select on the already-computed update. A finite
            # loss does NOT imply finite grads (a NaN can be introduced only
            # in the backward pass), so also AND in one cheap reduction over
            # the gradient pytree: any NaN/Inf leaf propagates to the sum.
            gsum = sum(
                jnp.sum(g) for g in jax.tree.leaves(gp)
                if jnp.issubdtype(g.dtype, jnp.inexact)
            ) + jnp.sum(gd2)
            ok = jnp.isfinite(total) & jnp.isfinite(gsum)

            # Write a bucket-width update into the full-capacity carry.
            # With n_rows set this is a dynamic-update-slice on a donated
            # loop carry (in-place prefix write); otherwise the identity.
            if n_rows is not None:
                wb = lambda full, pre: full.at[:n_rows].set(pre)  # noqa: E731
            else:
                wb = lambda full, pre: pre  # noqa: E731

            # densification stats (train.py:149-154), at bucket width
            visible = (radii > 0) & ok
            grad_norm = jnp.linalg.norm(gd2, axis=-1)
            aux = state.aux
            aux = aux._replace(
                max_radii2d=wb(aux.max_radii2d, jnp.where(
                    visible,
                    jnp.maximum(sl(aux.max_radii2d),
                                radii.astype(jnp.float32)),
                    sl(aux.max_radii2d),
                )),
                xyz_gradient_accum=wb(
                    aux.xyz_gradient_accum,
                    sl(aux.xyz_gradient_accum)
                    + jnp.where(visible, grad_norm, 0.0)),
                denom=wb(aux.denom,
                         sl(aux.denom) + visible.astype(jnp.float32)),
            )

            lrs = group_lrs(opt_cfg, iteration)
            adam_h = AdamState(m=jax.tree.map(sl, state.adam.m),
                               v=jax.tree.map(sl, state.adam.v),
                               step=state.adam.step)
            new_p_h, new_adam_h = adam_update(p_h, gp, adam_h, lrs)
            skip = skip_update[k] | ~ok
            new_p_h = jax.tree.map(
                lambda a, b: jnp.where(skip, a, b), p_h, new_p_h
            )
            new_adam_h = jax.tree.map(
                lambda a, b: jnp.where(skip, a, b), adam_h, new_adam_h
            )
            new_p = jax.tree.map(wb, state.params, new_p_h)
            new_adam = AdamState(
                m=jax.tree.map(wb, state.adam.m, new_adam_h.m),
                v=jax.tree.map(wb, state.adam.v, new_adam_h.v),
                step=new_adam_h.step,
            )
            new_ema = state.ema
            if state.ema is not None:
                new_ema_h = jax.tree.map(
                    lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                    jax.tree.map(sl, state.ema), new_p_h,
                )
                new_ema_h = jax.tree.map(
                    lambda a, b: jnp.where(skip, a, b),
                    jax.tree.map(sl, state.ema), new_ema_h
                )
                new_ema = jax.tree.map(wb, state.ema, new_ema_h)
            n_vis = jnp.sum(visible).astype(jnp.float32)
            if mesh is not None:
                n_vis = jax.lax.psum(n_vis, shard_axis)
            metrics = metrics.at[k].set(jnp.stack([total, l1, dssim, tv, n_vis]))
            return TrainState(new_p, new_adam, aux, new_ema), metrics

        metrics0 = jnp.zeros((steps_per_call, 5), jnp.float32)
        state, metrics = jax.lax.fori_loop(0, steps_per_call, body, (state, metrics0))
        return state, metrics

    if mesh is None:
        return jax.jit(train_steps_body, donate_argnums=(0,))

    from jax.sharding import PartitionSpec as P

    from ..parallel.sharding import train_state_specs  # noqa: F811

    specs = train_state_specs(shard_axis, with_ema=ema_decay > 0)
    # check_vma=False: the Pallas kernels cannot thread varying-manual-axis
    # metadata through their out_shapes in interpret mode (CPU tests), and
    # the kernel bodies mix varying refs with literals. Gradient correctness
    # through the psum is covered by tests/test_multichip.py's full-step
    # sharded-vs-single equivalence (moments compared at f32 tolerance — a
    # mis-transposed psum would be off by a factor of n_devices).
    sharded = jax.shard_map(
        train_steps_body,
        mesh=mesh,
        in_specs=(specs, P(), P(), P(), P()),
        out_specs=(specs, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


class Trainer:
    """Host-side orchestration: dispatch scheduling, densification events,
    capacity growth, checkpoints."""

    def __init__(self, cameras, scanner_cfg, opt_cfg, scale_bound, params, aux,
                 backend: str = "auto", seed: int = 0, footprint: str = "tight",
                 kernel: str = "auto", mesh=None, shard_axis: str = "g",
                 debug_dir: str | None = None):
        # debug_dir: when set (the CLI --debug flag), a non-finite loss dumps
        # the full pre-dispatch state + dispatch inputs to
        # <debug_dir>/snapshot_fw.npz before raising — the reference's
        # snapshot_fw.dump debug flow (rasterization.py:80-93), adapted to
        # the fused-dispatch trainer (per-kernel dumps are meaningless under
        # XLA fusion; the state + view/key schedule reproduces the dispatch).
        self.debug_dir = debug_dir
        self.cameras = cameras
        self.scanner_cfg = scanner_cfg
        self.opt = opt_cfg
        self.scale_bound = (
            None if scale_bound is None else tuple(float(x) for x in scale_bound)
        )
        self.backend = backend
        self.footprint = footprint
        self.kernel = kernel
        self.mesh = mesh
        self.shard_axis = shard_axis
        self.ema_decay = float(getattr(opt_cfg, "ema_decay", 0.0) or 0.0)
        # jnp.copy: ema must not alias the params buffers — the train fn
        # donates the state, and two donated leaves sharing one buffer is
        # undefined
        ema = (jax.tree.map(jnp.copy, params) if self.ema_decay > 0 else None)
        self.state = TrainState(params=params, adam=init_adam(params), aux=aux,
                                ema=ema)
        if mesh is not None:
            n_dev = mesh.devices.size
            cap = params.capacity
            # Contiguous row-range shards must align with the splat kernels'
            # 128-gaussian blocks so per-shard block windows match the
            # single-chip decomposition exactly.
            if cap % (n_dev * 128) != 0:
                raise ValueError(
                    f"capacity {cap} not divisible by n_devices*128 = {n_dev * 128}"
                )
            from ..parallel.sharding import shard_train_state

            self.state = shard_train_state(self.state, mesh, shard_axis)
        self.iteration = 0
        # All per-iteration randomness (view choice, TV-box placement,
        # densify split sampling) is derived from (seed, iteration) rather
        # than a stateful stream: checkpoint resume reproduces the
        # uninterrupted trajectory exactly, and the trajectory is
        # independent of how the caller chunks run_chunk dispatches.
        # (The reference's .pth checkpoints do NOT capture python/torch RNG
        # state, so its resumes silently change the random stream.)
        self.seed = int(seed)
        self.key0 = jax.random.PRNGKey(seed)
        self._perm_epoch = -1
        self._perm: np.ndarray | None = None
        self._train_fns: dict[int, callable] = {}

        off = np.asarray(scanner_cfg["offOrigin"], np.float64)
        s_vox = np.asarray(scanner_cfg["sVoxel"], np.float64)
        self.bbox = jnp.asarray(
            np.stack([off - s_vox / 2, off + s_vox / 2]), jnp.float32
        )
        vol_to_world = float(max(scanner_cfg["sVoxel"]))
        self.densify_cfg = DensifyConfig(
            grad_threshold=float(opt_cfg.densify_grad_threshold),
            min_density=float(opt_cfg.density_min_threshold),
            max_screen_size=(
                None if opt_cfg.max_screen_size is None else float(opt_cfg.max_screen_size)
            ),
            max_scale=(
                None if opt_cfg.max_scale is None else float(opt_cfg.max_scale) * vol_to_world
            ),
            max_num_gaussians=int(opt_cfg.max_num_gaussians),
            densify_scale_threshold=(
                None
                if not opt_cfg.densify_scale_threshold
                else float(opt_cfg.densify_scale_threshold) * vol_to_world
            ),
        )

    # -- view order: a fresh uniform permutation per epoch, derived from
    # (seed, epoch). Distributionally identical to the reference's
    # refillable shuffled-stack sampling (train.py:104-106: popping a
    # uniformly random index each iteration IS a uniform random permutation
    # per refill), but reproducible from the iteration counter alone.
    def _next_views(self, k: int) -> np.ndarray:
        n = len(self.cameras)
        out = np.empty(k, np.int32)
        for j in range(k):
            epoch, pos = divmod(self.iteration + j, n)
            if epoch != self._perm_epoch:
                rng = np.random.default_rng(
                    np.random.SeedSequence([self.seed, epoch]))
                self._perm = rng.permutation(n)
                self._perm_epoch = epoch
            out[j] = self._perm[pos]
        return out

    @property
    def state(self) -> TrainState:
        return self._state

    @state.setter
    def state(self, s: TrainState):
        # External assignments (checkpoint resume, dev harnesses) may change
        # the live-row count; drop the host cache. Internal per-step
        # assignments bypass the setter (_dispatch) because train steps never
        # touch `active`.
        self._state = s
        self._n_active_host = None

    def _n_active(self) -> int:
        """Host-side live gaussian count. `aux.n_active` is a device
        reduction, so every `int(...)` of it is a dispatch plus a full
        device->host round trip — through the tunneled TPU that is
        milliseconds, and _row_bucket needs the count on every dispatch.
        The count only changes at densify events (which return it) and
        external state assignment (which invalidates via the setter), so
        one fetch is exact until then."""
        if self._n_active_host is None:
            n = int(np.asarray(self.state.aux.n_active))
            # The row-bucket hot path renders/optimizes only rows[:bucket];
            # init and densify keep active rows a prefix, but an externally
            # assigned state (checkpoint resume, dev harness) is validated
            # here — a non-prefix state would silently freeze live rows
            # above the bucket. Refills are rare (init + state assignment),
            # so the extra mask fetch is off the hot path.
            act = np.asarray(self.state.aux.active)
            assert act[:n].all() and not act[n:].any(), (
                f"active rows must be a compacted prefix (n_active={n}); "
                "run densify compaction before assigning this state")
            self._n_active_host = n
        return self._n_active_host

    def _row_bucket(self) -> int | None:
        """Static row-count bucket for the hot path: the smallest power-of-2
        multiple of 8192 holding the live rows (actives are a prefix —
        densify.py `_compaction_order`). Power-of-2 buckets bound both the
        recompile count over a full run (~4 shapes from 50k to 500k) and
        the padded-row waste (< 2x). None = full capacity (mesh runs: rows
        are shard-aligned and must not be sliced)."""
        if self.mesh is not None:
            return None
        cap = int(self.state.params.capacity)
        n = self._n_active()
        b = 8192
        while b < n:
            b *= 2
        return None if b >= cap else b

    def _get_train_fn(self, steps: int):
        n_rows = self._row_bucket()
        key = (steps, self.state.params.capacity, n_rows)
        if key not in self._train_fns:
            self._train_fns[key] = make_train_fn(
                cameras=self.cameras,
                scanner_cfg=self.scanner_cfg,
                opt_cfg=self.opt,
                scale_bound=self.scale_bound,
                backend=self.backend,
                steps_per_call=steps,
                footprint=self.footprint,
                kernel=self.kernel,
                mesh=self.mesh,
                shard_axis=self.shard_axis,
                n_rows=n_rows,
            )
        return self._train_fns[key]

    @property
    def eval_params(self) -> GaussianParams:
        """Parameters to evaluate/save: the Polyak average when ema_decay is
        on, the live parameters otherwise (reference behavior)."""
        return self.state.ema if self.state.ema is not None else self.state.params

    def _is_densify_iter(self, it: int) -> bool:
        return (
            it < self.opt.densify_until_iter
            and it > self.opt.densify_from_iter
            and it % self.opt.densification_interval == 0
        )

    def run_chunk(self, n_steps: int):
        """Run n_steps iterations, splitting dispatches at densification
        boundaries so events fire no matter how the caller chunks the run.
        Returns (metrics of the LAST dispatch, n_active or None)."""
        metrics, n_active = None, None
        di = int(self.opt.densification_interval)
        remaining = int(n_steps)
        while remaining:
            to_boundary = ((self.iteration // di) + 1) * di - self.iteration
            k = min(remaining, to_boundary)
            metrics, n = self._dispatch(k)
            n_active = n if n is not None else n_active
            remaining -= k
        return metrics, n_active

    def _dispatch(self, n_steps: int):
        """Run n_steps iterations in one fused dispatch; apply a
        densification event afterwards if the last iteration triggers one."""
        views = self._next_views(n_steps)
        # per-iteration key = fold_in(key0, global_iter): independent of
        # dispatch chunking and exactly reproducible on checkpoint resume
        keys = jax.vmap(lambda i: jax.random.fold_in(self.key0, i))(
            jnp.arange(self.iteration, self.iteration + n_steps))
        its = self.iteration + 1 + np.arange(n_steps)
        # torch leaves grads None on densify iters and skips the final
        # iteration's step (train.py:174-177)
        skip = np.array(
            [self._is_densify_iter(int(i)) or int(i) >= self.opt.iterations for i in its],
            bool,
        )
        fn = self._get_train_fn(n_steps)
        # the train fn donates the state buffers, so --debug must snapshot
        # to host BEFORE the dispatch (the reference's --debug likewise
        # syncs every kernel launch — debug mode trades speed for evidence)
        state_host = (None if self.debug_dir is None
                      else jax.tree.map(np.asarray, self.state))
        # direct _state write: train steps never change `active`, so the
        # host-side n_active cache stays exact across the dispatch
        self._state, metrics = retry_transient(
            fn, self.state, jnp.asarray(views), keys, jnp.asarray(skip),
            jnp.int32(self.iteration),
        )
        # Sync per dispatch: queueing several multi-second dispatches makes
        # some TPU runtimes declare the worker dead ("crashed or restarted").
        # Must be a real device->host transfer: on the axon TPU platform
        # jax.block_until_ready returns before execution finishes (measured),
        # which both under-syncs and corrupts wall-clock timing.
        metrics = np.asarray(metrics)
        if not np.isfinite(metrics).all():
            self._note_nonfinite(n_steps)
            if self.debug_dir is not None:
                self._dump_snapshot(state_host, views, keys, skip, metrics)
        self.iteration += n_steps

        n_active = None
        if self._is_densify_iter(self.iteration):
            n_active = self.densify()
        return metrics, n_active

    def _note_nonfinite(self, n_steps):
        """Always-on, rate-limited visibility for rejected steps (with or
        without --debug): a fully-diverged run that silently rejects every
        step for hours is worse than a noisy log. Prints the first 5
        occurrences, then every 50th."""
        self._nonfinite_chunks = getattr(self, "_nonfinite_chunks", 0) + 1
        c = self._nonfinite_chunks
        if c <= 5 or c % 50 == 0:
            print(
                f"WARNING: non-finite loss in iterations "
                f"{self.iteration + 1}..{self.iteration + n_steps}; updates "
                f"for the affected steps were rejected "
                f"({c} chunk(s) affected so far)",
                flush=True,
            )

    def _dump_snapshot(self, state_in, views, keys, skip, metrics):
        """Non-finite loss under --debug: persist everything needed to
        replay the offending dispatch (reference rasterization.py:80-93
        snapshot_fw.dump). Unlike the reference this does NOT abort: the
        trainer rejects non-finite updates (train_steps_body), so the
        state is still clean and training can continue — the snapshot is
        the forensic record of the first bad dispatch. Only the npz dump is
        deduplicated; warnings keep printing via _note_nonfinite."""
        import os

        if getattr(self, "_debug_dumped", False):
            return
        self._debug_dumped = True
        os.makedirs(self.debug_dir, exist_ok=True)
        path = os.path.join(self.debug_dir, "snapshot_fw.npz")
        p, a = state_in.params, state_in.aux
        # Adam moments are part of the trajectory: without them a replay
        # diverges from the recorded run after one step (learned the hard
        # way on the round-3 chest snapshot — its NaN was only reachable
        # through the original moments).
        ad = state_in.adam
        extra = {}
        for f in p._fields:
            extra[f"adam_m_{f}"] = np.asarray(getattr(ad.m, f))
            extra[f"adam_v_{f}"] = np.asarray(getattr(ad.v, f))
        extra["adam_step"] = np.asarray(ad.step)
        if state_in.ema is not None:
            for f in p._fields:
                extra[f"ema_{f}"] = np.asarray(getattr(state_in.ema, f))
        np.savez_compressed(
            path,
            xyz=np.asarray(p.xyz), scaling=np.asarray(p.scaling),
            rotation=np.asarray(p.rotation), density=np.asarray(p.density),
            active=np.asarray(a.active),
            max_radii2d=np.asarray(a.max_radii2d),
            xyz_gradient_accum=np.asarray(a.xyz_gradient_accum),
            denom=np.asarray(a.denom),
            views=np.asarray(views), keys=np.asarray(keys),
            skip=np.asarray(skip), iteration=self.iteration,
            metrics=metrics,
            scale_bound=np.asarray(self.scale_bound, np.float32)
            if self.scale_bound is not None else np.zeros(0, np.float32),
            **extra,
        )
        print(
            f"WARNING: non-finite loss at iterations {self.iteration + 1}.."
            f"{self.iteration + len(np.asarray(views))}; updates rejected, "
            f"dispatch snapshot written to {path}",
            flush=True,
        )

    def densify(self):
        self._maybe_grow_capacity()
        # distinct stream from the step keys: extra fold_in salt
        sub = jax.random.fold_in(
            jax.random.fold_in(self.key0, self.iteration), 0x64656E)
        state = self.state
        if self.mesh is not None:
            # Densification is global (budget cumsum + compaction sort over
            # all gaussians): all-gather to replicated, run the same jitted
            # event as single-chip, slice back to contiguous row-range
            # shards. Events are rare (every densification_interval), so the
            # gather is amortized to noise; state stays bit-identical to the
            # single-chip trajectory.
            from ..parallel.sharding import replicate_train_state

            state = replicate_train_state(state, self.mesh)
        p, a, x, e, n = densify_and_prune(
            sub, state.params, state.adam, state.aux,
            self.bbox, self.densify_cfg, self.scale_bound, ema=state.ema,
        )
        self.state = TrainState(params=p, adam=a, aux=x, ema=e)
        if self.mesh is not None:
            from ..parallel.sharding import shard_train_state

            self.state = shard_train_state(self.state, self.mesh, self.shard_axis)
        n = int(n)
        self._n_active_host = n  # surgery's return is the exact new count
        if n == 0:
            raise ValueError(
                "No Gaussian left. Change adaptive control hyperparameters!"
            )
        return n

    def _maybe_grow_capacity(self):
        """Ensure capacity can absorb a worst-case doubling densify event."""
        cap = self.state.params.capacity
        n = self._n_active()
        limit = self.densify_cfg.max_num_gaussians
        # densify is budget-clamped, so one event reaches at most
        # min(2n, max(n, limit)) active gaussians
        need = min(2 * n, max(limit, n))
        if need <= cap:
            return
        new_cap = cap
        while new_cap < need:
            new_cap *= 2

        def pad(a, fill=0.0):
            padding = [(0, new_cap - cap)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, padding, constant_values=fill)

        p = self.state.params
        params = GaussianParams(
            xyz=pad(p.xyz), scaling=pad(p.scaling),
            rotation=pad(p.rotation).at[cap:, 0].set(1.0),
            density=pad(p.density, -20.0),
        )
        adam = AdamState(
            m=jax.tree.map(pad, self.state.adam.m),
            v=jax.tree.map(pad, self.state.adam.v),
            step=self.state.adam.step,
        )
        a = self.state.aux
        aux = GaussianAux(
            active=pad(a.active, False),
            max_radii2d=pad(a.max_radii2d),
            xyz_gradient_accum=pad(a.xyz_gradient_accum),
            denom=pad(a.denom),
        )
        e = self.state.ema
        ema = None if e is None else GaussianParams(
            xyz=pad(e.xyz), scaling=pad(e.scaling),
            rotation=pad(e.rotation).at[cap:, 0].set(1.0),
            density=pad(e.density, -20.0),
        )
        self.state = TrainState(params, adam, aux, ema)
