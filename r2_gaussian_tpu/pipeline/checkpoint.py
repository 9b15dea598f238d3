"""Training checkpoints (reference capture/restore + ckpt/chkpntN.pth,
gaussian_model.py:79-110, train.py:184-190): the full optimizer state,
densification accumulators and iteration count, as a pickle of numpy arrays.
Padded buffers checkpoint with their live mask so capacity can differ on
restore."""

from __future__ import annotations

import os
import os.path as osp
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaussians import GaussianAux, GaussianParams
from ..pipeline.optim import AdamState
from ..pipeline.trainer import TrainState


def save_checkpoint(path: str, state: TrainState, iteration: int, scale_bound):
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    to_np = lambda t: jax.tree.map(np.asarray, t)
    blob = {
        "params": to_np(state.params)._asdict(),
        "adam_m": to_np(state.adam.m)._asdict(),
        "adam_v": to_np(state.adam.v)._asdict(),
        "adam_step": int(state.adam.step),
        "aux": {
            "active": np.asarray(state.aux.active),
            "max_radii2d": np.asarray(state.aux.max_radii2d),
            "xyz_gradient_accum": np.asarray(state.aux.xyz_gradient_accum),
            "denom": np.asarray(state.aux.denom),
        },
        "iteration": int(iteration),
        "scale_bound": None if scale_bound is None else tuple(scale_bound),
        # Polyak evaluation parameters (None unless opt.ema_decay > 0)
        "ema": None if state.ema is None else to_np(state.ema)._asdict(),
    }
    with open(path, "wb") as f:
        pickle.dump(blob, f, pickle.HIGHEST_PROTOCOL)


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        blob = pickle.load(f)
    params = GaussianParams(**{k: jnp.asarray(v) for k, v in blob["params"].items()})
    adam = AdamState(
        m=GaussianParams(**{k: jnp.asarray(v) for k, v in blob["adam_m"].items()}),
        v=GaussianParams(**{k: jnp.asarray(v) for k, v in blob["adam_v"].items()}),
        step=jnp.int32(blob["adam_step"]),
    )
    aux = GaussianAux(**{k: jnp.asarray(v) for k, v in blob["aux"].items()})
    ema_blob = blob.get("ema")  # absent in pre-EMA checkpoints
    ema = (None if ema_blob is None else
           GaussianParams(**{k: jnp.asarray(v) for k, v in ema_blob.items()}))
    return (
        TrainState(params=params, adam=adam, aux=aux, ema=ema),
        blob["iteration"],
        blob["scale_bound"],
    )
