"""Train state, optimizer assembly, EMA, and the jitted train/eval steps.

Replaces the reference's imperative loop internals (train.py:130-384):
AdamW + grad clip + accumulation + EMA + the stage-weighted CombinedLoss,
re-expressed as a pure ``train_step(state, batch) -> (state, metrics)``
compiled once per loss stage. Data parallelism is the standard jit pattern:
params replicated, batch sharded over the mesh's 'data' axis — XLA inserts
the gradient all-reduce over ICI (no DDP/NCCL analogue needed).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..losses.combined import CombinedLoss

__all__ = ["TrainState", "create_optimizer", "ema_update", "make_train_step",
           "make_eval_step"]

Params = Any


from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Params
    opt_state: optax.OptState
    ema_params: Optional[Params] = None
    # Non-trainable model collections (BatchNorm running stats — the LKA
    # blocks carry BN like the reference, large_kernel_attention.py:84).
    model_state: Optional[Params] = None
    rng: Optional[jnp.ndarray] = None


def create_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    """AdamW + global-norm clip + warmup/cosine-warm-restarts LR +
    gradient accumulation (reference train.py:196-222, 847-866)."""
    from .schedule import _lr_at_epoch_jnp

    tcfg = cfg.training
    accum = max(1, tcfg.accumulation_steps)

    def lr_fn(step):
        # `step` counts optimizer updates; one epoch = steps_per_epoch
        # batches = steps_per_epoch / accum updates.
        updates_per_epoch = max(steps_per_epoch // accum, 1)
        epoch = step // updates_per_epoch
        return _lr_at_epoch_jnp(epoch, tcfg.scheduler, tcfg.optimizer.lr)

    tx = optax.chain(
        optax.clip_by_global_norm(tcfg.gradient_clip),
        optax.adamw(
            learning_rate=lr_fn,
            b1=tcfg.optimizer.betas[0],
            b2=tcfg.optimizer.betas[1],
            eps=tcfg.optimizer.eps,
            weight_decay=tcfg.optimizer.weight_decay,
        ),
    )
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def ema_update(ema_params: Params, params: Params, decay: float) -> Params:
    """Shadow-parameter EMA (reference checkpoint_manager.py:320-377)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, params)


def make_train_step(apply_fn: Callable[..., jnp.ndarray],
                    tx: optax.GradientTransformation,
                    loss_weights: Dict[str, float],
                    ema_decay: Optional[float] = 0.9995,
                    donate: bool = True):
    """Build a jitted train step for one loss stage.

    ``apply_fn(params, model_state, batch, rng) -> (sr, new_model_state)``
    hides whether experts run live or come from the cache; the loss always
    compares sr (clamped like the reference, train.py:326) against
    batch['hr']. ``model_state`` carries BatchNorm running stats; ``rng``
    feeds dropout.
    """
    criterion = CombinedLoss(weights=loss_weights)

    def loss_fn(params, model_state, batch, rng):
        sr, new_model_state = apply_fn(params, model_state, batch, rng)
        total, comps = criterion(jnp.clip(sr, 0.0, 1.0), batch["hr"],
                                 return_components=True)
        return total, (comps, new_model_state)

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng, step_rng = jax.random.split(state.rng)
        (loss, (comps, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.model_state, batch,
                                   step_rng)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if new_ema is not None and ema_decay is not None:
            new_ema = ema_update(new_ema, new_params, ema_decay)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads), **comps}
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt_state, ema_params=new_ema,
                             model_state=new_model_state, rng=rng), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(apply_fn: Callable[..., jnp.ndarray],
                   crop_border: int = 4, test_y_channel: bool = True):
    """Jitted validation step: sr + challenge-convention PSNR/SSIM.

    ``apply_fn(params, model_state, batch) -> sr`` (eval mode: BN running
    stats, no dropout). Metrics are per-image [B] vectors — the reference
    averages per-image PSNR (train.py:414-533), which differs from PSNR of
    the pooled batch MSE once B > 1."""
    from ..utils.metrics import psnr, ssim

    def step(params, model_state, batch):
        sr = jnp.clip(apply_fn(params, model_state, batch), 0.0, 1.0)
        per_image = lambda fn: jax.vmap(
            lambda a, b: fn(a[None], b[None], crop_border, test_y_channel))
        return sr, {
            "psnr": per_image(psnr)(sr, batch["hr"]),
            "ssim": per_image(ssim)(sr, batch["hr"]),
        }

    return jax.jit(step)


def split_variables(variables) -> Tuple[Params, Params]:
    """Split flax init() output into (params, model_state-collections)."""
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    return params, model_state
