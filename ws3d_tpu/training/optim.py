"""Optimizer + schedules: optax equivalents of the reference's fastai stack.

- OneCycle cosine LR/momentum (tools/train_utils/learning_schedules_fastai.py
  :56-76): lr_max/div -> lr_max over pct_start, then lr_max -> 2e-6;
  momentum 0.95 -> 0.85 -> 0.95.
- adam_onecycle = Adam with "true" (decoupled) weight decay excluding
  normalization params (fastai_optim.py:101-260 layer-group behavior).
- BN momentum decay schedule (train_utils.py:31-52): momentum(epoch) =
  clip(BN_MOMENTUM * BN_DECAY^(epoch // step), BNM_CLIP).
- gradient-norm clip 1.0 (train_utils.py:145).
"""
from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import optax


def _annealing_cos(start: float, end: float, pct: jnp.ndarray) -> jnp.ndarray:
    cos_out = jnp.cos(math.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def onecycle_schedule(total_steps: int, lr_max: float,
                      div_factor: float = 10.0,
                      pct_start: float = 0.4,
                      final_lr: float = 2e-6) -> Callable:
    """LR(step) matching OneCycle (learning_schedules_fastai.py:57-76)."""
    a1 = max(int(total_steps * pct_start), 1)
    a2 = max(total_steps - a1, 1)
    low = lr_max / div_factor

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        up = _annealing_cos(low, lr_max, jnp.clip(step / a1, 0, 1))
        down = _annealing_cos(lr_max, final_lr,
                              jnp.clip((step - a1) / a2, 0, 1))
        return jnp.where(step < a1, up, down)

    return schedule


def onecycle_momentum(total_steps: int, moms=(0.95, 0.85),
                      pct_start: float = 0.4) -> Callable:
    a1 = max(int(total_steps * pct_start), 1)
    a2 = max(total_steps - a1, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        down = _annealing_cos(moms[0], moms[1], jnp.clip(step / a1, 0, 1))
        up = _annealing_cos(moms[1], moms[0],
                            jnp.clip((step - a1) / a2, 0, 1))
        return jnp.where(step < a1, down, up)

    return schedule


def bn_momentum_schedule(cfg) -> Callable[[int], float]:
    """Torch-convention BN momentum per epoch (BNMomentumScheduler,
    train_utils.py:31-52 with lr_bn_decay, train_rpn.py:119-126)."""
    def fn(epoch: int) -> float:
        decays = sum(1 for s in cfg.TRAIN.BN_DECAY_STEP_LIST if epoch >= s)
        return max(cfg.TRAIN.BN_MOMENTUM * cfg.TRAIN.BN_DECAY ** decays,
                   cfg.TRAIN.BNM_CLIP)
    return fn


def _decay_mask(params) -> dict:
    """True for weights that get weight decay: exclude biases and norm
    scales (1-D arrays), like fastai's layer-group BN exclusion."""
    return jax.tree.map(lambda p: p.ndim > 1, params)


def build_optimizer(cfg, total_steps: int, params,
                    trainable_mask=None) -> optax.GradientTransformation:
    """adam_onecycle with grad clipping and decoupled weight decay.

    trainable_mask: optional pytree of bools — False subtrees get zero
    updates (the IOUN stage freezes the RCNN trunk, rcnn_net.py:126-128).
    """
    lr = onecycle_schedule(total_steps, cfg.TRAIN.LR,
                           div_factor=cfg.TRAIN.DIV_FACTOR,
                           pct_start=cfg.TRAIN.PCT_START)
    mom = onecycle_momentum(total_steps, tuple(cfg.TRAIN.MOMS),
                            pct_start=cfg.TRAIN.PCT_START)

    # Adam with schedule-driven b1: optax.scale_by_adam takes static b1, so
    # we implement the momentum schedule via inject_hyperparams.
    @optax.inject_hyperparams
    def base(learning_rate, b1):
        return optax.chain(
            optax.clip_by_global_norm(cfg.TRAIN.GRAD_NORM_CLIP),
            optax.scale_by_adam(b1=b1, b2=0.99),
            optax.add_decayed_weights(cfg.TRAIN.WEIGHT_DECAY,
                                      mask=_decay_mask(params)),
            optax.scale_by_learning_rate(learning_rate),
        )

    tx = base(learning_rate=lr, b1=mom)
    if trainable_mask is not None:
        tx = optax.chain(tx, optax.masked(
            optax.set_to_zero(),
            jax.tree.map(lambda t: not t, trainable_mask)))
    return tx
