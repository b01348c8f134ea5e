"""Optimizer + LR schedules.

Parity with get_optimizer_scheduler (lib/train/base_functions.py:196-224):
AdamW with two parameter groups — backbone at LR * BACKBONE_MULTIPLIER —
global-norm gradient clipping (0.1), and step / multi-step / warmup-multistep
/ cosine-annealing schedules stepped per epoch. Frozen leaves (fixed sin-cos
position embeddings when LEARNABLE_POSITION=False) get zero updates via an
optax mask, matching requires_grad=False in the reference.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
import jax.tree_util as jtu
import optax


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def param_labels(params, learnable_pos: bool = False) -> dict:
    """Label each leaf: 'backbone' (LR x multiplier), 'head', or 'frozen'.

    learnable_pos mirrors cfg.MODEL.LEARNABLE_POSITION (requires_grad on the
    reference's pos_embed_z/x, mae_vit.py:120-121): True trains the position
    embeddings in the backbone group instead of freezing them."""

    def label(path, _):
        p = _path_str(path)
        if not learnable_pos and ("pos_embed_z" in p or "pos_embed_x" in p):
            return "frozen"
        if p.startswith("backbone"):
            return "backbone"
        return "head"

    return jtu.tree_map_with_path(label, params)


def lr_schedule(cfg, steps_per_epoch: int) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Per-epoch schedules identical to the reference's torch schedulers."""
    base = float(cfg.TRAIN.LR)
    kind = cfg.TRAIN.SCHEDULER.TYPE
    epochs = int(cfg.TRAIN.EPOCH)

    def epoch_of(step):
        return step // steps_per_epoch

    if kind == "step":
        drop = int(cfg.TRAIN.LR_DROP_EPOCH)
        rate = float(cfg.TRAIN.SCHEDULER.DECAY_RATE)

        def fn(step):
            return base * jnp.where(epoch_of(step) >= drop, rate, 1.0)

    elif kind == "Mstep":
        milestones = jnp.asarray(list(cfg.TRAIN.SCHEDULER.MILESTONES))
        gamma = float(cfg.TRAIN.SCHEDULER.GAMMA)

        def fn(step):
            k = (epoch_of(step) >= milestones).sum()
            return base * gamma ** k

    elif kind == "WarmMstep":
        warm = int(cfg.TRAIN.SCHEDULER.WARM_EPOCH)
        milestones = jnp.asarray(list(cfg.TRAIN.SCHEDULER.MILESTONES))
        gamma = float(cfg.TRAIN.SCHEDULER.GAMMA)

        def fn(step):
            e = epoch_of(step)
            warm_lr = base * (e + 1) / max(warm, 1)
            k = (e >= milestones).sum()
            return jnp.where(e < warm, warm_lr, base * gamma ** k)

    elif kind == "CosineAnnealingLR":
        # torch CosineAnnealingLR(T_max=EPOCH): eta_min=0
        def fn(step):
            e = epoch_of(step)
            return base * 0.5 * (1.0 + jnp.cos(jnp.pi * e / epochs))

    else:
        raise ValueError(f"unknown scheduler {kind!r}")

    return fn


def build_optimizer(cfg, params, steps_per_epoch: int = 1):
    """AdamW with per-group LR scaling + grad clip; returns optax tx."""
    sched = lr_schedule(cfg, steps_per_epoch)
    wd = float(cfg.TRAIN.WEIGHT_DECAY)
    mult = float(cfg.TRAIN.BACKBONE_MULTIPLIER)

    def adamw(scale: float):
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(wd),
            optax.scale_by_learning_rate(lambda s: sched(s) * scale),
        )

    labels = param_labels(params, bool(cfg.MODEL.LEARNABLE_POSITION))
    tx = optax.multi_transform(
        {"backbone": adamw(mult), "head": adamw(1.0),
         "frozen": optax.set_to_zero()},
        labels,
    )
    clip = float(cfg.TRAIN.GRAD_CLIP_NORM)
    if clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx
