"""Optimizers: Lookahead-Adam (the reference's production optimizer) and
friends, built on optax.

Reference semantics (PileupModel/optim.py:10-104, lookahead.py;
config ont_pileup.yaml optim block): Adam lr 1e-4, Lookahead with slow
weights synced every k steps at alpha, lr multiplied by decay_ratio once per
epoch after `begin_to_adjust_lr`; gradient clipping by global norm.
"""
from __future__ import annotations

from typing import Optional

import optax

from ..config import OptimConfig


def lr_schedule(cfg: OptimConfig, steps_per_epoch: int) -> optax.Schedule:
    """Per-epoch exponential decay starting after begin_to_adjust_lr epochs."""
    import jax.numpy as jnp

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        n = jnp.maximum(epoch - cfg.begin_to_adjust_lr, 0)
        return cfg.lr * (cfg.decay_ratio ** n)

    return schedule


def build_optimizer(
    cfg: OptimConfig,
    steps_per_epoch: int = 1000,
    finetune: bool = False,
) -> optax.GradientTransformation:
    lr = lr_schedule(cfg, steps_per_epoch)
    if finetune:
        base_lr = lr

        def lr_ft(step):
            return 0.1 * base_lr(step)

        lr = lr_ft

    opt_type = cfg.type.lower()
    chain = [optax.clip_by_global_norm(cfg.max_grad_norm)]
    if opt_type in ("adam", "lookahead_adam", "lookaheadadam"):
        inner = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8,
                            weight_decay=cfg.weight_decay)
    elif opt_type in ("radam", "lookahead_radam"):
        inner = optax.radam(lr)
    elif opt_type in ("novograd", "lookahead_novograd"):
        inner = optax.novograd(lr, weight_decay=cfg.weight_decay)
    elif opt_type == "sgd":
        inner = optax.sgd(lr, momentum=0.9, nesterov=True)
    elif opt_type == "adadelta":
        inner = optax.adadelta(lr)
    else:
        raise NotImplementedError(cfg.type)
    chain.append(inner)
    tx = optax.chain(*chain)
    if opt_type.startswith("lookahead"):
        tx = optax.lookahead(tx, sync_period=cfg.lookahead_sync_period,
                             slow_step_size=cfg.lookahead_slow_step)
    return tx


def wrap_params_for_lookahead(params, tx_is_lookahead: bool):
    """LookaheadParams with distinct fast/slow buffers (init_synced aliases
    them, which breaks donation in jitted train steps)."""
    if tx_is_lookahead:
        import jax
        import jax.numpy as jnp

        slow = jax.tree.map(jnp.copy, params)
        return optax.LookaheadParams(fast=params, slow=slow)
    return params
