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
    lookahead = opt_type.startswith("lookahead")
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
    elif opt_type == "ranger":
        # PileupModel flavor (reference PileupModel/optim.py:97-102, the
        # lessw2020 Ranger pip package, Dockerfile:28-29): gradient
        # centralization -> RAdam -> Lookahead(k=6, alpha=0.5).
        chain.append(gradient_centralization())
        inner = optax.radam(lr)
        lookahead = True
    elif opt_type == "ranger21":
        # HaplotypeModel flavor (reference HaplotypeModel/optim.py:104-125,
        # the Ranger21 pip package, Dockerfile:27) with the reference's
        # enabled components: adaptive gradient clipping (0.01), gradient
        # centralization, AdamW core, norm-loss regularizer (6e-4), linear
        # warmup (10%) + warmdown (from 90%) around the base schedule,
        # Lookahead. Semantics-level port — the pip package is unported
        # torch; each component is reimplemented on optax primitives.
        # float arithmetic throughout: steps_per_epoch can be huge
        # (callers pass 10**9 for "no epoch decay"), and int32 math
        # inside jit would overflow
        total = float(steps_per_epoch) * max(cfg.ranger21_epochs, 1)
        base_lr = lr
        warm = max(0.1 * total, 1.0)
        down = max(0.9 * total, warm)

        def lr21(step):
            import jax.numpy as jnp

            stepf = step.astype(jnp.float32) if hasattr(step, "astype") \
                else float(step)
            ramp = jnp.minimum((stepf + 1.0) / warm, 1.0)
            decay = jnp.clip((total - stepf) / max(total - down, 1.0),
                             0.0, 1.0)
            return base_lr(step) * ramp * jnp.where(stepf > down, decay, 1.0)

        # the reference's train loop applies its global-norm clip on top of
        # whatever optimizer is selected, so keep it alongside AGC
        chain = [optax.clip_by_global_norm(cfg.max_grad_norm),
                 optax.adaptive_grad_clip(0.01),
                 gradient_centralization()]
        inner = optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            norm_loss(6e-4),
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_learning_rate(lr21),
        )
        lookahead = True
    else:
        raise NotImplementedError(cfg.type)
    chain.append(inner)
    tx = optax.chain(*chain)
    if lookahead:
        tx = optax.lookahead(tx, sync_period=cfg.lookahead_sync_period,
                             slow_step_size=cfg.lookahead_slow_step)
    return tx


def is_lookahead_type(type_str: str) -> bool:
    """Whether build_optimizer(type_str) returns a lookahead-wrapped tx
    (params must be LookaheadParams). Both Ranger flavors have lookahead
    built in (Ranger = RAdam+LookAhead+GC by definition; Ranger21 with the
    reference's lookahead_active=True)."""
    t = type_str.lower()
    return t.startswith("lookahead") or t in ("ranger", "ranger21")


def gradient_centralization() -> optax.GradientTransformation:
    """Gradient Centralization (Yong et al. 2020), as both Ranger flavors
    apply it: for every parameter with ndim > 1, subtract from its gradient
    the mean over all axes except the first (per-output-channel zero-mean).
    1-D params (biases, layernorm scales) pass through."""
    def update(updates, state, params=None):
        import jax

        def gc(g):
            if g.ndim <= 1:
                return g
            axes = tuple(range(1, g.ndim))
            return g - g.mean(axis=axes, keepdims=True)

        return jax.tree.map(gc, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                        update)


def norm_loss(factor: float) -> optax.GradientTransformation:
    """Norm-loss regularizer (Georgiou et al. 2021, as used in Ranger21
    with normloss_active=True): softly pulls each parameter tensor's
    per-output-slice L2 norm toward 1 by adding
    ``factor * (1 - 1/||p||) * p`` to the update. Unlike weight decay it
    pushes small weights UP and large weights down. Applied after the Adam
    scaling (matching Ranger21's update composition)."""
    def update(updates, state, params=None):
        import jax
        import jax.numpy as jnp

        if params is None:
            return updates, state

        def nl(u, p):
            if p.ndim > 1:
                axes = tuple(range(1, p.ndim))
                norm = jnp.sqrt((p * p).sum(axis=axes, keepdims=True))
            else:
                norm = jnp.sqrt((p * p).sum())
            corr = factor * (1.0 - 1.0 / jnp.maximum(norm, 1e-3))
            return u + corr * p

        return jax.tree.map(nl, updates, params), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                        update)


def wrap_params_for_lookahead(params, tx_is_lookahead: bool):
    """LookaheadParams with distinct fast/slow buffers (init_synced aliases
    them, which breaks donation in jitted train steps)."""
    if tx_is_lookahead:
        import jax
        import jax.numpy as jnp

        slow = jax.tree.map(jnp.copy, params)
        return optax.LookaheadParams(fast=params, slow=slow)
    return params
