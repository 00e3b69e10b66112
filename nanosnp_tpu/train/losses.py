"""Training losses.

label_smoothing_loss mirrors the reference LabelSmoothingLoss
(PileupModel/optim.py:129-144): target distribution puts `1 - smoothing` on
the true class and `smoothing / (n_class - 1)` on every other class, loss is
mean over batch of the cross entropy against that distribution.

focal_loss is provided for parity with HaplotypeModel/focal_loss.py (defined
but unused by the production models).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def label_smoothing_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                         smoothing: float = 0.1) -> jnp.ndarray:
    """logits [N, C], targets [N] int. Returns scalar."""
    n_class = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    one_hot = jax.nn.one_hot(targets, n_class, dtype=logits.dtype)
    true_dist = one_hot * (1.0 - smoothing) + (1.0 - one_hot) * (
        smoothing / (n_class - 1))
    return jnp.mean(jnp.sum(-true_dist * logp, axis=-1))


def focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
               gamma: float = 2.0, alpha: float = 0.25) -> jnp.ndarray:
    n_class = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    one_hot = jax.nn.one_hot(targets, n_class, dtype=logits.dtype)
    pt = jnp.sum(p * one_hot, axis=-1)
    logpt = jnp.sum(logp * one_hot, axis=-1)
    return jnp.mean(-alpha * (1.0 - pt) ** gamma * logpt)
