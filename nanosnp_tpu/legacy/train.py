"""Training loop for the legacy CatModel (reference train.py:100-326).

Reference semantics kept: 10-class gt targets at group centers filtered by
high-confidence region (variants: zy>=0 and gt in the SNV block;
non-variants: unlabeled confident sites downsampled to the variant count —
dataset.py:185-196), LabelSmoothing(0.1) cross-entropy, per-epoch
checkpoints. TPU-first mechanics: one jitted train step (value_and_grad
through the functional model), optax adam, BatchNorm batch statistics
carried explicitly (torch buffers have no gradient; here their zero-grad
optimizer update is overwritten by the returned running stats each step).
"""
from __future__ import annotations

import os
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from .catmodel import catmodel_forward


def cal_label(v1: int, v2: int) -> Optional[int]:
    """The 15-class unordered-pair label over {ref,A,C,G,T(,D=4)} used by
    the config_prev experiments (dataset.py:26-57); pairs outside the
    table return None exactly like the reference falls through."""
    table = {(0, 0): 0, (0, 1): 1, (0, 2): 2, (0, 3): 3, (1, 1): 4,
             (1, 2): 5, (1, 3): 6, (2, 2): 7, (2, 3): 8, (3, 3): 9,
             (4, 4): 10, (0, 4): 11, (1, 4): 12, (2, 4): 13, (3, 4): 14}
    return table.get((min(v1, v2), max(v1, v2)))


def select_training_sites(labels: np.ndarray,
                          rng: np.random.Generator,
                          n_classes: int = 10) -> np.ndarray:
    """labels [N, 3] (confident, gt21, zy) -> shuffled row indices per the
    reference filter (dataset.py:185-196): confident variants with an SNV
    gt class, plus confident unlabeled sites downsampled to the variant
    count. One guard beyond the reference: non-variant rows also require
    an in-head gt (the reference leaves non-ACGT-reference sites carrying
    raw ASCII gt codes in the label array, which would index outside the
    head). n_classes=15 selects the config_prev 15-class variant: GT21
    indices 0-14 (AA..TT, DD, AD..TD) are exactly cal_label's unordered
    pair space, so the deletion-pair classes train too."""
    conf, gt, zy = labels[:, 0], labels[:, 1], labels[:, 2]
    variants = np.flatnonzero((conf > 0) & (zy >= 0) & (gt >= 0)
                              & (gt < n_classes))
    nonvar = np.flatnonzero((conf > 0) & (zy == -1) & (gt >= 0)
                            & (gt < n_classes))
    if len(variants) < len(nonvar):
        nonvar = rng.choice(nonvar, size=len(variants), replace=False)
    idx = np.concatenate([variants, nonvar])
    rng.shuffle(idx)
    return idx


def train_catmodel(
    params,
    batches: Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    *,
    lr: float = 1e-3,
    seed: int = 0,
    log_every: int = 20,
    log=print,
):
    """Run one pass over `batches` of (g0, g1, gt_label); returns
    (params, mean_loss, n_steps)."""
    import jax
    import jax.numpy as jnp
    import optax

    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(p, g0, g1, y, rng):
        logits, new_p = catmodel_forward(p, g0, g1, train=True,
                                         dropout_rng=rng)
        smoothed = optax.smooth_labels(jax.nn.one_hot(y, logits.shape[-1]),
                                       0.1)
        return optax.softmax_cross_entropy(logits, smoothed).mean(), new_p

    @jax.jit
    def step(p, opt_state, g0, g1, y, rng):
        (loss, new_p), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, g0, g1, y, rng)
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        # BatchNorm running stats are buffers, not trained weights: put
        # the forward pass's EMA update back over the optimizer's no-op
        blocks = [{**bp, "bn1": {**bp["bn1"],
                                 "mean": nb["bn1"]["mean"],
                                 "var": nb["bn1"]["var"]},
                   "bn2": {**bp["bn2"],
                           "mean": nb["bn2"]["mean"],
                           "var": nb["bn2"]["var"]}}
                  for bp, nb in zip(p["res_blocks"], new_p["res_blocks"])]
        return {**p, "res_blocks": blocks}, opt_state, loss

    key = jax.random.key(seed)
    losses = []
    for i, (g0, g1, y) in enumerate(batches):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(g0, jnp.float32),
            jnp.asarray(g1, jnp.float32), jnp.asarray(y, jnp.int32), sub)
        losses.append(float(loss))
        if log_every and (i + 1) % log_every == 0:
            log(f"  step {i + 1}: loss {np.mean(losses[-log_every:]):.4f}")
    return params, (float(np.mean(losses)) if losses else float("nan")), len(losses)
