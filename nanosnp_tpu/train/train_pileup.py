"""Pileup-model training (reference PileupModel/train.py re-architected).

Loss = label-smoothed CE on gt + zy heads only (model.py:110); optimizer
Lookahead-Adam lr 1e-4 with per-epoch 0.98 decay after epoch 10, grad-clip 20
(config/ont_pileup.yaml). Training is data-parallel over the mesh's "data"
axis: batches shard over devices, gradients all-reduce via XLA-inserted
psum (no NCCL/DataParallel translation).
"""
from __future__ import annotations

import os
import pickle
import time
from dataclasses import dataclass
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import PileupModelConfig, TrainConfig
from ..models.pileup_model import init_pileup_params, pileup_forward
from ..parallel.mesh import make_mesh, replicated, shard_batch
from .losses import label_smoothing_loss
from .optim import build_optimizer, wrap_params_for_lookahead


@dataclass
class TrainState:
    params: Dict
    opt_state: optax.OptState
    step: int = 0
    epoch: int = 0


def make_pileup_train_step(mcfg: PileupModelConfig, tcfg: TrainConfig,
                           tx: optax.GradientTransformation):
    smoothing = tcfg.optim.label_smoothing

    def loss_fn(params, x, gt_target, zy_target, dropout_rng):
        gt, zy, _, _ = pileup_forward(params, x, mcfg,
                                      dropout_rng=dropout_rng, all_heads=False)
        gt_loss = label_smoothing_loss(gt, gt_target, smoothing)
        zy_loss = label_smoothing_loss(zy, zy_target, smoothing)
        loss = gt_loss + zy_loss
        acc = jnp.mean((gt.argmax(-1) == gt_target).astype(jnp.float32))
        return loss, {"loss": loss, "gt_loss": gt_loss, "zy_loss": zy_loss,
                      "gt_acc": acc}

    def train_step(state_params, opt_state, x, gt_target, zy_target, rng):
        rng, sub = jax.random.split(rng)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(
            _fast(state_params), x, gt_target, zy_target, sub)
        updates, opt_state = tx.update(grads, opt_state, state_params)
        state_params = optax.apply_updates(state_params, updates)
        return state_params, opt_state, metrics, rng

    return train_step


def _fast(params):
    """Lookahead wraps params in (fast, slow); training uses the fast set."""
    if isinstance(params, optax.LookaheadParams):
        return params.fast
    return params


def train_pileup(
    data_iter: Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    mcfg: PileupModelConfig,
    tcfg: TrainConfig,
    steps_per_epoch: int,
    out_dir: str,
    init_params=None,
    mesh=None,
    log_every: int = 50,
    max_steps: Optional[int] = None,
    resume_from: Optional[str] = None,
    eval_fn=None,
) -> TrainState:
    """Generic loop over an iterator yielding (x [B,33,18], gt [B], zy [B])."""
    os.makedirs(out_dir, exist_ok=True)
    mesh = mesh or make_mesh()
    data_sh = shard_batch(mesh)
    rep = replicated(mesh)

    rng = jax.random.key(tcfg.seed)
    params = init_params if init_params is not None else init_pileup_params(
        jax.random.key(tcfg.seed), mcfg)
    tx = build_optimizer(tcfg.optim, steps_per_epoch)
    is_lookahead = tcfg.optim.type.lower().startswith("lookahead")
    if is_lookahead:
        params = wrap_params_for_lookahead(params, True)
    opt_state = tx.init(params)
    if resume_from:
        restored = resume_state(resume_from)
        params, opt_state = restored.params, restored.opt_state
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)

    step_fn = jax.jit(make_pileup_train_step(mcfg, tcfg, tx), donate_argnums=(0, 1))

    state = TrainState(params, opt_state)
    if resume_from:
        state.step = restored.step
        state.epoch = restored.epoch
    from ..utils.profiling import count_parameters

    print(f"[{__name__.split('.')[-1]}] model parameters: "
          f"{count_parameters(_fast(state.params)):,}")
    best_metric = [float("-inf")]
    t0 = time.monotonic()
    for x, gt_t, zy_t in data_iter:
        xb = jax.device_put(jnp.asarray(x, jnp.float32), data_sh)
        gtb = jax.device_put(jnp.asarray(gt_t), data_sh)
        zyb = jax.device_put(jnp.asarray(zy_t), data_sh)
        state.params, state.opt_state, metrics, rng = step_fn(
            state.params, state.opt_state, xb, gtb, zyb, rng)
        state.step += 1
        if state.step % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            dt = time.monotonic() - t0
            print(f"[train_pileup] step {state.step} "
                  f"loss {m['loss']:.4f} gt_acc {m['gt_acc']:.4f} "
                  f"({state.step / dt:.1f} steps/s)")
        if state.step % steps_per_epoch == 0:
            state.epoch += 1
            save_checkpoint(os.path.join(out_dir, f"epoch_{state.epoch}.ckpt"),
                            state)
            # best-metric checkpoint retention (reference
            # train_dev.py:258-281: keeps a best-F1 copy per epoch)
            if eval_fn is not None:
                metric = float(eval_fn(state))
                if metric > best_metric[0]:
                    best_metric[0] = metric
                    save_checkpoint(os.path.join(out_dir, "best.ckpt"), state)
        if max_steps and state.step >= max_steps:
            break
    save_checkpoint(os.path.join(out_dir, "last.ckpt"), state,
                    include_optimizer=True)
    return state


def save_checkpoint(path: str, state: TrainState,
                    include_optimizer: bool = False) -> None:
    """Inference checkpoints store fast params only; pass
    include_optimizer=True for resumable training state (the reference's
    continue-mode dict of encoder/forward_layer/optimizer/epoch/step,
    PileupModel/utils.py:67-77)."""
    params = _fast(state.params)
    blob = {"params": jax.tree.map(np.asarray, params),
            "step": state.step, "epoch": state.epoch}
    if include_optimizer:
        blob["full_params"] = jax.tree.map(np.asarray, state.params)
        blob["opt_state"] = jax.tree.map(np.asarray, state.opt_state)
    with open(path, "wb") as f:
        pickle.dump(blob, f)


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        blob = pickle.load(f)
    return jax.tree.map(jnp.asarray, blob["params"]), blob


def resume_state(path: str) -> TrainState:
    """Restore a full training state saved with include_optimizer=True."""
    with open(path, "rb") as f:
        blob = pickle.load(f)
    if "opt_state" not in blob:
        raise ValueError(f"{path} was saved without optimizer state")
    return TrainState(
        params=jax.tree.map(jnp.asarray, blob["full_params"]),
        opt_state=jax.tree.map(jnp.asarray, blob["opt_state"]),
        step=blob["step"],
        epoch=blob["epoch"],
    )
