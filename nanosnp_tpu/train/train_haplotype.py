"""Haplotype-model training (reference HaplotypeModel/train_dev.py
re-architected; regenerates the checkpoint absent from the reference mirror).

Loss = label-smoothed CE on gt(10) + zy(3); grad-clip 2; Lookahead-Adam
lr 1e-5, decay 0.98 after epoch 3 (config/ont_haplotype.yaml). Features are
computed on device inside the train step (haplotype_features), so the input
pipeline ships compact int read matrices, not 105-float tensors — an
order-of-magnitude HBM/DCN traffic saving vs the reference's host-side
featurization.
"""
from __future__ import annotations

import os
import time
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import HaplotypeModelConfig, TrainConfig
from ..features.haplotype import haplotype_features
from ..models.haplotype_model import haplotype_forward, init_haplotype_params
from ..parallel.mesh import make_mesh, replicated, shard_batch
from .losses import label_smoothing_loss
from .optim import build_optimizer, wrap_params_for_lookahead
from .train_pileup import TrainState, _fast, resume_state, save_checkpoint


def make_haplotype_train_step(mcfg: HaplotypeModelConfig, tcfg: TrainConfig,
                              tx: optax.GradientTransformation,
                              featurize_on_device: bool = True):
    smoothing = tcfg.optim.label_smoothing

    def loss_fn(params, batch, dropout_rng):
        if featurize_on_device:
            xp = haplotype_features(batch["p_seq"], batch["p_baseq"],
                                    batch["p_mapq"], batch["p_hap"],
                                    batch["p_ref"])
            xh = haplotype_features(batch["h_seq"], batch["h_baseq"],
                                    batch["h_mapq"], batch["h_hap"],
                                    batch["h_ref"])
        else:
            xp, xh = batch["xp"], batch["xh"]
        gt, zy = haplotype_forward(params, xp, xh, mcfg,
                                   dropout_rng=dropout_rng)
        gt_loss = label_smoothing_loss(gt, batch["gt"], smoothing)
        zy_loss = label_smoothing_loss(zy, batch["zy"], smoothing)
        loss = gt_loss + zy_loss
        acc = jnp.mean((gt.argmax(-1) == batch["gt"]).astype(jnp.float32))
        return loss, {"loss": loss, "gt_loss": gt_loss, "zy_loss": zy_loss,
                      "gt_acc": acc}

    def train_step(params, opt_state, batch, rng):
        rng, sub = jax.random.split(rng)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            _fast(params), batch, sub)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics, rng

    return train_step


def train_haplotype(
    data_iter: Iterator[Dict[str, np.ndarray]],
    mcfg: HaplotypeModelConfig,
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
    """Loop over batches: dicts with p_/h_ read-matrix arrays + gt/zy labels."""
    os.makedirs(out_dir, exist_ok=True)
    mesh = mesh or make_mesh()
    data_sh = shard_batch(mesh)
    rep = replicated(mesh)

    rng = jax.random.key(tcfg.seed)
    params = init_params if init_params is not None else init_haplotype_params(
        jax.random.key(tcfg.seed), mcfg)
    tx = build_optimizer(tcfg.optim, steps_per_epoch)
    if tcfg.optim.type.lower().startswith("lookahead"):
        params = wrap_params_for_lookahead(params, True)
    opt_state = tx.init(params)
    if resume_from:
        restored = resume_state(resume_from)
        params, opt_state = restored.params, restored.opt_state
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)

    step_fn = jax.jit(make_haplotype_train_step(mcfg, tcfg, tx),
                      donate_argnums=(0, 1))
    state = TrainState(params, opt_state)
    if resume_from:
        state.step = restored.step
        state.epoch = restored.epoch
    from ..utils.profiling import count_parameters

    print(f"[{__name__.split('.')[-1]}] model parameters: "
          f"{count_parameters(_fast(state.params)):,}")
    best_metric = [float("-inf")]
    t0 = time.monotonic()
    for batch in data_iter:
        device_batch = {
            k: jax.device_put(jnp.asarray(
                v, jnp.float32 if v.dtype.kind in "fiu" and k not in ("gt", "zy")
                else None), data_sh)
            for k, v in batch.items()
        }
        state.params, state.opt_state, metrics, rng = step_fn(
            state.params, state.opt_state, device_batch, rng)
        state.step += 1
        if state.step % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            dt = time.monotonic() - t0
            print(f"[train_haplotype] step {state.step} loss {m['loss']:.4f} "
                  f"gt_acc {m['gt_acc']:.4f} ({state.step / dt:.1f} steps/s)")
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
