"""Haplotype-model training (reference HaplotypeModel/train_dev.py
re-architected; regenerates the checkpoint absent from the reference mirror).

Loss = label-smoothed CE on gt(10) + zy(3); grad-clip 2; Lookahead-Adam
lr 1e-5, decay 0.98 after epoch 3 (config/ont_haplotype.yaml). Features are
computed on device inside the train step (haplotype_features), so the input
pipeline ships compact int read matrices, not 105-float tensors — an
order-of-magnitude HBM/DCN traffic saving vs the reference's host-side
featurization.

Per-epoch observability mirrors train_dev.py:87,244-270 (ConfusionMeter,
scalar history, best-F1 checkpoint): gt/zy confusion + macro-F1 into
scalars.jsonl; best.ckpt kept on the validation metric. Epoch boundaries
come from the data.EPOCH_END sentinel — no counting pre-pass over shards.
"""
from __future__ import annotations

import os
import time
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import HaplotypeModelConfig, TrainConfig
from ..features.haplotype import haplotype_features
from ..models.haplotype_model import haplotype_forward, init_haplotype_params
from ..parallel.mesh import make_mesh, replicated, shard_batch
from .losses import label_smoothing_loss
from .metrics import MetricsLogger
from .optim import (build_optimizer, is_lookahead_type,
                    wrap_params_for_lookahead)
from .train_pileup import (EpochMeter, TrainState, _fast, _stack_batches,
                           freeze_mask_fn, make_multi_step, resume_state,
                           save_checkpoint)


def _featurize(batch):
    xp = haplotype_features(batch["p_seq"], batch["p_baseq"],
                            batch["p_mapq"], batch["p_hap"], batch["p_ref"])
    xh = haplotype_features(batch["h_seq"], batch["h_baseq"],
                            batch["h_mapq"], batch["h_hap"], batch["h_ref"])
    return xp, xh


def make_haplotype_train_step(mcfg: HaplotypeModelConfig, tcfg: TrainConfig,
                              tx: optax.GradientTransformation,
                              featurize_on_device: bool = True,
                              use_pallas: bool = False):
    smoothing = tcfg.optim.label_smoothing
    mask = freeze_mask_fn(tuple(tcfg.freeze_prefixes))

    def loss_fn(params, batch, dropout_rng):
        if featurize_on_device:
            xp, xh = _featurize(batch)
        else:
            xp, xh = batch["xp"], batch["xh"]
        gt, zy = haplotype_forward(params, xp, xh, mcfg,
                                   dropout_rng=dropout_rng,
                                   use_pallas=use_pallas)
        gt_loss = label_smoothing_loss(gt, batch["gt"], smoothing)
        zy_loss = label_smoothing_loss(zy, batch["zy"], smoothing)
        loss = gt_loss + zy_loss
        gt_pred = gt.argmax(-1)
        acc = jnp.mean((gt_pred == batch["gt"]).astype(jnp.float32))
        return loss, {"loss": loss, "gt_loss": gt_loss, "zy_loss": zy_loss,
                      "gt_acc": acc,
                      "gt_pred": gt_pred, "zy_pred": zy.argmax(-1)}

    def train_step(params, opt_state, batch, rng, freeze_on):
        rng, sub = jax.random.split(rng)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            _fast(params), batch, sub)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = mask(updates, freeze_on)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics, rng

    return train_step


def make_haplotype_eval_step(mcfg: HaplotypeModelConfig, tcfg: TrainConfig,
                             featurize_on_device: bool = True):
    smoothing = tcfg.optim.label_smoothing

    def eval_step(params, batch):
        if featurize_on_device:
            xp, xh = _featurize(batch)
        else:
            xp, xh = batch["xp"], batch["xh"]
        gt, zy = haplotype_forward(params, xp, xh, mcfg)
        loss = (label_smoothing_loss(gt, batch["gt"], smoothing)
                + label_smoothing_loss(zy, batch["zy"], smoothing))
        return loss, gt.argmax(-1), zy.argmax(-1)

    return eval_step


def _device_batch(batch, data_sh):
    """Read matrices ship as int8 (values fit [-2, 93]); the featurizer
    casts to f32 on device. 4x less host->device traffic."""
    return {
        k: jax.device_put(jnp.asarray(
            np.clip(np.asarray(v), -128, 127).astype(np.int8)
            if v.dtype.kind in "fiu" and k not in ("gt", "zy") else v),
            data_sh)
        for k, v in batch.items()
    }


def train_haplotype(
    data_iter: Iterator,
    mcfg: HaplotypeModelConfig,
    tcfg: TrainConfig,
    steps_per_epoch: Optional[int],
    out_dir: str,
    init_params=None,
    mesh=None,
    log_every: int = 50,
    max_steps: Optional[int] = None,
    resume_from: Optional[str] = None,
    eval_fn=None,
    val_iter_factory: Optional[Callable[[], Iterator]] = None,
    lr_steps_per_epoch: Optional[int] = None,
) -> TrainState:
    """Loop over batches (dicts with p_/h_ read-matrix arrays + gt/zy
    labels) or data.EPOCH_END sentinels. `steps_per_epoch` may be None when
    the iterator marks epochs; `lr_steps_per_epoch` then feeds the per-epoch
    lr-decay schedule (an estimate is fine — it only shifts decay onset)."""
    from .data import EPOCH_END

    os.makedirs(out_dir, exist_ok=True)
    mesh = mesh or make_mesh()
    data_sh = shard_batch(mesh)
    rep = replicated(mesh)

    rng = jax.random.key(tcfg.seed)
    params = init_params if init_params is not None else init_haplotype_params(
        jax.random.key(tcfg.seed), mcfg)
    tx = build_optimizer(tcfg.optim, steps_per_epoch or lr_steps_per_epoch or 1000)
    if is_lookahead_type(tcfg.optim.type):
        params = wrap_params_for_lookahead(params, True)
    opt_state = tx.init(params)
    if resume_from:
        restored = resume_state(resume_from)
        params, opt_state = restored.params, restored.opt_state
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)

    from .train_pileup import resolve_train_pallas

    raw_step = make_haplotype_train_step(
        mcfg, tcfg, tx, use_pallas=resolve_train_pallas())
    step_fn = jax.jit(raw_step, donate_argnums=(0, 1))
    multi_fn = jax.jit(make_multi_step(raw_step), donate_argnums=(0, 1))
    from jax.sharding import NamedSharding, PartitionSpec as P

    stack_sh = NamedSharding(mesh, P(None, "data"))
    eval_step = jax.jit(make_haplotype_eval_step(mcfg, tcfg))
    state = TrainState(params, opt_state)
    if resume_from:
        state.step = restored.step
        state.epoch = restored.epoch
    from ..utils.profiling import count_parameters

    print(f"[{__name__.split('.')[-1]}] model parameters: "
          f"{count_parameters(_fast(state.params)):,}")
    logger = MetricsLogger(out_dir)
    meter = EpochMeter(mcfg.gt_num_class, mcfg.zy_num_class)
    best_metric = [float("-inf")]

    def run_validation(st: TrainState) -> Optional[Dict[str, float]]:
        if val_iter_factory is None:
            return None
        vm = EpochMeter(mcfg.gt_num_class, mcfg.zy_num_class)
        for vb in val_iter_factory():
            if vb is EPOCH_END:
                continue
            n_valid = vb.pop("_n", None)   # tiled remainder: count each
            loss, gtp, zyp = eval_step(_fast(st.params),   # row once
                                       _device_batch(vb, data_sh))
            gtp, zyp = np.asarray(gtp), np.asarray(zyp)
            vm.update(loss, gtp[:n_valid], vb["gt"][:n_valid],
                      zyp[:n_valid], vb["zy"][:n_valid])
        return vm.scalars() if vm.batches else None

    def end_epoch(st: TrainState) -> None:
        st.epoch += 1
        train_scalars = meter.scalars()
        logger.log(st.epoch, "train", train_scalars, step=st.step)
        val_scalars = run_validation(st)
        if val_scalars is not None:
            logger.log(st.epoch, "val", val_scalars, step=st.step)
        print(f"[train_haplotype] epoch {st.epoch}: train {train_scalars}"
              + (f" val {val_scalars}" if val_scalars else ""))
        meter.__init__(mcfg.gt_num_class, mcfg.zy_num_class)
        save_checkpoint(os.path.join(out_dir, f"epoch_{st.epoch}.ckpt"), st)
        metric = None
        if eval_fn is not None:
            metric = float(eval_fn(st))
        elif val_scalars is not None:
            metric = val_scalars["gt_macro_f1"]
        if metric is not None and metric > best_metric[0]:
            best_metric[0] = metric
            save_checkpoint(os.path.join(out_dir, "best.ckpt"), st)

    freeze = [0.0]
    t0 = time.monotonic()
    group = tcfg.steps_per_call if steps_per_epoch is None else 1
    # haplotype batches come in depth buckets: only same-shape batches can
    # stack into one multi-step dispatch, so buffer per shape signature
    bufs: Dict[tuple, list] = {}
    _rng = [rng]

    def log_progress(metrics):
        if state.step % log_every < max(group, 1):
            dt = time.monotonic() - t0
            print(f"[train_haplotype] step {state.step} "
                  f"loss {float(np.ravel(metrics['loss'])[-1]):.4f} "
                  f"gt_acc {float(np.ravel(metrics['gt_acc'])[-1]):.4f} "
                  f"({state.step / dt:.1f} steps/s)")

    def flush(key):
        buf = bufs.pop(key, [])
        if not buf:
            return
        fz = jnp.float32(freeze[0])
        if len(buf) == 1:
            db = _device_batch(buf[0], data_sh)
            state.params, state.opt_state, metrics, rng_out = step_fn(
                state.params, state.opt_state, db, _rng[0], fz)
            state.step += 1
            meter.update(metrics["loss"], metrics["gt_pred"], buf[0]["gt"],
                         metrics["zy_pred"], buf[0]["zy"])
        else:
            db = _device_batch(_stack_batches(buf), stack_sh)
            state.params, state.opt_state, metrics, rng_out = multi_fn(
                state.params, state.opt_state, db, _rng[0], fz)
            state.step += len(buf)
            losses = np.asarray(metrics["loss"])
            gt_preds = np.asarray(metrics["gt_pred"])
            zy_preds = np.asarray(metrics["zy_pred"])
            for i, b in enumerate(buf):
                meter.update(losses[i], gt_preds[i], b["gt"],
                             zy_preds[i], b["zy"])
        _rng[0] = rng_out
        log_progress(metrics)

    def flush_all():
        for key in list(bufs):
            flush(key)

    for batch in data_iter:
        if batch is EPOCH_END:
            flush_all()
            end_epoch(state)
            if tcfg.first_stage is not None and state.epoch >= tcfg.first_stage:
                freeze[0] = 1.0
            continue
        # strip the tiled-remainder metadata ("_n"): training on repeated
        # tail rows is intentional (static batch shapes) and the train
        # meter's slight tail overweight is immaterial — the exact
        # accounting matters for VALIDATION, handled in run_validation
        batch = dict(batch)
        batch.pop("_n", None)
        key = tuple(sorted((k, v.shape) for k, v in batch.items()))
        bufs.setdefault(key, []).append(batch)
        if len(bufs[key]) >= max(group, 1):
            flush(key)
        if steps_per_epoch and state.step and state.step % steps_per_epoch == 0:
            end_epoch(state)
            if tcfg.first_stage is not None and state.epoch >= tcfg.first_stage:
                freeze[0] = 1.0
        if max_steps and state.step >= max_steps:
            break
    flush_all()
    save_checkpoint(os.path.join(out_dir, "last.ckpt"), state,
                    include_optimizer=True)
    return state
