"""Pileup-model training (reference PileupModel/train.py re-architected).

Loss = label-smoothed CE on gt + zy heads only (model.py:110); optimizer
Lookahead-Adam lr 1e-4 with per-epoch 0.98 decay after epoch 10, grad-clip 20
(config/ont_pileup.yaml). Training is data-parallel over the mesh's "data"
axis: batches shard over devices, gradients all-reduce via XLA-inserted
psum (no NCCL/DataParallel translation).

Observability per epoch (reference train.py:33-38,79-81,214-218): gt/zy
confusion matrices, accuracy and macro-F1 for train and validation splits,
appended to scalars.jsonl; best-checkpoint retention on the validation
metric (train_dev.py:258-281). Freeze-stages via TrainConfig.first_stage
(train.py:223-230).
"""
from __future__ import annotations

import os
import pickle
import time
from dataclasses import dataclass
from typing import Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import PileupModelConfig, TrainConfig
from ..models.pileup_model import init_pileup_params, pileup_forward
from ..parallel.mesh import make_mesh, replicated, shard_batch
from .losses import label_smoothing_loss
from .metrics import ConfusionAccumulator, MetricsLogger
from .optim import (build_optimizer, is_lookahead_type,
                    wrap_params_for_lookahead)


@dataclass
class TrainState:
    params: Dict
    opt_state: optax.OptState
    step: int = 0
    epoch: int = 0


def freeze_mask_fn(freeze_prefixes: Tuple[str, ...]):
    """Returns a jittable fn (updates, freeze_on_scalar) -> masked updates:
    leaves under a key containing a freeze pattern are scaled by
    (1 - freeze_on). Substring match so "encoder" freezes both
    pileup_encoder and haplotype_encoder; path-aware so it works through
    the Lookahead fast/slow wrapper."""
    def is_frozen(path) -> bool:
        for entry in path:
            key = getattr(entry, "key", None)
            if isinstance(key, str) and any(p in key for p in freeze_prefixes):
                return True
        return False

    def mask(updates, freeze_on):
        return jax.tree_util.tree_map_with_path(
            lambda path, u: u * (1.0 - freeze_on) if is_frozen(path) else u,
            updates)

    return mask


def resolve_train_pallas(value="auto") -> bool:
    """Training uses the fused Pallas recurrence (fwd + custom-VJP bwd) on
    real TPU; the scan path elsewhere."""
    if value == "auto":
        from ..ops.pallas_lstm import pallas_supported

        return pallas_supported()
    return bool(value)


def make_pileup_train_step(mcfg: PileupModelConfig, tcfg: TrainConfig,
                           tx: optax.GradientTransformation,
                           use_pallas: bool = False):
    smoothing = tcfg.optim.label_smoothing
    mask = freeze_mask_fn(tuple(tcfg.freeze_prefixes))

    def loss_fn(params, x, gt_target, zy_target, dropout_rng):
        gt, zy, _, _ = pileup_forward(params, x, mcfg,
                                      dropout_rng=dropout_rng, all_heads=False,
                                      use_pallas=use_pallas)
        gt_loss = label_smoothing_loss(gt, gt_target, smoothing)
        zy_loss = label_smoothing_loss(zy, zy_target, smoothing)
        loss = gt_loss + zy_loss
        gt_pred = gt.argmax(-1)
        acc = jnp.mean((gt_pred == gt_target).astype(jnp.float32))
        return loss, {"loss": loss, "gt_loss": gt_loss, "zy_loss": zy_loss,
                      "gt_acc": acc,
                      "gt_pred": gt_pred, "zy_pred": zy.argmax(-1)}

    def train_step(state_params, opt_state, x, gt_target, zy_target, rng,
                   freeze_on):
        rng, sub = jax.random.split(rng)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(
            _fast(state_params), x, gt_target, zy_target, sub)
        updates, opt_state = tx.update(grads, opt_state, state_params)
        updates = mask(updates, freeze_on)
        state_params = optax.apply_updates(state_params, updates)
        return state_params, opt_state, metrics, rng

    return train_step


def make_multi_step(step_fn):
    """Scan `step_fn` over a leading stack of G batches in ONE dispatch.

    step_fn: (params, opt_state, batch_pytree, rng, freeze_on) ->
             (params, opt_state, metrics, rng).
    Returns multi(params, opt_state, stacked_batch, rng, freeze_on) with
    metrics stacked [G, ...]. Amortizes per-call dispatch overhead (the
    dominant cost on relayed/remote TPUs) without changing training
    semantics — G sequential optimizer updates, same as G separate calls."""
    def multi(params, opt_state, stacked_batch, rng, freeze_on):
        def body(carry, batch):
            p, o, r = carry
            p, o, m, r = step_fn(p, o, batch, r, freeze_on)
            return (p, o, r), m

        (p, o, r), ms = jax.lax.scan(body, (params, opt_state, rng),
                                     stacked_batch)
        return p, o, ms, r

    return multi


def _stack_batches(batches):
    return jax.tree.map(lambda *xs: np.stack(xs), *batches)


def make_pileup_eval_step(mcfg: PileupModelConfig, tcfg: TrainConfig):
    smoothing = tcfg.optim.label_smoothing

    def eval_step(params, x, gt_target, zy_target):
        gt, zy, _, _ = pileup_forward(params, x, mcfg, all_heads=False)
        loss = (label_smoothing_loss(gt, gt_target, smoothing)
                + label_smoothing_loss(zy, zy_target, smoothing))
        return loss, gt.argmax(-1), zy.argmax(-1)

    return eval_step


def _fast(params):
    """Lookahead wraps params in (fast, slow); training uses the fast set."""
    if isinstance(params, optax.LookaheadParams):
        return params.fast
    return params


class EpochMeter:
    """Accumulates loss + gt/zy confusion over one epoch's batches."""

    def __init__(self, n_gt: int, n_zy: int):
        self.gt = ConfusionAccumulator(n_gt)
        self.zy = ConfusionAccumulator(n_zy)
        self.loss_sum = 0.0
        self.batches = 0

    def update(self, loss: float, gt_pred, gt_true, zy_pred, zy_true) -> None:
        self.loss_sum += float(loss)
        self.batches += 1
        self.gt.update(np.asarray(gt_pred), np.asarray(gt_true))
        self.zy.update(np.asarray(zy_pred), np.asarray(zy_true))

    def scalars(self) -> Dict[str, float]:
        out = {"loss": round(self.loss_sum / max(self.batches, 1), 6)}
        out.update(self.gt.summary("gt_"))
        out.update(self.zy.summary("zy_"))
        return out


def train_pileup(
    data_iter: Iterator,
    mcfg: PileupModelConfig,
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
    """Generic loop over an iterator yielding (x [B,33,18], gt [B], zy [B]),
    or the data.EPOCH_END sentinel marking epoch boundaries (preferred over
    steps_per_epoch when the batch count is data-dependent; the lr-decay
    schedule then uses `lr_steps_per_epoch`, an estimate is fine).

    Best-checkpoint retention: at each epoch end, `eval_fn(state)` (or, by
    default, the validation gt macro-F1 from `val_iter_factory`) decides
    whether to overwrite best.ckpt."""
    from .data import EPOCH_END

    os.makedirs(out_dir, exist_ok=True)
    mesh = mesh or make_mesh()
    data_sh = shard_batch(mesh)
    # stacked [G, B, ...] multi-step batches: scan axis replicated, batch
    # axis sharded over the mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    stack_sh = NamedSharding(mesh, P(None, "data"))
    rep = replicated(mesh)

    rng = jax.random.key(tcfg.seed)
    params = init_params if init_params is not None else init_pileup_params(
        jax.random.key(tcfg.seed), mcfg)
    tx = build_optimizer(tcfg.optim,
                         steps_per_epoch or lr_steps_per_epoch or 1000)
    is_lookahead = is_lookahead_type(tcfg.optim.type)
    if is_lookahead:
        params = wrap_params_for_lookahead(params, True)
    opt_state = tx.init(params)
    if resume_from:
        restored = resume_state(resume_from)
        params, opt_state = restored.params, restored.opt_state
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)

    raw_step = make_pileup_train_step(mcfg, tcfg, tx,
                                      use_pallas=resolve_train_pallas())

    def tuple_step(p, o, batch, r, f):
        return raw_step(p, o, batch[0], batch[1], batch[2], r, f)

    step_fn = jax.jit(tuple_step, donate_argnums=(0, 1))
    multi_fn = jax.jit(make_multi_step(tuple_step), donate_argnums=(0, 1))
    eval_step = jax.jit(make_pileup_eval_step(mcfg, tcfg))

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
        for vx, vgt, vzy in val_iter_factory():
            loss, gtp, zyp = eval_step(_fast(st.params),
                                       jnp.asarray(vx, jnp.float32),
                                       jnp.asarray(vgt), jnp.asarray(vzy))
            vm.update(loss, gtp, vgt, zyp, vzy)
        return vm.scalars() if vm.batches else None

    def end_epoch(st: TrainState) -> None:
        st.epoch += 1
        train_scalars = meter.scalars()
        logger.log(st.epoch, "train", train_scalars, step=st.step)
        val_scalars = run_validation(st)
        if val_scalars is not None:
            logger.log(st.epoch, "val", val_scalars, step=st.step)
        print(f"[train_pileup] epoch {st.epoch}: train {train_scalars}"
              + (f" val {val_scalars}" if val_scalars else ""))
        meter.__init__(mcfg.gt_num_class, mcfg.zy_num_class)
        save_checkpoint(os.path.join(out_dir, f"epoch_{st.epoch}.ckpt"), st)
        # best-metric checkpoint retention (reference train_dev.py:258-281)
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
    # multi-step batching is incompatible with mid-stack epoch boundaries,
    # so it engages only in sentinel (steps_per_epoch=None) mode
    group = tcfg.steps_per_call if steps_per_epoch is None else 1
    buf: list = []

    def log_progress(metrics):
        if state.step % log_every < max(group, 1):
            dt = time.monotonic() - t0
            print(f"[train_pileup] step {state.step} "
                  f"loss {float(np.ravel(metrics['loss'])[-1]):.4f} "
                  f"gt_acc {float(np.ravel(metrics['gt_acc'])[-1]):.4f} "
                  f"({state.step / dt:.1f} steps/s)")

    def flush():
        if not buf:
            return
        fz = jnp.float32(freeze[0])
        if len(buf) == 1:
            x, gt_t, zy_t = buf[0]
            db = (jax.device_put(jnp.asarray(x, jnp.float32), data_sh),
                  jax.device_put(jnp.asarray(gt_t), data_sh),
                  jax.device_put(jnp.asarray(zy_t), data_sh))
            state.params, state.opt_state, metrics, rng_out = step_fn(
                state.params, state.opt_state, db, _rng[0], fz)
            state.step += 1
            meter.update(metrics["loss"], metrics["gt_pred"], gt_t,
                         metrics["zy_pred"], zy_t)
        else:
            stacked = _stack_batches(buf)
            db = (jax.device_put(jnp.asarray(stacked[0], jnp.float32), stack_sh),
                  jax.device_put(jnp.asarray(stacked[1]), stack_sh),
                  jax.device_put(jnp.asarray(stacked[2]), stack_sh))
            state.params, state.opt_state, metrics, rng_out = multi_fn(
                state.params, state.opt_state, db, _rng[0], fz)
            state.step += len(buf)
            losses = np.asarray(metrics["loss"])
            gt_preds = np.asarray(metrics["gt_pred"])
            zy_preds = np.asarray(metrics["zy_pred"])
            for i, (_, gt_t, zy_t) in enumerate(buf):
                meter.update(losses[i], gt_preds[i], gt_t, zy_preds[i], zy_t)
        _rng[0] = rng_out
        log_progress(metrics)
        buf.clear()

    _rng = [rng]
    for item in data_iter:
        if item is EPOCH_END:
            flush()
            end_epoch(state)
            if tcfg.first_stage is not None and state.epoch >= tcfg.first_stage:
                freeze[0] = 1.0
            continue
        buf.append(item)
        if len(buf) >= max(group, 1):
            flush()
        if steps_per_epoch and state.step % steps_per_epoch == 0 and state.step:
            end_epoch(state)
            if tcfg.first_stage is not None and state.epoch >= tcfg.first_stage:
                freeze[0] = 1.0
        if max_steps and state.step >= max_steps:
            break
    flush()
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
    if path.endswith(".npz"):
        return load_params_npz(path), {}
    with open(path, "rb") as f:
        blob = pickle.load(f)
    return jax.tree.map(jnp.asarray, blob["params"]), blob


def save_params_npz(path: str, params, dtype=np.float16) -> None:
    """Portable, compact parameter archive (fp16 halves the footprint —
    inference casts to bf16/f32 anyway). Tree paths are encoded in the npz
    keys, so arbitrary dict/list nesting round-trips."""
    flat = jax.tree_util.tree_flatten_with_path(_fast(params))[0]
    arrays = {}
    for kp, leaf in flat:
        toks = []
        for e in kp:
            if hasattr(e, "key"):
                toks.append(f"k:{e.key}")
            elif hasattr(e, "idx"):
                toks.append(f"i:{e.idx}")
            else:
                raise ValueError(f"unsupported tree path entry {e!r}")
        arrays["/".join(toks)] = np.asarray(leaf).astype(dtype)
    np.savez_compressed(path, **arrays)


def load_params_npz(path: str):
    z = np.load(path)
    root: Dict = {}
    for name in z.files:
        toks = name.split("/")
        node = root
        for j, t in enumerate(toks):
            last = j == len(toks) - 1
            key = t[2:] if t.startswith("k:") else int(t[2:])
            if last:
                node[key] = jnp.asarray(z[name], jnp.float32)
            else:
                node = node.setdefault(key, {})

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(isinstance(k, int) for k in node):
            return [listify(node[i]) for i in sorted(node)]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


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
