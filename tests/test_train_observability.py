"""Training parity package: class balancing, val split, confusion/F1
history, freeze-stages, best-checkpoint retention.

Reference semantics: PileupModel/dataset.py:32-66 (balance_dataset),
:100-106 (for_evaluate), train.py:176-181 (90/10 file split), :33-38 +
214-218 (metrics + scalar history), :223-230 (first_stage freeze),
HaplotypeModel/train_dev.py:258-281 (best-F1 checkpoint).
"""
import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nanosnp_tpu.config import PileupModelConfig, TrainConfig
from nanosnp_tpu.train import data as D
from nanosnp_tpu.train.metrics import ConfusionAccumulator, MetricsLogger
from nanosnp_tpu.train.train_pileup import (
    _fast, load_checkpoint, train_pileup)


def test_balance_indices_uniformizes_classes(rng):
    gt = np.concatenate([np.zeros(900, np.int64), np.ones(80, np.int64),
                         np.full(20, 4, np.int64)])
    zy = np.concatenate([np.zeros(900, np.int64), np.full(80, 2, np.int64),
                         np.ones(20, np.int64)])
    idx = D.balance_indices(gt, zy, rng)
    # reference semantics: pooled (3 cells x 900) / n_upsampled(2) = 1350
    assert len(idx) == 1350
    counts = {}
    for i in idx:
        counts[(gt[i], zy[i])] = counts.get((gt[i], zy[i]), 0) + 1
    assert set(counts) == {(0, 0), (1, 2), (4, 1)}
    values = np.array(list(counts.values()), dtype=float)
    assert values.min() > 0.4 * values.max()


def test_for_evaluate_filters_variants_only():
    zy = np.array([0, 1, 2, 0, 2])
    assert D.for_evaluate_indices(zy).tolist() == [1, 2, 4]


def test_split_train_val_always_leaves_val(rng):
    train, val = D.split_train_val(list(range(10)), 0.1, rng)
    assert len(val) == 1 and len(train) == 9
    assert sorted(train + val) == list(range(10))
    train, val = D.split_train_val([1], 0.1, rng)
    assert train == [1] and val == []


def test_confusion_accumulator_f1():
    c = ConfusionAccumulator(3)
    c.update([0, 0, 1, 2], [0, 1, 1, 2])
    # class0: tp=1 fp=1 fn=0 -> f1=2/3; class1: tp=1 fp=0 fn=1 -> 2/3;
    # class2: tp=1 -> 1.0
    np.testing.assert_allclose(c.per_class_f1(), [2 / 3, 2 / 3, 1.0])
    assert abs(c.macro_f1() - (2 / 3 + 2 / 3 + 1) / 3) < 1e-9
    assert abs(c.accuracy() - 0.75) < 1e-9
    assert "0" in c.format_matrix()


def _toy_arrays(rng, n=256):
    matrix = rng.integers(-20, 20, size=(n, 33, 18)).astype(np.int32)
    label = np.zeros((n, 90), dtype=np.int32)
    gt = rng.integers(0, 3, n)
    zy = rng.integers(0, 3, n)
    label[np.arange(n), gt] = 1
    label[np.arange(n), 21 + zy] = 1
    label[:, 24] = 1
    label[:, 57] = 1
    return D.PileupTrainArrays(matrix, label,
                               np.arange(1, n + 1, dtype=np.int64),
                               gt > 0)


def test_train_pileup_epoch_observability(tmp_path, rng):
    arrays = _toy_arrays(rng)
    tcfg = TrainConfig(batch_size=64, epochs=2, seed=3)
    tcfg.optim.lr = 1e-3
    mcfg = PileupModelConfig()
    val = _toy_arrays(rng, 64)
    out = str(tmp_path / "train")
    state = train_pileup(
        D.batch_iterator(arrays, 64, np.random.default_rng(0), epochs=2,
                         mark_epochs=True),
        mcfg, tcfg, steps_per_epoch=None, out_dir=out,
        val_iter_factory=lambda: D.batch_iterator(
            val, 64, np.random.default_rng(0), epochs=1, drop_last=False),
        lr_steps_per_epoch=4)
    assert state.epoch == 2
    # scalar history: 2 epochs x (train + val)
    recs = MetricsLogger(out).read()
    assert [(r["epoch"], r["split"]) for r in recs] == [
        (1, "train"), (1, "val"), (2, "train"), (2, "val")]
    for r in recs:
        assert {"loss", "gt_acc", "gt_macro_f1", "zy_acc",
                "zy_macro_f1"} <= set(r)
    # best checkpoint retained from validation metric
    assert os.path.exists(os.path.join(out, "best.ckpt"))
    assert os.path.exists(os.path.join(out, "epoch_2.ckpt"))


def test_freeze_stages_stops_encoder_updates(tmp_path, rng):
    arrays = _toy_arrays(rng, 128)
    tcfg = TrainConfig(batch_size=64, epochs=3, seed=3, first_stage=1,
                       val_fraction=0.0)
    tcfg.optim.lr = 1e-2
    mcfg = PileupModelConfig()
    out = str(tmp_path / "freeze")
    state = train_pileup(
        D.batch_iterator(arrays, 64, np.random.default_rng(0), epochs=3,
                         mark_epochs=True),
        mcfg, tcfg, steps_per_epoch=None, out_dir=out, lr_steps_per_epoch=2)
    # encoder params frozen after epoch 1: epoch_1 vs epoch_3 encoders equal
    p1, _ = load_checkpoint(os.path.join(out, "epoch_1.ckpt"))
    p3, _ = load_checkpoint(os.path.join(out, "epoch_3.ckpt"))
    enc_diff = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree.leaves(p1["encoder"]), jax.tree.leaves(p3["encoder"])))
    head_diff = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree.leaves(p1["gt"]), jax.tree.leaves(p3["gt"])))
    assert enc_diff == 0.0
    assert head_diff > 0.0


def test_balanced_iterator_epoch_marks(rng):
    arrays = _toy_arrays(rng, 200)
    it = D.batch_iterator(arrays, 32, np.random.default_rng(1), epochs=2,
                          use_balance=True, mark_epochs=True)
    epochs_seen = 0
    batches = 0
    for item in it:
        if item is D.EPOCH_END:
            epochs_seen += 1
        else:
            batches += 1
            assert item[0].shape == (32, 33, 18)
    assert epochs_seen == 2 and batches > 0
