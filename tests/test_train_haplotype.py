"""Haplotype-model training smoke test: loss decreases on synthetic
separable data; checkpoint round-trips into the inference path."""
import io
from contextlib import redirect_stdout

import numpy as np
import jax
import jax.numpy as jnp

from nanosnp_tpu.config import HaplotypeModelConfig, TrainConfig
from nanosnp_tpu.train.train_haplotype import train_haplotype
from nanosnp_tpu.train.train_pileup import load_checkpoint
from nanosnp_tpu.models.haplotype_model import haplotype_predict


def _batches(rng, n_batches, bs, d, mcfg):
    """Synthetic separable task: gt class encoded in the read-base
    composition of the center column."""
    for _ in range(n_batches):
        gt = rng.integers(0, mcfg.gt_num_class, bs).astype(np.int32)
        zy = (gt % 3).astype(np.int32)

        def mats(L):
            seq = rng.choice([0, 1, 2, 3, 4, -1], size=(bs, d, L)).astype(np.float32)
            # plant the signal: center column biased by gt
            seq[:, :, L // 2] = (gt[:, None] % 4) + 1
            hap = rng.choice([0, 1, 2, 3], size=(bs, d, L)).astype(np.float32)
            bq = rng.integers(0, 60, (bs, d, L)).astype(np.float32)
            mq = rng.integers(0, 60, (bs, d, L)).astype(np.float32)
            ref = rng.integers(0, 5, (bs, L)).astype(np.float32)
            return seq, bq, mq, hap, ref

        p_seq, p_bq, p_mq, p_hap, p_ref = mats(33)
        h_seq, h_bq, h_mq, h_hap, h_ref = mats(11)
        yield {
            "p_seq": p_seq, "p_baseq": p_bq, "p_mapq": p_mq, "p_hap": p_hap,
            "p_ref": p_ref,
            "h_seq": h_seq, "h_baseq": h_bq, "h_mapq": h_mq, "h_hap": h_hap,
            "h_ref": h_ref,
            "gt": gt, "zy": zy,
        }


def test_train_haplotype_smoke(tmp_path):
    rng = np.random.default_rng(17)
    mcfg = HaplotypeModelConfig(hidden_size=16, lstm_layers=1, dropout=0.0)
    tcfg = TrainConfig(batch_size=16, seed=3)
    tcfg.optim.type = "adam"
    tcfg.optim.lr = 3e-3
    tcfg.optim.max_grad_norm = 2.0

    buf = io.StringIO()
    with redirect_stdout(buf):
        state = train_haplotype(
            _batches(rng, 50, 16, 10, mcfg), mcfg, tcfg,
            steps_per_epoch=10**9, out_dir=str(tmp_path), log_every=5,
            max_steps=50)
    logs = [l for l in buf.getvalue().splitlines() if "loss " in l]
    first = float(logs[0].split("loss ")[1].split()[0])
    last = float(logs[-1].split("loss ")[1].split()[0])
    assert last < first, (first, last)

    # checkpoint loads into the inference path
    params, blob = load_checkpoint(str(tmp_path / "last.ckpt"))
    assert blob["step"] == 50
    gt, zy = haplotype_predict(
        params,
        jnp.asarray(rng.standard_normal((3, 33, 105)), jnp.float32),
        jnp.asarray(rng.standard_normal((3, 11, 105)), jnp.float32),
        mcfg)
    assert gt.shape == (3, mcfg.gt_num_class)
