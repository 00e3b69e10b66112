"""Benchmark: pileup-caller inference throughput (candidate-sites/s/chip).

North-star metric per BASELINE.md. Runs the flagship pileup BiLSTM
(reference production weights when available) on one chip with the
production batch size, and compares against the reference's torch
implementation executed in-process on CPU (the reference repo publishes no
numbers and no GPU is present, so the measured torch-CPU throughput of the
same model is the recorded baseline denominator).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BATCH = 8192
STEPS = 30
REF_CKPT = "/root/reference/PileupModel/models/ont_pileup.chkpt"


def bench_tpu() -> float:
    import jax
    import jax.numpy as jnp

    from nanosnp_tpu.config import PileupModelConfig
    from nanosnp_tpu.models.pileup_model import init_pileup_params, pileup_predict

    cfg = PileupModelConfig()
    if os.path.exists(REF_CKPT):
        from nanosnp_tpu.models.convert import load_pileup_checkpoint

        params = jax.tree.map(jnp.asarray, load_pileup_checkpoint(REF_CKPT))
    else:
        params = init_pileup_params(jax.random.key(0), cfg)

    @jax.jit
    def fn(p, x):
        return pileup_predict(p, x, cfg, compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-40, 40, size=(BATCH, 33, 18)), jnp.float32)

    # Chain a numerically significant data dependency between steps (x
    # perturbed by the previous step's mean prob): every execution has
    # distinct inputs (defeats any result caching in the execution path) and
    # is strictly ordered, so blocking on the last step times all of them.
    @jax.jit
    def step(p, x, s):
        gt, zy = fn(p, x + s)
        return gt, zy, gt.mean()

    s = jnp.float32(0.0)
    for _ in range(3):  # warmup + compile
        gt, zy, s = step(params, x, s)
    float(s)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        gt, zy, s = step(params, x, s)
    jax.block_until_ready(s)
    dt = time.perf_counter() - t0
    return BATCH * STEPS / dt


def bench_torch_cpu() -> float:
    import torch

    torch.set_num_threads(os.cpu_count() or 8)
    lstm = torch.nn.LSTM(input_size=18, hidden_size=64, num_layers=2,
                         batch_first=True, bidirectional=True)
    proj = torch.nn.Linear(128, 128)
    dense = torch.nn.Linear(128, 256)
    gt_head = torch.nn.Linear(256, 21)
    zy_head = torch.nn.Linear(256, 3)
    if os.path.exists(REF_CKPT):
        ck = torch.load(REF_CKPT, map_location="cpu", weights_only=False)
        enc = ck["encoder"]
        lstm.load_state_dict({k[5:]: v for k, v in enc.items()
                              if k.startswith("lstm.")})
        proj.load_state_dict({k[12:]: v for k, v in enc.items()
                              if k.startswith("output_proj.")})
        fwd = ck["forward_layer"]
        dense.load_state_dict({k[6:]: v for k, v in fwd.items()
                               if k.startswith("dense.")})
        gt_head.load_state_dict({k[15:]: v for k, v in fwd.items()
                                 if k.startswith("genotype_layer.")})
        zy_head.load_state_dict({k[15:]: v for k, v in fwd.items()
                                 if k.startswith("zygosity_layer.")})

    batch = 1000  # the reference's predict batch size
    rng = np.random.default_rng(0)
    x = torch.from_numpy(
        rng.integers(-40, 40, size=(batch, 33, 18)).astype(np.float32))
    with torch.no_grad():
        for _ in range(2):  # warmup
            out, _ = lstm(x)
        n = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < 3.0:
            out, _ = lstm(x)
            out = torch.tanh(dense(proj(out)))[:, 16, :]
            torch.softmax(gt_head(out), 1)
            torch.softmax(zy_head(out), 1)
            n += batch
        dt = time.perf_counter() - t0
    return n / dt


def main():
    tpu = bench_tpu()
    try:
        base = bench_torch_cpu()
    except Exception:
        base = 0.0
    result = {
        "metric": "pileup-candidate-sites/s/chip",
        "value": round(tpu, 1),
        "unit": "sites/s",
        "vs_baseline": round(tpu / base, 2) if base else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
