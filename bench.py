"""Benchmark: pileup-caller inference throughput (candidate-sites/s/chip).

North-star metric per BASELINE.md. Runs the flagship pileup BiLSTM
(reference production weights when available) on one chip and compares
against the reference's torch implementation executed in-process on CPU
(the reference repo publishes no numbers and no GPU is present, so the
measured torch-CPU throughput of the same model is the recorded baseline
denominator).

Timing methodology (this environment tunnels the TPU through a relay whose
buffer-future completion is unreliable): K model invocations are chained
*inside* one jitted fori_loop (each consuming the previous step's output,
so they execute serially and cannot be cached), and the returned scalar is
fetched to host — wall time of the K-iteration call minus the 1-iteration
call removes the relay round-trip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BATCH = 16384
ITERS = 20
REF_CKPT = "/root/reference/PileupModel/models/ont_pileup.chkpt"


def _params_and_cfg():
    import jax
    import jax.numpy as jnp

    from nanosnp_tpu.config import PileupModelConfig
    from nanosnp_tpu.models.pileup_model import init_pileup_params

    cfg = PileupModelConfig()
    if os.path.exists(REF_CKPT):
        from nanosnp_tpu.models.convert import load_pileup_checkpoint

        params = jax.tree.map(jnp.asarray, load_pileup_checkpoint(REF_CKPT))
    else:
        params = init_pileup_params(jax.random.key(0), cfg)
    return params, cfg


def _make_many(params, cfg, use_pallas: bool):
    import jax
    import jax.numpy as jnp

    from nanosnp_tpu.models.pileup_model import pileup_predict

    @jax.jit
    def many(p, x, iters):
        # traced trip count -> ONE compile serves both the 1-iteration
        # (relay-RTT baseline) and the K-iteration timing run
        def body(_, carry):
            x, acc = carry
            gt, zy = pileup_predict(p, x + acc * 1e-3, cfg,
                                    compute_dtype=jnp.bfloat16,
                                    use_pallas=use_pallas)
            return (x, gt.mean())

        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))
        return acc

    x = jnp.asarray(
        np.random.default_rng(0).integers(-40, 40, (BATCH, 33, 18)),
        jnp.float32)
    return many, x


def _variant_rate(params, cfg, use_pallas: bool) -> float:
    import jax.numpy as jnp

    many, x = _make_many(params, cfg, use_pallas)

    def run(iters):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(many(params, x, jnp.int32(iters)))
            best = min(best, time.perf_counter() - t0)
        return best

    float(many(params, x, jnp.int32(1)))  # warmup + single compile
    t1 = run(1)
    tk = run(ITERS + 1)
    per_step = max((tk - t1) / ITERS, 1e-9)
    return BATCH / per_step


def bench_tpu() -> float:
    import jax

    params, cfg = _params_and_cfg()
    on_tpu = jax.devices()[0].platform == "tpu"
    # the Pallas recurrence is the production inference path on TPU; fall
    # back to the scan path off-TPU or if the kernel fails to build
    for use_pallas in ([True, False] if on_tpu else [False]):
        try:
            return _variant_rate(params, cfg, use_pallas)
        except Exception as e:
            sys.stderr.write(f"bench variant pallas={use_pallas} failed: {e}\n")
    return 0.0


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
        for _ in range(2):
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
