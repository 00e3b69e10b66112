"""Microbenchmark probe for the fused BiLSTM encoder kernel bottleneck.

ROADMAP #8 leaves the pileup model at ~32% MFU after the fused
in-projection kernels removed the HBM xp stream. This probe isolates
*where* the remaining per-timestep cost sits by timing kernel variants
that knock out one resource at a time:

  full        — the production _enc_stream/_enc_center path
  nogate      — gate transcendentals replaced by a linear combine
                (wrong math, same memory/matmul shape): isolates VPU
                transcendental cost
  nomm        — hidden-state matmul removed (gates = in-projection only):
                isolates MXU/serialization cost
  nodma       — input DMA hoisted out of the time loop (reuses slab 0):
                isolates the in-stream DMA cost

Run on a quiet TPU: python scripts/kernel_probe.py [N] [iters]
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from nanosnp_tpu.models.bilstm import init_bilstm_params  # noqa: E402
from nanosnp_tpu.ops import pallas_lstm as pk  # noqa: E402


def _variant_kernel(x_hbm, wih_ref, w_ref, b_ref, out_hbm, h_ref, c_ref,
                    xbuf, obuf, in_sems, out_sems, *, seq_len, hidden,
                    block_n, mode):
    i = pl.program_id(0)

    def _time(t, d):
        return seq_len - 1 - t if d == 1 else t

    def in_copy(t, slot):
        return [
            pltpu.make_async_copy(
                x_hbm.at[_time(t, d), :, pl.ds(i * block_n, block_n)],
                xbuf.at[slot, d], in_sems.at[slot, d])
            for d in (0, 1)
        ]

    def out_copy(t, slot):
        return [
            pltpu.make_async_copy(
                obuf.at[slot, d],
                out_hbm.at[_time(t, d), d, :, pl.ds(i * block_n, block_n)],
                out_sems.at[slot, d])
            for d in (0, 1)
        ]

    h_ref[...] = jnp.zeros_like(h_ref)
    c_ref[...] = jnp.zeros_like(c_ref)
    for cp in in_copy(0, 0):
        cp.start()
    if mode == "nodma":
        for cp in in_copy(0, 0):
            cp.wait()

    for t in range(seq_len):
        slot = 0 if mode == "nodma" else t % 2
        if mode != "nodma":
            if t + 1 < seq_len:
                for cp in in_copy(t + 1, (t + 1) % 2):
                    cp.start()
            for cp in in_copy(t, slot):
                cp.wait()
        gates = jax.lax.dot_general(
            wih_ref[...], xbuf[slot],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if mode != "nomm":
            gates = gates + jax.lax.dot_general(
                w_ref[...], h_ref[...].astype(w_ref.dtype),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        gates = gates + b_ref[...]
        if mode == "nogate":
            # linear stand-in: same slab shapes, no transcendentals
            c = 0.5 * c_ref[...] + 0.25 * (
                gates[:, :hidden, :] + gates[:, hidden: 2 * hidden, :])
            h = 0.5 * c + 0.125 * (
                gates[:, 2 * hidden: 3 * hidden, :] + gates[:, 3 * hidden:, :])
        else:
            ig = jax.nn.sigmoid(gates[:, :hidden, :])
            fg = jax.nn.sigmoid(gates[:, hidden: 2 * hidden, :])
            gg = jnp.tanh(gates[:, 2 * hidden: 3 * hidden, :])
            og = jax.nn.sigmoid(gates[:, 3 * hidden:, :])
            c = fg * c_ref[...] + ig * gg
            h = og * jnp.tanh(c)
        c_ref[...] = c
        h_ref[...] = h

        if t >= 2:
            for cp in out_copy(t - 2, t % 2):
                cp.wait()
        obuf[t % 2] = h.astype(obuf.dtype)
        for cp in out_copy(t, t % 2):
            cp.start()

    if seq_len >= 2:
        for cp in out_copy(seq_len - 2, (seq_len - 2) % 2):
            cp.wait()
    for cp in out_copy(seq_len - 1, (seq_len - 1) % 2):
        cp.wait()


def _run_variant(x_t, wih_t, w_t, b, *, seq_len, hidden, gate_dim, block_n,
                 mode):
    n_pad = x_t.shape[-1]
    d_pad = x_t.shape[1]
    return pl.pallas_call(
        functools.partial(_variant_kernel, seq_len=seq_len, hidden=hidden,
                          block_n=block_n, mode=mode),
        out_shape=jax.ShapeDtypeStruct((seq_len, 2, hidden, n_pad),
                                       jnp.bfloat16),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((2, gate_dim, d_pad), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, gate_dim, hidden), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, gate_dim, 1), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, hidden, block_n), jnp.float32),
            pltpu.VMEM((2, hidden, block_n), jnp.float32),
            pltpu.VMEM((2, 2, d_pad, block_n), x_t.dtype),
            pltpu.VMEM((2, 2, hidden, block_n), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )(x_t, wih_t, w_t, b)


def bench(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    seq_len, d_in, hidden = 33, 18, 64
    gate_dim = 4 * hidden
    block_n = 512
    d_pad = 32

    key = jax.random.PRNGKey(0)
    layer = init_bilstm_params(key, d_in, hidden, 1)[0]
    x = jax.random.normal(jax.random.PRNGKey(1), (n, seq_len, d_in),
                          jnp.float32)
    x_t = jnp.pad(jnp.transpose(x, (1, 2, 0)).astype(jnp.bfloat16),
                  ((0, 0), (0, d_pad - d_in), (0, 0)))
    wih_t = jnp.pad(
        jnp.transpose(layer["w_ih"], (0, 2, 1)).astype(jnp.bfloat16),
        ((0, 0), (0, 0), (0, d_pad - d_in)))
    w_t = jnp.transpose(layer["w_hh"], (0, 2, 1)).astype(jnp.bfloat16)
    b = layer["b"].astype(jnp.float32)[:, :, None]

    print(f"N={n} L={seq_len} H={hidden} block_n={block_n} "
          f"platform={jax.devices()[0].platform}")

    results = {}
    for mode in ("full", "nogate", "nomm", "nodma"):
        fn = jax.jit(functools.partial(
            _run_variant, seq_len=seq_len, hidden=hidden, gate_dim=gate_dim,
            block_n=block_n, mode=mode))
        dt = bench(fn, x_t, wih_t, w_t, b, iters=iters)
        results[mode] = dt
        print(f"{mode:8s} {dt * 1e6:9.1f} us/layer "
              f"({n / dt / 1e6:7.2f} M rows/s)")

    full = results["full"]
    print(f"\ngate transcendental share ~ {(full - results['nogate']) / full:.0%}")
    print(f"hidden-matmul share       ~ {(full - results['nomm']) / full:.0%}")
    print(f"input-DMA share           ~ {(full - results['nodma']) / full:.0%}")

    # production path for reference
    enc = jax.jit(functools.partial(
        pk.bilstm_encoder_pallas, center_only=True, fused=True))
    layers2 = init_bilstm_params(key, d_in, hidden, 2)
    dt = bench(enc, layers2, x, iters=iters)
    print(f"\nproduction 2-layer encoder (center_only): {dt * 1e6:9.1f} us "
          f"({n / dt / 1e6:7.2f} M sites/s)")


if __name__ == "__main__":
    main()
