"""Pallas TPU kernel: fused bidirectional-LSTM recurrence.

The BiLSTM inner loop is the pipeline's hot device code. The XLA lax.scan
version pays per-timestep loop overhead (~132 sequential tiny-matmul steps
per model); this kernel runs the whole recurrence for a batch tile inside
one Pallas program:

  - grid over batch tiles (BN rows); the recurrent weights (both
    directions) and the h/c state stay resident in VMEM for the entire
    sequence;
  - the time-major input projections live in HBM and stream in per
    timestep via double-buffered async DMA, so VMEM holds only two
    [2, 4H, BN] slabs regardless of sequence length; outputs stream back
    through a second slot pair;
  - everything is laid out batch-last ([..., gates/hidden, BN]): the lane
    axis carries the batch tile (128-aligned) and the gate splits cut the
    sublane axis at multiples of H (sublane tiles are 8 wide, so H=64
    slices are legal — lane-axis slicing at 64 is not);
  - per timestep one batched [2, 4H, H] x [2, H, BN] matmul feeds the MXU;
    gate math runs on the VPU in f32; the small static sequence length
    (33 / 11) is unrolled so every DMA slot index is static.

Input projections (the large batch x time matmul) stay outside in XLA where
they already saturate the MXU; the wrapper takes the standard [L, 2, N, 4H]
time-major projections (backward direction pre-reversed, exactly as
models/bilstm._bilstm_layer builds them) and handles the layout change.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def pallas_supported() -> bool:
    if not _HAS_PLTPU:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _kernel(xp_hbm, w_ref, out_hbm, h_ref, c_ref, xbuf, obuf, in_sems,
            out_sems, *, seq_len, hidden, block_n, reverse_dir1):
    i = pl.program_id(0)

    def _time(t, d):
        # with reverse_dir1 the kernel itself walks direction 1 backwards
        # through true-time-ordered inputs/outputs (no host-side reversal
        # copies); otherwise dir-1 slabs are pre-reversed by the caller
        return seq_len - 1 - t if (reverse_dir1 and d == 1) else t

    def in_copy(t, slot):
        if not reverse_dir1:
            return [pltpu.make_async_copy(
                xp_hbm.at[t, :, :, pl.ds(i * block_n, block_n)],
                xbuf.at[slot],
                in_sems.at[slot, 0],
            )]
        return [
            pltpu.make_async_copy(
                xp_hbm.at[_time(t, d), d, :, pl.ds(i * block_n, block_n)],
                xbuf.at[slot, d],
                in_sems.at[slot, d],
            )
            for d in (0, 1)
        ]

    def out_copy(t, slot):
        if not reverse_dir1:
            return [pltpu.make_async_copy(
                obuf.at[slot],
                out_hbm.at[t, :, :, pl.ds(i * block_n, block_n)],
                out_sems.at[slot, 0],
            )]
        return [
            pltpu.make_async_copy(
                obuf.at[slot, d],
                out_hbm.at[_time(t, d), d, :, pl.ds(i * block_n, block_n)],
                out_sems.at[slot, d],
            )
            for d in (0, 1)
        ]

    h_ref[...] = jnp.zeros_like(h_ref)
    c_ref[...] = jnp.zeros_like(c_ref)
    for cp in in_copy(0, 0):
        cp.start()

    # seq_len is small and static (33 / 11): unroll so slot indices and
    # gate slice offsets are static
    for t in range(seq_len):
        slot = t % 2
        if t + 1 < seq_len:
            for cp in in_copy(t + 1, (t + 1) % 2):
                cp.start()
        for cp in in_copy(t, slot):
            cp.wait()
        xt = xbuf[slot].astype(jnp.float32)            # [2, 4H, BN]
        # [2, 4H, H] x [2, H, BN] -> [2, 4H, BN]
        gates = xt + jax.lax.dot_general(
            w_ref[...], h_ref[...].astype(w_ref.dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ig = jax.nn.sigmoid(gates[:, :hidden, :])
        fg = jax.nn.sigmoid(gates[:, hidden: 2 * hidden, :])
        gg = jnp.tanh(gates[:, 2 * hidden: 3 * hidden, :])
        og = jax.nn.sigmoid(gates[:, 3 * hidden:, :])
        c = fg * c_ref[...] + ig * gg
        h = og * jnp.tanh(c)
        c_ref[...] = c
        h_ref[...] = h

        # stream h to HBM; wait for the slot's previous flight first
        if t >= 2:
            for cp in out_copy(t - 2, slot):
                cp.wait()
        obuf[slot] = h
        for cp in out_copy(t, slot):
            cp.start()

    if seq_len >= 2:
        for cp in out_copy(seq_len - 2, (seq_len - 2) % 2):
            cp.wait()
    for cp in out_copy(seq_len - 1, (seq_len - 1) % 2):
        cp.wait()


def _run_recurrence(xp_t, w_t, *, seq_len, hidden, gate_dim, block_n,
                    reverse_dir1, interpret, out_dtype):
    """xp_t [L, 2, 4H, Npad], w_t [2, 4H, H] -> hs [L, 2, H, Npad]."""
    n_pad = xp_t.shape[-1]
    grid = (n_pad // block_n,)
    return pl.pallas_call(
        functools.partial(_kernel, seq_len=seq_len, hidden=hidden,
                          block_n=block_n, reverse_dir1=reverse_dir1),
        out_shape=jax.ShapeDtypeStruct((seq_len, 2, hidden, n_pad),
                                       out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if _HAS_PLTPU else None),
            pl.BlockSpec((2, gate_dim, hidden), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY if _HAS_PLTPU else None),
        scratch_shapes=[
            pltpu.VMEM((2, hidden, block_n), jnp.float32),      # h
            pltpu.VMEM((2, hidden, block_n), jnp.float32),      # c
            pltpu.VMEM((2, 2, gate_dim, block_n), xp_t.dtype),  # in slabs
            pltpu.VMEM((2, 2, hidden, block_n), out_dtype),     # out slabs
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ] if _HAS_PLTPU else [],
        interpret=interpret,
    )(xp_t, w_t)


def _pick_block(n: int, block_n: int) -> int:
    if n < block_n:
        return max(128, 1 << (max(n - 1, 1)).bit_length())
    return block_n


def bilstm_layer_pallas(
    xp: jnp.ndarray,      # [L, 2, N, 4H] (dir-1 inputs already reversed)
    w_hh: jnp.ndarray,    # [2, H, 4H]
    *,
    block_n: int = 512,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Drop-in recurrence for models/bilstm._bilstm_layer.
    Returns hs [L, 2, N, H] float32 (dir-1 outputs still time-reversed)."""
    seq_len, ndir, n, gate_dim = xp.shape
    hidden = gate_dim // 4
    assert ndir == 2
    block_n = _pick_block(n, block_n)
    pad = (-n) % block_n
    xp_t = jnp.transpose(xp, (0, 1, 3, 2))          # [L, 2, 4H, N]
    if pad:
        xp_t = jnp.pad(xp_t, ((0, 0), (0, 0), (0, 0), (0, pad)))
    w_t = jnp.transpose(w_hh, (0, 2, 1)).astype(compute_dtype)
    out = _run_recurrence(xp_t, w_t, seq_len=seq_len, hidden=hidden,
                          gate_dim=gate_dim, block_n=block_n,
                          reverse_dir1=False, interpret=interpret,
                          out_dtype=jnp.float32)
    hs = jnp.transpose(out, (0, 1, 3, 2))           # [L, 2, n_pad, H]
    if pad:
        hs = hs[:, :, :n, :]
    return hs


def bilstm_encoder_pallas(
    layers,
    x: jnp.ndarray,          # [N, L, D]
    *,
    compute_dtype=jnp.bfloat16,
    block_n: int = 512,
    interpret: bool = False,
    center_only: bool = False,
):
    """Full multi-layer BiLSTM encoder on the Pallas recurrence, staying in
    batch-last [L, feat, N] layout across layers: no reversal or transpose
    copies of the big activations (the kernel walks direction 1 backwards
    itself), inter-layer activations in bf16.

    Returns [N, L, 2H] float32, or [N, 2H] when center_only.
    """
    n, seq_len, _ = x.shape
    block_n = _pick_block(n, block_n)
    pad = (-n) % block_n
    x_t = jnp.transpose(x, (1, 2, 0)).astype(compute_dtype)  # [L, D, N]
    if pad:
        x_t = jnp.pad(x_t, ((0, 0), (0, 0), (0, pad)))

    hs = None
    for layer in layers:
        w_ih = layer["w_ih"].astype(compute_dtype)   # [2, D, 4H]
        b = layer["b"].astype(jnp.float32)
        gate_dim = w_ih.shape[-1]
        hidden = gate_dim // 4
        # one MXU matmul for all timesteps, emitted directly batch-last
        xp_t = jnp.einsum("ldn,zdk->lzkn", x_t, w_ih,
                          preferred_element_type=jnp.float32)
        xp_t = (xp_t + b[None, :, :, None]).astype(compute_dtype)
        w_t = jnp.transpose(layer["w_hh"], (0, 2, 1)).astype(compute_dtype)
        hs = _run_recurrence(xp_t, w_t, seq_len=seq_len, hidden=hidden,
                             gate_dim=gate_dim, block_n=block_n,
                             reverse_dir1=True, interpret=interpret,
                             out_dtype=jnp.float32)   # [L, 2, H, N] true time
        x_t = hs.reshape(seq_len, 2 * hidden, -1).astype(compute_dtype)

    hidden = hs.shape[2]
    if center_only:
        ctr = hs[seq_len // 2].reshape(2 * hidden, -1)   # [2H, Npad]
        ctr = jnp.transpose(ctr, (1, 0))
        return ctr[:n] if pad else ctr
    full = jnp.transpose(hs, (3, 0, 1, 2)).reshape(-1, seq_len, 2 * hidden)
    return full[:n] if pad else full
