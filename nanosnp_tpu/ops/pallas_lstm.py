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

Inference goes one step further (bilstm_encoder_pallas, fused=True): v5e
measurement showed the recurrence is HBM-bandwidth-bound on streaming the
4H-wide xp slabs, so the fused encoder kernels compute the in-projection
*inside* the program — w_ih joins w_hh in VMEM, the HBM in-stream is the
D-wide layer input (4H/D x smaller), inter-layer outputs stream as bf16,
and under center_only the last layer writes a single [2, H, N] block
instead of the full sequence. Net ~5x less recurrence HBM traffic;
pileup model 2.5x faster end to end, argmax-identical decodes.
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
        obuf[slot] = h.astype(obuf.dtype)
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


def _train_kernel(xp_hbm, w_ref, out_hbm, cs_hbm, h_ref, c_ref, xbuf, obuf,
                  cbuf, in_sems, out_sems, c_sems, *, seq_len, hidden,
                  block_n):
    """Forward recurrence that also streams the cell states to HBM (the
    backward pass re-derives the gates from xp + W h_{t-1}, so (h, c) per
    timestep is the full residual set). Pre-reversed dir-1 layout only."""
    i = pl.program_id(0)

    def in_copy(t, slot):
        return pltpu.make_async_copy(
            xp_hbm.at[t, :, :, pl.ds(i * block_n, block_n)],
            xbuf.at[slot], in_sems.at[slot])

    def out_copy(t, slot):
        return pltpu.make_async_copy(
            obuf.at[slot], out_hbm.at[t, :, :, pl.ds(i * block_n, block_n)],
            out_sems.at[slot])

    def c_copy(t, slot):
        return pltpu.make_async_copy(
            cbuf.at[slot], cs_hbm.at[t, :, :, pl.ds(i * block_n, block_n)],
            c_sems.at[slot])

    h_ref[...] = jnp.zeros_like(h_ref)
    c_ref[...] = jnp.zeros_like(c_ref)
    in_copy(0, 0).start()
    for t in range(seq_len):
        slot = t % 2
        if t + 1 < seq_len:
            in_copy(t + 1, (t + 1) % 2).start()
        in_copy(t, slot).wait()
        xt = xbuf[slot].astype(jnp.float32)
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
        if t >= 2:
            out_copy(t - 2, slot).wait()
            c_copy(t - 2, slot).wait()
        obuf[slot] = h
        cbuf[slot] = c
        out_copy(t, slot).start()
        c_copy(t, slot).start()
    for t in (seq_len - 2, seq_len - 1):
        if t >= 0:
            out_copy(t, t % 2).wait()
            c_copy(t, t % 2).wait()


def _bwd_kernel(xp_hbm, w_ref, hs_hbm, cs_hbm, g_hbm, dxp_hbm, dw_ref,
                dh_ref, dc_ref, xbuf, gbuf, hbuf, cbuf, ctbuf, dxbuf, sems,
                out_sems, *, seq_len, hidden, block_n):
    """Reverse-time recurrence: per step recompute the gates from
    xp[t] + W h_{t-1}, push cotangents through the cell, accumulate dW in
    VMEM, stream dxp (= dgate preactivations) back to HBM. Sync input DMA
    (start+wait per step): the slabs are small and the matmuls dominate."""
    i = pl.program_id(0)

    def load(hbm, t, buf, sem):
        cp = pltpu.make_async_copy(
            hbm.at[t, :, :, pl.ds(i * block_n, block_n)], buf, sem)
        cp.start()
        cp.wait()

    def out_copy(t, slot):
        return pltpu.make_async_copy(
            dxbuf.at[slot],
            dxp_hbm.at[t, :, :, pl.ds(i * block_n, block_n)],
            out_sems.at[slot])

    dh_ref[...] = jnp.zeros_like(dh_ref)
    dc_ref[...] = jnp.zeros_like(dc_ref)
    dw_ref[0] = jnp.zeros_like(dw_ref[0])
    load(cs_hbm, seq_len - 1, ctbuf, sems.at[4])
    for t in range(seq_len - 1, -1, -1):
        slot = t % 2
        load(xp_hbm, t, xbuf, sems.at[0])
        load(g_hbm, t, gbuf, sems.at[1])
        if t > 0:
            load(hs_hbm, t - 1, hbuf, sems.at[2])
            load(cs_hbm, t - 1, cbuf, sems.at[3])
        else:
            hbuf[...] = jnp.zeros_like(hbuf)
            cbuf[...] = jnp.zeros_like(cbuf)
        h_prev = hbuf[...].astype(jnp.float32)
        c_prev = cbuf[...].astype(jnp.float32)
        c_t = ctbuf[...].astype(jnp.float32)
        gates = xbuf[...].astype(jnp.float32) + jax.lax.dot_general(
            w_ref[...], hbuf[...].astype(w_ref.dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ig = jax.nn.sigmoid(gates[:, :hidden, :])
        fg = jax.nn.sigmoid(gates[:, hidden: 2 * hidden, :])
        gg = jnp.tanh(gates[:, 2 * hidden: 3 * hidden, :])
        og = jax.nn.sigmoid(gates[:, 3 * hidden:, :])
        tanh_ct = jnp.tanh(c_t)

        dh = gbuf[...].astype(jnp.float32) + dh_ref[...]
        do_pre = dh * tanh_ct * og * (1.0 - og)
        dc = dh * og * (1.0 - tanh_ct * tanh_ct) + dc_ref[...]
        di_pre = dc * gg * ig * (1.0 - ig)
        df_pre = dc * c_prev * fg * (1.0 - fg)
        dg_pre = dc * ig * (1.0 - gg * gg)
        dgates = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre], axis=1)

        # dW[z, k, h] += sum_n dgates[z, k, n] * h_prev[z, h, n]
        dw_ref[0] += jax.lax.dot_general(
            dgates, h_prev,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        # dh_prev[z, h, n] = sum_k w[z, k, h] * dgates[z, k, n]
        dh_ref[...] = jax.lax.dot_general(
            w_ref[...], dgates.astype(w_ref.dtype),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dc_ref[...] = dc * fg

        if t + 2 < seq_len:
            out_copy(t + 2, slot).wait()
        dxbuf[slot] = dgates
        out_copy(t, slot).start()
        # this step's c_{t-1} is the next (t-1) step's c_t
        ctbuf[...] = cbuf[...]
    for t in (1, 0):
        if t < seq_len:
            out_copy(t, t % 2).wait()


def _run_recurrence_train(xp_t, w_t, *, seq_len, hidden, gate_dim, block_n,
                          interpret):
    """Forward with residuals: returns (hs, cs), both [L, 2, H, Npad] f32."""
    n_pad = xp_t.shape[-1]
    grid = (n_pad // block_n,)
    return pl.pallas_call(
        functools.partial(_train_kernel, seq_len=seq_len, hidden=hidden,
                          block_n=block_n),
        out_shape=[
            jax.ShapeDtypeStruct((seq_len, 2, hidden, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((seq_len, 2, hidden, n_pad), jnp.float32),
        ],
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if _HAS_PLTPU else None),
            pl.BlockSpec((2, gate_dim, hidden), lambda i: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if _HAS_PLTPU else None),
            pl.BlockSpec(memory_space=pltpu.ANY if _HAS_PLTPU else None),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, hidden, block_n), jnp.float32),      # h
            pltpu.VMEM((2, hidden, block_n), jnp.float32),      # c
            pltpu.VMEM((2, 2, gate_dim, block_n), xp_t.dtype),  # in slabs
            pltpu.VMEM((2, 2, hidden, block_n), jnp.float32),   # h out slabs
            pltpu.VMEM((2, 2, hidden, block_n), jnp.float32),   # c out slabs
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ] if _HAS_PLTPU else [],
        interpret=interpret,
    )(xp_t, w_t)


def _run_recurrence_bwd(xp_t, w_t, hs, cs, g, *, seq_len, hidden, gate_dim,
                        block_n, interpret):
    """Backward: returns (dxp [L,2,4H,Npad] f32, dw_tiles [G,2,4H,H] f32)."""
    n_pad = xp_t.shape[-1]
    grid = (n_pad // block_n,)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, seq_len=seq_len, hidden=hidden,
                          block_n=block_n),
        out_shape=[
            jax.ShapeDtypeStruct((seq_len, 2, gate_dim, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], 2, gate_dim, hidden), jnp.float32),
        ],
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if _HAS_PLTPU else None),
            pl.BlockSpec((2, gate_dim, hidden), lambda i: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY if _HAS_PLTPU else None),
            pl.BlockSpec(memory_space=pltpu.ANY if _HAS_PLTPU else None),
            pl.BlockSpec(memory_space=pltpu.ANY if _HAS_PLTPU else None),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if _HAS_PLTPU else None),
            pl.BlockSpec((1, 2, gate_dim, hidden), lambda i: (i, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, hidden, block_n), jnp.float32),       # dh carry
            pltpu.VMEM((2, hidden, block_n), jnp.float32),       # dc carry
            pltpu.VMEM((2, gate_dim, block_n), xp_t.dtype),      # xp slab
            pltpu.VMEM((2, hidden, block_n), jnp.float32),       # g slab
            pltpu.VMEM((2, hidden, block_n), jnp.float32),       # h_prev
            pltpu.VMEM((2, hidden, block_n), jnp.float32),       # c_prev
            pltpu.VMEM((2, hidden, block_n), jnp.float32),       # c_t
            pltpu.VMEM((2, 2, gate_dim, block_n), jnp.float32),  # dxp slabs
            pltpu.SemaphoreType.DMA((5,)),
            pltpu.SemaphoreType.DMA((2,)),
        ] if _HAS_PLTPU else [],
        interpret=interpret,
    )(xp_t, w_t, hs, cs, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _recurrence(xp_t, w_t, meta):
    """Differentiable fused recurrence (pre-reversed dir-1 layout).

    xp_t [L, 2, 4H, Npad], w_t [2, 4H, H] -> hs [L, 2, H, Npad] f32.
    meta = (seq_len, hidden, gate_dim, block_n, interpret)."""
    seq_len, hidden, gate_dim, block_n, interpret = meta
    return _run_recurrence(xp_t, w_t, seq_len=seq_len, hidden=hidden,
                           gate_dim=gate_dim, block_n=block_n,
                           reverse_dir1=False, interpret=interpret,
                           out_dtype=jnp.float32)


def _recurrence_fwd(xp_t, w_t, meta):
    seq_len, hidden, gate_dim, block_n, interpret = meta
    hs, cs = _run_recurrence_train(xp_t, w_t, seq_len=seq_len, hidden=hidden,
                                   gate_dim=gate_dim, block_n=block_n,
                                   interpret=interpret)
    return hs, (xp_t, w_t, hs, cs)


def _recurrence_bwd(meta, res, g):
    seq_len, hidden, gate_dim, block_n, interpret = meta
    xp_t, w_t, hs, cs = res
    dxp, dw_tiles = _run_recurrence_bwd(
        xp_t, w_t, hs, cs, g.astype(jnp.float32), seq_len=seq_len,
        hidden=hidden, gate_dim=gate_dim, block_n=block_n,
        interpret=interpret)
    return dxp.astype(xp_t.dtype), dw_tiles.sum(axis=0).astype(w_t.dtype)


_recurrence.defvjp(_recurrence_fwd, _recurrence_bwd)


def _enc_stream_kernel(x_hbm, wih_ref, w_ref, b_ref, out_hbm, h_ref, c_ref,
                       xbuf, obuf, in_sems, out_sems, *, seq_len, hidden,
                       block_n):
    """Fused in-projection + recurrence, full-sequence output.

    Unlike _kernel, the input stream is the layer input x [L, D, Npad]
    (D = d_in, e.g. 18/32 or 2H) rather than the 4H-wide projections: the
    per-timestep projection runs on the in-kernel MXU with w_ih resident in
    VMEM. For narrow-D layers this cuts the HBM in-stream ~4H/D x, which is
    what the recurrence is actually bound by (measured v5e: the xp stream,
    not the matmul, dominates step time)."""
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

    for t in range(seq_len):
        slot = t % 2
        if t + 1 < seq_len:
            for cp in in_copy(t + 1, (t + 1) % 2):
                cp.start()
        for cp in in_copy(t, slot):
            cp.wait()
        # [2, 4H, D] x [2, D, BN] -> in-projection for this timestep
        gates = jax.lax.dot_general(
            wih_ref[...], xbuf[slot],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        gates = gates + jax.lax.dot_general(
            w_ref[...], h_ref[...].astype(w_ref.dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        gates = gates + b_ref[...]
        ig = jax.nn.sigmoid(gates[:, :hidden, :])
        fg = jax.nn.sigmoid(gates[:, hidden: 2 * hidden, :])
        gg = jnp.tanh(gates[:, 2 * hidden: 3 * hidden, :])
        og = jax.nn.sigmoid(gates[:, 3 * hidden:, :])
        c = fg * c_ref[...] + ig * gg
        h = og * jnp.tanh(c)
        c_ref[...] = c
        h_ref[...] = h

        if t >= 2:
            for cp in out_copy(t - 2, slot):
                cp.wait()
        obuf[slot] = h.astype(obuf.dtype)
        for cp in out_copy(t, slot):
            cp.start()

    if seq_len >= 2:
        for cp in out_copy(seq_len - 2, (seq_len - 2) % 2):
            cp.wait()
    for cp in out_copy(seq_len - 1, (seq_len - 1) % 2):
        cp.wait()


def _enc_center_kernel(x_hbm, wih_ref, w_ref, b_ref, out_ref, h_ref, c_ref,
                       xbuf, in_sems, *, seq_len, hidden, block_n):
    """Fused in-projection + recurrence, center-timestep output only.

    For the last layer under center_only (both models decode only the
    window center) the full [L, 2, H, N] output stream is pure waste: with
    odd L both directions pass the center at t = L//2, so the kernel just
    assigns the blocked output once and streams nothing."""
    i = pl.program_id(0)
    center = seq_len // 2

    def _time(t, d):
        return seq_len - 1 - t if d == 1 else t

    def in_copy(t, slot):
        return [
            pltpu.make_async_copy(
                x_hbm.at[_time(t, d), :, pl.ds(i * block_n, block_n)],
                xbuf.at[slot, d], in_sems.at[slot, d])
            for d in (0, 1)
        ]

    h_ref[...] = jnp.zeros_like(h_ref)
    c_ref[...] = jnp.zeros_like(c_ref)
    for cp in in_copy(0, 0):
        cp.start()

    for t in range(seq_len):
        slot = t % 2
        if t + 1 < seq_len:
            for cp in in_copy(t + 1, (t + 1) % 2):
                cp.start()
        for cp in in_copy(t, slot):
            cp.wait()
        gates = jax.lax.dot_general(
            wih_ref[...], xbuf[slot],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        gates = gates + jax.lax.dot_general(
            w_ref[...], h_ref[...].astype(w_ref.dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        gates = gates + b_ref[...]
        ig = jax.nn.sigmoid(gates[:, :hidden, :])
        fg = jax.nn.sigmoid(gates[:, hidden: 2 * hidden, :])
        gg = jnp.tanh(gates[:, 2 * hidden: 3 * hidden, :])
        og = jax.nn.sigmoid(gates[:, 3 * hidden:, :])
        c = fg * c_ref[...] + ig * gg
        h = og * jnp.tanh(c)
        c_ref[...] = c
        h_ref[...] = h
        if t == center:
            out_ref[...] = h.astype(out_ref.dtype)


def _enc_center_head_kernel(x_hbm, wih_ref, w_ref, b_ref, wp_ref, bp_ref,
                            wd_ref, bd_ref, wh_ref, bh_ref, out_ref, h_ref,
                            c_ref, xbuf, in_sems, *, seq_len, hidden,
                            block_n):
    """_enc_center_kernel + the ForwardLayer head fused in VMEM
    (VERDICT r3 #7): proj(2H->P) -> tanh(dense(P->Q)) -> all heads as one
    [Hout, Q] matmul, computed ONCE at the center step. Removes the
    [2, H, N] center write + the separate XLA head program + its HBM
    round-trips; the three small matmuls run once per block, not per
    timestep, so their MXU cost is noise. Math matches models/bilstm.py
    linear(): operands cast to the weight dtype, f32 accumulation, f32
    bias adds, f32 tanh."""
    i = pl.program_id(0)
    center = seq_len // 2

    def _time(t, d):
        return seq_len - 1 - t if d == 1 else t

    def in_copy(t, slot):
        return [
            pltpu.make_async_copy(
                x_hbm.at[_time(t, d), :, pl.ds(i * block_n, block_n)],
                xbuf.at[slot, d], in_sems.at[slot, d])
            for d in (0, 1)
        ]

    h_ref[...] = jnp.zeros_like(h_ref)
    c_ref[...] = jnp.zeros_like(c_ref)
    for cp in in_copy(0, 0):
        cp.start()

    for t in range(seq_len):
        slot = t % 2
        if t + 1 < seq_len:
            for cp in in_copy(t + 1, (t + 1) % 2):
                cp.start()
        for cp in in_copy(t, slot):
            cp.wait()
        gates = jax.lax.dot_general(
            wih_ref[...], xbuf[slot],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        gates = gates + jax.lax.dot_general(
            w_ref[...], h_ref[...].astype(w_ref.dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        gates = gates + b_ref[...]
        ig = jax.nn.sigmoid(gates[:, :hidden, :])
        fg = jax.nn.sigmoid(gates[:, hidden: 2 * hidden, :])
        gg = jnp.tanh(gates[:, 2 * hidden: 3 * hidden, :])
        og = jax.nn.sigmoid(gates[:, 3 * hidden:, :])
        c = fg * c_ref[...] + ig * gg
        h = og * jnp.tanh(c)
        c_ref[...] = c
        h_ref[...] = h
        if t == center:
            wdt = wp_ref.dtype
            ctr = jnp.concatenate([h[0], h[1]], axis=0)     # [2H, BN]
            feat = jax.lax.dot_general(
                wp_ref[...], ctr.astype(wdt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + bp_ref[...]
            feat = jnp.tanh(jax.lax.dot_general(
                wd_ref[...], feat.astype(wdt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + bd_ref[...])
            out_ref[...] = jax.lax.dot_general(
                wh_ref[...], feat.astype(wdt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + bh_ref[...]


def _run_enc_center_head(x_t, wih_t, w_t, b, head, *, seq_len, hidden,
                         gate_dim, block_n, interpret):
    """Like _run_enc_center but emits head logits [Hout_pad, Npad]."""
    n_pad = x_t.shape[-1]
    d_pad = x_t.shape[1]
    grid = (n_pad // block_n,)
    wp, bp, wd, bd, wh, bh = head
    n_out = wh.shape[0]
    return pl.pallas_call(
        functools.partial(_enc_center_head_kernel, seq_len=seq_len,
                          hidden=hidden, block_n=block_n),
        out_shape=jax.ShapeDtypeStruct((n_out, n_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if _HAS_PLTPU else None),
            pl.BlockSpec((2, gate_dim, d_pad), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, gate_dim, hidden), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, gate_dim, 1), lambda i: (0, 0, 0)),
            pl.BlockSpec(wp.shape, lambda i: (0, 0)),
            pl.BlockSpec(bp.shape, lambda i: (0, 0)),
            pl.BlockSpec(wd.shape, lambda i: (0, 0)),
            pl.BlockSpec(bd.shape, lambda i: (0, 0)),
            pl.BlockSpec(wh.shape, lambda i: (0, 0)),
            pl.BlockSpec(bh.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((n_out, block_n), lambda i: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((2, hidden, block_n), jnp.float32),       # h
            pltpu.VMEM((2, hidden, block_n), jnp.float32),       # c
            pltpu.VMEM((2, 2, d_pad, block_n), x_t.dtype),       # in slabs
            pltpu.SemaphoreType.DMA((2, 2)),
        ] if _HAS_PLTPU else [],
        interpret=interpret,
    )(x_t, wih_t, w_t, b, wp, bp, wd, bd, wh, bh)


def _enc_kfused_body(x_hbm, wcat_ref, b_ref, h_ref, c_ref, xbuf, in_sems,
                     *, seq_len, hidden, d_pad, block_n, on_step):
    """Shared time loop for the K-fused encoder kernels.

    K-fusion (r3, VERDICT #2): with D_pad + H <= 128 the in-projection and
    the hidden matmul fit ONE MXU K-tile, so concatenating [w_ih | w_hh]
    into wcat [2, 4H, D_pad+H] and writing h_{t-1} into the tail rows of
    the input slab halves the MXU passes per timestep (2 instead of 4 per
    direction for the pileup model's layer 1: separate dots each round K
    up to a full 128-tile, wasting the idle rows twice). The systolic
    array's pass time depends on ceil(K/128), not K, so filling the tile
    with real contraction is free throughput. Layer 2 (D=2H=128) stays on
    the two-dot kernels: 128+64 spills into a second K-tile and nothing is
    saved.

    `on_step(t, h)` receives every timestep's fresh hidden state and
    handles output (stream vs center-only)."""
    i = pl.program_id(0)

    def _time(t, d):
        return seq_len - 1 - t if d == 1 else t

    def in_copy(t, slot):
        return [
            pltpu.make_async_copy(
                x_hbm.at[_time(t, d), :, pl.ds(i * block_n, block_n)],
                xbuf.at[slot, d, pl.ds(0, d_pad)], in_sems.at[slot, d])
            for d in (0, 1)
        ]

    h_ref[...] = jnp.zeros_like(h_ref)
    c_ref[...] = jnp.zeros_like(c_ref)
    for cp in in_copy(0, 0):
        cp.start()

    for t in range(seq_len):
        slot = t % 2
        if t + 1 < seq_len:
            for cp in in_copy(t + 1, (t + 1) % 2):
                cp.start()
        for cp in in_copy(t, slot):
            cp.wait()
        # h_{t-1} into the slab rows the DMA does not touch -> one fused
        # [4H, D_pad+H] x [D_pad+H, BN] dot per direction. Per-direction
        # dots, NOT one batch-2 dot_general: a loop body whose only matmul
        # is a single batched dot SIGABRTs the Mosaic compiler
        # ("Check failed: limits[i] <= dim(i)" in array.h — bisected
        # 2026-08: two batched dots fine, one batched dot crashes,
        # unbatched always fine).
        for d in (0, 1):
            xbuf[slot, d, d_pad:, :] = h_ref[d].astype(xbuf.dtype)
        gates = jnp.stack([
            jax.lax.dot_general(
                wcat_ref[d], xbuf[slot, d],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for d in (0, 1)])
        gates = gates + b_ref[...]
        ig = jax.nn.sigmoid(gates[:, :hidden, :])
        fg = jax.nn.sigmoid(gates[:, hidden: 2 * hidden, :])
        gg = jnp.tanh(gates[:, 2 * hidden: 3 * hidden, :])
        og = jax.nn.sigmoid(gates[:, 3 * hidden:, :])
        c = fg * c_ref[...] + ig * gg
        h = og * jnp.tanh(c)
        c_ref[...] = c
        h_ref[...] = h
        on_step(t, h)


def _enc_stream_kfused_kernel(x_hbm, wcat_ref, b_ref, out_hbm, h_ref, c_ref,
                              xbuf, obuf, in_sems, out_sems, *, seq_len,
                              hidden, d_pad, block_n):
    """K-fused variant of _enc_stream_kernel (full-sequence output)."""
    i = pl.program_id(0)

    def _time(t, d):
        return seq_len - 1 - t if d == 1 else t

    def out_copy(t, slot):
        return [
            pltpu.make_async_copy(
                obuf.at[slot, d],
                out_hbm.at[_time(t, d), d, :, pl.ds(i * block_n, block_n)],
                out_sems.at[slot, d])
            for d in (0, 1)
        ]

    def on_step(t, h):
        slot = t % 2
        if t >= 2:
            for cp in out_copy(t - 2, slot):
                cp.wait()
        obuf[slot] = h.astype(obuf.dtype)
        for cp in out_copy(t, slot):
            cp.start()

    _enc_kfused_body(x_hbm, wcat_ref, b_ref, h_ref, c_ref, xbuf, in_sems,
                     seq_len=seq_len, hidden=hidden, d_pad=d_pad,
                     block_n=block_n, on_step=on_step)
    if seq_len >= 2:
        for cp in out_copy(seq_len - 2, (seq_len - 2) % 2):
            cp.wait()
    for cp in out_copy(seq_len - 1, (seq_len - 1) % 2):
        cp.wait()


def _enc_center_kfused_kernel(x_hbm, wcat_ref, b_ref, out_ref, h_ref, c_ref,
                              xbuf, in_sems, *, seq_len, hidden, d_pad,
                              block_n):
    """K-fused variant of _enc_center_kernel (center timestep only)."""
    center = seq_len // 2

    def on_step(t, h):
        if t == center:
            out_ref[...] = h.astype(out_ref.dtype)

    _enc_kfused_body(x_hbm, wcat_ref, b_ref, h_ref, c_ref, xbuf, in_sems,
                     seq_len=seq_len, hidden=hidden, d_pad=d_pad,
                     block_n=block_n, on_step=on_step)


def _run_enc_stream_kfused(x_t, wcat_t, b, *, seq_len, hidden, gate_dim,
                           block_n, interpret, out_dtype):
    """x_t [L, Dp, Npad], wcat_t [2, 4H, Dp+H], b [2, 4H, 1]
    -> hs [L, 2, H, Npad] in true time order."""
    n_pad = x_t.shape[-1]
    d_pad = x_t.shape[1]
    grid = (n_pad // block_n,)
    return pl.pallas_call(
        functools.partial(_enc_stream_kfused_kernel, seq_len=seq_len,
                          hidden=hidden, d_pad=d_pad, block_n=block_n),
        out_shape=jax.ShapeDtypeStruct((seq_len, 2, hidden, n_pad),
                                       out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if _HAS_PLTPU else None),
            pl.BlockSpec((2, gate_dim, d_pad + hidden), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, gate_dim, 1), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY if _HAS_PLTPU else None),
        scratch_shapes=[
            pltpu.VMEM((2, hidden, block_n), jnp.float32),           # h
            pltpu.VMEM((2, hidden, block_n), jnp.float32),           # c
            pltpu.VMEM((2, 2, d_pad + hidden, block_n), x_t.dtype),  # in
            pltpu.VMEM((2, 2, hidden, block_n), out_dtype),          # out
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ] if _HAS_PLTPU else [],
        interpret=interpret,
    )(x_t, wcat_t, b)


def _run_enc_center_kfused(x_t, wcat_t, b, *, seq_len, hidden, gate_dim,
                           block_n, interpret):
    n_pad = x_t.shape[-1]
    d_pad = x_t.shape[1]
    grid = (n_pad // block_n,)
    return pl.pallas_call(
        functools.partial(_enc_center_kfused_kernel, seq_len=seq_len,
                          hidden=hidden, d_pad=d_pad, block_n=block_n),
        out_shape=jax.ShapeDtypeStruct((2, hidden, n_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if _HAS_PLTPU else None),
            pl.BlockSpec((2, gate_dim, d_pad + hidden), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, gate_dim, 1), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((2, hidden, block_n), lambda i: (0, 0, i)),
        scratch_shapes=[
            pltpu.VMEM((2, hidden, block_n), jnp.float32),           # h
            pltpu.VMEM((2, hidden, block_n), jnp.float32),           # c
            pltpu.VMEM((2, 2, d_pad + hidden, block_n), x_t.dtype),  # in
            pltpu.SemaphoreType.DMA((2, 2)),
        ] if _HAS_PLTPU else [],
        interpret=interpret,
    )(x_t, wcat_t, b)


def _enc2_center_kernel(x_hbm, wcat1_ref, b1_ref, wih2_ref, w2_ref, b2_ref,
                        out_ref, h_ref, c_ref, hs_ref, xbuf, in_sems, *,
                        seq_len, hidden, d_pad, block_n):
    """Both encoder layers fused into ONE program, center-only output
    (r5, VERDICT r4 #7 — the last device-side lever).

    The two-kernel path streams layer 1's full [L, 2, H, N] output to HBM
    and layer 2 DMAs it straight back in; per 512-batch block that is an
    8.6 MB round trip plus 66 DMA issue/wait pairs plus a second kernel
    launch, all pure overhead. Here layer 1 (K-fused in-projection, same
    dots as _enc_kfused_body) parks every timestep's hidden state in a
    VMEM slab (hs_ref [L, 2H, BN] bf16, ~4.3 MB at BN=512) and layer 2's
    recurrence reads the slab directly — zero inter-layer HBM traffic,
    zero layer-2 input DMA, one launch. Math is identical to the split
    path: bf16 inter-layer activations (same cast site), bf16 dots, f32
    gate/cell math, so decodes are argmax-identical.
    """
    i = pl.program_id(0)
    center = seq_len // 2

    def _time(t, d):
        return seq_len - 1 - t if d == 1 else t

    def in_copy(t, slot):
        return [
            pltpu.make_async_copy(
                x_hbm.at[_time(t, d), :, pl.ds(i * block_n, block_n)],
                xbuf.at[slot, d, pl.ds(0, d_pad)], in_sems.at[slot, d])
            for d in (0, 1)
        ]

    h_ref[...] = jnp.zeros_like(h_ref)
    c_ref[...] = jnp.zeros_like(c_ref)
    for cp in in_copy(0, 0):
        cp.start()
    # ---- layer 1: K-fused recurrence -> VMEM slab ----
    for t in range(seq_len):
        slot = t % 2
        if t + 1 < seq_len:
            for cp in in_copy(t + 1, (t + 1) % 2):
                cp.start()
        for cp in in_copy(t, slot):
            cp.wait()
        for d in (0, 1):
            xbuf[slot, d, d_pad:, :] = h_ref[d].astype(xbuf.dtype)
        gates = jnp.stack([
            jax.lax.dot_general(
                wcat1_ref[d], xbuf[slot, d],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for d in (0, 1)]) + b1_ref[...]
        ig = jax.nn.sigmoid(gates[:, :hidden, :])
        fg = jax.nn.sigmoid(gates[:, hidden: 2 * hidden, :])
        gg = jnp.tanh(gates[:, 2 * hidden: 3 * hidden, :])
        og = jax.nn.sigmoid(gates[:, 3 * hidden:, :])
        c = fg * c_ref[...] + ig * gg
        h = og * jnp.tanh(c)
        c_ref[...] = c
        h_ref[...] = h
        # dir-major rows ([0:H) fwd, [H:2H) bwd at the TRUE time index) —
        # the layout the HBM stream path produces via hs.reshape
        hs_ref[_time(t, 0), :hidden, :] = h[0].astype(hs_ref.dtype)
        hs_ref[_time(t, 1), hidden:, :] = h[1].astype(hs_ref.dtype)

    # ---- layer 2: two-dot recurrence straight off the slab ----
    h_ref[...] = jnp.zeros_like(h_ref)
    c_ref[...] = jnp.zeros_like(c_ref)
    for t in range(seq_len):
        gates = jnp.stack([
            jax.lax.dot_general(
                wih2_ref[d], hs_ref[_time(t, d)],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(
                w2_ref[d], h_ref[d].astype(w2_ref.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for d in (0, 1)]) + b2_ref[...]
        ig = jax.nn.sigmoid(gates[:, :hidden, :])
        fg = jax.nn.sigmoid(gates[:, hidden: 2 * hidden, :])
        gg = jnp.tanh(gates[:, 2 * hidden: 3 * hidden, :])
        og = jax.nn.sigmoid(gates[:, 3 * hidden:, :])
        c = fg * c_ref[...] + ig * gg
        h = og * jnp.tanh(c)
        c_ref[...] = c
        h_ref[...] = h
        if t == center:
            out_ref[...] = h.astype(out_ref.dtype)


def _run_enc2_center(x_t, wcat1_t, b1, wih2_t, w2_t, b2, *, seq_len, hidden,
                     gate_dim, block_n, interpret):
    """x_t [L, Dp, Npad] -> center hidden [2, H, Npad] f32, both layers in
    one kernel (see _enc2_center_kernel)."""
    n_pad = x_t.shape[-1]
    d_pad = x_t.shape[1]
    grid = (n_pad // block_n,)
    return pl.pallas_call(
        functools.partial(_enc2_center_kernel, seq_len=seq_len,
                          hidden=hidden, d_pad=d_pad, block_n=block_n),
        out_shape=jax.ShapeDtypeStruct((2, hidden, n_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if _HAS_PLTPU else None),
            pl.BlockSpec((2, gate_dim, d_pad + hidden), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, gate_dim, 1), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, gate_dim, 2 * hidden), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, gate_dim, hidden), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, gate_dim, 1), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((2, hidden, block_n), lambda i: (0, 0, i)),
        scratch_shapes=[
            pltpu.VMEM((2, hidden, block_n), jnp.float32),            # h
            pltpu.VMEM((2, hidden, block_n), jnp.float32),            # c
            pltpu.VMEM((seq_len, 2 * hidden, block_n), x_t.dtype),    # slab
            pltpu.VMEM((2, 2, d_pad + hidden, block_n), x_t.dtype),   # in
            pltpu.SemaphoreType.DMA((2, 2)),
        ] if _HAS_PLTPU else [],
        interpret=interpret,
    )(x_t, wcat1_t, b1, wih2_t, w2_t, b2)


def _run_enc_stream(x_t, wih_t, w_t, b, *, seq_len, hidden, gate_dim,
                    block_n, interpret, out_dtype):
    """x_t [L, Dp, Npad], wih_t [2, 4H, Dp], w_t [2, 4H, H], b [2, 4H, 1]
    -> hs [L, 2, H, Npad] in true time order."""
    n_pad = x_t.shape[-1]
    d_pad = x_t.shape[1]
    grid = (n_pad // block_n,)
    return pl.pallas_call(
        functools.partial(_enc_stream_kernel, seq_len=seq_len, hidden=hidden,
                          block_n=block_n),
        out_shape=jax.ShapeDtypeStruct((seq_len, 2, hidden, n_pad),
                                       out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if _HAS_PLTPU else None),
            pl.BlockSpec((2, gate_dim, d_pad), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, gate_dim, hidden), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, gate_dim, 1), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY if _HAS_PLTPU else None),
        scratch_shapes=[
            pltpu.VMEM((2, hidden, block_n), jnp.float32),       # h
            pltpu.VMEM((2, hidden, block_n), jnp.float32),       # c
            pltpu.VMEM((2, 2, d_pad, block_n), x_t.dtype),       # in slabs
            pltpu.VMEM((2, 2, hidden, block_n), out_dtype),      # out slabs
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ] if _HAS_PLTPU else [],
        interpret=interpret,
    )(x_t, wih_t, w_t, b)


def _run_enc_center(x_t, wih_t, w_t, b, *, seq_len, hidden, gate_dim,
                    block_n, interpret):
    """Like _run_enc_stream but emits only the center timestep:
    [2, H, Npad] float32."""
    n_pad = x_t.shape[-1]
    d_pad = x_t.shape[1]
    grid = (n_pad // block_n,)
    return pl.pallas_call(
        functools.partial(_enc_center_kernel, seq_len=seq_len, hidden=hidden,
                          block_n=block_n),
        out_shape=jax.ShapeDtypeStruct((2, hidden, n_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if _HAS_PLTPU else None),
            pl.BlockSpec((2, gate_dim, d_pad), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, gate_dim, hidden), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, gate_dim, 1), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((2, hidden, block_n), lambda i: (0, 0, i)),
        scratch_shapes=[
            pltpu.VMEM((2, hidden, block_n), jnp.float32),       # h
            pltpu.VMEM((2, hidden, block_n), jnp.float32),       # c
            pltpu.VMEM((2, 2, d_pad, block_n), x_t.dtype),       # in slabs
            pltpu.SemaphoreType.DMA((2, 2)),
        ] if _HAS_PLTPU else [],
        interpret=interpret,
    )(x_t, wih_t, w_t, b)


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
    Returns hs [L, 2, N, H] float32 (dir-1 outputs still time-reversed).

    Differentiable: the recurrence carries a custom VJP whose backward is
    itself a Pallas kernel (reverse-time sweep, gates recomputed from
    xp + W h_{t-1}, dW accumulated in VMEM), so training uses the fused
    path end to end."""
    seq_len, ndir, n, gate_dim = xp.shape
    hidden = gate_dim // 4
    assert ndir == 2
    block_n = _pick_block(n, block_n)
    pad = (-n) % block_n
    xp_t = jnp.transpose(xp, (0, 1, 3, 2))          # [L, 2, 4H, N]
    if pad:
        xp_t = jnp.pad(xp_t, ((0, 0), (0, 0), (0, 0), (0, pad)))
    w_t = jnp.transpose(w_hh, (0, 2, 1)).astype(compute_dtype)
    meta = (seq_len, hidden, gate_dim, block_n, interpret)
    out = _recurrence(xp_t, w_t, meta)
    hs = jnp.transpose(out, (0, 1, 3, 2))           # [L, 2, n_pad, H]
    if pad:
        hs = hs[:, :, :n, :]
    return hs


def _apply_head_xla(ctr, head, compute_dtype):
    """XLA fallback for the fused head (same [out, in] weight layout)."""
    wp, bp, wd, bd, wh, bh = head

    def lin(w, b_, x_):
        y = jax.lax.dot_general(
            w.astype(compute_dtype), x_.astype(compute_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y + b_.astype(jnp.float32)

    xt = jnp.transpose(ctr, (1, 0))                      # [2H, N]
    feat = lin(wp, bp, xt)
    feat = jnp.tanh(lin(wd, bd, feat))
    return jnp.transpose(lin(wh, bh, feat), (1, 0))      # [N, Hout]


def bilstm_encoder_pallas(
    layers,
    x: jnp.ndarray,          # [N, L, D]
    *,
    compute_dtype=jnp.bfloat16,
    block_n: int = 512,
    interpret: bool = False,
    center_only: bool = False,
    fused: bool = True,
    head=None,
):
    """Full multi-layer BiLSTM encoder on the Pallas recurrence, staying in
    batch-last [L, feat, N] layout across layers: no reversal or transpose
    copies of the big activations (the kernel walks direction 1 backwards
    itself), inter-layer activations in bf16.

    With fused=True (default) each layer runs the fused in-projection
    kernel: the HBM stream is the D-wide layer input instead of the 4H-wide
    precomputed projections, inter-layer outputs stream in bf16, and under
    center_only the last layer emits only the window-center hidden state —
    together ~5x less recurrence HBM traffic for the pileup model, which is
    what bounds it (v5e measurement in ROADMAP #8). fused=False keeps the
    original XLA-projection + streaming-xp path for A/B.

    Returns [N, L, 2H] float32, or [N, 2H] when center_only.
    """
    n, seq_len, _ = x.shape
    block_n = _pick_block(n, block_n)
    pad = (-n) % block_n
    x_t = jnp.transpose(x, (1, 2, 0)).astype(compute_dtype)  # [L, D, N]
    if pad:
        x_t = jnp.pad(x_t, ((0, 0), (0, 0), (0, pad)))

    hs = None
    n_layers = len(layers)

    # two-layer whole-encoder fusion (r5): the pileup geometry — layer 1
    # K-fusable, layer 2 same hidden width, odd L, center-only decode —
    # runs both layers in one kernel with the inter-layer activations in
    # a VMEM slab. NSP_FUSE_LAYERS=0 restores the per-layer kernels.
    if fused and center_only and n_layers == 2 and seq_len % 2 == 1:
        import os as _os

        l1, l2 = layers
        g1 = l1["w_ih"].shape[-1]
        h1 = g1 // 4
        g2 = l2["w_ih"].shape[-1]
        d_in = x_t.shape[1]
        d1_pad = -(-d_in // 16) * 16
        eligible = (g2 == g1 and l2["w_ih"].shape[1] == 2 * h1
                    and d1_pad + h1 <= 128 and h1 % 16 == 0
                    and (seq_len * 2 * h1 * block_n
                         * jnp.dtype(compute_dtype).itemsize) <= (8 << 20)
                    and _os.environ.get("NSP_FUSE_LAYERS", "0") == "1")
        if eligible:
            wih1_t = jnp.transpose(l1["w_ih"], (0, 2, 1)).astype(
                compute_dtype)                               # [2, 4H, D]
            if d1_pad != d_in:
                x_t = jnp.pad(x_t, ((0, 0), (0, d1_pad - d_in), (0, 0)))
                wih1_t = jnp.pad(wih1_t,
                                 ((0, 0), (0, 0), (0, d1_pad - d_in)))
            w1_t = jnp.transpose(l1["w_hh"], (0, 2, 1)).astype(
                compute_dtype)
            wcat1_t = jnp.concatenate([wih1_t, w1_t], axis=2)
            b1 = l1["b"].astype(jnp.float32)[:, :, None]
            wih2_t = jnp.transpose(l2["w_ih"], (0, 2, 1)).astype(
                compute_dtype)                               # [2, 4H, 2H]
            w2_t = jnp.transpose(l2["w_hh"], (0, 2, 1)).astype(
                compute_dtype)
            b2 = l2["b"].astype(jnp.float32)[:, :, None]
            ctr = _run_enc2_center(
                x_t, wcat1_t, b1, wih2_t, w2_t, b2, seq_len=seq_len,
                hidden=h1, gate_dim=g1, block_n=block_n,
                interpret=interpret)
            ctr = jnp.transpose(ctr.reshape(2 * h1, -1), (1, 0))
            ctr = ctr[:n] if pad else ctr
            if head is not None:
                return _apply_head_xla(ctr, head, compute_dtype)
            return ctr
    for idx, layer in enumerate(layers):
        gate_dim = layer["w_ih"].shape[-1]
        hidden = gate_dim // 4
        w_t = jnp.transpose(layer["w_hh"], (0, 2, 1)).astype(compute_dtype)
        last = idx == n_layers - 1

        if fused:
            d_in = x_t.shape[1]
            d_pad = -(-d_in // 16) * 16       # bf16 sublane tile is 16
            wih_t = jnp.transpose(layer["w_ih"], (0, 2, 1)).astype(
                compute_dtype)                # [2, 4H, D]
            if d_pad != d_in:
                x_t = jnp.pad(x_t, ((0, 0), (0, d_pad - d_in), (0, 0)))
                wih_t = jnp.pad(wih_t, ((0, 0), (0, 0), (0, d_pad - d_in)))
            b = layer["b"].astype(jnp.float32)[:, :, None]   # [2, 4H, 1]
            # K-fusion: when the in-projection and hidden contraction fit
            # one 128-deep MXU tile, run them as a single dot (see
            # _enc_kfused_body) — 2x fewer MXU passes for narrow-D layers
            d_pad = x_t.shape[1]
            kfuse = (d_pad + hidden <= 128 and d_pad % 16 == 0
                     and hidden % 16 == 0)
            if kfuse:
                wcat_t = jnp.concatenate(
                    [wih_t, w_t.astype(wih_t.dtype)], axis=2)
            if last and center_only and seq_len % 2 == 1:
                if head is not None and not kfuse:
                    # fused ForwardLayer head (VERDICT r3 #7): logits come
                    # straight out of the recurrence kernel
                    logits = _run_enc_center_head(
                        x_t, wih_t, w_t, b,
                        tuple(a.astype(compute_dtype) if j % 2 == 0
                              else a.astype(jnp.float32)
                              for j, a in enumerate(head)),
                        seq_len=seq_len, hidden=hidden, gate_dim=gate_dim,
                        block_n=block_n, interpret=interpret)
                    logits = jnp.transpose(logits, (1, 0))   # [Npad, Hout]
                    return logits[:n] if pad else logits
                if kfuse:
                    ctr = _run_enc_center_kfused(
                        x_t, wcat_t, b, seq_len=seq_len, hidden=hidden,
                        gate_dim=gate_dim, block_n=block_n,
                        interpret=interpret)
                else:
                    ctr = _run_enc_center(
                        x_t, wih_t, w_t, b, seq_len=seq_len, hidden=hidden,
                        gate_dim=gate_dim, block_n=block_n,
                        interpret=interpret)
                ctr = jnp.transpose(ctr.reshape(2 * hidden, -1), (1, 0))
                ctr = ctr[:n] if pad else ctr
                if head is not None:   # kernel path not taken: XLA head
                    return _apply_head_xla(ctr, head, compute_dtype)
                return ctr
            if kfuse:
                hs = _run_enc_stream_kfused(
                    x_t, wcat_t, b, seq_len=seq_len, hidden=hidden,
                    gate_dim=gate_dim, block_n=block_n, interpret=interpret,
                    out_dtype=jnp.float32 if last else compute_dtype)
            else:
                hs = _run_enc_stream(
                    x_t, wih_t, w_t, b, seq_len=seq_len, hidden=hidden,
                    gate_dim=gate_dim, block_n=block_n, interpret=interpret,
                    out_dtype=jnp.float32 if last else compute_dtype)
        else:
            w_ih = layer["w_ih"].astype(compute_dtype)   # [2, D, 4H]
            b = layer["b"].astype(jnp.float32)
            # one MXU matmul for all timesteps, emitted directly batch-last
            xp_t = jnp.einsum("ldn,zdk->lzkn", x_t, w_ih,
                              preferred_element_type=jnp.float32)
            xp_t = (xp_t + b[None, :, :, None]).astype(compute_dtype)
            hs = _run_recurrence(xp_t, w_t, seq_len=seq_len, hidden=hidden,
                                 gate_dim=gate_dim, block_n=block_n,
                                 reverse_dir1=True, interpret=interpret,
                                 out_dtype=jnp.float32)  # [L, 2, H, N]
        x_t = hs.reshape(seq_len, 2 * hidden, -1).astype(compute_dtype)

    hidden = hs.shape[2]
    if center_only:
        ctr = hs[seq_len // 2].reshape(2 * hidden, -1)   # [2H, Npad]
        ctr = jnp.transpose(ctr, (1, 0))
        ctr = ctr[:n] if pad else ctr
        if head is not None:
            return _apply_head_xla(ctr, head, compute_dtype)
        return ctr
    full = jnp.transpose(hs, (3, 0, 1, 2)).reshape(-1, seq_len, 2 * hidden)
    return full[:n] if pad else full
