"""Fused-gate bidirectional LSTM stack for TPU.

Design notes (TPU-first, not a torch translation):
  - The input projection for ALL timesteps and BOTH directions is one large
    matmul ([N*L, D] x [D, 2*4H]) that lands on the MXU.
  - The recurrent part runs as a single `lax.scan` over time; each step does
    one batched matmul with a stacked direction axis ([2, N, H] x [2, H, 4H]),
    processing the forward direction at t and the backward direction at L-1-t
    in the same step, so one scan serves both directions.
  - Sequence lengths here are tiny (33 / 11); all parallelism comes from the
    batch dimension, so batches should be thousands of sites.
  - Matmuls can run in bfloat16 (`compute_dtype`); gate math and cell state
    stay float32 for stability/parity.

Behavioral contract mirrors torch.nn.LSTM(batch_first=True, bidirectional=True)
as used by the reference models (PileupModel/model.py:14-51,
HaplotypeModel/model_dev.py:59-84): gate order i,f,g,o; inter-layer dropout
on all but the last layer (training only).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def init_bilstm_params(
    rng: jax.Array,
    input_size: int,
    hidden_size: int,
    n_layers: int,
    dtype=jnp.float32,
) -> List[Params]:
    """Uniform(-1/sqrt(H), 1/sqrt(H)) init, matching torch.nn.LSTM defaults."""
    layers = []
    k = 1.0 / np.sqrt(hidden_size)
    for layer in range(n_layers):
        d_in = input_size if layer == 0 else 2 * hidden_size
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        layers.append(
            {
                # direction-stacked weights; x @ w_ih: [*, d_in] x [d_in, 4H]
                "w_ih": jax.random.uniform(k1, (2, d_in, 4 * hidden_size), dtype, -k, k),
                "w_hh": jax.random.uniform(k2, (2, hidden_size, 4 * hidden_size), dtype, -k, k),
                # b = b_ih + b_hh folded together
                "b": jax.random.uniform(k3, (2, 4 * hidden_size), dtype, -2 * k, 2 * k),
            }
        )
    return layers


def _bilstm_layer(layer: Params, x: jnp.ndarray, compute_dtype,
                  use_pallas: bool = False,
                  pallas_interpret: bool = False) -> jnp.ndarray:
    """One bidirectional LSTM layer. x: [N, L, D] -> [N, L, 2H] (float32)."""
    n, seq_len, _ = x.shape
    hidden = layer["w_hh"].shape[1]

    w_ih = layer["w_ih"].astype(compute_dtype)
    w_hh = layer["w_hh"].astype(compute_dtype)
    b = layer["b"].astype(jnp.float32)

    # [2, N, L, 4H]: one big MXU matmul for every timestep of both directions
    xp = jnp.einsum("nld,zdk->znlk", x.astype(compute_dtype), w_ih,
                    preferred_element_type=jnp.float32)
    xp = xp + b[:, None, None, :]
    # time-major; reverse the backward direction's inputs
    xp = jnp.stack([xp[0].transpose(1, 0, 2), xp[1].transpose(1, 0, 2)[::-1]], axis=1)
    # xp: [L, 2, N, 4H]

    if use_pallas:
        from ..ops.pallas_lstm import bilstm_layer_pallas

        # differentiable (custom-VJP Pallas backward), so this path serves
        # training as well as inference
        hs = bilstm_layer_pallas(xp.astype(jnp.float32), w_hh,
                                 interpret=pallas_interpret)
    else:
        h0 = jnp.zeros((2, n, hidden), jnp.float32)
        c0 = jnp.zeros((2, n, hidden), jnp.float32)

        def step(carry, xt):
            h, c = carry
            # [2, N, H] x [2, H, 4H] -> [2, N, 4H]
            gates = xt + jnp.einsum(
                "znh,zhk->znk", h.astype(compute_dtype), w_hh,
                preferred_element_type=jnp.float32)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        _, hs = jax.lax.scan(step, (h0, c0), xp)
    # hs: [L, 2, N, H]; un-reverse the backward outputs and concat directions
    fwd = hs[:, 0].transpose(1, 0, 2)          # [N, L, H]
    bwd = hs[::-1, 1].transpose(1, 0, 2)       # [N, L, H]
    return jnp.concatenate([fwd, bwd], axis=-1)


def bilstm_encoder(
    layers: List[Params],
    x: jnp.ndarray,
    *,
    dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> jnp.ndarray:
    """Multi-layer BiLSTM. x: [N, L, D] -> [N, L, 2H].

    Dropout applies between layers (not after the last), matching
    torch.nn.LSTM(dropout=...) semantics; active only when a dropout_rng is
    passed (training). use_pallas switches the recurrence to the fused
    Pallas kernel (forward and backward — the kernel carries a custom VJP).
    """
    out = x
    n_layers = len(layers)
    for idx, layer in enumerate(layers):
        out = _bilstm_layer(layer, out, compute_dtype, use_pallas=use_pallas,
                            pallas_interpret=pallas_interpret)
        if dropout > 0.0 and dropout_rng is not None and idx < n_layers - 1:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = 1.0 - dropout
            mask = jax.random.bernoulli(sub, keep, out.shape)
            out = jnp.where(mask, out / keep, 0.0)
    return out


def init_linear_params(rng: jax.Array, d_in: int, d_out: int, dtype=jnp.float32) -> Params:
    k = 1.0 / np.sqrt(d_in)
    k1, k2 = jax.random.split(rng)
    return {
        "w": jax.random.uniform(k1, (d_in, d_out), dtype, -k, k),
        "b": jax.random.uniform(k2, (d_out,), dtype, -k, k),
    }


def linear(p: Params, x: jnp.ndarray, compute_dtype=jnp.float32) -> jnp.ndarray:
    return (
        jnp.dot(x.astype(compute_dtype), p["w"].astype(compute_dtype),
                preferred_element_type=jnp.float32)
        + p["b"].astype(jnp.float32)
    )
