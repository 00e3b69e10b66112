"""Pileup-stage caller: 2-layer BiLSTM(h=64) -> proj(128) -> dense(256) -> 4 heads.

Architecture parity with the reference LSTMNetwork (PileupModel/model.py:85-119,
config/ont_pileup.yaml): input [N, 33, 18]; heads gt(21), zy(3), indel1(33),
indel2(33). Inference-path optimization: the reference applies output_proj and
the dense layer to every timestep and then slices the center (model.py:37,68);
both are pointwise-linear over time, so we slice the center first and apply
them once — bitwise-equal math, 33x less head FLOPs.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import PileupModelConfig
from .bilstm import bilstm_encoder, init_bilstm_params, init_linear_params, linear

Params = Dict[str, Any]


def init_pileup_params(rng: jax.Array, cfg: PileupModelConfig) -> Params:
    rngs = jax.random.split(rng, 7)
    return {
        "encoder": init_bilstm_params(rngs[0], cfg.feature_dim, cfg.hidden_size, cfg.n_layers),
        "proj": init_linear_params(rngs[1], 2 * cfg.hidden_size, cfg.output_size),
        "dense": init_linear_params(rngs[2], cfg.output_size, cfg.inner_size),
        "gt": init_linear_params(rngs[3], cfg.inner_size, cfg.gt_num_class),
        "zy": init_linear_params(rngs[4], cfg.inner_size, cfg.zy_num_class),
        "id1": init_linear_params(rngs[5], cfg.inner_size, cfg.indel1_num_class),
        "id2": init_linear_params(rngs[6], cfg.inner_size, cfg.indel2_num_class),
    }


def pileup_forward(
    params: Params,
    x: jnp.ndarray,
    cfg: PileupModelConfig,
    *,
    dropout_rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    all_heads: bool = True,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
):
    """x: [N, 33, 18] float. Returns (gt, zy, id1, id2) logits (id* None if
    all_heads=False)."""
    center = cfg.seq_len // 2
    import os as _os
    # Head-in-kernel fusion is a MEASURED NEGATIVE on v5e (r4 A/B,
    # same-condition medians: XLA head 6.99M sites/s vs fused 6.76M):
    # the three small head matmuls serialize per block inside the Pallas
    # program, while the XLA head runs once, batched over the full
    # [N, 2H] center slice, and overlaps adjacent kernels. Kept behind
    # NSP_FUSE_HEAD=1 for re-evaluation on other TPU generations;
    # docs/ROOFLINE.md "measured negatives" has the numbers.
    fuse_head = _os.environ.get("NSP_FUSE_HEAD", "0") == "1"
    if use_pallas and dropout_rng is None and fuse_head:
        from ..ops.pallas_lstm import bilstm_encoder_pallas

        # ForwardLayer head fused into the center recurrence kernel: all
        # four heads concatenate into one [Hout, inner] matmul, rows
        # padded to the f32 sublane tile (8); logits come straight out of
        # the Pallas program (VERDICT r3 #7)
        names = ["gt", "zy"] + (["id1", "id2"] if all_heads else [])
        wh = jnp.concatenate([params[k]["w"].T for k in names], axis=0)
        bh = jnp.concatenate([params[k]["b"] for k in names])[:, None]
        rows = wh.shape[0]
        rpad = (-rows) % 8
        if rpad:
            wh = jnp.pad(wh, ((0, rpad), (0, 0)))
            bh = jnp.pad(bh, ((0, rpad), (0, 0)))
        head = (params["proj"]["w"].T, params["proj"]["b"][:, None],
                params["dense"]["w"].T, params["dense"]["b"][:, None],
                wh, bh)
        logits = bilstm_encoder_pallas(
            params["encoder"], x, center_only=True, head=head,
            interpret=pallas_interpret)                  # [N, rows+rpad]
        sizes = {"gt": cfg.gt_num_class, "zy": cfg.zy_num_class,
                 "id1": cfg.indel1_num_class, "id2": cfg.indel2_num_class}
        outs = []
        off = 0
        for k in names:
            outs.append(logits[:, off: off + sizes[k]])
            off += sizes[k]
        if all_heads:
            return tuple(outs)
        return outs[0], outs[1], None, None
    elif use_pallas and dropout_rng is None:
        # NSP_FUSE_HEAD=0 A/B path: center-only Pallas encoder + XLA head
        # (the r3 layout)
        from ..ops.pallas_lstm import bilstm_encoder_pallas

        ctr = bilstm_encoder_pallas(params["encoder"], x, center_only=True,
                                    interpret=pallas_interpret)  # [N, 2H]
    else:
        # training path: the per-layer Pallas recurrence is differentiable
        # (custom VJP), dropout stays in XLA between layers
        enc = bilstm_encoder(
            params["encoder"], x,
            dropout=cfg.dropout, dropout_rng=dropout_rng,
            compute_dtype=compute_dtype, use_pallas=use_pallas,
            pallas_interpret=pallas_interpret,
        )                                                # [N, L, 2H]
        ctr = enc[:, center, :]                          # [N, 2H]
    feat = linear(params["proj"], ctr, compute_dtype)    # [N, 128]
    feat = jnp.tanh(linear(params["dense"], feat, compute_dtype))  # [N, 256]
    gt = linear(params["gt"], feat, compute_dtype)
    zy = linear(params["zy"], feat, compute_dtype)
    if all_heads:
        id1 = linear(params["id1"], feat, compute_dtype)
        id2 = linear(params["id2"], feat, compute_dtype)
        return gt, zy, id1, id2
    return gt, zy, None, None


def pileup_predict(params: Params, x: jnp.ndarray, cfg: PileupModelConfig,
                   compute_dtype=jnp.float32, use_pallas: bool = False):
    """Inference: softmaxed gt/zy probabilities, matching reference
    model.predict (PileupModel/model.py:114-119)."""
    gt, zy, _, _ = pileup_forward(params, x, cfg, compute_dtype=compute_dtype,
                                  all_heads=False, use_pallas=use_pallas)
    return jax.nn.softmax(gt, axis=-1), jax.nn.softmax(zy, axis=-1)


@dataclass
class PileupModel:
    """Convenience bundle of params + config with jitted predict."""
    params: Params
    cfg: PileupModelConfig

    def predict_fn(self, compute_dtype=jnp.float32):
        cfg = self.cfg

        @jax.jit
        def fn(params, x):
            return pileup_predict(params, x, cfg, compute_dtype=compute_dtype)

        return fn
