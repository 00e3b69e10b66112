"""Haplotype-stage caller: two independent 3-layer BiLSTM(h=256) branches over
the 33-long pileup features and the 11-long haplotype features, center-concat,
dense, gt(10)/zy(3) heads.

Architecture parity with reference HaplotypeModel/model_dev.py:108-143 and
config/ont_haplotype.yaml. Native input layout here is feature-last
[N, L, 105] (the reference stores [N, 105, L] and permutes inside forward —
model_dev.py:124-126); our featurizer emits feature-last directly.
Center-first slicing optimization as in pileup_model.py (pointwise-linear
equivalence).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import HaplotypeModelConfig
from .bilstm import bilstm_encoder, init_bilstm_params, init_linear_params, linear

Params = Dict[str, Any]


def init_haplotype_params(rng: jax.Array, cfg: HaplotypeModelConfig) -> Params:
    rngs = jax.random.split(rng, 7)
    h = cfg.hidden_size
    return {
        "pileup_encoder": init_bilstm_params(rngs[0], cfg.pileup_dim, h, cfg.lstm_layers),
        "pileup_proj": init_linear_params(rngs[1], 2 * h, h),
        "haplotype_encoder": init_bilstm_params(rngs[2], cfg.haplotype_dim, h, cfg.lstm_layers),
        "haplotype_proj": init_linear_params(rngs[3], 2 * h, h),
        "dense": init_linear_params(rngs[4], 2 * h, h),
        "gt": init_linear_params(rngs[5], h, cfg.gt_num_class),
        "zy": init_linear_params(rngs[6], h, cfg.zy_num_class),
    }


def haplotype_forward(
    params: Params,
    pileup_x: jnp.ndarray,     # [N, 33, 105]
    haplotype_x: jnp.ndarray,  # [N, 11, 105]
    cfg: HaplotypeModelConfig,
    *,
    dropout_rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
):
    rng_p = rng_h = None
    if dropout_rng is not None:
        rng_p, rng_h = jax.random.split(dropout_rng)
    if use_pallas and dropout_rng is None:
        from ..ops.pallas_lstm import bilstm_encoder_pallas

        ctr_p_enc = bilstm_encoder_pallas(params["pileup_encoder"], pileup_x,
                                          center_only=True,
                                          interpret=pallas_interpret)
        ctr_h_enc = bilstm_encoder_pallas(params["haplotype_encoder"],
                                          haplotype_x, center_only=True,
                                          interpret=pallas_interpret)
    else:
        enc_p = bilstm_encoder(params["pileup_encoder"], pileup_x,
                               dropout=cfg.dropout, dropout_rng=rng_p,
                               compute_dtype=compute_dtype,
                               use_pallas=use_pallas,
                               pallas_interpret=pallas_interpret)
        enc_h = bilstm_encoder(params["haplotype_encoder"], haplotype_x,
                               dropout=cfg.dropout, dropout_rng=rng_h,
                               compute_dtype=compute_dtype,
                               use_pallas=use_pallas,
                               pallas_interpret=pallas_interpret)
        ctr_p_enc = enc_p[:, cfg.pileup_length // 2, :]
        ctr_h_enc = enc_h[:, cfg.haplotype_length // 2, :]
    ctr_p = linear(params["pileup_proj"], ctr_p_enc, compute_dtype)
    ctr_h = linear(params["haplotype_proj"], ctr_h_enc, compute_dtype)
    feat = jnp.concatenate([ctr_p, ctr_h], axis=-1)            # [N, 512]
    feat = jnp.tanh(linear(params["dense"], feat, compute_dtype))  # [N, 256]
    gt = linear(params["gt"], feat, compute_dtype)
    zy = linear(params["zy"], feat, compute_dtype)
    return gt, zy


def haplotype_predict(params: Params, pileup_x, haplotype_x, cfg: HaplotypeModelConfig,
                      compute_dtype=jnp.float32, use_pallas: bool = False):
    gt, zy = haplotype_forward(params, pileup_x, haplotype_x, cfg,
                               compute_dtype=compute_dtype,
                               use_pallas=use_pallas)
    return jax.nn.softmax(gt, axis=-1), jax.nn.softmax(zy, axis=-1)


@dataclass
class HaplotypeModel:
    params: Params
    cfg: HaplotypeModelConfig

    def predict_fn(self, compute_dtype=jnp.float32):
        cfg = self.cfg

        @jax.jit
        def fn(params, pileup_x, haplotype_x):
            return haplotype_predict(params, pileup_x, haplotype_x, cfg,
                                     compute_dtype=compute_dtype)

        return fn
