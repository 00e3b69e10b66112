"""CatModel — the legacy cat/edge model family in JAX.

Behavioral contract mirrors the *active* branches of the reference
CatModel (HaplotypeModel/model.py:201-360; most of that class is
commented-out history):

  - percentage branch: per-HP-tag {A,C,G,T,D} fractions over depth at the
    11 group sites for both views (g0 surrounding, g1 adjacent-het),
    concatenated to [11, N, 20], through a 3-layer BiLSTM (h=256,
    inter-layer dropout 0.5) + Linear(512->256), center timestep taken
    (model.py:126-134 RNN, :263-281);
  - spatial branch: the 5-channel (base, baseq, mapq, mask, phase)
    stacked-tag images [N, 10, 40, 11] through ResCRNN — six 3x3 ResBlocks
    with BatchNorm and 1x1-conv shortcuts interleaved with max-pools that
    collapse depth 40 -> 1, then two BidirectionalLSTM(256->256->256)
    layers over the 11 positions, center taken (crnn.py:95-190,
    model.py:208,300);
  - head: Linear(512 -> gt classes) over the concatenated branch outputs
    (model.py:234,305); predict applies softmax (model.py:337-360).

TPU-first: convs via lax.conv_general_dilated in NCHW/OIHW (weights load
from torch layout untransposed), recurrences reuse the shared fused-gate
BiLSTM stack (models/bilstm.py — the same Pallas-ready machinery as the
production models), BatchNorm is functional with explicit running stats.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.bilstm import (bilstm_encoder, init_bilstm_params,
                             init_linear_params, linear)

Params = Dict[str, Any]

# ResCRNN conv plan: (c_in, c_out) per block, pool after block index ->
# (kernel, stride) on the (depth, width) axes (crnn.py:158-176)
_BLOCKS = [(None, 32), (32, 64), (64, 128), (128, 128), (128, 256),
           (256, 256)]
_POOLS = {0: ((2, 3), (2, 1)), 1: ((2, 3), (2, 1)), 3: ((3, 3), (3, 1)),
          5: ((2, 3), (2, 1))}


def calculate_percentage(ts: jnp.ndarray) -> jnp.ndarray:
    """[L, N, D] base codes -> [L, N, 5] fractions of A,C,G,T,D over
    non-pad cells (model.py:192-198; pad is -2, absent cells count in the
    denominator exactly as in the reference)."""
    denom = (ts != -2).sum(axis=2) + 1e-9
    chans = [(ts == c).sum(axis=2) / denom for c in (1, 2, 3, 4, -1)]
    return jnp.stack(chans, axis=2).astype(jnp.float32)


def _init_conv(rng, c_in, c_out, kh, kw, dtype=jnp.float32):
    k = 1.0 / np.sqrt(c_in * kh * kw)
    return jax.random.uniform(rng, (c_out, c_in, kh, kw), dtype, -k, k)


def _init_bn(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32),
            "mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32)}


def _init_resblock(rng, c_in, c_out):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "conv1": _init_conv(k1, c_in, c_out, 3, 3),
        "bn1": _init_bn(c_out),
        "conv2": _init_conv(k2, c_out, c_out, 3, 3),
        "bn2": _init_bn(c_out),
        "shortcut": _init_conv(k3, c_in, c_out, 1, 1),
    }


def init_catmodel_params(rng: jax.Array, gt_classes: int = 10,
                         in_channels: int = 10) -> Params:
    keys = jax.random.split(rng, 12)
    blocks = []
    for i, (c_in, c_out) in enumerate(_BLOCKS):
        blocks.append(_init_resblock(keys[i],
                                     in_channels if c_in is None else c_in,
                                     c_out))
    return {
        "percentage_rnn": init_bilstm_params(keys[6], 20, 256, 3),
        "percentage_proj": init_linear_params(keys[7], 512, 256),
        "res_blocks": blocks,
        "crnn_lstm1": init_bilstm_params(keys[8], 256, 256, 1),
        "crnn_proj1": init_linear_params(keys[9], 512, 256),
        "crnn_lstm2": init_bilstm_params(keys[10], 256, 256, 1),
        "crnn_proj2": init_linear_params(keys[11], 512, 256),
        "out": init_linear_params(keys[5], 512, gt_classes),
    }


def _batchnorm(x, bn, train: bool, momentum: float = 0.1):
    """x [N, C, H, W]; returns (y, updated_bn)."""
    if train:
        mean = x.mean(axis=(0, 2, 3))
        var = x.var(axis=(0, 2, 3))
        new_bn = {**bn,
                  "mean": (1 - momentum) * bn["mean"] + momentum * mean,
                  "var": (1 - momentum) * bn["var"] + momentum * var}
    else:
        mean, var, new_bn = bn["mean"], bn["var"], bn
    inv = jax.lax.rsqrt(var + 1e-5)
    y = (x - mean[None, :, None, None]) * inv[None, :, None, None]
    return y * bn["scale"][None, :, None, None] + bn["bias"][None, :, None, None], new_bn


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=[(w.shape[2] // 2, w.shape[2] // 2),
                 (w.shape[3] // 2, w.shape[3] // 2)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _maxpool(x, kernel, stride):
    (kh, kw), (sh, sw) = kernel, stride
    ph, pw = 0, kw // 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, kh, kw), (1, 1, sh, sw),
        [(0, 0), (0, 0), (ph, ph), (pw, pw)])


def _resblock(x, p, train):
    y, bn1 = _batchnorm(_conv(x, p["conv1"]), p["bn1"], train)
    y = jax.nn.relu(y)
    y, bn2 = _batchnorm(_conv(y, p["conv2"]), p["bn2"], train)
    y = y + jax.lax.conv_general_dilated(
        x, p["shortcut"], (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return jax.nn.relu(y), {**p, "bn1": bn1, "bn2": bn2}


def _bilstm_proj(layers, proj, x_lnc, compute_dtype, dropout=0.0, rng=None,
                 use_pallas=False, pallas_interpret=False):
    """crnn.BidirectionalLSTM / model.RNN: x [L, N, C] -> [L, N, out]."""
    x = jnp.transpose(x_lnc, (1, 0, 2))                      # [N, L, C]
    enc = bilstm_encoder(layers, x, dropout=dropout, dropout_rng=rng,
                         compute_dtype=compute_dtype,
                         use_pallas=use_pallas and rng is None,
                         pallas_interpret=pallas_interpret)
    out = linear(proj, enc, compute_dtype)                   # [N, L, out]
    return jnp.transpose(out, (1, 0, 2))


def catmodel_forward(
    params: Params,
    g0: jnp.ndarray,     # [N, 2*md, 11, 5] surrounding stacked-tag image
    g1: jnp.ndarray,     # [N, 2*md, 11, 5] adjacent-het stacked-tag image
    *,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> Tuple[jnp.ndarray, Params]:
    """Returns (gt logits [N, classes], params-with-updated-BN-stats).
    use_pallas switches the three BiLSTM stacks to the fused TPU kernels
    (inference only — the scan path serves training)."""
    md = g0.shape[1] // 2

    # ---- percentage branch (model.py:263-281)
    g0_p = jnp.transpose(g0, (2, 0, 1, 3))                   # [11, N, 2md, 5]
    g1_p = jnp.transpose(g1, (2, 0, 1, 3))
    pct = jnp.concatenate([
        calculate_percentage(g0_p[:, :, :md, 0]),
        calculate_percentage(g0_p[:, :, md:, 0]),
        calculate_percentage(g1_p[:, :, :md, 0]),
        calculate_percentage(g1_p[:, :, md:, 0]),
    ], axis=2)                                               # [11, N, 20]
    rng_p = rng_c = None
    if dropout_rng is not None:
        rng_p, rng_c = jax.random.split(dropout_rng)
    p_out = _bilstm_proj(params["percentage_rnn"], params["percentage_proj"],
                         pct, compute_dtype,
                         dropout=0.5 if train else 0.0, rng=rng_p,
                         use_pallas=use_pallas,
                         pallas_interpret=pallas_interpret)
    p_ctr = p_out[p_out.shape[0] // 2]                       # [N, 256]

    # ---- spatial ResCRNN branch (model.py:300, crnn.py:95-190)
    x = jnp.concatenate([jnp.transpose(g0, (0, 3, 1, 2)),
                         jnp.transpose(g1, (0, 3, 1, 2))],
                        axis=1).astype(jnp.float32)          # [N, 10, 2md, 11]
    new_blocks = []
    for i, bp in enumerate(params["res_blocks"]):
        x, nbp = _resblock(x, bp, train)
        new_blocks.append(nbp)
        if i in _POOLS:
            x = _maxpool(x, *_POOLS[i])
    # x: [N, 256, 1, 11]
    if x.shape[2] != 1:
        raise ValueError(f"ResCRNN collapsed depth to {x.shape[2]} != 1 "
                         f"(input depth must be 2*20 rows)")
    seq = jnp.transpose(x[:, :, 0, :], (2, 0, 1))            # [11, N, 256]
    seq = _bilstm_proj(params["crnn_lstm1"], params["crnn_proj1"], seq,
                       compute_dtype, use_pallas=use_pallas,
                       pallas_interpret=pallas_interpret)
    seq = _bilstm_proj(params["crnn_lstm2"], params["crnn_proj2"], seq,
                       compute_dtype, use_pallas=use_pallas,
                       pallas_interpret=pallas_interpret)
    s_ctr = seq[seq.shape[0] // 2]                           # [N, 256]

    logits = linear(params["out"],
                    jnp.concatenate([p_ctr, s_ctr], axis=1), compute_dtype)
    return logits, {**params, "res_blocks": new_blocks}


def catmodel_predict(params: Params, g0, g1, g2=None, g3=None,
                     compute_dtype=jnp.float32,
                     use_pallas: bool = False) -> jnp.ndarray:
    """Softmax class probabilities; g2/g3 (edge / pair-route tensors) are
    accepted for API parity and unused, exactly like the reference's
    active branch (model.py:239-244 predict ignores them)."""
    logits, _ = catmodel_forward(params, g0, g1, train=False,
                                 compute_dtype=compute_dtype,
                                 use_pallas=use_pallas)
    return jax.nn.softmax(logits, axis=-1)


def build_g_images(tag1: Dict[str, np.ndarray], tag2: Dict[str, np.ndarray],
                   max_depth: int = 20) -> np.ndarray:
    """dataset.py:157-177: stack per-tag (read, baseq, mapq, mask, phase)
    channels into the [N, 2*max_depth, P, 5] image; tag rows truncated to
    max_depth each, missing rows already -2-padded."""
    def half(t, phase):
        read = np.asarray(t["read"])[:, :max_depth, :]
        n, d, p = read.shape
        if d < max_depth:
            pad = np.full((n, max_depth - d, p), -2, read.dtype)
            read = np.concatenate([read, pad], axis=1)
            bq = np.concatenate([np.asarray(t["baseq"])[:, :max_depth], pad],
                                axis=1)
            mq = np.concatenate([np.asarray(t["mapq"])[:, :max_depth], pad],
                                axis=1)
        else:
            bq = np.asarray(t["baseq"])[:, :max_depth]
            mq = np.asarray(t["mapq"])[:, :max_depth]
        mask = (read != -2).astype(read.dtype)
        ph = np.full_like(read, phase)
        return np.stack([read, bq, mq, mask, ph], axis=3)
    return np.concatenate([half(tag1, 1), half(tag2, 2)], axis=1)


# ---------------------------------------------------------------------------
# torch checkpoint interop
# ---------------------------------------------------------------------------

def _lstm_layers_from_torch(sd, prefix: str, n_layers: int) -> List[Params]:
    layers = []
    for l in range(n_layers):
        w_ih, w_hh, b = [], [], []
        for suff in ("", "_reverse"):
            wi = np.asarray(sd[f"{prefix}.weight_ih_l{l}{suff}"])   # [4H, D]
            wh = np.asarray(sd[f"{prefix}.weight_hh_l{l}{suff}"])   # [4H, H]
            bi = np.asarray(sd[f"{prefix}.bias_ih_l{l}{suff}"])
            bh = np.asarray(sd[f"{prefix}.bias_hh_l{l}{suff}"])
            w_ih.append(wi.T)
            w_hh.append(wh.T)
            b.append(bi + bh)
        layers.append({"w_ih": jnp.asarray(np.stack(w_ih)),
                       "w_hh": jnp.asarray(np.stack(w_hh)),
                       "b": jnp.asarray(np.stack(b))})
    return layers


def _linear_from_torch(sd, prefix: str) -> Params:
    return {"w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T),
            "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))}


def _bn_from_torch(sd, prefix: str) -> Params:
    return {"scale": jnp.asarray(np.asarray(sd[f"{prefix}.weight"])),
            "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"])),
            "mean": jnp.asarray(np.asarray(sd[f"{prefix}.running_mean"])),
            "var": jnp.asarray(np.asarray(sd[f"{prefix}.running_var"]))}


def load_catmodel_torch(state_dict) -> Params:
    """Convert a reference CatModel state_dict (model.py:201) to our tree.
    Accepts tensors or numpy arrays as values."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}
    blocks = []
    for i in range(6):
        base = f"haplotype_base.cnn.conv{i}"
        blocks.append({
            "conv1": jnp.asarray(sd[f"{base}.base.conv{i}_base_conv1.weight"]),
            "bn1": _bn_from_torch(sd, f"{base}.base.conv{i}_base_bn1"),
            "conv2": jnp.asarray(sd[f"{base}.base.conv{i}_base_conv2.weight"]),
            "bn2": _bn_from_torch(sd, f"{base}.base.conv{i}_base_bn2"),
            "shortcut": jnp.asarray(
                sd[f"{base}.shortcut.conv{i}_shortcut_conv1.weight"]),
        })
    return {
        "percentage_rnn": _lstm_layers_from_torch(
            sd, "haplotype_percentage.rnn", 3),
        "percentage_proj": _linear_from_torch(
            sd, "haplotype_percentage.out_layer"),
        "res_blocks": blocks,
        "crnn_lstm1": _lstm_layers_from_torch(
            sd, "haplotype_base.rnn.0.rnn", 1),
        "crnn_proj1": _linear_from_torch(sd, "haplotype_base.rnn.0.embedding"),
        "crnn_lstm2": _lstm_layers_from_torch(
            sd, "haplotype_base.rnn.1.rnn", 1),
        "crnn_proj2": _linear_from_torch(sd, "haplotype_base.rnn.1.embedding"),
        "out": _linear_from_torch(sd, "out_layer"),
    }
