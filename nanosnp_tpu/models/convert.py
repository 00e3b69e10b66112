"""Torch-checkpoint -> JAX param-pytree converters.

The reference ships production pileup weights
(PileupModel/models/ont_pileup.chkpt: dict with 'encoder'/'forward_layer'
state dicts — PileupModel/utils.py:67-77). The haplotype checkpoint is a raw
state_dict (HaplotypeModel/train_dev.py:272-281) but is absent from the
mirror, so it must be retrained (train/train_haplotype.py).

Torch LSTM layout: weight_ih_l{k}[_reverse] is [4H, D] with gate order
i,f,g,o; we store x@W with direction-stacked [2, D, 4H] and fold
b_ih + b_hh into one bias.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    # works for torch tensors and numpy arrays alike without importing torch
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def lstm_layers_from_torch(sd: Mapping[str, Any], prefix: str, n_layers: int):
    layers = []
    for k in range(n_layers):
        dirs_ih, dirs_hh, dirs_b = [], [], []
        for suffix in ("", "_reverse"):
            w_ih = _np(sd[f"{prefix}weight_ih_l{k}{suffix}"])  # [4H, D]
            w_hh = _np(sd[f"{prefix}weight_hh_l{k}{suffix}"])  # [4H, H]
            b = _np(sd[f"{prefix}bias_ih_l{k}{suffix}"]) + _np(sd[f"{prefix}bias_hh_l{k}{suffix}"])
            dirs_ih.append(w_ih.T)      # [D, 4H]
            dirs_hh.append(w_hh.T)      # [H, 4H]
            dirs_b.append(b)
        layers.append(
            {
                "w_ih": np.stack(dirs_ih),
                "w_hh": np.stack(dirs_hh),
                "b": np.stack(dirs_b),
            }
        )
    return layers


def _linear_from_torch(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"w": _np(sd[f"{prefix}.weight"]).T, "b": _np(sd[f"{prefix}.bias"])}


def pileup_params_from_torch(checkpoint: Mapping[str, Any], n_layers: int = 2) -> Dict[str, Any]:
    """Convert the reference pileup checkpoint dict to our param pytree."""
    enc = checkpoint["encoder"]
    fwd = checkpoint["forward_layer"]
    return {
        "encoder": lstm_layers_from_torch(enc, "lstm.", n_layers),
        "proj": _linear_from_torch(enc, "output_proj"),
        "dense": _linear_from_torch(fwd, "dense"),
        "gt": _linear_from_torch(fwd, "genotype_layer"),
        "zy": _linear_from_torch(fwd, "zygosity_layer"),
        "id1": _linear_from_torch(fwd, "indel1_layer"),
        "id2": _linear_from_torch(fwd, "indel2_layer"),
    }


def load_pileup_checkpoint(path: str, n_layers: int = 2) -> Dict[str, Any]:
    import torch

    ck = torch.load(path, map_location="cpu", weights_only=False)
    return pileup_params_from_torch(ck, n_layers)


def haplotype_params_from_torch(sd: Mapping[str, Any], n_layers: int = 3) -> Dict[str, Any]:
    """Convert a reference haplotype state_dict (model_dev.LSTMNetwork) to our
    pytree."""
    return {
        "pileup_encoder": lstm_layers_from_torch(sd, "pileup_encoder.lstm.", n_layers),
        "pileup_proj": _linear_from_torch(sd, "pileup_encoder.output_proj"),
        "haplotype_encoder": lstm_layers_from_torch(sd, "haplotype_encoder.lstm.", n_layers),
        "haplotype_proj": _linear_from_torch(sd, "haplotype_encoder.output_proj"),
        "dense": _linear_from_torch(sd, "forward_layer.dense"),
        "gt": _linear_from_torch(sd, "forward_layer.genotype_layer"),
        "zy": _linear_from_torch(sd, "forward_layer.zygosity_layer"),
    }
