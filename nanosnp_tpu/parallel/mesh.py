"""Device-mesh utilities for data-parallel inference/training.

The genomic workload is embarrassingly data-parallel (SURVEY.md §2.7): the
reference fans processes over chromosomes; here batches of candidate sites
shard over a ("data",) mesh axis via jax.sharding, with XLA inserting any
collectives (psum for metrics/loss) over ICI. Contig-level work distributes
over hosts (DCN) in the runtime layer; chips inside a host see one flat
data axis.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis: str = "data") -> Mesh:
    """Default mesh = this process's local devices. Under multi-host
    (jax.distributed) each host runs an independent inference mesh over its
    own contig shard — batches never cross DCN; only barriers and the final
    file gather do (parallel/launch.py)."""
    devices = list(devices if devices is not None else jax.local_devices())
    return Mesh(np.array(devices), (axis,))


def shard_batch(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for [N, ...] batches: leading dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Pad the leading dim to a multiple (static shapes for jit); returns
    (padded, original_length)."""
    n = x.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return x, n
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, target - n)
    return np.pad(x, pad_width), n
