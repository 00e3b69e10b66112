"""Batched, mesh-sharded inference runner.

Static-shape discipline for XLA: every device step sees exactly
[batch_size, ...]; the tail is padded and the pad mask applied host-side.
Batches shard over the mesh's data axis; params are replicated once. With a
single device this degrades to plain jit with zero overhead.
"""
from __future__ import annotations

from typing import Callable, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import make_mesh, pad_to_multiple, replicated, shard_batch


class BatchedPredictor:
    """Wraps a jitted predict fn `(params, *arrays) -> outputs` with
    padding, sharded placement, and tail handling."""

    def __init__(
        self,
        predict_fn: Callable,
        params,
        batch_size: int = 8192,
        mesh: Optional[jax.sharding.Mesh] = None,
        max_in_flight: int = 2,
    ):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.batch_size = batch_size
        self.max_in_flight = max(max_in_flight, 1)
        n_dev = len(self.mesh.devices.reshape(-1))
        if batch_size % n_dev:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"{n_dev} devices")
        self.data_sharding = shard_batch(self.mesh)
        self.param_sharding = replicated(self.mesh)
        self.params = jax.device_put(params, self.param_sharding)
        # shardings are inferred from operand placement
        self._fn = jax.jit(predict_fn)

    def update_params(self, params) -> None:
        """Swap the weights without invalidating the compiled program
        (shapes/dtypes must match the originals)."""
        self.params = jax.device_put(params, self.param_sharding)

    def apply(self, *arrays):
        """One exactly-batch-sized step, returning the raw device outputs
        WITHOUT fetching to host. For caller-managed pipelines that chain
        device programs (e.g. s5 featurize -> model) where fetching the
        intermediate would round-trip the relay link."""
        chunks = [jax.device_put(jnp.asarray(a), self.data_sharding)
                  for a in arrays]
        res = self._fn(self.params, *chunks)
        return res if isinstance(res, (tuple, list)) else (res,)

    def run(self, *arrays: np.ndarray,
            fetch_stride: int = 8) -> List[np.ndarray]:
        """arrays: host arrays with common leading dim N. Returns outputs
        with the padding stripped, concatenated over all batches.

        Dispatch runs ahead of the fetches (JAX arrays are async futures);
        results accumulate ON DEVICE and are fetched once per
        `fetch_stride` batches via an on-device concatenation: each host
        fetch is a full device round-trip, and through a relay-tunneled
        chip a round-trip costs seconds — per-batch fetches made the s2/s5
        stages RTT-bound (measured on the 100 Mbp world). The stride
        bounds in-flight device buffers so large N cannot exhaust HBM."""
        n = arrays[0].shape[0]
        bs = self.batch_size
        stride = max(int(fetch_stride), 1)
        group: List = []          # [(m, res_tuple)] awaiting device concat
        pending: List = []        # [(valid_rows, concat_res)] awaiting fetch
        outs: List[List[np.ndarray]] = []

        def flush_group():
            if not group:
                return
            valid = sum(m for m, _ in group)
            k = len(group[0][1])
            if len(group) == 1:
                cat = group[0][1]
            else:
                cat = tuple(jnp.concatenate([g[1][i] for g in group])
                            for i in range(k))
            # only the final batch of a group may be padded, so the
            # concatenation's first `valid` rows are exactly the real ones
            pending.append((valid, cat))
            group.clear()

        def drain_one():
            m, res = pending.pop(0)
            outs.append([np.asarray(r)[:m] for r in res])

        for start in range(0, n, bs):
            chunk = [a[start: start + bs] for a in arrays]
            m = chunk[0].shape[0]
            if m < bs:
                chunk = [pad_to_multiple(a, bs)[0] for a in chunk]
            device_chunk = [
                jax.device_put(jnp.asarray(a), self.data_sharding)
                for a in chunk
            ]
            res = self._fn(self.params, *device_chunk)
            if not isinstance(res, (tuple, list)):
                res = (res,)
            if m < bs:        # padded tail must close its group
                group.append((m, tuple(res)))
                flush_group()
            else:
                group.append((m, tuple(res)))
                if len(group) >= stride:
                    flush_group()
            while len(pending) > self.max_in_flight:
                drain_one()
        flush_group()
        while pending:
            drain_one()
        if not outs:
            return []
        return [np.concatenate([o[i] for o in outs]) for i in range(len(outs[0]))]
