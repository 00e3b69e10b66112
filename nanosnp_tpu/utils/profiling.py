"""Profiling/observability helpers.

The reference's tracing story is shell `time` + tqdm counters (SURVEY §5.1);
here: stage wall/throughput metrics flow through runtime/pipeline.py, and
device-level traces come from jax.profiler — enabled per run with
NSP_PROFILE_DIR=/path (viewable in TensorBoard / xprof).
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def maybe_profile(name: str) -> Iterator[None]:
    """jax.profiler trace for this block when NSP_PROFILE_DIR is set."""
    trace_dir = os.environ.get("NSP_PROFILE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, name)):
        yield


class StageTimer:
    """Accumulates named wall-time spans and item counts."""

    def __init__(self):
        self.spans: Dict[str, float] = {}
        self.items: Dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str, items: int = 0):
        t0 = time.monotonic()
        try:
            yield
        finally:
            self.spans[name] = self.spans.get(name, 0.0) + time.monotonic() - t0
            if items:
                self.items[name] = self.items.get(name, 0) + items

    def report(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, sec in self.spans.items():
            entry = {"seconds": round(sec, 3)}
            if name in self.items and sec > 0:
                entry["items_per_s"] = round(self.items[name] / sec, 1)
            out[name] = entry
        return out


def count_parameters(params) -> int:
    """Total parameter count of a pytree (the reference's
    utils.count_parameters analog)."""
    import jax
    import numpy as np

    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)
                   if hasattr(x, "shape")))
