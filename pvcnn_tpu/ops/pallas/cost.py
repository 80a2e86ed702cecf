"""Trace-time analytic cost accounting for the Pallas kernels.

XLA's `compiled.cost_analysis()` counts ZERO FLOPs (and bytes) for every
Pallas custom call — and the headline step's biggest matmuls (the flat-rows
conv3d, the one-hot scatter/gather formulations) ARE Pallas kernels, so the
cost-analysis MFU alone is meaningless. This module closes that hole without
touching the kernels' runtime: every public kernel WRAPPER (the plain-Python
functions around the jitted `pl.pallas_call`s) reports a closed-form
FLOP/byte estimate via `record(...)` as it traces. Wrappers run exactly once
per call site per trace (they are ordinary Python above any inner `jax.jit`
cache), so lowering a train step under `recording()` yields the step's total
Pallas work:

    with cost.recording() as rec:
        lowered = jitted_step.lower(args)
    total_flops = xla_cost["flops"] + rec["flops"]

FLOP counts are the MXU work the kernel actually issues (2 * MAC of each
`dot_general`, including one-hot masks and padding lanes) — an *executed*
FLOP count, not the semantic op count — so `mfu_pct_analytic` is honest
hardware utilization. Byte counts are HBM-side block traffic: each
`pl.BlockSpec` input counted once per grid step that fetches a distinct
block, outputs once (+once per read-modify-write revisit). Both are
estimates good to the ~few-% level (they ignore scalar prefetch and
semaphores), which is plenty for a roofline.

No reference analog: the reference (mit-han-lab/pvcnn) has no cost model at
all; this exists so BENCH_r{N}.json's roofline reflects the Pallas convs.
"""

from __future__ import annotations

import contextlib
import threading

__all__ = ["record", "recording"]

_state = threading.local()


def record(name: str, flops: float = 0.0, bytes_accessed: float = 0.0):
    """Accumulate one kernel invocation's analytic cost (no-op unless a
    `recording()` context is active on this thread)."""
    rec = getattr(_state, "rec", None)
    if rec is None:
        return
    rec["flops"] += float(flops)
    rec["bytes"] += float(bytes_accessed)
    per = rec["by_kernel"].setdefault(
        name, {"flops": 0.0, "bytes": 0.0, "calls": 0})
    per["flops"] += float(flops)
    per["bytes"] += float(bytes_accessed)
    per["calls"] += 1


@contextlib.contextmanager
def recording():
    """Collect kernel costs recorded while tracing under this context.

    Yields the mutable dict {"flops", "bytes", "by_kernel"}; nesting is not
    supported (the inner context temporarily replaces the outer one)."""
    prev = getattr(_state, "rec", None)
    rec = {"flops": 0.0, "bytes": 0.0, "by_kernel": {}}
    _state.rec = rec
    try:
        yield rec
    finally:
        _state.rec = prev
