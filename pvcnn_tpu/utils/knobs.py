"""Central registry for every PVCNN_TPU_* environment knob.

The kernel-selection knobs gate formulation choices whose crossovers were
MEASURED on one v5e chip at specific shapes (docs/KNOBS.md reproduces the
registry as a table with the measurement provenance). Scattered
`os.environ.get` reads let several of them silently accept garbage — e.g.
`PVCNN_TPU_SORTED_MIN_BINS=soon` crashed at trace time with a bare
ValueError deep inside devoxelize. Every knob read now goes through
`knobs.get(...)`, which validates the raw string against the knob's declared
kind and raises a uniform, actionable error naming the variable.

Reads stay CALL-TIME (no import-time caching): the knobs are read while
TRACING a jit, so A/B runs flip them per-process — `tools/step_time.py`
documents that jit caches are NOT keyed on env vars.

No reference analog: the reference (mit-han-lab/pvcnn) selects kernels
statically at compile time; these knobs exist because the TPU formulations
have measured shape-dependent crossovers.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

__all__ = ["KNOBS", "get", "Knob"]


@dataclass(frozen=True)
class Knob:
    name: str            # full env var name
    kind: str            # "bool" | "int" | "choice"
    default: object      # parsed default when the env var is unset
    description: str
    measured: str = ""   # where/how the default's crossover was measured
    choices: Tuple[str, ...] = ()   # for kind == "choice"


def _b(name, default, description, measured=""):
    return Knob(name, "bool", default, description, measured)


def _i(name, default, description, measured=""):
    return Knob(name, "int", default, description, measured)


def _c(name, default, choices, description, measured=""):
    return Knob(name, "choice", default, description, measured,
                tuple(choices))


_ALL = (
    _b("PVCNN_TPU_PALLAS_INTERPRET", False,
       "Run every Pallas kernel in interpret mode (CPU emulation of the "
       "TPU kernels; also makes the TPU-only formulation gates treat the "
       "backend as TPU). Test-only.",
       "tests/test_ops.py opts in per-module"),
    _c("PVCNN_TPU_CONV_ROWS", "auto", ("auto", "0"),
       "Flat-rows Pallas conv3d for the PVConv voxel branch; 0 forces the "
       "XLA NDHWC conv.",
       "headline bf16 B=64: 3.07 -> 4.07 M pts/s (docs/PERFORMANCE.md)"),
    _c("PVCNN_TPU_CONV_BN_FUSED", "auto", ("auto", "0"),
       "Fused conv+BN+LeakyReLU voxel branch on the flat-rows path: convs "
       "emit BN sum/sumsq in the kernel epilogue and apply the previous "
       "BN's folded affine+LeakyReLU as an input prologue; 0 restores the "
       "separate BN/activation elementwise passes.",
       "round-4 cumulative sweep row 27.5 ms in docs/PERFORMANCE.md "
       "(landed batched with the grouped bwd; no isolated A/B recorded)"),
    _b("PVCNN_TPU_AVGVOX_SORTED", False,
       "Sorted-kernel avg_voxelize under the trainer presort "
       "(perf-parked: measured SLOWER than the flat one-hot scatter at "
       "every tried shape; exactness locked by tests).",
       "headline A/B 32.6 vs 32.2 ms (docs/PERFORMANCE.md presort section)"),
    _c("PVCNN_TPU_DENSE_BN_FUSED", "0", ("auto", "0"),
       "Train-mode SharedMLP layers run the fused Pallas Dense + BN-stats "
       "epilogue (ops/pallas/dense_rows.py) where a plan fits. "
       "PERF-PARKED (default 0): the downstream XLA affine+ReLU then "
       "materializes f32 copies of the wide layers (multi-consumer convert "
       "defeats fusion) and the step REGRESSED 26.7 -> 31.3 ms traced; the "
       "kernel is exactness-locked and kept for a future in-kernel 2-pass "
       "apply.",
       "round-5 trace A/B in docs/PERFORMANCE.md dense-BN section"),
    _c("PVCNN_TPU_AVGVOX_BWD_SORTED", "auto", ("auto", "0"),
       "Hybrid avg_voxelize under the presort: flat one-hot scatter forward "
       "+ SORTED corner-gather backward (XLA's plain narrow-C grad row "
       "gather is latency-bound). 0 restores take_rows for the backward.",
       "headline A/B in docs/PERFORMANCE.md round-5 avgvox-bwd section"),
    _c("PVCNN_TPU_DEVOX_FWD_SORTED", "auto", ("auto", "0", "1"),
       "Sorted corner-packed devoxelize forward gather: auto keys on "
       "DEVOX_FWD_MIN_BINS; 1 forces wherever a plan fits; 0 disables.",
       "R=16 in-step crossover: 35.40 -> 34.69 ms (devoxelize.py:293)"),
    _i("PVCNN_TPU_SORTED_MIN_BINS", 16384,
       "Min R^3 for the BACKWARD sorted scatter (below it the sort "
       "machinery's permutation row-gather costs more than the matmul "
       "saving).",
       "R=16 bwd: sorted 38.4 ms vs packed 35.4 (devoxelize.py)"),
    _i("PVCNN_TPU_DEVOX_FWD_MIN_BINS", None,
       "Min R^3 for the FORWARD sorted gather; default 4096, or an "
       "explicitly-set SORTED_MIN_BINS. Lower than the backward's "
       "threshold (no permutation scatter on the way out).",
       "R=16 in-step: 35.40 -> 34.69 ms (devoxelize.py)"),
    _c("PVCNN_TPU_DEVOX_FWD_PACK", "auto", ("auto", "1", "2", "4", "8"),
       "Corner-pack level for the unsorted devox forward gather table "
       "(1 = plain 8N-row gather, 8 = full corner rows, N gather).",
       "4-shape sweep in devoxelize.py::_fwd_pack docstring"),
    _c("PVCNN_TPU_DEVOX_PACK_BUILD", "concat", ("concat", "stack"),
       "How the packed devox table is materialized; concat emits the "
       "gather's preferred row-contiguous layout directly.",
       "stack relayouts 512 MB/1.6 ms at headline R=32 (devoxelize.py:319)"),
    _i("PVCNN_TPU_PRESORTED_BWD_MAX_C", 32,
       "Max channel width for the grouped presorted backward scatter; "
       "above it the gather-free unsorted packed scatter wins. Default 32 "
       "since the nested presort: the R=16 C=32 grouped path no longer "
       "pays re-sort machinery.",
       "headline A/B 29.03 -> 27.91 ms at 32 (round 4, was 16 pre-nested)"),
    _b("PVCNN_TPU_CUSTOM_CONV_WGRAD", False,
       "Custom Pallas/slice weight-grad for the NDHWC conv path "
       "(perf-parked: loses in-step to XLA autodiff at current shapes).",
       "nn/conv3d.py module docstring A/B table"),
    _b("PVCNN_TPU_XLA_CONV_WGRAD_ONLY", False,
       "With CUSTOM_CONV_WGRAD, skip the Pallas wgrad kernel and use the "
       "k^3 shifted-slice contraction fallback only. Test/A-B hook.",
       "test-only hook — no perf default to measure"),
    _b("PVCNN_TPU_DRYRUN_CHILD", False,
       "Internal: set by __graft_entry__._dryrun_subprocess in the child "
       "env so a child whose forced host-device-count still fails raises "
       "instead of re-spawning (unbounded recursion guard). Never set by "
       "hand.",
       "recursion guard — no perf default to measure"),
    _b("PVCNN_TPU_LOADER_FORCE_WORKERS", False,
       "Skip the loader's 1-core worker clamp so pool code paths run on "
       "single-core CI hosts. Test-only.",
       "pool overhead on 1-core measured in tools/bench_input.py"),
    _b("PVCNN_TPU_NO_NATIVE", False,
       "Disable the lazily-compiled C++ IO helper (pvcnn_tpu/native); "
       "numpy fallbacks take over.",
       "compatibility switch — no perf default to measure"),
    _b("PVCNN_TPU_BENCH_EXTRAS", True,
       "bench.py: also time the non-headline accuracy-bearing configs "
       "(adds ~10 min of compiles).",
       "bench scope switch — no perf default to measure"),
    _b("PVCNN_TPU_PRESORT", True,
       "bench.py / tools: build the trainer with the batch presort "
       "(configs carry it by default; 0 A/Bs the unsorted path).",
       "presort A/B in docs/PERFORMANCE.md"),
    _c("PVCNN_TPU_FUSED_ADAM", "auto", ("auto", "0"),
       "Adam update on one flat vector per parameter dtype instead of "
       "leaf-by-leaf (f32-bitwise-identical, tests/test_train.py). auto "
       "dispatches at init on the param tree's leaf count (<=96 fused: "
       "won the 64-leaf headline; per-leaf above: the flat bookkeeping "
       "lost 3.1 ms on the 118-leaf Frustum pipeline). 0 forces per-leaf "
       "everywhere. Trainer(tensor_parallel=True) always uses per-leaf "
       "(differently-sharded leaves must not concat).",
       "headline + frustum A/Bs in docs/PERFORMANCE.md round-5 optimizer "
       "section"),
    _c("PVCNN_TPU_FP32_CONV_PRECISION", "highest", ("highest",),
       "MXU precision for fp32-input convs in the Pallas flat-rows kernel. "
       "Only 'highest' (6-pass bf16, full f32 semantics) exists: the "
       "round-4 'high' (bf16_3x) option NEVER COMPILED — Mosaic's dot "
       "lowering rejects Precision.HIGH — which the round-5 fp32 A/B "
       "session discovered; removed rather than papered over.",
       "round-5 fp32 session in docs/PERFORMANCE.md (the 'high' A/B died "
       "with NotImplementedError at trace time)"),
)

KNOBS = {k.name: k for k in _ALL}
assert len(KNOBS) == len(_ALL)


def get(name: str):
    """Parsed, validated value of knob `name` (full env-var name).

    bool knobs accept 0/1 (and the empty string as unset); int knobs any
    int literal; choice knobs their declared strings. Unset -> the declared
    default (already parsed). Raises KeyError for unregistered names and
    ValueError naming the variable for invalid values.
    """
    knob = KNOBS[name]
    raw = os.environ.get(name)
    if raw is None or raw == "":
        if knob.name == "PVCNN_TPU_DEVOX_FWD_MIN_BINS":
            # inherits an EXPLICIT backward threshold; its own default is
            # lower (the forward crossover sits lower, devoxelize.py)
            if os.environ.get("PVCNN_TPU_SORTED_MIN_BINS"):
                return get("PVCNN_TPU_SORTED_MIN_BINS")
            return 4096
        return knob.default
    if knob.kind == "bool":
        if raw not in ("0", "1"):
            raise ValueError(
                f"{name} must be 0 or 1, got {raw!r}")
        return raw == "1"
    if knob.kind == "int":
        try:
            return int(raw)
        except ValueError:
            raise ValueError(
                f"{name} must be an integer, got {raw!r}") from None
    if raw not in knob.choices:
        raise ValueError(
            f"{name} must be one of {', '.join(knob.choices)}, got {raw!r}")
    return raw


def table_md() -> str:
    """docs/KNOBS.md body: one row per knob (kept in sync by
    tests/test_knobs.py)."""
    lines = ["| Knob | Kind | Default | Effect | Measured |",
             "|---|---|---|---|---|"]
    for k in _ALL:
        default = ("SORTED_MIN_BINS" if k.default is None
                   else {True: "1", False: "0"}.get(k.default, str(k.default)))
        kind = k.kind if not k.choices else "/".join(k.choices)
        lines.append(f"| `{k.name}` | {kind} | {default} "
                     f"| {k.description} | {k.measured or '—'} |")
    return "\n".join(lines) + "\n"
