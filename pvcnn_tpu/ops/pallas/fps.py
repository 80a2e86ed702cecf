"""Pallas TPU kernel for furthest point sampling.

FPS is the one inherently sequential op in the stack (M dependent argmax steps,
reference: modules/functional/src/sampling/sampling.cu:86-174). A plain
`lax.fori_loop` forces XLA to round-trip the [N] min-distance vector through HBM every
step; this kernel keeps the coords and the running min-distance entirely in VMEM
for the whole M-step loop.

All batch elements advance in lockstep in ONE kernel invocation, with the batch
dim on SUBLANES ([B, N] tiles): every per-step vector op (distance update,
row-max, row-argmin) covers all B rows in the same vregs. A [1, N] layout wastes
7/8 sublanes, and a per-batch grid serializes B kernel runs — the batched layout
is ~8x faster at B=8, N=8192, M=1024 (5.9 ms -> 0.7 ms measured on v5e).

Semantics match the CUDA kernel: seed index 0, distances start at 1e38,
min-distance update per step, argmax with ties broken toward the lower index (the
kernel's strict `>` scan order).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fps_indices_pallas", "pallas_fps_supported"]


def _interpret() -> bool:
    from pvcnn_tpu.utils import knobs

    return knobs.get("PVCNN_TPU_PALLAS_INTERPRET")


def pallas_fps_supported(n: int, b: int = 1) -> bool:
    """Use the Pallas kernel on real TPUs (or under forced interpret mode for tests).

    VMEM budget: 4 f32 [B, N] planes (x, y, z, min_d2) must fit — trivially true
    for every config in this framework (B=32, N=8192 -> 4 MB).
    """
    if 4 * b * n * 4 > 8 * 1024 * 1024:
        return False
    if _interpret():
        return True
    return jax.default_backend() == "tpu"


def _fps_kernel(xs_ref, ys_ref, zs_ref, out_ref, min_d2):
    # xs/ys/zs: [B, N] f32 (VMEM); out_ref: [B, M] int32; min_d2: [B, N] scratch
    b, n = xs_ref.shape
    m = out_ref.shape[1]
    xs, ys, zs = xs_ref[...], ys_ref[...], zs_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    lane_m = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)

    min_d2[...] = jnp.full((b, n), 1e38, dtype=jnp.float32)
    out_ref[...] = jnp.zeros((b, m), dtype=jnp.int32)

    def body(j, last):
        # last: [B, 1] — per-row index selected in the previous step
        sel = lane == last
        x1 = jnp.sum(jnp.where(sel, xs, 0.0), axis=1, keepdims=True)
        y1 = jnp.sum(jnp.where(sel, ys, 0.0), axis=1, keepdims=True)
        z1 = jnp.sum(jnp.where(sel, zs, 0.0), axis=1, keepdims=True)
        d2 = (xs - x1) ** 2 + (ys - y1) ** 2 + (zs - z1) ** 2
        nd = jnp.minimum(min_d2[...], d2)
        min_d2[...] = nd
        best = jnp.max(nd, axis=1, keepdims=True)
        # first lane attaining the max == CUDA tie-break toward the lower index
        nxt = jnp.min(jnp.where(nd == best, lane, n), axis=1,
                      keepdims=True).astype(jnp.int32)
        out_ref[...] = jnp.where(lane_m == j, nxt, out_ref[...])
        return nxt

    jax.lax.fori_loop(1, m, body, jnp.zeros((b, 1), jnp.int32))


@functools.partial(jax.jit, static_argnums=(1,))
def fps_indices_pallas(coords: jnp.ndarray, num_samples: int):
    """coords [B, N, 3] float -> FPS indices [B, M] int32."""
    b, n, _ = coords.shape
    coords_t = jnp.transpose(coords, (2, 0, 1)).astype(jnp.float32)  # [3, B, N]
    return pl.pallas_call(
        _fps_kernel,
        out_shape=jax.ShapeDtypeStruct((b, num_samples), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b, n), jnp.float32)],
        interpret=_interpret(),
    )(coords_t[0], coords_t[1], coords_t[2])
