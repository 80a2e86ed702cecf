"""SharedMLP: per-point 1x1 conv -> BatchNorm -> ReLU stacks.

Reference: modules/shared_mlp.py:6-33 (Conv1d/2d(1) + BN + ReLU). In channel-last
layout a 1x1 conv over points is a plain Dense over the trailing channel axis, which
XLA maps straight onto the MXU — the core reason for this framework's [B, N, C]
convention. Works on any rank >= 2 input ([B, N, C], [B, M, U, C], ...): BatchNorm
normalizes per-channel over all leading axes, matching torch BatchNorm1d/2d.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["SharedMLP", "BatchNorm", "DenseBNReLU", "SplitDense"]


class SplitDense(nn.Module):
    """Dense over a LIST of feature arrays == Dense over their channel concat,
    without materializing the concat.

    y = sum_i x_i @ K[rows_i] + b, with K one [sum(C_i), features] parameter —
    the exact tree nn.Dense would create on the concatenated input, so
    checkpoints transfer unchanged. Segments with a singleton points axis
    ([B, 1, C], e.g. a tiled global feature) broadcast instead of tiling.

    Why: PVCNN's classifier concatenates every block output (reference
    models/shapenet/pvcnn.py:36-41) into a [B, N, ~1.2k] tensor that exists
    only to feed the first classifier matmul — at the headline shape that is
    a ~330 MB buffer written + read forward and again in backward. Summing
    per-segment matmuls (f32 accumulation, one final rounding) removes all
    of that HBM traffic; XLA cannot do this rewrite itself because the
    concat is an explicit op in the graph.
    """

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, xs):
        in_ch = sum(x.shape[-1] for x in xs)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_ch, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        dt = self.dtype or xs[0].dtype
        acc = jnp.promote_types(dt, jnp.float32)
        k = kernel.astype(dt)
        y = None
        off = 0
        for x in xs:
            c = x.shape[-1]
            kb = jax.lax.slice(k, (off, 0), (off + c, self.features))
            t = jax.lax.dot_general(x.astype(dt), kb, (((x.ndim - 1,), (0,)),
                                                       ((), ())),
                                    preferred_element_type=acc)
            y = t if y is None else y + t
            off += c
        return (y + bias.astype(acc)).astype(dt)


class BatchNorm(nn.Module):
    """BatchNorm over the last axis with exact torch semantics.

    flax's nn.BatchNorm updates the running variance with the *biased* batch
    variance; torch normalizes with the biased variance but tracks the
    *unbiased* one (x n/(n-1)) in running_var — an observable difference when
    importing/exporting checkpoints mid-training, so we implement it directly.
    torch defaults: momentum 0.1, eps 1e-5 (1e-4 inside PVConv's 3-D stack,
    reference modules/pvconv.py:22,25). Statistics are computed in fp32.
    """

    epsilon: float = 1e-5
    momentum: float = 0.1
    dtype: jnp.dtype | None = None
    # which axis holds channels: -1 for the framework's [..., C] convention,
    # 1 for the flat-rows voxel branch ([B, C, R^3], nn/pvconv.py). Parameter
    # shapes and running-stat semantics are identical either way, so the two
    # layouts share checkpoints.
    channel_axis: int = -1

    @nn.compact
    def __call__(self, x=None, train: bool = False, *, affine: bool = False,
                 sums=None, count: int = 0, features: int = 0):
        """Two modes:

        * normalize (default): x -> normalized/affined x, batch stats in
          train mode, running stats in eval.
        * affine=True (x must be None): return the FOLDED per-channel
          (scale_eff, shift_eff) f32 pair such that
          `y_norm = y*scale_eff + shift_eff`, updating running stats exactly
          as normalize mode would. In train mode batch mean/var derive from
          `sums=(s1, s2)` per-channel f32 sums of the pre-BN tensor with
          `count` reduced elements (mean = s1/n, var = s2/n - mean^2 — the
          same biased-variance formula the normalize path uses); in eval
          mode running stats fold into the pair (pass `features`, sums may
          be None). The fused voxel branch consumes the pair as a
          conv-kernel prologue (ops/pallas/conv_rows.py conv3d_rows_act) so
          the normalized grid is never materialized.
        """
        if affine:
            assert x is None
            return self._affine(sums, count, features, train)
        ax = self.channel_axis % x.ndim
        features = x.shape[ax]
        scale = self.param("scale", nn.initializers.ones, (features,),
                          jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))

        axes = tuple(i for i in range(x.ndim) if i != ax)
        bshape = [1] * x.ndim
        bshape[ax] = features
        # stats in at-least-fp32 (promote, don't hard-cast: fp64 inputs keep
        # fp64 stats so the fp64 parity controls aren't clamped to 1e-8).
        # casts are CONDITIONAL: a same-dtype astype still shifts XLA fusion
        # boundaries enough to move eval outputs by ~1e-4 at frustum depth
        # (caught by test_frustum_eval_parity), so fp32 inputs must trace the
        # exact graph they always did.
        sdt = jnp.promote_types(x.dtype, jnp.float32)

        def to(a, dt=sdt):
            return a if a.dtype == dt else a.astype(dt)

        if train:
            xf = to(x)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            if not self.is_initializing():
                n = 1
                for i in axes:
                    n *= x.shape[i]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = to((1 - m) * ra_mean.value + m * mean,
                                   jnp.float32)
                ra_var.value = to((1 - m) * ra_var.value + m * unbiased,
                                  jnp.float32)
        else:
            mean, var = to(ra_mean.value), to(ra_var.value)

        y = ((to(x) - mean.reshape(bshape))
             * jax.lax.rsqrt(var.reshape(bshape) + self.epsilon))
        y = y * to(scale.reshape(bshape)) + to(bias.reshape(bshape))
        return y.astype(self.dtype or x.dtype)

    def _affine(self, sums, count, features, train):
        if sums is not None:
            features = sums[0].shape[0]
        assert features, "affine mode needs sums or features"
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))
        if train:
            s1, s2 = sums
            n = int(count)
            mean = s1.astype(jnp.float32) / n
            var = s2.astype(jnp.float32) / n - jnp.square(mean)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        scale_eff = scale * jax.lax.rsqrt(var + self.epsilon)
        shift_eff = bias - mean * scale_eff
        return scale_eff, shift_eff


class DenseStats(nn.Module):
    """nn.Dense twin (same param tree: kernel [Ci, Co] + bias) that runs the
    fused Pallas matmul + BN-stats epilogue (ops/pallas/dense_rows.py): the
    per-channel sum/sumsq its BatchNorm needs accumulate in the kernel, so
    the BN batch-stat reduce never re-reads the layer output from HBM."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, want_stats: bool = True):
        from pvcnn_tpu.ops.pallas.dense_rows import dense_rows_act

        ci = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (ci, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        dt = self.dtype or x.dtype
        zeros = jnp.zeros((ci,), jnp.float32)
        return dense_rows_act(x.astype(dt), kernel, bias, zeros, zeros,
                              0.0, False, want_stats)


class SharedMLP(nn.Module):
    """x may be a single [..., C] array or a LIST of them: a list means
    "the channel concat of these", routed through SplitDense so the concat
    is never materialized (explicit names keep the param tree identical).

    PVCNN_TPU_DENSE_BN_FUSED=auto opts train-mode layers into the fused
    Pallas Dense + BN-stats path (DenseStats) — batch stats come from the
    matmul's f32 accumulator epilogue instead of a separate full read of
    the layer output. PERF-PARKED, default off: the XLA-level affine+ReLU
    that follows materializes f32 copies of the wide layers (the bf16->f32
    convert gains multiple consumers and stops fusing), which traced
    +4.6 ms against the ~0.2 ms the epilogue saves (round-5,
    docs/PERFORMANCE.md). Exactness stays locked by
    tests/test_ops.py::TestDenseRowsFused; a future in-kernel two-pass
    stats+apply could cash the saving. Eval always uses the plain path
    (checkpoint-parity tests pin those numerics)."""

    out_channels: Sequence[int]
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        import jax

        from pvcnn_tpu.utils import knobs

        for i, oc in enumerate(self.out_channels):
            oc = int(oc)
            fused = False
            if train and not isinstance(x, (list, tuple)):
                from pvcnn_tpu.ops.pallas.dense_rows import dense_rows_plan

                dt = self.dtype or x.dtype
                rows = 1
                for d in x.shape[:-1]:
                    rows *= d
                on_tpu = (jax.default_backend() == "tpu"
                          or knobs.get("PVCNN_TPU_PALLAS_INTERPRET"))
                fused = (knobs.get("PVCNN_TPU_DENSE_BN_FUSED") != "0"
                         and on_tpu
                         and dense_rows_plan(rows, x.shape[-1], oc,
                                             dt) is not None)
            if fused:
                y, s1, s2 = DenseStats(oc, dtype=self.dtype,
                                       name=f"Dense_{i}")(x, want_stats=True)
                sc, sh = BatchNorm(dtype=self.dtype,
                                   name=f"BatchNorm_{i}")(
                    train=True, affine=True, sums=(s1, s2), count=rows,
                    features=oc)
                bshape = (1,) * (y.ndim - 1) + (oc,)
                t = (y.astype(jnp.float32) * sc.reshape(bshape)
                     + sh.reshape(bshape))
                x = jnp.maximum(t, 0.0).astype(dt)
                continue
            if i == 0 and isinstance(x, (list, tuple)):
                x = SplitDense(oc, dtype=self.dtype,
                               name=f"Dense_{i}")(x)
            else:
                x = nn.Dense(oc, dtype=self.dtype,
                             name=f"Dense_{i}")(x)
            x = BatchNorm(dtype=self.dtype, name=f"BatchNorm_{i}")(
                x, train=train)
            x = nn.relu(x)
        return x


class DenseBNReLU(nn.Module):
    """Linear + BatchNorm1d + ReLU on [B, C] (reference models/utils.py:11-12)."""

    out_channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(int(self.out_channels), dtype=self.dtype)(x)
        x = BatchNorm(dtype=self.dtype)(x, train=train)
        return nn.relu(x)
