"""Pallas one-hot scatter kernel vs segment_sum reference (interpret mode on CPU;
the same kernel is compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from pvcnn_tpu.ops.pallas.scatter import onehot_scatter_add


def _reference(values, idx, bins):
    return np.stack([
        np.stack([values[b][idx[b] == v].sum(axis=0) for v in range(bins)])
        for b in range(values.shape[0])
    ])


def test_scatter_matches_segment_sum_f32(rng):
    b, n, c, bins = 2, 200, 5, 256
    values = rng.randn(b, n, c).astype(np.float32)
    idx = rng.randint(0, bins, size=(b, n)).astype(np.int32)
    got = np.asarray(onehot_scatter_add(jnp.asarray(values), jnp.asarray(idx),
                                        bins, mm_dtype=jnp.float32))
    want = _reference(values, idx, bins)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_scatter_bf16_close(rng):
    b, n, c, bins = 1, 128, 3, 128
    values = rng.randn(b, n, c).astype(np.float32)
    idx = rng.randint(0, bins, size=(b, n)).astype(np.int32)
    got = np.asarray(onehot_scatter_add(jnp.asarray(values), jnp.asarray(idx),
                                        bins, mm_dtype=jnp.bfloat16))
    want = _reference(values, idx, bins)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_avg_voxelize_uses_fp32_under_precision_context(rng):
    # bins divisible by 128 -> pallas path; under the fp32 matmul context the
    # result must match the segment_sum fallback bit-for-bit-ish
    from pvcnn_tpu import ops
    b, n, c, r = 2, 64, 4, 8  # r^3 = 512 = 4 * 128
    feats = rng.randn(b, n, c).astype(np.float32)
    vc = rng.randint(0, r, size=(b, n, 3)).astype(np.int32)
    with jax.default_matmul_precision("float32"):
        got = np.asarray(ops.avg_voxelize(jnp.asarray(feats), jnp.asarray(vc), r))
    import oracles
    want = oracles.avg_voxelize(feats, vc, r)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_devoxelize_grad_through_pallas_path(rng):
    from pvcnn_tpu import ops
    b, n, c, r = 1, 32, 2, 8
    grid = rng.randn(b, r, r, r, c).astype(np.float32)
    nc = rng.uniform(0, r - 1, size=(b, n, 3)).astype(np.float32)

    def f(x):
        return jnp.sum(ops.trilinear_devoxelize(x, jnp.asarray(nc), r) ** 2)

    with jax.default_matmul_precision("float32"):
        ana = np.asarray(jax.grad(f)(jnp.asarray(grid)))
    # numerical grad
    eps = 1e-2
    num = np.zeros_like(grid)
    flat, nflat = grid.reshape(-1), num.reshape(-1)
    sel = rng.choice(flat.size, size=40, replace=False)
    for i in sel:
        orig = flat[i]
        flat[i] = orig + eps
        fp = float(f(jnp.asarray(grid)))
        flat[i] = orig - eps
        fm = float(f(jnp.asarray(grid)))
        flat[i] = orig
        nflat[i] = (fp - fm) / (2 * eps)
    np.testing.assert_allclose(ana.reshape(-1)[sel], nflat[sel], rtol=2e-2,
                               atol=2e-2)
