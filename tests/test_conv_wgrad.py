"""Pallas conv3d weight-grad kernel vs numpy oracle (interpret mode on CPU;
the same kernel is compiled on TPU). Reference op: modules/pvconv.py:20-30
(the voxel-branch Conv3d's weight gradient)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvcnn_tpu.ops.pallas.conv_wgrad import conv3d_wgrad, conv3d_wgrad_plan


@pytest.fixture(autouse=True)
def _pallas_interpret(monkeypatch):
    # interpret mode is opt-in per kernel-test module (session-wide it can
    # SIGABRT XLA's CPU compiler inside the big sharded train-step jits)
    monkeypatch.setenv("PVCNN_TPU_PALLAS_INTERPRET", "1")


def _oracle(x, g, k):
    """dW[kx,ky,kz,ci,co] = sum_{b,xyz} Xp[b,x+kx,y+ky,z+kz,ci] * g[b,xyz,co]"""
    b, d, h, w, ci = x.shape
    co = g.shape[-1]
    p = k // 2
    xp = np.pad(x, ((0, 0), (p, p), (p, p), (p, p), (0, 0)))
    out = np.zeros((k, k, k, ci, co), np.float32)
    for kx in range(k):
        for ky in range(k):
            for kz in range(k):
                xs = xp[:, kx:kx + d, ky:ky + h, kz:kz + w, :]
                out[kx, ky, kz] = np.einsum('bxyzi,bxyzo->io', xs, g)
    return out


@pytest.mark.parametrize("shape", [
    (2, 6, 6, 6, 5, 7, 3),    # non-multiple channels -> ci_pad path
    (1, 4, 5, 6, 3, 4, 3),    # anisotropic grid
    (2, 4, 4, 4, 8, 8, 5),    # k=5
    (3, 5, 4, 4, 16, 8, 1),   # k=1 (no taps/shifts)
])
def test_wgrad_matches_oracle(rng, shape):
    b, d, h, w, ci, co, k = shape
    x = rng.randn(b, d, h, w, ci).astype(np.float32)
    g = rng.randn(b, d, h, w, co).astype(np.float32)
    assert conv3d_wgrad_plan(b, d, h, w, ci, co, k, jnp.float32) is not None
    got = np.asarray(conv3d_wgrad(jnp.asarray(x), jnp.asarray(g), k))
    want = _oracle(x, g, k)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5 * scale)


def test_wgrad_plan_rejects_even_k_and_wide_dtypes():
    assert conv3d_wgrad_plan(2, 8, 8, 8, 4, 4, 2, jnp.float32) is None
    assert conv3d_wgrad_plan(2, 8, 8, 8, 4, 4, 3, jnp.float64) is None


def test_conv3d_bwd_routes_through_kernel(rng, monkeypatch):
    """Conv3dSame's custom VJP must produce the same dW with the Pallas kernel
    as with the XLA tap fallback."""
    from pvcnn_tpu.nn.conv3d import Conv3dSame

    x = rng.randn(2, 5, 5, 5, 4).astype(np.float32)
    m = Conv3dSame(features=6, kernel_size=3)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def loss(p, x):
        return jnp.sum(m.apply(p, x) ** 2)

    g1 = jax.grad(loss)(params, jnp.asarray(x))
    monkeypatch.setenv("PVCNN_TPU_XLA_CONV_WGRAD_ONLY", "1")
    g2 = jax.grad(loss)(params, jnp.asarray(x))
    k1 = g1["params"]["kernel"]
    k2 = g2["params"]["kernel"]
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2),
                               rtol=0, atol=1e-4 * float(jnp.abs(k2).max()))
