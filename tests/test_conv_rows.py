"""Oracle tests for the flat-rows Pallas conv3d (ops/pallas/conv_rows.py).

Oracle: XLA conv_general_dilated on the NDHWC view of the same grid (the
layout-independent math both must implement — reference modules/pvconv.py:20-30,
torch Conv3d(k, padding=k//2)). Interpret mode (conftest) lets the kernel run
on the CPU test mesh; R=16 keeps shapes small while exercising the real
R^2 % 128 == 0 branch geometry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvcnn_tpu.ops.pallas.conv_rows import (conv3d_rows, conv_rows_plan,
                                            conv_rows_supported)


def _oracle_conv(x_cf, kernel, r):
    """x_cf [B, Ci, R^3] -> [B, Co, R^3] via XLA NDHWC conv (HIGHEST
    precision so grad tolerances stay tight)."""
    b, ci, r3 = x_cf.shape
    x = jnp.transpose(x_cf, (0, 2, 1)).reshape(b, r, r, r, ci)
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    y = jax.lax.conv_general_dilated(x, kernel, (1, 1, 1), "SAME",
                                     dimension_numbers=dn,
                                     precision=jax.lax.Precision.HIGHEST)
    co = kernel.shape[4]
    return jnp.transpose(y.reshape(b, r3, co), (0, 2, 1))


@pytest.fixture(autouse=True)
def _pallas_interpret(monkeypatch):
    # interpret mode is opt-in per kernel-test module (see tests/conftest.py)
    monkeypatch.setenv("PVCNN_TPU_PALLAS_INTERPRET", "1")


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.mark.parametrize("ci,co", [(16, 16), (6, 16), (16, 32)])
def test_fwd_matches_xla(rng, ci, co):
    r, b, k = 16, 2, 3
    assert conv_rows_supported(b, r, ci, co, k, jnp.float32)
    x = jnp.asarray(rng.randn(b, ci, r ** 3), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, k, ci, co) * 0.1, jnp.float32)
    got = conv3d_rows(x, w, r)
    want = _oracle_conv(x, w, r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_grads_match_xla(rng):
    r, b, ci, co, k = 16, 2, 16, 16, 3
    x = jnp.asarray(rng.randn(b, ci, r ** 3), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, k, ci, co) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.randn(b, co, r ** 3), jnp.float32)

    def loss(fn):
        def f(x_, w_):
            return jnp.vdot(fn(x_, w_), ct)
        return jax.grad(f, argnums=(0, 1))

    dx, dw = loss(lambda a, b_: conv3d_rows(a, b_, r))(x, w)
    dx_o, dw_o = loss(lambda a, b_: _oracle_conv(a, b_, r))(x, w)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_o),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_o),
                               rtol=1e-4, atol=1e-2)


def test_multi_tile_multi_chunk(rng):
    """R=32 plans to several tiles/chunks per batch item; exercise the
    tile-boundary windows, the chunk loop, AND the cross-grid-step wgrad
    accumulation + dgrad boundary windows (round-2 advisor: grads were
    only covered single-tile)."""
    r, b, ci, co, k = 32, 1, 8, 8, 3
    plan = conv_rows_plan(b, r, ci, co, k, jnp.float32)
    assert plan is not None and plan[1] >= 2
    x = jnp.asarray(rng.randn(b, ci, r ** 3), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, k, ci, co) * 0.1, jnp.float32)
    got = conv3d_rows(x, w, r)
    want = _oracle_conv(x, w, r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)

    ct = jnp.asarray(rng.randn(b, co, r ** 3), jnp.float32)

    def grads(fn):
        return jax.grad(lambda x_, w_: jnp.vdot(fn(x_, w_), ct),
                        argnums=(0, 1))(x, w)

    dx, dw = grads(lambda a, b_: conv3d_rows(a, b_, r))
    dx_o, dw_o = grads(lambda a, b_: _oracle_conv(a, b_, r))
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_o),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_o),
                               rtol=1e-4, atol=1e-2)


def test_asymmetric_channels_grad_does_not_crash(rng):
    """r=32, ci=16, co=64 planned fwd-only at round 2 and crashed in
    jax.grad (dgrad needs the swapped-channel plan). The gate must refuse
    shapes whose swapped direction has no plan, and direct conv3d_rows use
    must fall back to XLA instead of unpacking a None plan."""
    r, b, ci, co, k = 32, 2, 16, 64, 3
    has_fwd = conv_rows_plan(b, r, ci, co, k, jnp.float32) is not None
    has_bwd = conv_rows_plan(b, r, co, ci, k, jnp.float32) is not None
    if has_fwd and not has_bwd:
        assert not conv_rows_supported(b, r, ci, co, k, jnp.float32)
    # grad must work regardless of which directions plan (XLA fallback)
    x = jnp.asarray(rng.randn(b, ci, r ** 3), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, k, ci, co) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.randn(b, co, r ** 3), jnp.float32)
    dx, dw = jax.grad(lambda x_, w_: jnp.vdot(conv3d_rows(x_, w_, r), ct),
                      argnums=(0, 1))(x, w)
    dx_o, dw_o = jax.grad(lambda x_, w_: jnp.vdot(_oracle_conv(x_, w_, r), ct),
                          argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_o),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_o),
                               rtol=1e-4, atol=1e-2)


def test_unsupported_shapes():
    # R=8: plane stride 64 not lane-aligned
    assert conv_rows_plan(2, 8, 16, 16, 3, jnp.float32) is None
    # even k
    assert conv_rows_plan(2, 16, 16, 16, 2, jnp.float32) is None
