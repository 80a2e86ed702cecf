"""Path parity for PVConv's flat-rows voxel branch (nn/pvconv.py).

On TPU, PVConv runs its conv+BN+LeakyReLU(+SE) stack on [B, C, R^3] flat rows
through the Pallas conv_rows kernel; on CPU (or PVCNN_TPU_CONV_ROWS=0) it runs
the NDHWC XLA conv path. Both must compute the same math on the SAME parameter
tree (layout-independent checkpoints). Interpret mode lets the kernel path run
on the CPU test mesh; R=16 is the smallest resolution the kernel supports.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvcnn_tpu.nn.pvconv import PVConv


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _apply(module, variables, feats, coords, train, rows_on, monkeypatch):
    # interpret mode stays ON for BOTH runs so the voxelize/devoxelize Pallas
    # paths are identical; only the conv path toggles. (Toggling interpret
    # itself would also switch the scatter kernels' bf16 one-hot matmuls in
    # and out, dominating the comparison.)
    monkeypatch.setenv("PVCNN_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("PVCNN_TPU_CONV_ROWS", "auto" if rows_on else "0")
    return module.apply(variables, feats, coords, train=train,
                        mutable=["batch_stats"] if train else [])


@pytest.mark.parametrize("with_se,train", [(False, False), (True, True)])
def test_rows_path_matches_ndhwc(rng, with_se, train, monkeypatch):
    b, n, ci, co, r = 2, 256, 8, 16, 16
    module = PVConv(out_channels=co, kernel_size=3, resolution=r,
                    with_se=with_se, normalize=False)
    feats = jnp.asarray(rng.randn(b, n, ci), jnp.float32)
    coords = jnp.asarray(rng.rand(b, n, 3) * 2 - 1, jnp.float32)

    monkeypatch.setenv("PVCNN_TPU_CONV_ROWS", "0")
    variables = module.init(jax.random.PRNGKey(0), feats, coords, train=False)

    (out_x, _), *rest_x = _apply(module, variables, feats, coords, train,
                                 False, monkeypatch)
    (out_r, _), *rest_r = _apply(module, variables, feats, coords, train,
                                 True, monkeypatch)
    # f32 accumulation-order noise through conv->BN->conv->BN chains:
    # measured max-abs ~1.2e-3 on O(1) outputs between the two paths
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_x),
                               rtol=2e-3, atol=3e-3)
    if train:
        # batch_stats updates must agree too (BN stats over the channel axis
        # are layout-independent)
        sx = jax.tree_util.tree_leaves(rest_x[0])
        sr = jax.tree_util.tree_leaves(rest_r[0])
        for a, c in zip(sx, sr):
            np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                       rtol=1e-3, atol=1e-4)


def test_rows_path_grads_match(rng, monkeypatch):
    b, n, ci, co, r = 2, 256, 8, 8, 16
    module = PVConv(out_channels=co, kernel_size=3, resolution=r,
                    normalize=False)
    feats = jnp.asarray(rng.randn(b, n, ci), jnp.float32)
    coords = jnp.asarray(rng.rand(b, n, 3) * 2 - 1, jnp.float32)

    monkeypatch.setenv("PVCNN_TPU_CONV_ROWS", "0")
    variables = module.init(jax.random.PRNGKey(0), feats, coords, train=False)

    def loss(params, rows_on):
        monkeypatch.setenv("PVCNN_TPU_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("PVCNN_TPU_CONV_ROWS", "auto" if rows_on else "0")
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        (out, _), _ = module.apply(v, feats, coords, train=True,
                                   mutable=["batch_stats"])
        return jnp.sum(jnp.square(out))

    gx = jax.grad(lambda p: loss(p, False))(variables["params"])
    gr = jax.grad(lambda p: loss(p, True))(variables["params"])
    for a, c in zip(jax.tree_util.tree_leaves(gx),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=1e-3, atol=1e-2)
