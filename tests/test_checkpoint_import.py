"""Checkpoint-import shim tests.

1. Structural: a synthetic state dict with exact reference naming covers every
   mapped flax param, shapes line up, import succeeds for ShapeNet/S3DIS PVCNN.
2. Numerical: torch Conv1d+BN1d / Linear / Conv3d layers with random weights give
   the same outputs as our Dense/BatchNorm/Conv after import-transposition —
   validating the layout conventions end to end (CPU torch is a test-only dep).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pvcnn_tpu.models import s3dis, shapenet  # noqa: E402
from pvcnn_tpu.utils import checkpoint_import as ci  # noqa: E402


def synthetic_state_dict(mapping, params, batch_stats):
    """Build a torch-style state dict (reference names) filled with random values
    of the right shapes, derived from our model tree."""
    rng = np.random.RandomState(0)
    state = {}

    def get(tree, path, leaf):
        node = tree
        for part in path.split("/"):
            node = node[part]
        return np.asarray(node[leaf])

    for torch_prefix, flax_path, kind in mapping:
        if kind == "dense":
            k = get(params, flax_path, "kernel")
            # fan-in scaling: keep deep synthetic nets finite in eval mode
            w = (rng.randn(k.shape[1], k.shape[0])
                 / np.sqrt(k.shape[0])).astype(np.float32)
            state[f"{torch_prefix}.weight"] = w
            try:
                b = get(params, flax_path, "bias")
                state[f"{torch_prefix}.bias"] = rng.randn(
                    *b.shape).astype(np.float32)
            except KeyError:
                pass
        elif kind == "conv3d":
            k = get(params, flax_path, "kernel")  # [kd,kh,kw,in,out]
            fan_in = k.shape[0] * k.shape[1] * k.shape[2] * k.shape[3]
            state[f"{torch_prefix}.weight"] = (rng.randn(
                k.shape[4], k.shape[3], *k.shape[:3])
                / np.sqrt(fan_in)).astype(np.float32)
            state[f"{torch_prefix}.bias"] = rng.randn(
                k.shape[4]).astype(np.float32)
        elif kind == "bn":
            n = get(params, flax_path, "scale").shape[0]
            state[f"{torch_prefix}.weight"] = rng.rand(n).astype(np.float32) + .5
            state[f"{torch_prefix}.bias"] = rng.randn(n).astype(np.float32)
            state[f"{torch_prefix}.running_mean"] = rng.randn(
                n).astype(np.float32)
            state[f"{torch_prefix}.running_var"] = rng.rand(
                n).astype(np.float32) + 0.5
    return state


from functools import partial  # noqa: E402

from pvcnn_tpu.models.kitti import frustum as kitti_frustum  # noqa: E402

SIZE_TEMPLATES = tuple(
    tuple(float(v) for v in row)
    for row in np.abs(np.random.RandomState(7).randn(8, 3)) + 1.0)


def _frustum_inputs(channels):
    rng = np.random.RandomState(0)
    return {
        "features": jnp.asarray(rng.randn(1, 64, 4).astype(np.float32)),
        "one_hot_vectors": jnp.asarray(np.eye(3, dtype=np.float32)[:1]),
    }


@pytest.mark.parametrize("make_model,mapping_fn,channels", [
    (partial(shapenet.PVCNN, num_classes=50, num_shapes=16,
             extra_feature_channels=3),
     ci.pvcnn_shapenet_mapping, 6 + 16),
    (partial(s3dis.PVCNN, num_classes=13, extra_feature_channels=6),
     ci.pvcnn_s3dis_mapping, 9),
    (partial(shapenet.PointNet, num_classes=50, num_shapes=16,
             with_transformer=True, extra_feature_channels=0),
     partial(ci.pointnet_shapenet_mapping, with_transformer=True), 3 + 16),
    (partial(s3dis.PointNet, num_classes=13, extra_feature_channels=6),
     ci.pointnet_s3dis_mapping, 9),
    (partial(shapenet.pointnet2_ssg, num_classes=50, num_shapes=16),
     partial(ci.pointnet2_shapenet_mapping, msg=False), 6),
    (partial(shapenet.pointnet2_msg, num_classes=50, num_shapes=16),
     partial(ci.pointnet2_shapenet_mapping, msg=True), 6 + 16),
    (partial(s3dis.PVCNN2, num_classes=13, extra_feature_channels=6),
     ci.pvcnn2_s3dis_mapping, 9),
    (partial(kitti_frustum.FrustumPVCNNE, num_classes=3,
             num_heading_angle_bins=12, num_size_templates=8,
             num_points_per_object=32, size_templates=SIZE_TEMPLATES),
     partial(ci.frustum_mapping, variant="pvcnne"), None),
    (partial(kitti_frustum.FrustumPointNet, num_classes=3,
             num_heading_angle_bins=12, num_size_templates=8,
             num_points_per_object=32, size_templates=SIZE_TEMPLATES),
     partial(ci.frustum_mapping, variant="pointnet"), None),
])
@pytest.mark.slow
def test_structural_import(make_model, mapping_fn, channels):
    model = make_model()
    if channels is None:
        x = _frustum_inputs(channels)
    else:
        x = jnp.asarray(
            np.random.RandomState(0).randn(1, 64, channels).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "sample": jax.random.PRNGKey(2)}
    variables = model.init(rngs, x, train=False)
    mapping = mapping_fn()
    state = synthetic_state_dict(mapping, variables["params"],
                                 variables["batch_stats"])
    params, batch_stats = ci.import_state_dict(
        state, variables["params"], variables["batch_stats"], mapping)
    out = model.apply({"params": params, "batch_stats": batch_stats}, x,
                      train=False,
                      rngs={k: v for k, v in rngs.items() if k != "params"})
    leaves = jax.tree.leaves(out)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # every parameter in the model must have been replaced
    before = jax.tree.leaves(variables["params"])
    after = jax.tree.leaves(params)
    changed = sum(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after))
    assert changed >= len(before) - 2, f"only {changed}/{len(before)} imported"


def test_dense_bn_matches_torch():
    from pvcnn_tpu.nn import SharedMLP

    b, n, cin, cout = 2, 32, 7, 11
    x = np.random.RandomState(1).randn(b, n, cin).astype(np.float32)

    tmod = torch.nn.Sequential(
        torch.nn.Conv1d(cin, cout, 1), torch.nn.BatchNorm1d(cout),
        torch.nn.ReLU())
    tmod.eval()
    with torch.no_grad():
        tmod[1].running_mean.normal_()
        tmod[1].running_var.uniform_(0.5, 1.5)
        want = tmod(torch.from_numpy(x.transpose(0, 2, 1))).numpy()

    model = SharedMLP([cout])
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    state = {
        "m.layers.0.weight": tmod[0].weight.detach().numpy(),
        "m.layers.0.bias": tmod[0].bias.detach().numpy(),
        "m.layers.1.weight": tmod[1].weight.detach().numpy(),
        "m.layers.1.bias": tmod[1].bias.detach().numpy(),
        "m.layers.1.running_mean": tmod[1].running_mean.numpy(),
        "m.layers.1.running_var": tmod[1].running_var.numpy(),
    }
    mapping = ci.shared_mlp_entries("m.layers".rsplit(".", 1)[0], "", 1)
    # shared_mlp_entries builds paths like "/Dense_0"; strip leading slash
    mapping = [(t, f.lstrip("/"), k) for t, f, k in mapping]
    params, batch_stats = ci.import_state_dict(
        state, variables["params"], variables["batch_stats"], mapping)
    got = np.asarray(model.apply({"params": params,
                                  "batch_stats": batch_stats},
                                 jnp.asarray(x), train=False))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, rtol=1e-4,
                               atol=1e-5)


def test_conv3d_matches_torch():
    import flax.linen as nn

    b, r, cin, cout = 2, 5, 3, 4
    x = np.random.RandomState(2).randn(b, r, r, r, cin).astype(np.float32)
    tconv = torch.nn.Conv3d(cin, cout, 3, padding=1)
    with torch.no_grad():
        want = tconv(torch.from_numpy(
            x.transpose(0, 4, 1, 2, 3))).numpy()

    model = nn.Conv(cout, (3, 3, 3), padding=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = dict(variables["params"])
    params["kernel"] = jnp.asarray(np.transpose(
        tconv.weight.detach().numpy(), (2, 3, 4, 1, 0)))
    params["bias"] = jnp.asarray(tconv.bias.detach().numpy())
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got.transpose(0, 4, 1, 2, 3), want, rtol=1e-4,
                               atol=1e-4)


def test_batchnorm_unbiased_running_var_matches_torch():
    """Training-mode BN must track the unbiased variance like torch."""
    from pvcnn_tpu.nn import BatchNorm

    b, n, c = 4, 16, 3
    x = np.random.RandomState(3).randn(b, n, c).astype(np.float32)
    tb = torch.nn.BatchNorm1d(c)
    tb.train()
    with torch.no_grad():
        t_out = tb(torch.from_numpy(x.transpose(0, 2, 1))).numpy()

    model = BatchNorm()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    out, mutated = model.apply(variables, jnp.asarray(x), train=True,
                               mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), t_out,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        tb.running_mean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]),
        tb.running_var.numpy(), rtol=1e-4, atol=1e-6)
