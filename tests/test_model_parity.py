"""Full-model numeric parity against torch reference twins (VERDICT item 3).

For each model family: build the torch twin (tests/torch_twins.py — reference
architecture, oracle functional ops), randomize its weights and BN stats,
export `state_dict()` (reference-named by construction), import it through
utils/checkpoint_import.py, and assert the flax model's full forward matches
the twin's within fp32 tolerance — eval mode for all families, train mode
(BN batch statistics; dropout disabled on both sides) for representatives.

This is the end-to-end guarantee that the import shim + BN semantics + layout
transposes + op semantics compose correctly, standing in for released-
checkpoint parity until the checkpoints are reachable.

Shapes are kept small (N=64, voxel_resolution_multiplier=0.25, shrunk SA
center counts — center counts don't appear in the import mapping, only
channel structures do). Frustum nets use num_points_per_object == N so the
logits_mask selected SET is deterministic (reference sampling.py:68-82 keeps
every candidate when count <= M; downstream is pointwise+max, so outputs are
independent of the random order/multiplicity).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import torch_twins as tw  # noqa: E402
from pvcnn_tpu.models import s3dis, shapenet  # noqa: E402
from pvcnn_tpu.models.kitti import frustum as kf  # noqa: E402
from pvcnn_tpu.utils import checkpoint_import as ci  # noqa: E402

B, N = 2, 64
RNGS = {"dropout": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)}



def _seed(name: str) -> int:
    """Deterministic per-case seed. Python's built-in str hash is SALTED per
    process (PYTHONHASHSEED), which made twin weights differ run-to-run and
    the fp32 flip-fraction bounds flaky at their boundary."""
    import zlib

    return zlib.crc32(name.encode()) % 2**31

def _import_into(model, x, state, mapping, train=False):
    variables = model.init({"params": jax.random.PRNGKey(0), **RNGS}, x,
                           train=False)
    params, batch_stats = ci.import_state_dict(
        state, variables["params"], variables.get("batch_stats", {}), mapping)
    return {"params": params, "batch_stats": batch_stats}


def _forward(model, variables, x, train=False):
    if train:
        out, _ = model.apply(variables, x, train=True, rngs=RNGS,
                             mutable=["batch_stats"])
        return out
    return model.apply(variables, x, train=False, rngs=RNGS)


def _compare(got_cl, want_cm, rtol=1e-4, atol=1e-4):
    """got: flax channel-last [B,N,C]; want: torch channel-major [B,C,N]."""
    got = np.asarray(got_cl).transpose(0, 2, 1)
    np.testing.assert_allclose(got, want_cm.detach().numpy(), rtol=rtol,
                               atol=atol)


def _point_input(seed, channels, n=N, coord_scale=0.35):
    """[B, channels, N] torch input whose first 3 rows are coords."""
    rng = np.random.RandomState(seed)
    x = rng.randn(B, channels, n).astype(np.float32)
    x[:, :3] *= coord_scale
    return torch.from_numpy(x)


def _with_one_hot(x, num_shapes, seed=5):
    rng = np.random.RandomState(seed)
    oh = np.eye(num_shapes, dtype=np.float32)[rng.randint(0, num_shapes, B)]
    oh_t = np.repeat(oh[:, :, None], x.shape[-1], axis=2)
    return torch.cat([x, torch.from_numpy(oh_t)], dim=1)


# shrunk-center SA specs (channel structure identical to the real models)
SSG_SA = ((None, (32, 0.3, 8, (64, 64, 128))),
          (None, (16, 0.6, 8, (128, 128, 256))),
          (None, (None, None, None, (256, 512, 1024))))
MSG_SA = ((None, (32, [0.2, 0.4, 0.8], [4, 8, 16],
                  [(32, 32, 64), (64, 64, 128), (64, 96, 128)])),
          (None, (16, [0.4, 0.8], [8, 16], [(128, 128, 256), (128, 196, 256)])),
          (None, (None, None, None, (256, 512, 1024))))
FP_BLOCKS = (((256, 256), None), ((256, 128), None), ((128, 128, 128), None))

PVCNN2_SA = (((32, 2, 8), (32, 0.2, 8, (32, 64))),
             ((64, 3, 4), (16, 0.4, 8, (64, 128))),
             ((128, 3, 2), (8, 0.8, 8, (128, 256))),
             (None, (4, 1.6, 8, (256, 256, 512))))
PVCNN2_FP = (((256, 256), (256, 1, 2)),
             ((256, 256), (256, 1, 2)),
             ((256, 128), (128, 2, 4)),
             ((128, 128, 64), (64, 1, 8)))


class _SmallTwinPVCNN2(tw.TwinPVCNN2):
    sa_blocks = PVCNN2_SA
    fp_blocks = PVCNN2_FP


class _SmallPVCNN2(s3dis.PVCNN2):
    sa_blocks = PVCNN2_SA
    fp_blocks = PVCNN2_FP


def _pvcnn2_mapping():
    entries, counts = ci.sa_layers_entries(PVCNN2_SA, "sa_layers", {},
                                           with_se=True)
    fp_entries, counts = ci.fp_layers_entries(PVCNN2_FP, "fp_layers", counts,
                                              with_se=True)
    cls_entries, _ = ci.mlp_classifier_entries([128, 0.5, -1], "classifier",
                                               dim=2, counts=counts)
    return entries + fp_entries + cls_entries


def _pointnet2_mapping(sa_blocks):
    entries, counts = ci.sa_layers_entries(sa_blocks, "sa_layers", {})
    fp_entries, counts = ci.fp_layers_entries(FP_BLOCKS, "fp_layers", counts)
    cls_entries, _ = ci.mlp_classifier_entries([128, 0.5, -1], "classifier",
                                               dim=2, counts=counts)
    return entries + fp_entries + cls_entries


CASES = {
    "pvcnn_shapenet": dict(
        twin=lambda: tw.TwinPVCNNShapeNet(10, 4, extra_feature_channels=3,
                                          width_multiplier=0.25,
                                          voxel_resolution_multiplier=0.25),
        flax=lambda: shapenet.PVCNN(num_classes=10, num_shapes=4,
                                    extra_feature_channels=3,
                                    width_multiplier=0.25,
                                    voxel_resolution_multiplier=0.25),
        mapping=ci.pvcnn_shapenet_mapping,
        input=lambda: _with_one_hot(_point_input(11, 6), 4)),
    "pvcnn_s3dis": dict(
        twin=lambda: tw.TwinPVCNNS3DIS(13, extra_feature_channels=6,
                                       width_multiplier=0.25,
                                       voxel_resolution_multiplier=0.25),
        flax=lambda: s3dis.PVCNN(num_classes=13, extra_feature_channels=6,
                                 width_multiplier=0.25,
                                 voxel_resolution_multiplier=0.25),
        mapping=ci.pvcnn_s3dis_mapping,
        input=lambda: _point_input(12, 9)),
    "pointnet_shapenet": dict(
        twin=lambda: tw.TwinPointNetShapeNet(10, 4, with_transformer=True,
                                             extra_feature_channels=0,
                                             width_multiplier=0.25),
        flax=lambda: shapenet.PointNet(num_classes=10, num_shapes=4,
                                       with_transformer=True,
                                       extra_feature_channels=0,
                                       width_multiplier=0.25),
        mapping=lambda: ci.pointnet_shapenet_mapping(with_transformer=True),
        input=lambda: _with_one_hot(_point_input(13, 3), 4)),
    "pointnet_s3dis": dict(
        twin=lambda: tw.TwinPointNetS3DIS(13, extra_feature_channels=6,
                                          width_multiplier=0.25),
        flax=lambda: s3dis.PointNet(num_classes=13, extra_feature_channels=6,
                                    width_multiplier=0.25),
        mapping=ci.pointnet_s3dis_mapping,
        input=lambda: _point_input(14, 9)),
    "pointnet2_ssg": dict(
        twin=lambda: tw.TwinPointNet2(10, 4, SSG_SA, FP_BLOCKS,
                                      with_one_hot_shape_id=False,
                                      extra_feature_channels=3,
                                      width_multiplier=0.25),
        flax=lambda: shapenet.PointNet2(num_classes=10, num_shapes=4,
                                        sa_blocks=SSG_SA, fp_blocks=FP_BLOCKS,
                                        with_one_hot_shape_id=False,
                                        extra_feature_channels=3,
                                        width_multiplier=0.25),
        mapping=lambda: _pointnet2_mapping(SSG_SA),
        input=lambda: _point_input(15, 6)),
    "pointnet2_msg": dict(
        twin=lambda: tw.TwinPointNet2(10, 4, MSG_SA, FP_BLOCKS,
                                      with_one_hot_shape_id=True,
                                      extra_feature_channels=3,
                                      width_multiplier=0.25),
        flax=lambda: shapenet.PointNet2(num_classes=10, num_shapes=4,
                                        sa_blocks=MSG_SA, fp_blocks=FP_BLOCKS,
                                        with_one_hot_shape_id=True,
                                        extra_feature_channels=3,
                                        width_multiplier=0.25),
        mapping=lambda: _pointnet2_mapping(MSG_SA),
        input=lambda: _with_one_hot(_point_input(16, 6), 4)),
    "pvcnn2_s3dis": dict(
        twin=lambda: _SmallTwinPVCNN2(13, extra_feature_channels=6,
                                      width_multiplier=0.5),
        flax=lambda: _SmallPVCNN2(num_classes=13, extra_feature_channels=6,
                                  width_multiplier=0.5),
        mapping=_pvcnn2_mapping,
        input=lambda: _point_input(17, 9)),
}

SIZE_TEMPLATES = np.abs(np.random.RandomState(7).randn(8, 3)) + 1.0

FRUSTUM_CASES = {
    "frustum_pvcnne": dict(
        twin=lambda: tw.TwinFrustumNet(
            "pvcnne", num_classes=3, num_heading_angle_bins=12,
            num_size_templates=8, num_points_per_object=N,
            size_templates=SIZE_TEMPLATES, width_multiplier=0.5,
            voxel_resolution_multiplier=0.5),
        flax=lambda: kf.FrustumPVCNNE(
            num_classes=3, num_heading_angle_bins=12, num_size_templates=8,
            num_points_per_object=N,
            size_templates=tuple(map(tuple, SIZE_TEMPLATES)),
            width_multiplier=0.5, voxel_resolution_multiplier=0.5),
        mapping=lambda: ci.frustum_mapping("pvcnne")),
    "frustum_pointnet": dict(
        twin=lambda: tw.TwinFrustumNet(
            "pointnet", num_classes=3, num_heading_angle_bins=12,
            num_size_templates=8, num_points_per_object=N,
            size_templates=SIZE_TEMPLATES, width_multiplier=0.5),
        flax=lambda: kf.FrustumPointNet(
            num_classes=3, num_heading_angle_bins=12, num_size_templates=8,
            num_points_per_object=N,
            size_templates=tuple(map(tuple, SIZE_TEMPLATES)),
            width_multiplier=0.5),
        mapping=lambda: ci.frustum_mapping("pointnet")),
    "frustum_pointnet2": dict(
        twin=lambda: tw.TwinFrustumNet(
            "pointnet2", num_classes=3, num_heading_angle_bins=12,
            num_size_templates=8, num_points_per_object=N,
            size_templates=SIZE_TEMPLATES, width_multiplier=0.5),
        flax=lambda: kf.FrustumPointNet2(
            num_classes=3, num_heading_angle_bins=12, num_size_templates=8,
            num_points_per_object=N,
            size_templates=tuple(map(tuple, SIZE_TEMPLATES)),
            width_multiplier=0.5),
        mapping=lambda: ci.frustum_mapping("pointnet2")),
}


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(CASES))
def test_full_model_eval_parity(name):
    case = CASES[name]
    twin = tw.randomize(case["twin"](), seed=_seed(name))
    twin.eval()
    x = case["input"]()
    with torch.no_grad():
        want = twin(x)
    state = tw.state_dict_numpy(twin)

    model = case["flax"]()
    xs = jnp.asarray(x.numpy().transpose(0, 2, 1))
    variables = _import_into(model, xs, state, case["mapping"]())
    got = _forward(model, variables, xs, train=False)
    _compare(got, want)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["pvcnn_shapenet", "pvcnn2_s3dis"])
def test_full_model_train_parity(name, monkeypatch):
    """Train-mode forward (batch-stat BN) with dropout disabled on both sides."""
    import flax.linen as nn

    monkeypatch.setattr(nn.Dropout, "__call__",
                        lambda self, x, deterministic=None, rng=None: x)
    case = CASES[name]
    twin = tw.randomize(case["twin"](), seed=_seed(name))
    twin.train()
    for mod in twin.modules():
        if isinstance(mod, torch.nn.Dropout):
            mod.eval()
    x = case["input"]()
    with torch.no_grad():
        want = twin(x)
    state = tw.state_dict_numpy(twin)

    model = case["flax"]()
    xs = jnp.asarray(x.numpy().transpose(0, 2, 1))
    variables = _import_into(model, xs, state, case["mapping"]())
    got = _forward(model, variables, xs, train=True)
    # batch-stat BN amplifies reduction-order noise (rsqrt of small-sample
    # variances); the ~30-BN-deep PVCNN2 stack accumulates ~2e-3 abs while the
    # shallower PVCNN holds 1e-4 (and eval mode holds 1e-4 for all families)
    tol = dict(rtol=2e-3, atol=2e-3) if name == "pvcnn2_s3dis" else {}
    _compare(got, want, **tol)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["pvcnn_shapenet", "pvcnn2_s3dis"])
def test_full_model_grad_parity(name, monkeypatch):
    """End-to-end GRADIENT parity: cross-entropy backward through the torch
    twin (autograd) vs jax.grad through the flax model with imported weights.

    This is the guarantee the forward tests cannot give: every custom VJP
    (avg_voxelize, trilinear_devoxelize, gather, grouping, 3-NN interpolate)
    plus BN/conv/dense backward semantics, composed exactly as the reference
    models compose them (models/shapenet/pvcnn.py:30-42,
    models/s3dis/pvcnnpp.py:44-59). The import mapping is linear
    (transpose/reshape/copy only), so mapping the torch GRAD state_dict through
    import_state_dict yields the expected flax-structured gradient tree."""
    import flax.linen as nn

    monkeypatch.setattr(nn.Dropout, "__call__",
                        lambda self, x, deterministic=None, rng=None: x)
    case = CASES[name]
    twin = tw.randomize(case["twin"](), seed=_seed(name))
    twin.train()
    for mod in twin.modules():
        if isinstance(mod, torch.nn.Dropout):
            mod.eval()
    x = case["input"]()
    num_classes = 10 if name == "pvcnn_shapenet" else 13
    targets = torch.from_numpy(
        np.random.RandomState(3).randint(0, num_classes, (B, N)))
    out = twin(x)
    loss_t = torch.nn.functional.cross_entropy(out, targets)
    loss_t.backward()
    named = dict(twin.named_parameters())
    grad_state = {
        k: (named[k].grad if k in named and named[k].grad is not None
            else torch.zeros_like(v, dtype=torch.float32)).numpy()
        for k, v in twin.state_dict().items()}
    state = tw.state_dict_numpy(twin)

    model = case["flax"]()
    xs = jnp.asarray(x.numpy().transpose(0, 2, 1))
    variables = _import_into(model, xs, state, case["mapping"]())
    labels = jnp.asarray(targets.numpy())

    from pvcnn_tpu import ops

    def loss_fn(p):
        logits, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, xs,
            train=True, rngs=RNGS, mutable=["batch_stats"])
        return ops.cross_entropy(logits, labels)

    loss_j, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isclose(float(loss_j), float(loss_t), rtol=5e-3, atol=1e-5)

    want_tree, _ = ci.import_state_dict(
        grad_state, variables["params"], variables["batch_stats"],
        case["mapping"]())
    got = np.concatenate([np.ravel(np.asarray(g, np.float64))
                          for g in jax.tree.leaves(grads)])
    want = np.concatenate([np.ravel(np.asarray(g, np.float64))
                           for g in jax.tree.leaves(want_tree)])
    # fp32 cross-framework noise is amplified discretely (see test_train.py
    # DP-parity rationale): a ~2e-3 activation difference (the measured
    # pvcnn2 train-mode forward noise) can flip a ReLU gate or a max-pool
    # ARGMAX tie, rerouting that element's full upstream gradient between two
    # paths. So: (a) nearly all elements must match against the GLOBAL
    # gradient scale, (b) the flipped fraction must be tiny, (c) total energy
    # of the difference must be small. A structural VJP bug (wrong transpose,
    # mis-indexed scatter) corrupts a large fraction of a whole layer, failing
    # (b)/(c) by orders of magnitude. The weight draw is DETERMINISTIC
    # (torch_twins.randomize re-runs reset_parameters under a seeded RNG —
    # before that fix the draw depended on process history and these bounds
    # saw flip fractions of 0.001-0.018 run to run). Measured on the fixed
    # draw: pvcnn_shapenet 0 flips; pvcnn2_s3dis 0.15% flips / rel_l2 0.041
    # from its ~100 max-pool/FPS stages (bit-identical across processes).
    scale = np.abs(want).max()
    flipped = np.abs(got - want) > 5e-3 * scale
    assert flipped.mean() < 2e-3, flipped.mean()
    rel_l2 = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-30)
    assert rel_l2 < 5e-2, rel_l2


@pytest.mark.slow
@pytest.mark.parametrize("name", ["pvcnn_shapenet", "pvcnn2_s3dis"])
def test_full_model_grad_parity_fp64(name, monkeypatch):
    """fp64 CONTROL for the fp32 gradient-parity bounds above: with both
    frameworks in double precision (weights first rounded to fp32 so the two
    sides start bit-identical) the kink/argmax flips the fp32 test tolerates
    must vanish and the residual must collapse to reduction-order noise.
    A structural VJP defect would NOT shrink with precision — so this test
    pins the fp32 tolerances as fp-noise allowances, not bug headroom."""
    import flax.linen as nn

    monkeypatch.setattr(nn.Dropout, "__call__",
                        lambda self, x, deterministic=None, rng=None: x)
    case = CASES[name]
    twin = tw.randomize(case["twin"](), seed=_seed(name))
    twin = twin.float().double()
    twin.train()
    for mod in twin.modules():
        if isinstance(mod, torch.nn.Dropout):
            mod.eval()
    x = case["input"]().double()
    num_classes = 10 if name == "pvcnn_shapenet" else 13
    targets = torch.from_numpy(
        np.random.RandomState(3).randint(0, num_classes, (B, N)))
    out = twin(x)
    loss_t = torch.nn.functional.cross_entropy(out, targets)
    loss_t.backward()
    named = dict(twin.named_parameters())
    grad_state = {
        k: (named[k].grad if k in named and named[k].grad is not None
            else torch.zeros_like(v, dtype=torch.float64)).numpy()
        for k, v in twin.state_dict().items()}
    state = tw.state_dict_numpy(twin)

    from pvcnn_tpu import ops

    with jax.enable_x64():
        model = case["flax"]()
        xs = jnp.asarray(x.numpy().transpose(0, 2, 1))
        assert xs.dtype == jnp.float64
        variables = _import_into(model, xs, state, case["mapping"]())
        labels = jnp.asarray(targets.numpy())

        def loss_fn(p):
            logits, _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]}, xs,
                train=True, rngs=RNGS, mutable=["batch_stats"])
            return ops.cross_entropy(logits, labels)

        loss_j, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isclose(float(loss_j), float(loss_t), rtol=1e-6, atol=1e-9)

        want_tree, _ = ci.import_state_dict(
            grad_state, variables["params"], variables["batch_stats"],
            case["mapping"]())
        got = np.concatenate([np.ravel(np.asarray(g, np.float64))
                              for g in jax.tree.leaves(grads)])
        want = np.concatenate([np.ravel(np.asarray(g, np.float64))
                               for g in jax.tree.leaves(want_tree)])
    scale = np.abs(want).max()
    # params are fp32-valued (both sides identically), compute is fp64: the
    # only residual is fp32-parameter-storage rounding through fp64 math
    flipped = np.abs(got - want) > 5e-3 * scale
    assert flipped.mean() == 0.0, flipped.mean()
    rel_l2 = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-30)
    assert rel_l2 < 1e-5, rel_l2


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(FRUSTUM_CASES))
def test_frustum_eval_parity(name):
    case = FRUSTUM_CASES[name]
    twin = tw.randomize(case["twin"](), seed=_seed(name))
    twin.eval()
    rng = np.random.RandomState(21)
    feats = rng.randn(B, 4, N).astype(np.float32)
    feats[:, :3] *= 0.35
    one_hot = np.eye(3, dtype=np.float32)[rng.randint(0, 3, B)]
    with torch.no_grad():
        want = twin({"features": torch.from_numpy(feats),
                     "one_hot_vectors": torch.from_numpy(one_hot)},
                    rs=np.random.RandomState(3))
    state = tw.state_dict_numpy(twin)

    model = case["flax"]()
    inputs = {"features": jnp.asarray(feats.transpose(0, 2, 1)),
              "one_hot_vectors": jnp.asarray(one_hot)}
    variables = _import_into(model, inputs, state, case["mapping"]())
    got = _forward(model, variables, inputs, train=False)

    # guard: the deterministic-set argument requires every example's candidate
    # count <= M (here M == N, always true) — see module docstring
    np.testing.assert_array_equal(
        np.asarray(got["mask_logits"]).transpose(0, 2, 1).argmax(1),
        want["mask_logits"].argmax(1).numpy())
    _compare(got["mask_logits"], want["mask_logits"])
    for key in ("center_reg", "center", "heading_scores",
                "heading_residuals_normalized", "heading_residuals",
                "size_scores", "size_residuals_normalized", "size_residuals"):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   want[key].detach().numpy(),
                                   rtol=1e-4, atol=1e-4, err_msg=key)
