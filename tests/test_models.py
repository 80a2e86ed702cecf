"""Smoke tests: every model family initializes, runs forward in train and eval modes,
and produces the right shapes. Tiny widths/points so the suite stays fast on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvcnn_tpu.models import s3dis, shapenet
from pvcnn_tpu.models.kitti import frustum as kitti_frustum

B, N = 2, 128
NUM_CLASSES, NUM_SHAPES = 10, 4



def _seed(name: str) -> int:
    """Deterministic per-case seed. Python's built-in str hash is SALTED per
    process (PYTHONHASHSEED), which made twin weights differ run-to-run and
    the fp32 flip-fraction bounds flaky at their boundary."""
    import zlib

    return zlib.crc32(name.encode()) % 2**31

def init_and_apply(model, inputs, rngs_extra=()):
    rngs = {"params": jax.random.PRNGKey(0)}
    for name in ("dropout",) + tuple(rngs_extra):
        rngs[name] = jax.random.PRNGKey(_seed(name))
    variables = model.init(rngs, inputs, train=False)
    apply_rngs = {k: v for k, v in rngs.items() if k != "params"}
    out_eval = model.apply(variables, inputs, train=False, rngs=apply_rngs)
    out_train, mutated = model.apply(
        variables, inputs, train=True, rngs={k: v for k, v in rngs.items()
                                             if k != "params"},
        mutable=["batch_stats"])
    return out_eval, out_train, variables, mutated


def rand_inputs(rng, channels):
    x = rng.randn(B, N, channels).astype(np.float32)
    return jnp.asarray(x)


class TestSplitDense:
    def test_shared_mlp_list_equals_concat(self, rng):
        """SharedMLP on a list of segments == SharedMLP on their concat:
        identical param tree (checkpoints transfer), matching outputs and
        gradients; a [B, 1, C] segment broadcasts like its tile."""
        from pvcnn_tpu.nn.shared_mlp import SharedMLP

        xs = [jnp.asarray(rng.randn(B, N, c).astype(np.float32))
              for c in (4, 7, 16)]
        glob = jnp.asarray(rng.randn(B, 1, 9).astype(np.float32))
        cat = jnp.concatenate(xs + [jnp.tile(glob, (1, N, 1))], axis=-1)

        mlp = SharedMLP([12, 8])
        v_list = mlp.init(jax.random.PRNGKey(0), xs + [glob], train=False)
        v_cat = mlp.init(jax.random.PRNGKey(0), cat, train=False)
        assert (jax.tree_util.tree_structure(v_list)
                == jax.tree_util.tree_structure(v_cat))
        for a, b in zip(jax.tree.leaves(v_list), jax.tree.leaves(v_cat)):
            assert a.shape == b.shape

        with jax.default_matmul_precision("float32"):
            y_list = mlp.apply(v_cat, xs + [glob], train=False)
            y_cat = mlp.apply(v_cat, cat, train=False)
            np.testing.assert_allclose(np.asarray(y_list), np.asarray(y_cat),
                                       rtol=1e-5, atol=1e-5)

            def loss_list(v):
                return jnp.sum(mlp.apply(v, xs + [glob], train=False) ** 2)

            def loss_cat(v):
                return jnp.sum(mlp.apply(v, cat, train=False) ** 2)

            g_list = jax.grad(loss_list)(v_cat)
            g_cat = jax.grad(loss_cat)(v_cat)
        for a, b in zip(jax.tree.leaves(g_list), jax.tree.leaves(g_cat)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


class TestShapeNetModels:
    def test_pvcnn(self, rng):
        model = shapenet.PVCNN(num_classes=NUM_CLASSES, num_shapes=NUM_SHAPES,
                               width_multiplier=0.125)
        x = rand_inputs(rng, 6 + NUM_SHAPES)
        out_eval, out_train, _, mutated = init_and_apply(model, x)
        assert out_eval.shape == (B, N, NUM_CLASSES)
        assert out_train.shape == (B, N, NUM_CLASSES)
        assert "batch_stats" in mutated

    def test_pointnet(self, rng):
        model = shapenet.PointNet(num_classes=NUM_CLASSES, num_shapes=NUM_SHAPES,
                                  with_transformer=True, width_multiplier=0.125)
        x = rand_inputs(rng, 3 + NUM_SHAPES)
        out_eval, out_train, _, _ = init_and_apply(model, x)
        assert out_eval.shape == (B, N, NUM_CLASSES)

    @pytest.mark.parametrize("factory", [shapenet.pointnet2_ssg,
                                         shapenet.pointnet2_msg])
    @pytest.mark.slow
    def test_pointnet2(self, rng, factory):
        model = factory(num_classes=NUM_CLASSES, num_shapes=NUM_SHAPES,
                        width_multiplier=0.25)
        x = rand_inputs(rng, 6 + NUM_SHAPES)
        out_eval, _, _, _ = init_and_apply(model, x)
        assert out_eval.shape == (B, N, NUM_CLASSES)


class TestS3DISModels:
    def test_pvcnn(self, rng):
        model = s3dis.PVCNN(num_classes=13, extra_feature_channels=6,
                            width_multiplier=0.125)
        x = rand_inputs(rng, 9)
        out_eval, _, _, _ = init_and_apply(model, x)
        assert out_eval.shape == (B, N, 13)

    @pytest.mark.slow
    def test_pvcnn2(self, rng):
        model = s3dis.PVCNN2(num_classes=13, extra_feature_channels=6,
                             width_multiplier=0.25)
        x = rand_inputs(rng, 9)
        out_eval, _, _, _ = init_and_apply(model, x)
        assert out_eval.shape == (B, N, 13)

    def test_pointnet(self, rng):
        model = s3dis.PointNet(num_classes=13, extra_feature_channels=6,
                               width_multiplier=0.25)
        x = rand_inputs(rng, 9)
        out_eval, _, _, _ = init_and_apply(model, x)
        assert out_eval.shape == (B, N, 13)

    @pytest.mark.slow
    def test_pvcnn2_bf16_activations(self, rng):
        # mixed precision: dtype="bfloat16" runs activations in bf16 while
        # params and BatchNorm statistics stay fp32 (opt in with
        # --configs.model.dtype="bfloat16")
        model = s3dis.PVCNN2(num_classes=13, extra_feature_channels=6,
                             width_multiplier=0.25, dtype="bfloat16")
        x = rand_inputs(rng, 9)
        out_eval, out_train, variables, mutated = init_and_apply(model, x)
        assert out_eval.shape == (B, N, 13)
        assert np.all(np.isfinite(np.asarray(out_eval, dtype=np.float32)))
        for leaf in jax.tree.leaves(variables["params"]):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(mutated["batch_stats"]):
            assert leaf.dtype == jnp.float32


SIZE_TEMPLATES = tuple(tuple(float(v) for v in row)
                       for row in np.abs(np.random.RandomState(7).randn(8, 3)) + 1.0)


class TestFrustumModels:
    def _inputs(self, rng):
        return {
            "features": rand_inputs(rng, 4),
            "one_hot_vectors": jnp.asarray(np.eye(3, dtype=np.float32)[
                rng.randint(0, 3, size=(B,))]),
        }

    @pytest.mark.parametrize("factory", [kitti_frustum.FrustumPointNet,
                                         kitti_frustum.FrustumPVCNNE,
                                         kitti_frustum.FrustumPointNet2])
    @pytest.mark.slow
    def test_forward(self, rng, factory):
        model = factory(num_classes=3, num_heading_angle_bins=12,
                        num_size_templates=8, num_points_per_object=32,
                        size_templates=SIZE_TEMPLATES, width_multiplier=0.25)
        inputs = self._inputs(rng)
        out_eval, out_train, _, _ = init_and_apply(model, inputs,
                                                   rngs_extra=("sample",))
        assert out_eval["mask_logits"].shape == (B, N, 2)
        assert out_eval["center"].shape == (B, 3)
        assert out_eval["heading_scores"].shape == (B, 12)
        assert out_eval["heading_residuals"].shape == (B, 12)
        assert out_eval["size_scores"].shape == (B, 8)
        assert out_eval["size_residuals"].shape == (B, 8, 3)

    def test_loss(self, rng):
        from pvcnn_tpu.nn import FrustumPointNetLoss
        model = kitti_frustum.FrustumPointNet(
            num_classes=3, num_heading_angle_bins=12, num_size_templates=8,
            num_points_per_object=32, size_templates=SIZE_TEMPLATES,
            width_multiplier=0.25)
        inputs = self._inputs(rng)
        out_eval, _, _, _ = init_and_apply(model, inputs, rngs_extra=("sample",))
        targets = {
            "mask_logits": jnp.asarray(rng.randint(0, 2, size=(B, N))),
            "center": jnp.asarray(rng.randn(B, 3).astype(np.float32)),
            "heading_bin_id": jnp.asarray(rng.randint(0, 12, size=(B,))),
            "heading_residual": jnp.asarray(rng.randn(B).astype(np.float32) * 0.1),
            "size_template_id": jnp.asarray(rng.randint(0, 8, size=(B,))),
            "size_residual": jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.1),
        }
        criterion = FrustumPointNetLoss(
            num_heading_angle_bins=12, num_size_templates=8,
            size_templates=np.asarray(SIZE_TEMPLATES))
        loss = criterion(out_eval, targets)
        assert np.isfinite(float(loss))


class TestConv3d:
    def test_custom_wgrad_matches_xla_grads(self, rng):
        """conv3d_same's hand-written backward (nn/conv3d.py) must match
        XLA's autodiff of the same convolution for both operands."""
        import jax
        import jax.numpy as jnp
        from pvcnn_tpu.nn.conv3d import _conv, conv3d_same

        x = jnp.asarray(rng.randn(2, 5, 6, 7, 4).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, 3, 4, 8).astype(np.float32))
        co = jnp.asarray(rng.randn(2, 5, 6, 7, 8).astype(np.float32))

        def f_custom(x, k):
            return jnp.sum(conv3d_same(x, k) * co)

        def f_xla(x, k):
            return jnp.sum(_conv(x, k) * co)

        gx1, gk1 = jax.grad(f_custom, argnums=(0, 1))(x, k)
        gx2, gk2 = jax.grad(f_xla, argnums=(0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2),
                                   rtol=1e-4, atol=1e-4)

    def test_conv3d_same_module_param_names(self, rng):
        """Param structure must match flax nn.Conv ('kernel'/'bias' under
        Conv_{i}) so checkpoint-import mappings keep working."""
        import jax
        from pvcnn_tpu.nn.pvconv import PVConv

        m = PVConv(out_channels=8, resolution=4)
        feats = jnp.asarray(rng.randn(1, 32, 4).astype(np.float32))
        coords = jnp.asarray(rng.randn(1, 32, 3).astype(np.float32))
        vs = m.init({"params": jax.random.PRNGKey(0)}, feats, coords)
        params = vs["params"]
        assert "Conv_0" in params and "Conv_1" in params
        assert set(params["Conv_0"].keys()) == {"kernel", "bias"}
        assert params["Conv_0"]["kernel"].shape == (3, 3, 3, 4, 8)
