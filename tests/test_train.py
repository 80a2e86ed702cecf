"""End-to-end training smoke tests on synthetic data: loss goes down, BatchNorm
stats update, checkpoints round-trip, meters integrate, and the sharded train step
runs on the virtual 8-device CPU mesh."""

import os

import jax
import numpy as np
import pytest

from pvcnn_tpu.data.loader import DataLoader
from pvcnn_tpu.models import s3dis
from pvcnn_tpu.nn.loss import CrossEntropyLoss
from pvcnn_tpu.parallel import mesh as pmesh
from pvcnn_tpu.train.optim import Adam, CosineAnnealingLR
from pvcnn_tpu.train.trainer import (Trainer, load_checkpoint, save_checkpoint)

B, N, C_IN, NUM_CLASSES = 8, 64, 9, 5


class SyntheticSegDataset:
    """Separable toy problem: label depends on sign of a linear feature."""

    def __init__(self, n_items=16, seed=0):
        rng = np.random.RandomState(seed)
        self.items = []
        for _ in range(n_items):
            x = rng.randn(N, C_IN).astype(np.float32)
            y = (x[:, 3] > 0).astype(np.int64) + 2 * (x[:, 4] > 0).astype(np.int64)
            self.items.append((x, y))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


@pytest.mark.slow
def test_loss_decreases_and_stats_update():
    # one flow: train -> meters -> checkpoint -> partial-batch predict, sharing a
    # single compiled trainer (the train step donates its state, so state must be
    # threaded, never reused)
    model = s3dis.PVCNN(num_classes=NUM_CLASSES, extra_feature_channels=6,
                        width_multiplier=0.125)
    tx, base_lr = Adam(1e-2)
    trainer = Trainer(model, CrossEntropyLoss(), tx, seed=0)
    state = trainer.init_state(np.zeros((1, N, C_IN), np.float32))
    loader = DataLoader(SyntheticSegDataset(), batch_size=B, shuffle=True,
                        prefetch=0)
    sched = CosineAnnealingLR(t_max=10).bind(base_lr)
    bs_before = jax.tree.leaves(state.batch_stats)[0].copy()
    losses = []
    for _ in range(4):
        state, mean_loss = trainer.train_epoch(state, loader, scheduler=sched)
        losses.append(mean_loss)
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    bs_after = jax.tree.leaves(state.batch_stats)[0]
    assert not np.allclose(np.asarray(bs_before), np.asarray(bs_after))
    assert state.epoch == 3

    # meters integration
    from pvcnn_tpu.meters.s3dis import MeterS3DIS
    meters = {"acc/iou_test": MeterS3DIS(metric="iou", num_classes=NUM_CLASSES),
              "acc/acc_test": MeterS3DIS(metric="overall",
                                         num_classes=NUM_CLASSES)}
    results = trainer.evaluate(state, loader, meters)
    assert 0 <= results["acc/acc_test"] <= 1

    # checkpoint roundtrip
    path = "/tmp/pvcnn_tpu_test_ckpt/latest.ckpt"
    save_checkpoint(path, state, {"acc/acc_test": results["acc/acc_test"]})
    model2 = s3dis.PVCNN(num_classes=NUM_CLASSES, extra_feature_channels=6,
                         width_multiplier=0.125)
    tx2, _ = Adam(1e-2)
    trainer2 = Trainer(model2, CrossEntropyLoss(), tx2, seed=0)
    state2 = trainer2.init_state(np.zeros((1, N, C_IN), np.float32))
    state2, meters2 = load_checkpoint(path, state2)
    assert state2.epoch == state.epoch
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert meters2["acc/acc_test"] == results["acc/acc_test"]
    os.remove(path)

    # partial batch (3 rows on an 8-device mesh) pads + unpads transparently
    out = trainer.predict(state, np.random.randn(3, N, C_IN).astype(np.float32))
    assert out.shape == (3, N, NUM_CLASSES)


@pytest.mark.slow
def test_dml_trainer_partial_batch_and_writer():
    """DML on the 8-device mesh with a dataset size NOT divisible by the batch
    size: the trailing partial batch must be dropped by the shared epoch loop
    (round-1 bug: the standalone DML loop crashed on it), scalars must flush
    through the writer at epoch end, and both peers must train."""
    from pvcnn_tpu.nn.loss import KLLoss
    from pvcnn_tpu.train.trainer import DMLTrainer

    model = s3dis.PVCNN(num_classes=NUM_CLASSES, extra_feature_channels=6,
                        width_multiplier=0.125)
    tx, _ = Adam(1e-2)
    tx_s, _ = Adam(1e-2)
    trainer = DMLTrainer(model, CrossEntropyLoss(), tx, tx_s, KLLoss(), seed=0)
    state = trainer.init_state(np.zeros((1, N, C_IN), np.float32))
    # 19 items / batch 8 -> batches of 8, 8, 3; the 3-row batch cannot shard
    loader = DataLoader(SyntheticSegDataset(n_items=19), batch_size=B,
                        shuffle=False, prefetch=0)

    class Writer:
        def __init__(self):
            self.scalars = []

        def add_scalar(self, tag, value, step):
            self.scalars.append((tag, float(value), step))

    writer = Writer()
    p_teacher = jax.tree.leaves(state.teacher.params)[0].copy()
    p_student = jax.tree.leaves(state.student.params)[0].copy()
    state, mean_loss = trainer.train_epoch(state, loader, writer=writer)
    assert state.epoch == 0
    assert set(mean_loss) == {"loss/train", "loss/train_student"}
    assert all(np.isfinite(v) for v in mean_loss.values())
    # 2 full batches stepped, 2 tags each
    assert len(writer.scalars) == 4
    assert {t for t, _, _ in writer.scalars} == set(mean_loss)
    # both peers actually updated
    assert not np.allclose(np.asarray(p_teacher),
                           np.asarray(jax.tree.leaves(state.teacher.params)[0]))
    assert not np.allclose(np.asarray(p_student),
                           np.asarray(jax.tree.leaves(state.student.params)[0]))
    # eval path: each peer's TrainState drops into the shared evaluator
    out = trainer.predict(state.teacher, np.random.randn(3, N, C_IN)
                          .astype(np.float32))
    assert out.shape == (3, N, NUM_CLASSES)


@pytest.mark.slow
def test_dp_gradients_match_single_device():
    """One step's LOSS and GRADIENTS on the 8-device data-parallel mesh must
    match the same step on a 1-device mesh with the identical (replicated)
    initial state and full batch — the TPU-native guarantee that mesh DP is
    pure parallelization, not a different program. Raw gradients are the right
    comparison: post-Adam params amplify fp reduction-order noise unboundedly
    (the first Adam step is ~lr*sign(g), so any near-zero grad whose sign flips
    under a different psum order moves a param by 2*lr)."""
    model = s3dis.PVCNN(num_classes=NUM_CLASSES, extra_feature_channels=6,
                        width_multiplier=0.125)
    rng = np.random.RandomState(0)
    batch = (rng.randn(B, N, C_IN).astype(np.float32),
             rng.randint(0, NUM_CLASSES, size=(B, N)))
    results = []
    for n_dev in (8, 1):
        tx, _ = Adam(1e-2)
        trainer = Trainer(model, CrossEntropyLoss(), tx,
                          mesh=pmesh.make_mesh(n_dev), seed=0)
        state = trainer.init_state(np.zeros((1, N, C_IN), np.float32))
        inputs, targets = pmesh.shard_batch(batch, trainer.mesh)

        @jax.jit
        def loss_and_grads(state, inputs, targets, rng):
            def loss_fn(params):
                variables = {"params": params,
                             "batch_stats": state.batch_stats}
                outputs, _ = trainer.model.apply(
                    variables, inputs, train=True, rngs=trainer._rngs(rng),
                    mutable=["batch_stats"])
                return trainer.criterion(outputs, targets)

            return jax.value_and_grad(loss_fn)(state.params)

        loss, grads = loss_and_grads(state, inputs, targets,
                                     jax.random.PRNGKey(7))
        results.append((float(loss), jax.device_get(grads)))
    (loss8, g8), (loss1, g1) = results
    assert np.isclose(loss8, loss1, rtol=1e-5, atol=1e-6)
    # fp32 reduction-order noise is amplified discretely: a BatchNorm sum that
    # differs in its last bits can flip a pre-activation across the LeakyReLU
    # kink, changing that point's backward slope 0.1<->1.0; leaves whose true
    # gradient is a near-zero cancellation residue then differ by ~100%
    # RELATIVE while staying ~1e-5 of the global gradient scale. So compare
    # every leaf against the GLOBAL scale: a real DP bug (per-shard BN stats,
    # a missing gradient reduction) shifts leaves by O(global scale) — and
    # per-shard BN would already fail the exact loss check above.
    a_all = np.concatenate([np.ravel(np.asarray(x, np.float64))
                            for x in jax.tree.leaves(g8)])
    b_all = np.concatenate([np.ravel(np.asarray(x, np.float64))
                            for x in jax.tree.leaves(g1)])
    global_scale = np.abs(b_all).max()
    np.testing.assert_allclose(a_all, b_all, atol=2e-2 * global_scale)
    rel_l2 = np.linalg.norm(a_all - b_all) / np.linalg.norm(b_all)
    assert rel_l2 < 1e-2, rel_l2


def test_presort_derived_coarse_norms_bit_exact():
    """presort_batch derives coarser grids' norm coords from the finest as
    min(norm_r0 * (1/k), r-1); this must be BIT-identical to running
    normalize_coords at r directly and gathering through the sort perm —
    the sortedness promise (and twin parity) tolerates zero drift. Includes
    points far outside the unit box so both clips engage."""
    import jax.numpy as jnp

    from pvcnn_tpu import ops
    from pvcnn_tpu.train.trainer import presort_batch

    rng = np.random.RandomState(0)
    b, n = 2, 256
    inputs = (rng.randn(b, n, 6) * rng.choice([0.01, 1.0, 30.0], (b, n, 1))
              ).astype(np.float32)
    targets = rng.randint(0, 5, size=(b, n))
    for normalize in (True, False):
        _, _, norms = presort_batch(jnp.asarray(inputs), jnp.asarray(targets),
                                    resolutions=(32, 16, 8),
                                    normalize=normalize)
        coords = inputs[..., :3]
        # recover the perm by re-deriving the sort key
        _, n32 = ops.normalize_coords(jnp.asarray(coords), 32,
                                      normalize=normalize)
        lo = np.floor(np.asarray(n32)).astype(np.int64)
        base = lo[..., 0] * 1024 + lo[..., 1] * 32 + lo[..., 2]
        perm = np.argsort(base, axis=1, kind="stable")
        for r in (32, 16, 8):
            _, want = ops.normalize_coords(jnp.asarray(coords), r,
                                           normalize=normalize)
            want = np.take_along_axis(np.asarray(want), perm[..., None],
                                      axis=1)
            np.testing.assert_array_equal(np.asarray(norms[r]), want,
                                          err_msg=f"r={r} norm={normalize}")


def test_presort_step_matches_unsorted():
    """Trainer(presort=...) must train the SAME program: one step's loss and
    updated params on a presorted batch match the plain trainer on the same
    batch (point order is the only difference — every per-point op is
    order-agnostic, so residuals are fp reduction-order noise only). Uses a
    single-PVConv model at a shape where both assume_sorted kernel plans fit
    (N % 256 == 0, R^3 % 512 == 0, C <= 16)."""
    import flax.linen as nn
    import jax.numpy as jnp

    from pvcnn_tpu.nn import PVConv

    b, n, c_in, n_cls, r = 2, 512, 6, 5, 16

    class TinyPV(nn.Module):
        @nn.compact
        def __call__(self, inputs, train=False, presorted=None):
            coords = inputs[..., :3]
            pre = presorted[r] if presorted else None
            f, _ = PVConv(16, resolution=r)(inputs, coords, train=train,
                                            precomputed=pre)
            return nn.Dense(n_cls)(f)

    from pvcnn_tpu.train.trainer import presort_batch

    rng = np.random.RandomState(0)
    batch = (rng.randn(b, n, c_in).astype(np.float32),
             rng.randint(0, n_cls, size=(b, n)))
    # raw LOSS + GRADIENTS are the right comparison (see the DP test above:
    # post-Adam params amplify reduction-order noise unboundedly)
    results = []
    with jax.default_matmul_precision("float32"):
        tx, _ = Adam(1e-2)
        for presort in (None, {"resolution": r, "normalize": True,
                               "eps": 0.0}):
            trainer = Trainer(TinyPV(), CrossEntropyLoss(), tx,
                              mesh=pmesh.make_mesh(1), seed=0,
                              presort=presort)
            state = trainer.init_state(np.zeros((1, n, c_in), np.float32))
            inputs, targets = pmesh.shard_batch(batch, trainer.mesh)
            kw = {}
            if presort is not None:
                inputs, targets, pre = presort_batch(inputs, targets,
                                                     **presort)
                kw["presorted"] = pre

            @jax.jit
            def loss_and_grads(params, inputs, targets):
                def loss_fn(p):
                    variables = {"params": p,
                                 "batch_stats": state.batch_stats}
                    outputs, _ = trainer.model.apply(
                        variables, inputs, train=True,
                        rngs=trainer._rngs(jax.random.PRNGKey(3)),
                        mutable=["batch_stats"], **kw)
                    return trainer.criterion(outputs, targets)

                return jax.value_and_grad(loss_fn)(params)

            loss, grads = loss_and_grads(state.params, inputs, targets)
            results.append((float(loss), jax.device_get(grads)))
    (loss_u, g_u), (loss_s, g_s) = results
    assert np.isclose(loss_u, loss_s, rtol=1e-5, atol=1e-6), (loss_u, loss_s)
    a_all = np.concatenate([np.ravel(np.asarray(x, np.float64))
                            for x in jax.tree.leaves(g_u)])
    b_all = np.concatenate([np.ravel(np.asarray(x, np.float64))
                            for x in jax.tree.leaves(g_s)])
    scale = np.abs(b_all).max()
    np.testing.assert_allclose(a_all, b_all, atol=1e-4 * scale)
    rel_l2 = np.linalg.norm(a_all - b_all) / np.linalg.norm(b_all)
    assert rel_l2 < 1e-4, rel_l2


def test_presort_full_pvcnn_matches_unsorted(monkeypatch):
    """Full ShapeNet PVCNN through the NESTED presort path — one trainer
    sort by the R=32 devox base bin feeding BOTH resolution groups
    (sort_ratio=2 for the R=16 PVConvs) plus avg_voxelize_sorted — must
    compute the same loss and gradients as the plain path (fp reduction
    order aside; dropout is disabled because its masks are per-POSITION, a
    legitimate statistical difference under reordering). Shapes chosen so
    the assume_sorted kernel plans fit."""
    import flax.linen as fnn

    from pvcnn_tpu.models import shapenet
    from pvcnn_tpu.train.trainer import presort_batch

    # the opt-in sorted voxelize ON so its exactness stays test-locked
    monkeypatch.setenv("PVCNN_TPU_AVGVOX_SORTED", "1")
    monkeypatch.setattr(fnn.Dropout, "__call__",
                        lambda self, x, deterministic=None, rng=None: x)

    b, n, n_cls = 2, 512, 10
    model = shapenet.PVCNN(num_classes=n_cls, num_shapes=4,
                           width_multiplier=0.125)
    rng = np.random.RandomState(0)
    batch = (rng.randn(b, n, 6 + 4).astype(np.float32),
             rng.randint(0, n_cls, size=(b, n)))
    results = []
    with jax.default_matmul_precision("float32"):
        tx, _ = Adam(1e-2)
        for presort in (None, {"resolutions": (32, 16),
                               "normalize": False}):
            trainer = Trainer(model, CrossEntropyLoss(), tx,
                              mesh=pmesh.make_mesh(1), seed=0,
                              presort=presort)
            state = trainer.init_state(np.zeros((1, n, 6 + 4), np.float32))
            inputs, targets = pmesh.shard_batch(batch, trainer.mesh)
            kw = {}
            if presort is not None:
                inputs, targets, pre = presort_batch(inputs, targets,
                                                     **presort)
                kw["presorted"] = pre

            @jax.jit
            def loss_and_grads(params, inputs, targets):
                def loss_fn(p):
                    variables = {"params": p,
                                 "batch_stats": state.batch_stats}
                    outputs, _ = trainer.model.apply(
                        variables, inputs, train=True,
                        rngs=trainer._rngs(jax.random.PRNGKey(3)),
                        mutable=["batch_stats"], **kw)
                    return trainer.criterion(outputs, targets)

                return jax.value_and_grad(loss_fn)(params)

            loss, grads = loss_and_grads(state.params, inputs, targets)
            results.append((float(loss), jax.device_get(grads)))
    (loss_u, g_u), (loss_s, g_s) = results
    assert np.isclose(loss_u, loss_s, rtol=1e-5, atol=1e-6), (loss_u, loss_s)
    a_all = np.concatenate([np.ravel(np.asarray(x, np.float64))
                            for x in jax.tree.leaves(g_u)])
    b_all = np.concatenate([np.ravel(np.asarray(x, np.float64))
                            for x in jax.tree.leaves(g_s)])
    scale = np.abs(b_all).max()
    np.testing.assert_allclose(a_all, b_all, atol=5e-4 * scale)
    rel_l2 = np.linalg.norm(a_all - b_all) / np.linalg.norm(b_all)
    assert rel_l2 < 1e-3, rel_l2


@pytest.mark.slow
def test_dp_gradients_match_single_device_fp64():
    """fp64 CONTROL for the fp32 DP bounds above: in double precision the
    8-device-vs-1-device residual must collapse to reduction-order noise
    (no kink flips), pinning the fp32 atol as fp-noise allowance, not bug
    headroom. A real DP defect (per-shard BN, missing psum) would not shrink
    with precision."""
    model = s3dis.PVCNN(num_classes=NUM_CLASSES, extra_feature_channels=6,
                        width_multiplier=0.125)
    rng = np.random.RandomState(0)
    batch = (rng.randn(B, N, C_IN).astype(np.float64),
             rng.randint(0, NUM_CLASSES, size=(B, N)))
    with jax.enable_x64():
        results = []
        for n_dev in (8, 1):
            tx, _ = Adam(1e-2)
            trainer = Trainer(model, CrossEntropyLoss(), tx,
                              mesh=pmesh.make_mesh(n_dev), seed=0)
            state = trainer.init_state(np.zeros((1, N, C_IN), np.float64))
            inputs, targets = pmesh.shard_batch(batch, trainer.mesh)

            @jax.jit
            def loss_and_grads(state, inputs, targets, rng):
                def loss_fn(params):
                    variables = {"params": params,
                                 "batch_stats": state.batch_stats}
                    outputs, _ = trainer.model.apply(
                        variables, inputs, train=True,
                        rngs=trainer._rngs(rng), mutable=["batch_stats"])
                    return trainer.criterion(outputs, targets)

                return jax.value_and_grad(loss_fn)(state.params)

            loss, grads = loss_and_grads(state, inputs, targets,
                                         jax.random.PRNGKey(7))
            results.append((float(loss), jax.device_get(grads)))
    (loss8, g8), (loss1, g1) = results
    assert np.isclose(loss8, loss1, rtol=1e-12, atol=1e-13)
    a_all = np.concatenate([np.ravel(np.asarray(x, np.float64))
                            for x in jax.tree.leaves(g8)])
    b_all = np.concatenate([np.ravel(np.asarray(x, np.float64))
                            for x in jax.tree.leaves(g1)])
    global_scale = np.abs(b_all).max()
    np.testing.assert_allclose(a_all, b_all, atol=1e-9 * global_scale)
    rel_l2 = np.linalg.norm(a_all - b_all) / np.linalg.norm(b_all)
    assert rel_l2 < 1e-9, rel_l2


def test_device_subset_mesh():
    """--devices '1,3-5' style subset selection builds the mesh over exactly
    those devices (reference: utils/device.py:6-21)."""
    from pvcnn_tpu.utils.device import parse_device_spec, select_devices

    assert parse_device_spec("0,2-4") == [0, 2, 3, 4]
    assert parse_device_spec("cpu") == []
    assert parse_device_spec("tpu1,gpu3") == [1, 3]
    devs = select_devices("1,3-5")
    assert devs == [jax.devices()[i] for i in (1, 3, 4, 5)]
    mesh = pmesh.make_mesh(devices=devs)
    assert mesh.devices.size == 4
    x = np.arange(4 * 2, dtype=np.float32).reshape(4, 2)
    sx = pmesh.shard_batch(x, mesh)
    assert sx.sharding.device_set == set(devs)
    with pytest.raises(ValueError):
        select_devices("0,99")


@pytest.mark.slow
def test_multichip_mesh_sharding():
    assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_batch_is_actually_sharded():
    mesh = pmesh.make_mesh(8)
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    sx = pmesh.shard_batch(x, mesh)
    assert len(sx.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in sx.addressable_shards}
    assert shard_shapes == {(1, 4)}


def test_presort_constant_channels_exact():
    """presort_batch(constant_channels=(lo, hi)) must return bit-identical
    outputs to the full payload gather when inputs[..., lo:hi] is row-constant
    per cloud (the ShapeNet one-hot shape id contract, data/shapenet.py)."""
    from pvcnn_tpu.train.trainer import presort_batch

    rng = np.random.RandomState(3)
    b, n = 4, 256
    feats = rng.randn(b, n, 6).astype(np.float32)
    onehot = np.zeros((b, n, 16), np.float32)
    for i in range(b):
        onehot[i, :, rng.randint(16)] = 1.0
    inputs = np.concatenate([feats, onehot], axis=-1)
    targets = rng.randint(0, 50, size=(b, n))
    a_in, a_tg, a_nm = presort_batch(inputs, targets, resolutions=(32, 16),
                                     normalize=False)
    c_in, c_tg, c_nm = presort_batch(inputs, targets, resolutions=(32, 16),
                                     normalize=False,
                                     constant_channels=(6, 22))
    np.testing.assert_array_equal(np.asarray(a_in), np.asarray(c_in))
    np.testing.assert_array_equal(np.asarray(a_tg), np.asarray(c_tg))
    for r in a_nm:
        np.testing.assert_array_equal(np.asarray(a_nm[r]),
                                      np.asarray(c_nm[r]))


def test_fused_adam_matches_per_leaf_exactly():
    """Fused (flat-vector) Adam must be numerically IDENTICAL to the per-leaf
    optax chain on a realistic pytree: mixed dtypes (f32 + bf16 group), many
    odd-shaped leaves, L2 weight decay, and a mid-run LR change through
    set_learning_rate. Adam is elementwise, so for f32 (the training dtype of
    every model here) the concat/split bookkeeping must not change a single
    bit. bf16 leaves are allowed 1 ULP: optax's scale_by_adam rounds the
    moments to bf16 at a different point of the bias-correction math."""
    import jax.numpy as jnp
    import optax

    from pvcnn_tpu.train.optim import set_learning_rate

    rng = np.random.RandomState(7)
    shapes = [(3, 5), (64,), (1, 1, 7), (2, 3, 4), (128, 9)]
    params = {
        f"w{i}": jnp.asarray(rng.randn(*s).astype(np.float32))
        for i, s in enumerate(shapes)
    }
    params["bf"] = jnp.asarray(rng.randn(16, 4), jnp.bfloat16)
    lr, wd = 1e-2, 3e-2

    tx_f, _ = Adam(lr, weight_decay=wd, fused=True)
    tx_p, _ = Adam(lr, weight_decay=wd, fused=False)
    p_f, p_p = params, params
    s_f, s_p = tx_f.init(p_f), tx_p.init(p_p)
    for k in range(5):
        if k == 3:  # epoch-scheduler path
            set_learning_rate(s_f, 2e-3)
            set_learning_rate(s_p, 2e-3)
        grads = jax.tree.map(
            lambda p: jnp.asarray(rng.randn(*p.shape), p.dtype), p_f)
        u_f, s_f = tx_f.update(grads, s_f, p_f)
        u_p, s_p = tx_p.update(grads, s_p, p_p)
        p_f = optax.apply_updates(p_f, u_f)
        p_p = optax.apply_updates(p_p, u_p)
        for key in params:
            a = np.asarray(p_f[key], np.float32)
            b = np.asarray(p_p[key], np.float32)
            if p_f[key].dtype == jnp.bfloat16:
                np.testing.assert_allclose(a, b, rtol=0.0079, atol=0,
                                           err_msg=f"step {k} leaf {key}")
            else:
                np.testing.assert_array_equal(a, b,
                                              err_msg=f"step {k} leaf {key}")


def test_adam_leaf_count_dispatch():
    """Adam's default (fused=None) picks the flat-vector form at init for
    small trees and the per-leaf chain above _FUSED_ADAM_MAX_LEAVES (the
    118-leaf Frustum pipeline measured 3.1 ms SLOWER fused, round 5) —
    and both dispatch branches produce identical updates."""
    import jax.numpy as jnp
    import optax

    from pvcnn_tpu.train.optim import (_FUSED_ADAM_MAX_LEAVES,
                                       FusedAdamState)

    small = {f"w{i}": jnp.ones((4,)) * (i + 1) for i in range(5)}
    big = {f"w{i}": jnp.ones((4,)) * (i + 1)
           for i in range(_FUSED_ADAM_MAX_LEAVES + 1)}
    tx, _ = Adam(1e-2, weight_decay=1e-2)

    def inner(state):  # peel inject_hyperparams + chain wrappers
        return jax.tree.leaves(
            state.inner_state, is_leaf=lambda x: isinstance(
                x, FusedAdamState))

    s_small = tx.init(small)
    assert any(isinstance(x, FusedAdamState) for x in inner(s_small))
    s_big = tx.init(big)
    assert not any(isinstance(x, FusedAdamState) for x in inner(s_big))

    # dispatch branches agree with the explicit forms bitwise
    for params, forced in ((small, True), (big, False)):
        tx_f, _ = Adam(1e-2, weight_decay=1e-2, fused=forced)
        grads = jax.tree.map(lambda p: p * 0.1, params)
        ua, sa = tx.update(grads, tx.init(params), params)
        ub, sb = tx_f.update(grads, tx_f.init(params), params)
        for a, b in zip(jax.tree.leaves(ua), jax.tree.leaves(ub)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_adam_state_checkpoint_roundtrip(tmp_path):
    """FusedAdamState (NamedTuple of tuples) must survive the msgpack
    state-dict roundtrip used by save/load_checkpoint."""
    import flax
    import jax.numpy as jnp

    params = {"a": jnp.ones((4, 3)), "b": jnp.zeros((7,))}
    tx, _ = Adam(1e-3, weight_decay=1e-2)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    _, state = tx.update(grads, state, params)
    blob = flax.serialization.to_bytes(state)
    fresh = tx.init(params)
    restored = flax.serialization.from_bytes(fresh, blob)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_graft_entry_single():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[0].shape[0], args[0].shape[1], 50)


@pytest.mark.slow
def test_tensor_parallel_partitioning():
    """2-D mesh: wide kernels sharded over `model`, step still runs."""
    mesh = pmesh.make_mesh(8, model_axis=2)
    model = s3dis.PVCNN(num_classes=NUM_CLASSES, extra_feature_channels=6,
                        width_multiplier=1.0)
    # per-leaf Adam: fused would concat differently-sharded leaves
    tx, _ = Adam(1e-3, fused=False)
    trainer = Trainer(model, CrossEntropyLoss(), tx, mesh=mesh, seed=0,
                      tensor_parallel=True)
    state = trainer.init_state(np.zeros((1, N, C_IN), np.float32))
    # at width 1.0 the 1024-wide blocks must be sharded over the model axis
    sharded = [
        p for p in jax.tree.leaves(
            jax.tree.map(lambda x: x.sharding.spec, state.params,
                         is_leaf=lambda x: hasattr(x, "sharding")))
        if "model" in str(p)
    ]
    assert sharded, "no parameter was tensor-parallel sharded"
    rng = np.random.RandomState(0)
    batch = pmesh.shard_batch(
        (rng.randn(8, N, C_IN).astype(np.float32),
         rng.randint(0, NUM_CLASSES, size=(8, N))), mesh)
    state, loss = trainer._train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
