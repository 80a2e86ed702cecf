"""Jitted training/eval engine with mesh data parallelism and checkpointing.

Replaces the reference's host-side loop (reference: train.py:96-144) and
DataParallel (train.py:180-182). One jitted train step carries
(params, batch_stats, opt_state); the batch's leading axis is sharded over the
`data` mesh axis so gradients are psum-reduced over ICI by XLA. Checkpoints keep
the reference's latest/per-epoch/best-per-metric layout (train.py:249-261) as
single msgpack files via flax.serialization.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np

from pvcnn_tpu.parallel import mesh as pmesh
from pvcnn_tpu.train.optim import set_learning_rate

__all__ = ["TrainState", "Trainer", "DMLState", "DMLTrainer", "presort_batch",
           "save_checkpoint", "load_checkpoint"]


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    epoch: int = flax.struct.field(pytree_node=False, default=-1)


def _split_batch(batch):
    inputs, targets = batch
    return inputs, targets


def presort_batch(inputs, targets, resolution: int | None = None,
                  normalize: bool = True, eps: float = 0.0,
                  resolutions=None, constant_channels=None):
    """Sort each cloud's points by the FIRST PVConv's devoxelize BASE-corner
    bin, so the devox sorted kernels run with zero permutation gathers
    (ops/devoxelize.py assume_sorted). One packed non-differentiable row
    gather replaces three dispatch-bound ones per step (~-1.6 ms at the
    headline shape); every per-point op downstream is order-agnostic, and the
    per-point labels ride along as an extra channel (exact in f32 for any
    realistic class count), so the loss is unchanged up to fp reduction order.

    `resolutions` lists EVERY PVConv resolution in the model (first entry =
    the sort key). The single sort serves all of them: the finest grid's
    row-major bin order is automatically CLUSTERED by any coarser grid's
    bin tiles (x_{R'} = x_{R0} >> log2(R0/R') exactly, and the sorted
    kernels only need rows grouped per bin tile in tile order — the in-tile
    one-hot locates exact bins), so every resolution group runs the
    zero-gather assume_sorted kernels with NO mid-network re-sorts. Only the
    FINEST norm coords ride the payload gather (computed from the ORIGINAL
    point order — normalize's per-cloud reductions are not bit-stable under
    permutation); each coarser grid's norms are derived per point AFTER the
    gather as min(norm_r0 / k, r - 1), which is BIT-EXACTLY what
    normalize_coords(r) returns for power-of-two k: fl(x*kR) == k*fl(x*R)
    (scaling by 2^m commutes with fp rounding) and the upper clip maps
    through the division (r0-1)/k > r-1. Sort-key math runs in [B, 3, N]
    layout (points on lanes; [B, N, 3]-minor elementwise passes idle 97% of
    vector lanes).

    `constant_channels=(lo, hi)` declares inputs[..., lo:hi] row-constant
    within each cloud (e.g. ShapeNet's tiled one-hot shape id,
    data/shapenet.py): permuting rows of a row-constant slice is the
    identity, so those channels skip the payload gather entirely and are
    reattached as-is (ShapeNet drops the gathered payload 26 -> 10
    channels). The CALLER asserts the constancy contract — a non-constant
    slice silently shuffles features across points.

    Returns (inputs_s, targets_s, norms) with norms a dict
    {resolution: [B, N, 3] sorted norm coords} for the model's `presorted=`
    kwarg. The legacy `resolution=R` form is `resolutions=(R,)`.
    """
    from pvcnn_tpu import ops

    assert not isinstance(inputs, dict) and targets.ndim == 2, \
        "presort supports (features [B,N,C], labels [B,N]) batches"
    rs = tuple(dict.fromkeys(int(r) for r in (resolutions if resolutions
                                              else (resolution,))))
    r0 = rs[0]
    assert all(r0 % r == 0 and (r0 // r) & (r0 // r - 1) == 0 for r in rs), (
        f"presort resolutions {rs} must divide the sort key {r0} by a POWER "
        "OF TWO — fl(x*kR) == k*fl(x*R) (and hence the x-slab clustering "
        "x_R = x_{kR} // k) is only exact for power-of-two k")
    coords = jax.lax.stop_gradient(inputs[..., :3])
    norm0 = ops.normalize_coords(coords, r0, normalize=normalize, eps=eps)[1]
    lo = jnp.floor(jnp.swapaxes(norm0, 1, 2)).astype(jnp.int32)  # [B, 3, N]
    base = (lo[:, 0] * (r0 * r0) + lo[:, 1] * r0
            + lo[:, 2])                 # == ops.corner_base_bins (exactly)
    b, n = base.shape
    _, perm = jax.lax.sort_key_val(
        base, jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n)),
        dimension=1)
    var = inputs
    if constant_channels is not None:
        clo, chi = constant_channels
        var = jnp.concatenate([inputs[..., :clo], inputs[..., chi:]],
                              axis=-1)
    payload = jnp.concatenate(
        [var, norm0, targets[..., None].astype(inputs.dtype)], axis=-1)
    pay = jax.lax.stop_gradient(
        jnp.take_along_axis(payload, perm[..., None], axis=1))
    c = var.shape[-1]
    inputs_s = pay[..., :c]
    if constant_channels is not None:
        inputs_s = jnp.concatenate(
            [inputs_s[..., :clo], inputs[..., clo:chi], inputs_s[..., clo:]],
            axis=-1)
    norm0_s = pay[..., c:c + 3]
    norms_s = {r: (norm0_s if r == r0 else
                   jnp.minimum(norm0_s * (r / r0), float(r - 1)))
               for r in rs}
    targets_s = pay[..., -1].astype(targets.dtype)
    return inputs_s, targets_s, norms_s


class Trainer:
    """Owns the jitted step functions for one (model, criterion, optimizer)."""

    def __init__(self, model, criterion, tx, mesh=None, seed: int = 0,
                 has_sample_rng: bool = False,
                 eval_matmul_precision: str = "float32",
                 tensor_parallel: bool = False,
                 presort: Optional[dict] = None):
        # presort: {"resolutions": (R0, R1, ...), "normalize": bool,
        # "eps": float} — EVERY PVConv resolution of the model, finest first
        # (models.utils.pvconv_resolutions). The train step sorts each cloud
        # ONCE by R0's devox base bin (presort_batch) and the model must
        # accept `presorted=` (a {resolution: norm_coords} dict); coarser
        # grids ride the same sort via the nested-presort contract.
        # Training-only: eval keeps input point order.
        self.presort = presort
        # tensor_parallel: shard wide kernels over the mesh's `model` axis
        # (parallel/mesh.py partition_params); off by default — every reference
        # config fits one chip, data parallelism is the parity story
        self.tensor_parallel = tensor_parallel
        self.model = model
        self.criterion = criterion
        self.tx = tx
        # eval runs at fp32 matmul precision by default: TPU's bf16 default is
        # fine for training but would break released-checkpoint parity metrics
        self.eval_matmul_precision = eval_matmul_precision
        self.mesh = mesh if mesh is not None else pmesh.make_mesh()
        self.num_devices = self.mesh.devices.size
        self.has_sample_rng = has_sample_rng
        self.root_rng = jax.random.PRNGKey(seed)
        self._step_count = 0

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

    # ---- initialization -----------------------------------------------------

    def init_state(self, example_inputs) -> TrainState:
        rngs = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}
        if self.has_sample_rng:
            rngs["sample"] = jax.random.PRNGKey(2)
        variables = self.model.init(rngs, example_inputs, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if self.tensor_parallel:
            params = pmesh.partition_params(params, self.mesh)
            opt_state = jax.jit(self.tx.init)(params)  # inherits param layout
            batch_stats = jax.device_put(batch_stats,
                                         pmesh.replicated(self.mesh))
            return TrainState(params=params, batch_stats=batch_stats,
                              opt_state=opt_state)
        opt_state = self.tx.init(params)
        state = TrainState(params=params, batch_stats=batch_stats,
                           opt_state=opt_state)
        return jax.device_put(state, pmesh.replicated(self.mesh))

    def _rngs(self, rng):
        names = ["dropout"] + (["sample"] if self.has_sample_rng else [])
        keys = jax.random.split(rng, len(names))
        return dict(zip(names, keys))

    # ---- steps --------------------------------------------------------------

    def _train_step_impl(self, state: TrainState, batch, rng):
        inputs, targets = _split_batch(batch)
        apply_kwargs = {}
        if self.presort is not None:
            inputs, targets, pre = presort_batch(inputs, targets,
                                                 **self.presort)
            apply_kwargs["presorted"] = pre

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            outputs, mutated = self.model.apply(
                variables, inputs, train=True, rngs=self._rngs(rng),
                mutable=["batch_stats"], **apply_kwargs)
            return self.criterion(outputs, targets), mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return (TrainState(params=new_params, batch_stats=new_bs,
                           opt_state=new_opt_state, epoch=state.epoch), loss)

    def _eval_step_impl(self, state: TrainState, inputs, rng):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        with jax.default_matmul_precision(self.eval_matmul_precision):
            return self.model.apply(variables, inputs, train=False,
                                    rngs=self._rngs(rng))

    # ---- public API ---------------------------------------------------------

    def _set_lr(self, state, lr: float):
        set_learning_rate(state.opt_state, lr)

    def train_epoch(self, state: TrainState, loader, scheduler=None,
                    writer=None, log_tag: str = "loss/train",
                    throughput_meter=None, profile_dir: str | None = None,
                    profile_steps: int = 5, scheduler_unit: str = "epoch"):
        """Run one epoch. The step's loss may be a scalar or a pytree of named
        scalars ({tag: scalar} — DML); either way NO host fetch happens inside
        the loop: losses stay on device and are fetched once at epoch end
        (a per-step float(loss) for the writer would serialize dispatch with
        execution and forfeit the pipelining the throughput numbers rely on).
        """
        epoch = state.epoch + 1
        if scheduler is not None and scheduler_unit == "epoch":
            self._set_lr(state, scheduler(epoch))
        losses = []
        steps = []
        step_in_epoch = 0
        tracing = False
        for batch in loader:
            leaves = jax.tree.leaves(batch)
            bs = leaves[0].shape[0]
            if bs % self.num_devices != 0:
                # a partial trailing batch cannot shard over the data axis;
                # drop it (the DP-idiomatic adaptation of the reference's
                # keep-partial-batches DataLoader)
                continue
            if scheduler is not None and scheduler_unit == "iter":
                self._set_lr(state, scheduler(self._step_count))
            batch = pmesh.shard_batch(batch, self.mesh)
            self.root_rng, rng = jax.random.split(self.root_rng)
            # profile a span of steps in the first epoch (skip step 0: compile)
            if profile_dir is not None and epoch == 0:
                if step_in_epoch == 1:
                    jax.profiler.start_trace(profile_dir)
                    tracing = True
                elif tracing and step_in_epoch > profile_steps:
                    jax.block_until_ready(jax.tree.leaves(state)[:1])
                    jax.profiler.stop_trace()
                    tracing = False
            state, loss = self._train_step(state, batch, rng)
            losses.append(loss)
            steps.append(self._step_count)
            if throughput_meter is not None:
                throughput_meter.tick(points=bs * leaves[0].shape[1])
            self._step_count += 1
            step_in_epoch += 1
        if tracing:
            jax.block_until_ready(jax.tree.leaves(state)[:1])
            jax.profiler.stop_trace()
        state = state.replace(epoch=epoch)
        if not losses:
            return state, 0.0
        # one device fetch per loss leaf for the whole epoch
        treedef = jax.tree.structure(losses[0])
        stacked = [np.asarray(jax.device_get(jnp.stack(leaf_series)))
                   for leaf_series in zip(*(jax.tree.leaves(l) for l in losses))]
        if writer is not None:
            # dict losses carry their own writer tags (leaves are in
            # sorted-key order, matching jax.tree.leaves on dicts)
            tags = (sorted(losses[0]) if isinstance(losses[0], dict)
                    else [log_tag])
            for leaf_series, tag in zip(stacked, tags):
                for step, val in zip(steps, leaf_series):
                    writer.add_scalar(tag, float(val), step)
        means = [float(np.mean(s)) for s in stacked]
        mean_loss = jax.tree.unflatten(treedef, means)
        if treedef.num_leaves == 1 and not isinstance(mean_loss, dict):
            return state, means[0]
        return state, mean_loss

    def predict(self, state: TrainState, inputs):
        """Eval-mode forward on a (possibly partial) numpy batch."""
        outputs, true_bs = self._predict_device(state, inputs)
        return pmesh.unpad(jax.device_get(outputs), true_bs)

    def _predict_device(self, state: TrainState, inputs):
        """Enqueue one eval step; returns (device outputs, true batch size)
        WITHOUT fetching, so callers can overlap the next batch's compute
        with this batch's host-side work."""
        padded, true_bs = pmesh.pad_batch(inputs, self.num_devices)
        padded = pmesh.shard_batch(padded, self.mesh)
        self.root_rng, rng = jax.random.split(self.root_rng)
        return self._eval_step(state, padded, rng), true_bs

    def evaluate(self, state: TrainState, loader, meters: dict):
        """One-batch software pipeline: batch k's device_get + meter updates
        run while batch k+1 computes on device (the per-batch synchronous
        fetch otherwise serializes eval at PVCNN2 scale — the meters are
        host numpy)."""
        pending = None
        for inputs, targets in loader:
            enqueued = (self._predict_device(state, inputs), targets)
            if pending is not None:
                (out_dev, true_bs), tgt = pending
                outputs = pmesh.unpad(jax.device_get(out_dev), true_bs)
                for meter in meters.values():
                    meter.update(outputs, tgt)
            pending = enqueued
        if pending is not None:
            (out_dev, true_bs), tgt = pending
            outputs = pmesh.unpad(jax.device_get(out_dev), true_bs)
            for meter in meters.values():
                meter.update(outputs, tgt)
        return {k: meter.compute() for k, meter in meters.items()}


@flax.struct.dataclass
class DMLState:
    """Two peer TrainStates trained jointly (deep mutual learning)."""
    teacher: TrainState
    student: TrainState
    epoch: int = flax.struct.field(pytree_node=False, default=-1)


class DMLTrainer(Trainer):
    """Deep-mutual-learning trainer (reference: train_dml.py:107-141).

    Both models' forward/backward/update run inside ONE jitted, donated step;
    each loss adds a KL term toward the (detached) peer softmax. Reuses
    Trainer.train_epoch — partial-batch guard, sharding, profiling, throughput,
    epoch-end scalar flush — by making the step's loss a {tag: scalar} dict.
    """

    def __init__(self, model, criterion, tx, tx_student, criterion_dml,
                 mesh=None, seed: int = 0,
                 eval_matmul_precision: str = "float32"):
        self.tx_student = tx_student
        self.criterion_dml = criterion_dml
        super().__init__(model, criterion, tx, mesh=mesh, seed=seed)

    # ---- state --------------------------------------------------------------

    def init_state(self, example_inputs) -> DMLState:
        def one(param_seed, tx):
            variables = self.model.init(
                {"params": jax.random.PRNGKey(param_seed),
                 "dropout": jax.random.PRNGKey(param_seed + 1)},
                example_inputs, train=False)
            return TrainState(params=variables["params"],
                              batch_stats=variables.get("batch_stats", {}),
                              opt_state=tx.init(variables["params"]))

        state = DMLState(teacher=one(0, self.tx),
                         student=one(100, self.tx_student))
        return jax.device_put(state, pmesh.replicated(self.mesh))

    def _set_lr(self, state: DMLState, lr: float):
        set_learning_rate(state.teacher.opt_state, lr)
        set_learning_rate(state.student.opt_state, lr)

    # ---- step ---------------------------------------------------------------

    def _forward_loss(self, params, batch_stats, inputs, targets, peer_logits,
                      rng):
        variables = {"params": params, "batch_stats": batch_stats}
        outputs, mutated = self.model.apply(variables, inputs, train=True,
                                            rngs={"dropout": rng},
                                            mutable=["batch_stats"])
        loss = self.criterion(outputs, targets)
        if peer_logits is not None:
            loss = loss + self.criterion_dml(peer_logits, outputs)
        return loss, (mutated["batch_stats"], outputs)

    def _train_step_impl(self, state: DMLState, batch, rng):
        inputs, targets = _split_batch(batch)
        r1, r2 = jax.random.split(rng)
        # peer logits (detached inside kl_loss); the same rng is reused in the
        # grad pass so the duplicate forward is CSE'd by XLA and the dropout
        # masks match the reference's single-forward semantics
        t, s = state.teacher, state.student
        _, (_, logits_t) = self._forward_loss(t.params, t.batch_stats, inputs,
                                              targets, None, r1)
        _, (_, logits_s) = self._forward_loss(s.params, s.batch_stats, inputs,
                                              targets, None, r2)

        (loss_t, (bs_t, _)), grads_t = jax.value_and_grad(
            self._forward_loss, has_aux=True)(t.params, t.batch_stats, inputs,
                                              targets, logits_s, r1)
        (loss_s, (bs_s, _)), grads_s = jax.value_and_grad(
            self._forward_loss, has_aux=True)(s.params, s.batch_stats, inputs,
                                              targets, logits_t, r2)

        upd_t, opt_t = self.tx.update(grads_t, t.opt_state, t.params)
        upd_s, opt_s = self.tx_student.update(grads_s, s.opt_state, s.params)
        new_t = TrainState(
            params=jax.tree.map(lambda p, u: p + u, t.params, upd_t),
            batch_stats=bs_t, opt_state=opt_t, epoch=t.epoch)
        new_s = TrainState(
            params=jax.tree.map(lambda p, u: p + u, s.params, upd_s),
            batch_stats=bs_s, opt_state=opt_s, epoch=s.epoch)
        return (DMLState(teacher=new_t, student=new_s, epoch=state.epoch),
                {"loss/train": loss_t, "loss/train_student": loss_s})


# ---- checkpointing ----------------------------------------------------------

def save_checkpoint(path: str, state: TrainState, meters: Optional[dict] = None):
    payload = {
        "epoch": state.epoch,
        "state": flax.serialization.to_state_dict(state),
        "meters": meters or {},
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(
            jax.tree.map(np.asarray, payload)))
    os.replace(tmp, path)


def load_checkpoint(path: str, state: TrainState, restore_opt: bool = True):
    """Restore into the structure of `state`; returns (state, meters).

    restore_opt=False restores only params/batch_stats — the evaluators use it so
    a training checkpoint (with optimizer state) loads into an inference-only
    TrainState built with optax.identity()."""
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    saved = payload["state"]
    if not restore_opt:
        saved = dict(saved)
        saved["opt_state"] = flax.serialization.to_state_dict(state).get(
            "opt_state", {})
    restored = flax.serialization.from_state_dict(state, saved)
    restored = restored.replace(epoch=int(payload["epoch"]))
    return restored, payload.get("meters", {})


def load_eval_checkpoint(path: str, state: TrainState, model):
    """Extension-dispatching checkpoint load for the evaluators: a reference
    torch `.pth.tar`/`.pth` (released checkpoints, reference README.md:129-147)
    goes through utils/checkpoint_import's structural mapping; anything else is
    a native msgpack `.ckpt`. Optimizer state is never restored."""
    if path.endswith((".pth.tar", ".pth")):
        from pvcnn_tpu.utils.checkpoint_import import import_torch_checkpoint

        return import_torch_checkpoint(path, state, model)
    state, _ = load_checkpoint(path, state, restore_opt=False)
    return state


def copy_checkpoint(src: str, dst: str):
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    shutil.copyfile(src, dst)
