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
import numpy as np

from pvcnn_tpu.parallel import mesh as pmesh
from pvcnn_tpu.train.optim import set_learning_rate

__all__ = ["TrainState", "Trainer", "save_checkpoint", "load_checkpoint"]


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    epoch: int = flax.struct.field(pytree_node=False, default=-1)


def _split_batch(batch):
    inputs, targets = batch
    return inputs, targets


class Trainer:
    """Owns the jitted step functions for one (model, criterion, optimizer)."""

    def __init__(self, model, criterion, tx, mesh=None, seed: int = 0,
                 has_sample_rng: bool = False,
                 eval_matmul_precision: str = "float32",
                 tensor_parallel: bool = False):
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

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            outputs, mutated = self.model.apply(
                variables, inputs, train=True, rngs=self._rngs(rng),
                mutable=["batch_stats"])
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

    def train_epoch(self, state: TrainState, loader, scheduler=None,
                    writer=None, log_tag: str = "loss/train",
                    throughput_meter=None, profile_dir: str | None = None,
                    profile_steps: int = 5):
        epoch = state.epoch + 1
        if scheduler is not None:
            set_learning_rate(state.opt_state, scheduler(epoch))
        losses = []
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
            batch = pmesh.shard_batch(batch, self.mesh)
            self.root_rng, rng = jax.random.split(self.root_rng)
            # profile a span of steps in the first epoch (skip step 0: compile)
            if profile_dir is not None and epoch == 0:
                if step_in_epoch == 1:
                    jax.profiler.start_trace(profile_dir)
                    tracing = True
                elif tracing and step_in_epoch > profile_steps:
                    jax.block_until_ready(state.params)
                    jax.profiler.stop_trace()
                    tracing = False
            state, loss = self._train_step(state, batch, rng)
            losses.append(loss)
            if throughput_meter is not None:
                throughput_meter.tick(points=bs * leaves[0].shape[1])
            if writer is not None:
                writer.add_scalar(log_tag, float(loss), self._step_count)
            self._step_count += 1
            step_in_epoch += 1
        if tracing:
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
        state = state.replace(epoch=epoch)
        return state, float(np.mean([float(l) for l in losses])) if losses else 0.0

    def predict(self, state: TrainState, inputs):
        """Eval-mode forward on a (possibly partial) numpy batch."""
        padded, true_bs = pmesh.pad_batch(inputs, self.num_devices)
        padded = pmesh.shard_batch(padded, self.mesh)
        self.root_rng, rng = jax.random.split(self.root_rng)
        outputs = self._eval_step(state, padded, rng)
        return pmesh.unpad(jax.device_get(outputs), true_bs)

    def evaluate(self, state: TrainState, loader, meters: dict):
        for batch in loader:
            inputs, targets = batch
            outputs = self.predict(state, inputs)
            for meter in meters.values():
                meter.update(outputs, targets)
        return {k: meter.compute() for k, meter in meters.items()}


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


def copy_checkpoint(src: str, dst: str):
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    shutil.copyfile(src, dst)
