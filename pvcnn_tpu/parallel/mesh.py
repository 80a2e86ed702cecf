"""Device mesh + batch sharding: the TPU-native replacement for the reference's
`torch.nn.DataParallel` (reference: train.py:180-182).

One jit region, batch axis sharded over a 1-D `data` mesh; XLA inserts the psum
gradient reduction over ICI automatically. The mesh helper takes any device count so
the same code runs on a real TPU slice or on N virtual CPU devices
(`--xla_force_host_platform_device_count`), which is how multi-chip behavior is
tested without a cluster. A second (currently trivial) `model` axis is left open for
tensor-parallel sharding of future large variants.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "pad_batch", "unpad", "partition_params"]


def make_mesh(num_devices: Optional[int] = None, model_axis: int = 1,
              devices=None) -> Mesh:
    """Build the (data, model) mesh over `devices` (default: all visible).

    `devices` supports the `--devices 0,1-3` CLI subset (utils/device.py),
    the reference's CUDA_VISIBLE_DEVICES analog (ref utils/device.py:6-21)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices) if num_devices is None else num_devices
    assert n % model_axis == 0
    mesh_devices = np.asarray(devices[:n]).reshape(n // model_axis, model_axis)
    return Mesh(mesh_devices, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh):
    """Device-put every array leaf with its leading axis split over `data`.

    Multi-host: each process passes only its LOCAL slice (the rank-strided
    DataLoader shard, data/loader.py::data_parallel_args) and the global
    array is assembled from per-process shards — jax.device_put of a full
    global batch would require every host to hold all the data."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def partition_params(params: Any, mesh: Mesh, min_dim: int = 256):
    """Tensor-parallel parameter layout over the `model` mesh axis.

    Kernels whose output dim is large (>= min_dim) and divisible by the model
    axis are sharded column-wise (P(..., 'model')); everything else replicates.
    With the batch sharded over `data` and these kernels over `model`, XLA
    inserts the matching collectives (all-gather on activations, reduce-scatter
    on their grads) automatically inside the jitted step — this is how variants
    too wide for one chip's HBM would scale, and it is exercised on the virtual
    CPU mesh in tests and the driver's multi-chip dry run.
    """
    model_size = mesh.shape["model"]

    def spec_for(path, x):
        if (model_size > 1 and hasattr(x, "ndim") and x.ndim >= 2
                and path and path[-1].key == "kernel"
                and x.shape[-1] >= min_dim and x.shape[-1] % model_size == 0):
            return NamedSharding(
                mesh, P(*([None] * (x.ndim - 1)), "model"))
        return replicated(mesh)

    import jax.tree_util as jtu

    return jtu.tree_map_with_path(
        lambda path, x: jax.device_put(x, spec_for(path, x)), params)


def pad_batch(batch: Any, multiple: int):
    """Pad the leading axis up to a multiple (for sharded eval on partial batches).

    Returns (padded_batch, true_batch_size)."""
    leaves = jax.tree.leaves(batch)
    bs = leaves[0].shape[0]
    pad = (-bs) % multiple
    if pad == 0:
        return batch, bs
    def _pad(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), widths, mode="edge")
    return jax.tree.map(_pad, batch), bs


def unpad(outputs: Any, true_bs: int):
    return jax.tree.map(lambda x: x[:true_bs], outputs)
