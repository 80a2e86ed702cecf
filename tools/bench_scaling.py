"""Multi-chip weak-scaling harness: points/sec/chip vs mesh size.

The reference has no multi-device benchmark (its DataParallel is single-node
scatter/gather, SURVEY.md §2.3); this records the TPU-native story — the same
jitted train step over an n-device `jax.sharding` data mesh, per-chip batch
held constant (weak scaling), bench.py's fence methodology.

On hardware with >= 2 accelerators it sweeps n = 1, 2, 4, ... device_count on
the real backend — run it unchanged the day a multi-chip slice appears. With
one real chip (or none), it forces an 8-device virtual CPU mesh instead: the
timings are not TPU numbers, but the sweep exercises the exact sharded
programs and records the collective-overhead shape (ICI-free upper bound on
DP loss).

Prints one JSON line per mesh size:
  {"metric": "scaling_points_per_sec_per_chip", "n_chips": n, "value": ...,
   "platform": ..., "per_chip_batch": ..., "spread_pct": ...}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NUM_POINTS = 2048
WARMUP = 5
ITERS = 10
WINDOWS = 3
# CPU-virtual smoke shrinks everything: absolute numbers are meaningless there,
# only the sharded-program sweep and the efficiency shape matter
CPU_SMOKE = dict(num_points=256, per_chip_batch=1, warmup=2, iters=3,
                 windows=2, sweep=(1, 8))


def _force_cpu_mesh(n_devices: int):
    import jax

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    try:
        import jax._src.xla_bridge as xb

        if xb.backends_are_initialized():
            from jax.extend.backend import clear_backends

            clear_backends()
    except Exception:
        pass
    jax.config.update("jax_platforms", "cpu")


def measure(n_chips: int, per_chip_batch: int, dtype: str,
            num_points: int = NUM_POINTS, warmup: int = WARMUP,
            iters: int = ITERS, windows: int = WINDOWS):
    import jax

    from pvcnn_tpu.models.shapenet import PVCNN
    from pvcnn_tpu.nn.loss import CrossEntropyLoss
    from pvcnn_tpu.parallel import mesh as pmesh
    from pvcnn_tpu.train.optim import Adam
    from pvcnn_tpu.train.trainer import Trainer

    batch_size = per_chip_batch * n_chips
    model = PVCNN(num_classes=50, num_shapes=16, extra_feature_channels=3,
                  width_multiplier=0.25, dtype=dtype)
    tx, _ = Adam(1e-3)
    trainer = Trainer(model, CrossEntropyLoss(), tx,
                      mesh=pmesh.make_mesh(n_chips))

    rng = np.random.RandomState(0)
    inputs = rng.randn(batch_size, num_points, 6 + 16).astype(np.float32)
    labels = rng.randint(0, 50, size=(batch_size, num_points))
    state = trainer.init_state(inputs[:1])
    batch = pmesh.shard_batch((inputs, labels), trainer.mesh)
    key = jax.random.PRNGKey(0)

    def fence(x):  # block_until_ready doesn't sync on the tunneled backend
        return float(np.asarray(x))

    for _ in range(warmup):
        state, loss = trainer._train_step(state, batch, key)
    fence(loss)
    t0 = time.perf_counter()
    fence(loss)
    latency = time.perf_counter() - t0

    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss = trainer._train_step(state, batch, key)
        fence(loss)
        dt = max(time.perf_counter() - t0 - latency, 1e-9)
        rates.append(batch_size * num_points * iters / dt / n_chips)
    med = statistics.median(rates)
    return med, 100.0 * (max(rates) - min(rates)) / med if med else 0.0


def main():
    # honor an explicit CPU request BEFORE touching jax.devices(): probing the
    # axon backend grabs the (exclusive) TPU tunnel even when we then run on
    # CPU, hanging any concurrent TPU job
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        _force_cpu_mesh(max(CPU_SMOKE["sweep"]))
    import jax

    real = [d for d in jax.devices() if d.platform != "cpu"]
    if len(real) >= 2:
        platform, dtype = real[0].platform, "bfloat16"
        sweep, kw = [], {}
        n = 1
        while n <= len(real):
            sweep.append(n)
            n *= 2
        per_chip_batch = 64
    else:
        # single chip / no accelerator: virtual CPU mesh smoke
        _force_cpu_mesh(max(CPU_SMOKE["sweep"]))
        platform, dtype = "cpu-virtual", "float32"
        sweep = list(CPU_SMOKE["sweep"])
        per_chip_batch = CPU_SMOKE["per_chip_batch"]
        kw = dict(num_points=CPU_SMOKE["num_points"],
                  warmup=CPU_SMOKE["warmup"], iters=CPU_SMOKE["iters"],
                  windows=CPU_SMOKE["windows"])

    results = []
    for n in sweep:
        value, spread = measure(n, per_chip_batch, dtype, **kw)
        rec = {"metric": "scaling_points_per_sec_per_chip", "n_chips": n,
               "value": round(value, 1), "unit": "points/sec/chip",
               "platform": platform, "per_chip_batch": per_chip_batch,
               "dtype": dtype, "spread_pct": round(spread, 2)}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    if len(results) > 1:
        eff = results[-1]["value"] / results[0]["value"]
        print(json.dumps({"metric": "weak_scaling_efficiency",
                          "n_chips": results[-1]["n_chips"],
                          "value": round(eff, 4)}), flush=True)


if __name__ == "__main__":
    main()
