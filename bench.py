"""Throughput benchmark: ShapeNet PVCNN 0.25xC training points/sec/chip.

Prints ONE JSON line. Primary fields {"metric", "value", "unit",
"vs_baseline"} report the headline config (batch 64, bf16 activations — the
throughput-optimal production setting from the batch/precision sweep in
docs/PERFORMANCE.md); `value` is the MEDIAN over independent timed windows and
`spread_pct` is (max-min)/median over those windows, so a single contended
window cannot skew the record (round-1 lesson: one-shot timings drifted 23%
between runs). The `fp32_recipe` field tracks the reference training recipe
(fp32 activations, batch 32) the accuracy-parity claims depend on.

The reference repo publishes no throughput numbers (SURVEY.md §6), so
`vs_baseline` is measured against a fixed documented proxy: 1.0e6 points/sec
for the reference CUDA implementation of this config on an A100-class device
(order-of-magnitude estimate from the paper's GTX1080Ti latencies scaled by
generational speedups). The proxy is a constant so the ratio is comparable
across rounds; BASELINE.json's target of >=5x A100-equivalent corresponds to
vs_baseline >= 5.

Params, BatchNorm statistics, and the optimizer state stay fp32 in both
configs; the evaluators force fp32 matmul precision, so checkpoint-parity
metrics are unaffected by the bf16 headline setting.
"""

from __future__ import annotations

import json
import os
import statistics
import time

import numpy as np

PROXY_BASELINE_POINTS_PER_SEC = 1.0e6

NUM_POINTS = 2048
WARMUP = 5
ITERS = 30
WINDOWS = 5


def _enable_compile_cache():
    """Persistent XLA compilation cache keyed to this repo: the tunneled
    remote-compile service can degrade to 25+ min when queued, so a pre-warmed
    cache makes the bench start-to-JSON time reliable."""
    import jax

    try:
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax / read-only checkout: compile uncached


def _measure(batch_size: int, dtype: str, windows: int = WINDOWS,
             iters: int = ITERS):
    """Median points/sec/chip over `windows` independent timed windows."""
    import jax

    from pvcnn_tpu.models.shapenet import PVCNN
    from pvcnn_tpu.nn.loss import CrossEntropyLoss
    from pvcnn_tpu.parallel import mesh as pmesh
    from pvcnn_tpu.train.optim import Adam
    from pvcnn_tpu.train.trainer import Trainer

    model = PVCNN(num_classes=50, num_shapes=16, extra_feature_channels=3,
                  width_multiplier=0.25, dtype=dtype)
    tx, _ = Adam(1e-3)
    trainer = Trainer(model, CrossEntropyLoss(), tx)

    rng = np.random.RandomState(0)
    inputs = rng.randn(batch_size, NUM_POINTS, 6 + 16).astype(np.float32)
    labels = rng.randint(0, 50, size=(batch_size, NUM_POINTS))

    state = trainer.init_state(inputs[:1])
    batch = pmesh.shard_batch((inputs, labels), trainer.mesh)
    key = jax.random.PRNGKey(0)

    # NOTE: block_until_ready does not synchronize on the tunneled axon
    # backend; a scalar host fetch is the only reliable fence, so each window
    # enqueues `iters` steps and subtracts the measured fence round-trip.
    def fence(x):
        return float(np.asarray(x))

    for _ in range(WARMUP):
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
        n_chips = max(trainer.num_devices, 1)
        rates.append(batch_size * NUM_POINTS * iters / dt / n_chips)
    med = statistics.median(rates)
    spread_pct = 100.0 * (max(rates) - min(rates)) / med if med else 0.0
    return med, spread_pct, rates


def main():
    _enable_compile_cache()
    value, spread, rates = _measure(batch_size=64, dtype="bfloat16")
    fp32_value, fp32_spread, _ = _measure(batch_size=32, dtype="float32",
                                          windows=3)
    print(json.dumps({
        "metric": "shapenet_pvcnn_0p25_train_points_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "points/sec/chip",
        "vs_baseline": round(value / PROXY_BASELINE_POINTS_PER_SEC, 4),
        "spread_pct": round(spread, 2),
        "windows": [round(r, 1) for r in rates],
        "fp32_recipe": {
            "metric": "shapenet_pvcnn_0p25_train_fp32_b32_points_per_sec_per_chip",
            "value": round(fp32_value, 1),
            "spread_pct": round(fp32_spread, 2),
            "vs_baseline": round(fp32_value / PROXY_BASELINE_POINTS_PER_SEC, 4),
        },
    }))


if __name__ == "__main__":
    main()
