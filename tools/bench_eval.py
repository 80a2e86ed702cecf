"""Eval-epoch throughput: time Trainer.evaluate at eval shapes on the real
TPU (VERDICT r3 weak #6 — the pipelined predict path existed but 'eval
doesn't rival the train epoch' was an assumption, not a number).

Synthetic in-memory batches (the input pipeline is measured separately in
tools/bench_input.py); meters are the REAL meters so the host-side update
cost is included — that is exactly what the software pipeline must hide.

    python tools/bench_eval.py            # both configs, one JSON line each
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


class _Batches:
    """Iterable of (inputs, targets) numpy batches, preloaded."""

    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)


def _shapenet():
    from pvcnn_tpu.meters.shapenet import MeterShapeNet
    from pvcnn_tpu.models.shapenet import PVCNN

    model = PVCNN(num_classes=50, num_shapes=16, extra_feature_channels=3,
                  width_multiplier=0.25, dtype="bfloat16")
    rng = np.random.RandomState(0)
    b, n = 64, 2048
    batches = []
    for _ in range(16):
        x = rng.randn(b, n, 22).astype(np.float32)
        y = rng.randint(0, 50, size=(b, n))
        batches.append((x, y))
    return "shapenet_pvcnn_0p25", model, batches, {"iou": MeterShapeNet()}, b * n


def _pvcnn2():
    from pvcnn_tpu.meters.s3dis import MeterS3DIS
    from pvcnn_tpu.models.s3dis import PVCNN2

    model = PVCNN2(num_classes=13, extra_feature_channels=6,
                   width_multiplier=1.0, dtype="float32")
    rng = np.random.RandomState(0)
    b, n = 8, 8192
    batches = []
    for _ in range(16):
        x = rng.randn(b, n, 9).astype(np.float32)
        y = rng.randint(0, 13, size=(b, n))
        batches.append((x, y))
    return "s3dis_pvcnn2_1", model, batches, {
        "iou": MeterS3DIS(metric="iou", num_classes=13),
        "acc": MeterS3DIS(metric="overall", num_classes=13)}, b * n


def main():
    import jax

    try:
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from pvcnn_tpu.nn.loss import CrossEntropyLoss
    from pvcnn_tpu.train.optim import Adam
    from pvcnn_tpu.train.trainer import Trainer

    import jax.numpy as jnp

    from pvcnn_tpu.parallel import mesh as pmesh

    for build in (_shapenet, _pvcnn2):
        name, model, batches, meters, pts = build()
        tx, _ = Adam(1e-3)
        trainer = Trainer(model, CrossEntropyLoss(), tx)
        state = trainer.init_state(batches[0][0][:1])

        # DEVICE eval-step chain (scalar fence): the portable number — e2e
        # evaluate() on the tunneled dev chip is dominated by the ~MB-scale
        # logits fetch through the proxy (docs/PERFORMANCE.md eval section)
        xs = pmesh.shard_batch(batches[0][0], trainer.mesh)
        key = jax.random.PRNGKey(0)

        @jax.jit
        def step_sum(state, xs, key):
            return jnp.sum(trainer._eval_step_impl(state, xs, key).astype(
                jnp.float32))

        def fence(v):
            return float(np.asarray(v))

        sval = step_sum(state, xs, key)
        fence(sval)
        t0 = time.perf_counter()
        fence(sval)
        latency = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(20):
            sval = step_sum(state, xs, key)
        fence(sval)
        dev = max(time.perf_counter() - t0 - latency, 1e-9) / 20

        # end-to-end evaluate() with REAL meters (includes the host fetch)
        trainer.evaluate(state, _Batches(batches[:2]), meters)
        t0 = time.perf_counter()
        trainer.evaluate(state, _Batches(batches), meters)
        per_batch = (time.perf_counter() - t0) / len(batches)
        print(json.dumps({
            "config": name,
            "eval_device_ms_per_batch": round(dev * 1e3, 2),
            "eval_device_points_per_sec": round(pts / dev, 1),
            "eval_e2e_ms_per_batch": round(per_batch * 1e3, 2),
            "eval_e2e_points_per_sec": round(pts / per_batch, 1),
            "batches": len(batches),
        }), flush=True)


if __name__ == "__main__":
    main()
