"""Time the headline train step under the CURRENT env (one config per process).

Env knobs read at trace time (PVCNN_TPU_DEVOX_PACK_BUILD,
PVCNN_TPU_SORTED_MIN_BINS, PVCNN_TPU_*) are jit-cache-keyed by nothing, so A/B
comparisons MUST run one process per setting:

    PVCNN_TPU_DEVOX_PACK_BUILD=stack python tools/step_time.py
    PVCNN_TPU_SORTED_MIN_BINS=4096  python tools/step_time.py

Prints one JSON line: median ms/step + points/sec over WINDOWS fenced windows
(bench.py methodology: scalar host fetch fence, fence round-trip subtracted).
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

BATCH = int(os.environ.get("ST_BATCH", "64"))
DTYPE = os.environ.get("ST_DTYPE", "bfloat16")
MODEL = os.environ.get("ST_MODEL", "shapenet_pvcnn_0p25")
NUM_POINTS = int(os.environ.get("ST_POINTS", "2048"))
ITERS = int(os.environ.get("ST_ITERS", "30"))
WINDOWS = int(os.environ.get("ST_WINDOWS", "5"))


def build_model():
    if MODEL == "shapenet_pvcnn_0p25":
        from pvcnn_tpu.models.shapenet import PVCNN
        return PVCNN(num_classes=50, num_shapes=16, extra_feature_channels=3,
                     width_multiplier=0.25, dtype=DTYPE), 6 + 16, 50
    if MODEL == "shapenet_pvcnn_1":
        from pvcnn_tpu.models.shapenet import PVCNN
        return PVCNN(num_classes=50, num_shapes=16, extra_feature_channels=3,
                     width_multiplier=1.0, dtype=DTYPE), 6 + 16, 50
    if MODEL == "s3dis_pvcnn_1":
        from pvcnn_tpu.models.s3dis import PVCNN
        return PVCNN(num_classes=13, extra_feature_channels=6,
                     width_multiplier=1.0, dtype=DTYPE), 9, 13
    if MODEL == "s3dis_pvcnn2_1":
        from pvcnn_tpu.models.s3dis import PVCNN2
        return PVCNN2(num_classes=13, extra_feature_channels=6,
                      width_multiplier=1.0, dtype=DTYPE), 9, 13
    raise SystemExit(f"unknown ST_MODEL {MODEL!r}")


def main():
    import jax

    try:  # same persistent compile cache as bench.py: the tunneled
        # remote-compile service degrades to 25+ min when queued
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from pvcnn_tpu.nn.loss import CrossEntropyLoss
    from pvcnn_tpu.parallel import mesh as pmesh
    from pvcnn_tpu.train.optim import Adam
    from pvcnn_tpu.train.trainer import Trainer

    model, in_ch, n_cls = build_model()
    tx, _ = Adam(1e-3)
    presort = None
    from pvcnn_tpu.utils import knobs

    if knobs.get("PVCNN_TPU_PRESORT"):
        presort = {
            "shapenet_pvcnn_0p25": {"resolutions": (32, 16),
                                    "normalize": False,
                                    "constant_channels": (6, 22)},
            "shapenet_pvcnn_1": {"resolutions": (32, 16),
                                 "normalize": False,
                                 "constant_channels": (6, 22)},
            "s3dis_pvcnn_1": {"resolutions": (32, 16), "normalize": True},
        }.get(MODEL)
    trainer = Trainer(model, CrossEntropyLoss(), tx, presort=presort)
    rng = np.random.RandomState(0)
    inputs = rng.randn(BATCH, NUM_POINTS, in_ch).astype(np.float32)
    labels = rng.randint(0, n_cls, size=(BATCH, NUM_POINTS))
    state = trainer.init_state(inputs[:1])
    batch = pmesh.shard_batch((inputs, labels), trainer.mesh)
    key = jax.random.PRNGKey(0)

    def fence(x):
        return float(np.asarray(x))

    for _ in range(5):
        state, loss = trainer._train_step(state, batch, key)
    fence(loss)
    t0 = time.perf_counter()
    fence(loss)
    latency = time.perf_counter() - t0

    ms = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, loss = trainer._train_step(state, batch, key)
        fence(loss)
        dt = max(time.perf_counter() - t0 - latency, 1e-9)
        ms.append(1e3 * dt / ITERS)
    med = statistics.median(ms)
    print(json.dumps({
        "model": MODEL, "batch": BATCH, "dtype": DTYPE,
        "ms_per_step": round(med, 2),
        "points_per_sec": round(BATCH * NUM_POINTS / (med / 1e3), 1),
        "windows_ms": [round(m, 2) for m in ms],
        "env": {k: v for k, v in os.environ.items()
                if k.startswith("PVCNN_TPU_")},
    }), flush=True)


if __name__ == "__main__":
    main()
