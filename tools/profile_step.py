"""Trace 3 headline-bench train steps and print per-op durations from xplane."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys
import time

import numpy as np

BATCH = int(os.environ.get("PROF_BATCH", "64"))
DTYPE = os.environ.get("PROF_DTYPE", "bfloat16")
NUM_POINTS = 2048
TRACE_DIR = os.environ.get("PROF_DIR", "/tmp/xtrace")


def fence(x):
    return float(np.asarray(x))


def main():
    import jax

    from pvcnn_tpu.models.shapenet import PVCNN
    from pvcnn_tpu.nn.loss import CrossEntropyLoss
    from pvcnn_tpu.parallel import mesh as pmesh
    from pvcnn_tpu.train.optim import Adam
    from pvcnn_tpu.train.trainer import Trainer

    model = PVCNN(num_classes=50, num_shapes=16, extra_feature_channels=3,
                  width_multiplier=0.25, dtype=DTYPE)
    tx, _ = Adam(1e-3)
    from pvcnn_tpu.utils import knobs

    presort = ({"resolutions": (32, 16), "normalize": False,
                "constant_channels": (6, 22)}
               if knobs.get("PVCNN_TPU_PRESORT") else None)
    trainer = Trainer(model, CrossEntropyLoss(), tx, presort=presort)
    rng = np.random.RandomState(0)
    inputs = rng.randn(BATCH, NUM_POINTS, 6 + 16).astype(np.float32)
    labels = rng.randint(0, 50, size=(BATCH, NUM_POINTS))
    state = trainer.init_state(inputs[:1])
    batch = pmesh.shard_batch((inputs, labels), trainer.mesh)
    key = jax.random.PRNGKey(0)

    for _ in range(5):
        state, loss = trainer._train_step(state, batch, key)
    fence(loss)
    print("warmup done", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        state, loss = trainer._train_step(state, batch, key)
    fence(loss)
    jax.profiler.stop_trace()
    print("trace done", flush=True)


def parse(trace_dir=TRACE_DIR, top=45):
    import glob

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True),
                   key=os.path.getmtime)
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    for plane in xspace.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        print(f"== plane: {plane.name}")
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            evmeta = plane.event_metadata
            totals = {}
            counts = {}
            for ev in line.events:
                name = evmeta[ev.metadata_id].name
                totals[name] = totals.get(name, 0) + ev.duration_ps
                counts[name] = counts.get(name, 0) + 1
            total_all = sum(totals.values())
            print(f"  total device time: {total_all/1e12*1000:.2f} ms "
                  f"({total_all/3e12*1000:.2f} ms/step)")
            for name, ps in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
                print(f"  {ps/3e12*1000:8.3f} ms/step  x{counts[name]:<3} {name[:110]}")
    return


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "parse":
        parse()
    else:
        main()
        parse()
