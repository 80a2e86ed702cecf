"""Input-pipeline throughput: can the host loader feed the device step rate?

Synthesizes realistic on-disk datasets (S3DIS h5 windows at prepared scale,
ShapeNet whitespace .txt clouds), then measures the REAL DataLoader's
sustained batch rate (a) standalone and (b) overlapped with a simulated
device step of --step-ms (the loader prefetches while the "device" runs, as
in Trainer.train_epoch). The verdict per config is the % overhead the input
pipeline adds on top of the pure step time — reference trains with 16
loader processes (configs/__init__.py:8); ours uses a thread pool
(data/loader.py num_workers).

Usage:  python tools/bench_input.py [--step-ms 34.7] [--workers 0 8 16]
Prints one JSON line; numbers recorded in docs/PERFORMANCE.md.
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def make_s3dis(root, areas=2, rooms=3, windows=40, max_pts=8192):
    """Write prepared-format h5 windows directly (layout of
    data/prepare_s3dis.py: data [W, P, 9] f32, label_seg, data_num,
    indices_split_to_full)."""
    import h5py

    rng = np.random.RandomState(0)
    for a in range(areas):
        for r in range(rooms):
            room = os.path.join(root, f"Area_{a + 5}", f"room_{r}")
            os.makedirs(room, exist_ok=True)
            n_full = windows * max_pts
            np.save(os.path.join(room, "label.npy"),
                    rng.randint(0, 13, size=n_full).astype(np.int64))
            for offset in ("zero", "half"):
                with h5py.File(os.path.join(room, f"{offset}_0.h5"), "w") as f:
                    f.create_dataset(
                        "data", data=rng.rand(windows, max_pts, 9)
                        .astype(np.float32))
                    f.create_dataset(
                        "label_seg", data=rng.randint(
                            0, 13, size=(windows, max_pts)).astype(np.int64))
                    f.create_dataset(
                        "data_num", data=np.full(windows, max_pts, np.int64))
                    f.create_dataset(
                        "indices_split_to_full", data=rng.randint(
                            0, n_full, size=(windows, max_pts))
                        .astype(np.int64))


def make_shapenet(root, classes=4, files=60, pts=2600):
    rng = np.random.RandomState(0)
    synsets = [f"{i:08d}" for i in range(classes)]
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "synsetoffset2category.txt"), "w") as f:
        for i, s in enumerate(synsets):
            f.write(f"class{i}\t{s}\n")
    for s in synsets:
        d = os.path.join(root, s)
        os.makedirs(d, exist_ok=True)
        for j in range(files):
            data = np.concatenate([
                rng.randn(pts, 6).astype(np.float32),
                rng.randint(0, 6, size=(pts, 1)).astype(np.float32)], axis=1)
            np.savetxt(os.path.join(d, f"{j:06d}.txt"), data, fmt="%.6f")
    for split in ("train", "test", "val"):
        os.makedirs(os.path.join(root, "train_test_split"), exist_ok=True)
        names = [f"shape_data/{s}/{j:06d}" for s in synsets
                 for j in range(files)]
        with open(os.path.join(root, "train_test_split",
                               f"shuffled_{split}_file_list.json"), "w") as f:
            json.dump(names, f)


def time_loader(loader, step_s=0.0, epochs=1):
    """-> (batches/sec standalone-or-overlapped, n_batches). With step_s > 0
    the main thread sleeps per batch like a device step; the measured rate
    then shows what an epoch actually sustains."""
    n = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for _ in loader:
            if step_s:
                time.sleep(step_s)
            n += 1
    dt = time.perf_counter() - t0
    return n / dt, n


def bench_config(name, loader_fn, batch_points, step_ms, workers_list,
                 modes=("thread",)):
    out = {}
    for mode in modes:
        for w in workers_list:
            if w == 0 and mode != modes[0]:
                continue                       # serial is mode-independent
            loader = loader_fn(w, mode)
            rate, n = time_loader(loader)  # standalone epoch 1 (cold IO)
            rate2, _ = time_loader(loader)  # epoch 2 (OS page cache warm)
            ov_rate, _ = time_loader(loader, step_s=step_ms / 1e3)
            step_rate = 1e3 / step_ms
            tag = f"workers_{w}" if w == 0 else f"{mode}_workers_{w}"
            out[tag] = {
                "loader_batches_per_s_cold": round(rate, 2),
                "loader_batches_per_s_warm": round(rate2, 2),
                "loader_points_per_s_warm": round(rate2 * batch_points, 0),
                "epoch_overhead_pct": round(
                    100.0 * (step_rate / min(ov_rate, step_rate) - 1.0), 1),
            }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step-ms", type=float, default=34.7,
                    help="device step time to overlap against")
    ap.add_argument("--workers", type=int, nargs="*", default=[0, 8, 16])
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    os.environ["PVCNN_TPU_LOADER_FORCE_WORKERS"] = "1"  # measure pools as-is
    from pvcnn_tpu.data.loader import DataLoader

    tmp = tempfile.mkdtemp(prefix="bench_input_")
    record = {"step_ms": args.step_ms, "host_cores": os.cpu_count()}
    try:
        s3dis_root = os.path.join(tmp, "s3dis")
        make_s3dis(s3dis_root)
        from pvcnn_tpu.data.s3dis import S3DIS
        ds = S3DIS(root=s3dis_root, num_points=4096, split="train",
                   holdout_area=5)["train"]
        record["s3dis_pvcnn_b32x4096"] = bench_config(
            "s3dis", lambda w, m: DataLoader(ds, batch_size=32, shuffle=True,
                                             num_workers=w, workers_mode=m),
            32 * 4096, args.step_ms, args.workers)

        ds2 = S3DIS(root=s3dis_root, num_points=8192, split="train",
                    holdout_area=5)["train"]
        record["s3dis_pvcnn2_b8x8192"] = bench_config(
            "s3dis2", lambda w, m: DataLoader(ds2, batch_size=8, shuffle=True,
                                              num_workers=w, workers_mode=m),
            8 * 8192, args.step_ms, args.workers)

        sn_root = os.path.join(tmp, "shapenet")
        make_shapenet(sn_root)
        from pvcnn_tpu.data.shapenet import ShapeNet
        dsn = ShapeNet(root=sn_root, num_points=2048, split="train")["train"]
        record["shapenet_b64x2048"] = bench_config(
            "shapenet", lambda w, m: DataLoader(dsn, batch_size=64,
                                                shuffle=True, num_workers=w,
                                                workers_mode=m),
            64 * 2048, args.step_ms, args.workers,
            modes=("thread", "process"))
    finally:
        if not args.keep:
            shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
