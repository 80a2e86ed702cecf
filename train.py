"""Training entry point: `python train.py configs/shapenet/pvcnn/c0p25.py [...opts]`.

Mirrors the reference CLI (reference: train.py:7-266): executable configs layered by
path chaining, `--configs.x.y=z` dotted overrides, `--evaluate` dispatch to the
config's evaluator, auto-resume from the latest checkpoint, per-epoch eval meters,
and latest/per-epoch/best-per-metric checkpoints. Device selection is JAX-native
(no CUDA_VISIBLE_DEVICES dance): the batch axis is sharded over every visible
device through one jitted step.
"""

from __future__ import annotations

import argparse
import os
import random


def prepare():
    from pvcnn_tpu.utils.common import get_save_path
    from pvcnn_tpu.utils.config import configs

    parser = argparse.ArgumentParser()
    parser.add_argument("configs", nargs="+")
    parser.add_argument("--devices", default=None,
                        help="'cpu' forces the CPU backend; '0,1-3' restricts "
                             "the mesh to those accelerator indices; default "
                             "uses every visible device (reference used "
                             "CUDA_VISIBLE_DEVICES, utils/device.py:6-21)")
    parser.add_argument("--evaluate", default=False, action="store_true")
    args, opts = parser.parse_known_args()
    from pvcnn_tpu.utils.device import select_devices

    configs.devices = select_devices(args.devices)

    print(f"==> loading configs from {args.configs}")
    configs.update_from_modules(*args.configs)
    configs.train.save_path = get_save_path(*args.configs, prefix="runs")
    configs.update_from_arguments(*opts)

    if args.evaluate and configs.evaluate.get("fn") is not None:
        if "dataset" in configs.evaluate:
            for k, v in configs.evaluate.dataset.items():
                configs.dataset[k] = v
    else:
        configs.evaluate = None

    if configs.evaluate is None:
        metrics = []
        if configs.train.get("metric") is not None:
            metrics.append(configs.train.metric)
        for m in configs.train.get("metrics") or ():
            if m not in metrics:
                metrics.append(m)
        configs.train.metrics = metrics
        configs.train.metric = metrics[0] if metrics else None

        save_path = configs.train.save_path
        configs.train.checkpoint_path = os.path.join(save_path, "latest.ckpt")
        configs.train.checkpoints_path = os.path.join(save_path, "latest",
                                                      "e{}.ckpt")
        configs.train.best_checkpoint_path = os.path.join(save_path, "best.ckpt")
        best_dir = os.path.join(save_path, "best")
        configs.train.best_checkpoint_paths = {
            m: os.path.join(best_dir, "best.{}.ckpt".format(m.replace("/", ".")))
            for m in configs.train.metrics
        }
        os.makedirs(os.path.dirname(configs.train.checkpoints_path), exist_ok=True)
        os.makedirs(best_dir, exist_ok=True)
    else:
        if configs.evaluate.get("best_checkpoint_path") is None:
            configs.evaluate.best_checkpoint_path = (
                configs.train.get("best_checkpoint_path")
                or os.path.join(configs.train.save_path, "best.ckpt"))
        ckpt_path = configs.evaluate.best_checkpoint_path
        # native msgpack .ckpt or a released reference .pth.tar (the evaluators
        # dispatch on the extension — trainer.load_eval_checkpoint)
        stem = None
        for ext in (".ckpt", ".pth.tar", ".pth"):
            if ckpt_path.endswith(ext):
                stem = ckpt_path[: -len(ext)]
                break
        assert stem is not None, (
            f"evaluate.best_checkpoint_path must end in .ckpt/.pth.tar/.pth, "
            f"got {ckpt_path!r}")
        configs.evaluate.predictions_path = stem + ".predictions"
        configs.evaluate.stats_path = stem + ".eval.npy"

    return configs


def build_example_inputs(dataset_split):
    """First-sample shapes -> zero batch of size 1 for model init."""
    import jax.tree_util
    import numpy as np

    inputs, _ = dataset_split[0]
    return jax.tree_util.tree_map(
        lambda x: np.zeros((1,) + np.asarray(x).shape, np.asarray(x).dtype), inputs)


def main():
    configs = prepare()
    if configs.evaluate is not None:
        configs.evaluate.fn(configs)
        return

    import numpy as np

    from pvcnn_tpu.data.loader import DataLoader
    from pvcnn_tpu.models.kitti.frustum.frustum_net import FrustumNet
    from pvcnn_tpu.train.trainer import (Trainer, copy_checkpoint,
                                         load_checkpoint, save_checkpoint)

    seed = configs.get("seed") or 0
    random.seed(seed)
    np.random.seed(seed)

    print(configs)

    print(f"\n==> loading dataset")
    dataset = configs.dataset()
    # multi-host: the train split shards rank-strided per process at the
    # local batch size; eval splits replicate (data/loader.py::
    # data_parallel_args; mesh.shard_batch assembles the global batch)
    from pvcnn_tpu.data.loader import data_parallel_args
    loaders = {
        split: DataLoader(dataset[split],
                          shuffle=(split == "train"), seed=seed,
                          num_workers=getattr(configs.data, "num_workers", 0),
                          workers_mode=getattr(configs.data, "workers_mode",
                                               "thread"),
                          **data_parallel_args(configs.train.batch_size,
                                               split))
        for split in dataset
    }

    print(f"\n==> creating model")
    model = configs.model()
    criterion = configs.train.criterion()
    tx, base_lr = configs.train.optimizer()
    scheduler = None
    if configs.train.get("scheduler") is not None:
        scheduler = configs.train.scheduler().bind(base_lr)

    from pvcnn_tpu.parallel import mesh as pmesh

    mesh = (pmesh.make_mesh(devices=configs.devices)
            if configs.get("devices") else None)
    # optional train-step batch presort (configs.train.presort = dict with
    # resolution/normalize/eps of the model's first PVConv — see
    # pvcnn_tpu/train/trainer.py::presort_batch). Training-only optimization;
    # eval keeps the input point order.
    presort = configs.train.get("presort")
    trainer = Trainer(model, criterion, tx, mesh=mesh, seed=seed,
                      has_sample_rng=isinstance(model, FrustumNet),
                      presort=dict(presort) if presort else None)
    train_split = "train" if "train" in dataset else list(dataset)[0]
    state = trainer.init_state(build_example_inputs(dataset[train_split]))

    best_metrics = {m: None for m in configs.train.metrics}
    if os.path.exists(configs.train.checkpoint_path):
        print(f'==> loading checkpoint "{configs.train.checkpoint_path}"')
        state, meters = load_checkpoint(configs.train.checkpoint_path, state)
        for m in configs.train.metrics:
            best_metrics[m] = meters.get(m + "_best", best_metrics[m])

    from pvcnn_tpu.utils.logging import ScalarWriter
    writer = ScalarWriter(configs.train.save_path)

    from pvcnn_tpu.utils.profiler import ThroughputMeter
    throughput = ThroughputMeter()
    profile_dir = (os.path.join(configs.train.save_path, "profile")
                   if configs.train.get("profile") else None)

    if state.epoch + 1 >= configs.train.num_epochs:
        # training already finished: evaluate once and report (reference
        # train.py:221-229)
        meters = {}
        for split, loader in loaders.items():
            if split == "train":
                continue
            split_meters = {k.format(split): meter()
                            for k, meter in configs.train.meters.items()}
            meters.update(trainer.evaluate(state, loader, split_meters))
        for k, v in meters.items():
            print(f"[{k}] = {v:2f}")
        return

    for current_epoch in range(state.epoch + 1, configs.train.num_epochs):
        print(f"\n==> training epoch {current_epoch}/{configs.train.num_epochs}")
        state, mean_loss = trainer.train_epoch(state, loaders[train_split],
                                               scheduler=scheduler, writer=writer,
                                               throughput_meter=throughput,
                                               profile_dir=profile_dir)
        pps = throughput.points_per_sec()
        print(f"[loss/train] = {mean_loss:.6f}  "
              f"[points/sec] = {pps:,.0f}")
        if writer is not None:
            writer.add_scalar("perf/points_per_sec", pps, current_epoch)

        meters = {}
        for split, loader in loaders.items():
            if split == "train":
                continue
            split_meters = {k.format(split): meter()
                            for k, meter in configs.train.meters.items()}
            meters.update(trainer.evaluate(state, loader, split_meters))

        best = {m: False for m in configs.train.metrics}
        for m in configs.train.metrics:
            if best_metrics[m] is None or best_metrics[m] < meters[m]:
                best_metrics[m], best[m] = meters[m], True
            meters[m + "_best"] = best_metrics[m]
        for k, v in meters.items():
            print(f"[{k}] = {v:2f}")
            if writer is not None:
                writer.add_scalar(k, v, current_epoch)

        save_checkpoint(configs.train.checkpoint_path, state, meters)
        copy_checkpoint(configs.train.checkpoint_path,
                        configs.train.checkpoints_path.format(current_epoch))
        for m in configs.train.metrics:
            if best[m]:
                copy_checkpoint(configs.train.checkpoint_path,
                                configs.train.best_checkpoint_paths[m])
        if best.get(configs.train.metric, False):
            copy_checkpoint(configs.train.checkpoint_path,
                            configs.train.best_checkpoint_path)
        print(f"[save_path] = {configs.train.save_path}")

    if writer is not None:
        writer.close()


if __name__ == "__main__":
    main()
