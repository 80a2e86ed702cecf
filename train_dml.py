"""Deep-mutual-learning training entry (reference: train_dml.py).

Two peer models train simultaneously; each one's loss adds a KL term pulling it
toward the (detached) softmax of the other (reference train_dml.py:123-137). On
TPU both models' forward/backward/update run inside ONE jitted, donated step —
the mutual KL is just another term in the fused graph, no second launch or
replica sync. The step lives in pvcnn_tpu.train.trainer.DMLTrainer, which
shares Trainer's epoch loop: partial-batch guard, scalar writer with epoch-end
flush (no per-step host sync), throughput meter, profiling hooks.

Also supports per-iteration cosine scheduling via
`--configs.train.scheduler_unit=iter` like the reference (train_dml.py:236-252).
"""

from __future__ import annotations

import os
import random

from train import build_example_inputs, prepare


def main():
    configs = prepare()
    if configs.evaluate is not None:
        configs.evaluate.fn(configs)
        return

    import numpy as np

    from pvcnn_tpu.data.loader import DataLoader
    from pvcnn_tpu.nn.loss import KLLoss
    from pvcnn_tpu.parallel import mesh as pmesh
    from pvcnn_tpu.train.trainer import (DMLTrainer, Trainer, copy_checkpoint,
                                         load_checkpoint, save_checkpoint)
    from pvcnn_tpu.utils.logging import ScalarWriter
    from pvcnn_tpu.utils.profiler import ThroughputMeter

    deep_mutual_learning = configs.train.get("deep_mutual_learning", True)
    seed = configs.get("seed") or 0
    random.seed(seed)
    np.random.seed(seed)
    print(configs)

    dataset = configs.dataset()
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

    model = configs.model()
    criterion = configs.train.criterion()
    tx, base_lr = configs.train.optimizer()

    mesh = (pmesh.make_mesh(devices=configs.devices)
            if configs.get("devices") else None)
    if deep_mutual_learning:
        tx_student, _ = configs.train.optimizer()
        trainer = DMLTrainer(model, criterion, tx, tx_student, KLLoss(),
                             mesh=mesh, seed=seed)
    else:
        trainer = Trainer(model, criterion, tx, mesh=mesh, seed=seed)
    state = trainer.init_state(build_example_inputs(dataset["train"]))

    # scheduler: per-epoch by default; per-iter stretches T_max by #steps/epoch
    scheduler = None
    scheduler_unit = "epoch"
    if configs.train.get("scheduler") is not None:
        scheduler = configs.train.scheduler().bind(base_lr)
        if configs.train.get("scheduler_unit", "epoch") == "iter":
            scheduler_unit = "iter"
            if hasattr(scheduler, "t_max"):
                scheduler.t_max = (configs.train.num_epochs
                                   * len(loaders["train"]))

    best_metrics = {m: None for m in configs.train.metrics}
    best_metrics_student = {m: None for m in configs.train.metrics}
    student_path = configs.train.checkpoint_path + ".student"
    if os.path.exists(configs.train.checkpoint_path):
        print(f'==> resuming from "{configs.train.checkpoint_path}"')
        if deep_mutual_learning:
            teacher, meters_ck = load_checkpoint(configs.train.checkpoint_path,
                                                 state.teacher)
            state = state.replace(teacher=teacher, epoch=teacher.epoch)
            if os.path.exists(student_path):
                student, meters_s = load_checkpoint(student_path, state.student)
                state = state.replace(student=student)
                for m in configs.train.metrics:
                    best_metrics_student[m] = meters_s.get(
                        m + "_best", best_metrics_student[m])
        else:
            state, meters_ck = load_checkpoint(configs.train.checkpoint_path,
                                               state)
        for m in configs.train.metrics:
            best_metrics[m] = meters_ck.get(m + "_best", best_metrics[m])

    writer = ScalarWriter(configs.train.save_path)
    throughput = ThroughputMeter()

    for current_epoch in range(state.epoch + 1, configs.train.num_epochs):
        print(f"\n==> training epoch {current_epoch}/{configs.train.num_epochs}")
        state, mean_loss = trainer.train_epoch(
            state, loaders["train"], scheduler=scheduler,
            scheduler_unit=scheduler_unit, writer=writer,
            throughput_meter=throughput)
        if isinstance(mean_loss, dict):
            for tag in sorted(mean_loss):
                print(f"[{tag}] = {mean_loss[tag]:.6f}")
        else:
            print(f"[loss/train] = {mean_loss:.6f}")
        pps = throughput.points_per_sec()
        print(f"[points/sec] = {pps:,.0f}")
        writer.add_scalar("perf/points_per_sec", pps, current_epoch)

        meters, meters_student = {}, {}
        for split, loader in loaders.items():
            if split == "train":
                continue
            split_meters = {k.format(split): meter()
                            for k, meter in configs.train.meters.items()}
            if deep_mutual_learning:
                meters.update(trainer.evaluate(state.teacher, loader,
                                               split_meters))
                split_meters_s = {k.format(split): meter()
                                  for k, meter in configs.train.meters.items()}
                meters_student.update(trainer.evaluate(state.student, loader,
                                                       split_meters_s))
            else:
                meters.update(trainer.evaluate(state, loader, split_meters))

        best = {m: False for m in configs.train.metrics}
        best_student = {m: False for m in configs.train.metrics}
        for m in configs.train.metrics:
            if best_metrics[m] is None or best_metrics[m] < meters[m]:
                best_metrics[m], best[m] = meters[m], True
            meters[m + "_best"] = best_metrics[m]
            if deep_mutual_learning:
                if (best_metrics_student[m] is None
                        or best_metrics_student[m] < meters_student[m]):
                    best_metrics_student[m] = meters_student[m]
                    best_student[m] = True
                meters_student[m + "_best"] = best_metrics_student[m]
        for k, v in meters.items():
            print(f"[{k}] = {v:2f}")
            writer.add_scalar(k, v, current_epoch)
        for k, v in meters_student.items():
            print(f"[{k}_student] = {v:2f}")
            writer.add_scalar(k + "_student", v, current_epoch)

        if deep_mutual_learning:
            teacher = state.teacher.replace(epoch=current_epoch)
            student = state.student.replace(epoch=current_epoch)
            state = state.replace(teacher=teacher, student=student)
            save_checkpoint(configs.train.checkpoint_path, teacher, meters)
            save_checkpoint(student_path, student, meters_student)
        else:
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
        if deep_mutual_learning and best_student.get(configs.train.metric, False):
            copy_checkpoint(student_path,
                            os.path.join(configs.train.save_path,
                                         "best_student.ckpt"))
        print(f"[save_path] = {configs.train.save_path}")

    writer.close()


if __name__ == "__main__":
    main()
