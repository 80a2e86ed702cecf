"""Deep-mutual-learning training entry (reference: train_dml.py).

Two peer models train simultaneously; each one's loss adds a KL term pulling it
toward the (detached) softmax of the other (reference train_dml.py:123-137). On
TPU both models' forward/backward/update run inside ONE jitted step — the mutual
KL is just another term in the fused graph, no second launch or replica sync.

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

    import jax
    import numpy as np

    from pvcnn_tpu.data.loader import DataLoader
    from pvcnn_tpu.nn.loss import KLLoss
    from pvcnn_tpu.parallel import mesh as pmesh
    from pvcnn_tpu.train.optim import set_learning_rate
    from pvcnn_tpu.train.trainer import (TrainState, copy_checkpoint,
                                         load_checkpoint, save_checkpoint)

    deep_mutual_learning = configs.train.get("deep_mutual_learning", True)
    seed = configs.get("seed") or 0
    random.seed(seed)
    np.random.seed(seed)
    print(configs)

    dataset = configs.dataset()
    loaders = {
        split: DataLoader(dataset[split], batch_size=configs.train.batch_size,
                          shuffle=(split == "train"), seed=seed)
        for split in dataset
    }

    model = configs.model()
    criterion = configs.train.criterion()
    criterion_dml = KLLoss()
    tx, base_lr = configs.train.optimizer()
    tx_student, _ = configs.train.optimizer()

    mesh = pmesh.make_mesh()
    example = build_example_inputs(dataset["train"])

    def init_state(param_seed):
        variables = model.init(
            {"params": jax.random.PRNGKey(param_seed),
             "dropout": jax.random.PRNGKey(param_seed + 1)}, example,
            train=False)
        which_tx = tx if param_seed == 0 else tx_student
        return jax.device_put(
            TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=which_tx.init(variables["params"])),
            pmesh.replicated(mesh))

    state = init_state(0)
    state_student = init_state(100) if deep_mutual_learning else None

    def forward_loss(params, batch_stats, inputs, targets, peer_logits, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        outputs, mutated = model.apply(variables, inputs, train=True,
                                       rngs={"dropout": rng},
                                       mutable=["batch_stats"])
        loss = criterion(outputs, targets)
        if peer_logits is not None:
            loss = loss + criterion_dml(peer_logits, outputs)
        return loss, (mutated["batch_stats"], outputs)

    @jax.jit
    def dml_step(state, state_student, batch, rng):
        inputs, targets = batch
        r1, r2 = jax.random.split(rng)
        # peer logits (detached inside kl_loss); the same rng is reused in the
        # grad pass so the duplicate forward is CSE'd by XLA and the dropout
        # masks match the reference's single-forward semantics
        _, (_, logits_t) = forward_loss(state.params, state.batch_stats, inputs,
                                        targets, None, r1)
        _, (_, logits_s) = forward_loss(state_student.params,
                                        state_student.batch_stats, inputs,
                                        targets, None, r2)

        (loss_t, (bs_t, _)), grads_t = jax.value_and_grad(
            forward_loss, has_aux=True)(state.params, state.batch_stats, inputs,
                                        targets, logits_s, r1)
        (loss_s, (bs_s, _)), grads_s = jax.value_and_grad(
            forward_loss, has_aux=True)(state_student.params,
                                        state_student.batch_stats, inputs,
                                        targets, logits_t, r2)

        upd_t, opt_t = tx.update(grads_t, state.opt_state, state.params)
        upd_s, opt_s = tx_student.update(grads_s, state_student.opt_state,
                                         state_student.params)
        new_t = TrainState(
            params=jax.tree.map(lambda p, u: p + u, state.params, upd_t),
            batch_stats=bs_t, opt_state=opt_t, epoch=state.epoch)
        new_s = TrainState(
            params=jax.tree.map(lambda p, u: p + u, state_student.params, upd_s),
            batch_stats=bs_s, opt_state=opt_s, epoch=state_student.epoch)
        return new_t, new_s, loss_t, loss_s

    @jax.jit
    def single_step(state, batch, rng):
        inputs, targets = batch

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            outputs, mutated = model.apply(variables, inputs, train=True,
                                           rngs={"dropout": rng},
                                           mutable=["batch_stats"])
            return criterion(outputs, targets), mutated["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        upd, opt = tx.update(grads, state.opt_state, state.params)
        return TrainState(params=jax.tree.map(lambda p, u: p + u, state.params,
                                              upd),
                          batch_stats=bs, opt_state=opt,
                          epoch=state.epoch), loss

    @jax.jit
    def eval_step(state, inputs):
        return model.apply({"params": state.params,
                            "batch_stats": state.batch_stats}, inputs,
                           train=False)

    def evaluate(state, loader, split):
        meters = {k.format(split): meter()
                  for k, meter in configs.train.meters.items()}
        for inputs, targets in loader:
            padded, true_bs = pmesh.pad_batch(inputs, mesh.devices.size)
            outputs = pmesh.unpad(
                jax.device_get(eval_step(state, pmesh.shard_batch(padded, mesh))),
                true_bs)
            for meter in meters.values():
                meter.update(outputs, targets)
        return {k: m.compute() for k, m in meters.items()}

    # scheduler: per-epoch by default; per-iter stretches T_max by #steps/epoch
    scheduler = None
    schedule_per_epoch = True
    if configs.train.get("scheduler") is not None:
        scheduler = configs.train.scheduler().bind(base_lr)
        schedule_per_epoch = configs.train.get("scheduler_unit",
                                               "epoch") != "iter"
        if not schedule_per_epoch and hasattr(scheduler, "t_max"):
            scheduler.t_max = configs.train.num_epochs * len(loaders["train"])

    best_metrics = {m: None for m in configs.train.metrics}
    best_metrics_student = {m: None for m in configs.train.metrics}
    if os.path.exists(configs.train.checkpoint_path):
        print(f'==> resuming from "{configs.train.checkpoint_path}"')
        state, meters_ck = load_checkpoint(configs.train.checkpoint_path, state)
        for m in configs.train.metrics:
            best_metrics[m] = meters_ck.get(m + "_best", best_metrics[m])
        student_path = configs.train.checkpoint_path + ".student"
        if deep_mutual_learning and os.path.exists(student_path):
            state_student, meters_s = load_checkpoint(student_path, state_student)
            for m in configs.train.metrics:
                best_metrics_student[m] = meters_s.get(
                    m + "_best", best_metrics_student[m])

    root_rng = jax.random.PRNGKey(seed)
    global_iter = (state.epoch + 1) * len(loaders["train"])

    for current_epoch in range(state.epoch + 1, configs.train.num_epochs):
        print(f"\n==> training epoch {current_epoch}/{configs.train.num_epochs}")
        if scheduler is not None and schedule_per_epoch:
            set_learning_rate(state.opt_state, scheduler(current_epoch))
            if deep_mutual_learning:
                set_learning_rate(state_student.opt_state,
                                  scheduler(current_epoch))
        losses, losses_s = [], []
        for batch in loaders["train"]:
            if scheduler is not None and not schedule_per_epoch:
                set_learning_rate(state.opt_state, scheduler(global_iter))
                if deep_mutual_learning:
                    set_learning_rate(state_student.opt_state,
                                      scheduler(global_iter))
            batch = pmesh.shard_batch(batch, mesh)
            root_rng, rng = jax.random.split(root_rng)
            if deep_mutual_learning:
                state, state_student, loss, loss_s = dml_step(
                    state, state_student, batch, rng)
                losses_s.append(float(loss_s))
            else:
                state, loss = single_step(state, batch, rng)
            losses.append(float(loss))
            global_iter += 1
        state = state.replace(epoch=current_epoch)
        print(f"[loss/train] = {np.mean(losses):.6f}")
        if losses_s:
            print(f"[loss/train_student] = {np.mean(losses_s):.6f}")

        meters, meters_student = {}, {}
        for split, loader in loaders.items():
            if split != "train":
                meters.update(evaluate(state, loader, split))
                if deep_mutual_learning:
                    meters_student.update(evaluate(state_student, loader, split))

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
        for k, v in meters_student.items():
            print(f"[{k}_student] = {v:2f}")

        save_checkpoint(configs.train.checkpoint_path, state, meters)
        if deep_mutual_learning:
            state_student = state_student.replace(epoch=current_epoch)
            save_checkpoint(configs.train.checkpoint_path + ".student",
                            state_student, meters_student)
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
            copy_checkpoint(configs.train.checkpoint_path + ".student",
                            os.path.join(configs.train.save_path,
                                         "best_student.ckpt"))
        print(f"[save_path] = {configs.train.save_path}")


if __name__ == "__main__":
    main()
