"""ShapeNet whole-shape voting evaluation (reference: evaluate/shapenet/eval.py).

Protocol: for each full-resolution shape, tile + shuffle all P points into
num_votes * ceil(P/N) fixed-N sub-clouds, run the model on every sub-cloud, and for
each original point keep the prediction of its highest-confidence vote (argmax
restricted to the shape's part-class range). Reports per-class and mean IoU and
caches stats to `.eval.npy`.

TPU adaptation: the reference builds one variable-size batch per shape
(eval.py:157-168), which would trigger a recompile per unique shape size under jit;
we run the votes through fixed-size batches (pad + mask) so there is exactly one
compiled program. The vote-reduction inner loops (numba in the reference,
eval.py:176-201) are vectorized numpy here.
"""

from __future__ import annotations

import math
import os
import random

import numpy as np

__all__ = ["evaluate", "update_shape_predictions", "update_stats"]


def update_shape_predictions(vote_confidences, vote_predictions,
                             shuffled_point_indices, shape_confidences,
                             shape_predictions):
    """Keep, per original point, the prediction of its max-confidence vote
    (the reference's numba loop, eval.py:176-185, via the native C++ reducer
    with the same first-vote-wins tie-breaking)."""
    from pvcnn_tpu import native

    native.vote_reduce_max(vote_confidences, vote_predictions.astype(np.int64),
                           shuffled_point_indices.astype(np.int64),
                           shape_confidences, shape_predictions)


def update_stats(stats, ground_truth, predictions, shape_id, start_class,
                 end_class):
    iou = 0.0
    for i in range(start_class, end_class):
        igt = ground_truth == i
        ipd = predictions == i
        union = np.sum(igt | ipd)
        iou += 1.0 if union == 0 else np.sum(igt & ipd) / union
    iou /= end_class - start_class
    stats[shape_id][0] += iou
    stats[shape_id][1] += 1


def evaluate(configs):
    import jax

    from pvcnn_tpu.meters.shapenet import MeterShapeNet
    from pvcnn_tpu.train.trainer import Trainer, load_eval_checkpoint

    seed = configs.get("seed") or 0
    random.seed(seed)
    np.random.seed(seed)

    stats_path = configs.evaluate.stats_path
    if os.path.exists(stats_path):
        stats = np.load(stats_path)
        _print_stats(stats)
        return stats

    dataset = configs.dataset()[configs.evaluate.dataset.split]
    meter = MeterShapeNet()

    model = configs.model()
    trainer = Trainer(model, criterion=None, tx=_dummy_tx(), seed=seed)
    num_points = dataset.num_points
    in_channels = (3 + (3 if dataset.with_normal else 0)
                   + (dataset.num_shapes if dataset.with_one_hot_shape_id else 0))
    state = trainer.init_state(np.zeros((1, num_points, in_channels), np.float32))

    ckpt = configs.evaluate.best_checkpoint_path
    if not os.path.exists(ckpt):
        print(f"==> no checkpoint at {ckpt}")
        return None
    state = load_eval_checkpoint(ckpt, state, model)

    eval_batch = int(configs.evaluate.get("batch_size", 32))

    @jax.jit
    def forward(s, x):
        with jax.default_matmul_precision("float32"):  # checkpoint parity
            return jax.nn.softmax(
                model.apply({"params": s.params, "batch_stats": s.batch_stats},
                            x, train=False), axis=-1)

    from pvcnn_tpu import native

    stats = np.zeros((dataset.num_shapes, 2))
    for file_path, shape_id in dataset.file_paths:
        data = native.loadtxt(file_path)
        total_points = data.shape[0]
        confidences = np.zeros(total_points, dtype=np.float32)
        predictions = np.full(total_points, -1, dtype=np.int64)

        coords = data[:, :3]
        if dataset.normalize:
            coords = dataset.normalize_point_cloud(coords)
        ground_truth = data[:, -1].astype(np.int64)
        columns = [coords]
        if dataset.with_normal:
            columns.append(data[:, 3:6])
        if dataset.with_one_hot_shape_id:
            one_hot = np.zeros((total_points, dataset.num_shapes), np.float32)
            one_hot[:, shape_id] = 1.0
            columns.append(one_hot)
        point_set = np.concatenate(columns, axis=-1)          # [P, C]

        num_votes = configs.evaluate.num_votes
        extra_batch = num_votes * math.ceil(total_points / num_points)
        total_voted = extra_batch * num_points
        num_repeats = math.ceil(total_voted / total_points)
        shuffled = np.tile(np.arange(total_points), num_repeats)[:total_voted]
        np.random.shuffle(shuffled)
        start_class, end_class = meter.part_class_to_shape_part_classes[
            int(ground_truth[0])]

        sub_clouds = point_set[shuffled].reshape(extra_batch, num_points, -1)
        vote_conf = np.zeros(total_voted, dtype=np.float32)
        vote_pred = np.zeros(total_voted, dtype=np.int64)
        for start in range(0, extra_batch, eval_batch):
            chunk = sub_clouds[start:start + eval_batch]
            true_bs = chunk.shape[0]
            if true_bs < eval_batch:                          # pad, keep 1 program
                pad = np.repeat(chunk[:1], eval_batch - true_bs, axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            probs = np.asarray(forward(state, chunk))[:true_bs]
            probs = probs[:, :, start_class:end_class]
            flat = slice(start * num_points, (start + true_bs) * num_points)
            vote_conf[flat] = probs.max(-1).reshape(-1)
            vote_pred[flat] = probs.argmax(-1).reshape(-1) + start_class

        update_shape_predictions(vote_conf, vote_pred, shuffled, confidences,
                                 predictions)
        update_stats(stats, ground_truth, predictions, shape_id, start_class,
                     end_class)

    os.makedirs(os.path.dirname(stats_path) or ".", exist_ok=True)
    np.save(stats_path, stats)
    _print_stats(stats)
    return stats


def _print_stats(stats):
    with np.errstate(invalid="ignore"):
        print("clssIoU: {}".format("  ".join(
            map("{:>8.2f}".format, stats[:, 0] / np.maximum(stats[:, 1], 1) * 100))))
        print("meanIoU: {:4.2f}".format(
            stats[:, 0].sum() / max(stats[:, 1].sum(), 1) * 100))


def _dummy_tx():
    import optax

    return optax.identity()
