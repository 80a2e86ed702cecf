"""S3DIS scene-level sliding-window voting evaluation
(reference: evaluate/s3dis/eval.py).

Protocol: per scene, every h5 window's valid points are repeated + shuffled into
num_votes * ceil(maxP/N) fixed-N sub-clouds; predictions are voted back to the
full-resolution scene points through `indices_split_to_full`, keeping the
max-confidence vote per point; per-class IoU / overall accuracy over all scenes.

TPU adaptation: inference runs in one fixed [B*extra, N, C] jitted program per
(extra_batch, N) signature; the numba vote/stat loops are vectorized numpy.
"""

from __future__ import annotations

import math
import os
import random

import numpy as np

__all__ = ["evaluate", "update_scene_predictions", "update_stats", "print_stats"]


def update_scene_predictions(confidences_v, predictions_v, point_indices_v,
                             scene_confidences, scene_predictions):
    """Flat vote arrays -> per-scene-point max-confidence vote (the reference
    numba loop, eval.py:188-203, via the native C++ reducer with the same
    first-vote-wins tie-breaking)."""
    from pvcnn_tpu import native

    native.vote_reduce_max(confidences_v, predictions_v.astype(np.int64),
                           point_indices_v.astype(np.int64),
                           scene_confidences, scene_predictions)


def update_stats(stats, ground_truth, predictions, scene_index, num_classes):
    stats[0, :, scene_index] += np.bincount(ground_truth,
                                            minlength=num_classes)[:num_classes]
    valid = predictions >= 0
    stats[1, :, scene_index] += np.bincount(predictions[valid],
                                            minlength=num_classes)[:num_classes]
    agree = valid & (ground_truth == predictions)
    stats[2, :, scene_index] += np.bincount(ground_truth[agree],
                                            minlength=num_classes)[:num_classes]


def print_stats(stats):
    stats = stats.sum(axis=-1)
    iou = stats[2] / np.maximum(stats[0] + stats[1] - stats[2], 1)
    print("classes: {}".format("  ".join(
        map("{:>8d}".format, stats[0].astype(np.int64)))))
    print("positiv: {}".format("  ".join(
        map("{:>8d}".format, stats[1].astype(np.int64)))))
    print("truepos: {}".format("  ".join(
        map("{:>8d}".format, stats[2].astype(np.int64)))))
    print("clssiou: {}".format("  ".join(map("{:>8.2f}".format, iou * 100))))
    print("meanAcc: {:4.2f}".format(stats[2].sum() / max(stats[1].sum(), 1) * 100))
    print("meanIoU: {:4.2f}".format(iou.mean() * 100))


def evaluate(configs):
    import h5py
    import jax

    from pvcnn_tpu.train.trainer import Trainer, load_eval_checkpoint

    seed = configs.get("seed") or 0
    random.seed(seed)
    np.random.seed(seed)

    stats_path = configs.evaluate.stats_path
    if os.path.exists(stats_path):
        stats = np.load(stats_path)
        print_stats(stats)
        return stats

    dataset = configs.dataset()[configs.evaluate.dataset.split]
    num_classes = configs.data.num_classes

    model = configs.model()
    import optax

    trainer = Trainer(model, criterion=None, tx=optax.identity(), seed=seed)
    in_channels = 9 if dataset.with_normalized_coords else 6
    state = trainer.init_state(
        np.zeros((1, dataset.num_points, in_channels), np.float32))

    ckpt = configs.evaluate.best_checkpoint_path
    if not os.path.exists(ckpt):
        print(f"==> no checkpoint at {ckpt}")
        return None
    state = load_eval_checkpoint(ckpt, state, model)

    @jax.jit
    def forward(s, x):
        with jax.default_matmul_precision("float32"):  # checkpoint parity
            return jax.nn.softmax(
                model.apply({"params": s.params, "batch_stats": s.batch_stats},
                            x, train=False), axis=-1)

    num_points = dataset.num_points
    eval_batch = int(configs.evaluate.get("batch_size", 10))
    total_num_scenes = len(dataset.scene_list)
    stats = np.zeros((3, num_classes, total_num_scenes))

    for scene_index, (scene, scene_files) in enumerate(dataset.scene_list.items()):
        ground_truth = np.load(os.path.join(scene, "label.npy")).reshape(-1)
        total_scene_points = ground_truth.shape[0]
        confidences = np.zeros(total_scene_points, dtype=np.float32)
        predictions = np.full(total_scene_points, -1, dtype=np.int64)

        for filename in scene_files:
            with h5py.File(filename, "r") as h5f:
                scene_data = h5f["data"][...].astype(np.float32)
                scene_num_points = h5f["data_num"][...].astype(np.int64)
                mapping = h5f["indices_split_to_full"][...].astype(np.int64)

            num_windows, max_points_per_window, num_channels = scene_data.shape
            extra_batch = (configs.evaluate.num_votes
                           * math.ceil(max_points_per_window / num_points))
            total_voted = extra_batch * num_points

            for w0 in range(0, num_windows, eval_batch):
                w1 = min(w0 + eval_batch, num_windows)
                bs = w1 - w0
                inputs = np.zeros((bs, total_voted, num_channels), np.float32)
                shuffled_idx = np.zeros((bs, total_voted), np.int64)
                for wi in range(bs):
                    n_valid = scene_num_points[w0 + wi]
                    reps = math.ceil(total_voted / n_valid)
                    sel = np.tile(np.arange(n_valid), reps)[:total_voted]
                    np.random.shuffle(sel)
                    shuffled_idx[wi] = sel
                    inputs[wi] = scene_data[w0 + wi][sel]

                batch = inputs.reshape(bs * extra_batch, num_points, num_channels)
                true_rows = batch.shape[0]
                pad = (-true_rows) % (eval_batch * extra_batch)
                if pad:
                    batch = np.concatenate(
                        [batch, np.repeat(batch[:1], pad, axis=0)], axis=0)
                probs = np.asarray(forward(state, batch))[:true_rows]
                conf = probs.max(-1).reshape(bs, total_voted)
                pred = probs.argmax(-1).reshape(bs, total_voted)

                for wi in range(bs):
                    point_idx = mapping[w0 + wi][shuffled_idx[wi]]
                    update_scene_predictions(conf[wi], pred[wi], point_idx,
                                             confidences, predictions)

        update_stats(stats, ground_truth, predictions, scene_index, num_classes)

    os.makedirs(os.path.dirname(stats_path) or ".", exist_ok=True)
    np.save(stats_path, stats)
    print_stats(stats)
    return stats
