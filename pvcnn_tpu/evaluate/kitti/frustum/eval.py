"""KITTI frustum detection evaluation from rgb detections
(reference: evaluate/kitti/frustum/eval.py).

Pipeline: run the frustum net over the rgb-detection proposals, decode argmax
heading/size bins into box parameters, un-rotate from the frustum frame back to the
camera frame, write KITTI-format label txt files, then score with the official AP
stack. `num_tests` repeated-seed runs aggregate mean/std/max AP, mirroring the
reference's protocol for its stochastic sampling pipeline (the on-device
logits_mask draws fresh subsets per run).
"""

from __future__ import annotations

import os
import pathlib
import random
import shutil
import time

import numpy as np

from pvcnn_tpu.evaluate.kitti.common import eval_from_files

__all__ = ["evaluate", "update_predictions", "write_predictions"]


def update_predictions(predictions, center, heading, size, rotation_angle,
                       rgb_score, current_step):
    """Decode + un-rotate to camera frame (reference eval.py:226-244)."""
    batch_size = center.shape[0]
    l, w, h = size[:, 0], size[:, 1], size[:, 2]
    x, y, z = center[:, 0], center[:, 1], center[:, 2]
    r = rotation_angle
    v_cos, v_sin = np.cos(r), np.sin(r)
    # inverse frustum rotation (the stored angle is already negated)
    cx = v_cos * x + v_sin * z
    cy = y + h / 2.0
    cz = v_cos * z - v_sin * x
    ry = np.mod(r + heading + np.pi, 2 * np.pi) - np.pi
    predictions[current_step:current_step + batch_size] = np.stack(
        [h, w, l, cx, cy, cz, ry, rgb_score], axis=1)


def write_predictions(prediction_path, ids, classes, boxes_2d, predictions,
                      image_id_file_path=None):
    results: dict = {}
    for i in range(predictions.shape[0]):
        idx = ids[i]
        line = ("{} -1 -1 -10 "
                "{:f} {:f} {:f} {:f} "
                "{:f} {:f} {:f} {:f} {:f} {:f} {:f} {:f}\n").format(
            classes[i], *boxes_2d[i][:4], *predictions[i])
        results.setdefault(idx, []).append(line)

    if os.path.exists(prediction_path):
        shutil.rmtree(prediction_path)
    os.makedirs(prediction_path)
    for k, v in results.items():
        with open(os.path.join(prediction_path, f"{k:06d}.txt"), "w") as f:
            f.writelines(v)

    if image_id_file_path is not None and os.path.exists(image_id_file_path):
        with open(image_id_file_path) as f:
            for idx in f.readlines():
                p = os.path.join(prediction_path, f"{idx.strip()}.txt")
                if not os.path.exists(p):
                    pathlib.Path(p).touch()
        return image_id_file_path
    return sorted(results.keys())


def evaluate(configs):
    import jax
    import optax

    from pvcnn_tpu.data.loader import DataLoader
    from pvcnn_tpu.train.trainer import Trainer, load_eval_checkpoint

    num_tests = int(configs.evaluate.get("num_tests", 1))
    results: dict = {}
    if num_tests > 1:
        stats_path = os.path.join(
            configs.evaluate.stats_path.replace(".npy", ".t"),
            "best.eval.t{}.npy")
        predictions_path = os.path.join(
            configs.evaluate.predictions_path + ".t", "best.predictions.t{}")
        os.makedirs(os.path.dirname(stats_path), exist_ok=True)
        os.makedirs(os.path.dirname(predictions_path), exist_ok=True)

    dataset = configs.dataset()[configs.evaluate.dataset.split]

    model = configs.model()
    trainer = Trainer(model, criterion=None, tx=optax.identity(),
                      has_sample_rng=True)
    example = {
        "features": np.zeros((1, dataset.num_points, 4), np.float32),
        "one_hot_vectors": np.zeros((1, dataset.num_classes), np.float32),
    }
    state = trainer.init_state(example)

    ckpt = configs.evaluate.best_checkpoint_path
    if not os.path.exists(ckpt):
        print(f"==> no checkpoint at {ckpt}")
        return None
    print(f'==> loading checkpoint "{ckpt}"')
    state = load_eval_checkpoint(ckpt, state, model)

    size_templates = np.asarray(configs.data.size_templates).reshape(-1, 3)
    nh = configs.data.num_heading_angle_bins
    bin_centers = np.arange(0, 2 * np.pi, 2 * np.pi / nh)

    for test_index in range(num_tests):
        seed = configs.get("seed") or 0
        if test_index > 0:
            seed = random.randint(1, int(time.time())) % (2**32 - 1)
            print(f"\n==> Test [{test_index:02d}/{num_tests:02d}] seed={seed}")
        random.seed(seed)
        np.random.seed(seed)
        trainer.root_rng = jax.random.PRNGKey(seed)

        if num_tests > 1:
            configs.evaluate.stats_path = stats_path.format(test_index)
            configs.evaluate.predictions_path = predictions_path.format(test_index)

        if os.path.exists(configs.evaluate.stats_path):
            print(f"==> hit {configs.evaluate.stats_path}")
            predictions = np.load(configs.evaluate.stats_path)
        else:
            # num_workers=0: __getitem__ resamples each frustum via the
            # global np.random state seeded above, so the per-test-seed
            # predictions must be order- and scheduling-independent — a
            # thread pool would interleave the draws nondeterministically.
            # Item work here is one choice + 1024-row gather; serial feeds
            # the device rate easily.
            loader = DataLoader(dataset, shuffle=False,
                                batch_size=configs.evaluate.batch_size,
                                seed=seed, num_workers=0)
            predictions = np.zeros((len(dataset), 8))
            current_step = 0
            for inputs, targets in loader:
                outputs = trainer.predict(state, inputs)
                center = np.asarray(outputs["center"])
                heading_scores = np.asarray(outputs["heading_scores"])
                heading_residuals = np.asarray(outputs["heading_residuals"])
                size_scores = np.asarray(outputs["size_scores"])
                size_residuals = np.asarray(outputs["size_residuals"])

                bs = center.shape[0]
                bid = np.arange(bs)
                heading_bin = heading_scores.argmax(-1)
                heading = (bin_centers[heading_bin]
                           + heading_residuals[bid, heading_bin])
                size_bin = size_scores.argmax(-1)
                size = size_templates[size_bin] + size_residuals[bid, size_bin]

                update_predictions(
                    predictions, center, heading, size,
                    np.asarray(targets["rotation_angle"]),
                    np.asarray(targets["rgb_score"]), current_step)
                current_step += bs
            np.save(configs.evaluate.stats_path, predictions)

        image_ids = write_predictions(
            configs.evaluate.predictions_path, ids=dataset.data["ids"],
            classes=dataset.data["class_names"],
            boxes_2d=dataset.data["boxes_2d"], predictions=predictions,
            image_id_file_path=configs.evaluate.image_id_file_path)
        _, current_results = eval_from_files(
            prediction_folder=configs.evaluate.predictions_path,
            ground_truth_folder=configs.evaluate.ground_truth_path,
            image_ids=image_ids, verbose=True)
        if num_tests == 1:
            return current_results
        for class_name, v in current_results.items():
            for kind, r in v.items():
                results.setdefault(class_name, {}).setdefault(kind, []).append(r)

    for class_name, v in results.items():
        print(f"{class_name}  AP(Average Precision)")
        for kind, r in v.items():
            r = np.asarray(r)
            line = ", ".join(
                f"{mv:.2f} +/- {sv:.2f} ({uv:.2f})"
                for mv, sv, uv in zip(r.mean(0), r.std(0), r.max(0)))
            print(f"{kind:<4} AP: {line}")
    return results
