"""Independent host-numpy twins of the voting evaluation protocols.

The e2e pipeline tests (test_cli.py, test_s3dis_pipeline.py) are
self-consistent but never compare the voting protocols against an
independent implementation. These twins re-execute the reference protocols
(reference: evaluate/shapenet/eval.py:149-201, evaluate/s3dis/eval.py:139-203)
with reference-style scalar loops — tiling + shuffling, variable-size
sub-cloud construction, strictly-greater max-confidence vote reduction,
indices_split_to_full back-mapping, and per-class IoU accumulation — sharing
ONLY the jitted model forward and its fixed-shape chunk/pad adaptation (the
same bytes must reach the model for bit-identical probabilities). The final
stats arrays must match the evaluators' `.eval.npy` EXACTLY: any divergence
isolates a protocol bug, not model noise.
"""

import json
import math
import os
import random
import sys

import numpy as np
import pytest

from tests.test_cli import PART_RANGES, SHAPE_DIRS, SHAPE_NAMES  # noqa: F401

h5py = pytest.importorskip("h5py")


@pytest.fixture(scope="module")
def micro_shapenet(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapenet_twin")
    rng = np.random.RandomState(7)
    with open(root / "synsetoffset2category.txt", "w") as f:
        for name, d in zip(SHAPE_NAMES, SHAPE_DIRS):
            f.write(f"{name}\t{d}\n")
    (root / "train_test_split").mkdir()
    lists = {"train": [], "val": [], "test": []}
    for shape_id in range(2):
        d = SHAPE_DIRS[shape_id]
        (root / d).mkdir()
        lo, hi = PART_RANGES[shape_id]
        for item in range(2):
            n = 96 + 32 * item
            pts = rng.randn(n, 6).astype(np.float32)
            labels = rng.randint(lo, hi, size=(n, 1))
            np.savetxt(root / d / f"item{shape_id}{item}.txt",
                       np.concatenate([pts, labels], axis=1), fmt="%.5f")
            for split in lists:
                lists[split].append(f"shape_data/{d}/item{shape_id}{item}")
    for split, entries in lists.items():
        with open(root / "train_test_split"
                  / f"shuffled_{split}_file_list.json", "w") as f:
            json.dump(entries, f)
    return str(root)


def _run_cli(script, config_rel, tmp_path, extra):
    from pvcnn_tpu.utils import config as config_mod

    config_mod.configs.clear()
    old_argv, old_cwd = sys.argv, os.getcwd()
    os.chdir(tmp_path)
    try:
        import importlib

        sys.argv = [f"{script}.py", os.path.join(old_cwd, config_rel), *extra]
        mod = importlib.import_module(script)
        importlib.reload(mod)
        mod.main()
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)
        config_mod.configs.clear()


def _chunked_probs(forward, state, sub_clouds, eval_batch):
    """The shared fixed-shape TPU inference adaptation: chunk into eval_batch,
    pad partial chunks by repeating the first row, slice back. Must feed the
    model the SAME arrays as the evaluator so probabilities are bit-equal."""
    probs = []
    extra_batch = sub_clouds.shape[0]
    for start in range(0, extra_batch, eval_batch):
        chunk = sub_clouds[start:start + eval_batch]
        true_bs = chunk.shape[0]
        if true_bs < eval_batch:
            pad = np.repeat(chunk[:1], eval_batch - true_bs, axis=0)
            chunk = np.concatenate([chunk, pad], axis=0)
        probs.append(np.asarray(forward(state, chunk))[:true_bs])
    return np.concatenate(probs, axis=0)


@pytest.mark.slow
def test_shapenet_voting_twin(micro_shapenet, tmp_path):
    """Reference-style scalar-loop re-execution of the whole-shape voting
    protocol must reproduce evaluate/shapenet/eval.py's stats EXACTLY."""
    import jax

    _run_cli("train", "configs/shapenet/pvcnn/c0p25.py", tmp_path, [
        f"--configs.dataset.root={micro_shapenet}",
        "--configs.dataset.num_points=32",
        "--configs.train.num_epochs=1",
        "--configs.train.batch_size=8",
        "--configs.train.save_path=run_out",
        "--configs.model.width_multiplier=0.125"])
    _run_cli("train", "configs/shapenet/pvcnn/c0p25.py", tmp_path, [
        f"--configs.dataset.root={micro_shapenet}",
        "--configs.dataset.num_points=32",
        "--configs.train.num_epochs=1",
        "--configs.train.batch_size=8",
        "--configs.train.save_path=run_out",
        "--configs.model.width_multiplier=0.125",
        "--configs.seed=123",
        "--evaluate", "--configs.evaluate.num_votes=3"])
    ours = np.load(tmp_path / "run_out" / "best.eval.npy")

    # ---- independent twin ---------------------------------------------------
    from pvcnn_tpu.data.shapenet import _ShapeNetDataset
    from pvcnn_tpu.models.shapenet import PVCNN
    from pvcnn_tpu.train.trainer import Trainer, load_eval_checkpoint

    num_points, num_votes, eval_batch, seed = 32, 3, 32, 123
    dataset = _ShapeNetDataset(root=micro_shapenet, num_points=num_points,
                               split="test")
    model = PVCNN(num_classes=50, num_shapes=16, extra_feature_channels=3,
                  width_multiplier=0.125)
    import optax

    trainer = Trainer(model, criterion=None, tx=optax.identity(), seed=seed)
    state = trainer.init_state(np.zeros((1, num_points, 22), np.float32))
    state = load_eval_checkpoint(str(tmp_path / "run_out" / "best.ckpt"),
                                 state, model)

    @jax.jit
    def forward(s, x):
        with jax.default_matmul_precision("float32"):
            return jax.nn.softmax(
                model.apply({"params": s.params, "batch_stats": s.batch_stats},
                            x, train=False), axis=-1)

    random.seed(seed)
    np.random.seed(seed)
    stats = np.zeros((16, 2))
    for file_path, shape_id in dataset.file_paths:
        data = np.loadtxt(file_path).astype(np.float32)
        total = data.shape[0]
        # reference normalize: center then divide by max point norm
        coords = data[:, :3]
        coords = coords - coords.mean(axis=0)
        coords = coords / np.max(np.linalg.norm(coords, axis=1))
        gt = data[:, -1].astype(np.int64)
        one_hot = np.zeros((total, 16), np.float32)
        one_hot[:, shape_id] = 1.0
        point_set = np.concatenate([coords, data[:, 3:6], one_hot], axis=-1)

        extra_batch = num_votes * math.ceil(total / num_points)
        total_voted = extra_batch * num_points
        reps = math.ceil(total_voted / total)
        shuffled = np.tile(np.arange(total), reps)[:total_voted]
        np.random.shuffle(shuffled)
        # part class -> owning shape's class range (the reference meter's
        # part_class_to_shape_part_classes table, rebuilt independently)
        start_class, end_class = next(
            r for r in PART_RANGES if r[0] <= int(gt[0]) < r[1])

        sub_clouds = point_set[shuffled].reshape(extra_batch, num_points, -1)
        probs = _chunked_probs(forward, state, sub_clouds, eval_batch)
        probs = probs[:, :, start_class:end_class].reshape(total_voted, -1)

        confidences = np.zeros(total, dtype=np.float32)
        predictions = np.full(total, -1, dtype=np.int64)
        for p in range(total_voted):            # the reference numba loop
            point_index = shuffled[p]
            conf = probs[p].max()
            if conf > confidences[point_index]:
                confidences[point_index] = conf
                predictions[point_index] = probs[p].argmax() + start_class

        iou = 0.0                                # reference update_stats loop
        for i in range(start_class, end_class):
            igt = gt == i
            ipd = predictions == i
            union = int(np.sum(igt | ipd))
            iou += 1.0 if union == 0 else int(np.sum(igt & ipd)) / union
        iou /= end_class - start_class
        stats[shape_id][0] += iou
        stats[shape_id][1] += 1

    np.testing.assert_array_equal(ours, stats)


@pytest.fixture(scope="module")
def s3dis_root(tmp_path_factory):
    raw = tmp_path_factory.mktemp("s3dis_twin_raw")
    out = tmp_path_factory.mktemp("s3dis_twin_prep")
    rng = np.random.RandomState(1)
    for area in ("Area_5", "Area_6"):
        ann = raw / area / "room_1" / "Annotations"
        ann.mkdir(parents=True)
        for name, n in (("chair_1", 600), ("floor_1", 800), ("wall_2", 700)):
            pts = np.concatenate([
                rng.rand(n, 3) * [3.0, 3.0, 2.5],
                rng.randint(0, 255, size=(n, 3)),
            ], axis=1)
            np.savetxt(ann / f"{name}.txt", pts, fmt="%.4f")
    from pvcnn_tpu.data.prepare_s3dis import prepare_labels, prepare_windows

    prepare_labels(str(raw), str(out))
    prepare_windows(str(out), max_num_points=512, block_size=1.5,
                    grid_size=0.1)
    return str(out)


@pytest.mark.slow
def test_s3dis_voting_twin(s3dis_root, tmp_path):
    """Reference-style scalar-loop re-execution of the scene sliding-window
    voting protocol (incl. indices_split_to_full back-mapping) must reproduce
    evaluate/s3dis/eval.py's stats EXACTLY."""
    import jax

    common = [f"--configs.dataset.root={s3dis_root}",
              "--configs.dataset.num_points=128",
              "--configs.train.num_epochs=1",
              "--configs.train.batch_size=8",
              "--configs.train.save_path=run_out"]
    _run_cli("train", "configs/s3dis/pvcnn/area5/c0p125.py", tmp_path, common)
    _run_cli("train", "configs/s3dis/pvcnn/area5/c0p125.py", tmp_path,
             common + ["--configs.seed=123", "--evaluate",
                       "--configs.evaluate.num_votes=2"])
    ours = np.load(tmp_path / "run_out" / "best.eval.npy")

    # ---- independent twin ---------------------------------------------------
    from pvcnn_tpu.data.s3dis import S3DIS
    from pvcnn_tpu.models.s3dis import PVCNN
    from pvcnn_tpu.train.trainer import Trainer, load_eval_checkpoint

    num_points, num_votes, eval_batch, seed, num_classes = 128, 2, 10, 123, 13
    dataset = S3DIS(root=s3dis_root, num_points=num_points,
                    holdout_area=5)["test"]
    model = PVCNN(num_classes=num_classes, extra_feature_channels=6,
                  width_multiplier=0.125)
    import optax

    trainer = Trainer(model, criterion=None, tx=optax.identity(), seed=seed)
    state = trainer.init_state(np.zeros((1, num_points, 9), np.float32))
    state = load_eval_checkpoint(str(tmp_path / "run_out" / "best.ckpt"),
                                 state, model)

    @jax.jit
    def forward(s, x):
        with jax.default_matmul_precision("float32"):
            return jax.nn.softmax(
                model.apply({"params": s.params, "batch_stats": s.batch_stats},
                            x, train=False), axis=-1)

    random.seed(seed)
    np.random.seed(seed)
    stats = np.zeros((3, num_classes, len(dataset.scene_list)))
    for scene_index, (scene, scene_files) in enumerate(
            dataset.scene_list.items()):
        gt = np.load(os.path.join(scene, "label.npy")).reshape(-1)
        confidences = np.zeros(gt.shape[0], dtype=np.float32)
        predictions = np.full(gt.shape[0], -1, dtype=np.int64)
        for filename in scene_files:
            with h5py.File(filename, "r") as h5f:
                scene_data = h5f["data"][...].astype(np.float32)
                scene_num_points = h5f["data_num"][...].astype(np.int64)
                mapping = h5f["indices_split_to_full"][...].astype(np.int64)
            num_windows, max_ppw, num_ch = scene_data.shape
            extra_batch = num_votes * math.ceil(max_ppw / num_points)
            total_voted = extra_batch * num_points
            for w0 in range(0, num_windows, eval_batch):
                w1 = min(w0 + eval_batch, num_windows)
                bs = w1 - w0
                inputs = np.zeros((bs, total_voted, num_ch), np.float32)
                shuffled_idx = np.zeros((bs, total_voted), np.int64)
                for wi in range(bs):
                    n_valid = scene_num_points[w0 + wi]
                    reps = math.ceil(total_voted / n_valid)
                    sel = np.tile(np.arange(n_valid), reps)[:total_voted]
                    np.random.shuffle(sel)
                    shuffled_idx[wi] = sel
                    inputs[wi] = scene_data[w0 + wi][sel]
                batch = inputs.reshape(bs * extra_batch, num_points, num_ch)
                true_rows = batch.shape[0]
                pad = (-true_rows) % (eval_batch * extra_batch)
                if pad:
                    batch = np.concatenate(
                        [batch, np.repeat(batch[:1], pad, axis=0)], axis=0)
                probs = np.asarray(forward(state, batch))[:true_rows]
                conf = probs.max(-1).reshape(bs, total_voted)
                pred = probs.argmax(-1).reshape(bs, total_voted)
                for wi in range(bs):               # reference numba loop
                    point_idx = mapping[w0 + wi][shuffled_idx[wi]]
                    for p in range(total_voted):
                        if conf[wi, p] > confidences[point_idx[p]]:
                            confidences[point_idx[p]] = conf[wi, p]
                            predictions[point_idx[p]] = pred[wi, p]
        for c in range(num_classes):               # reference update_stats
            stats[0, c, scene_index] += int(np.sum(gt == c))
            stats[1, c, scene_index] += int(np.sum(
                (predictions >= 0) & (predictions == c)))
            stats[2, c, scene_index] += int(np.sum(
                (predictions >= 0) & (gt == predictions) & (gt == c)))
    np.testing.assert_array_equal(ours, stats)
