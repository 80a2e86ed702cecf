"""End-to-end CLI test: train one epoch of ShapeNet PVCNN on a fabricated
micro-dataset through `train.py` config loading, then run the voting evaluator
through the `--evaluate` path. Covers L7 (CLI) -> L6 (configs) -> ... -> L0."""

import json
import os
import sys

import numpy as np
import pytest

SHAPE_DIRS = [f"{2690000 + i:08d}" for i in range(16)]
SHAPE_NAMES = ["Airplane", "Bag", "Cap", "Car", "Chair", "Earphone", "Guitar",
               "Knife", "Lamp", "Laptop", "Motorbike", "Mug", "Pistol",
               "Rocket", "Skateboard", "Table"]
PART_RANGES = [(0, 4), (4, 6), (6, 8), (8, 12), (12, 16), (16, 19), (19, 22),
               (22, 24), (24, 28), (28, 30), (30, 36), (36, 38), (38, 41),
               (41, 44), (44, 47), (47, 50)]


@pytest.fixture(scope="module")
def micro_shapenet(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapenet")
    rng = np.random.RandomState(0)
    with open(root / "synsetoffset2category.txt", "w") as f:
        for name, d in zip(SHAPE_NAMES, SHAPE_DIRS):
            f.write(f"{name}\t{d}\n")
    (root / "train_test_split").mkdir()
    lists = {"train": [], "val": [], "test": []}
    for shape_id in range(2):  # two shape categories, two items each
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


def _run_train(micro_shapenet, tmp_path, extra=()):
    from pvcnn_tpu.utils import config as config_mod

    # the configs singleton is module-global state; reset per invocation
    config_mod.configs.clear()
    old_argv, old_cwd = sys.argv, os.getcwd()
    os.chdir(tmp_path)
    try:
        sys.argv = ["train.py", os.path.join(old_cwd,
                                             "configs/shapenet/pvcnn/c0p25.py"),
                    f"--configs.dataset.root={micro_shapenet}",
                    "--configs.dataset.num_points=32",
                    "--configs.train.num_epochs=1",
                    "--configs.train.batch_size=8",
                    "--configs.train.save_path=run_out",
                    "--configs.model.width_multiplier=0.125",
                    *extra]
        import importlib

        import train as train_cli
        importlib.reload(train_cli)
        train_cli.main()
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)
        config_mod.configs.clear()


@pytest.mark.slow
def test_train_dml_cli(micro_shapenet, tmp_path):
    """Deep-mutual-learning CLI: two peers, mutual KL, student checkpoints."""
    from pvcnn_tpu.utils import config as config_mod

    config_mod.configs.clear()
    old_argv, old_cwd = sys.argv, os.getcwd()
    os.chdir(tmp_path)
    try:
        sys.argv = ["train_dml.py",
                    os.path.join(old_cwd, "configs/shapenet/pvcnn/c0p25.py"),
                    f"--configs.dataset.root={micro_shapenet}",
                    "--configs.dataset.num_points=32",
                    "--configs.train.num_epochs=1",
                    "--configs.train.batch_size=8",
                    "--configs.train.save_path=dml_out",
                    "--configs.model.width_multiplier=0.125"]
        import importlib

        import train_dml as dml_cli
        importlib.reload(dml_cli)
        dml_cli.main()
        assert os.path.exists("dml_out/latest.ckpt")
        assert os.path.exists("dml_out/latest.ckpt.student")
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)
        config_mod.configs.clear()


@pytest.mark.slow
def test_train_and_evaluate_cli(micro_shapenet, tmp_path):
    _run_train(micro_shapenet, tmp_path)
    run_dir = tmp_path / "run_out"
    assert (run_dir / "latest.ckpt").exists()
    assert (run_dir / "best.ckpt").exists()
    assert (run_dir / "latest" / "e0.ckpt").exists()

    # resume path: second run loads the checkpoint and exits (num_epochs reached)
    _run_train(micro_shapenet, tmp_path)

    # evaluate path (voting protocol over full shapes)
    _run_train(micro_shapenet, tmp_path,
               extra=["--evaluate", "--configs.evaluate.num_votes=2"])
    stats = np.load(run_dir / "best.eval.npy")
    assert stats.shape == (16, 2)
    assert stats[:2, 1].sum() == 4  # 4 shapes evaluated (2 cats x 2 items)
    miou = stats[:, 0].sum() / stats[:, 1].sum()
    assert 0.0 <= miou <= 1.0


@pytest.mark.slow
def test_evaluate_pth_tar_cli(micro_shapenet, tmp_path):
    """Released-checkpoint workflow (reference README.md:129-147): `--evaluate
    --configs.evaluate.best_checkpoint_path=<x.pth.tar>` must consume a torch
    state dict directly. The same weights evaluated through the .pth.tar route
    and through a native msgpack .ckpt must produce identical stats."""
    import torch

    from pvcnn_tpu.models import shapenet
    from pvcnn_tpu.train.optim import Adam
    from pvcnn_tpu.train.trainer import Trainer, save_checkpoint
    from pvcnn_tpu.utils import checkpoint_import as ci
    from tests.test_checkpoint_import import synthetic_state_dict

    model = shapenet.PVCNN(num_classes=50, num_shapes=16,
                           extra_feature_channels=3, width_multiplier=0.125)
    tx, _ = Adam(1e-3)
    trainer = Trainer(model, criterion=None, tx=tx)
    state = trainer.init_state(np.zeros((1, 32, 6 + 16), np.float32))
    mapping = ci.pvcnn_shapenet_mapping()
    sd = synthetic_state_dict(mapping, state.params, state.batch_stats)

    pth_path = str(tmp_path / "released.pth.tar")
    torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()}}, pth_path)

    # same weights through the structural import -> native .ckpt
    params, batch_stats = ci.import_state_dict(
        sd, state.params, state.batch_stats, mapping)
    ckpt_path = str(tmp_path / "imported.ckpt")
    save_checkpoint(ckpt_path, state.replace(params=params,
                                             batch_stats=batch_stats))

    common = ["--evaluate", "--configs.evaluate.num_votes=2"]
    _run_train(micro_shapenet, tmp_path, extra=common + [
        f"--configs.evaluate.best_checkpoint_path={pth_path}"])
    _run_train(micro_shapenet, tmp_path, extra=common + [
        f"--configs.evaluate.best_checkpoint_path={ckpt_path}"])

    stats_pth = np.load(tmp_path / "released.eval.npy")
    stats_ckpt = np.load(tmp_path / "imported.eval.npy")
    assert stats_pth[:2, 1].sum() == 4
    np.testing.assert_array_equal(stats_pth, stats_ckpt)
