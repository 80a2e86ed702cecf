"""End-to-end S3DIS pipeline: raw annotations -> prepare_s3dis h5 windows ->
dataset -> short training -> scene-level voting evaluation."""

import os
import sys

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")


@pytest.fixture(scope="module")
def s3dis_root(tmp_path_factory):
    raw = tmp_path_factory.mktemp("s3dis_raw")
    out = tmp_path_factory.mktemp("s3dis_prep")
    rng = np.random.RandomState(0)
    for area in ("Area_5", "Area_6"):
        ann = raw / area / "room_1" / "Annotations"
        ann.mkdir(parents=True)
        for name, n in (("chair_1", 700), ("floor_1", 900), ("wall_2", 800)):
            pts = np.concatenate([
                rng.rand(n, 3) * [3.0, 3.0, 2.5],
                rng.randint(0, 255, size=(n, 3)),
            ], axis=1)
            np.savetxt(ann / f"{name}.txt", pts, fmt="%.4f")

    from pvcnn_tpu.data.prepare_s3dis import prepare_labels, prepare_windows
    prepare_labels(str(raw), str(out))
    prepare_windows(str(out), max_num_points=512, block_size=1.5, grid_size=0.1)
    return str(out)


def test_prepared_layout(s3dis_root):
    room = os.path.join(s3dis_root, "Area_5", "room_1")
    assert os.path.exists(os.path.join(room, "label.npy"))
    for offset in ("zero", "half"):
        path = os.path.join(room, f"{offset}_0.h5")
        with h5py.File(path, "r") as f:
            assert f["data"].shape[2] == 9
            assert f["data"].shape[1] == 512
            w = f["data"].shape[0]
            assert f["label_seg"].shape == (w, 512)
            assert f["data_num"].shape == (w,)
            assert f["indices_split_to_full"].shape == (w, 512)
            # full coverage: every original point appears in some window
            n_full = np.load(os.path.join(room, "label.npy")).size
            covered = np.unique(np.concatenate([
                f["indices_split_to_full"][i, :f["data_num"][i]]
                for i in range(w)]))
            assert covered.max() < n_full


@pytest.mark.slow
def test_dataset_and_eval(s3dis_root, tmp_path):
    from pvcnn_tpu.data.s3dis import S3DIS
    dataset = S3DIS(root=s3dis_root, num_points=128, holdout_area=5)
    assert len(dataset["train"]) > 0 and len(dataset["test"]) > 0
    x, y = dataset["test"][0]
    assert x.shape == (128, 9) and y.shape == (128,)

    # train one tiny epoch and write a checkpoint, then run the scene evaluator
    from pvcnn_tpu.utils import config as config_mod
    config_mod.configs.clear()
    old_argv, old_cwd = sys.argv, os.getcwd()
    os.chdir(tmp_path)
    try:
        sys.argv = ["train.py",
                    os.path.join(old_cwd, "configs/s3dis/pvcnn/area5/c0p125.py"),
                    f"--configs.dataset.root={s3dis_root}",
                    "--configs.dataset.num_points=128",
                    "--configs.train.num_epochs=1",
                    "--configs.train.batch_size=8",
                    "--configs.train.save_path=run_out"]
        import importlib

        import train as train_cli
        importlib.reload(train_cli)
        train_cli.main()
        assert os.path.exists("run_out/best.ckpt")

        config_mod.configs.clear()
        sys.argv = sys.argv[:-1] + ["--configs.train.save_path=run_out",
                                    "--evaluate"]
        importlib.reload(train_cli)
        train_cli.main()
        stats = np.load("run_out/best.eval.npy")
        assert stats.shape[0] == 3 and stats.shape[1] == 13
        # every full-res point got a prediction: positives == seen
        assert stats[1].sum() == stats[0].sum()
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)
        config_mod.configs.clear()
