"""End-to-end KITTI frustum pipeline on synthetic pickles: dataset -> short
training (multi-task loss + box-IoU meters) -> rgb-detection evaluation with
repeated seeds -> KITTI label files -> official AP."""

import os
import pickle
import sys

import numpy as np
import pytest

N_SAMPLES = 16


def _make_box_corners(center, size, heading):
    l, w, h = size
    x = np.array([l, l, -l, -l, l, l, -l, -l]) / 2
    y = np.array([h, h, h, h, -h, -h, -h, -h]) / 2
    z = np.array([w, -w, -w, w, w, -w, -w, w]) / 2
    c, s = np.cos(heading), np.sin(heading)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return (rot @ np.stack([x, y, z])).T + center  # [8, 3]


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    frustum_dir = root / "frustum_data"
    frustum_dir.mkdir()
    rng = np.random.RandomState(0)
    classes = ["Car", "Pedestrian", "Cyclist"]

    def make_split(path, rgb_detection):
        ids, boxes_2d, boxes_3d, clouds, masks = [], [], [], [], []
        names, headings, sizes, angles, probs = [], [], [], [], []
        for i in range(N_SAMPLES):
            p = rng.randint(150, 400)
            center = np.array([rng.randn() * 2, 1.0, rng.rand() * 20 + 5])
            cloud = rng.randn(p, 4).astype(np.float32)
            cloud[:, :3] = cloud[:, :3] * 0.8 + center
            size = np.abs(rng.randn(3)) * 0.3 + np.array([3.9, 1.6, 1.5])
            heading = rng.rand() * 2 * np.pi - np.pi
            ids.append(i // 4)
            boxes_2d.append(np.array([100.0, 100.0, 300.0, 200.0]))
            boxes_3d.append(_make_box_corners(center, size, heading))
            clouds.append(cloud)
            masks.append((rng.rand(p) > 0.4).astype(np.int64))
            names.append(classes[i % 3])
            headings.append(heading)
            sizes.append(size)
            angles.append(rng.randn() * 0.3)
            probs.append(float(rng.rand() * 0.5 + 0.5))
        with open(path, "wb") as f:
            if rgb_detection:
                for obj in (ids, boxes_2d, clouds, names, angles, probs):
                    pickle.dump(obj, f)
            else:
                for obj in (ids, boxes_2d, boxes_3d, clouds, masks, names,
                            headings, sizes, angles):
                    pickle.dump(obj, f)

    make_split(frustum_dir / "frustum_carpedcyc_train.pickle", False)
    make_split(frustum_dir / "frustum_carpedcyc_val.pickle", False)
    make_split(frustum_dir / "frustum_carpedcyc_val_rgb_detection.pickle", True)

    # ground-truth label files + image id list
    gt_dir = root / "ground_truth"
    gt_dir.mkdir()
    image_ids = sorted({i // 4 for i in range(N_SAMPLES)})
    for idx in image_ids:
        lines = []
        for _ in range(2):
            size = np.abs(rng.randn(3)) * 0.3 + np.array([3.9, 1.6, 1.5])
            loc = np.array([rng.randn() * 2, 1.0, rng.rand() * 20 + 5])
            ry = rng.rand() * 2 * np.pi - np.pi
            lines.append(
                f"Car 0.0 0 -10 100.0 100.0 300.0 200.0 "
                f"{size[2]:.2f} {size[1]:.2f} {size[0]:.2f} "
                f"{loc[0]:.2f} {loc[1]:.2f} {loc[2]:.2f} {ry:.2f}\n")
        with open(gt_dir / f"{idx:06d}.txt", "w") as f:
            f.writelines(lines)
    sets_dir = root / "image_sets"
    sets_dir.mkdir()
    with open(sets_dir / "val.txt", "w") as f:
        f.writelines(f"{i:06d}\n" for i in image_ids)
    return str(root)


def test_dataset(kitti_root):
    from pvcnn_tpu.data.kitti.frustum import FrustumKitti
    ds = FrustumKitti(root=os.path.join(kitti_root, "frustum_data"),
                      num_points=128, random_flip=True, random_shift=True,
                      frustum_rotate=True)
    inputs, targets = ds["train"][0]
    assert inputs["features"].shape == (128, 4)
    assert inputs["one_hot_vectors"].shape == (3,)
    assert targets["mask_logits"].shape == (128,)
    assert 0 <= int(targets["heading_bin_id"]) < 12
    rgb = FrustumKitti(root=os.path.join(kitti_root, "frustum_data"),
                       num_points=128, split="val", from_rgb_detection=True)
    inputs, targets = rgb["val"][0]
    assert "rgb_score" in targets


@pytest.mark.slow
def test_train_and_official_eval(kitti_root, tmp_path):
    from pvcnn_tpu.utils import config as config_mod
    config_mod.configs.clear()
    old_argv, old_cwd = sys.argv, os.getcwd()
    os.chdir(tmp_path)
    base_args = [
        os.path.join(old_cwd, "configs/kitti/frustum/pvcnne.py"),
        f"--configs.dataset.root={os.path.join(kitti_root, 'frustum_data')}",
        f"--configs.evaluate.ground_truth_path="
        f"{os.path.join(kitti_root, 'ground_truth')}",
        f"--configs.evaluate.image_id_file_path="
        f"{os.path.join(kitti_root, 'image_sets', 'val.txt')}",
        "--configs.dataset.num_points=128",
        "--configs.data.num_points_per_object=32",
        "--configs.model.num_points_per_object=32",
        "--configs.model.width_multiplier=0.25",
        "--configs.train.num_epochs=1",
        "--configs.train.batch_size=8",
        "--configs.train.save_path=run_out",
    ]
    try:
        sys.argv = ["train.py"] + base_args
        import importlib

        import train as train_cli
        importlib.reload(train_cli)
        train_cli.main()
        assert os.path.exists("run_out/best.ckpt")

        config_mod.configs.clear()
        sys.argv = ["train.py"] + base_args + [
            "--evaluate", "--configs.evaluate.num_tests=2"]
        importlib.reload(train_cli)
        train_cli.main()
        # per-test prediction dirs + stats written
        assert os.path.exists("run_out/best.predictions.t")
        assert os.path.exists("run_out/best.eval.t")
        pred_dir = "run_out/best.predictions.t/best.predictions.t0"
        files = sorted(os.listdir(pred_dir))
        assert files, "no KITTI prediction files written"
        # each line must parse as a 16-field KITTI detection
        with open(os.path.join(pred_dir, files[0])) as f:
            parts = f.readline().split()
        assert len(parts) == 16
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)
        config_mod.configs.clear()
