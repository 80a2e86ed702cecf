"""ShapeNet part-segmentation dataset (reference: datasets/shapenet.py:10-115).

Same on-disk format (per-shape txt point files + shuffled split JSONs), same
resampling/jitter/normalization pipeline; samples come out channel-LAST
([num_points, C] features, [num_points] labels), C = 3 coords (+3 normals)
(+16 one-hot shape id).
"""

from __future__ import annotations

import json
import os

import numpy as np

__all__ = ["ShapeNet"]


class _ShapeNetDataset:
    num_shapes = 16
    num_classes = 50

    def __init__(self, root, num_points, split="train", with_normal=True,
                 with_one_hot_shape_id=True, normalize=True, jitter=True):
        assert split in ("train", "test")
        self.root = root
        self.num_points = num_points
        self.split = split
        self.with_normal = with_normal
        self.with_one_hot_shape_id = with_one_hot_shape_id
        self.normalize = normalize
        self.jitter = jitter

        shape_dir_to_shape_id = {}
        with open(os.path.join(root, "synsetoffset2category.txt")) as f:
            for shape_id, line in enumerate(f):
                _, shape_dir = line.strip().split()
                shape_dir_to_shape_id[shape_dir] = shape_id

        splits = ["train", "val"] if split == "train" else ["test"]
        file_paths = []
        for s in splits:
            list_path = os.path.join(root, "train_test_split",
                                     f"shuffled_{s}_file_list.json")
            with open(list_path) as f:
                for file_path in json.load(f):
                    _, shape_dir, filename = file_path.split("/")
                    file_paths.append((os.path.join(root, shape_dir,
                                                    filename + ".txt"),
                                       shape_dir_to_shape_id[shape_dir]))
        self.file_paths = file_paths
        self.cache = {}
        self.cache_size = 20000

    def __len__(self):
        return len(self.file_paths)

    def __getitem__(self, index):
        # Warm path is loader-throughput-critical (tools/bench_input.py): the
        # cache stores [coords, normal] PACKED so resampling is one np.take
        # into a preallocated feature buffer — no per-column gathers, no
        # concat copy, no one-hot materialization (35 -> ~28 ms/batch64 on a
        # 1-core host, which is what lets prefetch hide the loader entirely).
        if index in self.cache:
            packed, label, shape_id = self.cache[index]
        else:
            from pvcnn_tpu import native

            file_path, shape_id = self.file_paths[index]
            data = native.loadtxt(file_path)
            coords = data[:, :3]
            if self.normalize:
                coords = self.normalize_point_cloud(coords)
            packed = np.concatenate(
                [coords, data[:, 3:6]], axis=1).astype(np.float32) \
                if self.with_normal else coords.astype(np.float32)
            label = data[:, -1].astype(np.int64)
            if len(self.cache) < self.cache_size:
                self.cache[index] = (packed, label, shape_id)

        n_pts, n_src = self.num_points, label.shape[0]
        choice = np.random.randint(0, n_src, n_pts)
        width = packed.shape[1] + (self.num_shapes
                                   if self.with_one_hot_shape_id else 0)
        features = np.empty((n_pts, width), dtype=np.float32)
        np.take(packed, choice, axis=0, out=features[:, :packed.shape[1]])
        if self.jitter:
            features[:, :3] += np.clip(0.01 * np.random.randn(n_pts, 3),
                                       -0.05, 0.05)
        if self.with_one_hot_shape_id:
            features[:, packed.shape[1]:] = 0.0
            features[:, packed.shape[1] + shape_id] = 1.0
        return features, label[choice]

    @staticmethod
    def normalize_point_cloud(points):
        points = points - points.mean(axis=0)
        return points / np.max(np.linalg.norm(points, axis=1))

    @staticmethod
    def jitter_point_cloud(points, sigma=0.01, clip=0.05):
        noise = np.clip(sigma * np.random.randn(*points.shape), -clip, clip)
        return (points + noise).astype(np.float32)


class ShapeNet(dict):
    def __init__(self, root, num_points, split=None, with_normal=True,
                 with_one_hot_shape_id=True, normalize=True, jitter=True):
        super().__init__()
        if split is None:
            split = ["train", "test"]
        elif not isinstance(split, (list, tuple)):
            split = [split]
        for s in split:
            self[s] = _ShapeNetDataset(
                root=root, num_points=num_points, split=s, with_normal=with_normal,
                with_one_hot_shape_id=with_one_hot_shape_id, normalize=normalize,
                jitter=jitter if s == "train" else False)
