"""S3DIS semantic-segmentation dataset over prepared h5 sliding-window blocks
(reference: datasets/s3dis.py:11-106). Same on-disk layout: per-room
`{zero,half}_0.h5` files with datasets data/[W, P, 9], label_seg/[W, P],
data_num/[W]; features are [x_in_block, y_in_block, z_in_block, r, g, b,
x/X_room, y/Y_room, z/Z_room]. Samples come out channel-last [num_points, 9]."""

from __future__ import annotations

import os
import threading

import numpy as np

__all__ = ["S3DIS"]


class _S3DISDataset:
    def __init__(self, root, num_points, split="train", with_normalized_coords=True,
                 holdout_area=5):
        assert split in ("train", "test")
        self.root = root
        self.split = split
        self.num_points = num_points
        self.holdout_area = None if holdout_area is None else int(holdout_area)
        self.with_normalized_coords = with_normalized_coords
        self.cache_size = 20 if split == "train" else 30
        self.cache = {}
        # thread-mode loader workers call __getitem__ concurrently; the h5
        # handle cache evicts constantly (20 slots vs ~500 files under
        # shuffle), so lookup+eviction+read must be one critical section or
        # a reader can hold a handle another thread just closed. HDF5
        # serializes API calls behind its own global lock anyway, so holding
        # this lock across the dataset reads costs no real concurrency.
        self._cache_lock = threading.Lock()

        areas = []
        if split == "train":
            for a in range(1, 7):
                if a != self.holdout_area:
                    areas.append(os.path.join(root, f"Area_{a}"))
        else:
            areas.append(os.path.join(root, f"Area_{self.holdout_area}"))

        import h5py  # local import keeps the package importable without h5py

        self.num_scene_windows = 0
        index_to_filename, scene_list, filename_to_start_index = [], {}, {}
        for area in areas:
            if not os.path.isdir(area):
                continue
            for scene in sorted(os.listdir(area)):
                current_scene = os.path.join(area, scene)
                scene_list[current_scene] = []
                for offset in ("zero", "half"):
                    current_file = os.path.join(current_scene, f"{offset}_0.h5")
                    filename_to_start_index[current_file] = self.num_scene_windows
                    with h5py.File(current_file, "r") as h5f:
                        num_windows = h5f["data"].shape[0]
                    self.num_scene_windows += num_windows
                    index_to_filename.extend([current_file] * num_windows)
                    scene_list[current_scene].append(current_file)
        self.index_to_filename = index_to_filename
        self.filename_to_start_index = filename_to_start_index
        self.scene_list = scene_list

    def __len__(self):
        return self.num_scene_windows

    def _file(self, filename):
        if filename in self.cache:
            return self.cache[filename]
        import h5py

        h5f = h5py.File(filename, "r")
        entry = (h5f, h5f["data"], h5f["label_seg"], h5f["data_num"])
        if len(self.cache) >= self.cache_size:
            victim = sorted(self.cache)[np.random.randint(0, self.cache_size)]
            self.cache.pop(victim)[0].close()
        self.cache[filename] = entry
        return entry

    def __del__(self):
        for entry in getattr(self, "cache", {}).values():
            try:
                entry[0].close()
            except Exception:
                pass

    def __getitem__(self, index):
        filename = self.index_to_filename[index]
        pos = index - self.filename_to_start_index[filename]
        with self._cache_lock:
            _, scene_data, scene_label, scene_num_points = self._file(filename)
            window_data = np.asarray(scene_data[pos], dtype=np.float32)
            window_label = np.asarray(scene_label[pos], dtype=np.int64)
            num_valid = int(scene_num_points[pos])

        choices = np.random.choice(num_valid, self.num_points,
                                   replace=(num_valid < self.num_points))
        data = window_data[choices]          # [num_points, 9], channel-last
        label = window_label[choices]
        if not self.with_normalized_coords:
            data = data[:, :-3]
        return data, label


class S3DIS(dict):
    def __init__(self, root, num_points, split=None, with_normalized_coords=True,
                 holdout_area=5):
        super().__init__()
        if split is None:
            split = ["train", "test"]
        elif not isinstance(split, (list, tuple)):
            split = [split]
        for s in split:
            self[s] = _S3DISDataset(root=root, num_points=num_points, split=s,
                                    with_normalized_coords=with_normalized_coords,
                                    holdout_area=holdout_area)
