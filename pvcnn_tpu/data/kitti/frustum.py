"""Frustum-KITTI dataset over the pickled frustum proposals
(reference: datasets/kitti/frustum.py:11-183). Same pickle format and augmentation
pipeline (frustum rotation, random flip, random depth shift, heading-angle binning);
features come out channel-last [num_points, 4] (xyz + intensity)."""

from __future__ import annotations

import os
import pickle

import numpy as np

from pvcnn_tpu.data.kitti import attributes as kitti

__all__ = ["FrustumKitti"]


class _FrustumKittiDataset:
    def __init__(self, root, num_points, split, classes, num_heading_angle_bins,
                 class_name_to_size_template_id, from_rgb_detection=False,
                 random_flip=False, random_shift=False, frustum_rotate=False):
        assert split in ("train", "val")
        self.root = root
        self.split = split
        self.classes = classes
        self.num_classes = len(classes)
        self.class_name_to_class_id = {c: i for i, c in enumerate(classes)}
        self.num_heading_angle_bins = num_heading_angle_bins
        self.class_name_to_size_template_id = class_name_to_size_template_id
        self.num_points = num_points
        self.random_flip = random_flip
        self.random_shift = random_shift
        self.frustum_rotate = frustum_rotate
        self.from_rgb_detection = from_rgb_detection
        self.data = {}

        if from_rgb_detection:
            path = os.path.join(root, f"frustum_carpedcyc_{split}_rgb_detection.pickle")
            keys = ("ids", "boxes_2d", "point_clouds", "class_names",
                    "frustum_rotation_angles", "probs")
        else:
            path = os.path.join(root, f"frustum_carpedcyc_{split}.pickle")
            keys = ("ids", "boxes_2d", "boxes_3d", "point_clouds", "mask_logits",
                    "class_names", "heading_angles", "sizes",
                    "frustum_rotation_angles")
        with open(path, "rb") as fp:
            for key in keys:
                self.data[key] = pickle.load(fp, encoding="latin1")

    def __len__(self):
        return len(self.data["point_clouds"])

    def __getitem__(self, index):
        # frustum angle is clockwise from +x; +pi/2 so it adjusts the heading directly
        rotation_angle = np.pi / 2.0 + self.data["frustum_rotation_angles"][index]

        class_name = self.data["class_names"][index]
        one_hot = np.zeros(self.num_classes, dtype=np.float32)
        one_hot[self.class_name_to_class_id[class_name]] = 1

        point_cloud = self.data["point_clouds"][index]
        if self.frustum_rotate:
            point_cloud = self.rotate_points_along_y(np.copy(point_cloud),
                                                     rotation_angle)
        choice = np.random.choice(point_cloud.shape[0], self.num_points,
                                  replace=True)
        point_cloud = point_cloud[choice, :]

        if self.from_rgb_detection:
            return ({"features": point_cloud.astype(np.float32),
                     "one_hot_vectors": one_hot},
                    {"rotation_angle": np.float32(rotation_angle),
                     "rgb_score": self.data["probs"][index]})

        mask_logits = self.data["mask_logits"][index][choice]
        box3d = self.data["boxes_3d"][index]
        center = (box3d[0, :] + box3d[6, :]) / 2.0
        heading_angle = self.data["heading_angles"][index]
        size_template_id = self.class_name_to_size_template_id[class_name]
        size_residual = (self.data["sizes"][index]
                         - kitti.class_name_to_size_template[class_name])
        if self.frustum_rotate:
            center = self.rotate_points_along_y(center[None, :],
                                                rotation_angle).squeeze()
            heading_angle = heading_angle - rotation_angle

        if self.random_flip and np.random.random() > 0.5:
            point_cloud[:, 0] = -point_cloud[:, 0]
            center[0] = -center[0]
            heading_angle = np.pi - heading_angle
        if self.random_shift:
            dist = np.sqrt(np.sum(center[0] ** 2 + center[1] ** 2))
            shift = np.clip(np.random.randn() * dist * 0.05, dist * 0.8, dist * 1.2)
            point_cloud[:, 2] += shift
            center[2] += shift

        heading_bin_id, heading_residual = self.angle_to_bin_id(
            heading_angle, self.num_heading_angle_bins)

        return ({"features": point_cloud.astype(np.float32),
                 "one_hot_vectors": one_hot},
                {"mask_logits": mask_logits.astype(np.int64),
                 "center": center.astype(np.float32),
                 "heading_bin_id": np.int64(heading_bin_id),
                 "heading_residual": np.float32(heading_residual),
                 "size_template_id": np.int64(size_template_id),
                 "size_residual": size_residual.astype(np.float32),
                 "class_id": np.int64(self.class_name_to_class_id[class_name])})

    @staticmethod
    def rotate_points_along_y(features, rotation_angle):
        """Rotate xz-plane coords (camera frame: z forward, x left, y down)."""
        c, s = np.cos(rotation_angle), np.sin(rotation_angle)
        rotation_matrix_transpose = [[c, s], [-s, c]]
        features[:, [0, 2]] = np.dot(features[:, [0, 2]], rotation_matrix_transpose)
        return features

    @staticmethod
    def angle_to_bin_id(angle, num_angle_bins):
        """bin_id * (2pi/N) + residual = angle (mod 2pi), residual in +-bin/2."""
        angle = angle % (2 * np.pi)
        angle_per_bin = 2 * np.pi / float(num_angle_bins)
        shifted = (angle + angle_per_bin / 2) % (2 * np.pi)
        bin_id = int(shifted / angle_per_bin)
        return bin_id, shifted - (bin_id * angle_per_bin + angle_per_bin / 2)


class FrustumKitti(dict):
    def __init__(self, root, num_points, split=None,
                 classes=("Car", "Pedestrian", "Cyclist"),
                 num_heading_angle_bins=12, class_name_to_size_template_id=None,
                 from_rgb_detection=False, random_flip=False, random_shift=False,
                 frustum_rotate=False):
        super().__init__()
        if class_name_to_size_template_id is None:
            class_name_to_size_template_id = {
                c: i for i, c in enumerate(kitti.class_names)}
        if not isinstance(split, (list, tuple)):
            split = ["train", "val"] if split is None else [split]
        if "train" in split:
            self["train"] = _FrustumKittiDataset(
                root=root, num_points=num_points, split="train", classes=classes,
                num_heading_angle_bins=num_heading_angle_bins,
                class_name_to_size_template_id=class_name_to_size_template_id,
                random_flip=random_flip, random_shift=random_shift,
                frustum_rotate=frustum_rotate)
        if "val" in split:
            self["val"] = _FrustumKittiDataset(
                root=root, num_points=num_points, split="val", classes=classes,
                num_heading_angle_bins=num_heading_angle_bins,
                class_name_to_size_template_id=class_name_to_size_template_id,
                random_flip=False, random_shift=False,
                frustum_rotate=frustum_rotate,
                from_rgb_detection=from_rgb_detection)
