"""ShapeNet part-IoU meter (reference: meters/shapenet.py:6-67), pure numpy over
channel-last outputs [B, N, num_classes]. Argmax is restricted to the target
shape's part-class range; empty-union parts count as IoU 1."""

from __future__ import annotations

import numpy as np

__all__ = ["MeterShapeNet", "default_shape_name_to_part_classes"]

default_shape_name_to_part_classes = {
    "Airplane": [0, 1, 2, 3],
    "Bag": [4, 5],
    "Cap": [6, 7],
    "Car": [8, 9, 10, 11],
    "Chair": [12, 13, 14, 15],
    "Earphone": [16, 17, 18],
    "Guitar": [19, 20, 21],
    "Knife": [22, 23],
    "Lamp": [24, 25, 26, 27],
    "Laptop": [28, 29],
    "Motorbike": [30, 31, 32, 33, 34, 35],
    "Mug": [36, 37],
    "Pistol": [38, 39, 40],
    "Rocket": [41, 42, 43],
    "Skateboard": [44, 45, 46],
    "Table": [47, 48, 49],
}


class MeterShapeNet:
    def __init__(self, num_classes=50, num_shapes=16,
                 shape_name_to_part_classes=None):
        self.num_classes = num_classes
        self.num_shapes = num_shapes
        mapping = shape_name_to_part_classes or default_shape_name_to_part_classes
        self.shape_name_to_part_classes = mapping
        part_to_range = []
        for shape_part_classes in mapping.values():
            start, end = shape_part_classes[0], shape_part_classes[-1] + 1
            for _ in range(start, end):
                part_to_range.append((start, end))
        self.part_class_to_shape_part_classes = part_to_range
        self.reset()

    def reset(self):
        self.iou_sum = 0.0
        self.shape_count = 0

    def update(self, outputs, targets):
        """outputs [B, N, num_classes] logits, targets [B, N] int labels."""
        outputs = np.asarray(outputs)
        targets = np.asarray(targets)
        for b in range(outputs.shape[0]):
            start, end = self.part_class_to_shape_part_classes[int(targets[b, 0])]
            prediction = np.argmax(outputs[b, :, start:end], axis=-1) + start
            target = targets[b]
            iou = 0.0
            for i in range(start, end):
                itarget = target == i
                ipred = prediction == i
                union = np.sum(itarget | ipred)
                iou += 1.0 if union == 0 else np.sum(itarget & ipred) / union
            self.iou_sum += iou / (end - start)
            self.shape_count += 1

    def compute(self):
        return self.iou_sum / self.shape_count
