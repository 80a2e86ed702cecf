"""S3DIS overall-acc / class-acc / mIoU meter (reference: meters/s3dis.py:6-57),
pure numpy over channel-last outputs [B, N, num_classes]."""

from __future__ import annotations

import numpy as np

__all__ = ["MeterS3DIS"]


class MeterS3DIS:
    def __init__(self, metric="iou", num_classes=13):
        assert metric in ("overall", "class", "iou")
        self.metric = metric
        self.num_classes = num_classes
        self.reset()

    def reset(self):
        self.total_seen = np.zeros(self.num_classes, dtype=np.int64)
        self.total_correct = np.zeros(self.num_classes, dtype=np.int64)
        self.total_positive = np.zeros(self.num_classes, dtype=np.int64)
        self.total_seen_num = 0
        self.total_correct_num = 0

    def update(self, outputs, targets):
        """outputs [B, N, num_classes] logits, targets [B, N] int labels."""
        outputs = np.asarray(outputs)
        targets = np.asarray(targets)
        predictions = outputs.argmax(-1)
        if self.metric == "overall":
            self.total_seen_num += targets.size
            self.total_correct_num += int(np.sum(targets == predictions))
        else:
            nc = self.num_classes
            self.total_seen += np.bincount(targets.reshape(-1), minlength=nc)[:nc]
            self.total_positive += np.bincount(predictions.reshape(-1),
                                               minlength=nc)[:nc]
            correct = targets.reshape(-1)[targets.reshape(-1)
                                          == predictions.reshape(-1)]
            self.total_correct += np.bincount(correct, minlength=nc)[:nc]

    def compute(self):
        if self.metric == "class":
            acc = np.where(self.total_seen == 0, 1.0,
                           self.total_correct / np.maximum(self.total_seen, 1))
            return float(acc.mean())
        if self.metric == "iou":
            union = self.total_seen + self.total_positive - self.total_correct
            iou = np.where(self.total_seen == 0, 1.0,
                           self.total_correct / np.maximum(union, 1))
            return float(iou.mean())
        return self.total_correct_num / self.total_seen_num
