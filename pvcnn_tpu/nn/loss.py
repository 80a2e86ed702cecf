"""Loss wrappers used as training criteria (reference: modules/loss.py:6-11 and the
torch nn.CrossEntropyLoss used by the segmentation configs)."""

from __future__ import annotations

from pvcnn_tpu import ops

__all__ = ["KLLoss", "CrossEntropyLoss"]


class KLLoss:
    """DML mutual-distillation criterion. Class axis is the LAST axis."""

    def __call__(self, x, y):
        return ops.kl_loss(x, y)


class CrossEntropyLoss:
    """Per-point or per-example softmax CE; logits [..., num_classes],
    integer labels [...]."""

    def __call__(self, logits, labels):
        return ops.cross_entropy(logits, labels)
