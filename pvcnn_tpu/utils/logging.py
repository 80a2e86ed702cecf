"""Scalar logging that never silently disappears.

The reference always logs train/metric scalars via tensorboardX
(reference: train.py:114,244-246). Torch is an optional dependency here, so
`ScalarWriter` wraps `torch.utils.tensorboard.SummaryWriter` when torch is
importable and otherwise appends JSON lines to `<save_path>/scalars.jsonl` —
either way `add_scalar` works, so training runs always keep a scalar record.
"""

from __future__ import annotations

import json
import os
import time

__all__ = ["ScalarWriter"]


class _JsonlWriter:
    def __init__(self, save_path: str):
        os.makedirs(save_path, exist_ok=True)
        self._f = open(os.path.join(save_path, "scalars.jsonl"), "a",
                       buffering=1)

    def add_scalar(self, tag: str, value, step: int):
        self._f.write(json.dumps({
            "tag": tag, "value": float(value), "step": int(step),
            "wall_time": time.time(),
        }) + "\n")

    def close(self):
        self._f.close()


def ScalarWriter(save_path: str):
    """Returns a tensorboard SummaryWriter if torch is available, else a JSONL
    fallback writer with the same add_scalar/close surface."""
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(save_path)
    except Exception:
        return _JsonlWriter(save_path)
