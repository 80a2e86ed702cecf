"""Run-dir derivation from config paths (reference: utils/common.py:6-31):
`configs/shapenet/pvcnn/c1.py` -> `runs/shapenet.pvcnn.c1`, merging multiple config
paths into a bracketed tree string."""

from __future__ import annotations

import os

__all__ = ["get_save_path"]


def get_save_path(*config_paths: str, prefix: str = "runs") -> str:
    memo: dict = {}
    for c in config_paths:
        node = memo
        c = c.replace("configs/", "").replace(".py", "")
        for part in c.split("/"):
            node = node.setdefault(part, {})

    def render(m: dict, out: str) -> str:
        n = len(m)
        if n > 1:
            out += "["
        for i, (k, v) in enumerate(m.items()):
            out += k
            if v:
                out += "."
            out = render(v, out)
            if n > 1 and i < n - 1:
                out += "+"
        if n > 1:
            out += "]"
        return out

    return os.path.join(prefix, render(memo, ""))
