"""Standalone evaluator entry: `python -m pvcnn_tpu.evaluate <config.py> [...]`.

Equivalent to `python train.py <config.py> --evaluate` (the reference also
shipped per-dataset eval.py scripts, evaluate/*/eval.py, each with its own
prepare(); here one entry dispatches through the config's evaluate.fn)."""

from __future__ import annotations

import importlib.util
import os
import sys


def _load_train_module():
    """Import the repo-root train.py by file path so `python -m
    pvcnn_tpu.evaluate` works from any cwd (not just the repo root)."""
    try:
        import train  # cwd == repo root, or installed alongside

        return train
    except ImportError:
        pass
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(root, "train.py")
    spec = importlib.util.spec_from_file_location("train", path)
    module = importlib.util.module_from_spec(spec)
    sys.modules["train"] = module
    spec.loader.exec_module(module)
    return module


def main():
    sys.argv = [sys.argv[0], *sys.argv[1:], "--evaluate"]
    _load_train_module().main()


if __name__ == "__main__":
    main()
