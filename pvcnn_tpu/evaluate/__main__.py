"""Standalone evaluator entry: `python -m pvcnn_tpu.evaluate <config.py> [...]`.

Equivalent to `python train.py <config.py> --evaluate` (the reference also
shipped per-dataset eval.py scripts, evaluate/*/eval.py, each with its own
prepare(); here one entry dispatches through the config's evaluate.fn)."""

from __future__ import annotations

import sys


def main():
    sys.argv = [sys.argv[0], *sys.argv[1:], "--evaluate"]
    from train import main as train_main

    train_main()


if __name__ == "__main__":
    main()
