"""Optimizers + epoch-stepped LR schedules with torch semantics.

The reference uses torch.optim.Adam (L2 weight decay folded into the gradient, not
decoupled) with per-epoch schedulers (CosineAnnealingLR / StepLR / MultiStepLR,
see configs/**). We reproduce that exactly: optax.chain(add_decayed_weights, adam)
wrapped in inject_hyperparams so the host can set the epoch's learning rate, and
schedule objects that map epoch -> lr like the torch schedulers do.
"""

from __future__ import annotations

import math
from typing import Sequence

import optax

__all__ = ["Adam", "SGD", "CosineAnnealingLR", "StepLR", "MultiStepLR",
           "set_learning_rate"]


def Adam(lr: float = 1e-3, weight_decay: float = 0.0, eps: float = 1e-8):
    """torch.optim.Adam equivalent (L2 decay added to grads before the update)."""

    @optax.inject_hyperparams
    def make(learning_rate):
        steps = []
        if weight_decay:
            steps.append(optax.add_decayed_weights(weight_decay))
        steps.append(optax.scale_by_adam(eps=eps))
        steps.append(optax.scale(-1.0))
        return optax.chain(*steps, optax.scale(learning_rate))

    return make(learning_rate=lr), lr


def SGD(lr: float, momentum: float = 0.0, weight_decay: float = 0.0):
    @optax.inject_hyperparams
    def make(learning_rate):
        steps = []
        if weight_decay:
            steps.append(optax.add_decayed_weights(weight_decay))
        if momentum:
            steps.append(optax.trace(decay=momentum))
        steps.append(optax.scale(-1.0))
        return optax.chain(*steps, optax.scale(learning_rate))

    return make(learning_rate=lr), lr


def set_learning_rate(opt_state, lr: float):
    """Set the injected learning rate for the coming epoch (host-side)."""
    import numpy as np

    opt_state.hyperparams["learning_rate"] = np.float32(lr)
    return opt_state


class _Scheduler:
    def __init__(self, base_lr: float | None = None):
        self.base_lr = base_lr

    def bind(self, base_lr: float):
        if self.base_lr is None:
            self.base_lr = base_lr
        return self

    def __call__(self, epoch: int) -> float:
        raise NotImplementedError


class CosineAnnealingLR(_Scheduler):
    def __init__(self, t_max: int, eta_min: float = 0.0, base_lr: float | None = None):
        super().__init__(base_lr)
        self.t_max = t_max
        self.eta_min = eta_min

    def __call__(self, epoch: int) -> float:
        return self.eta_min + (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * epoch / self.t_max)) / 2


class StepLR(_Scheduler):
    def __init__(self, step_size: int, gamma: float = 0.1,
                 base_lr: float | None = None):
        super().__init__(base_lr)
        self.step_size = step_size
        self.gamma = gamma

    def __call__(self, epoch: int) -> float:
        return self.base_lr * (self.gamma ** (epoch // self.step_size))


class MultiStepLR(_Scheduler):
    def __init__(self, milestones: Sequence[int], gamma: float = 0.1,
                 base_lr: float | None = None):
        super().__init__(base_lr)
        self.milestones = sorted(milestones)
        self.gamma = gamma

    def __call__(self, epoch: int) -> float:
        passed = sum(1 for m in self.milestones if m <= epoch)
        return self.base_lr * (self.gamma ** passed)
