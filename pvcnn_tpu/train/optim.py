"""Optimizers + epoch-stepped LR schedules with torch semantics.

The reference uses torch.optim.Adam (L2 weight decay folded into the gradient, not
decoupled) with per-epoch schedulers (CosineAnnealingLR / StepLR / MultiStepLR,
see configs/**). We reproduce that exactly: optax.chain(add_decayed_weights, adam)
wrapped in inject_hyperparams so the host can set the epoch's learning rate, and
schedule objects that map epoch -> lr like the torch schedulers do.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import chex
import jax
import jax.numpy as jnp
import optax

__all__ = ["Adam", "SGD", "CosineAnnealingLR", "StepLR", "MultiStepLR",
           "set_learning_rate"]


class FusedAdamState(NamedTuple):
    """Adam moments held as ONE flat vector per parameter dtype."""
    count: chex.Array
    mu: tuple
    nu: tuple


def _dtype_groups(tree):
    """leaves grouped by dtype -> [(dtype, [leaf_index...])], fixed order."""
    leaves = jax.tree.leaves(tree)
    groups = {}
    for i, leaf in enumerate(leaves):
        groups.setdefault(jnp.dtype(leaf.dtype), []).append(i)
    return leaves, sorted(groups.items(), key=lambda kv: kv[0].name)


def _flatten_groups(tree):
    leaves, groups = _dtype_groups(tree)
    return [jnp.concatenate([leaves[i].ravel() for i in idx])
            for _, idx in groups]


def _scale_by_adam_fused(b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-8,
                         weight_decay: float = 0.0) -> optax.GradientTransformation:
    """torch-semantics Adam (L2 decay folded into the gradient first) over the
    CONCATENATION of all parameter leaves instead of leaf-by-leaf.

    Why: the headline model has ~60 small parameter leaves; a per-leaf optax
    chain dispatches several sub-millisecond fusions per leaf and the update
    becomes launch-bound (part of the 7.6 ms elementwise/optimizer tail in the
    round-4 profile, docs/PERFORMANCE.md). One flat [P] vector per dtype runs
    the whole moment+update math in a handful of fusions; the per-leaf
    ravel/concat/split bookkeeping is pure data movement XLA fuses into the
    same passes. Numerics are IDENTICAL to the per-leaf form (Adam is
    elementwise; concat changes no reduction order) — locked by
    test_adam_semantics_match_torch_exactly and the K-step trajectory tests.

    NOT for tensor-parallel param trees: concatenating leaves with different
    shardings would force XLA to materialize a replicated flat vector.
    Trainer(tensor_parallel=True) builds the per-leaf form (Adam(fused=False)).
    """

    def init(params):
        flats = _flatten_groups(params)
        return FusedAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=tuple(jnp.zeros_like(f) for f in flats),
            nu=tuple(jnp.zeros_like(f) for f in flats))

    def update(grads, state, params):
        assert params is not None, "fused Adam needs params (weight decay)"
        leaves_g, groups_tpl = _dtype_groups(grads)
        leaves_p = jax.tree.leaves(params)
        count = state.count + 1
        cf = count.astype(jnp.float32)
        new_mu, new_nu, flat_upds = [], [], []
        for (_, idx), mu, nu in zip(groups_tpl, state.mu, state.nu):
            g = jnp.concatenate([leaves_g[i].ravel() for i in idx])
            if weight_decay:
                p = jnp.concatenate([leaves_p[i].ravel() for i in idx])
                g = g + weight_decay * p
            mu = b1 * mu + (1 - b1) * g
            nu = b2 * nu + (1 - b2) * jnp.square(g)
            # optax.scale_by_adam's bias correction (matches torch to fp
            # rounding; the chain then applied scale(-1) * scale(lr), which
            # the caller folds in)
            mu_hat = mu / (1 - b1 ** cf)
            nu_hat = nu / (1 - b2 ** cf)
            flat_upds.append(mu_hat / (jnp.sqrt(nu_hat) + eps))
            new_mu.append(mu)
            new_nu.append(nu)
        # split each group back into its leaves
        upd_leaves = [None] * len(leaves_g)
        for (_, idx), flat in zip(groups_tpl, flat_upds):
            off = 0
            for i in idx:
                n = leaves_g[i].size
                upd_leaves[i] = jax.lax.slice(flat, (off,), (off + n,)).reshape(
                    leaves_g[i].shape)
                off += n
        updates = jax.tree.unflatten(jax.tree.structure(grads), upd_leaves)
        return updates, FusedAdamState(count=count, mu=tuple(new_mu),
                                       nu=tuple(new_nu))

    return optax.GradientTransformation(init, update)


# Auto-dispatch crossover: fused Adam won the 64-leaf ShapeNet headline
# (-0.27 ms) but LOST the 118-leaf Frustum 3-stage pipeline (+3.1 ms — the
# flat-vector concat/slice bookkeeping outgrows the per-leaf launch tail it
# replaces). Both measured same-session on v5e, round 5.
_FUSED_ADAM_MAX_LEAVES = 96


def _dispatching_adam(eps: float, weight_decay: float):
    """Chooses the fused flat-vector form or the per-leaf optax chain AT
    INIT TIME from the param tree's leaf count (both produce updates the
    caller scales by -lr; numerics identical, tests/test_train.py)."""
    fused_tx = _scale_by_adam_fused(eps=eps, weight_decay=weight_decay)
    steps = []
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps.append(optax.scale_by_adam(eps=eps))
    steps.append(optax.scale(-1.0))
    perleaf_tx = optax.chain(*steps)

    def init(params):
        if len(jax.tree.leaves(params)) <= _FUSED_ADAM_MAX_LEAVES:
            return fused_tx.init(params)
        return perleaf_tx.init(params)

    def update(grads, state, params):
        if isinstance(state, FusedAdamState):
            u, s = fused_tx.update(grads, state, params)
            # fused path emits +scaled updates; match per-leaf's scale(-1)
            return jax.tree.map(lambda x: -x, u), s
        return perleaf_tx.update(grads, state, params)

    return optax.GradientTransformation(init, update)


def Adam(lr: float = 1e-3, weight_decay: float = 0.0, eps: float = 1e-8,
         fused: bool | None = None):
    """torch.optim.Adam equivalent (L2 decay added to grads before the update).

    fused=None (the default, via the PVCNN_TPU_FUSED_ADAM knob) dispatches
    at init time on the param tree's leaf count: the flat-vector form
    (f32-bitwise-equivalent math, far fewer kernel launches — see
    _scale_by_adam_fused) below _FUSED_ADAM_MAX_LEAVES, the per-leaf optax
    chain above it (the concat/slice bookkeeping loses on very leafy trees,
    measured on the Frustum pipeline). Pass fused=False to force per-leaf —
    required for tensor-parallel param trees whose leaves carry different
    shardings — or fused=True to force the flat form.
    """
    if fused is None:
        from pvcnn_tpu.utils import knobs
        if knobs.get("PVCNN_TPU_FUSED_ADAM") == "0":
            fused = False

    @optax.inject_hyperparams
    def make(learning_rate):
        if fused is None:
            return optax.chain(_dispatching_adam(eps, weight_decay),
                               optax.scale(learning_rate))
        if fused:
            return optax.chain(
                _scale_by_adam_fused(eps=eps, weight_decay=weight_decay),
                optax.scale(-learning_rate))
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
