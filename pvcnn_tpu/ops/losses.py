"""Loss primitives (reference: modules/functional/loss.py:7-17).

`kl_loss` sums over the class axis; in our channel-last layout that is the LAST axis
(the reference's dim=1 on [B, C, ...] tensors).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["kl_loss", "huber_loss", "cross_entropy"]


def kl_loss(x: jnp.ndarray, y: jnp.ndarray, axis: int = -1):
    """KL(softmax(stop_grad(x)) || softmax(y)), mean over all other axes."""
    x = jax.nn.softmax(jax.lax.stop_gradient(x), axis=axis)
    y = jax.nn.log_softmax(y, axis=axis)
    return jnp.mean(jnp.sum(x * (jnp.log(x) - y), axis=axis))


def huber_loss(error: jnp.ndarray, delta: float):
    """Mean Huber (smooth-L1 with knee `delta`) over all elements."""
    abs_error = jnp.abs(error)
    quadratic = jnp.minimum(abs_error, delta)
    return jnp.mean(0.5 * quadratic**2 + delta * (abs_error - quadratic))


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray, axis: int = -1):
    """Mean softmax cross entropy with integer labels (torch F.cross_entropy).

    The label pick is a one-hot multiply+reduce, NOT take_along_axis: XLA:TPU
    lowers the per-row gather to a serialized loop (~1.6 ms/step of the
    headline profile for a 13 MB read); the masked reduce fuses into the
    log_softmax pass."""
    logp = jax.nn.log_softmax(logits, axis=axis)
    classes = logp.shape[axis]
    onehot = jax.nn.one_hot(labels.astype(jnp.int32), classes,
                            dtype=logp.dtype, axis=axis)
    nll = -jnp.sum(logp * onehot, axis=axis)
    return jnp.mean(nll)
