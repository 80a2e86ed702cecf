"""Furthest point sampling, feature gathering, and logits-based foreground masking.

TPU-native replacements for the reference CUDA/host ops:
  * `furthest_point_sampling_kernel`
    (modules/functional/src/sampling/sampling.cu:86-174): seeds index 0, keeps a
    running min-distance-to-set per point, and picks the argmax each of M steps. The
    M-step sequential loop is expressed as a `lax.fori_loop` (a Pallas variant lives in
    ops/pallas/fps.py and is used automatically on TPU); argmax breaks ties toward the
    lower index like the CUDA strict `>` scan.
  * `gather_features_kernel` (sampling.cu:17-74): a pure gather; the atomicAdd
    backward is its AD transpose.
  * `logits_mask` (modules/functional/sampling.py:51-84): the reference runs a
    per-example Python loop with np.random.choice on the host — the single op worth
    redesigning. We reformulate it as a fully on-device, jittable masked sampler:
    candidates are randomly permuted via sort-by-random-key, then selected round-robin
    (index j -> perm[j mod count]), which reproduces the reference's
    sample-without-replacement (count >= M) and repeat+shuffle (count < M) behavior in
    distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["furthest_point_sample", "furthest_point_sample_indices", "gather",
           "logits_mask", "logits_mask_indices"]


def _fps_single(coords: jnp.ndarray, num_samples: int):
    """coords [N, 3] -> indices [M] int32. Mirrors sampling.cu:104-166."""
    n = coords.shape[0]

    # distances in the coords dtype (not hard f32): under x64 a f32 carry
    # would be promoted by the f64 distance update and break the loop carry
    ddt = coords.dtype

    def body(j, state):
        indices, min_d2, last = state
        d2 = jnp.sum((coords - coords[last]) ** 2, axis=-1).astype(ddt)
        min_d2 = jnp.minimum(min_d2, d2)
        nxt = jnp.argmax(min_d2).astype(jnp.int32)
        indices = indices.at[j].set(nxt)
        return indices, min_d2, nxt

    indices0 = jnp.zeros((num_samples,), dtype=jnp.int32)
    min_d2_0 = jnp.full((n,), 1e38, dtype=ddt)
    indices, _, _ = jax.lax.fori_loop(
        1, num_samples, body, (indices0, min_d2_0, jnp.int32(0))
    )
    return indices


def furthest_point_sample_indices(coords: jnp.ndarray, num_samples: int):
    """coords [B, N, 3] -> int32 indices [B, M] of the FPS-selected centers."""
    from pvcnn_tpu.ops.pallas.fps import fps_indices_pallas, pallas_fps_supported

    if pallas_fps_supported(coords.shape[1], coords.shape[0]):
        return fps_indices_pallas(coords, int(num_samples))
    return jax.vmap(lambda c: _fps_single(c, int(num_samples)))(coords)


def gather(features: jnp.ndarray, indices: jnp.ndarray):
    """features [B, N, C], indices [B, M] -> [B, M, C]."""
    from pvcnn_tpu.ops.gather_utils import take_rows

    return take_rows(features, indices)


def furthest_point_sample(coords: jnp.ndarray, num_samples: int):
    """coords [B, N, 3] -> [B, M, 3] coords of FPS centers
    (modules/functional/sampling.py:37-48)."""
    idx = furthest_point_sample_indices(jax.lax.stop_gradient(coords), num_samples)
    return gather(coords, idx)


def logits_mask(coords: jnp.ndarray, logits: jnp.ndarray, num_points_per_object: int,
                rng: jax.Array):
    """Foreground point resampling driven by binary segmentation logits.

    Args:
      coords: [B, N, 3] float point coords.
      logits: [B, N, 2] binary classification logits (channel-last; the reference uses
              [B, 2, N]).
      num_points_per_object: M, fixed number of points kept per example.
      rng: PRNG key for the random subset selection.

    Returns:
      selected_coords:    [B, M, 3] — foreground coords, mean-centered.
      masked_coords_mean: [B, 3]    — mean of the foreground coords.
      mask:               [B, N] bool — the foreground mask itself.
    """
    b, n, _ = coords.shape
    m = int(num_points_per_object)
    mask = logits[..., 0] < logits[..., 1]                        # [B, N]
    maskf = mask.astype(coords.dtype)
    num_candidates = jnp.sum(mask, axis=-1)                       # [B]
    masked_coords = coords * maskf[..., None]
    masked_coords_mean = jnp.sum(masked_coords, axis=1) / jnp.maximum(
        num_candidates, 1
    ).astype(coords.dtype)[:, None]                               # [B, 3]

    selected_indices = logits_mask_indices(mask, m, rng)
    selected_coords = gather(
        masked_coords - masked_coords_mean[:, None, :], selected_indices
    )
    return selected_coords, masked_coords_mean, mask


def logits_mask_indices(mask: jnp.ndarray, m: int, rng: jax.Array):
    """The index-selection core of `logits_mask`: [B, N] bool -> [B, M] int32.

    Cyclic walk over a random permutation of the candidate indices. This is
    distribution-equivalent to the reference's host sampler
    (modules/functional/sampling.py:68-82): when count >= M the first M
    permutation slots are a uniform M-subset without replacement; when
    0 < count < M, candidate at permutation position p is selected
    floor(M/count) + (p < M mod count) times — the same
    {floor, floor+1}-multiset law as the reference's repeat + random-remainder
    + shuffle (positions are uniform, so each candidate draws the extra copy
    with probability (M mod count)/count). Verified distributionally in
    tests/test_ops.py::TestLogitsMaskDistribution.
    """
    b, n = mask.shape
    u = jax.random.uniform(rng, (b, n))
    key = jnp.where(mask, u, u + 2.0)  # candidates sort first
    order = jnp.argsort(key, axis=-1).astype(jnp.int32)           # [B, N]
    cnt = jnp.maximum(jnp.sum(mask, axis=-1), 1).astype(jnp.int32)
    j = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)
    return jnp.take_along_axis(order, j % cnt[:, None], axis=1)   # [B, M]
