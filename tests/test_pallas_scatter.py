"""Pallas one-hot scatter kernel vs segment_sum reference (interpret mode on CPU;
the same kernel is compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvcnn_tpu.ops.pallas.scatter import onehot_scatter_add


@pytest.fixture(autouse=True)
def _pallas_interpret(monkeypatch):
    # interpret mode is opt-in per kernel-test module (session-wide it can
    # SIGABRT XLA's CPU compiler inside the big sharded train-step jits)
    monkeypatch.setenv("PVCNN_TPU_PALLAS_INTERPRET", "1")


def _reference(values, idx, bins):
    return np.stack([
        np.stack([values[b][idx[b] == v].sum(axis=0) for v in range(bins)])
        for b in range(values.shape[0])
    ])


def test_scatter_matches_segment_sum_f32(rng):
    b, n, c, bins = 2, 200, 5, 256
    values = rng.randn(b, n, c).astype(np.float32)
    idx = rng.randint(0, bins, size=(b, n)).astype(np.int32)
    got = np.asarray(onehot_scatter_add(jnp.asarray(values), jnp.asarray(idx),
                                        bins, mm_dtype=jnp.float32))
    want = _reference(values, idx, bins)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_scatter_bf16_close(rng):
    b, n, c, bins = 1, 128, 3, 128
    values = rng.randn(b, n, c).astype(np.float32)
    idx = rng.randint(0, bins, size=(b, n)).astype(np.int32)
    got = np.asarray(onehot_scatter_add(jnp.asarray(values), jnp.asarray(idx),
                                        bins, mm_dtype=jnp.bfloat16))
    want = _reference(values, idx, bins)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_avg_voxelize_uses_fp32_under_precision_context(rng):
    # bins divisible by 128 -> pallas path; under the fp32 matmul context the
    # result must match the segment_sum fallback bit-for-bit-ish
    from pvcnn_tpu import ops
    b, n, c, r = 2, 64, 4, 8  # r^3 = 512 = 4 * 128
    feats = rng.randn(b, n, c).astype(np.float32)
    vc = rng.randint(0, r, size=(b, n, 3)).astype(np.int32)
    with jax.default_matmul_precision("float32"):
        got = np.asarray(ops.avg_voxelize(jnp.asarray(feats), jnp.asarray(vc), r))
    import oracles
    want = oracles.avg_voxelize(feats, vc, r)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_avg_voxelize_sorted_path_exact(rng):
    """n a multiple of the sorted kernel's block size -> the sorted scatter
    branch of _scatter_sum runs (pin it), and must match the oracle."""
    from pvcnn_tpu import ops
    from pvcnn_tpu.ops.voxelize import _sorted_scatter_sum
    b, n, c, r = 2, 256, 4, 8
    feats = rng.randn(b, n, c).astype(np.float32)
    vc = rng.randint(0, r, size=(b, n, 3)).astype(np.int32)
    flat = vc[..., 0] * r * r + vc[..., 1] * r + vc[..., 2]
    ones = np.concatenate([feats, np.ones((b, n, 1), np.float32)], axis=-1)
    # the K=1 sorted scatter (with channel padding c=5 -> 8) must be
    # numerically exact against a raw scatter-add, not just runnable
    got_sums = _sorted_scatter_sum(jnp.asarray(ones), jnp.asarray(flat),
                                   r * r * r, jnp.float32)
    assert got_sums is not None
    want_sums = np.zeros((b, r * r * r, c + 1), np.float32)
    for bb in range(b):
        np.add.at(want_sums[bb], flat[bb], ones[bb])
    np.testing.assert_allclose(np.asarray(got_sums), want_sums, rtol=1e-5,
                               atol=1e-5)
    with jax.default_matmul_precision("float32"):
        got = np.asarray(ops.avg_voxelize(jnp.asarray(feats), jnp.asarray(vc),
                                          r))
    import oracles
    want = oracles.avg_voxelize(feats, vc, r)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _devox_bwd_reference(w, nc, r, c):
    import oracles
    return oracles.trilinear_devoxelize_grad(w, nc, r)


@pytest.mark.parametrize(
    "n,c,r",
    [(64, 16, 8),      # K=8: full corner pack, KC=128
     (64, 32, 8),      # K=4: half pack, 2N rows
     (64, 64, 8),      # K=2: quarter pack, 4N rows
     (64, 8, 16)])     # K=8 at R=16 (larger offsets, multiple bin tiles)
def test_devox_bwd_corner_packed_pallas(rng, n, c, r):
    """The corner-packed Pallas scatter (ops/pallas/packed_scatter.py) must be
    oracle-exact for every pack width (interpret mode compiles the same kernel
    that runs on TPU)."""
    from pvcnn_tpu import ops
    b = 2
    grid = rng.randn(b, r, r, r, c).astype(np.float32)
    nc = rng.uniform(0, r - 1, size=(b, n, 3)).astype(np.float32)
    nc[0, 0] = [r - 1, r - 1, r - 1]       # exact boundary: collapsed corners
    nc[0, 1] = [0, 0, 0]
    w = rng.randn(b, n, c).astype(np.float32)

    def f(x):
        return jnp.sum(ops.trilinear_devoxelize(x, jnp.asarray(nc), r)
                       * jnp.asarray(w))

    with jax.default_matmul_precision("float32"):
        ana = np.asarray(jax.grad(f)(jnp.asarray(grid)))
    want = _devox_bwd_reference(w, nc, r, c)
    np.testing.assert_allclose(ana, want.reshape(ana.shape), rtol=1e-4,
                               atol=1e-4)


def test_packed_scatter_row_halving(rng):
    """rows too large for the VMEM plan -> the caller halves N and sums."""
    from pvcnn_tpu.ops.pallas.packed_scatter import packed_scatter_plan
    from pvcnn_tpu.ops.devoxelize import (_corner_offsets, _corners,
                                          _packed_pallas_scatter)
    b, n, c, r = 1, 16384, 16, 8
    assert packed_scatter_plan(r * r * r, n, 8 * c, c, _corner_offsets(r)[-1],
                               jnp.float32) is None
    nc = rng.uniform(0, r - 1, size=(b, n, 3)).astype(np.float32)
    w = rng.randn(b, n, c).astype(np.float32)
    idx8, w8 = _corners(jnp.asarray(nc), r)
    values = np.asarray(w8)[..., None] * w[:, :, None, :]
    got = _packed_pallas_scatter(jnp.asarray(values), idx8, r * r * r,
                                 _corner_offsets(r), 8, jnp.float32)
    want = _devox_bwd_reference(w, nc, r, c)
    np.testing.assert_allclose(np.asarray(got), want.reshape(got.shape),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "n,c,r",
    [(256, 16, 8),     # K=8 full pack, rows=N=256 (bs=256 window)
     (256, 32, 8),     # K=4, rows=2N
     (512, 64, 8),     # K=2, rows=4N
     (256, 8, 16)])    # K=8 at R=16 (multiple bin tiles)
def test_devox_bwd_sorted_pallas(rng, n, c, r):
    """The SORTED corner-packed scatter (ops/pallas/sorted_scatter.py) must be
    oracle-exact for every pack width."""
    from pvcnn_tpu.ops.devoxelize import (_corner_offsets, _corners,
                                          _sorted_pallas_scatter)
    b = 2
    nc = rng.uniform(0, r - 1, size=(b, n, 3)).astype(np.float32)
    nc[0, 0] = [r - 1, r - 1, r - 1]       # exact boundary: collapsed corners
    nc[0, 1] = [0, 0, 0]
    w = rng.randn(b, n, c).astype(np.float32)
    idx8, w8 = _corners(jnp.asarray(nc), r)
    k = 8 if c <= 16 else (4 if c <= 32 else 2)
    got = _sorted_pallas_scatter(jnp.asarray(w), w8, idx8, r * r * r,
                                 _corner_offsets(r), k, jnp.float32)
    assert got is not None
    want = _devox_bwd_reference(w, nc, r, c)
    np.testing.assert_allclose(np.asarray(got), want.reshape(got.shape),
                               rtol=1e-4, atol=1e-4)


def test_sorted_scatter_skewed_bins(rng):
    """Every point in ONE voxel: a single tile's window spans all row blocks
    (multi-iteration inner loop), every other tile is empty (zero-block
    windows)."""
    from pvcnn_tpu.ops.devoxelize import (_corner_offsets, _corners,
                                          _sorted_pallas_scatter)
    b, n, c, r = 1, 256, 16, 8
    nc = np.full((b, n, 3), 2.5, np.float32)
    w = rng.randn(b, n, c).astype(np.float32)
    idx8, w8 = _corners(jnp.asarray(nc), r)
    got = _sorted_pallas_scatter(jnp.asarray(w), w8, idx8, r * r * r,
                                 _corner_offsets(r), 8, jnp.float32)
    assert got is not None
    want = _devox_bwd_reference(w, nc, r, c)
    np.testing.assert_allclose(np.asarray(got), want.reshape(got.shape),
                               rtol=1e-4, atol=1e-4)


def test_sorted_scatter_row_halving(rng):
    """rows too large for the sorted VMEM plan -> the caller halves N and sums
    the partial scatters."""
    from pvcnn_tpu.ops.pallas.sorted_scatter import sorted_scatter_plan
    from pvcnn_tpu.ops.devoxelize import (_corner_offsets, _corners,
                                          _sorted_pallas_scatter)
    b, n, c, r = 1, 16384, 16, 8
    assert sorted_scatter_plan(r * r * r, n, 8 * c, c, _corner_offsets(r)[-1],
                               jnp.float32, b) is None
    nc = rng.uniform(0, r - 1, size=(b, n, 3)).astype(np.float32)
    w = rng.randn(b, n, c).astype(np.float32)
    idx8, w8 = _corners(jnp.asarray(nc), r)
    got = _sorted_pallas_scatter(jnp.asarray(w), w8, idx8, r * r * r,
                                 _corner_offsets(r), 8, jnp.float32)
    assert got is not None
    want = _devox_bwd_reference(w, nc, r, c)
    np.testing.assert_allclose(np.asarray(got), want.reshape(got.shape),
                               rtol=1e-4, atol=1e-4)


def test_sorted_scatter_halving_keyed_on_activation_dtype(rng):
    """When the VMEM plan rejects the full row count, fp32 gradients halve and
    proceed (sorted still beats the XLA fallback for them), while bf16
    gradients bail out at depth 0 to the half-pack fallback that measures
    faster in-step. Regression test: the gate must key on the GRADIENT dtype —
    the matmul dtype is bf16 inside any default-precision step."""
    from pvcnn_tpu.ops.devoxelize import (_corner_offsets, _corners,
                                          _sorted_pallas_scatter)
    b, n, c, r = 1, 16384, 16, 8
    nc = rng.uniform(0, r - 1, size=(b, n, 3)).astype(np.float32)
    idx8, w8 = _corners(jnp.asarray(nc), r)
    g32 = jnp.asarray(rng.randn(b, n, c), dtype=jnp.float32)
    assert _sorted_pallas_scatter(g32, w8, idx8, r * r * r,
                                  _corner_offsets(r), 8,
                                  jnp.bfloat16) is not None
    g16 = g32.astype(jnp.bfloat16)
    assert _sorted_pallas_scatter(g16, w8, idx8, r * r * r,
                                  _corner_offsets(r), 8,
                                  jnp.bfloat16) is None


def test_scatter_multi_chunk_emit(rng):
    """Force n_chunks > 1 in BOTH packed kernels (R=32, C=64, K=2: the full
    output exceeds the one-chunk VMEM budget). Exercises the chunked emit's
    per-chunk ring warm-up recompute, previously only reachable on real-TPU
    R=32 runs."""
    from pvcnn_tpu.ops.pallas.packed_scatter import packed_scatter_plan
    from pvcnn_tpu.ops.pallas.sorted_scatter import sorted_scatter_plan
    from pvcnn_tpu.ops.devoxelize import (_corner_offsets, _corners,
                                          _packed_pallas_scatter,
                                          _sorted_pallas_scatter)
    b, n, c, r, k = 1, 128, 64, 32, 2
    r3 = r * r * r
    offs = _corner_offsets(r)
    rows = (8 // k) * n
    p = packed_scatter_plan(r3, rows, k * c, c, offs[k - 1], jnp.float32)
    s = sorted_scatter_plan(r3, rows, k * c, c, offs[k - 1], jnp.float32, b)
    assert p is not None and r3 // (p[0] * p[1]) > 1, p
    assert s is not None and r3 // (s[0] * s[1]) > 1, s

    nc = rng.uniform(0, r - 1, size=(b, n, 3)).astype(np.float32)
    w = rng.randn(b, n, c).astype(np.float32)
    idx8, w8 = _corners(jnp.asarray(nc), r)
    want = _devox_bwd_reference(w, nc, r, c)

    values = np.asarray(w8)[..., None] * w[:, :, None, :]
    got_p = _packed_pallas_scatter(jnp.asarray(values), idx8, r3, offs, k,
                                   jnp.float32)
    assert got_p is not None
    np.testing.assert_allclose(np.asarray(got_p), want.reshape(got_p.shape),
                               rtol=1e-4, atol=1e-4)

    got_s = _sorted_pallas_scatter(jnp.asarray(w), w8, idx8, r3, offs, k,
                                   jnp.float32)
    assert got_s is not None
    np.testing.assert_allclose(np.asarray(got_s), want.reshape(got_s.shape),
                               rtol=1e-4, atol=1e-4)


def test_devoxelize_grad_through_pallas_path(rng):
    from pvcnn_tpu import ops
    b, n, c, r = 1, 32, 2, 8
    grid = rng.randn(b, r, r, r, c).astype(np.float32)
    nc = rng.uniform(0, r - 1, size=(b, n, 3)).astype(np.float32)

    def f(x):
        return jnp.sum(ops.trilinear_devoxelize(x, jnp.asarray(nc), r) ** 2)

    with jax.default_matmul_precision("float32"):
        ana = np.asarray(jax.grad(f)(jnp.asarray(grid)))
    # numerical grad
    eps = 1e-2
    num = np.zeros_like(grid)
    flat, nflat = grid.reshape(-1), num.reshape(-1)
    sel = rng.choice(flat.size, size=40, replace=False)
    for i in sel:
        orig = flat[i]
        flat[i] = orig + eps
        fp = float(f(jnp.asarray(grid)))
        flat[i] = orig - eps
        fm = float(f(jnp.asarray(grid)))
        flat[i] = orig
        nflat[i] = (fp - fm) / (2 * eps)
    np.testing.assert_allclose(ana.reshape(-1)[sel], nflat[sel], rtol=2e-2,
                               atol=2e-2)


@pytest.mark.parametrize("r,c,n", [(8, 16, 256), (16, 32, 512)])
def test_devox_fwd_sorted_gather(rng, monkeypatch, r, c, n):
    """The SORTED corner-packed forward gather (ops/pallas/sorted_gather.py)
    must be oracle-exact in fp32, including collapsed boundary corners."""
    import oracles
    from pvcnn_tpu.ops import devoxelize as dv
    monkeypatch.setenv("PVCNN_TPU_DEVOX_FWD_SORTED", "1")
    b = 2
    grid = rng.randn(b, r, r, r, c).astype(np.float32)
    nc = rng.uniform(0, r - 1, size=(b, n, 3)).astype(np.float32)
    nc[0, 0] = [r - 1, r - 1, r - 1]       # exact boundary: collapsed corners
    nc[0, 1] = [0, 0, 0]
    nc[0, 2] = [1.0, 2.0, 3.0]             # integral interior point
    got, _ = dv._devox_fwd(jnp.asarray(grid), jnp.asarray(nc), r)
    want = oracles.trilinear_devoxelize(grid, nc)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_devox_fwd_sorted_gather_multichunk_and_skew(rng, monkeypatch):
    """R=32 fp32 plans to n_chunks > 1 (exercises the chunk-B spill window),
    with every point in one voxel (single tile's window spans all row
    blocks)."""
    import oracles
    from pvcnn_tpu.ops import devoxelize as dv
    from pvcnn_tpu.ops.pallas.sorted_gather import sorted_gather_plan
    monkeypatch.setenv("PVCNN_TPU_DEVOX_FWD_SORTED", "1")
    b, n, c, r = 1, 256, 16, 32
    r3 = r * r * r
    plan = sorted_gather_plan(r3, n, c, dv._corner_offsets(r)[-1],
                              jnp.float32, b)
    assert plan is not None and r3 // (plan[0] * plan[1]) > 1, plan
    grid = rng.randn(b, r, r, r, c).astype(np.float32)
    nc = rng.uniform(0, r - 1, size=(b, n, 3)).astype(np.float32)
    nc[0, :64] = [7.25, 3.5, 9.75]         # skew: one voxel, many rows
    nc[0, 64] = [r - 1, r - 1, r - 1]
    got, _ = dv._devox_fwd(jnp.asarray(grid), jnp.asarray(nc), r)
    want = oracles.trilinear_devoxelize(grid, nc)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("c,bins", [(6, 2048), (7, 32768), (10, 4096),
                                    (40, 2048)])
def test_scatter_sum_subslot_expansion_exact(rng, c, bins):
    """_scatter_sum's sub-slot expansion (ops/voxelize.py): scattering
    e-expanded values x (x) 1[idx mod e == s] into bins/e coarse bins and
    reshaping must equal the plain segment_sum for every expansion level the
    gate picks (incl. c=40 -> e=1 passthrough and c=7/bins=32768 -> e=16,
    the headline avgvox shape class where the M=8 one-hot dot idled 15/16 of
    the MXU's sublane rows)."""
    b, n = 2, 512
    v = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    i = jnp.asarray(rng.randint(0, bins, (b, n)).astype(np.int32))
    from pvcnn_tpu.ops.voxelize import _scatter_sum

    with jax.default_matmul_precision("float32"):
        got = np.asarray(_scatter_sum(v, i, bins))
    want = np.asarray(jax.vmap(
        lambda vv, ii: jax.ops.segment_sum(vv, ii, num_segments=bins))(v, i))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
