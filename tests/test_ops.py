"""Unit tests: each pvcnn_tpu op vs. the numpy oracle of the reference CUDA kernel,
plus gradient checks against JAX numerical grads where the reference has a backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracles
from pvcnn_tpu import ops


@pytest.fixture(autouse=True)
def _pallas_interpret(monkeypatch):
    # op tests exercise the Pallas kernels in interpret mode; this is opt-in
    # per module (session-wide it can SIGABRT XLA's CPU compiler inside the
    # big sharded train-step jits, see tests/conftest.py)
    monkeypatch.setenv("PVCNN_TPU_PALLAS_INTERPRET", "1")


def rand_coords(rng, b, n, scale=1.0):
    return rng.randn(b, n, 3).astype(np.float32) * scale


class TestAvgVoxelize:
    def test_matches_oracle(self, rng):
        b, n, c, r = 2, 64, 5, 4
        feats = rng.randn(b, n, c).astype(np.float32)
        vc = rng.randint(0, r, size=(b, n, 3)).astype(np.int32)
        got = np.asarray(ops.avg_voxelize(jnp.asarray(feats), jnp.asarray(vc), r))
        want = oracles.avg_voxelize(feats, vc, r)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_grad_matches_reference_backward(self, rng):
        # reference backward: grad_x[i] = grad_y[voxel(i)] / count(voxel(i))
        # (vox.cu:86-110); JAX AD of segment-mean must reproduce it.
        b, n, c, r = 1, 16, 3, 2
        feats = rng.randn(b, n, c).astype(np.float32)
        vc = rng.randint(0, r, size=(b, n, 3)).astype(np.int32)
        g = rng.randn(b, r, r, r, c).astype(np.float32)

        def f(x):
            return jnp.sum(ops.avg_voxelize(x, jnp.asarray(vc), r) * jnp.asarray(g))

        grad = np.asarray(jax.grad(f)(jnp.asarray(feats)))
        flat_idx = vc[..., 0] * r * r + vc[..., 1] * r + vc[..., 2]
        cnt = np.zeros((b, r ** 3))
        for bi in range(b):
            for i in range(n):
                cnt[bi, flat_idx[bi, i]] += 1
        want = np.zeros_like(feats)
        gflat = g.reshape(b, r ** 3, c)
        for bi in range(b):
            for i in range(n):
                want[bi, i] = gflat[bi, flat_idx[bi, i]] / cnt[bi, flat_idx[bi, i]]
        np.testing.assert_allclose(grad, want, rtol=1e-5, atol=1e-5)


class TestNormalizeCoords:
    @pytest.mark.parametrize("normalize", [True, False])
    def test_ranges(self, rng, normalize):
        coords = rand_coords(rng, 2, 128, scale=0.4)
        r = 8
        vc, nc = ops.normalize_coords(jnp.asarray(coords), r, normalize=normalize)
        vc, nc = np.asarray(vc), np.asarray(nc)
        assert vc.min() >= 0 and vc.max() <= r - 1
        assert nc.min() >= 0 and nc.max() <= r - 1
        np.testing.assert_array_equal(vc, np.round(nc).astype(np.int32))

    def test_normalized_centering(self, rng):
        coords = rand_coords(rng, 2, 64)
        _, nc = ops.normalize_coords(jnp.asarray(coords), 8, normalize=True)
        # mean-centered + scaled to [0,0.5+0.5] then *R: center lands at R/2
        np.testing.assert_allclose(np.asarray(nc).mean(1), 4.0, atol=1.0)


class TestTrilinearDevoxelize:
    def test_matches_oracle(self, rng):
        b, n, c, r = 2, 32, 4, 4
        grid = rng.randn(b, r, r, r, c).astype(np.float32)
        nc = rng.uniform(0, r - 1, size=(b, n, 3)).astype(np.float32)
        # include exact-boundary and exact-integer coords
        nc[0, 0] = [r - 1, r - 1, r - 1]
        nc[0, 1] = [0, 0, 0]
        nc[0, 2] = [1.0, 2.0, 1.5]
        got = np.asarray(ops.trilinear_devoxelize(jnp.asarray(grid), jnp.asarray(nc), r))
        want = oracles.trilinear_devoxelize(grid, nc)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_grad_is_scatter_of_weights(self, rng):
        b, n, c, r = 1, 8, 2, 3
        grid = rng.randn(b, r, r, r, c).astype(np.float32)
        nc = rng.uniform(0, r - 1, size=(b, n, 3)).astype(np.float32)

        def f(x):
            return jnp.sum(ops.trilinear_devoxelize(x, jnp.asarray(nc), r) ** 2)

        num = _numerical_grad(f, grid)
        ana = np.asarray(jax.grad(f)(jnp.asarray(grid)))
        np.testing.assert_allclose(ana, num, rtol=1e-2, atol=1e-2)

    # the TPU-tuned formulations are chosen statically by (N, R, C); pin shapes
    # that reach each branch so all stay oracle-exact (see _devox_fwd/_devox_bwd)
    @pytest.mark.parametrize(
        "n,c,r,branch",
        [(64, 16, 4, "bwd-pack8"),       # c <= 32: N rows of 8C at base corner
         (64, 40, 4, "bwd-pack4"),       # 32 < c <= 64: 2N rows of 4C
         (64, 72, 4, "bwd-plain"),       # c > 64: per-corner segment_sum
         (1024, 136, 16, "fwd-packed")], # 8N >= 2R3 and grid > 2MB: packed gather
    )
    def test_formulation_branches_match_oracle(self, rng, n, c, r, branch):
        b = 1
        grid = rng.randn(b, r, r, r, c).astype(np.float32)
        nc = rng.uniform(0, r - 1, size=(b, n, 3)).astype(np.float32)
        nc[0, 0] = [r - 1, r - 1, r - 1]     # exact boundary: collapsed corners
        nc[0, 1] = [0, 0, 0]
        got = np.asarray(
            ops.trilinear_devoxelize(jnp.asarray(grid), jnp.asarray(nc), r))
        want = oracles.trilinear_devoxelize(grid, nc)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

        # backward: d/dgrid sum(w * out) == scatter of weights; compare against
        # the transpose computed by the plain 8N-corner oracle scatter
        w = rng.randn(b, n, c).astype(np.float32)

        def f(x):
            return jnp.sum(ops.trilinear_devoxelize(x, jnp.asarray(nc), r)
                           * jnp.asarray(w))

        # fp32 matmul precision: the c>64 branch routes through _scatter_sum,
        # whose Pallas one-hot path uses bf16 matmuls under default precision
        with jax.default_matmul_precision("float32"):
            ana = np.asarray(jax.grad(f)(jnp.asarray(grid)))
        want_g = oracles.trilinear_devoxelize_grad(w, nc, r)
        np.testing.assert_allclose(ana, want_g.reshape(ana.shape), rtol=1e-4,
                                   atol=1e-4)

    def test_avg_voxelize_sorted_matches_plain(self, rng, monkeypatch):
        """avg_voxelize_sorted on floor-base-sorted rows == avg_voxelize on
        round bins (fwd and d/dfeatures), including half-to-even rounding and
        edge coords — the indicator-weights reformulation must be exact.
        (Kernel path is opt-in — measured slower than the flat scatter at the
        headline config — so force it on here.)"""
        from pvcnn_tpu.ops.voxelize import avg_voxelize_sorted

        monkeypatch.setenv("PVCNN_TPU_AVGVOX_SORTED", "1")

        b, n, c, r = 2, 512, 6, 16
        feats = rng.randn(b, n, c).astype(np.float32)
        nc = rng.uniform(0, r - 1, size=(b, n, 3)).astype(np.float32)
        nc[0, 0] = [r - 1, r - 1, r - 1]
        nc[0, 1] = [0, 0, 0]
        nc[0, 2] = [1.5, 2.5, 3.0]           # exact halves: round-to-even
        base = np.asarray(ops.corner_base_bins(jnp.asarray(nc), r))
        order = np.argsort(base, axis=1, kind="stable")
        nc = np.take_along_axis(nc, order[..., None], axis=1)
        feats = np.take_along_axis(feats, order[..., None], axis=1)
        vox = np.round(nc).astype(np.int32)

        with jax.default_matmul_precision("float32"):
            got = np.asarray(avg_voxelize_sorted(
                jnp.asarray(feats), jnp.asarray(nc), r))
            want = np.asarray(ops.avg_voxelize(
                jnp.asarray(feats), jnp.asarray(vox), r))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

            w = rng.randn(b, r, r, r, c).astype(np.float32)

            def f_sorted(x):
                return jnp.sum(avg_voxelize_sorted(x, jnp.asarray(nc), r)
                               * jnp.asarray(w))

            def f_plain(x):
                return jnp.sum(ops.avg_voxelize(x, jnp.asarray(vox), r)
                               * jnp.asarray(w))

            ga = np.asarray(jax.grad(f_sorted)(jnp.asarray(feats)))
            gb = np.asarray(jax.grad(f_plain)(jnp.asarray(feats)))
        np.testing.assert_allclose(ga, gb, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("c,ratio", [(6, 1), (16, 1), (16, 2)])
    def test_avg_voxelize_hybrid_bwd_matches_plain(self, rng, c, ratio):
        """The DEFAULT presorted path (AVGVOX_SORTED unset): flat round-bin
        scatter forward + sorted corner-gather backward
        (ops/voxelize.py::_avg_voxelize_hybrid). Forward and d/dfeatures must
        equal plain avg_voxelize on round bins exactly, including round-half-
        to-even coords, boundary coords, and the nested sort_ratio contract."""
        from pvcnn_tpu.ops.voxelize import avg_voxelize_sorted

        b, n, r = 2, 512, 16
        feats = rng.randn(b, n, c).astype(np.float32)
        if ratio == 1:
            nc = rng.uniform(0, r - 1, size=(b, n, 3)).astype(np.float32)
            nc[0, 0] = [r - 1, r - 1, r - 1]
            nc[0, 1] = [0, 0, 0]
            nc[0, 2] = [1.5, 2.5, 3.0]       # exact halves: round-to-even
            key = np.asarray(ops.corner_base_bins(jnp.asarray(nc), r))
        else:
            nc, fine = TestNestedPresort._nested_coords(rng, b, n, r, ratio)
            key = np.asarray(ops.corner_base_bins(jnp.asarray(fine),
                                                  ratio * r))
        order = np.argsort(key, axis=1, kind="stable")
        nc = np.take_along_axis(nc, order[..., None], axis=1)
        feats = np.take_along_axis(feats, order[..., None], axis=1)
        vox = np.round(nc).astype(np.int32)

        with jax.default_matmul_precision("float32"):
            got = np.asarray(avg_voxelize_sorted(
                jnp.asarray(feats), jnp.asarray(nc), r, sort_ratio=ratio))
            want = np.asarray(ops.avg_voxelize(
                jnp.asarray(feats), jnp.asarray(vox), r))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

            w = rng.randn(b, r, r, r, c).astype(np.float32)

            def f_sorted(x):
                return jnp.sum(avg_voxelize_sorted(
                    x, jnp.asarray(nc), r, sort_ratio=ratio) * jnp.asarray(w))

            def f_plain(x):
                return jnp.sum(ops.avg_voxelize(x, jnp.asarray(vox), r)
                               * jnp.asarray(w))

            ga = np.asarray(jax.grad(f_sorted)(jnp.asarray(feats)))
            gb = np.asarray(jax.grad(f_plain)(jnp.asarray(feats)))
        np.testing.assert_allclose(ga, gb, rtol=1e-4, atol=1e-5)

    def test_assume_sorted_matches_oracle(self, rng):
        """assume_sorted=True on rows presorted by corner_base_bins: the
        zero-gather fwd/bwd kernel paths (fwd needs the sorted-gather plan:
        N % 256 == 0, R^3 % 512 == 0; bwd needs C <= 16) stay oracle-exact."""
        b, n, c, r = 2, 512, 16, 16
        grid = rng.randn(b, r, r, r, c).astype(np.float32)
        nc = rng.uniform(0, r - 1, size=(b, n, 3)).astype(np.float32)
        nc[0, 0] = [r - 1, r - 1, r - 1]     # exact boundary: collapsed corners
        nc[0, 1] = [0, 0, 0]
        base = np.asarray(ops.corner_base_bins(jnp.asarray(nc), r))
        order = np.argsort(base, axis=1, kind="stable")
        nc = np.take_along_axis(nc, order[..., None], axis=1)

        with jax.default_matmul_precision("float32"):
            got = np.asarray(ops.trilinear_devoxelize(
                jnp.asarray(grid), jnp.asarray(nc), r, True))
        want = oracles.trilinear_devoxelize(grid, nc)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

        w = rng.randn(b, n, c).astype(np.float32)

        def f(x):
            return jnp.sum(ops.trilinear_devoxelize(x, jnp.asarray(nc), r,
                                                    True) * jnp.asarray(w))

        with jax.default_matmul_precision("float32"):
            ana = np.asarray(jax.grad(f)(jnp.asarray(grid)))
        want_g = oracles.trilinear_devoxelize_grad(w, nc, r)
        np.testing.assert_allclose(ana, want_g.reshape(ana.shape), rtol=1e-4,
                                   atol=1e-4)

    @pytest.mark.parametrize("c", [32, 64])   # nc=4 and nc=2 grouped paths
    def test_assume_sorted_grouped_bwd_boundary_coords(self, rng, monkeypatch,
                                                       c):
        """The grouped presorted backward (C > 16 splits the 8 corners into
        groups of nc < 8) must stay exact when points sit exactly on grid
        planes: frac == 0 on the group axis collapses hi onto lo, so the
        group's OWN corner bins are no longer `sort key + constant`. The key
        must be built as base0 + offs[gk*nc] (a true constant shift) or the
        bin windows misalign and nearby rows' NONZERO gradients get dropped
        (round-3 advisor finding, ops/devoxelize.py::_presorted_pallas_scatter)."""
        monkeypatch.setenv("PVCNN_TPU_PRESORTED_BWD_MAX_C", "64")
        b, n, r = 2, 512, 16
        grid = rng.randn(b, r, r, r, c).astype(np.float32)
        nc = rng.uniform(0, r - 1, size=(b, n, 3)).astype(np.float32)
        # many exact-integer coords on each axis (incl. clips to 0 / r-1):
        # these are the collapsed-corner rows that used to corrupt the key
        for ax in range(3):
            k = slice(ax * 100, ax * 100 + 50)
            nc[:, k, ax] = np.round(nc[:, k, ax])
        nc[:, 0] = [0, 0, 0]
        nc[:, 1] = [r - 1, r - 1, r - 1]
        base = np.asarray(ops.corner_base_bins(jnp.asarray(nc), r))
        order = np.argsort(base, axis=1, kind="stable")
        nc = np.take_along_axis(nc, order[..., None], axis=1)

        w = rng.randn(b, n, c).astype(np.float32)

        def f(x):
            return jnp.sum(ops.trilinear_devoxelize(x, jnp.asarray(nc), r,
                                                    True) * jnp.asarray(w))

        with jax.default_matmul_precision("float32"):
            ana = np.asarray(jax.grad(f)(jnp.asarray(grid)))
        want_g = oracles.trilinear_devoxelize_grad(w, nc, r)
        np.testing.assert_allclose(ana, want_g.reshape(ana.shape), rtol=1e-4,
                                   atol=1e-4)


class TestNestedPresort:
    """sort_ratio > 1: rows sorted by a FINER grid's base bins (the single
    trainer presort) are only CLUSTERED per x-slab of this grid; the sorted
    kernels must stay oracle-exact under tile_align = R^2 restricted plans
    (ops/devoxelize.py trilinear_devoxelize, ops/voxelize.py
    avg_voxelize_sorted)."""

    @staticmethod
    def _nested_coords(rng, b, n, r, ratio):
        """(nc_r, nc_fine): norm coords at R and ratio*R with the EXACT
        power-of-two relation nc_fine == ratio * nc_r that normalize_coords
        guarantees (fl(x*kR) == k*fl(x*R) for k a power of two), plus exact
        grid-plane hits and clipped boundary coords."""
        nc = rng.uniform(0, r - 1, size=(b, n, 3)).astype(np.float32)
        for ax in range(3):
            k = slice(ax * 40, ax * 40 + 20)
            nc[:, k, ax] = np.round(nc[:, k, ax])
        nc[:, 0] = [0, 0, 0]
        nc[:, 1] = [r - 1, r - 1, r - 1]
        fine = np.minimum(nc * ratio, ratio * r - 1.0).astype(np.float32)
        return nc, fine

    @pytest.mark.parametrize("c", [16, 32])   # nc=8 one-call and grouped bwd
    def test_devox_nested_sorted_matches_oracle(self, rng, monkeypatch, c):
        monkeypatch.setenv("PVCNN_TPU_PRESORTED_BWD_MAX_C", "64")
        b, n, r, ratio = 2, 512, 16, 2
        grid = rng.randn(b, r, r, r, c).astype(np.float32)
        nc, fine = self._nested_coords(rng, b, n, r, ratio)
        key = np.asarray(ops.corner_base_bins(jnp.asarray(fine), ratio * r))
        order = np.argsort(key, axis=1, kind="stable")
        nc = np.take_along_axis(nc, order[..., None], axis=1)

        with jax.default_matmul_precision("float32"):
            got = np.asarray(ops.trilinear_devoxelize(
                jnp.asarray(grid), jnp.asarray(nc), r, True, ratio))
        want = oracles.trilinear_devoxelize(grid, nc)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

        w = rng.randn(b, n, c).astype(np.float32)

        def f(x):
            return jnp.sum(ops.trilinear_devoxelize(
                x, jnp.asarray(nc), r, True, ratio) * jnp.asarray(w))

        with jax.default_matmul_precision("float32"):
            ana = np.asarray(jax.grad(f)(jnp.asarray(grid)))
        want_g = oracles.trilinear_devoxelize_grad(w, nc, r)
        np.testing.assert_allclose(ana, want_g.reshape(ana.shape), rtol=1e-4,
                                   atol=1e-4)

    def test_avg_voxelize_nested_sorted_matches_plain(self, rng, monkeypatch):
        from pvcnn_tpu.ops.voxelize import avg_voxelize_sorted

        monkeypatch.setenv("PVCNN_TPU_AVGVOX_SORTED", "1")
        b, n, c, r, ratio = 2, 512, 6, 16, 2
        feats = rng.randn(b, n, c).astype(np.float32)
        nc, fine = self._nested_coords(rng, b, n, r, ratio)
        key = np.asarray(ops.corner_base_bins(jnp.asarray(fine), ratio * r))
        order = np.argsort(key, axis=1, kind="stable")
        nc = np.take_along_axis(nc, order[..., None], axis=1)
        feats = np.take_along_axis(feats, order[..., None], axis=1)
        vox = np.round(nc).astype(np.int32)

        with jax.default_matmul_precision("float32"):
            got = np.asarray(avg_voxelize_sorted(
                jnp.asarray(feats), jnp.asarray(nc), r, sort_ratio=ratio))
            want = np.asarray(ops.avg_voxelize(
                jnp.asarray(feats), jnp.asarray(vox), r))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

            w = rng.randn(b, r, r, r, c).astype(np.float32)

            def f_sorted(x):
                return jnp.sum(avg_voxelize_sorted(
                    x, jnp.asarray(nc), r, sort_ratio=ratio) * jnp.asarray(w))

            def f_plain(x):
                return jnp.sum(ops.avg_voxelize(x, jnp.asarray(vox), r)
                               * jnp.asarray(w))

            ga = np.asarray(jax.grad(f_sorted)(jnp.asarray(feats)))
            gb = np.asarray(jax.grad(f_plain)(jnp.asarray(feats)))
        np.testing.assert_allclose(ga, gb, rtol=1e-4, atol=1e-5)


class TestConvRowsFused:
    """ops/pallas/conv_rows.py::conv3d_rows_act — the fused
    conv + BN-stats epilogue + BN-affine/LeakyReLU prologue (reference block
    modules/pvconv.py:20-30). Oracle: transform -> XLA conv -> +bias ->
    sums, with jax.grad through every differentiable argument."""

    @staticmethod
    def _ref(x, w, bias, ps, sh, r, has_pro):
        from pvcnn_tpu.ops.pallas.conv_rows import _xla_fallback_fwd

        if has_pro:
            t = x * ps[:, None] + sh[:, None]
            x = jnp.where(t > 0, t, 0.1 * t)
        y = _xla_fallback_fwd(x, w, r, None) + bias[:, None]
        return y, jnp.sum(y, axis=(0, 2)), jnp.sum(y * y, axis=(0, 2))

    @pytest.mark.parametrize("has_pro", [False, True])
    def test_matches_oracle_with_grads(self, rng, has_pro):
        from pvcnn_tpu.ops.pallas.conv_rows import (conv3d_rows_act,
                                                    conv_rows_plan)

        b, r, ci, co, k = 2, 16, 8, 16, 3
        r3 = r ** 3
        assert conv_rows_plan(b, r, ci, co, k, jnp.float32) is not None
        x = jnp.asarray(rng.randn(b, ci, r3).astype(np.float32))
        w = jnp.asarray((rng.randn(k, k, k, ci, co) * 0.1).astype(np.float32))
        bias = jnp.asarray(rng.randn(co).astype(np.float32))
        ps = jnp.asarray((rng.rand(ci) + 0.5).astype(np.float32))
        sh = jnp.asarray(rng.randn(ci).astype(np.float32))
        cy = jnp.asarray(rng.randn(b, co, r3).astype(np.float32))
        c1 = jnp.asarray(rng.randn(co).astype(np.float32))
        c2 = jnp.asarray(rng.randn(co).astype(np.float32) * 1e-3)

        with jax.default_matmul_precision("float32"):
            got = conv3d_rows_act(x, w, bias, ps, sh, r, has_pro, True)
            want = self._ref(x, w, bias, ps, sh, r, has_pro)
            for g, t, name in zip(got, want, "y s1 s2".split()):
                np.testing.assert_allclose(np.asarray(g), np.asarray(t),
                                           rtol=2e-4, atol=2e-4,
                                           err_msg=f"{name} pro={has_pro}")

            def loss(f):
                def fn(x, w, bias, ps, sh):
                    y, s1, s2 = f(x, w, bias, ps, sh)
                    return (jnp.sum(y * cy) + jnp.sum(s1 * c1)
                            + jnp.sum(s2 * c2))
                return fn

            ga = jax.grad(loss(lambda *a: conv3d_rows_act(
                *a, r, has_pro, True)), argnums=(0, 1, 2, 3, 4))(
                x, w, bias, ps, sh)
            gb = jax.grad(loss(lambda *a: self._ref(*a, r, has_pro)),
                          argnums=(0, 1, 2, 3, 4))(x, w, bias, ps, sh)
        for i, (a, b_) in enumerate(zip(ga, gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=3e-4, atol=3e-4,
                                       err_msg=f"grad arg {i} pro={has_pro}")

    def test_pvconv_fused_matches_unfused(self, rng, monkeypatch):
        """Module-level lock: the fused voxel branch (stats epilogue +
        prologue chain + final XLA activation + SE) computes the same loss,
        gradients, BATCH STATS, and eval output as the unfused
        conv/BatchNorm/leaky stack, with an identical param tree."""
        from jax.flatten_util import ravel_pytree

        from pvcnn_tpu.nn.pvconv import PVConv

        b, n, ci, co, r = 2, 256, 8, 16, 16
        feats = jnp.asarray(rng.randn(b, n, ci).astype(np.float32))
        coords = jnp.asarray((rng.rand(b, n, 3) * 2 - 1).astype(np.float32))
        model = PVConv(co, kernel_size=3, resolution=r, with_se=True)

        with jax.default_matmul_precision("float32"):
            variables = model.init({"params": jax.random.PRNGKey(0)},
                                   feats, coords, train=False)
            results = {}
            for knob in ("auto", "0"):
                monkeypatch.setenv("PVCNN_TPU_CONV_BN_FUSED", knob)

                def loss(p, bs):
                    (out, _), mut = model.apply(
                        {"params": p, "batch_stats": bs}, feats, coords,
                        train=True, mutable=["batch_stats"])
                    return jnp.sum(out * out), mut["batch_stats"]

                (val, new_bs), grads = jax.value_and_grad(
                    loss, has_aux=True)(variables["params"],
                                        variables["batch_stats"])
                out_eval, _ = model.apply(variables, feats, coords,
                                          train=False)
                results[knob] = (val, grads, new_bs, out_eval)

        va, ga, bsa, ea = results["auto"]
        vb, gb, bsb, eb = results["0"]
        assert jax.tree.structure(ga) == jax.tree.structure(gb)
        np.testing.assert_allclose(float(va), float(vb), rtol=1e-5)
        a, b_ = np.asarray(ravel_pytree(ga)[0]), np.asarray(ravel_pytree(gb)[0])
        assert np.abs(a - b_).max() < 2e-5 * np.abs(b_).max() + 5e-4
        np.testing.assert_allclose(np.asarray(ravel_pytree(bsa)[0]),
                                   np.asarray(ravel_pytree(bsb)[0]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ea), np.asarray(eb),
                                   rtol=1e-4, atol=1e-4)


class TestDenseRowsFused:
    """ops/pallas/dense_rows.py + nn/shared_mlp.py DenseStats — the fused
    point-branch Dense + BN-stats epilogue (reference
    modules/shared_mlp.py:6-33)."""

    def test_sharedmlp_fused_matches_plain(self, rng, monkeypatch):
        """Module-level lock: the fused train path (DenseStats + BN affine
        fold + ReLU) computes the same loss, gradients, BATCH STATS, and
        eval output as the plain Dense -> BatchNorm -> relu stack, with an
        identical param tree. Shapes chosen so the plan FITS (rows >= 1024,
        rows % 256 == 0)."""
        from jax.flatten_util import ravel_pytree

        from pvcnn_tpu.nn.shared_mlp import SharedMLP

        b, n, ci = 2, 1024, 24
        x = jnp.asarray(rng.randn(b, n, ci).astype(np.float32))
        model = SharedMLP([40, 24])

        with jax.default_matmul_precision("float32"):
            variables = model.init({"params": jax.random.PRNGKey(0)}, x)
            results = {}
            for knob in ("auto", "0"):
                monkeypatch.setenv("PVCNN_TPU_DENSE_BN_FUSED", knob)

                def loss(p, bs):
                    out, mut = model.apply(
                        {"params": p, "batch_stats": bs}, x, train=True,
                        mutable=["batch_stats"])
                    return jnp.sum(out * out), mut["batch_stats"]

                (val, new_bs), grads = jax.value_and_grad(
                    loss, has_aux=True)(variables["params"],
                                        variables["batch_stats"])
                out_eval = model.apply(variables, x, train=False)
                results[knob] = (val, grads, new_bs, out_eval)

        va, ga, bsa, ea = results["auto"]
        vb, gb, bsb, eb = results["0"]
        assert jax.tree.structure(ga) == jax.tree.structure(gb)
        np.testing.assert_allclose(float(va), float(vb), rtol=1e-5)
        a, b_ = np.asarray(ravel_pytree(ga)[0]), np.asarray(ravel_pytree(gb)[0])
        assert np.abs(a - b_).max() < 2e-5 * np.abs(b_).max() + 5e-4
        np.testing.assert_allclose(np.asarray(ravel_pytree(bsa)[0]),
                                   np.asarray(ravel_pytree(bsb)[0]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(ea), np.asarray(eb))

    def test_dense_rows_act_matches_oracle(self, rng):
        """Kernel-level: fwd/bwd (incl. prologue + stats cotangents) against
        a plain-jax oracle through jax.grad, 4-D rows."""
        from pvcnn_tpu.ops.pallas.dense_rows import (dense_rows_act,
                                                     dense_rows_plan)

        b, m, u, ci, co = 2, 64, 16, 24, 40
        x = jnp.asarray(rng.randn(b, m, u, ci).astype(np.float32))
        w = jnp.asarray((rng.randn(ci, co) * 0.1).astype(np.float32))
        bias = jnp.asarray(rng.randn(co).astype(np.float32))
        sc = jnp.asarray((rng.rand(ci) + 0.5).astype(np.float32))
        sh = jnp.asarray((rng.randn(ci) * 0.1).astype(np.float32))
        assert dense_rows_plan(b * m * u, ci, co, jnp.float32) is not None

        def oracle(x, w, bias, sc, sh):
            t = x * sc + sh
            a = jnp.where(t > 0, t, 0.0)
            y = a @ w + bias
            return y, jnp.sum(y, axis=(0, 1, 2)), jnp.sum(y * y,
                                                          axis=(0, 1, 2))

        def mk_loss(f):
            def loss(x, w, bias, sc, sh):
                y, s1, s2 = f(x, w, bias, sc, sh)
                return (jnp.sum(jnp.sin(y)) + jnp.sum(s1 * 0.3)
                        + jnp.sum(s2 * 0.01))
            return loss

        with jax.default_matmul_precision("float32"):
            y1, s1a, s2a = dense_rows_act(x, w, bias, sc, sh, 0.0, True,
                                          True)
            y0, s1b, s2b = oracle(x, w, bias, sc, sh)
            np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(s1a), np.asarray(s1b),
                                       rtol=1e-4, atol=1e-3)
            np.testing.assert_allclose(np.asarray(s2a), np.asarray(s2b),
                                       rtol=1e-4, atol=1e-3)
            ga = jax.grad(mk_loss(lambda *a: dense_rows_act(
                *a, 0.0, True, True)), argnums=(0, 1, 2, 3, 4))(
                x, w, bias, sc, sh)
            gb = jax.grad(mk_loss(oracle), argnums=(0, 1, 2, 3, 4))(
                x, w, bias, sc, sh)
        for i, (a, o) in enumerate(zip(ga, gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(o),
                                       rtol=2e-4, atol=2e-3,
                                       err_msg=f"grad arg {i}")


class TestPallasCostRecorder:
    """ops/pallas/cost.py: kernel wrappers report analytic FLOPs/bytes at
    trace time (bench.py sums them with XLA's cost analysis, which counts
    zero for Pallas custom calls)."""

    def test_records_during_fresh_lower_only(self, rng):
        from pvcnn_tpu.ops.pallas import cost
        from pvcnn_tpu.ops.pallas.scatter import onehot_scatter_add

        b, n, c, bins = 2, 256, 8, 512
        v = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
        i = jnp.asarray(rng.randint(0, bins, (b, n)).astype(np.int32))

        def f(v, i):
            return onehot_scatter_add(v, i, bins).sum()

        with cost.recording() as rec:
            jax.jit(f).lower(v, i)
        assert rec["flops"] == 2.0 * b * c * n * bins
        assert rec["by_kernel"]["onehot_scatter"]["calls"] == 1
        assert rec["bytes"] > 0
        # outside a recording context: no-op, no crosstalk
        before = dict(rec)
        jax.jit(lambda v, i: onehot_scatter_add(v, i, bins)).lower(v, i)
        assert rec["flops"] == before["flops"]

    def test_train_step_costs_nonzero_pallas(self, rng):
        """bench._step_costs on a tiny presorted train step must see Pallas
        FLOPs from the conv_rows + scatter/gather kernels (a cached-trace
        regression would silently return zero — the bug _step_costs'
        lower-before-execute ordering exists to avoid)."""
        import bench
        from pvcnn_tpu.models.shapenet import PVCNN
        from pvcnn_tpu.models.utils import pvconv_resolutions
        from pvcnn_tpu.nn.loss import CrossEntropyLoss
        from pvcnn_tpu.parallel import mesh as pmesh
        from pvcnn_tpu.train.optim import Adam
        from pvcnn_tpu.train.trainer import Trainer

        tx, _ = Adam(1e-3)
        model = PVCNN(num_classes=50, num_shapes=16, extra_feature_channels=3,
                      width_multiplier=0.25, dtype="float32")
        trainer = Trainer(
            model, CrossEntropyLoss(), tx,
            presort={"resolutions": pvconv_resolutions(PVCNN.blocks),
                     "normalize": False})
        b, n = 8, 512   # divisible by the conftest 8-device data mesh
        inputs = rng.randn(b, n, 22).astype(np.float32)
        labels = rng.randint(0, 50, size=(b, n))
        state = trainer.init_state(inputs[:1])
        batch = pmesh.shard_batch((inputs, labels), trainer.mesh)
        costs = bench._step_costs(trainer, state, batch,
                                  jax.random.PRNGKey(0))
        assert costs["pallas_flops_per_step"] > 0
        assert {"conv_rows_fwd", "conv_rows_wgrad", "sorted_gather",
                "sorted_scatter"} <= set(costs["pallas_by_kernel"])
        assert (costs["flops_per_step"] == costs["xla_flops_per_step"]
                + costs["pallas_flops_per_step"])


class TestBallQuery:
    def test_matches_oracle(self, rng):
        b, n, m, u = 2, 128, 16, 8
        points = rand_coords(rng, b, n, scale=0.5)
        centers = points[:, :m].copy()
        got = np.asarray(ops.ball_query(jnp.asarray(centers), jnp.asarray(points),
                                        0.4, u))
        want = oracles.ball_query(centers, points, 0.4, u)
        np.testing.assert_array_equal(got, want)

    def test_no_neighbors_gives_zeros(self, rng):
        points = rand_coords(rng, 1, 32, scale=0.1)
        centers = np.full((1, 4, 3), 100.0, dtype=np.float32)
        got = np.asarray(ops.ball_query(jnp.asarray(centers), jnp.asarray(points),
                                        0.1, 5))
        np.testing.assert_array_equal(got, 0)

    def test_short_list_repeats_first_hit(self, rng):
        # one center with exactly two hits, U = 4 -> [h0, h1, h0, h0]
        points = np.full((1, 8, 3), 50.0, dtype=np.float32)
        points[0, 3] = [0.0, 0.0, 0.0]
        points[0, 6] = [0.05, 0.0, 0.0]
        centers = np.zeros((1, 1, 3), dtype=np.float32)
        got = np.asarray(ops.ball_query(jnp.asarray(centers), jnp.asarray(points),
                                        0.2, 4))
        np.testing.assert_array_equal(got[0, 0], [3, 6, 3, 3])


class TestGrouping:
    def test_gather_shape_and_values(self, rng):
        b, n, c, m, u = 2, 32, 6, 5, 3
        feats = rng.randn(b, n, c).astype(np.float32)
        idx = rng.randint(0, n, size=(b, m, u)).astype(np.int32)
        got = np.asarray(ops.grouping(jnp.asarray(feats), jnp.asarray(idx)))
        for bi in range(b):
            for mi in range(m):
                for ui in range(u):
                    np.testing.assert_array_equal(got[bi, mi, ui],
                                                  feats[bi, idx[bi, mi, ui]])


class TestThreeNN:
    def test_matches_oracle(self, rng):
        b, n, m = 2, 64, 17
        points = rand_coords(rng, b, n)
        centers = rand_coords(rng, b, m)
        gi, gw = ops.three_nn(jnp.asarray(points), jnp.asarray(centers))
        wi, ww = oracles.three_nn(points, centers)
        np.testing.assert_array_equal(np.asarray(gi), wi)
        np.testing.assert_allclose(np.asarray(gw), ww, rtol=1e-4, atol=1e-6)

    def test_interpolate_and_grad(self, rng):
        b, n, m, c = 1, 16, 7, 4
        points = rand_coords(rng, b, n)
        centers = rand_coords(rng, b, m)
        feats = rng.randn(b, m, c).astype(np.float32)

        def f(x):
            return jnp.sum(
                ops.nearest_neighbor_interpolate(
                    jnp.asarray(points), jnp.asarray(centers), x) ** 2)

        num = _numerical_grad(f, feats)
        ana = np.asarray(jax.grad(f)(jnp.asarray(feats)))
        np.testing.assert_allclose(ana, num, rtol=1e-2, atol=1e-2)


class TestFPS:
    def test_matches_oracle_xla_path(self, rng):
        import pvcnn_tpu.ops.sampling as S
        b, n, m = 2, 100, 17
        coords = rand_coords(rng, b, n)
        got = np.asarray(jax.vmap(lambda c: S._fps_single(c, m))(jnp.asarray(coords)))
        want = oracles.furthest_point_sample_indices(coords, m)
        np.testing.assert_array_equal(got, want)

    def test_pallas_matches_oracle(self, rng):
        b, n, m = 2, 128, 16
        coords = rand_coords(rng, b, n)
        got = np.asarray(ops.furthest_point_sample_indices(jnp.asarray(coords), m))
        want = oracles.furthest_point_sample_indices(coords, m)
        np.testing.assert_array_equal(got, want)

    def test_returns_coords(self, rng):
        coords = rand_coords(rng, 1, 64)
        out = np.asarray(ops.furthest_point_sample(jnp.asarray(coords), 8))
        idx = oracles.furthest_point_sample_indices(coords, 8)
        np.testing.assert_allclose(out[0], coords[0, idx[0]], rtol=1e-6)


class TestLogitsMask:
    def test_selects_only_foreground(self, rng):
        b, n, m = 2, 64, 16
        coords = rand_coords(rng, b, n)
        logits = rng.randn(b, n, 2).astype(np.float32)
        sel, mean, mask = ops.logits_mask(jnp.asarray(coords), jnp.asarray(logits), m,
                                          jax.random.PRNGKey(0))
        sel, mean, mask = np.asarray(sel), np.asarray(mean), np.asarray(mask)
        want_mask = logits[..., 0] < logits[..., 1]
        np.testing.assert_array_equal(mask, want_mask)
        for bi in range(b):
            fg = coords[bi][want_mask[bi]]
            want_mean = fg.mean(0) if len(fg) else np.zeros(3)
            np.testing.assert_allclose(mean[bi], want_mean, rtol=1e-4, atol=1e-5)
            # every selected point must be a centered foreground point
            centered = fg - want_mean
            for j in range(m):
                d = np.abs(centered - sel[bi, j]).sum(-1).min() if len(fg) else np.abs(sel[bi, j]).sum()
                assert d < 1e-4

    def test_without_replacement_when_enough(self, rng):
        # all points foreground, N == M -> a permutation of all points
        b, n = 1, 16
        coords = rand_coords(rng, b, n)
        logits = np.zeros((b, n, 2), dtype=np.float32)
        logits[..., 1] = 1.0
        sel, mean, _ = ops.logits_mask(jnp.asarray(coords), jnp.asarray(logits), n,
                                       jax.random.PRNGKey(1))
        sel = np.asarray(sel) + np.asarray(mean)[:, None, :]
        got = np.sort(sel[0], axis=0)
        want = np.sort(coords[0], axis=0)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestLogitsMaskDistribution:
    """VERDICT item 8: the on-device sampler must match the reference host
    sampler (modules/functional/sampling.py:68-82) IN DISTRIBUTION — per-point
    marginal selection frequencies and the count<M repeat structure."""

    N = 32

    @staticmethod
    def _reference_draw(cand, m, rs):
        """Reference loop body -> per-point selection-count vector [N]."""
        counts = np.zeros(TestLogitsMaskDistribution.N, dtype=np.int64)
        k = len(cand)
        if k >= m:
            sel = cand[rs.choice(k, m, replace=False)]
        elif k > 0:
            choices = np.concatenate([
                np.arange(k).repeat(m // k),
                rs.choice(k, m % k, replace=False)])
            rs.shuffle(choices)  # order is irrelevant for count statistics
            sel = cand[choices]
        else:
            sel = np.zeros(m, dtype=np.int64)
        np.add.at(counts, sel, 1)
        return counts

    def _ours_counts(self, mask, m, draws):
        keys = jax.random.split(jax.random.PRNGKey(42), draws)
        sel = jax.vmap(
            lambda k: ops.logits_mask_indices(jnp.asarray(mask[None]), m, k)[0]
        )(keys)                                            # [draws, M]
        counts = np.zeros((draws, self.N), dtype=np.int64)
        np.add.at(counts, (np.arange(draws)[:, None], np.asarray(sel)), 1)
        return counts

    def _check_regime(self, cand, m, draws=4000, tv_tol=0.03):
        mask = np.zeros(self.N, dtype=bool)
        mask[cand] = True
        ours = self._ours_counts(mask, m, draws)
        rs = np.random.RandomState(7)
        ref = np.stack([self._reference_draw(cand, m, rs)
                        for _ in range(draws)])

        # non-candidates are never selected
        assert ours[:, ~mask].sum() == 0 and ref[:, ~mask].sum() == 0
        # exact multiset law per draw: counts in {floor(M/k), floor+1},
        # summing to M (k >= M degenerates to {0, 1})
        k = len(cand)
        lo = m // k
        for counts in (ours, ref):
            sel_counts = counts[:, mask]
            assert set(np.unique(sel_counts)) <= {lo, lo + 1}
            np.testing.assert_array_equal(sel_counts.sum(-1), m)
        # marginal frequencies: total-variation distance between the two
        # per-point expected-count profiles (normalized to sum 1)
        p = ours[:, mask].mean(0) / m
        q = ref[:, mask].mean(0) / m
        tv = 0.5 * np.abs(p - q).sum()
        assert tv < tv_tol, (tv, p, q)
        # every candidate's marginal is close to the uniform M/k expectation
        np.testing.assert_allclose(ours[:, mask].mean(0), m / k, rtol=0.1)
        np.testing.assert_allclose(ref[:, mask].mean(0), m / k, rtol=0.1)

    def test_subset_regime(self, rng):
        # count > M: uniform M-subset without replacement on both sides
        cand = np.sort(rng.choice(self.N, 24, replace=False))
        self._check_regime(cand, m=8)

    def test_repeat_regime(self, rng):
        # 0 < count < M: floor(M/count) copies each + random distinct remainder
        cand = np.sort(rng.choice(self.N, 5, replace=False))
        self._check_regime(cand, m=8)


class TestLosses:
    def test_huber(self, rng):
        err = rng.randn(40).astype(np.float32) * 3
        got = float(ops.huber_loss(jnp.asarray(err), 2.0))
        a = np.abs(err)
        q = np.minimum(a, 2.0)
        want = float(np.mean(0.5 * q ** 2 + 2.0 * (a - q)))
        assert abs(got - want) < 1e-5

    def test_kl_nonnegative_and_zero_at_equal(self, rng):
        x = rng.randn(4, 7).astype(np.float32)
        assert float(ops.kl_loss(jnp.asarray(x), jnp.asarray(x))) < 1e-4
        y = rng.randn(4, 7).astype(np.float32)
        assert float(ops.kl_loss(jnp.asarray(x), jnp.asarray(y))) > 0

    def test_cross_entropy_matches_manual(self, rng):
        logits = rng.randn(8, 5).astype(np.float32)
        labels = rng.randint(0, 5, size=(8,))
        got = float(ops.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want = float(np.mean(-np.log(p[np.arange(8), labels])))
        assert abs(got - want) < 1e-4


def _numerical_grad(f, x, eps=1e-3):
    g = np.zeros_like(x)
    flat = x.reshape(-1)
    gflat = g.reshape(-1)
    for i in range(flat.size):
        orig = flat[i]
        flat[i] = orig + eps
        fp = float(f(jnp.asarray(x)))
        flat[i] = orig - eps
        fm = float(f(jnp.asarray(x)))
        flat[i] = orig
        gflat[i] = (fp - fm) / (2 * eps)
    return g
