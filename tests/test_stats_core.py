"""Curvature, point statistics, spectral: golden values + reference oracles."""

import numpy as np
import pytest
from scipy.spatial import distance_matrix
from scipy.spatial.distance import directed_hausdorff

from cmtci.stats import curvature, pointstats, spectral


def _circle(n=400, r=2.0, noise=0.0, rng=None):
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    xy = np.column_stack([r * np.cos(t), r * np.sin(t)])
    if noise and rng is not None:
        xy += noise * rng.normal(size=xy.shape)
    return xy


class TestCurvature:
    def test_circle_curvature_is_inverse_radius(self):
        for r in (0.5, 1.0, 2.0):
            k, ks, speed, aux = curvature.localpoly_curvature(_circle(500, r), neighbors=7)
            # quadratic-window discretization bias is ~1.1e-3 relative here
            np.testing.assert_allclose(k, 1.0 / r, rtol=3e-3)
            # CCW circle: positive signed curvature
            assert np.all(ks > 0)

    def test_matches_reference_loop(self, rng):
        # faithful sequential reimplementation of the reference estimator
        p = _circle(120, 1.0, noise=0.01, rng=rng)
        k, ks, speed, aux = curvature.localpoly_curvature(p, neighbors=5)

        n = len(p)
        m = 5
        for i in [0, 3, 57, 119]:
            idxs = [(i + d) % n for d in range(-m, m + 1)]
            xy = p[idxs]
            mid = len(idxs) // 2
            s = np.zeros(len(idxs))
            for kk in range(mid + 1, len(idxs)):
                s[kk] = s[kk - 1] + np.linalg.norm(xy[kk] - xy[kk - 1])
            for kk in range(mid - 1, -1, -1):
                s[kk] = s[kk + 1] - np.linalg.norm(xy[kk + 1] - xy[kk])
            a = np.c_[np.ones_like(s), s, s**2]
            ax, *_ = np.linalg.lstsq(a, xy[:, 0], rcond=None)
            bx, *_ = np.linalg.lstsq(a, xy[:, 1], rcond=None)
            x1, x2 = ax[1], 2 * ax[2]
            y1, y2 = bx[1], 2 * bx[2]
            ref_k = abs(x1 * y2 - y1 * x2) / (np.sqrt(x1**2 + y1**2) + 1e-16) ** 3
            assert k[i] == pytest.approx(ref_k, rel=1e-8)

    def test_gradient_curvature_circle(self):
        k = curvature.gradient_curvature(_circle(2000, 2.0))
        np.testing.assert_allclose(np.median(k), 0.5, rtol=1e-2)

    def test_pca_eccentricity_line_vs_blob(self, rng):
        line = np.column_stack([np.linspace(0, 1, 200), np.zeros(200)])
        blob = rng.normal(size=(200, 2))
        assert curvature.pca_eccentricity(line, k=6).mean() < 0.01
        assert curvature.pca_eccentricity(blob, k=6).mean() > 0.05


class TestPointStats:
    def test_pair_correlation_matches_reference(self, rng):
        pts = rng.uniform(size=(300, 2))
        r, g = pointstats.pair_correlation(pts, r_max=0.5, dr=0.05)
        # reference computation
        n = len(pts)
        area = (pts[:, 0].max() - pts[:, 0].min()) * (pts[:, 1].max() - pts[:, 1].min())
        rho = n / area
        d = distance_matrix(pts, pts)[np.triu_indices(n, k=1)]
        ref = []
        for rr in np.arange(0, 0.5, 0.05):
            cnt = np.sum((d >= rr) & (d < rr + 0.05))
            norm = 2 * np.pi * rr * 0.05 * n * rho
            ref.append(cnt / norm if norm > 0 else 0)
        np.testing.assert_allclose(g, ref, rtol=1e-10)

    def test_ripley_k_matches_reference(self, rng):
        pts = rng.uniform(size=(250, 2))
        r, k = pointstats.ripley_k(pts, r_max=0.4, dr=0.04)
        n = len(pts)
        area = (pts[:, 0].max() - pts[:, 0].min()) * (pts[:, 1].max() - pts[:, 1].min())
        rho = n / area
        d = distance_matrix(pts, pts)[np.triu_indices(n, k=1)]
        ref = [(2 * np.sum(d < rr)) / (n * rho) for rr in np.arange(0, 0.4, 0.04)]
        np.testing.assert_allclose(k, ref, rtol=1e-10)

    def test_hausdorff_matches_scipy(self, rng):
        a = rng.normal(size=(200, 2))
        b = rng.normal(size=(150, 2))
        ref = max(directed_hausdorff(a, b)[0], directed_hausdorff(b, a)[0])
        assert pointstats.hausdorff(a, b) == pytest.approx(ref, rel=1e-12)

    def test_fractal_dimension_of_filled_square(self, rng):
        pts = rng.uniform(size=(20000, 2))
        d, _ = pointstats.fractal_dimension(pts)
        assert d == pytest.approx(2.0, abs=0.2)


class TestSpectral:
    def test_circle_spectrum_single_mode(self):
        xy = _circle(256, 1.0)
        freqs, f = spectral.boundary_fft(xy)
        amp = np.abs(f)
        # a circle traced CCW is a pure e^{it}: all energy in mode 1
        assert amp[1] / amp.sum() > 0.999

    def test_reconstruct_low_modes(self, rng):
        xy = _circle(128, 1.0, noise=0.02, rng=rng)
        _, f = spectral.boundary_fft(xy)
        rec = spectral.reconstruct_low_modes(f, 5)
        assert rec.shape == (128,)
        np.testing.assert_allclose(np.abs(rec), 1.0, atol=0.15)

    def test_decay_fit_recovers_slope(self, rng):
        freqs = np.logspace(-3, -0.31, 400)
        spec = freqs**-1.7 * np.exp(rng.normal(scale=0.01, size=400))
        spec /= spec.max()
        out = spectral.fit_decay_exponent(freqs, spec, 1e-3, 1e-1)
        assert out is not None
        slope, r2, npts = out
        assert slope == pytest.approx(-1.7, abs=0.05)
        assert r2 > 0.99

    def test_bootstrap_ci_contains_slope(self, rng):
        freqs = np.logspace(-3, -0.31, 300)
        spec = freqs**-2.0 * np.exp(rng.normal(scale=0.05, size=300))
        spec /= spec.max()
        slope, r2, (lo, hi) = spectral.fit_slope_bootstrap(freqs, spec, 1e-3, 1e-1)
        assert lo < slope < hi
        assert hi - lo < 0.2

    def test_spectral_distance_zero_for_identical(self, rng):
        x = rng.normal(size=(100, 2)) * 0.02
        assert spectral.spectral_distance(x, x) == pytest.approx(0.0, abs=1e-10)
        y = rng.normal(size=(100, 2)) * 0.05
        assert spectral.spectral_distance(x, y) > 0

    def test_spectral_distance_matches_reference(self, rng):
        x = (rng.normal(size=60) + 1j * rng.normal(size=60)) * 0.03
        y = (rng.normal(size=60) + 1j * rng.normal(size=60)) * 0.03
        # reference: nonsymmetric eigvals, sort real parts, top-K L2/sqrt(K)
        from scipy.spatial.distance import pdist, squareform

        d1 = squareform(pdist(np.c_[x.real, x.imag]))
        d2 = squareform(pdist(np.c_[y.real, y.imag]))
        k1 = np.exp(-(d1**2) / (2 * 0.05**2))
        k2 = np.exp(-(d2**2) / (2 * 0.05**2))
        w1 = np.sort(np.real(np.linalg.eigvals(k1)))[-30:]
        w2 = np.sort(np.real(np.linalg.eigvals(k2)))[-30:]
        ref = np.linalg.norm(w1 - w2) / np.sqrt(30)
        assert spectral.spectral_distance(x, y, 30, 0.05) == pytest.approx(ref, rel=1e-6, abs=1e-9)


class TestPointStatsDevice:
    """stat_dtype=float32: the O(n²) pair scans on the default device
    (masked-reduction head, exact int32 counts — the opt-in for
    beyond-reference bus sizes)."""

    def test_shell_counts_masked_head_matches_scatter(self, rng):
        import jax.numpy as jnp

        pts = rng.uniform(size=(641, 2))
        r64, c64, n64, rho64 = pointstats._shell_counts(pts, 0.5, 0.05)
        r32, c32, n32, rho32 = pointstats._shell_counts(pts, 0.5, 0.05,
                                                        dtype=jnp.float32)
        np.testing.assert_array_equal(r64, r32)
        assert (n64, rho64) == (n32, rho32)
        # int32 masked counts vs the host scatter histogram: the contract
        # is "identical up to borderline f32 bin-edge flips", so assert
        # THAT, not seed-dependent exact equality (a different host's f32
        # FMA/sqrt contraction can flip one borderline pair — CLAUDE.md):
        # flips move a pair to an adjacent bin, conserving the total and
        # bounding each bin's drift by the flips at its two edges
        below_max = float(r64[-1]) + 0.05  # pairs past the last edge drop
        d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
        n_in = int(np.count_nonzero((np.triu(d, 1) < below_max) & np.triu(
            np.ones_like(d, dtype=bool), 1)))
        assert abs(int(c64.sum()) - int(c32.sum())) <= 2  # edge-of-range flips
        assert int(c64.sum()) == n_in  # host histogram drops nothing inside
        np.testing.assert_array_equal(np.abs(c64 - c32) <= 2, True)

    def test_pair_stats_device_realization(self, rng):
        import jax.numpy as jnp

        pts = rng.uniform(size=(300, 2))
        sh = pointstats._shell_counts(pts, 0.4, 0.04, dtype=jnp.float32)
        _, g32 = pointstats.pair_correlation(pts, 0.4, 0.04, _shells=sh)
        _, g64 = pointstats.pair_correlation(pts, 0.4, 0.04)
        _, k32 = pointstats.ripley_k(pts, 0.4, 0.04, _shells=sh)
        _, k64 = pointstats.ripley_k(pts, 0.4, 0.04)
        np.testing.assert_allclose(g32, g64, rtol=1e-9)
        np.testing.assert_allclose(k32, k64, rtol=1e-9)

    def test_hausdorff_f32_device(self, rng):
        import jax.numpy as jnp

        a = rng.normal(size=(150, 2))
        b = rng.normal(size=(120, 2))
        ref = max(directed_hausdorff(a, b)[0], directed_hausdorff(b, a)[0])
        assert pointstats.hausdorff(a, b, dtype=jnp.float32) == pytest.approx(
            ref, rel=1e-5)

    @pytest.mark.slow
    def test_shell_counts_past_int32_pair_ceiling(self):
        # the (hi, lo) carry-spill replaced the old 65536-point ValueError:
        # a concentrated cloud past the old limit must return EXACT counts
        # (n=66000 in one bin = 2.18e9 pairs > 2^31, the old wrap point).
        # Coincident points keep the O(n²) distance pass vectorized-cheap.
        import jax.numpy as jnp

        n = 66_000
        pts = np.zeros((n, 2))
        pts[0] = (1.0, 1.0)  # nonzero area so rho is finite
        r_vals, counts, n_out, rho = pointstats._shell_counts(
            pts, 0.5, 0.05, dtype=jnp.float32)
        assert n_out == n
        # all coincident pairs land in bin 0; the (n-1) pairs to the far
        # corner exceed r_max and are dropped
        assert counts[0] == n * (n - 1) // 2 - (n - 1), counts[0]
        assert counts[1:].sum() == 0
