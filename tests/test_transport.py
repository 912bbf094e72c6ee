"""Transport layer: histograms/mollify/KL/TV, matching, Procrustes, GI-flow."""

import numpy as np
import pytest
from scipy.ndimage import gaussian_filter
from scipy.spatial.distance import cdist

from cmtci.transport import giflow, histogram as hg, procrustes, sinkhorn

DOMAIN = (-2.25, 1.25, -1.75, 1.75)


class TestHistogram:
    def test_histogram2d_matches_numpy(self, rng):
        x = rng.uniform(-3, 2, 5000)
        y = rng.uniform(-2, 2, 5000)
        ref, _, _ = np.histogram2d(
            x, y, bins=(64, 64), range=[[DOMAIN[0], DOMAIN[1]], [DOMAIN[2], DOMAIN[3]]]
        )
        got = np.asarray(hg.histogram2d(x, y, 64, DOMAIN))
        np.testing.assert_array_equal(got, ref)

    def test_edge_values(self):
        # values exactly on edges: interior edges go right, rightmost inclusive
        x = np.array([DOMAIN[0], DOMAIN[1], 0.5 * (DOMAIN[0] + DOMAIN[1])])
        y = np.array([DOMAIN[2], DOMAIN[3], DOMAIN[2]])
        ref, _, _ = np.histogram2d(x, y, bins=(8, 8), range=[[DOMAIN[0], DOMAIN[1]], [DOMAIN[2], DOMAIN[3]]])
        got = np.asarray(hg.histogram2d(x, y, 8, DOMAIN))
        np.testing.assert_array_equal(got, ref)

    def test_gaussian_filter_matches_scipy(self, rng):
        h = rng.uniform(size=(64, 64))
        ref = gaussian_filter(h, sigma=3.0, mode="nearest")
        got = np.asarray(hg.gaussian_filter_nearest(h, 3.0))
        np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-14)

    def test_mollified_histogram_reference_semantics(self, rng):
        cloud = rng.normal(size=3000) * 0.5 + 1j * rng.normal(size=3000) * 0.5
        got = np.asarray(hg.mollified_histogram(cloud, 64, DOMAIN, sigma_bins=3.0))
        # reference path in numpy/scipy
        h, _, _ = np.histogram2d(cloud.real, cloud.imag, bins=(64, 64),
                                 range=[[DOMAIN[0], DOMAIN[1]], [DOMAIN[2], DOMAIN[3]]])
        h = np.maximum(h, 1e-12)
        h = gaussian_filter(h, sigma=3.0, mode="nearest")
        h = np.maximum(h, 1e-12)
        ref = h / h.sum()
        np.testing.assert_allclose(got, ref, rtol=1e-12)
        # the tracker fast path's pure-numpy variant: identical counts and
        # filter; only the normalization sum's reduction order differs
        # (np pairwise vs XLA tree), ~1e-19 per bin
        got_np = hg.mollified_histogram(cloud, 64, DOMAIN, sigma_bins=3.0,
                                        host_numpy=True)
        np.testing.assert_allclose(got_np, got, rtol=1e-13, atol=1e-18)

    def test_kl_tv_overlap_identities(self, rng):
        p = rng.uniform(size=(32, 32))
        p /= p.sum()
        q = rng.uniform(size=(32, 32))
        q /= q.sum()
        assert hg.kl(p, p) == pytest.approx(0.0, abs=1e-12)
        assert hg.kl(p, q) > 0
        assert hg.tv_distance(p, p) == 0
        assert hg.overlap_mass(p, p) == pytest.approx(1.0)
        # overlap = 1 - TV for probability vectors
        assert hg.overlap_mass(p, q) == pytest.approx(1.0 - hg.tv_distance(p, q), abs=1e-12)

    def test_fraction_outside(self):
        cloud = np.array([0 + 0j, 5 + 0j, 0 + 5j, 1 + 1j])
        assert hg.fraction_outside_domain(cloud, DOMAIN) == pytest.approx(0.5)


class TestMatching:
    def test_argmax_match_is_nearest_neighbor(self, rng):
        x = rng.normal(size=300) + 1j * rng.normal(size=300)
        y = rng.normal(size=300) + 1j * rng.normal(size=300)
        my, mx = sinkhorn.entropic_argmax_match(x, y, eps=0.8, rng=np.random.RandomState(0))
        # reference semantics: match = argmax exp(-cdist/mean/eps) = nearest y
        d = cdist(np.c_[x.real, x.imag], np.c_[y.real, y.imag])
        d = d / d.mean()
        k = np.exp(-d / 0.8)
        ref = y[np.argmax(k, axis=1)]
        np.testing.assert_allclose(my, ref)
        np.testing.assert_allclose(mx, x)

    def test_argmax_match_subsamples(self, rng):
        x = rng.normal(size=100) + 1j * rng.normal(size=100)
        y = rng.normal(size=250) + 1j * rng.normal(size=250)
        my, mx = sinkhorn.entropic_argmax_match(x, y, rng=np.random.RandomState(1))
        assert len(my) == len(mx) == 100

    def test_sinkhorn_plan_marginals(self, rng):
        x = rng.normal(size=64) + 1j * rng.normal(size=64)
        y = rng.normal(size=64) + 1j * rng.normal(size=64)
        _, plan = sinkhorn.sinkhorn_match(x, y, eps=0.05, iters=500)
        np.testing.assert_allclose(plan.sum(axis=1), 1.0 / 64, rtol=1e-6)
        np.testing.assert_allclose(plan.sum(axis=0), 1.0 / 64, rtol=1e-6)


class TestProcrustes:
    def test_recovers_rotation_translation(self, rng):
        x = rng.normal(size=500) + 1j * rng.normal(size=500)
        theta = 0.7
        y = x * np.exp(1j * theta) + (0.3 - 0.2j)
        aligned = procrustes.procrustes_align_no_scale(x, y)
        np.testing.assert_allclose(aligned, y, atol=1e-10)

    def test_reference_convention_matches_reference_code(self, rng):
        # the "reference" convention must reproduce the reference's (buggy)
        # inverse-rotation alignment bit-for-bit for oracle parity
        from numpy.linalg import svd

        x = rng.normal(size=300) + 1j * rng.normal(size=300)
        y = rng.normal(size=300) + 1j * rng.normal(size=300)

        def ref(xc, yc):  # tci_construct_mandelbrot_v002_fixed.py:73-78
            xm = np.c_[xc.real, xc.imag]
            ym = np.c_[yc.real, yc.imag]
            x0, y0 = xm - xm.mean(0), ym - ym.mean(0)
            u, _, vt = svd(y0.T @ x0, full_matrices=False)
            r = u @ vt
            xa = (x0 @ r) + ym.mean(0)
            return xa[:, 0] + 1j * xa[:, 1]

        got = procrustes.procrustes_align_no_scale(x, y, convention="reference")
        np.testing.assert_array_equal(got, ref(x, y))

    def test_weighted_procrustes_identity_plan(self, rng):
        # with a permutation plan and exact correspondence, the weighted
        # variant recovers the rotation like the unweighted one
        x = rng.normal(size=(100, 2))
        th = 0.5
        rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        y = x @ rot.T + np.array([0.2, -0.1])
        plan = np.eye(100) / 100
        aligned, r = procrustes.procrustes_align_weighted(x, y, plan)
        np.testing.assert_allclose(aligned, y, atol=1e-10)

    def test_idempotent(self, rng):
        x = rng.normal(size=200) + 1j * rng.normal(size=200)
        y = rng.normal(size=200) + 1j * rng.normal(size=200)
        a1 = procrustes.procrustes_align_no_scale(x, y)
        a2 = procrustes.procrustes_align_no_scale(a1, y)
        np.testing.assert_allclose(a1, a2, atol=1e-10)


class TestGIFlow:
    def _p_x(self, rng):
        p = rng.uniform(size=(64, 64))
        p /= p.sum()
        x = rng.uniform(size=(64, 64))
        x /= x.sum()
        return p, x

    def test_fixed_t_matches_loop(self, rng):
        p, x0 = self._p_x(rng)
        xt, t, kl0, klt = giflow.gi_flow_fixed_t(p, x0, alpha=0.1, t_steps=25)
        x = x0.copy()
        for _ in range(25):
            x = 0.9 * x + 0.1 * p
        np.testing.assert_allclose(xt, x, rtol=1e-12)
        assert t == 25
        assert klt < kl0

    def test_kl_monotone_decrease(self, rng):
        # theorem: KL(P || (1-a)X + aP) decreases in t for the mixture flow
        p, x0 = self._p_x(rng)
        kls, traj = giflow.tci_flow(p, x0, alpha=0.2, t_steps=60)
        assert len(kls) == 61 and len(traj) == 61
        assert np.all(np.diff(kls) <= 1e-12)

    def test_adaptive_stops_at_threshold(self, rng):
        p, x0 = self._p_x(rng)
        xt, t, kl0, klt = giflow.gi_flow_to_threshold(
            p, x0, alpha=0.1, kl_threshold=1e-6, max_steps=800, min_steps=5
        )
        assert klt <= 1e-6
        assert 5 <= t < 800
        # exactly the first t with kl <= threshold
        x = x0.copy()
        steps = 0
        klv = np.inf
        while steps < t:
            x = 0.9 * x + 0.1 * p
            steps += 1
        np.testing.assert_allclose(xt, x, rtol=1e-10)

    def test_host_numpy_variants_match_jit(self, rng):
        """The tracker fast path's numpy flow loops (off the host XLA
        stream) give the same realization as the jitted paths: identical
        T_n / stop behavior, values to FMA-level tolerance."""
        p, x0 = self._p_x(rng)
        xt_j, t_j, kl0_j, klt_j = giflow.gi_flow_fixed_t(p, x0, 0.1, 25)
        xt_n, t_n, kl0_n, klt_n = giflow.gi_flow_fixed_t(p, x0, 0.1, 25,
                                                         host_numpy=True)
        assert t_n == t_j
        np.testing.assert_allclose(xt_n, xt_j, rtol=1e-13)
        np.testing.assert_allclose([kl0_n, klt_n], [kl0_j, klt_j], rtol=1e-10)
        a_j = giflow.gi_flow_to_threshold(p, x0, 0.1, 1e-6, 800, 5)
        a_n = giflow.gi_flow_to_threshold(p, x0, 0.1, 1e-6, 800, 5,
                                          host_numpy=True)
        assert a_n[1] == a_j[1]  # same adaptive T_n
        np.testing.assert_allclose(a_n[0], a_j[0], rtol=1e-12)


def test_gaussian_filter_bitwise_vs_scipy():
    """The mollifier must equal scipy.ndimage to the LAST BIT: the tracker's
    stage-3 oracle residual (4.7e-6) was entirely the old summation order
    differing by ~3e-15/bin (VERDICT round-1 item 8 — root cause, not a
    matcher near-tie: the tightest stage-3 top-2 gap is 2.9e-7 relative and
    a 1-ulp mean perturbation flips zero matches)."""
    from scipy.ndimage import gaussian_filter

    from cmtci.transport.histogram import gaussian_filter_nearest

    rng = np.random.default_rng(0)
    for sigma in (1.0, 3.0, 5.5):
        for shape in ((64, 64), (256, 256), (37, 91)):
            h = np.maximum(rng.poisson(0.5, shape).astype(float), 1e-12)
            np.testing.assert_array_equal(
                np.asarray(gaussian_filter_nearest(h, sigma)),
                gaussian_filter(h, sigma, mode="nearest"))


def test_matcher_f32_statistically_equivalent(rng):
    from cmtci.transport.sinkhorn import entropic_argmax_match

    x = rng.normal(size=400) + 1j * rng.normal(size=400)
    y = rng.normal(size=400) + 1j * rng.normal(size=400)
    m64, _ = entropic_argmax_match(x, y, eps=0.8, rng=np.random.RandomState(1))
    m32, _ = entropic_argmax_match(x, y, eps=0.8, rng=np.random.RandomState(1),
                                   dtype=np.float32)
    assert (m64 == m32).mean() > 0.95


def test_histogram2d_bitwise_vs_numpy_edge_collisions():
    """Bin edges must be np.linspace-exact: DE-grid nodes sit exactly ON
    histogram edges (793-grid vs 256-bin collisions) and jnp.linspace's
    1-ulp edge difference flipped their bins — the other half of the
    stage-3 oracle residual."""
    from cmtci.transport.histogram import histogram2d

    rng = np.random.default_rng(0)
    dom = (-2.2, 1.2, -1.6, 1.6)
    xs = np.linspace(dom[0], dom[1], 793)
    ys = np.linspace(dom[2], dom[3], 793)
    x = np.concatenate([rng.uniform(dom[0], dom[1], 5000), xs])
    y = np.concatenate([rng.uniform(dom[2], dom[3], 5000), ys])
    ref, _, _ = np.histogram2d(x, y, bins=256, range=[[dom[0], dom[1]], [dom[2], dom[3]]])
    np.testing.assert_array_equal(np.asarray(histogram2d(x, y, 256, dom)), ref)
