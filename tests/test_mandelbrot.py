"""Mandelbrot field kernels vs faithful numpy oracles (float64, CPU)."""

import numpy as np
import pytest

import oracles
from cmtci.kernels import mandelbrot as mb

DOMAIN = (-2.25, 1.25, -1.75, 1.75)


def _grid(n):
    cr, ci = mb.complex_grid(DOMAIN, n, n)
    return np.asarray(cr), np.asarray(ci)


def test_dwell_exact():
    cr, ci = _grid(120)
    got = np.asarray(mb.dwell_grid(cr, ci, max_iter=300))
    ref = oracles.dwell_grid_np(cr, ci, 300)
    assert np.array_equal(got, ref)


def test_de_tci_exact_selection():
    cr, ci = _grid(150)
    c = cr + 1j * ci
    esc_ref, d_ref = oracles.de_tci_np(c, max_iter=250, escape_r=250.0)
    esc, d, _, _ = mb.de_field_tci(cr, ci, max_iter=250, escape_r=250.0)
    esc, d = np.asarray(esc), np.asarray(d)
    assert np.array_equal(esc, esc_ref)
    # the d==0 overflow classification must match exactly (drives the sampler)
    assert np.array_equal(d == 0.0, d_ref == 0.0)
    nz = d_ref != 0.0
    np.testing.assert_allclose(d[nz], d_ref[nz], rtol=1e-12)
    # quantile-selection set (the actual boundary sample) must match
    q_ref = np.quantile(d_ref[esc_ref], 0.25)
    q = np.quantile(d[esc], 0.25)
    assert np.array_equal((esc & (d <= q)), (esc_ref & (d_ref <= q_ref)))


def test_de_std_matches():
    cr, ci = _grid(120)
    c = cr + 1j * ci
    esc_ref, d_ref = oracles.de_std_np(c, max_iter=300)
    esc, d, _, _ = mb.de_field_std(cr, ci, max_iter=300)
    assert np.array_equal(np.asarray(esc), esc_ref)
    # chaotic-orbit FMA sensitivity: late escapers match to ~1e-7, not bitwise
    np.testing.assert_allclose(np.asarray(d), d_ref, rtol=1e-6, atol=0)


def test_green_potential_matches():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-2, 2, size=(400,)) + 1j * rng.uniform(-2, 2, size=(400,))
    g_ref, k_ref, phi_ref = oracles.green_np(pts, max_iter=2000)
    g, k, pr, pi = mb.green_potential(pts.real, pts.imag, max_iter=2000)
    np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-6, atol=1e-15)
    assert np.array_equal(np.asarray(k), k_ref)
    m = np.isfinite(phi_ref)
    np.testing.assert_allclose(np.asarray(pr)[m], phi_ref[m].real, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pi)[m], phi_ref[m].imag, rtol=1e-6, atol=1e-12)


@pytest.mark.parametrize(
    "norm,oracle,kw",
    [
        ("two_pow_n", oracles.escape_potential_2pn_np, dict(max_iter=300, escape_r=4.0)),
        ("two_pow_k_break", oracles.escape_potential_kbreak_np, dict(max_iter=150, escape_r=10.0)),
        ("k_plus_1", oracles.escape_potential_kp1_np, dict(max_iter=150, escape_r=2.0)),
    ],
)
def test_escape_potentials(norm, oracle, kw):
    cr, ci = _grid(60)
    c = cr + 1j * ci
    ref = oracle(c, **kw)
    got = np.asarray(
        mb.escape_potential_grid(cr, ci, max_iter=kw["max_iter"], escape_r=kw["escape_r"], normalization=norm)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-15)


def test_smooth5():
    rng = np.random.default_rng(0)
    g = rng.normal(size=(20, 20))
    got = np.asarray(mb.smooth5(g))
    ref = g.copy()
    ref[1:-1, 1:-1] = (g[1:-1, 1:-1] + g[:-2, 1:-1] + g[2:, 1:-1] + g[1:-1, :-2] + g[1:-1, 2:]) / 5.0
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


def test_boundary_sampler_selects_exterior():
    pts = mb.sample_boundary_quantile(DOMAIN, 150, 2000, rng=np.random.RandomState(7))
    assert pts.size == 2000
    # every sampled point must be outside the Mandelbrot set (it escaped)
    g, k, _, _ = mb.green_potential(pts.real, pts.imag, max_iter=600)
    assert (np.asarray(k) < 600).mean() > 0.99
