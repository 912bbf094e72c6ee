"""Pallas escape kernel semantics vs the f64 XLA kernels (interpret on CPU)."""

import numpy as np
import pytest

from cmtci.kernels import mandelbrot as mb
from cmtci.kernels.mandelbrot_pallas import mandelbrot_field_pallas

DOM = (-2.1, 0.9, -1.5, 1.5)


def test_dwell_matches_f64():
    d32 = np.asarray(mandelbrot_field_pallas(DOM, 256, 64, max_iter=100, kind="dwell", tile=(32, 256)))
    cr, ci = mb.complex_grid(DOM, 256, 64)
    ref = np.asarray(mb.dwell_grid(np.asarray(cr), np.asarray(ci), max_iter=100))
    # f32 orbits diverge from f64 near the boundary; >=99% of pixels exact
    assert (d32 == ref).mean() > 0.99
    assert d32.dtype == np.float32


def test_green_matches_f64():
    g32 = np.asarray(mandelbrot_field_pallas(DOM, 256, 64, max_iter=60, kind="green", escape_r=4.0, tile=(32, 256)))
    cr, ci = mb.complex_grid(DOM, 256, 64)
    ref = np.asarray(mb.escape_potential_grid(np.asarray(cr), np.asarray(ci), max_iter=60, escape_r=4.0, normalization="two_pow_n"))
    close = np.isclose(g32, ref, rtol=1e-4, atol=1e-7)
    assert close.mean() > 0.99


def test_de_matches_f64():
    d32 = np.asarray(mandelbrot_field_pallas(DOM, 256, 64, max_iter=80, kind="de", escape_r=4.0, tile=(32, 256)))
    cr, ci = mb.complex_grid(DOM, 256, 64)
    esc, ref, _, _ = mb.de_field_std(np.asarray(cr), np.asarray(ci), max_iter=80, escape_r=4.0)
    ref = np.asarray(ref)
    close = np.isclose(d32, ref, rtol=1e-3, atol=1e-9)
    assert close.mean() > 0.98


def test_tile_mismatch_raises():
    with pytest.raises(ValueError):
        mandelbrot_field_pallas(DOM, 100, 100, kind="dwell")
