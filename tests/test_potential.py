"""Cloud log-potential vs reference conventions."""

import numpy as np

from cmtci.kernels import mandelbrot as mb
from cmtci.kernels.potential import cloud_log_potential


def _ref_log_potential(points, grid_x, grid_y, eps):
    # Potentials.py:19-27 semantics
    u = np.zeros((len(grid_y), len(grid_x)))
    for p in points:
        dx = grid_x[None, :] - p[0]
        dy = grid_y[:, None] - p[1]
        u += np.log(np.sqrt(dx**2 + dy**2) + eps)
    return u / len(points)


def test_matches_potentials_py(rng):
    pts = rng.normal(size=(137, 2))
    gx1 = np.linspace(-2, 2, 40)
    gy1 = np.linspace(-2, 2, 30)
    ref = _ref_log_potential(pts, gx1, gy1, 1e-12)
    gxx, gyy = np.meshgrid(gx1, gy1)
    got = np.asarray(cloud_log_potential(gxx, gyy, pts, eps=1e-12, sign=1, chunk=32))
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)


def test_neg_sign_and_complex_input(rng):
    pts_c = rng.normal(size=64) + 1j * rng.normal(size=64)
    cr, ci = mb.complex_grid((-2, 2, -2, 2), 25, 25)
    up = np.asarray(cloud_log_potential(cr, ci, pts_c, eps=1e-6, sign=1))
    un = np.asarray(cloud_log_potential(cr, ci, pts_c, eps=1e-6, sign=-1))
    np.testing.assert_allclose(up, -un, rtol=1e-10, atol=1e-12)
