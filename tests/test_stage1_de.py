"""Stage-1 DE variant vs the reference's scalar loop semantics."""

import math

import numpy as np

from cmtci.kernels import mandelbrot as mb


def _ref_de(c, max_iter=200, bailout=1e6):
    # construct_stage1_clean.py:50-58 semantics
    z = 0 + 0j
    dz = 0 + 0j
    for _ in range(int(max_iter)):
        dz = 2.0 * z * dz + 1.0
        z = z * z + c
        if abs(z) > bailout:
            return abs(z) * math.log(abs(z)) / max(abs(dz), 1e-16)
    return 0.0


def test_stage1_de_matches_scalar_loop():
    xs = np.linspace(-2.25, 1.25, 40)
    ys = np.linspace(-1.25, 1.25, 30)
    cr, ci = np.meshgrid(xs, ys)
    esc, d = mb.de_field_stage1(cr, ci, max_iter=200, bailout=1e6)
    d = np.asarray(d)
    for iy in range(0, 30, 7):
        for ix in range(0, 40, 7):
            ref = _ref_de(complex(cr[iy, ix], ci[iy, ix]))
            assert np.isclose(d[iy, ix], ref, rtol=1e-6, atol=1e-300), (iy, ix)


def test_stage1_band_selection():
    from cmtci.pipelines.stage1 import Stage1Config, sample_boundary_band

    cfg = Stage1Config(nx=80, ny=60, boundary_samples=100)
    pts = sample_boundary_band(cfg, np.random.RandomState(0))
    assert 0 < len(pts) <= 100
    # all selected points have DE distance in the band
    esc, d = mb.de_field_stage1(pts[:, 0], pts[:, 1], max_iter=cfg.max_iter, bailout=cfg.bailout)
    d = np.asarray(d)
    assert np.all((d > cfg.threshold_low) & (d < cfg.threshold_high))
