"""Regression tests for code-review findings."""

import numpy as np
import pytest

from cmtci.geometry import alpha_shape
from cmtci.maps import qc
from cmtci.stats.spectral import reconstruct_low_modes
from cmtci.transport.sinkhorn import entropic_argmax_match


def test_pinch_vertex_face_walk_separates_triangles():
    # two triangles sharing exactly one vertex (bowtie): the boundary walk
    # must yield two 3-vertex loops, not one merged self-intersecting walk
    pts = np.array([
        [0.0, 0.0],      # 0: pinch vertex V
        [-2.0, 0.35],    # 1
        [-2.0, 0.05],    # 2
        [2.0, 0.105],    # 3
        [1.0, 1.8],      # 4
    ])
    for kept in (np.array([[0, 1, 2], [0, 3, 4]]),
                 np.array([[0, 2, 4], [0, 3, 1]])):
        loops = alpha_shape.directed_boundary_loops(pts, kept)
        assert len(loops) == 2, loops
        assert sorted(len(l) for l in loops) == [3, 3]
        got = {frozenset(l) for l in loops}
        want = {frozenset(t.tolist()) for t in kept}
        assert got == want


def test_matcher_handles_unequal_xy_arrays(rng):
    x = rng.normal(size=(100, 2))
    y = rng.normal(size=(50, 2))
    my, mx = entropic_argmax_match(x, y, rng=np.random.RandomState(0))
    assert my.shape == (50, 2) and mx.shape == (50, 2)
    my2, mx2 = entropic_argmax_match(y, x, rng=np.random.RandomState(0))
    assert my2.shape == (50, 2)


def test_blocked_mean_matches_full(rng):
    import jax.numpy as jnp

    from cmtci.transport.sinkhorn import _blocked_mean_dist, _pairwise_dist

    a = rng.normal(size=(300, 2))
    b = rng.normal(size=(200, 2))
    got = float(_blocked_mean_dist(jnp.asarray(a), jnp.asarray(b), chunk=64))
    ref = float(np.mean(np.asarray(_pairwise_dist(jnp.asarray(a), jnp.asarray(b)))))
    assert got == pytest.approx(ref, rel=1e-12)


def test_reconstruct_single_mode_is_dc_only(rng):
    z = rng.normal(size=32) + 1j * rng.normal(size=32)
    f = np.fft.fft(z)
    rec = reconstruct_low_modes(f, 1)
    np.testing.assert_allclose(rec, np.full(32, z.mean()), atol=1e-12)


def test_triangle_gradients_tiny_negative_det():
    pts = np.array([[0.0, 0.0], [1.0, 1e-31], [1.0, 0.0]])
    tris = np.array([[0, 1, 2]])
    g = qc.triangle_gradients(pts, tris, np.array([0.0, 1.0, 2.0]))
    assert np.all(np.isfinite(g))
