"""Aberth eigensolver vs LAPACK companion eigenvalues (parity oracle)."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from cmtci.kernels import companion


def _match_error(a, b):
    """Max |a_i - b_perm(i)| under optimal multiset matching."""
    cost = np.abs(a[:, None] - b[None, :])
    r, c = linear_sum_assignment(cost)
    return cost[r, c].max()


@pytest.mark.parametrize("family", companion.FAMILIES)
@pytest.mark.parametrize("n", [2, 3, 5, 17, 50, 101])
def test_aberth_matches_lapack(family, n):
    top = companion.family_top_row(family, n)
    ref = np.linalg.eigvals(companion.companion_matrix(top))
    zr, zi, valid = companion.eigvals_batched([n], family)
    got = (np.asarray(zr) + 1j * np.asarray(zi))[0][np.asarray(valid)[0]]
    assert got.shape == ref.shape
    assert _match_error(got, ref) < 1e-8


def test_batched_mixed_degrees():
    ns = [2, 7, 20, 33]
    zr, zi, valid = companion.eigvals_batched(ns)
    z = np.asarray(zr) + 1j * np.asarray(zi)
    for b, n in enumerate(ns):
        ref = np.linalg.eigvals(companion.companion_matrix(companion.family_top_row("lucas_all_ones", n)))
        got = z[b][np.asarray(valid)[b]]
        assert got.shape == ref.shape
        assert _match_error(got, ref) < 1e-8


def test_inverse_cloud_matches_reference_semantics():
    ns = [20, 40, 60]
    ref = companion.inverse_cloud(ns, backend="lapack")
    got = companion.inverse_cloud(ns, backend="aberth")
    assert got.shape == ref.shape
    assert _match_error(got, ref) < 1e-8


def test_pell_family_large_degree():
    # dominant root near 3 (far from the unit-circle init): convergence must
    # still reach LAPACK agreement at high degree
    n = 500
    zr, zi, valid = companion.eigvals_batched([n], "pell_like_all_twos")
    got = (np.asarray(zr) + 1j * np.asarray(zi))[0][np.asarray(valid)[0]]
    ref = np.linalg.eigvals(companion.companion_matrix(companion.family_top_row("pell_like_all_twos", n)))
    assert _match_error(got, ref) < 1e-8


def test_large_degree_converges():
    # Degrees at the tracker's top end (v3_T25_sigma3_dense row 4: n<=1220).
    ns = [300]
    ref = np.linalg.eigvals(companion.companion_matrix(companion.family_top_row("lucas_all_ones", 300)))
    got = companion.inverse_cloud(ns, backend="aberth")
    assert _match_error(got, 1.0 / ref) < 1e-7


def test_aberth_convergence_telemetry():
    a, deg = companion.poly_coeff_batch([50, 120], "lucas_all_ones")
    zr, zi, valid, iters, done = companion.aberth_roots(a, deg, return_info=True)
    assert bool(done)
    assert 0 < int(iters) < 200
    # starved iteration budget reports non-convergence instead of lying
    _, _, _, it2, done2 = companion.aberth_roots(a, deg, max_iters=2, return_info=True)
    assert not bool(done2) and int(it2) == 2
