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


def test_curve_init_few_iterations_stage4_shape():
    """VERDICT r2 item 2: the structured curve init must converge in a
    handful of iterations at the tracker's stage-4 shape (the unit-circle
    init needed 15-18; the iteration count was the eigensweep's dominant
    remaining cost against the >=50x north star)."""
    ns = list(range(20, 1221, 20))
    for fam in companion.FAMILIES:
        a, deg = companion.poly_coeff_batch(ns, fam)
        zr, zi, valid, iters, done = companion.aberth_roots(
            a, deg, family=fam, return_info=True)
        assert bool(done)
        assert int(iters) <= 6, (fam, int(iters))
        # accuracy spot check at the largest degree vs LAPACK
        got = (np.asarray(zr)[-1] + 1j * np.asarray(zi)[-1])[np.asarray(valid)[-1]]
        ref = np.linalg.eigvals(
            companion.companion_matrix(companion.family_top_row(fam, 1220)))
        assert _match_error(got, ref) < 1e-12, fam


def test_bucketed_equals_unbucketed():
    """Degree-bucketed sweep returns the same cloud up to the convergence
    tolerance (the repulsion's blocked summation order differs with the
    lane width, so last-ulp trajectory differences are expected).

    Calls eigvals_bucketed DIRECTLY: inverse_cloud's work gate routes
    small sweeps like this one to the single-batch path, which silently
    made the original inverse_cloud-based comparison vacuous."""
    ns = [5, 30, 64, 65, 130, 300]
    zr_b, zi_b, valid_b = companion.eigvals_bucketed(ns)
    assert np.asarray(valid_b).any()
    lam_b = np.asarray(zr_b) + 1j * np.asarray(zi_b)
    zr, zi, valid = companion.inverse_cloud_padded(ns, bucketed=False)
    for b in range(len(ns)):
        z_b = (1.0 / lam_b[b])[np.asarray(valid_b)[b]]
        z_u = (np.asarray(zr)[b] + 1j * np.asarray(zi)[b])[np.asarray(valid)[b]]
        assert z_b.shape == z_u.shape
        # optimal matching: a plain complex sort mispairs near-conjugate
        # roots whose real parts agree to ~1e-13
        assert _match_error(z_b, z_u) < 5e-13, ns[b]
    # the gate itself (the real predicate, not re-derived constants):
    # sweeps spanning the curve-init threshold bucket (iteration-count
    # decoupling: circle-init rows force ~10 iterations on a single
    # batch), stage-4-scale sweeps bucket on padded work, and uniform
    # small curve-init sweeps stay single-batch
    assert companion._bucketing_pays(ns)  # 5 < _CURVE_INIT_MIN_DEG < 300
    assert companion._bucketing_pays(list(range(20, 1221, 20)))
    assert not companion._bucketing_pays([30, 64, 130, 300])
    assert not companion._bucketing_pays([300, 300])
