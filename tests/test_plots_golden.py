"""Visual regression: image-diff every figure writer against checked-in goldens.

The reference's de-facto test strategy is PNG eyeballing (SURVEY §4.4); here
each figure type renders deterministic synthetic inputs and is compared
pixel-wise to a golden render. Regenerate goldens after an intentional
change with:  CMTCI_REGEN_GOLDENS=1 python -m pytest tests/test_plots_golden.py
"""

import os

import numpy as np
import pytest

from cmtci.io import plots

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "data", "goldens")
REGEN = os.environ.get("CMTCI_REGEN_GOLDENS") == "1"


def _clouds():
    t = np.linspace(0, 2 * np.pi, 400, endpoint=False)
    rng = np.random.default_rng(42)
    c = np.column_stack([np.cos(t) + 0.05 * rng.standard_normal(400),
                         np.sin(t) + 0.05 * rng.standard_normal(400)])
    m = np.column_stack([(1 + 0.2 * np.cos(5 * t)) * np.cos(t),
                         (1 + 0.2 * np.cos(5 * t)) * np.sin(t)])
    return c, m


def _check(rendered_path, name):
    import matplotlib.image as mpimg

    golden_path = os.path.join(GOLDEN_DIR, name)
    if REGEN or not os.path.exists(golden_path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        import shutil

        shutil.copy(rendered_path, golden_path)
        if not REGEN:
            pytest.skip(f"golden {name} created; rerun to compare")
        return
    got = mpimg.imread(rendered_path)
    ref = mpimg.imread(golden_path)
    assert got.shape == ref.shape, (name, got.shape, ref.shape)
    diff = np.abs(got.astype(float) - ref.astype(float))
    assert diff.mean() < 0.002, (name, diff.mean())
    assert (diff > 0.1).mean() < 0.01, (name, (diff > 0.1).mean())


def test_alignment(tmp_path):
    c, m = _clouds()
    p = plots.plot_alignment(c, m, c * 0.98, str(tmp_path / "a.png"))
    _check(p, "alignment.png")


def test_matches(tmp_path):
    c, m = _clouds()
    matches = np.arange(len(c)) % len(m)
    p = plots.plot_matches(c, m, matches, str(tmp_path / "m.png"),
                           preserved_mask=(np.arange(len(c)) % 3 > 0))
    _check(p, "matches.png")


def test_kl_descent(tmp_path):
    kls = np.exp(-0.2 * np.arange(40)) * 3.0
    p = plots.plot_kl_descent(kls, str(tmp_path / "kl.png"))
    _check(p, "kl_descent.png")


def test_field(tmp_path):
    gx, gy = np.meshgrid(np.linspace(-2, 1, 64), np.linspace(-1.5, 1.5, 64))
    p = plots.plot_field(np.sin(3 * gx) * np.cos(2 * gy), (-2, 1, -1.5, 1.5),
                         str(tmp_path / "f.png"), title="field")
    _check(p, "field.png")


def test_boundary_overlay(tmp_path):
    c, m = _clouds()
    p = plots.plot_boundary_overlay(c, m, str(tmp_path / "b.png"))
    _check(p, "boundary_overlay.png")


def test_curvature(tmp_path):
    c, _ = _clouds()
    kappa = 1.0 + 0.3 * np.sin(np.linspace(0, 6 * np.pi, len(c)))
    h, o = plots.plot_curvature(c, kappa, str(tmp_path / "curv"))
    _check(h, "curvature_hist.png")
    _check(o, "curvature_overlay.png")


def test_boundary_correspondence(tmp_path):
    t = np.linspace(0, 2 * np.pi, 300, endpoint=False)
    z = (1 + 0.1 * np.cos(4 * t)) * np.exp(1j * t)
    w = np.exp(1j * (t + 0.2 * np.sin(t)))
    p = plots.plot_boundary_correspondence(z, w, str(tmp_path / "bc.png"))
    _check(p, "boundary_correspondence.png")


def test_variograms(tmp_path):
    r = np.linspace(0.05, 1.0, 20)
    p = plots.plot_variograms(r, {"C": 1 - np.exp(-r / 0.3),
                                  "M": 0.8 * (1 - np.exp(-r / 0.2))},
                              str(tmp_path / "v.png"))
    _check(p, "variograms.png")


def test_multifractal_compare(tmp_path):
    q = np.linspace(-5, 5, 20)
    res_c = {"q": q, "Dq": 1.2 - 0.02 * q, "alpha": 1.2 - 0.04 * q,
             "f_alpha": 1.2 - 0.01 * q**2}
    res_m = {"q": q, "Dq": 1.3 - 0.03 * q, "alpha": 1.3 - 0.05 * q,
             "f_alpha": 1.3 - 0.012 * q**2}
    p1, p2 = plots.plot_multifractal_compare(res_c, res_m, str(tmp_path / "mf"))
    _check(p1, "Dq_compare.png")
    _check(p2, "falpha_compare.png")


def test_fft_reconstructions(tmp_path):
    c, m = _clouds()
    p = plots.plot_fft_reconstructions(c, m, str(tmp_path / "fft.png"),
                                       modes=(5, 10, 30, 100))
    _check(p, "fft_reconstructions.png")


def test_embedding_scatter_and_spectra(tmp_path):
    c, _ = _clouds()
    vec = np.sin(np.linspace(0, 4 * np.pi, len(c)))
    p = plots.plot_embedding_scatter(c, vec, str(tmp_path / "e.png"),
                                     title="construct embedding")
    _check(p, "embedding_scatter.png")
    vals_c = np.exp(-0.3 * np.arange(8))
    vals_m = np.exp(-0.35 * np.arange(8))
    p2 = plots.plot_eigenvalue_spectra(vals_c, vals_m, str(tmp_path / "s.png"))
    _check(p2, "spectra_compare.png")


def test_k_bins(tmp_path):
    bins = [(0.0, 0.1, 1.05, 120), (0.1, 0.2, 1.03, 240), (0.2, 0.3, 1.02, 200),
            (0.3, 0.4, 1.015, 90)]
    p1, p2 = plots.plot_k_bins(bins, "L0", str(tmp_path))
    _check(p1, "K_bins.png")
    _check(p2, "bin_counts.png")


def test_local_correlation_panels(tmp_path):
    gx, gy = np.meshgrid(np.linspace(-2, 1, 48), np.linspace(-1.5, 1.5, 48))
    u_c = np.log(1 + gx**2 + gy**2)
    u_m = np.log(1.2 + gx**2 + 0.8 * gy**2)
    corr = np.tanh(gx * gy)
    p = plots.plot_local_correlation_panels(u_c, u_m, corr, (-2, 1, -1.5, 1.5),
                                            str(tmp_path / "p.png"))
    _check(p, "local_correlation_panels.png")


def test_match_distance_hist(tmp_path):
    rng = np.random.default_rng(3)
    p = plots.plot_match_distance_hist(np.abs(rng.normal(0.3, 0.1, 500)),
                                       str(tmp_path / "mh.png"))
    _check(p, "match_distance_hist.png")


def test_curvature_hotspots(tmp_path):
    c, m = _clouds()
    kc = 1 + 5 * np.abs(np.sin(np.linspace(0, 8 * np.pi, len(c))))
    km = 1 + 3 * np.abs(np.cos(np.linspace(0, 6 * np.pi, len(m))))
    p = plots.plot_curvature_hotspots(c, m, kc, km, str(tmp_path / "ch.png"))
    _check(p, "curvature_hotspots.png")


def test_g_density_compare(tmp_path):
    from cmtci.stats.laws import compare_reference_laws

    rng = np.random.default_rng(11)
    g_out = rng.exponential(0.05, size=4000)
    laws_out = compare_reference_laws(g_out)
    p_g, p_phi = plots.plot_g_density_compare(laws_out, g_out,
                                              str(tmp_path / "eq"))
    _check(p_g, "g_density_compare.png")
    _check(p_phi, "phi_density_logunif.png")


def test_family_kde_overlay(tmp_path):
    rng = np.random.default_rng(12)
    fam_g = {
        "lucas_all_ones": rng.exponential(0.05, size=3000),
        "pell_like_all_twos": rng.exponential(0.08, size=3000),
        "tiny_family_skipped": np.array([0.1] * 10),  # <=50 outside: dropped
    }
    p = plots.plot_family_kde_overlay(fam_g, str(tmp_path / "fam.png"))
    _check(p, "family_kde_overlay.png")
    # all-interior families -> no figure, no crash
    assert plots.plot_family_kde_overlay(
        {"f": np.zeros(100)}, str(tmp_path / "none.png")) is None
