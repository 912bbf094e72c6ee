"""Checkpoint/resume wiring (SURVEY §5.4, VERDICT round-1 item 4).

The reference resumes at file-bus granularity (skip-if-exists for
lucas_points.npy, lucas_to_cardioid_v18...py:1070-1077; reusable map-state
NPZ, v40:655-668). cmtci caches stage artifacts keyed by config hash; a
second run with identical parameters must touch NO kernel and reproduce the
rows exactly (including the shared RNG stream across tracker stages).
"""

import numpy as np
import pytest

from cmtci.pipelines.tracker import TrackerConfig, run_tracker

CFG = dict(bins_start=16, bins_max=32, construct_max_start=60,
           mandelbrot_grid_start=100, mandelbrot_samples_start=300,
           max_iter=60, sigma_bins=2.0, t_fixed=5,
           construct_max_growth=1.3, mandelbrot_grid_growth=1.1,
           mandelbrot_samples_growth=1.2)


def _rows_tuple(rows):
    import dataclasses

    return [tuple(v for k, v in dataclasses.asdict(r).items() if k != "runtime_sec")
            for r in rows]


def test_tracker_resume_touches_no_kernel(tmp_path, monkeypatch):
    cfg = TrackerConfig(**CFG)
    cache = str(tmp_path / "cache")
    rows_ref, _ = run_tracker(cfg)  # uncached baseline
    rows1, _ = run_tracker(cfg, cache_dir=cache)
    # caching must not perturb the result (incl. cross-stage RNG stream)
    assert _rows_tuple(rows1) == _rows_tuple(rows_ref)

    # second run: kernels must never be called
    import cmtci.pipelines.tracker as trk

    def _boom(*a, **k):
        raise AssertionError("kernel called on resume")

    monkeypatch.setattr(trk.companion, "inverse_cloud", _boom)
    monkeypatch.setattr(trk.mandelbrot, "sample_boundary_quantile", _boom)
    monkeypatch.setattr(trk, "entropic_argmax_match", _boom)
    rows2, meta2 = run_tracker(cfg, cache_dir=cache)
    assert _rows_tuple(rows2) == _rows_tuple(rows1)

    # parameter change invalidates (kernel called again -> our boom fires)
    cfg2 = TrackerConfig(**{**CFG, "sigma_bins": 3.0})
    with pytest.raises(AssertionError, match="kernel called"):
        run_tracker(cfg2, cache_dir=cache)


def test_tracker_stage_times_recorded():
    from cmtci.utils.artifacts import StageTimer

    cfg = TrackerConfig(**{**CFG, "bins_max": 16})
    timer = StageTimer()
    _, meta = run_tracker(cfg, timer=timer)
    for phase in ("cloud", "sample", "match", "hist", "giflow"):
        assert f"bins16_{phase}" in meta["stage_times"]
        assert meta["stage_times"][f"bins16_{phase}"] >= 0.0


def test_lucas_boundary_skip_and_cache(tmp_path, monkeypatch):
    from cmtci.pipelines.lucas_boundary import LucasBoundaryConfig, export_lucas_boundary

    cfg = LucasBoundaryConfig(n_max=30, n_boundary=200)
    out = str(tmp_path / "lucas_points.npy")
    cache = str(tmp_path / "cache")
    xy = export_lucas_boundary(cfg, out, cache_dir=cache)

    import cmtci.pipelines.lucas_boundary as lb

    monkeypatch.setattr(lb, "_compute_lucas_boundary",
                        lambda *a: (_ for _ in ()).throw(AssertionError("recomputed")))
    # cache hit path
    xy2 = export_lucas_boundary(cfg, str(tmp_path / "other.npy"), cache_dir=cache)
    np.testing.assert_array_equal(xy2, xy)
    # reference-style skip-if-exists path
    xy3 = export_lucas_boundary(cfg, out, skip_if_exists=True)
    np.testing.assert_array_equal(xy3, xy)


def test_equipotential_cache(tmp_path, monkeypatch):
    from cmtci.pipelines.equipotential import EquipotentialConfig, run_equipotential

    cfg = EquipotentialConfig(n_max=20, max_iter=400, run_family_comparison=False)
    cache = str(tmp_path / "cache")
    out1 = run_equipotential(cfg, with_per_n=False, cache_dir=cache)

    import cmtci.pipelines.equipotential as eq

    monkeypatch.setattr(eq.mb, "green_potential_compacted",
                        lambda *a, **k: (_ for _ in ()).throw(AssertionError("recomputed")))
    out2 = run_equipotential(cfg, with_per_n=False, cache_dir=cache)
    assert out2["summary"] == out1["summary"]


def test_green_uniformization_fit_cache(tmp_path, monkeypatch):
    from cmtci.pipelines.lucas_boundary import LucasBoundaryConfig, export_lucas_boundary
    from cmtci.pipelines.uniformize_green import (
        GreenUniformizeConfig, run_green_uniformization,
    )

    pts = export_lucas_boundary(LucasBoundaryConfig(n_max=30, n_boundary=200))
    cfg = GreenUniformizeConfig(n_bdy=100, interior_n=200, polygon_source="ordered",
                                do_inverse_check=False)
    cache = str(tmp_path / "cache")
    out1 = run_green_uniformization(pts, cfg, cache_dir=cache)

    import cmtci.pipelines.uniformize_green as ug

    monkeypatch.setattr(ug.riemann, "fit_riemann_map",
                        lambda *a, **k: (_ for _ in ()).throw(AssertionError("refit")))
    out2 = run_green_uniformization(pts, cfg, cache_dir=cache)
    assert out2["diagnostics"]["g_shift"] == out1["diagnostics"]["g_shift"]
    assert out2["diagnostics"]["bdy_mod_median"] == out1["diagnostics"]["bdy_mod_median"]
    assert "fit+interior_sample" in out2["stage_times"]


def test_uniform_meta_dumps(tmp_path):
    """Every pipeline emits a _meta.txt parameter dump next to its artifacts
    (mandelbrot_boundary_sample.py:84-86 convention, VERDICT item 10)."""
    import os

    from cmtci.pipelines.tracker import write_outputs

    rows, meta = run_tracker(TrackerConfig(**{**CFG, "bins_max": 16}))
    write_outputs(rows, meta, str(tmp_path / "trk"))
    assert os.path.exists(tmp_path / "trk_meta.txt")
    txt = open(tmp_path / "trk_meta.txt").read()
    assert "sigma_bins=2.0" in txt and "rows=" not in txt

    from cmtci.pipelines.analysis import run_report

    rng = np.random.default_rng(0)
    c = rng.normal(size=(50, 2))
    m = rng.normal(size=(50, 2))
    run_report(c, m, c, np.arange(50), out_prefix=str(tmp_path / "rep"))
    assert os.path.exists(tmp_path / "rep_meta.txt")
