"""IO writers/loaders, plots, artifact cache, stage timer."""

import os

import numpy as np

from cmtci.io import loaders, plots, writers
from cmtci.utils.artifacts import StageTimer, cached, config_key


def test_xy_roundtrip(tmp_path, rng):
    xy = rng.normal(size=(50, 2))
    p = writers.write_xy_csv(str(tmp_path / "b.csv"), xy)
    back = loaders.load_points(p)
    np.testing.assert_allclose(back, xy, rtol=1e-12)


def test_headerless_roundtrip(tmp_path, rng):
    xy = rng.normal(size=(30, 2))
    p = writers.write_points_csv(str(tmp_path / "p.csv"), xy)
    np.testing.assert_allclose(loaders.load_points(p), xy, rtol=1e-12)


def test_matches_loader_layouts(tmp_path):
    m = np.array([3, 1, 4, 1, 5])
    p1 = writers.write_matches_csv(str(tmp_path / "m1.csv"), m)
    np.testing.assert_array_equal(loaders.load_matches(p1), m)
    # 2-column (i, j) layout
    p2 = str(tmp_path / "m2.csv")
    np.savetxt(p2, np.c_[np.arange(5), m], delimiter=",", fmt="%d")
    np.testing.assert_array_equal(loaders.load_matches(p2), m)


def test_json_sanitizer(tmp_path):
    obj = {"a": np.float64(1.5), "b": np.arange(3), "c": 1 + 2j, "d": float("nan")}
    p = writers.write_json(str(tmp_path / "x.json"), obj)
    import json

    back = json.load(open(p))
    assert back["a"] == 1.5 and back["b"] == [0, 1, 2]
    assert back["c"] == {"re": 1.0, "im": 2.0}


def test_plots_write_files(tmp_path, rng):
    c = rng.normal(size=(40, 2))
    m = rng.normal(size=(30, 2))
    matches = rng.integers(0, 30, 40)
    assert os.path.exists(plots.plot_alignment(c, m, c, str(tmp_path / "a.png")))
    assert os.path.exists(plots.plot_matches(c, m, matches, str(tmp_path / "m.png")))
    assert os.path.exists(plots.plot_kl_descent([1.0, 0.5, 0.2], str(tmp_path / "k.png")))
    assert os.path.exists(plots.plot_field(rng.normal(size=(16, 16)), (-1, 1, -1, 1), str(tmp_path / "f.png")))
    assert os.path.exists(plots.plot_curvature(c, rng.uniform(size=40), str(tmp_path / "c"))[0])
    z = np.exp(2j * np.pi * np.linspace(0, 1, 50, endpoint=False))
    assert os.path.exists(plots.plot_boundary_correspondence(z, z, str(tmp_path / "bc.png")))
    assert os.path.exists(plots.plot_variograms(np.arange(5), {"a": np.arange(5.0)}, str(tmp_path / "v.png")))


def test_artifact_cache(tmp_path):
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        return {"x": np.arange(4.0)}

    cfg = {"res": 10, "alpha": 0.5}
    out1 = cached("stage", cfg, fn, cache_dir=str(tmp_path))
    out2 = cached("stage", cfg, fn, cache_dir=str(tmp_path))
    assert calls["n"] == 1  # second call resumed from the artifact
    np.testing.assert_array_equal(out1["x"], out2["x"])
    # different config -> recompute
    cached("stage", {"res": 11, "alpha": 0.5}, fn, cache_dir=str(tmp_path))
    assert calls["n"] == 2
    assert config_key(cfg) != config_key({"res": 11, "alpha": 0.5})


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        sum(range(1000))
    assert t.times["a"] >= 0
