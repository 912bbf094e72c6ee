"""Geometry layer tests: polygon ops, alpha shape, contour, resampling."""

import numpy as np
import pytest

from cmtci.geometry import alpha_shape, cardioid, contour, interp, mesh, resample
from cmtci.geometry.polygon import Polygon, sample_interior_points, slightly_inside


def _circle_poly(n=200, r=1.0):
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return Polygon(np.column_stack([r * np.cos(t), r * np.sin(t)]))


class TestPolygon:
    def test_area_centroid_length(self):
        sq = Polygon([[0, 0], [2, 0], [2, 2], [0, 2]])
        assert sq.area == pytest.approx(4.0)
        assert sq.length == pytest.approx(8.0)
        assert sq.centroid == pytest.approx(1 + 1j)
        assert sq.is_ccw

    def test_contains_vs_matplotlib(self, rng):
        from matplotlib.path import Path

        t = np.sort(rng.uniform(0, 2 * np.pi, 50))
        rr = 1.0 + 0.3 * np.sin(5 * t)
        ring = np.column_stack([rr * np.cos(t), rr * np.sin(t)])
        poly = Polygon(ring)
        pts = rng.uniform(-1.5, 1.5, size=(500, 2))
        ref = Path(ring).contains_points(pts)
        got = poly.contains(pts)
        assert (got == ref).mean() > 0.995  # boundary-adjacent ties may differ

    def test_contains_ybucket_accel_bitwise(self, rng):
        """The y-bucket pruned crossing test (polygons >=256 edges) must be
        bitwise identical to the full all-edges test."""
        t = np.linspace(0, 2 * np.pi, 1024, endpoint=False)
        rr = 1.0 + 0.3 * np.cos(7 * t)
        poly = Polygon(np.column_stack([rr * np.cos(t), rr * np.sin(t)]))
        pts = rng.uniform(-1.5, 1.5, size=(5000, 2))
        fast = poly.contains(pts)
        # full test computed inline (the un-pruned reference predicate)
        p0, p1 = poly._segs
        x, y = pts[:, 0][:, None], pts[:, 1][:, None]
        x0, y0 = p0[:, 0][None, :], p0[:, 1][None, :]
        x1, y1 = p1[:, 0][None, :], p1[:, 1][None, :]
        cond = (y0 <= y) != (y1 <= y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
        full = (np.sum(cond & (x < xint), axis=1) % 2) == 1
        assert np.array_equal(fast, full)

    def test_nearest_segment_pruned_bitwise(self, rng):
        """The KDTree-pruned nearest-segment query (polygons >=64 edges)
        must equal the full scan bitwise, including the argmin tie rule."""
        from cmtci.geometry.polygon import _nearest_on_segments

        t = np.linspace(0, 2 * np.pi, 800, endpoint=False)
        rr = 1.0 + 0.25 * np.cos(9 * t)
        poly = Polygon(np.column_stack([rr * np.cos(t), rr * np.sin(t)]))
        pts = rng.uniform(-1.5, 1.5, size=(3000, 2))
        d1, s1, t1 = poly._nearest(pts)
        d2, s2, t2 = _nearest_on_segments(pts, *poly._segs)
        assert np.array_equal(d1, d2)
        assert np.array_equal(s1, s2)
        assert np.array_equal(t1, t2)
        # boundary vertices themselves (exact ties between adjacent segs)
        dv, sv, tv = poly._nearest(poly.xy[::7])
        dv2, sv2, tv2 = _nearest_on_segments(poly.xy[::7], *poly._segs)
        assert np.array_equal(sv, sv2) and np.array_equal(tv, tv2)

    def test_nearest_pruned_long_segment_and_escalation(self, rng):
        """Exactness through the k-escalation rounds: a polygon with one
        very long edge (the alpha-shape case that defeated the old global
        midpoint bound) and query points far outside / deep inside, where
        the first k=16 sample round cannot satisfy the prune bound."""
        from cmtci.geometry.polygon import _nearest_on_segments

        t = np.linspace(0, np.pi, 200)  # half-circle arc...
        arc = np.column_stack([np.cos(t), np.sin(t)])
        poly = Polygon(arc)  # ...closed by ONE chord of length 2
        far = rng.uniform(-6, 6, size=(800, 2))
        near = poly.interpolate(rng.uniform(0, poly.length, 200))
        deep = np.column_stack([rng.uniform(-0.3, 0.3, 200),
                                rng.uniform(0.2, 0.6, 200)])
        pts = np.vstack([far, near, deep])
        d1, s1, t1 = poly._nearest(pts)
        d2, s2, t2 = _nearest_on_segments(pts, *poly._segs)
        assert np.array_equal(d1, d2)
        assert np.array_equal(s1, s2)
        assert np.array_equal(t1, t2)

    def test_boundary_within_matches_distance_threshold(self, rng):
        """boundary_within(tol) must equal exterior_distance <= tol exactly,
        across tols that exercise the k=1 reject path (tiny tol), the
        exact-survivor path (moderate tol), and a tol accepting most points."""
        from cmtci.geometry.polygon import _nearest_on_segments

        t = np.linspace(0, 2 * np.pi, 700, endpoint=False)
        rr = 1.0 + 0.2 * np.sin(7 * t)
        poly = Polygon(np.column_stack([rr * np.cos(t), rr * np.sin(t)]))
        pts = np.vstack([rng.uniform(-1.5, 1.5, size=(2000, 2)),
                         poly.interpolate(rng.uniform(0, poly.length, 100)),
                         poly.xy[::11]])
        d, _, _ = _nearest_on_segments(pts, *poly._segs)
        for tol in (1e-12, 1e-3, 0.05, 1.0):
            got = poly.boundary_within(pts, tol)
            assert np.array_equal(got, d <= tol), tol
        # small-polygon (full-scan) path
        small = Polygon(poly.xy[::24])
        ds, _, _ = _nearest_on_segments(pts, *small._segs)
        assert np.array_equal(small.boundary_within(pts, 0.02), ds <= 0.02)

    def test_project_interpolate_roundtrip(self):
        poly = _circle_poly(400)
        s = np.array([0.1, 1.0, 3.0, 5.5])
        pts = poly.interpolate(s)
        s_back = poly.project(pts)
        np.testing.assert_allclose(s_back, s, atol=1e-8)

    def test_exterior_distance(self):
        poly = _circle_poly(2000)
        d = poly.exterior_distance(np.array([[0.0, 0.0], [0.5, 0.0], [2.0, 0.0]]))
        np.testing.assert_allclose(d, [1.0, 0.5, 1.0], atol=1e-4)

    def test_exterior_distance_jit_path_matches_exact(self, rng):
        """The large-batch distance-only jit path (>=1024 points) must match
        the exact full scan to 1 ulp, across block-remainder sizes (padding
        repeats row 0 — pad rows must be sliced off, not min-merged)."""
        from cmtci.geometry.polygon import _DIST_BLOCK, _nearest_on_segments

        t = np.linspace(0, 2 * np.pi, 300, endpoint=False)
        rr = 1.0 + 0.25 * np.cos(9 * t)
        poly = Polygon(np.column_stack([rr * np.cos(t), rr * np.sin(t)]))
        for n in (1024, _DIST_BLOCK - 1, _DIST_BLOCK, _DIST_BLOCK + 7):
            pts = rng.uniform(-2.0, 2.0, size=(n, 2))
            d_jit = poly.exterior_distance(pts)
            d_ref, _, _ = _nearest_on_segments(pts, *poly._segs)
            assert np.max(np.abs(d_jit - d_ref)) <= 4 * np.finfo(float).eps, n

    def test_interior_sampling(self):
        poly = _circle_poly(100)
        pts, tries = sample_interior_points(poly, 500, seed=0)
        assert len(pts) == 500
        assert np.all(np.abs(pts) <= 1.0)
        z = slightly_inside(pts[:5], 0j, 0.1)
        assert np.all(np.abs(z) < np.abs(pts[:5]) + 1e-12)


class TestAlphaShape:
    def test_disk_cloud_boundary(self, rng):
        # dense uniform disk: alpha-shape loop should be near the unit circle
        pts = rng.normal(size=(4000, 2))
        pts = pts / np.linalg.norm(pts, axis=1, keepdims=True) * np.sqrt(rng.uniform(0, 1, (4000, 1)))
        poly = alpha_shape.alpha_shape_polygon(pts, alpha=4.0)
        r = np.abs(poly.xy[:, 0] + 1j * poly.xy[:, 1])
        assert poly.area == pytest.approx(np.pi, rel=0.1)
        assert r.min() > 0.7

    def test_boundary_edges_each_once(self, rng):
        pts = rng.uniform(size=(500, 2))
        edges = alpha_shape.alpha_shape_edges(pts, alpha=8.0)
        assert len(edges) > 0
        # property: each boundary edge appears exactly once (construction invariant)
        assert len(np.unique(edges, axis=0)) == len(edges)

    def test_boundary_edges_scalar_key_matches_row_unique(self, rng):
        # the lo*n+hi scalar-key unique must reproduce np.unique(axis=0)
        # (rows AND order) on once-used edges, incl. duplicated triangles
        from scipy.spatial import Delaunay

        pts = rng.uniform(size=(400, 2))
        simp = Delaunay(pts).simplices
        simp = np.vstack([simp, simp[:7]])  # duplicated tris drop their edges
        e = np.sort(np.concatenate(
            [simp[:, [0, 1]], simp[:, [1, 2]], simp[:, [2, 0]]], axis=0), axis=1)
        uniq, counts = np.unique(e, axis=0, return_counts=True)
        naive = uniq[counts == 1]
        fast = alpha_shape.boundary_edges_of(simp)
        assert np.array_equal(fast, naive)

    def test_boundary_edges_scalar_key_beyond_int32_sqrt(self, rng):
        # n_vertices > 46341 makes lo*n+hi exceed int32: the key math must
        # promote to int64 BEFORE the multiply (numpy<2 value-based
        # promotion keeps `int32_array * np.int64(small)` int32)
        from scipy.spatial import Delaunay

        pts = rng.uniform(size=(50_000, 2))
        simp = Delaunay(pts).simplices
        assert simp.max() > 46_341
        e = np.sort(np.concatenate(
            [simp[:, [0, 1]], simp[:, [1, 2]], simp[:, [2, 0]]], axis=0), axis=1)
        uniq, counts = np.unique(e, axis=0, return_counts=True)
        naive = uniq[counts == 1]
        fast = alpha_shape.boundary_edges_of(simp)
        assert np.array_equal(fast, naive)
        assert (fast >= 0).all()  # wrapped keys yield negative indices

    def test_mesh_dedupe_complex_key_matches_row_unique(self, rng):
        # complex-key unique == np.unique(axis=0) on rounded rows (after
        # folding -0.0, which the byte-wise row unique would keep distinct)
        pts = np.round(rng.normal(size=(500, 2)), 2)
        pts = np.vstack([pts, pts[:100], [[0.0, 1.0], [-0.0, 1.0]]])
        folded = np.round(pts, 12) + 0.0
        naive = np.unique(folded, axis=0)
        z = np.unique(folded[:, 0] + 1j * folded[:, 1])
        fast = np.column_stack([z.real, z.imag])
        assert np.array_equal(fast, naive)

    def test_directed_loops_boundary_set_matches_tuple_form(self, rng):
        # the searchsorted reverse-edge test must select exactly the
        # directed edges whose reverse is absent (old tuple-set form)
        pts = rng.normal(size=(800, 2))
        _, kept = alpha_shape.alpha_complex(pts, alpha=3.0)
        p0, p1, p2 = pts[kept[:, 0]], pts[kept[:, 1]], pts[kept[:, 2]]
        signed = ((p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1])
                  - (p1[:, 1] - p0[:, 1]) * (p2[:, 0] - p0[:, 0]))
        tris = kept.copy()
        tris[signed < 0] = tris[signed < 0][:, [0, 2, 1]]
        d_edges = np.concatenate(
            [tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]], axis=0)
        edge_set = {(int(a), int(b)) for a, b in d_edges}
        naive = {(a, b) for (a, b) in edge_set if (b, a) not in edge_set}
        loops = alpha_shape.directed_boundary_loops(pts, kept)
        walked = set()
        for loop in loops:
            for a, b in zip(loop, loop[1:] + loop[:1]):
                walked.add((a, b))
        assert walked <= naive
        # every boundary edge is walked exactly once across all loops
        assert sum(len(lp) for lp in loops) == len(walked)
        assert walked == naive

    def test_trace_closed_loop(self, rng):
        pts = rng.normal(size=(3000, 2))
        pts /= np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-9)
        pts *= np.sqrt(rng.uniform(0.0, 1.0, (3000, 1)))
        edges = alpha_shape.alpha_shape_edges(pts, alpha=3.0)
        ordered, closed = alpha_shape.trace_boundary(pts, edges)
        assert closed
        assert len(ordered) > 50


class TestContour:
    def test_circle_level_set(self):
        xs = np.linspace(-2, 2, 201)
        ys = np.linspace(-2, 2, 201)
        gx, gy = np.meshgrid(xs, ys)
        z = gx**2 + gy**2
        path = contour.extract_contour(xs, ys, z, level=1.0)
        assert path is not None
        r = np.hypot(path[:, 0], path[:, 1])
        np.testing.assert_allclose(r, 1.0, atol=0.01)
        # closed-ish: endpoints coincide
        assert np.linalg.norm(path[0] - path[-1]) < 0.05

    def test_matches_matplotlib_vertices(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        rng = np.random.default_rng(1)
        xs = np.linspace(0, 1, 40)
        ys = np.linspace(0, 1, 30)
        z = np.sin(6 * xs)[None, :] + np.cos(5 * ys)[:, None] + 0.1 * rng.normal(size=(30, 40))
        cs = plt.contour(xs, ys, z, levels=[0.4])
        # modern mpl returns ONE Path per level with MOVETO-joined sub-paths;
        # compare the union of vertices (the reference's old API returned
        # per-polyline paths, which is what extract_contour emits).
        ref = np.vstack([p.vertices for p in cs.get_paths()])
        plt.close("all")
        segs = contour.contour_segments(xs, ys, z, 0.4)
        got = np.vstack(contour.chain_segments(segs))
        ref_set = {(round(a, 8), round(b, 8)) for a, b in ref}
        got_set = {(round(a, 8), round(b, 8)) for a, b in got}
        assert ref_set == got_set
        # longest polyline is connected with consistent step size
        path = contour.extract_contour(xs, ys, z, 0.4)
        steps = np.linalg.norm(np.diff(path, axis=0), axis=1)
        assert steps.max() < 0.06  # bounded by cell diagonal


class TestResample:
    def test_densify_uniform_spacing(self):
        t = np.linspace(0, 2 * np.pi, 77, endpoint=False)
        b = np.column_stack([np.cos(t), np.sin(t)])
        out = resample.densify_boundary(b, target_n=500)
        assert out.shape == (500, 2)
        seg = np.linalg.norm(np.diff(out, axis=0), axis=1)
        assert seg.std() / seg.mean() < 0.05

    def test_resample_closed_matches_reference_walk(self):
        rng = np.random.default_rng(2)
        t = np.sort(rng.uniform(0, 2 * np.pi, 60))
        xy = np.column_stack([np.cos(t), np.sin(t)])
        got = resample.resample_closed_polyline(xy, 200)

        # reference sequential walk (lucas_to_cardioid_v18...py:110-138)
        pts = np.vstack([xy, xy[0]])
        seg = pts[1:] - pts[:-1]
        d = np.sqrt((seg**2).sum(axis=1))
        s = np.concatenate([[0.0], np.cumsum(d)])
        tt = np.linspace(0.0, s[-1], 201)[:-1]
        ref = np.zeros((200, 2))
        j = 0
        for i, ti in enumerate(tt):
            while j < len(d) - 1 and s[j + 1] < ti:
                j += 1
            u = 0.0 if d[j] == 0 else (ti - s[j]) / d[j]
            ref[i] = pts[j] * (1 - u) + pts[j + 1] * u
        np.testing.assert_allclose(got, ref, atol=1e-12)

    def test_sample_polygon_boundary(self):
        poly = _circle_poly(1000)
        z, ds = resample.sample_polygon_boundary(poly, 256)
        assert len(z) == 256
        np.testing.assert_allclose(np.abs(z), 1.0, atol=1e-3)
        np.testing.assert_allclose(ds, poly.length / 256)


class TestCardioid:
    def test_exact_inverse_roundtrip(self, rng):
        w = 0.9 * (rng.uniform(-1, 1, 500) + 1j * rng.uniform(-1, 1, 500))
        w = w[np.abs(w) < 0.95]
        z = cardioid.disk_to_cardioid(w)
        w_back = cardioid.cardioid_to_disk(z)
        np.testing.assert_allclose(w_back, w, atol=1e-12)

    def test_polygon_area(self):
        poly = cardioid.cardioid_polygon(4000, endpoint=False)
        # univalent f(w) = w/2 - w^2/4: area = pi*(1*|1/2|^2 + 2*|1/4|^2) = 0.375*pi
        assert poly.area == pytest.approx(0.375 * np.pi, rel=1e-4)


class TestMeshInterp:
    def test_no_collinear_joggle_caps(self):
        # straight polygon edges resample to exactly-collinear boundary
        # points; qhull QJ joggle then emits height~1e-13 "cap" triangles
        # whose P1 stiffness rows reach ~1e12 (the f32-killer pathology).
        # The relative degeneracy filter must remove every one of them.
        sq = Polygon(np.array([[0.0, 0], [2, 0], [2, 2], [0, 2]]))
        pts, tri = mesh.polygon_to_mesh(sq, h=0.25, boundary_h=0.125, seed=0)
        p0, p1, p2 = pts[tri[:, 0]], pts[tri[:, 1]], pts[tri[:, 2]]
        dbl_area = np.abs(
            (p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1])
            - (p1[:, 1] - p0[:, 1]) * (p2[:, 0] - p0[:, 0]))
        edge_sq = np.maximum(((p1 - p0) ** 2).sum(1), np.maximum(
            ((p2 - p1) ** 2).sum(1), ((p0 - p2) ** 2).sum(1)))
        assert (dbl_area > 1e-9 * edge_sq).all()
        # no orphaned nodes either
        assert np.isin(np.arange(len(pts)), tri.reshape(-1)).all()
        # and the mesh still covers the square
        from cmtci.maps import fem

        _, area = fem.p1_grads_areas(pts, tri)
        assert area.sum() == pytest.approx(4.0, rel=1e-6)

    def test_mesh_and_barycentric_roundtrip(self):
        poly = _circle_poly(200)
        pts, tri = mesh.polygon_to_mesh(poly, h=0.2, boundary_h=0.15, seed=0)
        assert len(tri) > 20
        bnd = mesh.boundary_vertices(tri)
        assert len(bnd) > 10
        r_bnd = np.hypot(pts[bnd, 0], pts[bnd, 1])
        assert r_bnd.min() > 0.7
        # interpolate the identity: invert_uv_to_z(z(uv)=uv) recovers queries
        z_nodes = pts[:, 0] + 1j * pts[:, 1]
        q = np.array([[0.1, 0.2], [-0.3, 0.4], [0.0, 0.0]])
        z_out, ok, _ = interp.invert_uv_to_z(q, pts, z_nodes)
        assert ok.all()
        np.testing.assert_allclose(
            np.column_stack([z_out.real, z_out.imag]), q, atol=1e-9
        )
