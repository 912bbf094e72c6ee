"""FEM quasiconformal uniformization pipeline (P1, call stack SURVEY §3.2).

Reference: lucas_to_cardioid_v18...py run_experiment (:841-973) + main
(:1068-1125): per refinement level, mesh the Lucas alpha-shape domain and
the cardioid, θ-iterate both to the disk, rotation-align, invert UV on the
cardioid chart, and report Beltrami K / angle distortion / CR defects /
boundary-distance K bins / interior delta sweeps.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from cmtci.geometry import alpha_shape, mesh as meshing
from cmtci.geometry.cardioid import cardioid_polygon
from cmtci.geometry.interp import invert_uv_to_z
from cmtci.io import writers
from cmtci.kernels import companion
from cmtci.maps import fem, qc

REFINEMENT_LEVELS = (
    dict(name="L0", h_L=0.08, h_C=0.06, boundary_h=0.04),
    dict(name="L1", h_L=0.05, h_C=0.04, boundary_h=0.025),
    dict(name="L2", h_L=0.035, h_C=0.03, boundary_h=0.015),
    dict(name="L3", h_L=0.025, h_C=0.02, boundary_h=0.010),
)


@dataclass
class FEMUniformizeConfig:
    n_min: int = 2
    n_max: int = 100
    alpha: float = 4.5
    theta_iters: int = 6
    theta_relax: float = 0.7
    theta_smooth: int = 7
    delta_sweep_factors: tuple = (2.0, 4.0, 6.0)
    cardioid_n: int = 401
    levels: tuple = REFINEMENT_LEVELS
    # None = platform-aware: the fused on-device θ-iteration (fem_device)
    # on a TPU session, SuperLU on a CPU one. Explicit: spsolve|cg|device.
    solver: str | None = None
    cloud_backend: str = "aberth"
    feedback: bool = True  # intended θ feedback (the reference's is dead code)

    def resolved_solver(self) -> str:
        if self.solver is not None:
            return self.solver
        from cmtci.utils.device import on_tpu

        return "device" if on_tpu() else "spsolve"


_MESH_CACHE: dict = {}
_MESH_CACHE_MAX = 24


def _mesh_bundle(poly, h: float, boundary_h: float, seed: int = 0,
                 with_dist: bool = False):
    """Memoized (points, triangles, bnd_data, centroid_distances) per mesh.

    polygon_to_mesh / boundary_order_by_arclength / exterior_distance are
    pure functions of (polygon, h, boundary_h, seed) — qhull and the
    arclength projections dominate the FEM pipeline's warm host time, so
    repeated studies at the same level (the common case: parameter sweeps
    over θ settings, bench reps) reuse them. Bounded LRU-ish cache.
    `with_dist` computes the O(nT·n_edges) centroid exterior-distance scan
    lazily (memoized in place) — only the Lucas mesh's QC needs it, the
    cardioid meshes never do.
    """
    ext = np.ascontiguousarray(poly.xy)
    key = (hash(ext.tobytes()), len(ext), float(h), float(boundary_h), seed)
    hit = _MESH_CACHE.get(key)
    if hit is None:
        p, t = meshing.polygon_to_mesh(poly, h=h, boundary_h=boundary_h,
                                       seed=seed)
        bd = fem.boundary_order_by_arclength(p, t, poly)
        if len(_MESH_CACHE) >= _MESH_CACHE_MAX:
            _MESH_CACHE.pop(next(iter(_MESH_CACHE)))
        hit = _MESH_CACHE[key] = [p, t, bd, None]
    if with_dist and hit[3] is None:
        hit[3] = poly.exterior_distance(meshing.tri_centroids(hit[0], hit[1]))
    return tuple(hit)


class _SyncTheta:
    def __init__(self, out):
        self._out = out

    def prefetch(self):
        return self

    def result(self):
        return self._out


def dispatch_level(cfg: FEMUniformizeConfig, h_l: float, h_c: float,
                   boundary_h: float, tag: str, poly_l, poly_c=None):
    """Mesh both domains and dispatch their θ-iterations (non-blocking on
    the device solver, so a driver can overlap every level's solves)."""
    if poly_c is None:
        poly_c = cardioid_polygon(cfg.cardioid_n)
    p_l, t_l, bd_l, d_all = _mesh_bundle(poly_l, h_l, boundary_h,
                                         with_dist=True)
    p_c, t_c, bd_c, _ = _mesh_bundle(poly_c, h_c, boundary_h)
    kw = dict(iters=cfg.theta_iters, relax=cfg.theta_relax,
              smooth=cfg.theta_smooth, feedback=cfg.feedback)
    solver = cfg.resolved_solver()
    if solver == "device":
        from cmtci.maps.fem_device import dispatch_theta_iteration_device

        th_l = dispatch_theta_iteration_device(p_l, t_l, poly_l,
                                               bnd_data=bd_l, **kw)
        th_c = dispatch_theta_iteration_device(p_c, t_c, poly_c,
                                               bnd_data=bd_c, **kw)
    else:
        th_l = _SyncTheta(fem.theta_iteration(p_l, t_l, poly_l, bnd_data=bd_l,
                                              method=solver, **kw))
        th_c = _SyncTheta(fem.theta_iteration(p_c, t_c, poly_c, bnd_data=bd_c,
                                              method=solver, **kw))
    return dict(tag=tag, h_l=h_l, h_c=h_c, boundary_h=boundary_h,
                p_l=p_l, t_l=t_l, bd_l=bd_l, d_all=d_all,
                p_c=p_c, t_c=t_c, bd_c=bd_c, th_l=th_l, th_c=th_c)


def finish_level(cfg: FEMUniformizeConfig, disp: dict):
    """QC analysis of one dispatched level (v18 run_experiment semantics)."""
    tag, h_l, h_c, boundary_h = (disp["tag"], disp["h_l"], disp["h_c"],
                                 disp["boundary_h"])
    p_l, t_l, bd_l = disp["p_l"], disp["t_l"], disp["bd_l"]
    p_c, t_c, bd_c = disp["p_c"], disp["t_c"], disp["bd_c"]
    u_l, v_l, _, _, per_l = disp["th_l"].result()
    u_c, v_c, _, _, per_c = disp["th_c"].result()

    # boundary rotation alignment after normalization (v18:857-872)
    b_l, b_c = bd_l[0], bd_c[0]
    w_lb = u_l[b_l] + 1j * v_l[b_l]
    w_cb = u_c[b_c] + 1j * v_c[b_c]
    m = min(len(w_lb), len(w_cb))
    rot = fem.optimal_rotation(w_lb[:m], w_cb[:m])
    w_l = (u_l + 1j * v_l) * rot
    uv_l = np.column_stack([w_l.real, w_l.imag])

    abs_cr_l, rel_cr_l = qc.cr_defect_metrics(p_l, t_l, uv_l[:, 0], uv_l[:, 1])
    abs_cr_c, rel_cr_c = qc.cr_defect_metrics(p_c, t_c, u_c, v_c)

    # invert Lucas uv through the cardioid chart (v18:881-891)
    uv_c = np.column_stack([u_c, v_c])
    z_c = p_c[:, 0] + 1j * p_c[:, 1]
    _, idx = np.unique(np.round(uv_c, 12), axis=0, return_index=True)
    phi_nodes, ok_nodes, _ = invert_uv_to_z(uv_l, uv_c[idx], z_c[idx])
    valid = ok_nodes & np.isfinite(phi_nodes.real) & np.isfinite(phi_nodes.imag)

    mus, ks, used = qc.beltrami_mu_k(p_l, t_l, phi_nodes, valid)
    ang = qc.angle_distortion(p_l, t_l, phi_nodes, valid)

    def med(x):
        return float(np.median(x)) if len(x) else float("nan")

    d_all = disp["d_all"]
    mask_ref = d_all >= 2.0 * h_l
    bins = []
    if mask_ref.any() and len(ks):
        _, ks_full, _ = qc.beltrami_full(p_l, t_l, phi_nodes, valid)
        x = d_all[mask_ref]
        y = ks_full[mask_ref]
        good = np.isfinite(y)
        if good.any():
            q = np.quantile(x[good], [0, 0.25, 0.5, 0.75, 1.0])
            bins = qc.binned_median(x[good], y[good], q)

    sweep = []
    for fac in cfg.delta_sweep_factors:
        delta = fac * h_l
        interior = d_all >= delta
        mus_i, ks_i, used_i = qc.beltrami_mu_k(p_l, t_l[interior], phi_nodes, valid)
        ang_i = qc.angle_distortion(p_l, t_l[interior], phi_nodes, valid)
        sweep.append(dict(
            delta_factor=float(fac), delta=float(delta), used_tris=int(used_i),
            mu_L2=float(np.sqrt(np.mean(np.abs(mus_i) ** 2))) if len(mus_i) else float("nan"),
            K_median=med(ks_i), angle_median=med(ang_i),
        ))

    return dict(
        tag=tag, h_L=h_l, h_C=h_c, boundary_h=boundary_h,
        valid_frac=float(np.mean(valid)), rot=rot,
        period_mismatch=dict(lucas=float(per_l), cardioid=float(per_c)),
        all=dict(used_tris=int(used),
                 mu_L2=float(np.sqrt(np.mean(np.abs(mus) ** 2))) if len(mus) else float("nan"),
                 K_median=med(ks), angle_median=med(ang)),
        cr=dict(
            lucas=dict(abs_med=med(abs_cr_l), abs_p90=float(np.quantile(abs_cr_l, 0.9)),
                       rel_med=med(rel_cr_l), rel_p90=float(np.quantile(rel_cr_l, 0.9)),
                       tris=int(len(abs_cr_l))),
            cardioid=dict(abs_med=med(abs_cr_c), abs_p90=float(np.quantile(abs_cr_c, 0.9)),
                          rel_med=med(rel_cr_c), rel_p90=float(np.quantile(rel_cr_c, 0.9)),
                          tris=int(len(abs_cr_c))),
        ),
        K_bins_d2h=bins, sweep=sweep,
    )


def run_level(cfg: FEMUniformizeConfig, h_l: float, h_c: float, boundary_h: float,
              tag: str, poly_l=None):
    """One refinement level (v18 run_experiment semantics)."""
    if poly_l is None:
        inv = companion.inverse_cloud(list(range(cfg.n_min, cfg.n_max + 1)),
                                      backend=cfg.cloud_backend)
        poly_l = alpha_shape.alpha_shape_polygon(inv, cfg.alpha)
    return finish_level(cfg, dispatch_level(cfg, h_l, h_c, boundary_h, tag,
                                            poly_l))


def run_fem_uniformization(cfg: FEMUniformizeConfig, out_dir: str | None = None,
                           levels: tuple | None = None):
    """All refinement levels; results.json + results_compact.csv like v18.

    Every level's θ-iterations are DISPATCHED before any is analyzed: on
    the device solver the 2·levels fused solves execute asynchronously
    (jax async dispatch), so the TPU relay roundtrips and the device
    compute of all meshes overlap instead of serializing per level.
    """
    inv = companion.inverse_cloud(list(range(cfg.n_min, cfg.n_max + 1)),
                                  backend=cfg.cloud_backend)
    poly_l = alpha_shape.alpha_shape_polygon(inv, cfg.alpha)
    poly_c = cardioid_polygon(cfg.cardioid_n)
    dispatched = [
        dispatch_level(cfg, lvl["h_L"], lvl["h_C"], lvl["boundary_h"],
                       lvl["name"], poly_l, poly_c)
        for lvl in (levels if levels is not None else cfg.levels)
    ]
    for d in dispatched:  # start every device→host copy before any blocks
        d["th_l"].prefetch()
        d["th_c"].prefetch()
    results = [finish_level(cfg, d) for d in dispatched]
    if out_dir:
        writers.write_json(f"{out_dir}/results.json", results)
        rows = [{
            "tag": r["tag"], "h_L": r["h_L"], "valid_frac": r["valid_frac"],
            "K_median": r["all"]["K_median"], "mu_L2": r["all"]["mu_L2"],
            "angle_median": r["all"]["angle_median"],
            "cr_rel_med_lucas": r["cr"]["lucas"]["rel_med"],
            "period_mis_lucas": r["period_mismatch"]["lucas"],
        } for r in results]
        writers.write_dict_rows_csv(f"{out_dir}/results_compact.csv", rows)
        writers.write_config_meta(f"{out_dir}/meta.txt", cfg)
        from cmtci.io import plots

        for r in results:
            plots.plot_k_bins(r.get("K_bins_d2h") or [], r["tag"], out_dir)
    return results
