"""Curvature pipeline (BASELINE config 2).

Reference: boundary_curvature_localpoly.py — ±neighbors local-polynomial
curvature on an ordered boundary, 10-column CSV + summary TXT.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from cmtci.io import writers
from cmtci.stats import curvature as curv


@dataclass
class CurvatureConfig:
    neighbors: int = 7
    closed: bool = True


def run_curvature(points_xy, cfg: CurvatureConfig, output_prefix: str | None = None):
    """Returns (kappa, kappa_signed, speed, aux, summary dict)."""
    p = np.asarray(points_xy, dtype=float)
    if p.shape[0] < 2 * cfg.neighbors + 1:
        raise ValueError(f"Need at least {2*cfg.neighbors+1} points; got {p.shape[0]}.")
    kappa, ks, speed, aux = curv.localpoly_curvature(p, cfg.neighbors, cfg.closed)
    summary = dict(
        n=len(kappa),
        mean=float(np.mean(kappa)),
        median=float(np.median(kappa)),
        std=float(np.std(kappa)),
        q05=float(np.quantile(kappa, 0.05)),
        q95=float(np.quantile(kappa, 0.95)),
        max=float(np.max(kappa)),
    )
    if output_prefix:
        writers.write_curvature_csv(f"{output_prefix}_curvature.csv", p, kappa, ks, speed, aux)
        from cmtci.io import plots

        plots.plot_curvature(p, kappa, output_prefix)
        writers.write_config_meta(f"{output_prefix}_meta.txt", cfg,
                                  extra={"N": len(p)})
        writers.ensure_dir(f"{output_prefix}_summary.txt")
        with open(f"{output_prefix}_summary.txt", "w") as f:
            f.write("Local-Polynomial Curvature Summary\n")
            f.write("\n".join(f"{k}: {v:.10g}" for k, v in summary.items()) + "\n")
    return kappa, ks, speed, aux, summary
