"""Mandelbrot boundary pipeline (BASELINE config 1, call stack SURVEY §3.1).

Reference: mandelbrot_boundary_sample.py — dwell grid (res², max_iter),
isocontour at level_frac*max_iter, longest path, CSV + meta outputs.

The dwell grid runs on the Pallas TPU kernel when a TPU is present (f32,
tile-padded then cropped), else the f64 XLA kernel.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

from cmtci.geometry import contour
from cmtci.io import writers
from cmtci.kernels import mandelbrot as mb


@dataclass
class BoundaryConfig:
    xlim: tuple = (-2.1, 0.9)
    ylim: tuple = (-1.5, 1.5)
    res: int = 2000
    max_iter: int = 500
    level: float = 0.96
    backend: str = "auto"  # "pallas" | "xla" | "auto"


def compute_dwell(cfg: BoundaryConfig, mesh=None) -> np.ndarray:
    domain = (*cfg.xlim, *cfg.ylim)
    if mesh is not None:
        import jax.numpy as jnp

        from cmtci.parallel.sharded import sharded_dwell_rows
        from cmtci.utils.device import analysis_cpu

        # row-shard the dwell loop over the mesh on the SAME linspace grid
        # nodes as the single-device path (sharded_dwell_rows — bitwise-
        # identical dwell field on a CPU mesh; an f32 accelerator mesh can
        # flip borderline pixels, like every f32 realization). Pad rows to
        # a mesh multiple with copies of the first row, then crop.
        f64_ok = mesh.devices.flat[0].platform == "cpu"
        dt = jnp.float64 if f64_ok else jnp.float32
        with analysis_cpu():  # same jnp.linspace nodes as the f64 path
            cr, ci = mb.complex_grid(domain, cfg.res, cfg.res, dtype=dt)
            cr, ci = np.asarray(cr), np.asarray(ci)
        n_dev = mesh.devices.size
        ny = ((cfg.res + n_dev - 1) // n_dev) * n_dev
        pad = ny - cfg.res
        if pad:
            cr = np.vstack([cr, np.repeat(cr[:1], pad, axis=0)])
            ci = np.vstack([ci, np.repeat(ci[:1], pad, axis=0)])
        z = sharded_dwell_rows(cr, ci, cfg.max_iter, mesh)
        return np.asarray(z)[: cfg.res].astype(float)
    use_pallas = cfg.backend == "pallas" or (
        cfg.backend == "auto" and jax.default_backend() in ("tpu", "axon")
    )
    if use_pallas:
        from cmtci.kernels.mandelbrot_pallas import DEFAULT_TILE, mandelbrot_field_pallas

        th, tw = DEFAULT_TILE
        ny = ((cfg.res + th - 1) // th) * th
        nx = ((cfg.res + tw - 1) // tw) * tw
        # pad grid at the 'res' spacing, then crop: first res rows/cols match
        xmax_pad = cfg.xlim[0] + (cfg.xlim[1] - cfg.xlim[0]) * (nx - 1) / (cfg.res - 1)
        ymax_pad = cfg.ylim[0] + (cfg.ylim[1] - cfg.ylim[0]) * (ny - 1) / (cfg.res - 1)
        dom_pad = (cfg.xlim[0], xmax_pad, cfg.ylim[0], ymax_pad)
        z = mandelbrot_field_pallas(dom_pad, nx, ny, max_iter=cfg.max_iter, kind="dwell")
        return np.asarray(z)[: cfg.res, : cfg.res]
    from cmtci.utils.device import analysis_cpu

    with analysis_cpu():  # f64 escape loop: host CPU by the device policy
        cr, ci = mb.complex_grid(domain, cfg.res, cfg.res)
        return np.asarray(mb.dwell_grid(cr, ci, max_iter=cfg.max_iter)).astype(float)


def run_boundary(cfg: BoundaryConfig, output_prefix: str | None = None,
                 mesh=None):
    """Returns (contour_vertices, dwell_grid); optionally writes the file bus."""
    xs = np.linspace(cfg.xlim[0], cfg.xlim[1], cfg.res)
    ys = np.linspace(cfg.ylim[0], cfg.ylim[1], cfg.res)
    z = compute_dwell(cfg, mesh=mesh)
    path = contour.extract_contour(xs, ys, z, cfg.level * cfg.max_iter)
    if path is None or path.shape[0] < 50:
        raise RuntimeError("Failed to extract a usable contour; adjust level/res.")
    if output_prefix:
        writers.write_xy_csv(f"{output_prefix}_boundary.csv", path)
        from cmtci.io import plots

        plots.plot_boundary_overlay(path, path, f"{output_prefix}_boundary.png")
        writers.write_meta_txt(f"{output_prefix}_meta.txt", {
            "xlim": list(cfg.xlim), "ylim": list(cfg.ylim), "res": cfg.res,
            "max_iter": cfg.max_iter, "level": cfg.level,
        })
    return path, z
