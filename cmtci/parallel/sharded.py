"""Multi-chip execution: sharded grids, eigensweeps, and reductions.

The reference is single-process with no parallelism (SURVEY.md §2/§5.8: the
one multiprocessing import is dead code). The TPU-native scaling story is
data parallelism over a `jax.sharding.Mesh`:

  * escape-time / potential grids sharded by rows (embarrassingly parallel,
    coordinates synthesized per shard from the axis index),
  * batched companion eigensolves sharded over the polynomial batch,
  * histogram / moment accumulation via per-shard partials + `psum` over ICI,
  * GI-flow iterations on the replicated histograms.

Everything uses shard_map so each device runs an independent escape loop /
Aberth iteration (no collectives inside the hot loops; one psum at the
reduction edge). `analysis_step` is the full "training step" analogue used
by the driver's multi-chip dry run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from cmtci.kernels import companion
from cmtci.utils import cplx


def device_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def _dwell_local(cr, ci, max_iter: int):
    """Elementwise f32 dwell loop (runs per shard, no communication)."""
    zr = jnp.zeros_like(cr)
    zi = jnp.zeros_like(ci)
    act = jnp.ones_like(cr)
    dwell = jnp.zeros_like(cr)

    def body(_, s):
        zr, zi, act, dwell = s
        zr, zi = zr * zr - zi * zi + cr, 2.0 * zr * zi + ci
        inside = zr * zr + zi * zi <= 4.0
        act = act * jnp.where(inside, 1.0, 0.0)
        zr = jnp.where(inside, zr, 0.0)
        zi = jnp.where(inside, zi, 0.0)
        return zr, zi, act, dwell + act

    _, _, _, dwell = jax.lax.fori_loop(0, max_iter, body, (zr, zi, act, dwell))
    return dwell


def sharded_dwell_grid(domain, nx: int, ny: int, max_iter: int, mesh: Mesh,
                       dtype=jnp.float32):
    """Row-sharded dwell grid over the mesh. ny must divide by mesh size."""
    n_dev = mesh.devices.size
    if ny % n_dev:
        raise ValueError(f"ny={ny} must be a multiple of mesh size {n_dev}")
    xmin, xmax, ymin, ymax = domain
    dx = (xmax - xmin) / (nx - 1)
    dy = (ymax - ymin) / (ny - 1)
    rows_per = ny // n_dev

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(), out_specs=P("data", None),
        check_vma=False,
    )
    def run():
        idx = jax.lax.axis_index("data")
        row0 = (idx * rows_per).astype(dtype)
        rows = row0 + jnp.arange(rows_per, dtype=dtype)
        cols = jnp.arange(nx, dtype=dtype)
        cr = jnp.broadcast_to((xmin + cols[None, :] * dx).astype(dtype), (rows_per, nx))
        ci = (ymin + rows[:, None] * dy).astype(dtype)
        ci = jnp.broadcast_to(ci, (rows_per, nx))
        return _dwell_local(cr, ci, max_iter)

    return run()


def sharded_eigensweep(ns, family: str = "lucas_all_ones", mesh: Mesh | None = None,
                       max_iters: int = 200):
    """Companion eigensweep with the polynomial batch sharded over devices.

    Pads the batch to a mesh multiple; returns (re, im, valid) with padding
    rows masked out.
    """
    if mesh is None:
        mesh = device_mesh()
    a, deg = companion.poly_coeff_batch(ns, family)
    n_dev = mesh.devices.size
    b = a.shape[0]
    b_pad = ((b + n_dev - 1) // n_dev) * n_dev
    a = jnp.pad(a, ((0, b_pad - b), (0, 0)))
    a = a.at[b:, 0].set(1.0)  # pad rows: degree-1 polys (x - 0 coefficients)
    deg = jnp.pad(deg, (0, b_pad - b), constant_values=1)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P("data", None), P("data")),
        out_specs=(P("data", None), P("data", None), P("data", None)),
        check_vma=False,
    )
    def run(a_loc, deg_loc):
        zr, zi, valid = companion.aberth_roots(a_loc, deg_loc, max_iters=max_iters)
        return zr, zi, valid

    zr, zi, valid = run(a, deg)
    return zr[:b], zi[:b], valid[:b]


def sharded_histogram(points_r, points_i, bins: int, domain, mesh: Mesh):
    """Per-shard 2D histogram + psum; input sharded along the point axis."""
    xmin, xmax, ymin, ymax = domain

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P(),
        check_vma=False,
    )
    def run(xr, xi):
        xedges = jnp.linspace(xmin, xmax, bins + 1)
        yedges = jnp.linspace(ymin, ymax, bins + 1)
        ix = jnp.searchsorted(xedges, xr, side="right") - 1
        iy = jnp.searchsorted(yedges, xi, side="right") - 1
        ix = jnp.where(xr == xmax, bins - 1, ix)
        iy = jnp.where(xi == ymax, bins - 1, iy)
        ok = (ix >= 0) & (ix < bins) & (iy >= 0) & (iy < bins)
        flat = jnp.where(ok, ix * bins + iy, bins * bins)
        h = jnp.zeros(bins * bins + 1, dtype=xr.dtype).at[flat].add(1.0)
        return jax.lax.psum(h[:-1].reshape(bins, bins), "data")

    return run(points_r, points_i)


def sharded_semivariogram(coords, values, r_edges, mesh: Mesh, chunk: int = 512):
    """All-pairs semivariogram with the i-rows sharded over the mesh.

    Each device bins its row block against the full (replicated) point set
    with a global j > i mask, then per-bin (sum, count) partials are
    psum-reduced — the multi-chip form of stats.variogram.grid_semivariogram
    (exactly equal to it; no pair caps). Returns (gamma, counts).
    """
    coords = np.asarray(coords, dtype=float)
    values = np.asarray(values, dtype=float)
    n = len(coords)
    n_dev = mesh.devices.size
    n_pad = ((n + n_dev * chunk - 1) // (n_dev * chunk)) * (n_dev * chunk)
    cp = np.pad(coords, ((0, n_pad - n), (0, 0)))
    vp = np.pad(values, (0, n_pad - n))
    edges = jnp.asarray(np.asarray(r_edges, dtype=float))
    nbins = len(r_edges) - 1
    rows_per = n_pad // n_dev

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("data", None), P("data"), P(None, None), P(None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(c_loc, v_loc, c_all, v_all):
        dev = jax.lax.axis_index("data")
        row0 = dev * rows_per
        cols = jnp.arange(n_pad)

        def body(i, acc):
            sums, counts = acc
            blk_c = jax.lax.dynamic_slice_in_dim(c_loc, i * chunk, chunk, axis=0)
            blk_v = jax.lax.dynamic_slice_in_dim(v_loc, i * chunk, chunk)
            gidx = row0 + i * chunk + jnp.arange(chunk)
            d = jnp.sqrt(jnp.sum((blk_c[:, None, :] - c_all[None, :, :]) ** 2, axis=-1))
            dv2 = (blk_v[:, None] - v_all[None, :]) ** 2
            valid = (gidx[:, None] < n) & (cols[None, :] > gidx[:, None]) & (cols[None, :] < n)
            b = jnp.searchsorted(edges, d.ravel(), side="right") - 1
            ok = valid.ravel() & (b >= 0) & (b < nbins) & (d.ravel() >= edges[0])
            b = jnp.where(ok, b, nbins)
            sums = sums.at[b].add(jnp.where(ok, dv2.ravel(), 0.0))
            counts = counts.at[b].add(ok.astype(sums.dtype))
            return sums, counts

        init = (jnp.zeros(nbins + 1), jnp.zeros(nbins + 1))
        sums, counts = jax.lax.fori_loop(0, rows_per // chunk, body, init)
        return jax.lax.psum(sums[:-1], "data"), jax.lax.psum(counts[:-1], "data")

    sums, counts = run(jnp.asarray(cp), jnp.asarray(vp), jnp.asarray(cp), jnp.asarray(vp))
    sums, counts = np.asarray(sums), np.asarray(counts)
    gamma = np.zeros(nbins)
    nz = counts > 0
    gamma[nz] = 0.5 * sums[nz] / counts[nz]
    return gamma, counts


def analysis_step(ns, domain, grid_n: int, bins: int, max_iter: int, mesh: Mesh,
                  alpha: float = 0.1, gi_steps: int = 5, eps: float = 1e-12):
    """Full sharded analysis step (the dry-run "training step").

    eigensweep (batch-sharded) -> inverse cloud histogram (point-sharded,
    psum) -> dwell grid (row-sharded) -> escape-proxy histogram -> GI-flow
    on the replicated histograms. Returns dict of small diagnostics.
    """
    zr, zi, valid = sharded_eigensweep(ns, mesh=mesh)
    inv_r, inv_i = cplx.reciprocal((zr, zi))
    # mask invalid lanes to a point outside the domain so they drop from hists
    inv_r = jnp.where(valid, inv_r, domain[1] + 1.0)
    inv_i = jnp.where(valid, inv_i, domain[3] + 1.0)
    n_dev = mesh.devices.size
    flat_r = inv_r.reshape(-1)
    flat_i = inv_i.reshape(-1)
    m = (flat_r.shape[0] // n_dev) * n_dev
    p_c = sharded_histogram(flat_r[:m], flat_i[:m], bins, domain, mesh)
    p_c = jnp.maximum(p_c, eps)
    p_c = p_c / p_c.sum()

    dwell = sharded_dwell_grid(domain, grid_n, grid_n, max_iter, mesh)
    esc = dwell < max_iter
    xs = jnp.linspace(domain[0], domain[1], grid_n)
    ys = jnp.linspace(domain[2], domain[3], grid_n)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    # exterior-proxy histogram (keep shapes static: weight by escape mask)
    wr = jnp.where(esc, gx.astype(dwell.dtype), domain[1] + 1.0)
    wi = jnp.where(esc, gy.astype(dwell.dtype), domain[3] + 1.0)
    fr = wr.reshape(-1)
    fi = wi.reshape(-1)
    m2 = (fr.shape[0] // n_dev) * n_dev
    p_m = sharded_histogram(fr[:m2], fi[:m2], bins, domain, mesh)
    p_m = jnp.maximum(p_m, eps)
    p_m = p_m / p_m.sum()

    def gi_body(x, _):
        return (1.0 - alpha) * x + alpha * p_m, None

    x_t, _ = jax.lax.scan(gi_body, p_c, None, length=gi_steps)
    p_cl = jnp.clip(p_m, eps, None)
    x_cl = jnp.clip(x_t, eps, None)
    kl = jnp.sum(p_cl * (jnp.log(p_cl) - jnp.log(x_cl)))
    return {"kl": kl, "escaped_frac": jnp.mean(esc.astype(jnp.float32)),
            "n_roots": jnp.sum(valid)}
