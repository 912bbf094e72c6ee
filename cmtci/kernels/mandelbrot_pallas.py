"""Fused Pallas TPU escape-time kernel with per-tile early exit.

The reference's hottest loop is the pure-Python per-pixel dwell grid
(mandelbrot_boundary_sample.py:22-39, res² = 4e6 pixels x <=500 iterations).
Here each (TH, TW) tile runs entirely in VMEM: the complex grid is
synthesized on-core from the tile's program_id (no HBM input traffic at
all), orbit state lives in VMEM scratch refs, and a `lax.while_loop` with a
scalar-only carry runs Python-unrolled chunks of `inner` iterations,
exiting as soon as every lane in the tile has escaped — far-field tiles
stop after one chunk. Escaped lanes are NOT frozen: IEEE inf/nan
propagation keeps `inside`/`hit` predicates false after escape, so the
latched outputs stay exact while the inner loop needs no freeze selects.

Tuning (measured on TPU v5e, 2048² grid, max_iter=500, chained timing to
amortize the ~30 ms relay roundtrip): tile=(32,256), inner=32, analytic
interior early-out -> ~1.7 ms/grid (~2400 Mpix/s device-side) for the dwell
head; larger tiles lose to coarser early-exit granularity. Green/DE heads:
1151 / 751 Mpix/s.

Heads (static `kind`):
  * "dwell"  — first n (0-based) with |z_{n+1}|² > 4, else max_iter
  * "green"  — g = log|z_k| * 2^-k at first escape (|z| > escape_r), else 0
    (variograms_construct_mandelbrot.py:148-166 normalization)
  * "de"     — standard distance estimator (variograms_construct_mandelbrot.py:61-88)

float32 is the perf path (the analysis/parity path is the float64 XLA
kernel in kernels/mandelbrot.py); dwell counts are integer-exact except for
orbits within f32 noise of the escape boundary (~0.2% of pixels).

The kernel is traced with x64 disabled (Mosaic's layout inference rejects
the stray 64-bit scalars x64 mode introduces); on non-TPU backends it runs
in interpreter mode so tests exercise identical semantics on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = (32, 256)
DEFAULT_INNER = 32


def _tile_coords(params_ref, th: int, tw: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
    cr = params_ref[0] + (cols + jnp.float32(tw) * j.astype(jnp.float32)) * params_ref[2]
    ci = params_ref[1] + (rows + jnp.float32(th) * i.astype(jnp.float32)) * params_ref[3]
    return cr, ci


def _dwell_kernel(params_ref, *refs, max_iter: int, inner: int,
                  periodicity: bool = False, ms: bool = False):
    if ms:
        # Mariani–Silver fill flags (one f32 per tile, SMEM): >= 0 means
        # "this tile's dwell is the flag value everywhere" — the tile skips
        # its entire while_loop and writes the fill, the cheap analogue of
        # the classic rectangle fill (mandelbrot_boundary_sample.py computes
        # every pixel; this is an opt-in TPU restructuring, see
        # dwell_field_ms for the coarse-uniformity fill criterion).
        fill_ref, out_ref, zr_ref, zi_ref, act_ref, *refs = refs
    else:
        out_ref, zr_ref, zi_ref, act_ref, *refs = refs
    th, tw = out_ref.shape
    cr, ci = _tile_coords(params_ref, th, tw)
    # analytic interior (see _interior_mask): those lanes start inactive with
    # dwell = max_iter, so interior-dominated tiles exit after one chunk.
    # The 1e-5 safety margin keeps the f32-evaluated tests strictly INSIDE
    # the true sets (f32 eval error ~1e-7): near-parabolic exterior pixels
    # with finite dwell ~1/sqrt(distance) can never be misclassified, at any
    # max_iter; the excluded interior sliver just iterates normally.
    interior = _interior_mask(cr, ci)
    zr_ref[:] = jnp.zeros((th, tw), jnp.float32)
    zi_ref[:] = jnp.zeros((th, tw), jnp.float32)
    act0 = jnp.where(interior, 0.0, 1.0)
    out0 = jnp.where(interior, jnp.float32(max_iter), 0.0)
    if ms:
        # flat 1-D SMEM indexing (row-major over the tile grid): Mosaic's
        # layout checker rejects dynamic 2-D SMEM indices
        fv = fill_ref[pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)]
        filled = fv >= 0.0
        act0 = jnp.where(filled, 0.0, act0)
        out0 = jnp.where(filled, fv, out0)
    act_ref[:] = act0
    out_ref[:] = out0
    n_chunks = (max_iter + inner - 1) // inner
    if periodicity:
        # Brent cycle detection for interior lanes outside the cardioid/bulb:
        # exact f32 orbit equality with a power-of-2-scheduled checkpoint
        # implies a genuine f32 cycle, hence dwell = max_iter exactly. Pays
        # ~40% per-iteration overhead; a win only at high max_iter where
        # filament/bulb lanes would otherwise pin their tiles to max_iter.
        cycr_ref, cyci_ref, cyc_ref = refs
        cycr_ref[:] = jnp.full((th, tw), jnp.float32(1e30))
        cyci_ref[:] = jnp.zeros((th, tw), jnp.float32)
        cyc_ref[:] = jnp.zeros((th, tw), jnp.float32)

    def body(itf):
        zr = zr_ref[:]
        zi = zi_ref[:]
        act = act_ref[:]
        dwell = out_ref[:]
        base = itf * jnp.float32(inner)
        if periodicity:
            zcr = cycr_ref[:]
            zci = cyci_ref[:]
            cyc = cyc_ref[:]
        for n in range(inner):
            zr, zi = zr * zr - zi * zi + cr, 2.0 * zr * zi + ci
            inside = zr * zr + zi * zi <= 4.0  # inf/nan -> False, latches act
            act = act * jnp.where(inside, 1.0, 0.0)
            if periodicity:
                hit = jnp.where((zr == zcr) & (zi == zci), 1.0, 0.0)
                cyc = jnp.maximum(cyc, hit * act)
                act = act * (1.0 - hit)
            # count only the first max_iter iterations (the chunked loop may
            # overrun to the next `inner` multiple)
            sv = jnp.where(base + jnp.float32(n) < jnp.float32(max_iter), 1.0, 0.0)
            dwell = dwell + act * sv
        if periodicity:
            k = itf + 1.0
            lg = jnp.log2(jnp.maximum(k, 1.0))
            upd = jnp.where(jnp.floor(lg) == lg, 1.0, 0.0)
            cycr_ref[:] = zcr * (1.0 - upd) + zr * upd
            cyci_ref[:] = zci * (1.0 - upd) + zi * upd
            cyc_ref[:] = cyc
        zr_ref[:] = zr
        zi_ref[:] = zi
        act_ref[:] = act
        out_ref[:] = dwell
        return itf + 1.0

    def cond(itf):
        return jnp.logical_and(itf < jnp.float32(n_chunks), jnp.max(act_ref[:]) > 0.5)

    jax.lax.while_loop(cond, body, jnp.float32(0.0))
    if periodicity:
        out_ref[:] = jnp.where(cyc_ref[:] > 0.5, jnp.float32(max_iter), out_ref[:])


def _interior_mask(cr, ci):
    """Analytic never-escapes test (cardioid + period-2 bulb, 1e-5 margin)."""
    q = (cr - 0.25) * (cr - 0.25) + ci * ci
    in_cardioid = q * (q + (cr - 0.25)) <= 0.25 * ci * ci - 1e-5
    in_bulb = (cr + 1.0) * (cr + 1.0) + ci * ci <= 0.0625 - 1e-5
    return in_cardioid | in_bulb


def _green_kernel(params_ref, out_ref, zr_ref, zi_ref, esc_ref, *,
                  max_iter: int, inner: int, escape_r: float):
    th, tw = out_ref.shape
    cr, ci = _tile_coords(params_ref, th, tw)
    zr_ref[:] = jnp.zeros((th, tw), jnp.float32)
    zi_ref[:] = jnp.zeros((th, tw), jnp.float32)
    # analytically-interior lanes never escape: marking them "escaped" with
    # the zero-initialized latches leaves g = 0, the exact non-escape output,
    # and lets interior tiles exit after one chunk
    esc_ref[:] = jnp.where(_interior_mask(cr, ci), 1.0, 0.0)
    out_ref[:] = jnp.zeros((th, tw), jnp.float32)
    r2 = jnp.float32(escape_r * escape_r)
    n_chunks = (max_iter + inner - 1) // inner

    def body(itf):
        zr = zr_ref[:]
        zi = zi_ref[:]
        escf = esc_ref[:]
        g = out_ref[:]
        base = itf * jnp.float32(inner)
        for n in range(inner):
            zr, zi = zr * zr - zi * zi + cr, 2.0 * zr * zi + ci
            a2 = zr * zr + zi * zi
            sv = (base + jnp.float32(n)) < jnp.float32(max_iter)
            hit = (a2 > r2) & (escf < 0.5) & sv
            val = 0.5 * jnp.log(jnp.maximum(a2, 1e-30)) * jnp.exp2(-(base + jnp.float32(n + 1)))
            # where (not arithmetic accumulate): a2 can be inf/nan after
            # escape and 0*nan would poison g
            g = jnp.where(hit, jnp.maximum(val, 0.0), g)
            escf = jnp.maximum(escf, jnp.where(hit, 1.0, 0.0))
        zr_ref[:] = zr
        zi_ref[:] = zi
        esc_ref[:] = escf
        out_ref[:] = g
        return itf + 1.0

    def cond(itf):
        return jnp.logical_and(itf < jnp.float32(n_chunks), jnp.min(esc_ref[:]) < 0.5)

    jax.lax.while_loop(cond, body, jnp.float32(0.0))


def _de_kernel(params_ref, out_ref, zr_ref, zi_ref, esc_ref, dzr_ref, dzi_ref,
               lzr_ref, lzi_ref, ldr_ref, ldi_ref, *,
               max_iter: int, inner: int, escape_r: float):
    th, tw = out_ref.shape
    cr, ci = _tile_coords(params_ref, th, tw)
    zero = jnp.zeros((th, tw), jnp.float32)
    one = jnp.ones((th, tw), jnp.float32)
    zr_ref[:] = zero
    zi_ref[:] = zero
    # interior lanes marked escaped with zero latches -> d = 0 exactly (the
    # reference's non-escape output), interior tiles exit after one chunk
    esc_ref[:] = jnp.where(_interior_mask(cr, ci), 1.0, 0.0)
    dzr_ref[:] = one
    dzi_ref[:] = zero
    lzr_ref[:] = zero
    lzi_ref[:] = zero
    ldr_ref[:] = one
    ldi_ref[:] = zero
    r2 = jnp.float32(escape_r * escape_r)
    n_chunks = (max_iter + inner - 1) // inner

    def body(itf):
        zr = zr_ref[:]
        zi = zi_ref[:]
        esc = esc_ref[:] > 0.5
        dzr = dzr_ref[:]
        dzi = dzi_ref[:]
        lzr = lzr_ref[:]
        lzi = lzi_ref[:]
        ldr = ldr_ref[:]
        ldi = ldi_ref[:]
        base = itf * jnp.float32(inner)
        for n in range(inner):
            tr, ti = 2.0 * zr, 2.0 * zi
            dzr, dzi = tr * dzr - ti * dzi + 1.0, tr * dzi + ti * dzr
            zr, zi = zr * zr - zi * zi + cr, 2.0 * zr * zi + ci
            hit = (zr * zr + zi * zi > r2) & ~esc & ((base + jnp.float32(n)) < jnp.float32(max_iter))
            lzr = jnp.where(hit, zr, lzr)
            lzi = jnp.where(hit, zi, lzi)
            ldr = jnp.where(hit, dzr, ldr)
            ldi = jnp.where(hit, dzi, ldi)
            esc = esc | hit
            # freeze dz/z: f32 overflows ~1e38 would nan the latched selects'
            # unused branch, which is fine, but freezing keeps the early-exit
            # reduction cheap and mirrors the latched f64 semantics
            zr = jnp.where(esc, 0.0, zr)
            zi = jnp.where(esc, 0.0, zi)
            dzr = jnp.where(esc, 1.0, dzr)
            dzi = jnp.where(esc, 0.0, dzi)
        zr_ref[:] = zr
        zi_ref[:] = zi
        esc_ref[:] = jnp.where(esc, 1.0, 0.0)
        dzr_ref[:] = dzr
        dzi_ref[:] = dzi
        lzr_ref[:] = lzr
        lzi_ref[:] = lzi
        ldr_ref[:] = ldr
        ldi_ref[:] = ldi
        return itf + 1.0

    def cond(itf):
        return jnp.logical_and(itf < jnp.float32(n_chunks), jnp.min(esc_ref[:]) < 0.5)

    jax.lax.while_loop(cond, body, jnp.float32(0.0))

    esc = esc_ref[:] > 0.5
    lzr = lzr_ref[:]
    lzi = lzi_ref[:]
    ldr = ldr_ref[:]
    ldi = ldi_ref[:]
    az = jnp.sqrt(lzr * lzr + lzi * lzi)
    pr = 2.0 * (lzr * ldr - lzi * ldi)
    pi_ = 2.0 * (lzr * ldi + lzi * ldr)
    num = jnp.log(jnp.maximum(az, 1.0)) * az
    den = jnp.maximum(jnp.sqrt(pr * pr + pi_ * pi_), jnp.float32(1e-14))
    out_ref[:] = jnp.where(esc, num / den, jnp.float32(0.0))


def _tci_kernel(params_ref, out_ref, zr_ref, zi_ref, esc_ref, dzr_ref, dzi_ref,
                lzr_ref, lzi_ref, done_ref, *,
                max_iter: int, inner: int, escape_r: float):
    """TCI distance estimator (tci_construct_mandelbrot_v002_fixed.py:35-47).

    The reference's non-latched-dz overflow semantics: z is latched at first
    |z| > escape_r, but dz keeps iterating with the evolving z and overflows
    to inf for all but the latest escapers, so d == 0 there. Early exit is
    exact: a lane is "done" when it is analytically interior (d = 0, not
    escaped) or when it has escaped AND its dz has gone non-finite — from
    then on d = num/inf = 0 (or nan -> 0) regardless of further iterations,
    and non-finite dz can never return to finite. Late escapers with still-
    finite dz keep their tile alive until max_iter, exactly like the f64
    XLA path. Output encoding: d (>= 0) where escaped, -1.0 where not.
    """
    th, tw = out_ref.shape
    cr, ci = _tile_coords(params_ref, th, tw)
    zero = jnp.zeros((th, tw), jnp.float32)
    interior = _interior_mask(cr, ci)
    zr_ref[:] = zero
    zi_ref[:] = zero
    esc_ref[:] = zero
    dzr_ref[:] = jnp.ones((th, tw), jnp.float32)
    dzi_ref[:] = zero
    lzr_ref[:] = zero
    lzi_ref[:] = zero
    done_ref[:] = jnp.where(interior, 1.0, 0.0)
    r2 = jnp.float32(escape_r * escape_r)
    n_chunks = (max_iter + inner - 1) // inner

    def body(itf):
        zr = zr_ref[:]
        zi = zi_ref[:]
        escf = esc_ref[:]
        dzr = dzr_ref[:]
        dzi = dzi_ref[:]
        lzr = lzr_ref[:]
        lzi = lzi_ref[:]
        done = done_ref[:]
        base = itf * jnp.float32(inner)
        for n in range(inner):
            # guard chunk overrun past max_iter: extra steps must not evolve
            # dz (it feeds d for late escapers) nor latch anything
            sv = (base + jnp.float32(n)) < jnp.float32(max_iter)
            tr, ti = 2.0 * zr, 2.0 * zi
            ndzr, ndzi = tr * dzr - ti * dzi + 1.0, tr * dzi + ti * dzr
            nzr, nzi = zr * zr - zi * zi + cr, 2.0 * zr * zi + ci
            dzr = jnp.where(sv, ndzr, dzr)
            dzi = jnp.where(sv, ndzi, dzi)
            zr = jnp.where(sv, nzr, zr)
            zi = jnp.where(sv, nzi, zi)
            a2 = zr * zr + zi * zi
            hit = (a2 > r2) & (escf < 0.5) & sv  # |z| > R (squared; inf -> True)
            lzr = jnp.where(hit, zr, lzr)
            lzi = jnp.where(hit, zi, lzi)
            escf = jnp.maximum(escf, jnp.where(hit, 1.0, 0.0))
            # escaped lanes keep iterating z and dz (NOT frozen) — the
            # reference's overflow-to-inf path; dz non-finite => d pinned at 0
            dz_dead = jnp.logical_not(jnp.isfinite(dzr) & jnp.isfinite(dzi))
            done = jnp.maximum(done, jnp.where((escf > 0.5) & dz_dead, 1.0, 0.0))
        zr_ref[:] = zr
        zi_ref[:] = zi
        esc_ref[:] = escf
        dzr_ref[:] = dzr
        dzi_ref[:] = dzi
        lzr_ref[:] = lzr
        lzi_ref[:] = lzi
        done_ref[:] = done
        return itf + 1.0

    def cond(itf):
        return jnp.logical_and(itf < jnp.float32(n_chunks), jnp.min(done_ref[:]) < 0.5)

    jax.lax.while_loop(cond, body, jnp.float32(0.0))

    esc = esc_ref[:] > 0.5
    lzr = lzr_ref[:]
    lzi = lzi_ref[:]
    dzr = dzr_ref[:]
    dzi = dzi_ref[:]
    az = jnp.sqrt(lzr * lzr + lzi * lzi)
    # final (possibly inf/nan) dz with the latched z, like de_field_tci
    pr = 2.0 * lzr * dzr - 2.0 * lzi * dzi
    pi_ = 2.0 * lzr * dzi + 2.0 * lzi * dzr
    den = jnp.maximum(jnp.sqrt(pr * pr + pi_ * pi_), jnp.float32(1e-12))
    # az >= escape_r where escaped, so log(max(az,1)) == log(az) there; the
    # max only protects the az == 0 lanes (never escaped), which output -1
    num = jnp.log(jnp.maximum(az, 1.0)) * az
    d = num / den
    d = jnp.where(jnp.isfinite(d), d, 0.0)
    out_ref[:] = jnp.where(esc, d, jnp.float32(-1.0))


_KERNELS = {
    "dwell": (_dwell_kernel, 3, False),
    "green": (_green_kernel, 3, True),
    "de": (_de_kernel, 9, True),
    "tci": (_tci_kernel, 8, True),
}


@functools.partial(
    jax.jit,
    static_argnames=("nx", "ny", "max_iter", "kind", "escape_r", "tile", "inner",
                     "interpret", "periodicity"),
)
def _field(params, nx, ny, max_iter, kind, escape_r, tile, inner, interpret,
           periodicity: bool = False):
    th, tw = tile
    kernel_fn, n_scratch, takes_r = _KERNELS[kind]
    kw = dict(max_iter=max_iter, inner=inner)
    if kind == "dwell" and periodicity:
        kw["periodicity"] = True
        n_scratch = 6
    if takes_r:
        kw["escape_r"] = escape_r
    return pl.pallas_call(
        functools.partial(kernel_fn, **kw),
        out_shape=jax.ShapeDtypeStruct((ny, nx), jnp.float32),
        grid=(ny // th, nx // tw),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((th, tw), jnp.float32) for _ in range(n_scratch)],
        interpret=interpret,
    )(params)


def mandelbrot_field_pallas(
    domain, nx: int, ny: int, max_iter: int = 500, kind: str = "dwell",
    escape_r: float = 4.0, tile: tuple = DEFAULT_TILE, inner: int = DEFAULT_INNER,
    periodicity: bool = False,
):
    """Field over an np.linspace-style grid (ny, nx), computed tile-by-tile.

    domain = (xmin, xmax, ymin, ymax); layout matches complex_grid()'s
    meshgrid(xs, ys, 'xy'). ny, nx must be tile multiples. "dwell" returns
    iteration counts as f32 (max_iter where not escaped).
    """
    th, tw = tile
    if ny % th or nx % tw:
        raise ValueError(f"grid ({ny}x{nx}) must be a multiple of tile {tile}")
    if kind not in _KERNELS:
        raise ValueError(f"unknown kind '{kind}'")
    xmin, xmax, ymin, ymax = domain
    dx = (xmax - xmin) / (nx - 1)
    dy = (ymax - ymin) / (ny - 1)
    interpret = jax.default_backend() not in ("tpu", "axon")
    # trace under x64-disabled: Mosaic rejects 64-bit scalars from x64 mode
    with jax.enable_x64(False):
        params = jnp.asarray([xmin, ymin, dx, dy], dtype=jnp.float32)
        return _field(params, nx, ny, max_iter, kind, escape_r, (th, tw), inner,
                      interpret, periodicity)


def _bucket_shape(grid_n: int, tile: tuple):
    """Padded (ny, nx): tile multiples rounded up to the next power of two,
    so the tracker's growing grids share one compiled executable."""
    th, tw = tile
    ny = ((grid_n + th - 1) // th) * th
    nx = ((grid_n + tw - 1) // tw) * tw
    ny = max(th, 1 << (ny - 1).bit_length())
    nx = max(tw, 1 << (nx - 1).bit_length())
    ny = ((ny + th - 1) // th) * th  # re-align if tile isn't a power of 2
    nx = ((nx + tw - 1) // tw) * tw
    return ny, nx


def tci_de_field_pallas(domain, grid_n: int, max_iter: int = 250,
                        escape_r: float = 250.0, tile: tuple = DEFAULT_TILE,
                        inner: int = DEFAULT_INNER, bucket: bool = True):
    """(esc, d) of the TCI DE over a grid_n x grid_n np.linspace-style grid.

    The tracker's grid kernel (tci_construct_mandelbrot_v002_fixed.py:35-47)
    as a Pallas head: pads to tile multiples at the same spacing and crops
    (the first grid_n rows/columns have identical coordinates). Returns
    (esc bool, d float32) device arrays.

    bucket=True rounds the padded shape up to the next power of two, so the
    tracker's growing grids (600/690/793/912) share ONE compiled kernel
    across stages instead of four Mosaic compiles — the padding pixels are
    nearly free (far-field tiles exit after one chunk).
    """
    th, tw = tile
    if bucket:
        ny, nx = _bucket_shape(grid_n, tile)
    else:
        ny = ((grid_n + th - 1) // th) * th
        nx = ((grid_n + tw - 1) // tw) * tw
    xmin, xmax, ymin, ymax = domain
    dx = (xmax - xmin) / (grid_n - 1)
    dy = (ymax - ymin) / (grid_n - 1)
    interpret = jax.default_backend() not in ("tpu", "axon")
    with jax.enable_x64(False):
        params = jnp.asarray([xmin, ymin, dx, dy], dtype=jnp.float32)
        out = _field(params, nx, ny, max_iter, "tci", escape_r, (th, tw), inner,
                     interpret)
    out = out[:grid_n, :grid_n]
    return out >= 0.0, jnp.maximum(out, 0.0)


def _tci_selection_core(params, grid_n, nx, ny, max_iter, escape_r, tile,
                        inner, interpret):
    """Device boundary-band selection on the PADDED bucket grid (traced).

    esc & (d <= q25(d[esc & in-grid])) with grid_n a traced scalar, so the
    tracker's growing grids share ONE compiled executable (the padded bucket
    shape is constant). Quantile = numpy's linear interpolation on sorted
    masked values.
    """
    out = _field(params, nx, ny, max_iter, "tci", escape_r, tile, inner, interpret)
    esc = out >= 0.0
    d = jnp.maximum(out, 0.0)
    valid = (jnp.arange(ny)[:, None] < grid_n) & (jnp.arange(nx)[None, :] < grid_n)
    escv = esc & valid
    df = d.reshape(-1)
    v = jnp.sort(jnp.where(escv.reshape(-1), df, jnp.inf))
    cnt = jnp.sum(escv)
    pos = 0.25 * (cnt - 1).astype(df.dtype)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, None)
    hi = jnp.clip(jnp.ceil(pos).astype(jnp.int32), 0, None)
    frac = pos - lo.astype(df.dtype)
    q = v[lo] * (1.0 - frac) + v[hi] * frac
    return escv & (d <= q), cnt, q


@functools.partial(jax.jit, static_argnames=("nx", "ny", "max_iter", "escape_r",
                                              "tile", "inner", "interpret"))
def _tci_selection_padded(params, grid_n, nx, ny, max_iter, escape_r, tile,
                          inner, interpret):
    """Selection-mask variant: a grid-sized bool mask crosses the host link."""
    return _tci_selection_core(params, grid_n, nx, ny, max_iter, escape_r,
                               tile, inner, interpret)


@functools.partial(jax.jit, static_argnames=("n_samples", "nx", "ny",
                                              "max_iter", "escape_r", "tile",
                                              "inner", "interpret"))
def _tci_sample_padded(params, grid_n, key, n_samples, nx, ny, max_iter,
                       escape_r, tile, inner, interpret):
    """Sample-fetch variant: Gumbel top-k over the band ON DEVICE, so only
    n_samples int32 indices (plus two scalars) cross the host link instead
    of the grid-sized bool mask — the tracker's per-stage relay transfer is
    O(n_samples), not O(grid_n^2) (NOTES r2 item 3 / VERDICT r2 item 5).

    Gumbel top-k over the band mask is a uniform subsample without
    replacement (the jit analogue of the reference's rng.choice,
    tci_construct_mandelbrot_v002_fixed.py:56-59). Returns ONE packed int32
    array [n_band, n_escaped, idx...] so the host retrieves everything in a
    single relay roundtrip (three separate fetches cost 3 RPCs/stage): idx
    indexes the flattened PADDED (ny, nx) grid; entries past n_band are
    garbage lanes of -inf score — callers truncate to min(n_samples,
    n_band), matching the reference's keep-all-when-small.
    """
    sel, cnt, _ = _tci_selection_core(params, grid_n, nx, ny, max_iter,
                                      escape_r, tile, inner, interpret)
    selv = sel.reshape(-1)
    g = jax.random.gumbel(key, selv.shape, dtype=jnp.float32)
    score = jnp.where(selv, g, -jnp.inf)
    _, idx = jax.lax.top_k(score, n_samples)
    head = jnp.stack([jnp.sum(selv).astype(jnp.int32), cnt.astype(jnp.int32)])
    return jnp.concatenate([head, idx.astype(jnp.int32)])


def tci_boundary_sample(domain, grid_n: int, n_samples: int, seed: int,
                        max_iter: int = 250, escape_r: float = 250.0,
                        tile: tuple = DEFAULT_TILE, inner: int = DEFAULT_INNER):
    """Host wrapper: boundary-band subsample with O(n_samples) host transfer.

    The quantile band AND the uniform without-replacement subsample run on
    device (_tci_sample_padded); the host fetches n_samples int32 indices
    and maps them to complex points on the reference's np.linspace grid.
    Raises like the host path when no pixel escapes. Returns complex (m,)
    with m = min(n_samples, band size).
    """
    th, tw = tile
    ny, nx = _bucket_shape(grid_n, tile)
    xmin, xmax, ymin, ymax = domain
    dx = (xmax - xmin) / (grid_n - 1)
    dy = (ymax - ymin) / (grid_n - 1)
    interpret = jax.default_backend() not in ("tpu", "axon")
    with jax.enable_x64(False):
        params = jnp.asarray([xmin, ymin, dx, dy], dtype=jnp.float32)
        key = jax.random.key(seed)
        packed = _tci_sample_padded(
            params, jnp.int32(grid_n), key, n_samples, nx, ny, max_iter,
            escape_r, (th, tw), inner, interpret)
    from cmtci.utils.artifacts import fetch

    packed = fetch(packed)  # one roundtrip: [n_band, n_escaped, idx...]
    n_band, cnt = int(packed[0]), int(packed[1])
    if cnt == 0:
        raise RuntimeError("No escape points")
    take = min(n_samples, n_band)
    idx = packed[2 : 2 + take]
    xs = np.linspace(domain[0], domain[1], grid_n)
    ys = np.linspace(domain[2], domain[3], grid_n)
    return xs[idx % nx] + 1j * ys[idx // nx]


def tci_boundary_selection(domain, grid_n: int, max_iter: int = 250,
                           escape_r: float = 250.0, tile: tuple = DEFAULT_TILE,
                           inner: int = DEFAULT_INNER):
    """Host wrapper: (sel bool (grid_n, grid_n), n_escaped) for the TCI
    boundary sampler, computed fully on device.

    Reference semantics: escaped & d <= 25%-quantile of d over escaped
    pixels (tci_construct_mandelbrot_v002_fixed.py:49-55)."""
    th, tw = tile
    ny, nx = _bucket_shape(grid_n, tile)
    xmin, xmax, ymin, ymax = domain
    dx = (xmax - xmin) / (grid_n - 1)
    dy = (ymax - ymin) / (grid_n - 1)
    interpret = jax.default_backend() not in ("tpu", "axon")
    with jax.enable_x64(False):
        params = jnp.asarray([xmin, ymin, dx, dy], dtype=jnp.float32)
        sel, cnt, _ = _tci_selection_padded(params, jnp.int32(grid_n), nx, ny,
                                            max_iter, escape_r, (th, tw), inner,
                                            interpret)
    from cmtci.utils.artifacts import fetch

    return fetch(sel)[:grid_n, :grid_n], int(cnt)


# ---------------------------------------------------------------------------
# f32 TPU Green potential for point CLOUDS (the equipotential pipeline's hot
# kernel, lucas_equipotential_test_v3.py:124-162). Unlike the grid heads the
# coordinates are INPUT point tiles, the orbit state is resumable (host
# compaction staging drops escaped points between stages), and the outputs
# are the UNSCALED escape records (k, z_at_escape): the 2^-k scaling to
# g = log|z_k|*2^-k happens on host in f64, so deep escapers with
# k in (126, 1074] — whose g underflows f32 but not f64 — keep the exact
# f64-path magnitude semantics. What changes vs the f64 path is only the
# trajectory arithmetic (f32), a realization difference like the tracker's
# f32 DE head.
# ---------------------------------------------------------------------------


def _cloud_green_kernel(cr_ref, ci_ref, zr0_ref, zi0_ref,
                        k_ref, zer_ref, zei_ref, zr_ref, zi_ref, act_ref, *,
                        iters: int, inner: int, escape_r: float):
    """One staging chunk of `iters` Green iterations on a point tile.

    k output is RELATIVE to this stage's start, 1-based at first
    |z| > escape_r (0 = did not escape this stage); zer/zei latch z at that
    iteration. Analytically-interior points (c in cardioid/period-2 bulb —
    a property of c alone, valid for resumed states too) start inactive so
    interior-heavy tiles exit after one chunk; escaped lanes keep iterating
    to inf/nan harmlessly (act latches them out of the hit predicate).
    """
    th, tw = k_ref.shape
    cr = cr_ref[:]
    ci = ci_ref[:]
    zero = jnp.zeros((th, tw), jnp.float32)
    zr_ref[:] = zr0_ref[:]
    zi_ref[:] = zi0_ref[:]
    act_ref[:] = jnp.where(_interior_mask(cr, ci), 0.0, 1.0)
    k_ref[:] = zero
    zer_ref[:] = zero
    zei_ref[:] = zero
    r2 = jnp.float32(escape_r * escape_r)
    n_chunks = (iters + inner - 1) // inner

    def body(itf):
        zr = zr_ref[:]
        zi = zi_ref[:]
        act = act_ref[:]
        kk = k_ref[:]
        zer = zer_ref[:]
        zei = zei_ref[:]
        base = itf * jnp.float32(inner)
        for n in range(inner):
            sv = (base + jnp.float32(n)) < jnp.float32(iters)
            nzr, nzi = zr * zr - zi * zi + cr, 2.0 * zr * zi + ci
            zr = jnp.where(sv, nzr, zr)
            zi = jnp.where(sv, nzi, zi)
            a2 = zr * zr + zi * zi
            hit = (a2 > r2) & (act > 0.5) & sv  # inf -> True; act latches
            kk = jnp.where(hit, base + jnp.float32(n + 1), kk)
            zer = jnp.where(hit, zr, zer)
            zei = jnp.where(hit, zi, zei)
            act = act * jnp.where(hit, 0.0, 1.0)
        zr_ref[:] = zr
        zi_ref[:] = zi
        act_ref[:] = act
        k_ref[:] = kk
        zer_ref[:] = zer
        zei_ref[:] = zei
        return itf + 1.0

    def cond(itf):
        return jnp.logical_and(itf < jnp.float32(n_chunks),
                               jnp.max(act_ref[:]) > 0.5)

    jax.lax.while_loop(cond, body, jnp.float32(0.0))


@functools.partial(jax.jit, static_argnames=("iters", "escape_r", "tile",
                                             "inner", "interpret"))
def _cloud_green(cr, ci, zr0, zi0, iters, escape_r, tile, inner, interpret):
    th, tw = tile
    ny, nx = cr.shape
    spec = pl.BlockSpec((th, tw), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_cloud_green_kernel, iters=iters, inner=inner,
                          escape_r=escape_r),
        out_shape=tuple(jax.ShapeDtypeStruct((ny, nx), jnp.float32)
                        for _ in range(5)),
        grid=(ny // th, nx // tw),
        in_specs=[spec] * 4,
        out_specs=(spec,) * 5,
        scratch_shapes=[pltpu.VMEM((th, tw), jnp.float32)],
        interpret=interpret,
    )(cr, ci, zr0, zi0)


@jax.jit
def _stack_outputs(arrs):
    """Pack same-shape f32 outputs for a single host fetch (bit-preserving)."""
    return jnp.stack(arrs)


def green_cloud_f32(points, max_iter: int = 20000, escape_r: float = 2.0,
                    stage_iters: int | None = None, tile: tuple = (8, 128),
                    inner: int = DEFAULT_INNER):
    """(g, k, phi) of a complex cloud via the f32 TPU head.

    Drop-in for kernels.mandelbrot.green_potential_compacted (identical
    output conventions: g = max(log|z_k| * 2^-k, 0) at first escape else 0,
    k = max_iter where never escaped, phi = exp(2^-k log z_k) else nan) with
    the trajectory run in f32 on the device. The g/phi magnitudes are
    computed on HOST in f64 from the unscaled (k, z_k) records, so the
    f32-underflow region k in (126, 1074] keeps its tiny-but-positive g
    exactly like the f64 path.

    stage_iters=None (default) runs the whole budget in ONE kernel launch:
    unlike the f64 host path, per-tile early exit makes host compaction
    redundant on the TPU, and each staging round trip costs relay latency —
    measured 0.154 s single-launch vs 0.873 s at stage_iters=2048 for the
    20k-point / max_iter=20000 equipotential cloud (results identical: the
    staged resume replays the exact same f32 op sequence). Pass a smaller
    stage_iters to bound per-launch device time; escaped points are then
    compacted away between stages with O(survivors) host transfer.
    """
    stage_iters = max_iter if stage_iters is None else stage_iters
    from cmtci.utils.artifacts import fetch

    th, tw = tile
    per = th * tw
    pts = np.asarray(points, dtype=complex).ravel()
    n = pts.size
    g = np.zeros(n)
    kk = np.full(n, max_iter, dtype=np.int32)
    phi = np.full(n, np.nan + 1j * np.nan, dtype=complex)
    # analytically-interior points can never escape: their final record
    # (g = 0, k = max_iter, phi = nan) is known up front, so drop them from
    # the staging loop entirely — without this, the per-n dominant roots
    # scattered through the cloud would pin their tiles to the full budget.
    # (exact f64 cardioid/bulb inequalities, NO margin — boundary points are
    # in M, and a point misclassified interior by f64 rounding sits within
    # ~1e-14 of the boundary, whose escape time ~1e7 iterations exceeds any
    # configured max_iter, so the iterated path would return the identical
    # non-escape record)
    xr, xi = pts.real, pts.imag
    q = (xr - 0.25) ** 2 + xi * xi
    interior = (q * (q + (xr - 0.25)) <= 0.25 * xi * xi) | (
        (xr + 1.0) ** 2 + xi * xi <= 0.0625)
    idx = np.arange(n)[~interior]
    cr_h = pts.real[~interior].astype(np.float32)
    ci_h = pts.imag[~interior].astype(np.float32)
    zr_h = np.zeros(len(idx), np.float32)
    zi_h = np.zeros(len(idx), np.float32)
    interpret = jax.default_backend() not in ("tpu", "axon")
    k0 = 0
    while k0 < max_iter and len(idx):
        iters = min(stage_iters, max_iter - k0)
        m = len(idx)
        # power-of-two tile-count buckets share compiled executables as the
        # survivor set shrinks; c = 0 padding lanes are analytically interior
        ntiles = 1 << max(0, int(np.ceil(np.log2(max(
            (m + per - 1) // per, 1)))))
        npad = ntiles * per

        def _pad(a):
            return jnp.asarray(np.pad(a, (0, npad - m)).reshape(ntiles * th, tw))

        final = iters >= max_iter - k0
        with jax.enable_x64(False):
            out = _cloud_green(_pad(cr_h), _pad(ci_h), _pad(zr_h), _pad(zi_h),
                               iters, escape_r, (th, tw), inner, interpret)
            # ONE packed fetch per stage: every per-array fetch is a relay
            # roundtrip, and the final stage doesn't need the survivor state
            # (out[3:5]) at all — the five separate fetches were 5 roundtrips
            # + the whole padded (zr, zi) transfer wasted in the default
            # single-launch mode. All five outputs are f32; stacking cannot
            # change bits.
            packed = fetch(_stack_outputs(out[:3] if final else out))
        k_rel = packed[0].ravel()[:m].astype(np.float64)
        esc = k_rel > 0
        if esc.any():
            zer = packed[1].ravel()[:m][esc].astype(np.float64)
            zei = packed[2].ravel()[:m][esc].astype(np.float64)
            k_abs = k0 + k_rel[esc]
            scale = np.exp2(-k_abs)  # f64: no underflow until k > 1074
            logr = 0.5 * np.log(np.maximum(zer * zer + zei * zei, 1e-300))
            gg = logr * scale
            hit_idx = idx[esc]
            g[hit_idx] = np.where(np.isfinite(gg) & (gg >= 0.0), gg, 0.0)
            kk[hit_idx] = k_abs.astype(np.int32)
            phi[hit_idx] = (np.exp(logr * scale)
                            * np.exp(1j * np.arctan2(zei, zer) * scale))
            keep = ~esc
            idx = idx[keep]
            cr_h, ci_h = cr_h[keep], ci_h[keep]
            if not final:
                zr_h = packed[3].ravel()[:m][keep]
                zi_h = packed[4].ravel()[:m][keep]
        elif not final:
            zr_h = packed[3].ravel()[:m]
            zi_h = packed[4].ravel()[:m]
        k0 += iters
    return g, kk, phi


# ---------------------------------------------------------------------------
# Mariani–Silver-style two-pass dwell field (opt-in). The classic algorithm
# recursively fills rectangles whose border has uniform dwell (exact for the
# TRUE dwell by simple-connectivity of the {dwell >= v} sets); the TPU
# restructuring below replaces the recursion with one cheap coarse pass and
# a per-tile fill decision, so the fine pass skips entire tiles. The fill
# criterion (coarse-sample uniformity over the tile + a one-sample halo) is
# HEURISTIC at pixel resolution — a sub-stride dwell sliver can thread
# between samples — hence the opt-in gate and the exactness regression in
# tests/test_pallas_kernel.py. Reference semantics being accelerated:
# mandelbrot_boundary_sample.py:22-39.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("nx", "ny", "max_iter", "tile",
                                             "inner", "interpret"))
def _dwell_ms(params, fill, nx, ny, max_iter, tile, inner, interpret):
    th, tw = tile
    return pl.pallas_call(
        functools.partial(_dwell_kernel, max_iter=max_iter, inner=inner,
                          ms=True),
        out_shape=jax.ShapeDtypeStruct((ny, nx), jnp.float32),
        grid=(ny // th, nx // tw),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((th, tw), jnp.float32) for _ in range(3)],
        interpret=interpret,
    )(params, fill)


def dwell_field_ms(domain, nx: int, ny: int, max_iter: int = 500,
                   stride: int = 8, tile: tuple = DEFAULT_TILE,
                   inner: int = DEFAULT_INNER):
    """Dwell field with Mariani–Silver-style tile fills. Returns (out, stats).

    Pass 1 computes the dwell at every `stride`-th pixel (the coarse grid
    shares the fine grid's spacing, so its samples ARE fine pixels). A fine
    (th, tw) tile is filled with value v iff every coarse sample on the
    tile plus a one-sample halo equals v — deep-interior and wide far-field
    band tiles then skip their entire fine while_loop. Grid-edge tiles
    (no halo) always compute. stats = {"filled": tiles filled, "tiles": total,
    "coarse_px": coarse pass pixels}.
    """
    from cmtci.utils.artifacts import fetch

    th, tw = tile
    if th % stride or tw % stride:
        raise ValueError(f"stride {stride} must divide the tile {tile}")
    if ny % (th * stride) or nx % (tw * stride):
        raise ValueError(f"(ny, nx) = {(ny, nx)} must be a multiple of "
                         f"tile*stride = {(th * stride, tw * stride)}")
    n_fill = (ny // th) * (nx // tw)
    if n_fill > 16384:
        # the fill flags live wholesale in SMEM (one f32 per tile); a
        # too-large array would fail the Mosaic compile on device — and a
        # crashed TPU compile can wedge the remote-compile relay for ~10
        # minutes (CLAUDE.md) — so refuse loudly up front
        raise ValueError(f"{n_fill} tiles exceeds the 16384-tile SMEM budget "
                         f"for the fill flags; use a larger tile or stride")
    xmin, xmax, ymin, ymax = domain
    dx = (xmax - xmin) / (nx - 1)
    dy = (ymax - ymin) / (ny - 1)
    cyn, cxn = ny // stride, nx // stride
    interpret = jax.default_backend() not in ("tpu", "axon")
    with jax.enable_x64(False):
        pc = jnp.asarray([xmin, ymin, dx * stride, dy * stride], jnp.float32)
        ch = fetch(_field(pc, cxn, cyn, max_iter, "dwell", 4.0, tile, inner,
                          interpret))
    n_ty, n_tx = ny // th, nx // tw
    rs, cs = th // stride, tw // stride
    fill = np.full((n_ty, n_tx), -1.0, np.float32)
    for ti in range(n_ty):
        r0, r1 = ti * rs, (ti + 1) * rs
        if r0 == 0 or r1 + 1 > cyn:
            continue
        for tj in range(n_tx):
            c0, c1 = tj * cs, (tj + 1) * cs
            if c0 == 0 or c1 + 1 > cxn:
                continue
            w = ch[r0 - 1 : r1 + 1, c0 - 1 : c1 + 1]
            v = w.flat[0]
            if (w == v).all():
                fill[ti, tj] = v
    with jax.enable_x64(False):
        p = jnp.asarray([xmin, ymin, dx, dy], jnp.float32)
        out = _dwell_ms(p, jnp.asarray(fill.ravel()), nx, ny, max_iter,
                        (th, tw), inner, interpret)
    stats = {"filled": int((fill >= 0).sum()), "tiles": n_ty * n_tx,
             "coarse_px": cyn * cxn}
    return out, stats
