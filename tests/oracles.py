"""Faithful numpy re-executions of reference escape-loop semantics.

These are test oracles written from the behavioral spec in SURVEY.md §2.1
(citing the reference file:line); they intentionally mirror numpy op order /
IEEE overflow behavior so cmtci kernels can be checked for exact parity.
"""

import numpy as np


def dwell_grid_np(cr, ci, max_iter):
    # mandelbrot_boundary_sample.py:22-39 semantics
    c = cr + 1j * ci
    z = np.zeros_like(c)
    dwell = np.full(c.shape, max_iter, dtype=np.int32)
    esc = np.zeros(c.shape, dtype=bool)
    for n in range(max_iter):
        z = z * z + c
        hit = (z.real * z.real + z.imag * z.imag > 4.0) & ~esc
        dwell[hit] = n
        esc |= hit
        z[esc] = 0.0  # freeze, same as kernel; dwell already latched
    return dwell


def de_tci_np(c, max_iter=250, escape_r=250.0, eps=1e-12):
    # tci_construct_mandelbrot_v002_fixed.py:35-47 semantics
    z = np.zeros_like(c)
    dz = np.ones_like(c)
    esc = np.zeros(c.shape, bool)
    last = np.zeros_like(c)
    with np.errstate(over="ignore", invalid="ignore"):
        for _ in range(max_iter):
            dz = 2 * z * dz + 1
            z = z * z + c
            mask = (np.abs(z) > escape_r) & (~esc)
            esc |= mask
            last[mask] = z[mask]
    d = np.zeros(c.shape)
    m = esc
    z_, dz_ = last[m], dz[m]
    with np.errstate(over="ignore", invalid="ignore"):
        d[m] = np.log(np.abs(z_)) * np.abs(z_) / np.maximum(np.abs(2 * z_ * dz_), eps)
    return esc, np.nan_to_num(d, nan=0.0, posinf=0.0, neginf=0.0)


def de_std_np(c, max_iter=500, escape_r=4.0, eps=1e-14):
    # variograms_construct_mandelbrot.py:61-88 semantics
    z = np.zeros_like(c)
    dz = np.ones_like(c)
    esc = np.zeros(c.shape, dtype=bool)
    last_z = np.zeros_like(c)
    last_dz = np.ones_like(c)
    for _ in range(max_iter):
        dz = 2.0 * z * dz + 1.0
        z = z * z + c
        mask = (~esc) & (np.abs(z) > escape_r)
        esc |= mask
        last_z[mask] = z[mask]
        last_dz[mask] = dz[mask]
        z[esc] = 0.0
        dz[esc] = 1.0  # freeze, matches kernel; latched values already stored
    dist = np.zeros(c.shape, dtype=float)
    m = esc
    z_, dz_ = last_z[m], last_dz[m]
    num = np.log(np.maximum(np.abs(z_), 1.0)) * np.abs(z_)
    den = np.maximum(np.abs(2.0 * z_ * dz_), eps)
    dist[m] = np.nan_to_num(num / den, nan=0.0, posinf=0.0, neginf=0.0)
    return esc, dist


def green_np(c_flat, max_iter=2000, escape_r=2.0):
    # lucas_equipotential_test_v3.py:124-162 semantics (scalar loop)
    g = np.empty(len(c_flat))
    it = np.empty(len(c_flat), dtype=int)
    phi = np.empty(len(c_flat), dtype=np.complex128)
    r2 = escape_r * escape_r
    for idx, c in enumerate(c_flat):
        z = 0.0 + 0.0j
        gv, kv, pv = 0.0, max_iter, np.nan + 1j * np.nan
        for k in range(1, max_iter + 1):
            z = z * z + c
            if (z.real * z.real + z.imag * z.imag) > r2:
                log_phi = np.log(z) * np.exp2(-k)
                gv = float(log_phi.real)
                pv = np.exp(log_phi)
                if (not np.isfinite(gv)) or gv < 0:
                    gv = 0.0
                kv = k
                break
        g[idx], it[idx], phi[idx] = gv, kv, pv
    return g, it, phi


def escape_potential_2pn_np(c, max_iter=500, escape_r=4.0):
    # variograms_construct_mandelbrot.py:148-166
    z = np.zeros_like(c)
    g = np.zeros(c.shape, dtype=float)
    esc = np.zeros(c.shape, dtype=bool)
    for n in range(1, max_iter + 1):
        z = z * z + c
        mask = (~esc) & (np.abs(z) > escape_r)
        if np.any(mask):
            g[mask] = np.log(np.abs(z[mask])) / (2.0**n)
            esc[mask] = True
        z[esc] = 0.0
    return g


def escape_potential_kbreak_np(c, max_iter=200, escape_r=10.0):
    # Potentials.py:32-47 (scalar loop with break)
    out = np.zeros(c.shape, dtype=float)
    it = np.nditer(c, flags=["multi_index"])
    for cv in it:
        z = 0 + 0j
        k = 0
        for k in range(max_iter):
            z = z * z + cv
            if abs(z) > escape_r:
                break
        if abs(z) > 0:
            out[it.multi_index] = np.log(abs(z)) / (2**k)
    return out


def escape_potential_kp1_np(c, max_iter=200, escape_r=2.0):
    # Laplacian_C-M.py:27-43
    out = np.zeros(c.shape, dtype=float)
    it = np.nditer(c, flags=["multi_index"])
    for cv in it:
        z = 0 + 0j
        for k in range(max_iter):
            z = z * z + cv
            if abs(z) > escape_r:
                out[it.multi_index] = np.log(abs(z)) / (k + 1)
                break
    return out
