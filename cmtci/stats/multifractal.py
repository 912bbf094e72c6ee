"""Multifractal box-counting spectrum D(q), tau(q), f(alpha) (T12).

Reference: multifractal_phase6.py:41-122 — box partition via integer keys,
Z(q, eps) partition sums over a q grid excluding q=1, tau(q) = slope of
log Z vs log eps, D(q) = tau/(q-1), Legendre alpha = dtau/dq,
f(alpha) = q*alpha - tau. Box counting (np.unique grouping) is host-side
(data-dependent sizes); the Z/regression math is vectorized.
"""

from __future__ import annotations

from math import isclose

import numpy as np


def default_q_values():
    q = np.concatenate((np.linspace(-5, -1, 5), np.linspace(-0.8, 0.8, 9), np.linspace(1, 5, 5)))
    return np.array([v for v in q if not isclose(v, 1.0)])


def default_scales():
    return np.logspace(np.log10(0.002), np.log10(0.5), 12)


def box_counts(points, eps: float):
    """Counts per non-empty box of size eps (multifractal_phase6.py:41-56)."""
    pts = np.asarray(points, dtype=float)
    ix = np.floor((pts[:, 0] - pts[:, 0].min()) / eps).astype(np.int64)
    iy = np.floor((pts[:, 1] - pts[:, 1].min()) / eps).astype(np.int64)
    keys = ix * (10**9) + iy
    _, counts = np.unique(keys, return_counts=True)
    return counts


def multifractal_spectrum(points, q_values=None, scales=None, min_count_boxes: int = 5):
    """Full multifractal analysis; returns dict(q, tau, Dq, alpha, f_alpha, scales, Z)."""
    pts = np.asarray(points, dtype=float)
    if np.iscomplexobj(pts):
        pts = np.column_stack([pts.real.ravel(), pts.imag.ravel()])
    q_values = default_q_values() if q_values is None else np.asarray(q_values, dtype=float)
    scales = default_scales() if scales is None else np.asarray(scales, dtype=float)

    z = np.zeros((len(q_values), len(scales)))
    valid = np.zeros(len(scales), dtype=bool)
    for j, eps in enumerate(scales):
        counts = box_counts(pts, eps)
        if len(counts) < min_count_boxes:
            z[:, j] = np.nan
            continue
        valid[j] = True
        ps = counts / counts.sum()
        for i, q in enumerate(q_values):
            z[i, j] = ps.size if q == 0 else np.sum(ps**q)

    log_eps = np.log(scales[valid])
    tau = np.full(len(q_values), np.nan)
    dq = np.full(len(q_values), np.nan)
    for i, q in enumerate(q_values):
        y = np.log(z[i, valid])
        if np.any(np.isfinite(y)):
            a = np.vstack([log_eps, np.ones_like(log_eps)]).T
            m, _ = np.linalg.lstsq(a, y, rcond=None)[0]
            tau[i] = m
            dq[i] = m / (q - 1) if not isclose(q, 1.0) else np.nan

    alpha = np.gradient(tau, q_values, edge_order=2)
    f_alpha = q_values * alpha - tau
    return {"q": q_values, "tau": tau, "Dq": dq, "alpha": alpha,
            "f_alpha": f_alpha, "scales": scales, "Z": z}
