"""Figure writers for the reference's visual-verification outputs (P7).

The reference emits PNG overlays from nearly every script (SURVEY §4.4);
these cover the recurring figure types: alignment overlays
(construct_stage1_clean.py:183-193, match_visual_pairs.py), KL descent
(tci_..._v002_fixed.py:159-163), curvature overlay/histogram
(boundary_curvature_localpoly.py:195-218), boundary correspondence
(lucas_to_cardioid_v40_reference.py:413-470), field panels (Potentials.py),
and variogram curves. All figures are optional edges — pipelines return
arrays; plotting never sits on the compute path.
"""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from cmtci.io.writers import ensure_dir  # noqa: E402


from cmtci.utils.arrays import as_xy as _xy  # shared (N,2) coercion


def plot_alignment(c, m, c_aligned, path, title="Construct vs Mandelbrot (aligned)"):
    c, m, ca = _xy(c), _xy(m), _xy(c_aligned)
    fig = plt.figure(figsize=(8, 6))
    if len(m):
        plt.scatter(m[:, 0], m[:, 1], s=6, c="red", label="Mandel sample")
    if len(c):
        plt.scatter(c[:, 0], c[:, 1], s=6, c="blue", alpha=0.6, label="Construct")
    if len(ca):
        plt.scatter(ca[:, 0], ca[:, 1], s=6, c="cyan", alpha=0.65, label="Construct aligned")
    plt.legend()
    plt.axis("equal")
    plt.title(title)
    fig.savefig(ensure_dir(path), dpi=200)
    plt.close(fig)
    return path


def plot_matches(c_aligned, m, matches, path, preserved_mask=None):
    """Match segments, optionally colored by a preservation mask."""
    ca, m = _xy(c_aligned), _xy(m)
    matches = np.asarray(matches, dtype=int)
    fig = plt.figure(figsize=(8, 6))
    plt.scatter(m[:, 0], m[:, 1], s=6, c="red", label="Mandel")
    plt.scatter(ca[:, 0], ca[:, 1], s=6, c="cyan", alpha=0.7, label="Construct aligned")
    for i in range(len(matches)):
        j = matches[i]
        color, lw, al = ("green", 0.4, 0.7)
        if preserved_mask is not None and not preserved_mask[i]:
            color, lw, al = ("gray", 0.2, 0.3)
        plt.plot([ca[i, 0], m[j, 0]], [ca[i, 1], m[j, 1]], color=color, linewidth=lw, alpha=al)
    plt.axis("equal")
    plt.legend()
    fig.savefig(ensure_dir(path), dpi=200)
    plt.close(fig)
    return path


def plot_kl_descent(kls, path, title="KL descent (TCI flow)"):
    fig = plt.figure()
    plt.plot(np.asarray(kls))
    plt.xlabel("t")
    plt.ylabel("D_KL")
    plt.title(title)
    plt.tight_layout()
    fig.savefig(ensure_dir(path), dpi=150)
    plt.close(fig)
    return path


def plot_field(field, domain, path, title="", cmap="viridis"):
    fig = plt.figure()
    plt.imshow(np.asarray(field), origin="lower",
               extent=[domain[0], domain[1], domain[2], domain[3]], cmap=cmap)
    plt.colorbar()
    plt.title(title)
    plt.tight_layout()
    fig.savefig(ensure_dir(path), dpi=150)
    plt.close(fig)
    return path


def plot_boundary_overlay(points, boundary, path, title=""):
    p, b = _xy(points), _xy(boundary)
    fig = plt.figure(figsize=(6, 6))
    plt.scatter(p[:, 0], p[:, 1], s=2, alpha=0.25)
    plt.plot(b[:, 0], b[:, 1], lw=1.0)
    plt.title(title)
    plt.axis("equal")
    plt.axis("off")
    plt.tight_layout()
    fig.savefig(ensure_dir(path), dpi=220)
    plt.close(fig)
    return path


def plot_curvature(p, kappa, prefix):
    """Histogram + color overlay (boundary_curvature_localpoly.py:195-218)."""
    p = _xy(p)
    fig = plt.figure(figsize=(6, 4))
    plt.hist(np.asarray(kappa), bins=64)
    plt.xlabel(r"Curvature $\kappa$")
    plt.ylabel("Count")
    plt.title("Local-Polynomial Curvature Histogram")
    plt.tight_layout()
    fig.savefig(ensure_dir(f"{prefix}_curvature_hist.png"), dpi=200)
    plt.close(fig)

    fig = plt.figure(figsize=(5, 5))
    sc = plt.scatter(p[:, 0], p[:, 1], c=np.asarray(kappa), s=8)
    plt.axis("equal")
    plt.axis("off")
    plt.colorbar(sc, fraction=0.046, pad=0.04)
    plt.title("Curvature Overlay (Local-Polynomial)")
    plt.tight_layout()
    fig.savefig(f"{prefix}_curvature_overlay.png", dpi=220)
    plt.close(fig)
    return f"{prefix}_curvature_hist.png", f"{prefix}_curvature_overlay.png"


def plot_boundary_correspondence(z_bdy, w_bdy, path, title=""):
    """t-colored boundary correspondence (v40:413-440)."""
    z = np.asarray(z_bdy, dtype=complex).ravel()
    w = np.asarray(w_bdy, dtype=complex).ravel()
    t = np.linspace(0.0, 1.0, len(z), endpoint=False)
    fig = plt.figure(figsize=(10, 4.5))
    ax1 = fig.add_subplot(1, 2, 1)
    ax2 = fig.add_subplot(1, 2, 2)
    ax1.scatter(z.real, z.imag, c=t, s=6, cmap="hsv")
    ax1.set_title("Domain boundary (t-colored)")
    ax1.set_aspect("equal", "box")
    ax2.scatter(w.real, w.imag, c=t, s=6, cmap="hsv")
    th = np.linspace(0, 2 * np.pi, 800, endpoint=False)
    ax2.plot(np.cos(th), np.sin(th), "-", linewidth=1)
    ax2.set_title("Mapped boundary in disk (same t)")
    ax2.set_aspect("equal", "box")
    fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(ensure_dir(path), dpi=220)
    plt.close(fig)
    return path


def plot_variograms(r, curves: dict, path, title="Semivariograms"):
    fig = plt.figure(figsize=(8, 5.5))
    for label, g in curves.items():
        plt.plot(np.asarray(r), np.asarray(g), "o-", label=label, markersize=3)
    plt.xlabel("lag distance r")
    plt.ylabel(r"$\hat{\gamma}(r)$")
    plt.title(title)
    plt.legend()
    plt.grid(True, alpha=0.3)
    plt.tight_layout()
    fig.savefig(ensure_dir(path), dpi=200)
    plt.close(fig)
    return path
