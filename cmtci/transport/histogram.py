"""2D histograms, mollification, and distribution distances (S9).

Reference behavior (reimplemented):
  * to_prob: histogram2d over a fixed domain, floor at eps, normalize —
    tci_construct_mandelbrot_v002_fixed.py:80-88
  * mollified_histogram: + scipy gaussian_filter(sigma_bins, mode="nearest"),
    re-floor, renormalize — gi_assumption_tracker_v3.py:109-125
  * KL with clip — tci_..._v002_fixed.py:86-88; TV = 0.5*sum|p-q|, overlap =
    sum min(p,q), fraction outside domain — gi_assumption_tracker_v3.py:93-106

histogram2d bin semantics match numpy exactly (edges = linspace(lo,hi,b+1),
values on interior edges go right, rightmost edge inclusive, out-of-range
values dropped); the scatter-add runs on-device via .at[].add.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("bins",))
def histogram2d(x, y, bins: int, domain):
    """np.histogram2d(x, y, bins=(b,b), range=domain-pairs) equivalent."""
    xmin, xmax, ymin, ymax = domain
    xedges = jnp.linspace(xmin, xmax, bins + 1)
    yedges = jnp.linspace(ymin, ymax, bins + 1)
    ix = jnp.searchsorted(xedges, x, side="right") - 1
    iy = jnp.searchsorted(yedges, y, side="right") - 1
    ix = jnp.where(x == xmax, bins - 1, ix)
    iy = jnp.where(y == ymax, bins - 1, iy)
    ok = (ix >= 0) & (ix < bins) & (iy >= 0) & (iy < bins)
    flat = jnp.where(ok, ix * bins + iy, bins * bins)
    h = jnp.zeros(bins * bins + 1, dtype=x.dtype).at[flat].add(1.0)
    return h[:-1].reshape(bins, bins)


def gaussian_kernel1d(sigma: float, truncate: float = 4.0):
    """scipy.ndimage gaussian kernel (order 0), host-side, exact weights."""
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / float(sigma)) ** 2)
    return k / k.sum()


@functools.partial(jax.jit, static_argnames=("radius",))
def _sep_correlate_nearest(h, kernel, radius: int):
    """Separable correlation with 'nearest' edge handling (both axes)."""
    def corr1(a):  # along axis 0
        ap = jnp.concatenate(
            [jnp.repeat(a[:1], radius, axis=0), a, jnp.repeat(a[-1:], radius, axis=0)], axis=0
        )
        n = a.shape[0]
        out = jnp.zeros_like(a)
        for t in range(2 * radius + 1):
            out = out + kernel[t] * jax.lax.dynamic_slice_in_dim(ap, t, n, axis=0)
        return out

    h = corr1(h)
    h = corr1(h.T).T
    return h


def gaussian_filter_nearest(h, sigma: float, truncate: float = 4.0):
    """scipy.ndimage.gaussian_filter(h, sigma, mode='nearest') equivalent.

    scipy correlates with the REVERSED kernel; a symmetric gaussian makes
    correlation == convolution, so a plain separable correlate matches.
    """
    kernel = jnp.asarray(gaussian_kernel1d(sigma, truncate))
    radius = (len(kernel) - 1) // 2
    return _sep_correlate_nearest(jnp.asarray(h), kernel, radius)


def to_prob(cloud, bins: int, domain, eps: float = 1e-12):
    """Probability histogram of a complex cloud (tci_..._v002_fixed.py:80-84)."""
    cloud = np.asarray(cloud)
    h = histogram2d(jnp.asarray(cloud.real), jnp.asarray(cloud.imag), bins, domain)
    h = jnp.maximum(h, eps)
    return h / h.sum()


def mollified_histogram(cloud, bins: int, domain, sigma_bins: float, eps: float = 1e-12,
                        mesh=None):
    """gi_assumption_tracker_v3.py:109-125 semantics.

    With a `mesh`, the scatter-add is point-sharded over the devices and
    psum-reduced (bitwise-identical: per-bin counts are small integers, so
    f64 addition is exact in any order); the mollifier runs replicated.
    """
    cloud = np.asarray(cloud)
    if mesh is not None:
        from cmtci.parallel.sharded import sharded_histogram

        n_dev = mesh.devices.size
        n = cloud.size
        npad = ((n + n_dev - 1) // n_dev) * n_dev
        xr = np.pad(cloud.real.ravel(), (0, npad - n), constant_values=domain[1] + 1.0)
        xi = np.pad(cloud.imag.ravel(), (0, npad - n), constant_values=domain[3] + 1.0)
        h = sharded_histogram(jnp.asarray(xr), jnp.asarray(xi), bins, domain, mesh)
    else:
        h = histogram2d(jnp.asarray(cloud.real), jnp.asarray(cloud.imag), bins, domain)
    h = jnp.maximum(h, eps)
    if sigma_bins and sigma_bins > 0:
        h = gaussian_filter_nearest(h, float(sigma_bins))
        h = jnp.maximum(h, eps)
    return h / h.sum()


def kl(p, x, eps: float = 1e-12):
    """KL(P||X) with clipping (tci_..._v002_fixed.py:86-88)."""
    p = jnp.clip(jnp.asarray(p), eps, None)
    x = jnp.clip(jnp.asarray(x), eps, None)
    return float(jnp.sum(p * (jnp.log(p) - jnp.log(x))))


def tv_distance(p, q) -> float:
    return 0.5 * float(jnp.sum(jnp.abs(jnp.asarray(p) - jnp.asarray(q))))


def overlap_mass(p, q) -> float:
    return float(jnp.sum(jnp.minimum(jnp.asarray(p), jnp.asarray(q))))


def pinsker_bound(delta: float) -> float:
    return math.sqrt(0.5 * float(delta))


def fraction_outside_domain(cloud, domain) -> float:
    xmin, xmax, ymin, ymax = domain
    cloud = np.asarray(cloud)
    x, y = cloud.real, cloud.imag
    inside = (x >= xmin) & (x <= xmax) & (y >= ymin) & (y <= ymax)
    return float(1.0 - np.mean(inside))
