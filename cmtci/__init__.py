"""cmtci — TPU-native framework for the CM-TCI pipeline.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``aortizt/inverse-eigenvalue-loci-mandelbrot-correspondence``: inverse
eigenvalue clouds of generalized Lucas companion matrices, Mandelbrot
escape-time / distance-estimator / Green-function fields, boundary geometry,
spatial statistics, conformal uniformization, and the TCI/GI-flow
information-theoretic correspondence.

Design stance (see SURVEY.md §7): one installable library of pure functions
over arrays, everything jittable, fixed shapes + masks instead of boolean
indexing, complex numbers carried as (re, im) float64 pairs so the same code
runs on TPU (which has no complex128), host-CPU stages only for genuinely
data-dependent geometry (Delaunay), and CSV/JSON export only at the edges.
"""

from jax import config as _jax_config

# The analysis surfaces of the reference are float64 numpy; we match them.
# Perf-critical kernels opt into float32/bfloat16 explicitly.
_jax_config.update("jax_enable_x64", True)

__version__ = "0.1.0"
