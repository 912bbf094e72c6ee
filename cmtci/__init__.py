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

import os as _os

from jax import config as _jax_config

# The analysis surfaces of the reference are float64 numpy; we match them.
# Perf-critical kernels opt into float32/bfloat16 explicitly.
_jax_config.update("jax_enable_x64", True)

def _machine_tag() -> str:
    """Short fingerprint of the host CPU feature set, for the cache path.

    XLA:CPU AOT executables embed the compiling machine's features and
    refuse to load on a host with a different set (cpu_aot_loader: "Machine
    type used for XLA:CPU compilation doesn't match the machine type for
    execution"), but the cache key does NOT include them — an entry written
    by a session on different hardware makes every later process on this
    host pay a failed AOT load + re-JIT for that executable, forever (the
    recompile never replaces the entry). Salting the default cache directory
    per feature-set gives each machine type its own healthy cache.
    """
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = line
                    break
    except OSError:
        pass
    return hashlib.sha256((platform.machine() + feats).encode()).hexdigest()[:10]


# Persistent compilation cache: the tracker's stage shapes grow run-over-run
# but repeat across runs, and XLA compiles (especially through the TPU
# remote-compile relay) dominate cold small-stage wall time. Opt out with
# CMTCI_NO_COMPILE_CACHE=1. CMTCI_COMPILE_CACHE overrides the path verbatim
# (no machine salt — an explicit path is the caller's responsibility).
if not _os.environ.get("CMTCI_NO_COMPILE_CACHE"):
    _jax_config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("CMTCI_COMPILE_CACHE",
                        _os.path.expanduser("~/.cache/cmtci_xla/" + _machine_tag())),
    )
    # persist even sub-second executables: the analysis pipelines compile
    # dozens of ~0.15 s kernels per process (e.g. the symmetry scan's 26),
    # which the default 1 s threshold silently recompiled on EVERY run
    _jax_config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

__version__ = "0.1.0"
