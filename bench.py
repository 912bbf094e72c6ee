#!/usr/bin/env python3
"""cmtci benchmark: escape-time grid throughput on the BASELINE config.

Config (BASELINE.json #1): res=2000, max_iter=500, domain (-2.1,0.9)x(-1.5,1.5)
— the reference's mandelbrot_boundary_sample.py hot loop.

Baseline: the reference's pure-Python per-pixel dwell loop measured on this
machine's CPU (2026-08-16, every-16th-pixel subsample of the same grid,
identical escape statistics): 0.0158 Mpix/s.

Timing: the TPU here sits behind an RPC relay with ~29 ms roundtrip, so the
kernel is executed in a data-dependent chain of REPS grids inside one jit
and timed end-to-end (conservative: includes one roundtrip + final
checksum fetch).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REFERENCE_CPU_MPIX_S = 0.0158  # measured; see module docstring

DOM = (-2.1, 0.9, -1.5, 1.5)
RES = 2000
MAX_ITER = 500
REPS = 50  # amortizes the ~30 ms relay roundtrip (device-side per-grid time is ~1.7 ms)


def main():
    """Try the TPU benchmark in a subprocess (the relay can wedge or take
    minutes to initialize); fall back to an in-process CPU measurement."""
    import subprocess
    import sys

    if "--_child" not in sys.argv:
        try:
            out = subprocess.run([sys.executable, __file__, "--_child"],
                                 timeout=1500, capture_output=True, text=True)
            for line in out.stdout.splitlines():
                if line.startswith("{"):
                    print(line)
                    return
        except subprocess.TimeoutExpired:
            pass
        _run(on_tpu=False)
        return
    _run(on_tpu=True)


def _run(on_tpu: bool):
    import jax

    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    import cmtci  # noqa: F401  (enables x64; perf path overrides locally)
    from cmtci.kernels.mandelbrot_pallas import (
        DEFAULT_INNER, DEFAULT_TILE, _field,
    )

    on_tpu = on_tpu and jax.default_backend() in ("tpu", "axon")

    # res=2000 is not a lane multiple; compute 2048 columns at the 2000-grid
    # spacing and crop (coordinates of the first 2000 columns are identical).
    nx_pad = 2048
    ny_pad = 2048
    dx = (DOM[1] - DOM[0]) / (RES - 1)
    dy = (DOM[3] - DOM[2]) / (RES - 1)

    with jax.enable_x64(False):
        params = jnp.asarray([DOM[0], DOM[2], dx, dy], dtype=jnp.float32)

        if on_tpu:
            def one(p):
                return _field(p, nx_pad, ny_pad, MAX_ITER, "dwell", 4.0,
                              DEFAULT_TILE, DEFAULT_INNER, False)
            reps = REPS
        else:
            # CPU fallback: XLA fori-loop dwell (interpreted Pallas would
            # take hours); one grid per chained call
            from cmtci.parallel.sharded import _dwell_local

            def one(p):
                cols = jnp.arange(nx_pad, dtype=jnp.float32)
                rows = jnp.arange(ny_pad, dtype=jnp.float32)
                cr = jnp.broadcast_to(p[0] + cols[None, :] * p[2], (ny_pad, nx_pad))
                ci = jnp.broadcast_to(p[1] + rows[:, None] * p[3], (ny_pad, nx_pad))
                return _dwell_local(cr, ci, MAX_ITER)
            reps = 1

        @jax.jit
        def chained(p):
            total = jnp.float32(0.0)
            for _ in range(reps):
                out = one(p)
                total = total + jnp.sum(out[:RES, :RES])
                p = p + jnp.float32(1e-12) * total / (jnp.abs(total) + 1.0)
            return total

        # warmup/compile
        float(chained(params))
        best = float("inf")
        for r in range(3):
            p = params + jnp.float32(1e-9 * (r + 1))
            t0 = time.time()
            float(chained(p))
            best = min(best, time.time() - t0)

    per_grid = best / reps
    mpix_s = RES * RES / per_grid / 1e6
    print(json.dumps({
        "metric": "escape_grid_res2000_mi500_throughput",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / REFERENCE_CPU_MPIX_S, 1),
    }))


if __name__ == "__main__":
    main()
