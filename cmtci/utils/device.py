"""Device-placement policy for mixed CPU/TPU execution.

On the TPU (v5e) float64 is software-emulated — catastrophically slow — and
f64 XLA while_loop graphs can wedge the remote-compile relay (CLAUDE.md).
The cmtci split is therefore: f32 throughput kernels (Pallas escape heads,
the blocked matcher) run on the TPU; exact f64 analysis math (Aberth
eigensolves, histograms, GI-flow, small reductions) runs on the always-
present host CPU backend. `analysis_cpu()` pins a block to the CPU only
when the session's default platform is a TPU, so pure-CPU runs see no
change at all.
"""

from __future__ import annotations

import contextlib

import jax

_TPU_BACKENDS = ("tpu", "axon")


def on_tpu() -> bool:
    return jax.default_backend() in _TPU_BACKENDS


def analysis_cpu():
    """Context manager: run enclosed f64 jax math on the host CPU backend."""
    if on_tpu():
        return jax.default_device(jax.devices("cpu")[0])
    return contextlib.nullcontext()


def analysis_dtype_ctx(dtype=None):
    """(dtype, device ctx, x64 ctx) for a dual-backend analysis stage.

    The one policy every device-backend stats stage shares (embeddings
    Lanczos, multifractal count grid, pair scans, symmetry NN): dtype=None
    is the HOST path at the ambient precision — pinned to the host CPU even
    when the caller runs with x64 disabled (e.g. inside the enable_x64(False)
    region CLAUDE.md mandates around Pallas wrappers), because the host
    heads use scatter-adds that serialize on TPU and an f32-ambient caller
    must not silently promote the O(n²) scans onto the accelerator past the
    device heads' int32 guards. Explicit f64 likewise pins to the host (TPU
    f64 is emulated and f64 loop compiles are the documented relay wedge);
    only an explicit f32 dtype runs on the default device, with x64 tracing
    disabled (Mosaic aborts on 64-bit scalars)."""
    import jax.numpy as jnp

    dt = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    if dtype is None or dt == jnp.float64:
        x64_ctx = (contextlib.nullcontext() if dt == jnp.float64
                   else jax.enable_x64(False))
        return dt, analysis_cpu(), x64_ctx
    return dt, contextlib.nullcontext(), jax.enable_x64(False)
