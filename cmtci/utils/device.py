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

    The one policy both device-backend stats stages share (embeddings
    Lanczos, multifractal count grid): dtype=None follows x64; f64 math
    pins to the host CPU (TPU f64 is emulated and f64 loop compiles are
    the documented relay wedge), f32 math runs on the default device with
    x64 tracing disabled (Mosaic aborts on 64-bit scalars)."""
    import jax.numpy as jnp

    dt = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    if dt == jnp.float64:
        return dt, analysis_cpu(), contextlib.nullcontext()
    return dt, contextlib.nullcontext(), jax.enable_x64(False)
