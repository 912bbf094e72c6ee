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
