"""Profiling / tracing utilities — the TPU replacement for the reference's
coarse cuda-synchronized timers (torch_utils.time_sync, evaler speed_result).

Wraps jax.profiler: `trace(logdir)` captures an xprof/perfetto-compatible
trace of everything inside the context (device compute, HBM transfers, host
callbacks); `annotate(name)` adds named regions. `model_flops` reports
compiled FLOPs/bytes via XLA cost analysis (replaces the reference's thop
FLOPs counter, torch_utils.py:97).
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable with xprof/tensorboard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def model_flops(fn, *example_args) -> dict:
    """Compiled-program cost analysis: flops, bytes accessed, peak memory."""
    compiled = jax.jit(fn).lower(*example_args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a per-computation list
        cost = cost[0]
    out = {k: cost.get(k) for k in ("flops", "bytes accessed")
           if cost and k in cost}
    try:
        mem = compiled.memory_analysis()
        out["peak_memory_bytes"] = getattr(mem, "temp_size_in_bytes", None)
    except Exception:  # noqa: BLE001 - backend-dependent API
        pass
    return out
