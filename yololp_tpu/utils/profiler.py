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


# ---- trusted wall-clock timing over the axon tunnel -------------------------
#
# The tunnel serves repeat dispatches of identical (program, buffers) pairs
# from a replay path, and back-to-back async dispatch loops contend in its
# queue — both report impossible rates (a 165 ms train step "measured" at
# 21.9 ms; a bare conv at 25,749 "TFLOP/s" on a 197-peak chip). The only
# protocol that has matched end-to-end wall time on this setup:
#
#   * K data-dependent iterations inside ONE jitted program (a lax.scan whose
#     carry feeds each iteration's input), so no iteration can be elided or
#     replayed individually; and
#   * the timed dispatch runs on FRESH device buffers with permuted content,
#     so (program, buffers) differs from the warm-up dispatch.
#
# See CLAUDE.md "Micro-benchmarks on the tunnel" and tools/profile_train.py.


def fresh_operands(op):
    """Rebuild operands (arrays or pytrees of arrays) as NEW device buffers
    with permuted (but distribution-identical) content — defeats the tunnel
    replay cache."""
    import numpy as np

    def one(a):
        h = np.asarray(a)
        return jax.device_put(np.roll(h, 1, axis=0) if h.ndim else h)

    return tuple(jax.tree.map(one, jax.device_get(x)) for x in op)


def timed_scan(make_fn, iters, *op):
    """Per-iteration wall time of one jitted K-iteration chained-scan
    program; compile excluded (second dispatch timed, on fresh buffers)."""
    import time

    fn = jax.jit(make_fn)
    jax.block_until_ready(fn(*op))
    op2 = fresh_operands(op)
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*op2))
    return (time.perf_counter() - t0) / iters


def timed_scan_delta(make_fn_of_k, iters, *op):
    """Latency-free per-iteration time: wall(2K-iteration program) minus
    wall(K-iteration program), over K. Cancels the constant dispatch
    round-trip (≈50 ms over the axon tunnel), which dominates micro
    programs whose whole K-iteration compute is sub-millisecond.
    `make_fn_of_k(K)` must return the K-length chained-scan program.

    DEPRECATED for micro-rates on the tunnel: the fresh-buffer dispatch
    it times includes a multi-second, ±0.5 s-noisy host->device transfer
    of the rolled operands (tools/diag_scan_walls.py, r4e), which buries
    any sub-100 ms K-dependent signal. Use timed_scan_delta2."""
    t1 = timed_scan(make_fn_of_k(iters), iters, *op) * iters
    t2 = timed_scan(make_fn_of_k(2 * iters), 2 * iters, *op) * 2 * iters
    return max(t2 - t1, 1e-12) / iters


def timed_scan_delta2(make_fn_of_k, iters, *op, repeats=3):
    """Per-iteration time from SAME-BUFFER dispatches: median wall of the
    2K-iteration program minus median wall of the K-iteration program,
    over K.

    Rationale (tools/diag_scan_walls.py, r4e): repeat dispatches of an
    identical (program, buffers) pair measured stable, correctly
    K-scaling walls (no replay within a handful of repeats), while
    fresh-buffer dispatches carry a seconds-scale noisy transfer penalty
    that buries micro signals. The body must still be a data-dependent
    chain (lax.scan feeding each iteration from the carry) so no
    iteration can be elided inside the program.

    Replay guard: the tunnel HAS served whole-result replays for
    repeat-dispatched pairs in other regimes (a 165 ms train step
    "measured" at 21.9 ms). If that happened here both walls would
    collapse to the ~25 ms round-trip floor and stop scaling with K —
    raise rather than return a fiction."""
    import time

    import numpy as np

    def median_wall(fn):
        jax.block_until_ready(fn(*op))  # compile + warm
        walls = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*op))
            walls.append(time.perf_counter() - t0)
        return float(np.median(walls))

    t1 = median_wall(jax.jit(make_fn_of_k(iters)))
    t2 = median_wall(jax.jit(make_fn_of_k(2 * iters)))
    if t2 <= t1 * 1.05:
        raise RuntimeError(
            f"K->2K wall did not scale (K={iters}: {t1 * 1e3:.1f} ms, "
            f"2K: {t2 * 1e3:.1f} ms) — replay suspected or signal below "
            "round-trip jitter; increase iters")
    return (t2 - t1) / iters
