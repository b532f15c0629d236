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
# Hard-won protocol (r1-r4e; evidence in tools/diag_scan_walls.py and the
# probe replay incidents catalogued in CLAUDE.md):
#
#   1. block_until_ready over this tunnel is NOT a completion barrier in
#      every regime: walls of 0.0-0.5 ms have been observed for dispatches
#      whose device work is tens of ms (with the drained work then surfacing
#      in a LATER call's wall). The only event that provably postdates the
#      computation is FETCHING A VALUE that data-depends on it. Every timed
#      region must therefore end with a device_get of a small reduction of
#      the program's output.
#   2. The timed program runs K data-dependent iterations inside ONE jitted
#      lax.scan (the carry feeds each iteration), so no iteration can be
#      elided individually, and the constant round-trip amortizes over K
#      (or cancels exactly in the K/2K differencing of timed_scan_delta2).
#   3. The timed dispatch uses operand CONTENTS the server has not seen —
#      produced ON DEVICE by a jitted roll (host device_put transfers are
#      seconds-scale and noisy; they must never overlap a timed window).
#      Identical (program, operand) replays have reported 165 ms programs
#      at 21.9 ms and a conv at 25,749 "TFLOP/s" on a 197-peak chip.


def fresh_operands(op):
    """Rebuild operands (arrays or pytrees of arrays) as NEW device buffers
    with permuted (but distribution-identical) content — defeats the tunnel
    replay cache. DEPRECATED for timing use: the host->device transfer is
    seconds-scale and can land inside a subsequent timed window; prefer the
    on-device roll inside timed_scan/timed_scan_delta2."""
    import numpy as np

    def one(a):
        h = np.asarray(a)
        return jax.device_put(np.roll(h, 1, axis=0) if h.ndim else h)

    return tuple(jax.tree.map(one, jax.device_get(x)) for x in op)


def _tree_reduce_to_scalar(out):
    """f32 scalar data-depending on every array leaf of `out`."""
    import jax.numpy as jnp

    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    return sum(jnp.sum(x.astype(jnp.float32)) * 1e-9 for x in leaves)


def _fresh_rolled(op, shift):
    """Operands with never-seen contents, produced ON DEVICE: the first
    array leaf (ndim > 0) anywhere in the operand pytrees is rolled along
    axis 0 by `shift` (a jitted device op — no host transfer), making the
    (program, operands) pair new. The roll is drained by fetching one
    element. Rolling one leaf is numerically irrelevant for timing."""
    import numpy as np

    leaves, treedef = jax.tree.flatten(op)
    i = next((k for k, a in enumerate(leaves)
              if getattr(a, "ndim", 0) > 0), None)
    if i is None:
        return op
    rolled = _roll_jit()(leaves[i], shift)
    np.asarray(jax.jit(lambda a: a.reshape(-1)[:1])(rolled))  # drain
    leaves[i] = rolled
    return jax.tree.unflatten(treedef, leaves)


def _roll_jit():
    import jax.numpy as jnp

    global _ROLL_FN
    try:
        return _ROLL_FN
    except NameError:
        _ROLL_FN = jax.jit(lambda a, s: jnp.roll(a, s, axis=0))
        return _ROLL_FN


def _timed_value_fetch(fn, op):
    """Wall time of dispatch + fetch of a small output-dependent value —
    the only wall that provably covers the whole computation (see the
    protocol note above)."""
    import time

    import numpy as np

    t0 = time.perf_counter()
    out = fn(*op)
    float(np.asarray(out))  # value fetch: cannot complete early
    return time.perf_counter() - t0


_TS_SHIFT = [0]


def timed_scan(make_fn, iters, *op):
    """Per-iteration wall time of one jitted K-iteration chained-scan
    program; compile excluded. The timed dispatch runs on never-seen
    operand contents (on-device roll) and ends with a value fetch of a
    small reduction of the outputs."""
    fn = jax.jit(lambda *a: _tree_reduce_to_scalar(make_fn(*a)))
    _timed_value_fetch(fn, op)  # compile + full drain (fetch)
    _TS_SHIFT[0] += 1
    op2 = _fresh_rolled(op, _TS_SHIFT[0])
    return _timed_value_fetch(fn, op2) / iters


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
    """Per-iteration time: median wall of the 2K-iteration program minus
    median wall of the K-iteration program, over K.

    Encodes every rule from the module-level protocol note: value-fetch
    completion barrier (block_until_ready alone has returned 0.0-0.5 ms
    for tens-of-ms programs), on-device rolled operand contents per timed
    dispatch (host device_put is seconds-scale noisy; seen contents can
    replay), and a data-dependent scan body (no per-iteration elision).

    The K->2K scaling guard stays as a tripwire: if the walls do not
    scale, the result would be fiction — raise instead of returning it."""
    import numpy as np

    shift = [1000]  # disjoint from timed_scan's shifts

    def median_wall(make_fn):
        fn = jax.jit(lambda *a: _tree_reduce_to_scalar(make_fn(*a)))
        _timed_value_fetch(fn, op)  # compile + full drain (fetch)
        walls = []
        for _ in range(repeats):
            shift[0] += 1
            cur = _fresh_rolled(op, shift[0])
            walls.append(_timed_value_fetch(fn, cur))
        return float(np.median(walls))

    t1 = median_wall(make_fn_of_k(iters))
    t2 = median_wall(make_fn_of_k(2 * iters))
    if t2 <= t1 * 1.05:
        raise RuntimeError(
            f"K->2K wall did not scale (K={iters}: {t1 * 1e3:.1f} ms, "
            f"2K: {t2 * 1e3:.1f} ms) — replay suspected or signal below "
            "round-trip jitter; increase iters")
    return (t2 - t1) / iters
