#!/usr/bin/env python3
"""Raw-wall diagnostic for the chained-scan timing protocol.

probe_mxu_v2 (r4e) reported a bare stage-2 conv at 1.2 bf16 TFLOP/s while
the full model forward runs 135 TFLOP/s under the SAME in-scan protocol —
something in timed_scan_delta does not cancel. This prints every raw wall
it differences, for one conv geometry, so the non-cancelling term is
visible directly:

  for K in (20, 40):
    compile+warmup wall, repeat-same-buffers wall x3, fresh-buffers wall x3
  plus an empty-body scan at both K (pure per-iteration loop overhead)
  plus device_put wall for the operand set (transfer cost, measured alone)
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def main(argv=None):
    p = argparse.ArgumentParser("scan-wall diagnostic")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--size", type=int, default=80)
    p.add_argument("--chan", type=int, default=128)
    p.add_argument("--device", default=None, choices=["cpu", "tpu"])
    args = p.parse_args(argv)
    if args.device == "cpu":
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from yololp_tpu.utils.profiler import fresh_operands

    B, S, C = args.batch, args.size, args.chan
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((B, S, S, C)) * 0.1, jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.01, jnp.bfloat16)
    flops = 2 * B * S * S * C * C * 9

    def make_conv(k):
        def run(x0, w):
            def body(x, _):
                y = lax.conv_general_dilated(
                    x, w, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
                return (y * jnp.float32(1e-2)).astype(jnp.bfloat16), ()
            return lax.scan(body, x0, None, length=k)[0]
        return run

    def make_empty(k):
        def run(x0, w):
            def body(x, _):
                return x, ()
            return lax.scan(body, x0, None, length=k)[0] + w[0, 0, 0, 0]
        return run

    out = {"B": B, "S": S, "C": C, "conv_gflop_per_iter": flops / 1e9}

    t0 = time.perf_counter()
    op_fresh = fresh_operands((xb, wb))
    jax.block_until_ready(op_fresh)
    out["fresh_operands_blocked_s"] = round(time.perf_counter() - t0, 4)

    for name, make in (("conv", make_conv), ("empty", make_empty)):
        for k in (20, 40):
            fn = jax.jit(make(k))
            t0 = time.perf_counter()
            jax.block_until_ready(fn(xb, wb))
            out[f"{name}_k{k}_compile_warm_s"] = round(
                time.perf_counter() - t0, 4)
            for i in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(xb, wb))
                out[f"{name}_k{k}_same_{i}_s"] = round(
                    time.perf_counter() - t0, 4)
            for i in range(3):
                op2 = fresh_operands((xb, wb))
                t0 = time.perf_counter()
                jax.block_until_ready(fn(*op2))
                out[f"{name}_k{k}_freshbuf_{i}_s"] = round(
                    time.perf_counter() - t0, 4)
            print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
