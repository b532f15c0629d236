#!/usr/bin/env python3
"""Does the fused pallas int8 conv beat XLA's conv+requant on the MXU?

Times one RepBlock chain link (3x3 conv int8 -> per-channel requant ->
int8) at the yololps@640 stage geometries, three ways:

  bf16      XLA bf16 conv + relu (the non-quantized baseline)
  xla_int8  XLA conv(int8,int8)->int32 + separate requant epilogue — what
            quant/int8_infer._chain_repblock executes today
  pallas    ops/pallas_conv.conv3x3_int8_fused — conv + requant in one
            kernel, int8 in / int8 out, accumulator never leaves VMEM

Protocol: utils/profiler.timed_scan_delta2 (K data-dependent chained
iterations in one program; SAME-buffer median walls, K/2K differencing
with a replay-scaling guard) — see diag_scan_walls.py for why fresh-buffer
timing is unusable for micro signals on this tunnel.
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def main(argv=None):
    p = argparse.ArgumentParser("pallas fused int8 conv probe")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--row-tile", type=int, default=None)
    p.add_argument("--device", default=None, choices=["cpu", "tpu"])
    p.add_argument("--small", action="store_true", help="CPU smoke shapes")
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

    from yololp_tpu.ops.pallas_conv import conv3x3_int8_fused
    from yololp_tpu.utils.profiler import timed_scan_delta2 as timed_scan_delta

    B = 2 if args.small else args.batch
    geoms = [(16, 128)] if args.small else [(160, 64), (80, 128),
                                            (40, 256), (20, 512)]
    K = args.iters

    def make_bf16(k, _):
        def run(x0, w):
            def body(x, _):
                y = lax.conv_general_dilated(
                    x, w, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
                return jnp.maximum(y, 0.0).astype(jnp.bfloat16), ()
            return lax.scan(body, x0, None, length=k)[0]
        return run

    def make_xla_int8(k, ab):
        a, b = ab
        def run(x0, w):
            def body(x, _):
                y32 = lax.conv_general_dilated(
                    x, w, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                q = jnp.clip(jnp.round(y32.astype(jnp.float32) * a + b),
                             0, 127).astype(jnp.int8)
                return q, ()
            return lax.scan(body, x0, None, length=k)[0]
        return run

    def make_pallas(k, ab):
        a, b = ab
        def run(x0, w9):
            def body(x, _):
                return conv3x3_int8_fused(
                    x, w9, a, b, relu=True, out_dtype=jnp.int8,
                    row_tile=args.row_tile), ()
            return lax.scan(body, x0, None, length=k)[0]
        return run

    rng = np.random.default_rng(0)
    out = {"platform": jax.devices()[0].platform, "B": B, "rows": []}
    for S, C in geoms:
        flops = 2 * B * S * S * C * C * 9
        a = jnp.asarray(rng.random(C) * 2e-3 + 1e-4, jnp.float32)
        b = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
        xb = jnp.asarray(rng.standard_normal((B, S, S, C)) * 0.1,
                         jnp.bfloat16)
        wb = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.01,
                         jnp.bfloat16)
        xi = jnp.asarray(rng.integers(0, 128, (B, S, S, C)), jnp.int8)
        wi = jnp.asarray(rng.integers(-127, 128, (3, 3, C, C)), jnp.int8)
        w9 = jnp.asarray(wi.reshape(9, C, C))

        row = {"S": S, "C": C}
        t_bf16 = timed_scan_delta(lambda k: make_bf16(k, None), K, xb, wb)
        row["bf16_tflops"] = round(flops / t_bf16 / 1e12, 1)
        t_xla = timed_scan_delta(lambda k: make_xla_int8(k, (a, b)), K,
                                 xi, wi)
        row["xla_int8_tops"] = round(flops / t_xla / 1e12, 1)
        try:
            t_pal = timed_scan_delta(lambda k: make_pallas(k, (a, b)), K,
                                     xi, w9)
            row["pallas_int8_tops"] = round(flops / t_pal / 1e12, 1)
            row["pallas_vs_bf16"] = round(t_bf16 / t_pal, 3)
            row["pallas_vs_xla_int8"] = round(t_xla / t_pal, 3)
        except Exception as e:  # noqa: BLE001 — mosaic lowering may reject
            row["pallas_error"] = f"{type(e).__name__}: {e}"[:300]
        out["rows"].append(row)
        print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
