#!/usr/bin/env python3
"""int8 MXU-rate microbench + int8 fusion-variant e2e comparison.

Answers the two questions VERDICT r3 #2 left open:

1. Does conv(int8,int8)->int32 (preferred_element_type) actually run at
   ~2x the bf16 MXU rate on this chip, or does XLA upcast? Times bare
   convs at the model's dominant shapes (one per backbone stage) and
   prints achieved TFLOP/s for bf16 vs int8 (same geometry, conv-only,
   epilogue-free).
2. Where does the remaining int8 e2e time go? Times the deploy forward
   bf16 vs the int8 fusion grid — {per-conv, RepBlock-chained} x
   {stage handoffs on/off} — so each fusion's win (or loss) is measured
   rather than assumed (quant/int8_infer.py flags).

Measurement protocol: every timing is K data-dependent iterations inside
ONE jitted lax.scan whose carry feeds each iteration's input — the axon
tunnel serves repeat dispatches of identical (program, buffers) pairs
from a replay path, so back-to-back dispatch loops (this tool's previous
protocol) report impossible rates (a bare conv at 9000 "TFLOP/s" on a
197-peak chip). See CLAUDE.md "Micro-benchmarks on the tunnel".

The timed call additionally runs on FRESH device buffers with permuted
content (_fresh_operands): the warm-up call and the timed call must not
be an identical (program, buffers) pair, or the whole K-iteration scan
is itself served from the replay path (observed 2026-08-18: the chained
conv scan still reported 25,749 "TFLOP/s" when the timed call reused the
warm-up call's exact operand buffers).

Role analogue: the reference quantifies its INT8 story with trtexec
throughput tables (tools/qat/README.md:73-80); this is the probe that
tells us which knob to turn to match its 1.6-1.7x INT8/FP16 ratio.
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def _timed_scan(make_fn, K, *op):
    """Shared trusted protocol (yololp_tpu.utils.profiler.timed_scan)."""
    from yololp_tpu.utils.profiler import timed_scan

    return timed_scan(make_fn, K, *op)


def conv_rates(batch, img, iters):
    """Bare 3x3 conv at each backbone-stage geometry, bf16 vs int8.
    The conv output feeds the next iteration's input (clipped/cast) so no
    iteration can be replayed or elided, and the tunnel round-trip is
    cancelled by differencing K- and 2K-iteration programs
    (utils/profiler.timed_scan_delta — a single micro program is ~50 ms
    of latency around ~1 ms of device work)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from yololp_tpu.utils.profiler import timed_scan_delta2 as timed_scan_delta

    rows = []
    # (spatial/img divisor, channels): yololps stages at width 0.50
    for div, c in ((4, 64), (8, 128), (16, 256), (32, 512)):
        s = img // div
        flops = 2 * batch * s * s * c * c * 9  # MACs*2, 3x3 same-ch conv

        def conv(x, w, pet):
            return lax.conv_general_dilated(
                x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=pet)

        def make_scan(step):
            def of_k(k):
                def run(x0, w):
                    def body(x, _):
                        return step(x, w), ()
                    return lax.scan(body, x0, None, length=k)[0]
                return run
            return of_k

        xb = jnp.asarray(np.random.randn(batch, s, s, c) * 0.1, jnp.bfloat16)
        wb = jnp.asarray(np.random.randn(3, 3, c, c) * 0.01, jnp.bfloat16)
        t_bf16 = timed_scan_delta(
            make_scan(lambda x, w: (conv(x, w, jnp.float32)
                                    * jnp.asarray(1e-2, jnp.float32)
                                    ).astype(jnp.bfloat16)),
            iters, xb, wb)

        xi = jnp.asarray(np.random.randint(-127, 128, (batch, s, s, c)),
                         jnp.int8)
        wi = jnp.asarray(np.random.randint(-127, 128, (3, 3, c, c)), jnp.int8)
        t_int8 = timed_scan_delta(
            make_scan(lambda x, w: jnp.clip(conv(x, w, jnp.int32) >> 12,
                                            -127, 127).astype(jnp.int8)),
            iters, xi, wi)

        rows.append({"hw": s, "ch": c,
                     "bf16_tflops": round(flops / t_bf16 / 1e12, 2),
                     "int8_tops": round(flops / t_int8 / 1e12, 2),
                     "int8_speedup": round(t_bf16 / t_int8, 3)})
    return rows


def e2e_variants(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from yololp_tpu.layers.fuse import fuse_variables_jit
    from yololp_tpu.models import Model, build_model
    from yololp_tpu.utils.checkpoint import load_inference_variables
    from yololp_tpu.utils.config import Config

    B, S, K = args.batch_size, args.img_size, args.iters
    cfg = (Config.fromfile(args.conf_file) if args.conf_file.endswith(".py")
           else Config.named(args.conf_file))
    if args.weights:
        variables, _ = load_inference_variables(args.weights)
    else:
        _, tv = build_model(cfg, img_size=(64, 64), dtype=jnp.bfloat16)
        variables = fuse_variables_jit(tv)
    model = Model(config=cfg, deploy=True, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.randint(0, 255, (B, S, S, 3)), jnp.uint8)

    from yololp_tpu.ops.nms import non_max_suppression

    def scan_over(per_image_fn):
        """K chained iterations: carry perturbs the uint8 input."""
        def prog(images_u8, c0):
            def body(c, _):
                _, _, num_valid = per_image_fn(images_u8 + c)
                return c + 1, jnp.sum(num_valid)
            _, vs = lax.scan(body, c0, None, length=K)
            return vs
        return prog

    def bf16_fwd(images_u8):
        xx = images_u8.astype(model.dtype) / jnp.asarray(255.0, model.dtype)
        pred = model.apply(variables, xx, train=False)
        return non_max_suppression(pred.astype(jnp.float32),
                                   conf_thres=args.conf_thres,
                                   iou_thres=args.iou_thres)

    c0 = jnp.uint8(0)
    out = {"bf16_ms":
           round(_timed_scan(scan_over(bf16_fwd), K, x, c0) * 1e3, 2)}

    if args.calib_pt:
        from yololp_tpu.quant.int8_infer import (int8_apply,
                                                 quantize_kernels_int8)
        from yololp_tpu.quant.quantize import load_amax

        amax = load_amax(args.calib_pt)
        table = quantize_kernels_int8(variables["params"])
        grid = (("int8_perconv", False, False, "conv"),
                ("int8_handoff", False, True, "conv"),
                ("int8_chained", True, False, "conv"),
                ("int8_chained_handoff", True, True, "conv"),
                ("int8_chained_handoff_dots", True, True, "dots"),
                ("int8_perconv_dots", False, False, "dots"))
        for name, chain, handoff, impl in grid:
            def int8_fwd(images_u8, _c=chain, _h=handoff, _i=impl):
                xx = (images_u8.astype(model.dtype)
                      / jnp.asarray(255.0, model.dtype))
                pred = int8_apply(model, variables, xx, amax, table,
                                  chain_repblocks=_c, stage_handoffs=_h,
                                  conv_impl=_i, train=False)
                return non_max_suppression(pred.astype(jnp.float32),
                                           conf_thres=args.conf_thres,
                                           iou_thres=args.iou_thres)

            out[f"{name}_ms"] = round(
                _timed_scan(scan_over(int8_fwd), K, x, c0) * 1e3, 2)
        best = min(v for k, v in out.items() if k.startswith("int8"))
        out["int8_best_vs_bf16"] = round(out["bf16_ms"] / best, 3)
    return out


def main(argv=None):
    p = argparse.ArgumentParser("int8 MXU-rate + e2e variant profiler")
    p.add_argument("--conf-file", type=str, default="yololps")
    p.add_argument("--weights", type=str, default=None)
    p.add_argument("--calib-pt", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--conf-thres", type=float, default=0.4)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--skip-micro", action="store_true")
    p.add_argument("--device", default=None, choices=["cpu", "tpu"])
    args = p.parse_args(argv)

    if args.device == "cpu":
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    result = {}
    if not args.skip_micro:
        result["conv_rates"] = conv_rates(args.batch_size, args.img_size,
                                          args.iters)
    result.update(e2e_variants(args))
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
