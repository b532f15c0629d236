#!/usr/bin/env python3
"""int8 MXU-rate microbench + chained-vs-per-conv e2e comparison.

Answers the two questions VERDICT r3 #2 left open:

1. Does conv(int8,int8)->int32 (preferred_element_type) actually run at
   ~2x the bf16 MXU rate on this chip, or does XLA upcast? Times bare
   convs at the model's dominant shapes (one per backbone stage) and
   prints achieved TFLOP/s for bf16 vs int8 (same geometry, conv-only,
   epilogue-free).
2. Where does the remaining int8 e2e time go? Times the deploy forward
   bf16 vs int8 per-conv (chain_repblocks=False) vs int8 chained, so the
   chain fusion win (quant/int8_infer.py _chain_repblock) is measured
   rather than assumed.

Role analogue: the reference quantifies its INT8 story with trtexec
throughput tables (tools/qat/README.md:73-80); this is the probe that
tells us which knob to turn to match its 1.6-1.7x INT8/FP16 ratio.
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


def _bench(fn, *args, iters=20, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def conv_rates(batch, img, iters):
    """Bare 3x3 conv at each backbone-stage geometry, bf16 vs int8."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rows = []
    # (spatial/img divisor, channels): yololps stages at width 0.50
    for div, c in ((4, 64), (8, 128), (16, 256), (32, 512)):
        s = img // div
        flops = 2 * batch * s * s * c * c * 9  # MACs*2, 3x3 same-ch conv

        def conv(x, w, pet):
            return jax.lax.conv_general_dilated(
                x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=pet)

        xb = jnp.asarray(np.random.randn(batch, s, s, c), jnp.bfloat16)
        wb = jnp.asarray(np.random.randn(3, 3, c, c) * 0.05, jnp.bfloat16)
        f_bf16 = jax.jit(lambda x, w: conv(x, w, jnp.float32))
        t_bf16 = _bench(f_bf16, xb, wb, iters=iters)

        xi = jnp.asarray(np.random.randint(-127, 128, (batch, s, s, c)),
                         jnp.int8)
        wi = jnp.asarray(np.random.randint(-127, 128, (3, 3, c, c)), jnp.int8)
        f_int8 = jax.jit(lambda x, w: conv(x, w, jnp.int32))
        t_int8 = _bench(f_int8, xi, wi, iters=iters)

        rows.append({"hw": s, "ch": c,
                     "bf16_tflops": round(flops / t_bf16 / 1e12, 2),
                     "int8_tops": round(flops / t_int8 / 1e12, 2),
                     "int8_speedup": round(t_bf16 / t_int8, 3)})
    return rows


def e2e_variants(args):
    import jax.numpy as jnp
    import numpy as np

    from yololp_tpu.layers.fuse import fuse_variables_jit
    from yololp_tpu.models import Model, build_model
    from yololp_tpu.utils.checkpoint import load_inference_variables
    from yololp_tpu.utils.config import Config
    import jax

    B, S = args.batch_size, args.img_size
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

    @jax.jit
    def bf16_fn(images_u8):
        xx = images_u8.astype(model.dtype) / jnp.asarray(255.0, model.dtype)
        pred = model.apply(variables, xx, train=False)
        return non_max_suppression(pred.astype(jnp.float32),
                                   conf_thres=args.conf_thres,
                                   iou_thres=args.iou_thres)

    out = {"bf16_ms": round(_bench(bf16_fn, x, iters=args.iters) * 1e3, 2)}

    if args.calib_pt:
        from yololp_tpu.quant.int8_infer import (int8_apply,
                                                 quantize_kernels_int8)
        from yololp_tpu.quant.quantize import load_amax

        amax = load_amax(args.calib_pt)
        table = quantize_kernels_int8(variables["params"])
        for name, chain in (("int8_perconv", False), ("int8_chained", True)):

            @jax.jit
            def fn(images_u8, _chain=chain):
                xx = (images_u8.astype(model.dtype)
                      / jnp.asarray(255.0, model.dtype))
                pred = int8_apply(model, variables, xx, amax, table,
                                  chain_repblocks=_chain, train=False)
                return non_max_suppression(pred.astype(jnp.float32),
                                           conf_thres=args.conf_thres,
                                           iou_thres=args.iou_thres)

            out[f"{name}_ms"] = round(_bench(fn, x, iters=args.iters) * 1e3, 2)
        out["int8_vs_bf16"] = round(out["bf16_ms"] / out["int8_chained_ms"], 3)
    return out


def main(argv=None):
    p = argparse.ArgumentParser("int8 MXU-rate + e2e variant profiler")
    p.add_argument("--conf-file", type=str, default="yololps")
    p.add_argument("--weights", type=str, default=None)
    p.add_argument("--calib-pt", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--iters", type=int, default=20)
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
