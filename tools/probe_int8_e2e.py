#!/usr/bin/env python3
"""Surgical attribution ladder for int8-vs-bf16 e2e deltas.

HISTORY: this probe was written to chase a measured "int8 e2e ~4.7x
slower than bf16" (r4d profile_int8 grid). Its own first run then showed
a skip-configuration-INDEPENDENT ~400 ms floor on every int8 variant —
which exposed the real cause: TWO device queues (q4d pid 5609 + q4d2 pid
6803) were sharing the one tunnel chip 15:38-16:30 Aug 18, and every
number from that window is contention garbage. Remeasured on a quiet
host (runs/q4e, Aug 18 21:05): int8_full 33.8 ms vs bf16 41.5 ms at
b128@640 — int8 is 1.23x FASTER, consistent with the banked bench.
Queues now take an exclusive flock on runs/.device.lock (tpuq_r4e2.sh).

The ladder itself remains useful for attributing genuine per-stage int8
deltas, hence kept:

This probe times, with the trusted protocol (utils/profiler.timed_scan,
K chained data-dependent iterations, fresh timed buffers):

  bf16            the deploy forward, no NMS (baseline)
  int8_full       int8_apply, default skips
  int8_skip<K>    int8_apply with progressively more of the network's
                  FRONT kept in bf16: stem; +ERBlock_2; +ERBlock_3;
                  +ERBlock_4 — if one prefix step recovers most of the
                  165 ms, the culprit is localized
  int8_backbone_only   neck+head in bf16 (reverse cut)

plus a RepBlock-chain micro at stage-2 geometry (bf16 vs int8 chain with
real requant epilogues, timed_scan_delta) to price the epilogue itself.

No NMS anywhere (it is identical across variants and ~2 ms).
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
    p = argparse.ArgumentParser("int8 e2e slowdown attribution")
    p.add_argument("--conf-file", type=str, default="yololps")
    p.add_argument("--calib-pt", type=str, required=True)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--device", default=None, choices=["cpu", "tpu"])
    p.add_argument("--skip-chain-micro", action="store_true")
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

    from yololp_tpu.layers.fuse import fuse_variables_jit
    from yololp_tpu.models import Model, build_model
    from yololp_tpu.quant.int8_infer import int8_apply, quantize_kernels_int8
    from yololp_tpu.quant.quantize import DEFAULT_SKIP_SUBSTRINGS, load_amax
    from yololp_tpu.utils.config import Config
    from yololp_tpu.utils.profiler import timed_scan

    B, S, K = args.batch_size, args.img_size, args.iters
    cfg = (Config.fromfile(args.conf_file) if args.conf_file.endswith(".py")
           else Config.named(args.conf_file))
    _, tv = build_model(cfg, img_size=(64, 64), dtype=jnp.bfloat16)
    variables = fuse_variables_jit(tv)
    model = Model(config=cfg, deploy=True, dtype=jnp.bfloat16)
    amax = load_amax(args.calib_pt)
    table = quantize_kernels_int8(variables["params"])
    x = jnp.asarray(np.random.randint(0, 255, (B, S, S, 3)), jnp.uint8)

    def scan_over(fwd):
        def prog(images_u8, c0):
            def body(c, _):
                pred = fwd(images_u8 + c)
                return c + 1, jnp.sum(pred.astype(jnp.float32)) * 1e-9
            _, vs = lax.scan(body, c0, None, length=K)
            return vs
        return prog

    def bf16_fwd(images_u8):
        xx = images_u8.astype(model.dtype) / jnp.asarray(255.0, model.dtype)
        return model.apply(variables, xx, train=False)

    c0 = jnp.uint8(0)
    out = {"bf16_ms": round(timed_scan(scan_over(bf16_fwd), K, x, c0) * 1e3,
                            2)}

    cuts = [
        ("int8_full", ()),
        ("int8_skip_stem", ("backbone/stem",)),
        ("int8_skip_thru_E2", ("backbone/stem", "backbone/ERBlock_2")),
        ("int8_skip_thru_E3", ("backbone/stem", "backbone/ERBlock_2",
                               "backbone/ERBlock_3")),
        ("int8_skip_thru_E4", ("backbone/stem", "backbone/ERBlock_2",
                               "backbone/ERBlock_3", "backbone/ERBlock_4")),
        ("int8_backbone_only", ("neck", "head")),
    ]
    for name, extra in cuts:
        skips = tuple(DEFAULT_SKIP_SUBSTRINGS) + extra

        def int8_fwd(images_u8, _s=skips):
            xx = (images_u8.astype(model.dtype)
                  / jnp.asarray(255.0, model.dtype))
            return int8_apply(model, variables, xx, amax, table,
                              skip_substrings=_s, train=False)

        out[f"{name}_ms"] = round(
            timed_scan(scan_over(int8_fwd), K, x, c0) * 1e3, 2)

    # fusion-attribution rungs (r5: graph_handoffs + chain_exit_handoffs
    # extended int8-in/int8-out past the backbone spine — price each layer
    # of the mechanism separately)
    for name, flags in (
            ("int8_no_handoffs", dict(stage_handoffs=False)),
            ("int8_per_conv", dict(stage_handoffs=False,
                                   chain_repblocks=False))):
        def int8_fwd_f(images_u8, _f=flags):
            xx = (images_u8.astype(model.dtype)
                  / jnp.asarray(255.0, model.dtype))
            return int8_apply(model, variables, xx, amax, table,
                              train=False, **_f)

        out[f"{name}_ms"] = round(
            timed_scan(scan_over(int8_fwd_f), K, x, c0) * 1e3, 2)

    # NMS-inclusive pair: prices the decode+NMS residual that no conv-side
    # fusion can touch (VERDICT r4 #3 "or prove the residual is decode/NMS")
    from yololp_tpu.ops.nms import non_max_suppression

    def with_nms(fwd):
        def f(images_u8):
            det, _, num = non_max_suppression(
                fwd(images_u8).astype(jnp.float32), conf_thres=0.4,
                iou_thres=0.45, max_det=300, pre_nms_topk=256)
            return det.astype(jnp.float32) * 1e-9 + num[..., None].astype(
                jnp.float32)
        return f

    def int8_full_fwd(images_u8):
        xx = images_u8.astype(model.dtype) / jnp.asarray(255.0, model.dtype)
        return int8_apply(model, variables, xx, amax, table, train=False)

    out["bf16_nms_ms"] = round(
        timed_scan(scan_over(with_nms(bf16_fwd)), K, x, c0) * 1e3, 2)
    out["int8_full_nms_ms"] = round(
        timed_scan(scan_over(with_nms(int8_full_fwd)), K, x, c0) * 1e3, 2)

    if not args.skip_chain_micro:
        from yololp_tpu.quant.int8_infer import _chain_repblock
        from yololp_tpu.utils.profiler import timed_scan_delta2 as timed_scan_delta

        # stage-2-like chain: 4 links of 3x3 C->C convs at (B, S/8, S/8, C)
        C, s2 = 128, S // 8
        paths = [f"micro/link_{i}/conv" for i in range(4)]
        am = {pth: 8.0 for pth in paths}
        tbl = {pth: (jnp.asarray(np.random.randint(-127, 128, (3, 3, C, C)),
                                 jnp.int8),
                     jnp.full((C,), 0.01, jnp.float32),
                     jnp.zeros((C,), jnp.float32)) for pth in paths}
        xb = jnp.asarray(np.random.randn(B, s2, s2, C) * 0.5, jnp.bfloat16)
        wb = jnp.asarray(np.random.randn(3, 3, C, C) * 0.01, jnp.bfloat16)

        def make_bf16_chain(k):
            def prog(x0, w):
                def body(xc, _):
                    y = xc
                    for _i in range(4):
                        y = jax.nn.relu(lax.conv_general_dilated(
                            y, w, (1, 1), ((1, 1), (1, 1)),
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                            preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16))
                    return y * jnp.bfloat16(0.5), ()
                return lax.scan(body, x0, None, length=k)[0]
            return prog

        def make_int8_chain(k):
            def prog(x0):
                def body(xc, _):
                    y = _chain_repblock(xc, paths, am, tbl)
                    return y * jnp.bfloat16(0.5), ()
                return lax.scan(body, x0, None, length=k)[0]
            return prog

        out["chain_bf16_ms"] = round(
            timed_scan_delta(make_bf16_chain, K, xb, wb) * 1e3, 3)
        out["chain_int8_ms"] = round(
            timed_scan_delta(make_int8_chain, K, xb) * 1e3, 3)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
