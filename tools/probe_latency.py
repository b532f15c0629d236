#!/usr/bin/env python3
"""Serving latency/throughput curve: e2e inference across batch sizes.

The bench headline is throughput at b128; a serving deployment also cares
about the small-batch latency end (the reference's deployment story reports
per-image TRT latency at b1/b32, tools/qat/README.md:73-80). This sweeps the
SAME e2e program (uint8 -> normalize -> fused forward -> decode -> NMS) over
batch sizes and reports per-dispatch device latency and throughput under the
trusted in-scan protocol (utils/profiler.timed_scan — per-iteration time of
a chained K-scan; excludes the ~50 ms tunnel round-trip, which a local
deployment would not pay).

Output: one JSON object with rows [{batch, ms_per_batch, ms_per_img,
img_per_s}] for bf16 and (with --int8) TRUE-int8 execution.
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys

import numpy as np

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def main(argv=None):
    p = argparse.ArgumentParser("e2e latency/throughput curve")
    p.add_argument("--conf-file", type=str, default="yololps")
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--batches", type=str, default="1,4,16,64,128")
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--device", default=None, choices=["cpu", "tpu"])
    args = p.parse_args(argv)

    if args.device == "cpu":
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    from jax import lax

    from yololp_tpu.layers.fuse import fuse_variables_jit as fuse_variables
    from yololp_tpu.models import Model, build_model
    from yololp_tpu.ops.nms import non_max_suppression
    from yololp_tpu.utils.config import Config
    from yololp_tpu.utils.profiler import timed_scan

    S, K = args.img_size, args.iters
    cfg = Config.named(args.conf_file)
    _, train_vars = build_model(cfg, img_size=(64, 64), dtype=jnp.bfloat16)
    variables = fuse_variables(train_vars)
    model = Model(config=cfg, deploy=True, dtype=jnp.bfloat16)

    modes = ["bf16"] + (["int8"] if args.int8 else [])
    amax = table = None
    if args.int8:
        from yololp_tpu.quant.int8_infer import quantize_kernels_int8
        from yololp_tpu.quant.quantize import calibrate

        rng_c = np.random.default_rng(1)
        calib = [rng_c.integers(0, 255, (8, S, S, 3), np.uint8)
                 for _ in range(2)]
        amax = calibrate(model, variables, calib, method="max")
        table = quantize_kernels_int8(variables["params"])

    rng = np.random.default_rng(0)
    out = {"img_size": S, "protocol":
           "in-scan chained K=%d, per-dispatch device time (tunnel RTT "
           "excluded); bf16 fused deploy model, NMS in-graph" % K,
           "rows": []}
    for mode in modes:
        for B in (int(b) for b in args.batches.split(",")):
            def fwd(images_u8):
                x = images_u8.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
                if mode == "int8":
                    from yololp_tpu.quant.int8_infer import int8_apply

                    pred = int8_apply(model, variables, x, amax, table,
                                      train=False).astype(jnp.float32)
                else:
                    pred = model.apply(variables, x, train=False)
                det, valid, num = non_max_suppression(
                    pred, conf_thres=0.4, iou_thres=0.45, max_det=300,
                    pre_nms_topk=256)
                return det, num

            def scan_prog(images_u8, c0):
                def body(c, _):
                    det, num = fwd(images_u8 + c)
                    return c + 1, (jnp.sum(det.astype(jnp.float32)) * 1e-9
                                   + jnp.sum(num))
                _, vs = lax.scan(body, c0, None, length=K)
                return vs

            x = jax.device_put(
                rng.integers(0, 255, (B, S, S, 3), np.uint8))
            try:
                dt = timed_scan(scan_prog, K, x, jnp.uint8(0))
                row = {"mode": mode, "batch": B,
                       "ms_per_batch": round(dt * 1e3, 3),
                       "ms_per_img": round(dt * 1e3 / B, 3),
                       "img_per_s": round(B / dt, 1)}
            except Exception as e:  # noqa: BLE001 — record and continue
                row = {"mode": mode, "batch": B,
                       "error": f"{type(e).__name__}: {e}"[:200]}
            out["rows"].append(row)
            print(json.dumps(row), flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
