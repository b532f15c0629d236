#!/usr/bin/env python3
"""Sectional inference profiler: where do the milliseconds go?

Times the deploy forward cumulatively by section (backbone, backbone+neck,
full forward, forward+NMS) in bf16 and TRUE int8, plus the NMS fixpoint in
isolation (exact while_loop vs legacy fixed-iteration bound).

Sub-modules are inlined (nn.compact), so sections are cut with
`capture_intermediates`: the jitted function returns ONLY the named
submodule's captured output, the primary output is dead, and XLA's dead-code
elimination removes everything downstream — giving exact cumulative-section
timings under the same fusion decisions as the full program.

Fills the TRT-profiler role of the reference's `trt_profile`-style layer
timing (deploy/TensorRT); the per-image pre/infer/post split lives in
`tools/eval.py --task speed` (reference yolov6/core/evaler.py:560-612).
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def main(argv=None):
    p = argparse.ArgumentParser("YOLO-LP TPU sectional profiler")
    p.add_argument("--conf-file", type=str, default="yololps")
    p.add_argument("--weights", type=str, default=None,
                   help="checkpoint msgpack (random init when absent — "
                        "timings are weight-value independent)")
    p.add_argument("--calib-pt", type=str, default=None,
                   help="amax json; int8 sections are skipped without it")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--conf-thres", type=float, default=0.4)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--stages", action="store_true",
                   help="also time cumulative per-backbone-stage cuts")
    args = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from yololp_tpu.layers.fuse import fuse_variables_jit
    from yololp_tpu.models import Model, build_model
    from yololp_tpu.ops.nms import non_max_suppression
    from yololp_tpu.utils.checkpoint import load_inference_variables
    from yololp_tpu.utils.config import Config

    B, S = args.batch_size, args.img_size
    cfg = (Config.fromfile(args.conf_file) if args.conf_file.endswith(".py")
           else Config.named(args.conf_file))
    if args.weights:
        variables = load_inference_variables(args.weights)
    else:
        _, tv = build_model(cfg, img_size=(64, 64), dtype=jnp.bfloat16)
        variables = fuse_variables_jit(tv)
    model = Model(config=cfg, deploy=True, dtype=jnp.bfloat16)

    int8_ctx = None
    if args.calib_pt:
        from yololp_tpu.quant.int8_infer import int8_apply, quantize_kernels_int8
        from yololp_tpu.quant.quantize import load_amax
        amax = load_amax(args.calib_pt)
        table = quantize_kernels_int8(variables["params"])
        int8_ctx = (int8_apply, amax, table)

    def fwd(x, int8):
        if int8:
            int8_apply, amax, table = int8_ctx
            return int8_apply(model, variables, x, amax, table, train=False)
        return model.apply(variables, x, train=False)

    def section(x, upto, int8):
        cap = lambda mdl, method: mdl.name == upto
        if int8:
            int8_apply, amax, table = int8_ctx
            _, st = int8_apply(model, variables, x, amax, table, train=False,
                               capture_intermediates=cap)
        else:
            _, st = model.apply(variables, x, train=False,
                                capture_intermediates=cap)
        return st["intermediates"]

    def e2e(x, int8):
        pred = fwd(x, int8)
        return non_max_suppression(pred.astype(jnp.float32),
                                   conf_thres=args.conf_thres,
                                   iou_thres=args.iou_thres,
                                   max_det=300, pre_nms_topk=256)

    from jax import lax

    from yololp_tpu.utils.profiler import timed_scan

    rng0 = np.random.default_rng(0)
    x0 = jax.device_put(
        (rng0.normal(0, 0.3, (B, S, S, 3)).astype(np.float32) + 0.5)
        .clip(0, 1).astype(jnp.bfloat16))

    def bench(fn, name):
        """Trusted protocol (r4e): K carry-perturbed iterations in one
        scan + value-fetch; the staged-rotation loop this replaces is
        replay/ack-unsafe on the tunnel."""
        def prog(p0, c0):
            def body(c, _):
                out = fn(p0 + c * jnp.bfloat16(1e-3))
                s = sum(jnp.sum(t.astype(jnp.float32)) * 1e-9
                        for t in jax.tree.leaves(out))
                return c + 1, s
            return lax.scan(body, c0, None, length=args.iters)[1]
        dt = timed_scan(prog, args.iters, x0, jnp.bfloat16(0))
        ms = dt * 1e3
        print(f"{name:28s} {ms:8.2f} ms/batch  {B / dt:8.0f} img/s",
              flush=True)
        return ms

    precisions = [False] + ([True] if int8_ctx else [])
    for int8 in precisions:
        tag = "int8" if int8 else "bf16"
        if args.stages:
            # Cumulative per-stage cuts through the backbone: quantifies how
            # much of the int8 gap is the early high-resolution, low-channel
            # stages (3->C stem at S^2 can't fill the MXU's 128-lane
            # contraction either way, so int8 buys nothing there).
            for st in ("stem", "ERBlock_2_rep", "ERBlock_3_rep",
                       "ERBlock_4_rep", "ERBlock_5_sppf"):
                bench(jax.jit(lambda x, q=int8, s=st: section(x, s, q)),
                      f"..{st} {tag}")
        bench(jax.jit(lambda x, q=int8: section(x, "backbone", q)),
              f"backbone {tag}")
        bench(jax.jit(lambda x, q=int8: section(x, "neck", q)),
              f"backbone+neck {tag}")
        bench(jax.jit(lambda x, q=int8: fwd(x, q)), f"full fwd {tag}")
        bench(jax.jit(lambda x, q=int8: e2e(x, q)), f"e2e fwd+nms {tag}")

    # NMS alone on synthetic logits: exact while_loop (nms_iters=0) vs the
    # legacy fixed bound.
    rng = np.random.default_rng(1)
    n_anchors = (S // 8) ** 2 + (S // 16) ** 2 + (S // 32) ** 2
    pred_const = jax.device_put(
        rng.normal(0, 1, (B, n_anchors, 290)).astype(np.float32))
    for it in (0, 16):
        def nms_fn(p, k=it):
            return non_max_suppression(
                p, conf_thres=args.conf_thres, iou_thres=args.iou_thres,
                max_det=300, pre_nms_topk=256, nms_iters=k)

        def prog(p0, c0, f=nms_fn):
            def body(c, _):
                out = f(p0 + c * jnp.float32(1e-6))
                s = sum(jnp.sum(t.astype(jnp.float32)) * 1e-9
                        for t in jax.tree.leaves(out))
                return c + 1, s
            return lax.scan(body, c0, None, length=args.iters)[1]

        dt = timed_scan(prog, args.iters, pred_const, jnp.float32(0))
        print(f"nms alone (nms_iters={it:2d})   "
              f"{dt * 1e3:8.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
