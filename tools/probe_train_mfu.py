#!/usr/bin/env python3
"""Attribute the train-step MFU gap: batch/shape scaling vs BN vs backward.

profile_train (docs/perf/r4e) showed the b48@448 train step at 76.5 ms with
~78% of it in conv fwd+bwd — i.e. the conv stack runs at ~52 TFLOP/s during
training while the b128@640 inference forward hits 135 TFLOP/s (69% of v5e
bf16 peak). This probe separates the three candidate causes by measuring the
SAME model forward / forward+backward across a (batch, img) grid and in
train=False vs train=True (batch-stats) mode, each under the trusted in-scan
protocol (utils/profiler.timed_scan), with TFLOP/s computed from XLA's own
cost analysis of each program (utils/profiler.model_flops) — no 3x-fwd
estimate.

Rows answer:
  - infer_fwd vs train_fwd at fixed shape  -> cost of BN stats collection
  - any fwd across shapes                  -> MXU utilization vs batch/size
  - fwd_bwd vs fwd at fixed shape          -> backward-pass efficiency
    (cost-analysis FLOPs of the grad program make this exact)

Role analogue: the reference has no training profiler (its perf story is
TRT inference only); this is speed-of-light attribution for our XLA step.
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

V5E_BF16_PEAK = 197e12  # TFLOP/s, v5e datasheet bf16


def main(argv=None):
    p = argparse.ArgumentParser("train MFU attribution probe")
    p.add_argument("--conf-file", type=str, default="yololps")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--shapes", type=str, default="48x448,128x448,32x640,128x640",
                   help="comma list of BxS")
    p.add_argument("--device", default=None, choices=["cpu", "tpu"])
    args = p.parse_args(argv)

    if args.device == "cpu":
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    from jax import lax

    from yololp_tpu.models import Model, build_model
    from yololp_tpu.utils.config import Config
    from yololp_tpu.utils.profiler import model_flops, timed_scan

    K = args.iters
    cfg = Config.named(args.conf_file)
    model = Model(config=cfg, deploy=False, dtype=jnp.bfloat16)
    _, variables = build_model(cfg, img_size=(64, 64), dtype=jnp.bfloat16)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), variables["params"])
    stats = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32),
        variables.get("batch_stats", {}))

    def out_sum(o):
        return sum(jnp.sum(t.astype(jnp.float32)) * 1e-9
                   for t in jax.tree_util.tree_leaves(o))

    def make_variants(B, S):
        rng = np.random.default_rng(0)
        images = jax.device_put(
            rng.integers(0, 255, (B, S, S, 3), np.uint8))

        def x_of(c):
            return (images + c).astype(model.dtype) / jnp.asarray(
                255.0, model.dtype)

        def infer_fwd_one(c):
            o = model.apply({"params": params, "batch_stats": stats},
                            x_of(c), train=False)
            return out_sum(o)

        def train_fwd_one(c):
            o, _ = model.apply({"params": params, "batch_stats": stats},
                               x_of(c), train=True,
                               mutable=["batch_stats"])
            return out_sum(o)

        def fwd_bwd_one(c):
            def f(pr):
                o, _ = model.apply({"params": pr, "batch_stats": stats},
                                   x_of(c), train=True,
                                   mutable=["batch_stats"])
                return sum(jnp.sum(t.astype(jnp.float32))
                           for t in jax.tree_util.tree_leaves(o))

            g = jax.grad(f)(params)
            return sum(jnp.sum(t) * 1e-9
                       for t in jax.tree_util.tree_leaves(g))

        def scan_of(one):
            def scan_fn(c0):
                def body(c, _):
                    return c + 1, one(c)
                _, ss = lax.scan(body, c0, None, length=K)
                return ss
            return scan_fn

        return {"infer_fwd": (infer_fwd_one, scan_of(infer_fwd_one)),
                "train_fwd": (train_fwd_one, scan_of(train_fwd_one)),
                "fwd_bwd": (fwd_bwd_one, scan_of(fwd_bwd_one))}

    def empty_scan(x):
        def body(c, _):
            return c + 1, ()
        c, _ = lax.scan(body, x, None, length=K)
        return c

    overhead_per_iter = timed_scan(empty_scan, K, jnp.uint8(0))

    rows = []
    for spec in args.shapes.split(","):
        B, S = (int(v) for v in spec.split("x"))
        variants = make_variants(B, S)
        for name, (one, scan_fn) in variants.items():
            try:
                fl = model_flops(one, jnp.uint8(3))["flops"]
                per_iter = timed_scan(scan_fn, K, jnp.uint8(0))
                ms = (per_iter - overhead_per_iter) * 1e3
                tflops = fl / 1e12
                rate = fl / max(ms * 1e-3, 1e-9)
                row = {"batch": B, "img": S, "variant": name,
                       "ms": round(ms, 2), "tflop": round(tflops, 3),
                       "tflop_per_s": round(rate / 1e12, 1),
                       "pct_bf16_peak": round(100 * rate / V5E_BF16_PEAK, 1)}
            except Exception as e:  # OOM at big shapes: record and continue
                row = {"batch": B, "img": S, "variant": name,
                       "error": f"{type(e).__name__}: {e}"[:200]}
            rows.append(row)
            print(json.dumps(row), flush=True)

    print(json.dumps({"protocol": "in-scan chained K=%d minus empty-scan; "
                      "flops from XLA cost analysis per program" % K,
                      "rows": rows}, indent=1))


if __name__ == "__main__":
    main()
