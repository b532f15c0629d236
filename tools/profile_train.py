#!/usr/bin/env python3
"""Train-step decomposition profiler: where do the 165 ms/step go?

BENCH r4 measured the b32@640 bf16 train step at ~165 ms (13% MFU against
the fwd+bwd conv FLOPs) vs 12.5 ms-equivalent for the b128 inference path
(57% MFU). This attributes the gap by timing jitted SUBPROGRAMS of the step:

  full        the exact train_step program (fwd+loss+bwd+SGD+EMA)
  fwd         model.apply train=True only (conv stack forward)
  fwd_bwd     value_and_grad of sum(outputs) — conv fwd+bwd, no loss/assign
  loss_fwd    compute_loss on FIXED predictions — assigner + loss forward
  loss_grad   value_and_grad of compute_loss wrt predictions — the loss/
              assigner fwd+bwd that rides inside the full step
  opt         SGD+EMA update on the param tree only

Measurement protocol (the ONLY one that is trustworthy on the axon tunnel,
see CLAUDE.md "Micro-benchmarks on the tunnel are unreliable"): each variant
runs K data-dependent iterations inside ONE jitted lax.scan program — every
iteration's input is perturbed by the scan carry, so the runtime cannot
replay or overlap them — and reports (wall_time - dispatch_overhead) / K.
Re-dispatching one program on rotating pre-staged buffers (the previous
protocol here) measured a 165 ms step at 21.9 ms: the tunnel serves repeat
executions from a replay path. In-scan chaining is how the r3 600-epoch
run's 111 ms/step rate was derived, which reconciled with the clean bench.

Role analogue: the reference profiles training with torch.profiler
(yolov6/core/engine.py uses none — its throughput story is TRT-side only);
this is our equivalent of a torch.profiler table for the XLA step.
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


def _fake_batch(rng, batch, img):
    images = rng.integers(0, 255, (batch, img, img, 3), np.uint8)
    labels = np.zeros((batch, 16, 20), np.float32)
    labels[..., :8] = -1
    mask = np.zeros((batch, 16), np.float32)
    for b in range(batch):
        n = 1 + b % 3
        for k in range(n):
            labels[b, k, :8] = [1, 2, 3, 4, 5, 6, 7, 36]
            cx, cy = 0.2 + 0.3 * k, 0.3 + 0.2 * k
            labels[b, k, 8:12] = [cx, cy, 0.25, 0.1]
            labels[b, k, 12:20] = [cx - 0.12, cy - 0.04, cx - 0.12, cy + 0.04,
                                   cx + 0.12, cy + 0.04, cx + 0.12, cy - 0.04]
            mask[b, k] = 1
    return images, labels, mask


def main(argv=None):
    p = argparse.ArgumentParser("train-step decomposition profiler")
    p.add_argument("--conf-file", type=str, default="yololps")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--iters", type=int, default=10,
                   help="scan length K per timed program")
    p.add_argument("--assigner", choices=["atss", "tal"], default="atss")
    p.add_argument("--device", default=None, choices=["cpu", "tpu"])
    args = p.parse_args(argv)

    if args.device == "cpu":
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from jax import lax

    from yololp_tpu.core.train_step import init_train_state, make_train_step
    from yololp_tpu.losses.loss import LossConfig, compute_loss
    from yololp_tpu.models import Model, build_model
    from yololp_tpu.solver.build import SolverConfig
    from yololp_tpu.utils.config import Config

    B, S, K = args.batch_size, args.img_size, args.iters
    cfg = Config.named(args.conf_file)
    model = Model(config=cfg, deploy=False, dtype=jnp.bfloat16)
    _, variables = build_model(cfg, img_size=(64, 64), dtype=jnp.bfloat16)
    state = init_train_state(variables)
    loss_cfg = LossConfig(img_size=(S, S), iou_type="giou",
                          assigner=args.assigner)
    solver_cfg = SolverConfig(epochs=10, steps_per_epoch=100)
    train_step = make_train_step(model, loss_cfg, solver_cfg, batch_size=B)

    rng = np.random.default_rng(2)
    images, labels, mask = (jax.device_put(a)
                            for a in _fake_batch(rng, B, S))

    def timed(make_scan_fn, *op):
        """Shared trusted protocol (utils/profiler.timed_scan): K chained
        iterations in one program, timed dispatch on fresh buffers."""
        from yololp_tpu.utils.profiler import timed_scan

        return timed_scan(make_scan_fn, K, *op)

    # dispatch overhead baseline: an empty chained scan on the same carry
    def empty_scan(x):
        def body(c, _):
            return c + 1, ()
        c, _ = lax.scan(body, x, None, length=K)
        return c

    overhead = timed(empty_scan, jnp.uint8(0)) * K  # whole-program time

    def perturb(c):
        # cheap uint8 wraparound shift: new data every iteration, no H2D
        return images + c

    def full_scan(st, c0):
        def body(carry, _):
            st_, c = carry
            st_, total, _ = train_step(st_, perturb(c), labels, mask)
            return (st_, c + 1), total
        (st_, _), totals = lax.scan(body, (st, c0), None, length=K)
        return totals

    def fwd_apply(params, stats, x):
        o, _ = model.apply({"params": params, "batch_stats": stats},
                           x, train=True, mutable=["batch_stats"])
        return o

    def fwd_scan(c0):
        def body(c, _):
            x = perturb(c).astype(model.dtype) / jnp.asarray(255., model.dtype)
            o = fwd_apply(state.params, state.batch_stats, x)
            s = sum(jnp.sum(t.astype(jnp.float32)) * 1e-9
                    for t in jax.tree_util.tree_leaves(o))
            return c + 1, s
        _, ss = lax.scan(body, c0, None, length=K)
        return ss

    def fwd_bwd_scan(c0):
        def body(c, _):
            x = perturb(c).astype(model.dtype) / jnp.asarray(255., model.dtype)

            def f(params):
                o = fwd_apply(params, state.batch_stats, x)
                return sum(jnp.sum(t.astype(jnp.float32))
                           for t in jax.tree_util.tree_leaves(o))

            g = jax.grad(f)(state.params)
            s = sum(jnp.sum(t) * 1e-9 for t in jax.tree_util.tree_leaves(g))
            return c + 1, s
        _, ss = lax.scan(body, c0, None, length=K)
        return ss

    # fixed predictions for the loss-only programs
    x0 = (images).astype(model.dtype) / jnp.asarray(255.0, model.dtype)
    preds = jax.block_until_ready(
        jax.jit(lambda x: fwd_apply(state.params, state.batch_stats, x))(x0))

    def pred_perturb(pr, c):
        f = 1.0 + c.astype(jnp.float32) * 1e-6
        return jax.tree_util.tree_map(
            lambda t: (t.astype(jnp.float32) * f).astype(t.dtype), pr)

    def loss_fwd_scan(pr, c0):
        def body(c, _):
            total, _ = compute_loss(pred_perturb(pr, c), labels, mask,
                                    loss_cfg)
            return c + 1, total
        _, ts = lax.scan(body, c0, None, length=K)
        return ts

    def loss_grad_scan(pr, c0):
        def body(c, _):
            def f(p):
                total, _ = compute_loss(p, labels, mask, loss_cfg)
                return total

            g = jax.grad(f)(pred_perturb(pr, c))
            s = sum(jnp.sum(t.astype(jnp.float32)) * 1e-9
                    for t in jax.tree_util.tree_leaves(g))
            return c + 1, s
        _, ss = lax.scan(body, c0, None, length=K)
        return ss

    from yololp_tpu.solver.build import (ema_update, label_tree, schedule,
                                         sgd_apply)

    labels_tree = label_tree(state.params)

    def opt_scan(params, c0):
        def body(carry, _):
            pr, vel, emap, c = carry
            lr_w, lr_b, mom = schedule(solver_cfg, c.astype(jnp.int32))
            grads = jax.tree_util.tree_map(
                lambda t: t * (c.astype(jnp.float32) * 1e-9), pr)
            pr, vel = sgd_apply(pr, grads, vel, labels_tree, lr_w, lr_b,
                                mom, solver_cfg.weight_decay)
            emap = ema_update(emap, pr, jnp.asarray(1, jnp.int32) + c)
            return (pr, vel, emap, c + 1), ()
        (pr, _, _, _), _ = lax.scan(
            body, (params, state.momentum, state.ema_params,
                   c0.astype(jnp.int32)), None, length=K)
        return jax.tree_util.tree_leaves(pr)[0]

    out = {"protocol": f"in-scan chained, K={K}, minus empty-scan overhead",
           "dispatch_overhead_ms": round(overhead * 1e3, 2)}
    c0 = jnp.uint8(0)
    oh = overhead / K
    out["full_ms"] = round((timed(full_scan, state, c0) - oh) * 1e3, 2)
    out["fwd_ms"] = round((timed(fwd_scan, c0) - oh) * 1e3, 2)
    out["fwd_bwd_ms"] = round((timed(fwd_bwd_scan, c0) - oh) * 1e3, 2)
    out["loss_fwd_ms"] = round((timed(loss_fwd_scan, preds, c0) - oh) * 1e3, 2)
    out["loss_grad_ms"] = round(
        (timed(loss_grad_scan, preds, c0) - oh) * 1e3, 2)
    out["opt_ms"] = round((timed(opt_scan, state.params, c0) - oh) * 1e3, 2)
    out["unattributed_ms"] = round(
        out["full_ms"] - out["fwd_bwd_ms"] - out["loss_grad_ms"]
        - out["opt_ms"], 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
