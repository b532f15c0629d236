#!/usr/bin/env python3
"""Train-step decomposition profiler: where do the 165 ms/step go?

BENCH r4 measured the b32@640 bf16 train step at ~165 ms (13% MFU against
the fwd+bwd conv FLOPs) vs 12.5 ms-equivalent for the b128 inference path
(57% MFU). This times jitted SUBPROGRAMS of the step so the gap is
attributed instead of guessed:

  full        the exact bench_train_step program (fwd+loss+bwd+SGD+EMA)
  fwd         model.apply train=True only (conv stack forward)
  fwd_bwd     value_and_grad of sum(outputs) — conv fwd+bwd, no loss/assign
  loss_fwd    compute_loss on FIXED predictions — assigner + loss forward
  loss_grad   value_and_grad of compute_loss wrt predictions — the loss/
              assigner fwd+bwd that rides inside the full step
  opt         SGD+EMA update on the param tree only

Times are medians over distinct pre-staged inputs with per-iteration sync
(the protocol CLAUDE.md requires on this tunnel).

Role analogue: the reference profiles training with torch.profiler
(yolov6/core/engine.py uses none — its throughput story is TRT-side only);
this is our equivalent of a torch.profiler table for the XLA step.
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def _median_time(fn, staged, iters):
    import jax

    out = fn(*staged[0])
    jax.block_until_ready(out)  # compile
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(*staged[i % len(staged)])
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


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
    p.add_argument("--iters", type=int, default=12)
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

    from yololp_tpu.core.train_step import init_train_state, make_train_step
    from yololp_tpu.losses.loss import LossConfig, compute_loss
    from yololp_tpu.models import Model, build_model
    from yololp_tpu.solver.build import SolverConfig
    from yololp_tpu.utils.config import Config

    B, S = args.batch_size, args.img_size
    cfg = Config.named(args.conf_file)
    model = Model(config=cfg, deploy=False, dtype=jnp.bfloat16)
    _, variables = build_model(cfg, img_size=(64, 64), dtype=jnp.bfloat16)
    state = init_train_state(variables)
    loss_cfg = LossConfig(img_size=(S, S), iou_type="giou",
                          assigner=args.assigner)
    solver_cfg = SolverConfig(epochs=10, steps_per_epoch=100)
    step = jax.jit(make_train_step(model, loss_cfg, solver_cfg, batch_size=B))

    rng = np.random.default_rng(2)
    staged = []
    for _ in range(3):
        images, labels, mask = _fake_batch(rng, B, S)
        staged.append((jax.device_put(images), jax.device_put(labels),
                       jax.device_put(mask)))

    out = {}

    # full step
    st = state
    f_full = lambda i, l, m: step(st, i, l, m)
    out["full_ms"] = round(_median_time(f_full, staged, args.iters) * 1e3, 2)

    # fwd only
    @jax.jit
    def fwd(images, labels, mask):
        x = images.astype(model.dtype) / jnp.asarray(255.0, model.dtype)
        o, _ = model.apply({"params": state.params,
                            "batch_stats": state.batch_stats},
                           x, train=True, mutable=["batch_stats"])
        return o

    out["fwd_ms"] = round(_median_time(fwd, staged, args.iters) * 1e3, 2)

    # conv fwd+bwd, no loss/assigner: grad of a scalar sum of the outputs
    @jax.jit
    def fwd_bwd(images, labels, mask):
        def f(params):
            x = images.astype(model.dtype) / jnp.asarray(255.0, model.dtype)
            o, _ = model.apply({"params": params,
                                "batch_stats": state.batch_stats},
                               x, train=True, mutable=["batch_stats"])
            return sum(jnp.sum(t.astype(jnp.float32))
                       for t in jax.tree_util.tree_leaves(o))

        return jax.grad(f)(state.params)

    out["fwd_bwd_ms"] = round(
        _median_time(fwd_bwd, staged, args.iters) * 1e3, 2)

    # loss (assigner included) on FIXED predictions — fwd and fwd+bwd
    preds = jax.block_until_ready(fwd(*staged[0]))

    @jax.jit
    def loss_fwd(labels, mask):
        total, items = compute_loss(preds, labels, mask, loss_cfg)
        return total

    @jax.jit
    def loss_grad(labels, mask):
        def f(pr):
            total, _ = compute_loss(pr, labels, mask, loss_cfg)
            return total

        return jax.grad(f)(preds)

    lm = [(s[1], s[2]) for s in staged]
    out["loss_fwd_ms"] = round(_median_time(loss_fwd, lm, args.iters) * 1e3, 2)
    out["loss_grad_ms"] = round(
        _median_time(loss_grad, lm, args.iters) * 1e3, 2)

    # optimizer + EMA only
    from yololp_tpu.solver.build import (ema_update, label_tree, schedule,
                                         sgd_apply)

    labels_tree = label_tree(state.params)

    @jax.jit
    def opt(grads):
        lr_w, lr_b, mom = schedule(solver_cfg, state.step)
        new_params, new_vel = sgd_apply(
            state.params, grads, state.momentum, labels_tree, lr_w, lr_b,
            mom, solver_cfg.weight_decay)
        emap = ema_update(state.ema_params, new_params, state.ema_updates + 1)
        return new_params, new_vel, emap

    zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    gstage = [(zeros,)] * 3
    out["opt_ms"] = round(_median_time(opt, gstage, args.iters) * 1e3, 2)

    out["unattributed_ms"] = round(
        out["full_ms"] - out["fwd_bwd_ms"] - out["loss_grad_ms"]
        - out["opt_ms"], 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
