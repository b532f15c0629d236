"""Optimizer + LR/momentum schedules (reference: yolov6/solver/build.py and
Trainer.update_optimizer, engine.py:338-354).

The reference uses torch SGD with 3 param groups — BN weights (no decay),
conv weights (weight decay), biases (no decay, separate warmup lr) — a
per-epoch cosine LambdaLR, and per-step linear warmup of lr and momentum.
Here the whole schedule is a pure function of the global step so it lives
inside the jitted train step; the update rule reproduces torch SGD
(nesterov, wd added to grad) exactly.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp


class SolverConfig(NamedTuple):
    lr0: float = 0.01
    lrf: float = 0.01
    momentum: float = 0.937
    weight_decay: float = 0.0005
    warmup_epochs: float = 3.0
    warmup_momentum: float = 0.8
    warmup_bias_lr: float = 0.1
    lr_scheduler: str = "Cosine"
    epochs: int = 300
    steps_per_epoch: int = 1000


def lr_lambda(cfg: SolverConfig, epoch):
    """Per-epoch multiplier (solver/build.py:36-41)."""
    if cfg.lr_scheduler == "Constant":
        return jnp.ones_like(jnp.asarray(epoch, jnp.float32))
    # Clamp to the schedule domain: a run resumed with a shorter --epochs
    # (e.g. the QAT finetune resuming an 80-epoch RepOpt checkpoint with
    # epochs=15) would otherwise evaluate the cosine far past pi and swing
    # the lr ABOVE lr0; clamped, it holds the terminal lrf — the gentle
    # finetune behavior such resumes want.
    e = jnp.clip(jnp.asarray(epoch, jnp.float32), 0.0, float(cfg.epochs))
    return ((1 - jnp.cos(e * math.pi / cfg.epochs)) / 2) * (cfg.lrf - 1) + 1


def warmup_steps(cfg: SolverConfig) -> int:
    return max(round(cfg.warmup_epochs * cfg.steps_per_epoch), 1000)


def schedule(cfg: SolverConfig, step):
    """(lr_weights, lr_bias, momentum) at a global step (engine.py:338-347).

    The reference steps the cosine scheduler once per epoch, so the target lr
    within an epoch is lr0 * lf(epoch).
    """
    step = jnp.asarray(step, jnp.float32)
    epoch = jnp.floor(step / cfg.steps_per_epoch)
    base = cfg.lr0 * lr_lambda(cfg, epoch)
    wsteps = float(warmup_steps(cfg))
    frac = jnp.clip(step / wsteps, 0.0, 1.0)
    in_warm = step <= wsteps
    lr_w = jnp.where(in_warm, frac * base, base)
    lr_b = jnp.where(in_warm, cfg.warmup_bias_lr + frac * (base - cfg.warmup_bias_lr),
                     base)
    mom = jnp.where(in_warm,
                    cfg.warmup_momentum + frac * (cfg.momentum - cfg.warmup_momentum),
                    cfg.momentum)
    return lr_w, lr_b, mom


def accumulate_steps(cfg: SolverConfig, batch_size: int, step):
    """Gradient-accumulation count (engine.py:339-341): nominal effective
    batch 64, interpolated from 1 during warmup."""
    nominal = max(1.0, round(64.0 / batch_size))
    step = jnp.asarray(step, jnp.float32)
    wsteps = float(warmup_steps(cfg))
    frac = jnp.clip(step / wsteps, 0.0, 1.0)
    warm = jnp.round(1.0 + frac * (64.0 / batch_size - 1.0))
    return jnp.where(step <= wsteps, jnp.maximum(warm, 1.0), nominal)


def param_group_label(path) -> str:
    """'bias' | 'bnw' (BN scale) | 'w' (everything else, weight-decayed) —
    mirrors build_optimizer's module walk (solver/build.py:14-21)."""
    leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if leaf == "bias":
        return "bias"
    if leaf == "scale":
        return "bnw"
    return "w"


def label_tree(params) -> Dict:
    return jax.tree_util.tree_map_with_path(
        lambda path, _: param_group_label(path), params)


def init_momentum(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def sgd_apply(params, grads, momentum_buf, labels, lr_w, lr_b, mom,
              weight_decay: float, grad_masks=None):
    """Torch-SGD step: d = g*mask (+ wd*p for 'w'); v = mom*v + d;
    nesterov step = d + mom*v; p -= lr * step. grad_masks implements the
    RepOpt per-weight mask (RepOptimizer.py:159-195)."""

    def upd(p, g, v, lab, m):
        g = g.astype(jnp.float32)
        if m is not None:
            g = g * m
        d = g + (weight_decay * p if lab == "w" else 0.0)
        v_new = mom * v + d
        step = d + mom * v_new  # nesterov
        lr = lr_b if lab == "bias" else lr_w
        return p - lr * step, v_new

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_v = treedef.flatten_up_to(momentum_buf)
    flat_l = treedef.flatten_up_to(labels)
    flat_m = (treedef.flatten_up_to(grad_masks) if grad_masks is not None
              else [None] * len(flat_p))
    out = [upd(p, g, v, l, m)
           for p, g, v, l, m in zip(flat_p, flat_g, flat_v, flat_l, flat_m)]
    new_p = jax.tree_util.tree_unflatten(treedef, [o[0] for o in out])
    new_v = jax.tree_util.tree_unflatten(treedef, [o[1] for o in out])
    return new_p, new_v


def ema_decay(updates):
    """decay(u) = 0.9999 * (1 - exp(-u / 2000)) (ema.py:26)."""
    return 0.9999 * (1.0 - jnp.exp(-jnp.asarray(updates, jnp.float32) / 2000.0))


def ema_update(ema_tree, new_tree, updates):
    d = ema_decay(updates)
    return jax.tree_util.tree_map(
        lambda e, p: d * e + (1.0 - d) * p.astype(e.dtype), ema_tree, new_tree)
