"""Integration: the jitted train step reduces the loss on a synthetic batch,
updates EMA, and respects gradient accumulation."""

import numpy as np

import jax
import jax.numpy as jnp

from yololp_tpu.core.train_step import init_train_state, make_train_step
from yololp_tpu.losses.loss import LossConfig
from yololp_tpu.models import build_model
from yololp_tpu.solver.build import SolverConfig
from yololp_tpu.utils.config import Config
import conftest  # noqa: F401

IMG = 128
rng = np.random.default_rng(3)


def synthetic_batch(bsz=2, n=2):
    """Images with bright rectangles as fake plates + matching labels."""
    imgs = rng.integers(0, 80, (bsz, IMG, IMG, 3), np.uint8)
    labels = np.zeros((bsz, n, 20), np.float32)
    labels[..., :8] = -1
    mask = np.zeros((bsz, n), np.float32)
    for b in range(bsz):
        for i in range(n):
            cx, cy = rng.uniform(0.3, 0.7, 2)
            w, h = rng.uniform(0.2, 0.3), rng.uniform(0.1, 0.15)
            x1, y1 = int((cx - w / 2) * IMG), int((cy - h / 2) * IMG)
            x2, y2 = int((cx + w / 2) * IMG), int((cy + h / 2) * IMG)
            imgs[b, y1:y2, x1:x2] = 220
            labels[b, i, 0] = rng.integers(0, 31)
            labels[b, i, 1] = rng.integers(0, 24)
            labels[b, i, 2:8] = rng.integers(0, 37, 6)
            labels[b, i, 8:12] = [cx, cy, w, h]
            labels[b, i, 12:20] = [cx - w / 2, cy - h / 2, cx - w / 2, cy + h / 2,
                                   cx + w / 2, cy + h / 2, cx + w / 2, cy - h / 2]
            mask[b, i] = 1
    return (jnp.asarray(imgs), jnp.asarray(labels), jnp.asarray(mask))


def test_loss_decreases_and_ema_moves():
    cfg = Config.named("yololpn")
    model, variables = build_model(cfg, img_size=(IMG, IMG))
    state = init_train_state(variables)

    loss_cfg = LossConfig(img_size=(IMG, IMG), iou_type="siou")
    solver = SolverConfig(lr0=0.02, epochs=10, steps_per_epoch=10,
                          warmup_epochs=0.0)
    # warmup_steps is still max(...,1000); use large lr0 to see movement anyway
    step_fn = jax.jit(make_train_step(model, loss_cfg, solver, batch_size=64))

    imgs, labels, mask = synthetic_batch()
    losses = []
    for _ in range(8):
        state, total, items = step_fn(state, imgs, labels, mask)
        losses.append(float(total))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses
    assert int(state.ema_updates) == 8  # batch 64 -> accumulate 1, step every time
    # EMA must have moved off the init params
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    e0 = jax.tree_util.tree_leaves(state.ema_params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(e0))


def test_grad_accumulation_gates_updates():
    cfg = Config.named("yololpn")
    model, variables = build_model(cfg, img_size=(IMG, IMG))
    state = init_train_state(variables)
    loss_cfg = LossConfig(img_size=(IMG, IMG), iou_type="siou")
    # batch 16 -> nominal accumulate 4; skip warmup by a huge steps_per_epoch
    solver = SolverConfig(epochs=10, steps_per_epoch=10, warmup_epochs=0.0)
    step_fn = jax.jit(make_train_step(model, loss_cfg, solver, batch_size=16))
    imgs, labels, mask = synthetic_batch()
    # during warmup accumulate interpolates from 1; at step 0 it's 1 -> step
    state, _, _ = step_fn(state, imgs, labels, mask)
    first = int(state.ema_updates)
    state, _, _ = step_fn(state, imgs, labels, mask)
    state, _, _ = step_fn(state, imgs, labels, mask)
    assert first == 1
    # within warmup, accumulate grows; updates happen at the interpolated gap
    assert int(state.step) == 3
