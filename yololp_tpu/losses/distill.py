"""Knowledge distillation for the LP head — designed new, not ported.

The reference ships distillation losses (losses/loss_distill*.py) that
CANNOT run against the LP head: they expect the generic 3-tuple head output
and a single class set (SURVEY.md §2.11), so `--distill` crashes upstream.
This is the working LP equivalent, following the same recipe the reference
applies to generic YOLOv6 (temperature-softened KL on class logits + KL on
the DFL box distribution, cosine-decayed over training):

  * 8 classification KLs (province, alphabet, 6 characters), teacher and
    student probabilities re-softened with temperature T over each task's
    class axis, averaged over foreground anchors.
  * optional DFL distribution KL when both heads carry reg_max bins.
  * weight decays as (1 - cos(pi * epoch / epochs)) / 2 ... inverted:
    the reference uses distill_weight_decay = 1 - 0.99 * (epoch / epochs)
    style ramps; we expose the multiplier as an argument computed by the
    caller so schedules stay in one place.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yololp_tpu.models.effidehead import HeadTrainOutput

_EPS = 1e-9


def _kl(p_teacher, p_student):
    """KL(teacher || student) over the last axis; inputs are probabilities
    (sigmoid scores renormalized per task)."""
    pt = p_teacher / (p_teacher.sum(-1, keepdims=True) + _EPS)
    ps = p_student / (p_student.sum(-1, keepdims=True) + _EPS)
    return (pt * (jnp.log(pt + _EPS) - jnp.log(ps + _EPS))).sum(-1)


def _temper(p, temperature: float):
    """Temperature-soften probabilities: p^(1/T), renormalized in _kl."""
    return jnp.power(jnp.clip(p, _EPS, 1.0), 1.0 / temperature)


def distill_loss(student: HeadTrainOutput, teacher: HeadTrainOutput,
                 fg_mask: jnp.ndarray, temperature: float = 20.0,
                 use_dfl: bool = False, reg_max: int = 0):
    """Returns (cls_kd, dfl_kd) scalars, averaged over foreground anchors.

    fg_mask: (B, A) from the assigner — distillation focuses on anchors the
    task loss supervises, like the reference's masked distill.
    """
    fg = fg_mask.astype(jnp.float32)
    denom = jnp.maximum(fg.sum(), 1.0)
    t = lambda x: _temper(jax.lax.stop_gradient(x), temperature)
    s = lambda x: _temper(x, temperature)

    kd = _kl(t(teacher.pro), s(student.pro))          # (B, A)
    kd = kd + _kl(t(teacher.alp), s(student.alp))
    kd = kd + _kl(t(teacher.ads), s(student.ads)).sum(-1)  # sum 6 slots
    cls_kd = (kd / 8.0 * fg).sum() / denom * (temperature ** 2)

    if use_dfl and reg_max > 0:
        b, a, _ = student.reg.shape
        ps = jax.nn.softmax(
            student.reg.reshape(b, a, 4, reg_max + 1) / temperature, -1)
        pt = jax.nn.softmax(
            jax.lax.stop_gradient(teacher.reg).reshape(b, a, 4, reg_max + 1)
            / temperature, -1)
        dfl = (pt * (jnp.log(pt + _EPS) - jnp.log(ps + _EPS))).sum(-1).mean(-1)
        dfl_kd = (dfl * fg).sum() / denom * (temperature ** 2)
    else:
        dfl_kd = jnp.zeros(())
    return cls_kd, dfl_kd


def distill_weight_schedule(epoch, epochs: int):
    """Cosine ramp-down of the distillation weight over training
    (the reference decays distill influence late in training)."""
    e = jnp.asarray(epoch, jnp.float32)
    return (1 + jnp.cos(e * jnp.pi / max(epochs, 1))) / 2
