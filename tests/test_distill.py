"""LP knowledge-distillation loss tests."""

import numpy as np

import jax
import jax.numpy as jnp

import conftest  # noqa: F401
from yololp_tpu.losses.distill import distill_loss, distill_weight_schedule
from yololp_tpu.models.effidehead import HeadTrainOutput

rng = np.random.default_rng(13)


def rand_out(a=100, seed=0):
    r = np.random.default_rng(seed)
    sig = lambda s: r.uniform(0.01, 0.99, s).astype(np.float32)
    return HeadTrainOutput(
        None, jnp.asarray(sig((2, a, 31))), jnp.asarray(sig((2, a, 24))),
        jnp.asarray(sig((2, a, 6, 37))),
        jnp.asarray(r.normal(0, 2, (2, a, 4)).astype(np.float32)),
        jnp.asarray(r.normal(0, 2, (2, a, 8)).astype(np.float32)))


def test_distill_zero_when_matched():
    out = rand_out(seed=1)
    fg = jnp.ones((2, 100))
    cls_kd, dfl_kd = distill_loss(out, out, fg)
    assert abs(float(cls_kd)) < 1e-3  # KL(p || p) == 0
    assert float(dfl_kd) == 0.0


def test_distill_positive_and_differentiable():
    student = rand_out(seed=2)
    teacher = rand_out(seed=3)
    fg = jnp.asarray((rng.uniform(0, 1, (2, 100)) > 0.7).astype(np.float32))

    def loss(pro):
        s = student._replace(pro=pro)
        cls_kd, _ = distill_loss(s, teacher, fg)
        return cls_kd

    v = float(loss(student.pro))
    assert v > 0
    g = jax.grad(loss)(student.pro)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
    # no gradient through anchors outside fg
    g_np = np.asarray(jnp.abs(g).sum(-1))
    assert (g_np[np.asarray(fg) == 0] == 0).all()


def test_distill_weight_schedule_monotone():
    w0 = float(distill_weight_schedule(0, 100))
    w50 = float(distill_weight_schedule(50, 100))
    w100 = float(distill_weight_schedule(100, 100))
    assert w0 == 1.0 and 0.4 < w50 < 0.6 and w100 < 1e-6
