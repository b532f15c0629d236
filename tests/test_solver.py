"""Solver schedule parity: cosine lambda + warmup interpolation vs the
reference's formulas (solver/build.py lf + engine.py:338 np.interp)."""

import math

import numpy as np

import conftest  # noqa: F401
from yololp_tpu.solver.build import (
    SolverConfig,
    accumulate_steps,
    ema_decay,
    schedule,
    warmup_steps,
)


def ref_lf(epoch, epochs, lrf):
    return ((1 - math.cos(epoch * math.pi / epochs)) / 2) * (lrf - 1) + 1


def test_schedule_matches_reference_interp():
    cfg = SolverConfig(lr0=0.01, lrf=0.01, momentum=0.937, warmup_epochs=3.0,
                       warmup_momentum=0.8, warmup_bias_lr=0.1, epochs=300,
                       steps_per_epoch=500)
    wsteps = warmup_steps(cfg)
    assert wsteps == max(round(3.0 * 500), 1000)

    for step in [0, 1, 500, 1499, 1500, 1501, 5000, 149_999]:
        epoch = step // 500
        base = 0.01 * ref_lf(epoch, 300, 0.01)
        lr_w, lr_b, mom = (float(v) for v in schedule(cfg, step))
        if step <= wsteps:
            exp_w = np.interp(step, [0, wsteps], [0.0, base])
            exp_b = np.interp(step, [0, wsteps], [0.1, base])
            exp_m = np.interp(step, [0, wsteps], [0.8, 0.937])
        else:
            exp_w = exp_b = base
            exp_m = 0.937
        np.testing.assert_allclose(lr_w, exp_w, rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(lr_b, exp_b, rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(mom, exp_m, rtol=1e-5)


def test_accumulate_matches_reference():
    cfg = SolverConfig(warmup_epochs=3.0, steps_per_epoch=500)
    wsteps = warmup_steps(cfg)
    batch = 16  # nominal accumulate 4
    for step in [0, wsteps // 2, wsteps, wsteps + 1]:
        acc = float(accumulate_steps(cfg, batch, step))
        if step <= wsteps:
            exp = max(1, round(float(np.interp(step, [0, wsteps],
                                               [1, 64 / batch]))))
            assert acc == exp, (step, acc, exp)
        else:
            assert acc == 4


def test_ema_decay_matches_reference():
    for u in [1, 100, 2000, 100000]:
        ref = 0.9999 * (1 - math.exp(-u / 2000))
        np.testing.assert_allclose(float(ema_decay(u)), ref, rtol=1e-4)  # f32


def test_cosine_lr_clamped_past_schedule_domain():
    """A run resumed with a shorter --epochs (QAT finetune resuming a long
    RepOpt run: state.step >> epochs*steps_per_epoch) must hold the terminal
    lrf, not swing the cosine past pi and above lr0."""
    from yololp_tpu.solver.build import SolverConfig, schedule

    cfg = SolverConfig(lr0=0.02, lrf=0.01, epochs=15, steps_per_epoch=10,
                       warmup_epochs=0.0)
    wsteps = 1000  # warmup floor: max(round(0*10), 1000)
    lr_end, _, _ = schedule(cfg, wsteps + cfg.epochs * cfg.steps_per_epoch)
    for step in (wsteps + 80 * 10, wsteps + 800 * 10):  # far past the domain
        lr_w, lr_b, _ = schedule(cfg, step)
        np.testing.assert_allclose(float(lr_w), float(lr_end), rtol=1e-6)
        assert float(lr_w) <= cfg.lr0 * 1.0 + 1e-9
