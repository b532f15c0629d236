"""PTQ/QAT tests: fake-quant numerics + STE, calibration capture, quantized
forward staying close to fp32."""

import numpy as np

import jax
import jax.numpy as jnp

import conftest  # noqa: F401
from yololp_tpu.layers.fuse import fuse_variables
from yololp_tpu.models import Model, build_model
from yololp_tpu.quant.quantize import (
    calibrate,
    fake_quant,
    quantize_weights,
    quantized_apply,
)
from yololp_tpu.utils.config import Config

rng = np.random.default_rng(9)


def test_fake_quant_values_and_ste():
    x = jnp.asarray([-3.0, -1.0, 0.01, 1.0, 2.5])
    amax = jnp.asarray(2.0)
    y = np.asarray(fake_quant(x, amax))
    scale = 2.0 / 127
    assert abs(y[2] - round(0.01 / scale) * scale) < 1e-6
    assert y[4] <= 2.0 + scale  # clipped near amax
    # STE: grad passes inside range, zero outside
    g = jax.grad(lambda v: fake_quant(v, amax).sum())(x)
    np.testing.assert_allclose(np.asarray(g), [0, 1, 1, 1, 0])


def test_calibrate_and_quantized_forward_close():
    cfg = Config.named("yololpn")
    _, train_vars = build_model(cfg, img_size=(64, 64))
    variables = fuse_variables(train_vars)
    model = Model(config=cfg, deploy=True)

    batches = [rng.integers(0, 255, (1, 64, 64, 3), np.uint8) for _ in range(2)]
    amax = calibrate(model, variables, batches, method="max")
    assert len(amax) > 20  # every conv observed
    assert all(v > 0 for v in amax.values())
    assert not any("proj_conv" in k for k in amax)

    x = jnp.asarray(batches[0]).astype(jnp.float32) / 255.0
    y_fp = model.apply(variables, x, train=False)

    qvars = {"params": quantize_weights(variables["params"])}
    y_q = quantized_apply(model, qvars, x, amax)
    # int8 should track fp32 closely on scores (sigmoid-compressed)
    err = np.abs(np.asarray(y_q[..., 13:]) - np.asarray(y_fp[..., 13:])).max()
    assert err < 0.1, err
    # and the box columns shouldn't explode
    rel = (np.abs(np.asarray(y_q[..., :4]) - np.asarray(y_fp[..., :4])).mean()
           / (np.abs(np.asarray(y_fp[..., :4])).mean() + 1e-6))
    assert rel < 0.2, rel


def test_histogram_calibration_runs():
    cfg = Config.named("yololpn")
    _, train_vars = build_model(cfg, img_size=(64, 64))
    variables = fuse_variables(train_vars)
    model = Model(config=cfg, deploy=True)
    batches = [rng.integers(0, 255, (1, 64, 64, 3), np.uint8)]
    for method in ("percentile", "entropy", "mse"):
        amax = calibrate(model, variables, batches, method=method)
        assert all(v > 0 for v in amax.values())
