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


# ---- histogram calibration numerics (match pytorch-quantization's
# calibrator semantics: well-defined cross-batch merge + the TRT-style
# entropy / percentile / mse amax procedures in tools/qat/qat_utils.py) ----


class _OneConv(__import__("flax").linen.Module):
    """Minimal quantizable model: one conv whose input is the image itself,
    so the captured calibration histogram is exactly computable on host."""
    dtype = jnp.float32

    @__import__("flax").linen.compact
    def __call__(self, x, train=False):
        import flax.linen as nn
        return nn.Conv(4, (1, 1), name="conv")(x)


def _one_conv_setup():
    m = _OneConv()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    return m, v


def test_two_pass_histogram_merge_is_exact():
    """Merged per-batch histograms == one histogram of ALL the data: the
    property round-2's per-batch-amax binning violated."""
    from yololp_tpu.quant.quantize import (HIST_BINS, make_calib_fn,
                                           merge_calib_stats)

    model, variables = _one_conv_setup()
    # different per-batch maxima (the failure mode of per-batch binning)
    b1 = rng.integers(0, 100, (2, 8, 8, 3), np.uint8)
    b2 = rng.integers(0, 255, (2, 8, 8, 3), np.uint8)

    max_fn = make_calib_fn(model, variables, mode="max")
    gmax = merge_calib_stats(
        [jax.device_get(max_fn(jnp.asarray(b))) for b in (b1, b2)], "max")
    (path, amax), = gmax.items()
    np.testing.assert_allclose(amax, max(b1.max(), b2.max()) / 255.0, rtol=1e-6)

    hist_fn = make_calib_fn(model, variables, mode="histogram",
                            amax_by_path=gmax)
    merged = merge_calib_stats(
        [jax.device_get(hist_fn(jnp.asarray(b))) for b in (b1, b2)],
        "histogram")

    # exactness: per-batch histograms summed == histogram of ALL the data
    # binned the same way (device arithmetic both sides, so bit-identical)
    both = jnp.asarray(np.concatenate([b1, b2]))
    expected = np.asarray(jax.device_get(hist_fn(both))[path])
    np.testing.assert_array_equal(merged[path], expected)
    assert merged[path].sum() == b1.size + b2.size


def test_percentile_amax_hand_case():
    from yololp_tpu.quant.quantize import _amax_percentile

    # 100 counts in bin 0, 1 count in bin 9 -> 99th percentile lands in the
    # first bin whose cdf >= 0.99: bin 0 (cdf 100/101=0.9901); right edge 0.1
    hist = np.zeros(10)
    hist[0], hist[9] = 100, 1
    edges = np.linspace(0, 1.0, 11)
    assert abs(_amax_percentile(hist, edges, 99.0) - 0.1) < 1e-12
    # 100% keeps everything
    assert abs(_amax_percentile(hist, edges, 100.0) - 1.0) < 1e-12


def test_entropy_amax_clips_outlier_tail():
    """A mass near zero plus a tiny far outlier: KL-optimal clip should sit
    far below the outlier; uniform data should keep amax near the top."""
    from yololp_tpu.quant.quantize import HIST_BINS, _amax_entropy

    edges = np.linspace(0, 1.0, HIST_BINS + 1)
    bulk = np.zeros(HIST_BINS)
    # decaying bulk in [0, 0.125]: re-binning to 128 levels loses detail at
    # wide clips (constant bulk would re-quantize losslessly at ANY clip)
    bulk[:256] = 1e5 * np.exp(-np.arange(256) / 32.0)
    bulk[-1] = 1.0        # single far outlier at ~1.0
    a = _amax_entropy(bulk, edges)
    assert a < 0.5, a

    # constant density re-quantizes losslessly -> widest clip wins exactly
    uni = np.full(HIST_BINS, 100.0)
    a_uni = _amax_entropy(uni, edges)
    assert a_uni == edges[-1], a_uni


def test_entropy_amax_respects_start_bin_floor():
    from yololp_tpu.quant.quantize import HIST_BINS, _amax_entropy

    edges = np.linspace(0, 1.0, HIST_BINS + 1)
    h = np.zeros(HIST_BINS)
    h[:4] = 1.0  # everything far below start_bin
    a = _amax_entropy(h, edges)
    assert a >= edges[128] - 1e-12  # candidates start at start_bin=128


def test_mse_amax_is_bruteforce_argmin():
    from yololp_tpu.quant.quantize import HIST_BINS, _amax_mse

    h = np.abs(rng.normal(0, 1, 4000))
    top = h.max()
    hist, edges = np.histogram(h, bins=HIST_BINS, range=(0, top))
    a = _amax_mse(hist.astype(np.float64), edges)

    centers = (edges[:-1] + edges[1:]) / 2.0
    qmax = 127.0
    errs = []
    cands = range(128, len(centers))
    for i in cands:
        scale = centers[i] / qmax
        q = np.clip(np.round(centers / scale), -128, 127) * scale
        errs.append((hist * (centers - q) ** 2).sum())
    best = centers[list(cands)[int(np.argmin(errs))]]
    np.testing.assert_allclose(a, best, rtol=1e-12)
    # gaussian: mse-optimal clip sits below the observed max
    assert a < top
