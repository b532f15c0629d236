"""True-int8 inference tests: int8 conv arithmetic matches fake-quant, and
the full int8 pipeline tracks fp32 closely."""

import numpy as np

import jax
import jax.numpy as jnp

import conftest  # noqa: F401
from yololp_tpu.layers.fuse import fuse_variables
from yololp_tpu.models import Model, build_model
from yololp_tpu.quant.int8_infer import int8_apply, quantize_kernels_int8
from yololp_tpu.quant.quantize import calibrate, quantize_weights, quantized_apply
from yololp_tpu.utils.config import Config

rng = np.random.default_rng(17)


def test_int8_matches_fake_quant_single_conv():
    """conv(int8,int8)*sx*sw + b == conv(dequant(x_q), dequant(w_q)) + b."""
    x = rng.normal(0, 1, (2, 16, 16, 8)).astype(np.float32)
    w = rng.normal(0, 0.2, (3, 3, 8, 16)).astype(np.float32)
    b = rng.normal(0, 0.1, 16).astype(np.float32)
    sx = float(np.abs(x).max()) / 127.0
    sw = np.abs(w).max(axis=(0, 1, 2)) / 127.0
    xq = np.clip(np.round(x / sx), -128, 127).astype(np.int8)
    wq = np.clip(np.round(w / sw), -128, 127).astype(np.int8)

    y_int = jax.lax.conv_general_dilated(
        jnp.asarray(xq), jnp.asarray(wq), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y_int = np.asarray(y_int).astype(np.float64) * (sx * sw) + b

    y_fq = jax.lax.conv_general_dilated(
        jnp.asarray(xq.astype(np.float32) * sx),
        jnp.asarray(wq.astype(np.float32) * sw), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_fq = np.asarray(y_fq) + b
    np.testing.assert_allclose(y_int, y_fq, rtol=1e-4, atol=1e-4)


def test_int8_full_model_close_to_fp():
    cfg = Config.named("yololpn")
    _, tv = build_model(cfg, img_size=(64, 64))
    variables = fuse_variables(tv)
    model = Model(config=cfg, deploy=True)
    batch = rng.integers(0, 255, (1, 64, 64, 3), np.uint8)
    amax = calibrate(model, variables, [batch], method="max")
    table = quantize_kernels_int8(variables["params"])
    assert set(table) >= set(amax)

    x = jnp.asarray(batch).astype(jnp.float32) / 255.0
    y_fp = model.apply(variables, x, train=False)
    y_i8 = int8_apply(model, variables, x, amax, table, train=False)
    # scores (sigmoid-compressed) should track fp closely
    err = np.abs(np.asarray(y_i8[..., 13:]) - np.asarray(y_fp[..., 13:])).max()
    assert err < 0.15, err

    # int8 execution should agree with the fake-quant simulation tightly
    qvars = {"params": quantize_weights(variables["params"])}
    y_fq = quantized_apply(model, qvars, x, amax)
    err_sim = np.abs(np.asarray(y_i8[..., 13:]) - np.asarray(y_fq[..., 13:])).max()
    assert err_sim < 0.05, err_sim


def test_int8_chained_repblocks_match_per_conv():
    """The fused int8->int8 RepBlock chain must agree with the per-conv
    quantize/dequant path (identical math up to the dtype the inter-link
    activation is rounded in: f32 accumulator chain vs bf16 round-trip)."""
    cfg = Config.named("yololpn")
    _, tv = build_model(cfg, img_size=(64, 64))
    variables = fuse_variables(tv)
    model = Model(config=cfg, deploy=True)
    batch = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)
    amax = calibrate(model, variables, [batch], method="max")
    table = quantize_kernels_int8(variables["params"])

    # the chain must actually engage: yololpn has RepVGG RepBlock stages
    # whose every sub-conv is calibrated
    chain_paths = [p for p in amax if "_rep/" in p and "/conv" in p]
    assert chain_paths, sorted(amax)[:8]

    x = jnp.asarray(batch).astype(jnp.float32) / 255.0
    # spy on _chain_repblock so a naming-contract drift (the exact hazard
    # layers/blocks.py documents) cannot make this test pass vacuously by
    # silently falling back to the per-conv path on both sides
    import yololp_tpu.quant.int8_infer as int8_mod

    calls = []
    real_chain = int8_mod._chain_repblock

    def spy(*a, **kw):
        calls.append(1)
        return real_chain(*a, **kw)

    int8_mod._chain_repblock = spy
    try:
        y_chain = int8_apply(model, variables, x, amax, table, train=False,
                             chain_repblocks=True)
    finally:
        int8_mod._chain_repblock = real_chain
    assert calls, "int8 RepBlock chain interceptor never engaged"
    y_per = int8_apply(model, variables, x, amax, table, train=False,
                       chain_repblocks=False)
    err = np.abs(np.asarray(y_chain[..., 13:])
                 - np.asarray(y_per[..., 13:])).max()
    assert err < 0.05, err
    # boxes (first 4 cols, absolute pixels) within a quantization step
    berr = np.abs(np.asarray(y_chain[..., :4])
                  - np.asarray(y_per[..., :4])).max()
    assert berr < 2.0, berr


def test_int8_stage_handoffs_match_non_handoff():
    """Backbone stage-boundary handoffs (producer conv requantizes its
    int32 accumulator straight to the consumer's calibrated int8 scale)
    must agree with the non-handoff path, and must actually engage on the
    EfficientRep spine (stem + 4 downsamples)."""
    from yololp_tpu.quant.int8_infer import backbone_handoffs

    cfg = Config.named("yololpn")
    _, tv = build_model(cfg, img_size=(64, 64))
    variables = fuse_variables(tv)
    model = Model(config=cfg, deploy=True)
    batch = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)
    amax = calibrate(model, variables, [batch], method="max")
    table = quantize_kernels_int8(variables["params"])

    hand = backbone_handoffs(amax, table)
    # ERBlock_2..5 downsample->rep seams; the stem seam is gone since the
    # stem joined DEFAULT_SKIP_SUBSTRINGS (slower quantized than bf16 —
    # see quantize.py)
    assert len(hand) >= 4, sorted(hand)
    assert not any("stem" in p for p in hand), sorted(hand)
    for prod, cons in hand.items():
        assert prod in amax and cons in amax

    x = jnp.asarray(batch).astype(jnp.float32) / 255.0
    y_h = int8_apply(model, variables, x, amax, table, train=False,
                     stage_handoffs=True)
    y_n = int8_apply(model, variables, x, amax, table, train=False,
                     stage_handoffs=False)
    # same math up to inter-stage rounding (f32 requant vs bf16 round-trip)
    err = np.abs(np.asarray(y_h[..., 13:]) - np.asarray(y_n[..., 13:])).max()
    assert err < 0.05, err
    berr = np.abs(np.asarray(y_h[..., :4]) - np.asarray(y_n[..., :4])).max()
    assert berr < 2.0, berr


def test_int8_conv_as_dots_bit_exact():
    """conv_impl="dots" (3x3/1x1 convs rerouted onto the matmul path,
    int8_infer.conv3x3_as_dots) is an integer-sum reassociation of the
    same quantized network: predictions must be BIT-identical to the
    conv-path executor, per-conv and fused alike."""
    cfg = Config.named("yololpn")
    _, tv = build_model(cfg, img_size=(64, 64))
    variables = fuse_variables(tv)
    model = Model(config=cfg, deploy=True)
    batch = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)
    amax = calibrate(model, variables, [batch], method="max")
    table = quantize_kernels_int8(variables["params"])
    x = jnp.asarray(batch).astype(jnp.float32) / 255.0

    for chain, handoff in ((False, False), (True, True)):
        y_conv = int8_apply(model, variables, x, amax, table, train=False,
                            chain_repblocks=chain, stage_handoffs=handoff,
                            conv_impl="conv")
        y_dots = int8_apply(model, variables, x, amax, table, train=False,
                            chain_repblocks=chain, stage_handoffs=handoff,
                            conv_impl="dots")
        np.testing.assert_array_equal(np.asarray(y_conv), np.asarray(y_dots))

def test_int8_conv_impl_pallas_matches_conv():
    """conv_impl="pallas" swaps RepBlock chains onto the fused pallas
    kernel (ops/pallas_conv.chain_repblock_pallas); interior int8 links
    are bit-identical math, only the chain-exit bf16 cast can wobble by
    one ULP (FMA contraction), so predictions must agree tightly."""
    cfg = Config.named("yololpn")
    _, tv = build_model(cfg, img_size=(64, 64))
    variables = fuse_variables(tv)
    model = Model(config=cfg, deploy=True)
    batch = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)
    amax = calibrate(model, variables, [batch], method="max")
    table = quantize_kernels_int8(variables["params"])
    x = jnp.asarray(batch).astype(jnp.float32) / 255.0

    y_conv = int8_apply(model, variables, x, amax, table, train=False,
                        conv_impl="conv")
    y_pal = int8_apply(model, variables, x, amax, table, train=False,
                       conv_impl="pallas")
    np.testing.assert_allclose(np.asarray(y_pal[..., 13:]),
                               np.asarray(y_conv[..., 13:]),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(y_pal[..., :4]),
                               np.asarray(y_conv[..., :4]),
                               rtol=2e-2, atol=0.5)


def test_int8_graph_handoffs_cover_neck_and_head_seams():
    """r5 extension (VERDICT r4 #3): graph_handoffs must reach past the
    backbone spine — SPPF internals, the SPPF->reduce_layer0 seam and the
    BiFusion cv2->downsample seams — and chain_exit_handoffs must hand the
    Rep_p4 / Rep_n4 / ERBlock_5_rep chain exits to their single conv
    consumers. The fully-handed-off pipeline must agree with the
    no-handoff executor (same math up to f32-requant vs bf16 round-trip
    rounding)."""
    from yololp_tpu.quant.int8_infer import (backbone_handoffs,
                                             chain_exit_handoffs,
                                             graph_handoffs)

    cfg = Config.named("yololpn")
    _, tv = build_model(cfg, img_size=(64, 64))
    variables = fuse_variables(tv)
    model = Model(config=cfg, deploy=True)
    batch = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)
    amax = calibrate(model, variables, [batch], method="max")
    table = quantize_kernels_int8(variables["params"])

    hand = graph_handoffs(amax, table)
    back = backbone_handoffs(amax, table)
    assert set(hand) > set(back), "graph map must extend the backbone map"
    # the LP models use SimCSPSPPF (configs/yololp{n,s}.py cspsppf=True):
    # the full cv1->cv3->cv4->(pools)->cv5->cv6->cv7 spine plus the cv2
    # bypass must be handed off, and cv7 exits straight into the neck
    sppf = "backbone/ERBlock_5_sppf/"
    for a, b in (("cv1", "cv3"), ("cv3", "cv4"), ("cv4", "cv5"),
                 ("cv5", "cv6"), ("cv6", "cv7"), ("cv2", "cv7")):
        assert hand[f"{sppf}{a}/conv"] == f"{sppf}{b}/conv", (a, b)
    assert hand[f"{sppf}cv7/conv"] == "neck/reduce_layer0/conv"
    assert hand["neck/Bifusion0/cv2/conv"] == "neck/Bifusion0/downsample/conv"
    assert hand["neck/Bifusion1/cv2/conv"] == "neck/Bifusion1/downsample/conv"

    exits = chain_exit_handoffs(amax, table)
    # CSP-SPPF: cv1 AND cv2 both consume the block input, so the
    # ERBlock_5_rep exit is NOT single-consumer and must not be emitted
    # (it would hand cv2 codes at cv1's scale under non-max calibration)
    assert "backbone/ERBlock_5_rep" not in exits
    assert exits["neck/Rep_p4"] == "neck/reduce_layer1/conv"
    assert exits["neck/Rep_n4"] == "detect/stem2/conv"
    # multi-consumer exits must NOT be emitted
    assert "neck/Rep_p3" not in exits and "neck/Rep_n3" not in exits

    x = jnp.asarray(batch).astype(jnp.float32) / 255.0
    y_h = int8_apply(model, variables, x, amax, table, train=False,
                     chain_repblocks=True, stage_handoffs=True)
    y_n = int8_apply(model, variables, x, amax, table, train=False,
                     chain_repblocks=True, stage_handoffs=False)
    err = np.abs(np.asarray(y_h[..., 13:]) - np.asarray(y_n[..., 13:])).max()
    assert err < 0.05, err
    berr = np.abs(np.asarray(y_h[..., :4]) - np.asarray(y_n[..., :4])).max()
    assert berr < 2.0, berr


def test_chain_exit_handoffs_plain_vs_csp_sppf_unit():
    """Unit-level: a plain-SPPF path set emits the ERBlock_5_rep->cv1
    exit; a CSP-SPPF path set (cv7 present) must not — there cv1 AND cv2
    both consume the block input, so codes handed off at cv1's scale
    would reach cv2 at the wrong scale under non-max calibration."""
    from yololp_tpu.quant.int8_infer import chain_exit_handoffs

    def fake(paths):
        return {p: 1.0 for p in paths}, {p: ("w", "s", "b") for p in paths}

    plain = ["backbone/ERBlock_5_rep/conv1/conv",
             "backbone/ERBlock_5_sppf/cv1/conv",
             "backbone/ERBlock_5_sppf/cv2/conv"]
    amax, table = fake(plain)
    exits = chain_exit_handoffs(amax, table)
    assert exits["backbone/ERBlock_5_rep"] == \
        "backbone/ERBlock_5_sppf/cv1/conv"

    amax, table = fake(plain + ["backbone/ERBlock_5_sppf/cv7/conv"])
    exits = chain_exit_handoffs(amax, table)
    assert "backbone/ERBlock_5_rep" not in exits


def test_int8_sppf_maxpool_requant_commutes():
    """The SPPF cv1->cv2 handoff's legality rests on max_pool commuting
    with the monotone requant: maxpool(requant(x)) == requant(maxpool(x))
    element-exactly."""
    from flax import linen as nn

    z = rng.normal(0, 3, (2, 16, 16, 8)).astype(np.float32)
    z = np.maximum(z, 0)  # post-relu activations
    s = float(np.abs(z).max()) / 127.0
    req = lambda t: np.clip(np.round(t / s), 0, 127).astype(np.int8)
    pool = lambda t: np.asarray(
        nn.max_pool(jnp.asarray(t), (5, 5), strides=(1, 1),
                    padding=((2, 2), (2, 2))))
    np.testing.assert_array_equal(pool(req(z)), req(pool(z)))
