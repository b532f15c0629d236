"""True int8 inference: conv(int8, int8) -> int32 on the MXU.

The PTQ/QAT flow (quant/quantize.py) simulates int8 with fake-quant; this
module EXECUTES it: per-conv inputs are quantized to int8 with the
calibrated per-tensor amax, kernels to int8 with per-output-channel scales,
and the convolution runs with int8 operands and int32 accumulation
(preferred_element_type) — the v5e MXU's int8 path peaks at 2x its bf16
FLOPs. Dequantization folds into one fused multiply-add with the bias.

This is the TPU analogue of the reference's TensorRT INT8 engine
(deploy/TensorRT/onnx_to_trt.py + calibrator.py, SURVEY §2.12): calibration
scales in, int8 kernels out, same network graph.

Mechanics: an intercept_methods pass swaps each nn.Conv call for the int8
computation, reading conv geometry (strides/padding/groups) off the module
instance; layers without calibration data (or in the skip list) fall through
to the original bf16 path. Mathematically this matches fake-quant inference
up to accumulation rounding (int32 exact vs float), which the tests bound.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yololp_tpu.quant.quantize import DEFAULT_SKIP_SUBSTRINGS, _module_path, _skip


def quantize_kernels_int8(params: Dict,
                          skip_substrings: Sequence[str] = DEFAULT_SKIP_SUBSTRINGS
                          ) -> Dict[str, Tuple]:
    """params tree -> {module_path: (w_int8 HWIO, w_scale (out,), bias f32)}.

    Only 4D conv kernels are quantized (ConvTranspose/Dense left alone)."""
    table: Dict[str, Tuple] = {}

    def walk(tree, path=""):
        if not isinstance(tree, dict):
            return
        if "kernel" in tree and getattr(tree["kernel"], "ndim", 0) == 4 \
                and not _skip(path, skip_substrings):
            w = jnp.asarray(tree["kernel"], jnp.float32)
            amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))           # per out-ch
            scale = jnp.maximum(amax, 1e-9) / 127.0
            w_q = jnp.clip(jnp.round(w / scale), -128, 127).astype(jnp.int8)
            bias = jnp.asarray(tree.get("bias", jnp.zeros(w.shape[-1])),
                               jnp.float32)
            table[path] = (w_q, scale, bias)
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, f"{path}/{k}" if path else str(k))

    walk(params)
    return table


def backbone_handoffs(amax_by_path: Dict[str, float],
                      weight_table: Dict[str, Tuple],
                      skip_substrings: Sequence[str] = DEFAULT_SKIP_SUBSTRINGS
                      ) -> Dict[str, str]:
    """{producer_conv_path: consumer_conv_path} for stage boundaries whose
    producer output has exactly ONE consumer (models/efficientrep.py
    EfficientRep: stem -> ERBlock_2_down, and {stage}_down -> {stage}_rep's
    first conv). At these seams the producer conv can requantize its int32
    accumulator straight to the consumer's calibrated int8 input scale
    (relu folds into the clip's lower bound), skipping the bf16 round-trip
    on the largest activation tensors in the network. Only emitted when
    both ends are calibrated and unskipped, so an int8 tensor can never
    reach an un-intercepted conv."""
    pairs = [("stem/conv", "ERBlock_2_down/conv")]
    for s in ("ERBlock_2", "ERBlock_3", "ERBlock_4", "ERBlock_5",
              "ERBlock_6"):
        pairs.append((f"{s}_down/conv", f"{s}_rep/conv1/conv"))
    out: Dict[str, str] = {}
    for prod_sfx, cons_sfx in pairs:
        prods = [p for p in amax_by_path if p.endswith(prod_sfx)]
        for prod in prods:
            cons = prod[: -len(prod_sfx)] + cons_sfx
            ok = all(p in amax_by_path and p in weight_table
                     and not _skip(p, skip_substrings)
                     for p in (prod, cons))
            if ok:
                out[prod] = cons
    return out


def _unique_suffix(paths, suffix):
    cands = [p for p in paths if p.endswith(suffix)]
    return cands[0] if len(cands) == 1 else None


def graph_handoffs(amax_by_path: Dict[str, float],
                   weight_table: Dict[str, Tuple],
                   skip_substrings: Sequence[str] = DEFAULT_SKIP_SUBSTRINGS,
                   relu_acts: bool = True) -> Dict[str, str]:
    """{producer_conv_path: consumer_conv_path} across the WHOLE graph —
    superset of backbone_handoffs (VERDICT r4 #3: the backbone-only map
    left the neck/head glue round-tripping through bf16 per conv).

    A handoff is legal when (a) the producer's activation is ReLU (it folds
    into the requant clip's lower bound; silu does not fold — gate with
    relu_acts, false for conv_silu model families), (b) every op between
    producer and consumer is monotone and scale-preserving (identity,
    max_pool, concat of parts all at the consumer's scale), and (c) the
    producer's output has that single conv consumer. Seams emitted beyond
    the backbone spine:

      * SPPF internals: cv1 -> cv2 *through* the stacked 5x5 max_pools and
        the 4-way concat — max is exact under monotone requant and all four
        concat parts carry cv1's handed-off codes, so the whole SPPF runs
        int8-in/int8-out. (Plain SPPF only; detected vs CSP-SPPF by the
        absence of a sibling cv7, whose cv2 consumes the block INPUT.)
      * CSP-SPPF internals: the cv1->cv3->cv4->(pools)->cv5->cv6->cv7
        spine plus cv2->cv7 (both cv7 concat parts requantized to cv7's
        scale).
      * SPPF exit conv -> neck reduce_layer0 (the P5 map has exactly one
        consumer in every PAN variant, models/reppan.py).
      * BiFusion cv2 -> its stride-2 downsample (direct, single consumer;
        BiFusion's activations are ReLU for every model family).
    """
    out = backbone_handoffs(amax_by_path, weight_table, skip_substrings)
    paths = list(amax_by_path)

    def ok(*ps):
        return all(p is not None and p in amax_by_path and p in weight_table
                   and not _skip(p, skip_substrings) for p in ps)

    # BiFusion cv2 -> downsample: ReLU by construction (layers/blocks.py
    # BiFusion hardcodes act=nn.relu), so not gated on relu_acts.
    for p in paths:
        if "Bifusion" in p and p.endswith("/cv2/conv"):
            cons = p[: -len("cv2/conv")] + "downsample/conv"
            if ok(p, cons):
                out[p] = cons

    if not relu_acts:
        return out

    red0 = _unique_suffix(paths, "neck/reduce_layer0/conv")
    for p in paths:
        if not p.endswith("/cv1/conv") or "_sppf/" not in p:
            continue
        base = p[: -len("cv1/conv")]
        is_csp = (base + "cv7/conv") in amax_by_path
        if is_csp:
            spine = [("cv1", "cv3"), ("cv3", "cv4"), ("cv4", "cv5"),
                     ("cv5", "cv6"), ("cv6", "cv7"), ("cv2", "cv7")]
            for a, b in spine:
                prod, cons = base + f"{a}/conv", base + f"{b}/conv"
                if ok(prod, cons):
                    out[prod] = cons
            if ok(base + "cv7/conv", red0):
                out[base + "cv7/conv"] = red0
        else:
            if ok(p, base + "cv2/conv"):
                out[p] = base + "cv2/conv"
            if ok(base + "cv2/conv", red0):
                out[base + "cv2/conv"] = red0
    return out


def chain_exit_handoffs(amax_by_path: Dict[str, float],
                        weight_table: Dict[str, Tuple],
                        skip_substrings: Sequence[str] = DEFAULT_SKIP_SUBSTRINGS
                        ) -> Dict[str, str]:
    """{repblock_module_path: consumer_conv_path} for deploy RepBlock chains
    whose exit activation has exactly ONE conv consumer — the chain's last
    link then requantizes its int32 accumulator straight to that consumer's
    calibrated int8 scale instead of dequantizing to bf16
    (_chain_repblock exit_amax). Producer activation is the RepVGG ReLU
    (always foldable), so no relu_acts gate; the CONSUMER's activation is
    irrelevant (it applies to the consumer's own output).

    Single-consumer chain exits (models/{efficientrep,reppan}.py +
    effidehead.py data flow):
      * ERBlock_{5,6}_rep -> its SPPF's cv1 (backbone tail),
      * Rep_p4 -> reduce_layer1 (P5 necks) / Rep_p5 -> reduce_layer1 and
        Rep_p4 -> reduce_layer2 (P6 necks),
      * the last bottom-up RepBlock (Rep_n4 / Rep_n6) -> the deepest head
        stem (detect/stem{2,3}) — the only neck output with one consumer.
    Every other chain exit (Rep_p3, Rep_n3, ...) fans out to a downsample
    AND a head stem, so it must stay bf16."""
    paths = list(amax_by_path)
    out: Dict[str, str] = {}

    def ok(p):
        return (p is not None and p in amax_by_path and p in weight_table
                and not _skip(p, skip_substrings))

    for p in paths:
        for st in ("ERBlock_5", "ERBlock_6"):
            sfx = f"{st}_rep/conv1/conv"
            if p.endswith(sfx):
                rb = p[: -len("/conv1/conv")]
                sppf = rb[: -len(f"{st}_rep")] + f"{st}_sppf/"
                if (sppf + "cv7/conv") in amax_by_path:
                    # CSP-SPPF: BOTH cv1 and cv2 consume the block input
                    # (layers/blocks.py CSPSPPFBase) — codes handed off at
                    # cv1's scale would reach cv2 at the wrong scale
                    # whenever cv1/cv2 calibrate differently (any method
                    # beyond max). Not a single-consumer exit; skip.
                    continue
                cons = sppf + "cv1/conv"
                if ok(cons):
                    out[rb] = cons

    def add(rb_sfx, cons_sfx):
        rbp = _unique_suffix(paths, rb_sfx + "/conv1/conv")
        cons = _unique_suffix(paths, cons_sfx)
        if rbp is not None and ok(cons):
            out[rbp[: -len("/conv1/conv")]] = cons

    if any(p.endswith("Rep_p5/conv1/conv") for p in paths):   # P6 neck
        add("neck/Rep_p5", "neck/reduce_layer1/conv")
        add("neck/Rep_p4", "neck/reduce_layer2/conv")
        add("neck/Rep_n6", "detect/stem3/conv")
    else:
        add("neck/Rep_p4", "neck/reduce_layer1/conv")
        add("neck/Rep_n4", "detect/stem2/conv")
    return out


def conv3x3_as_dots(x, w_hwio):
    """3x3 stride-1 same-padding conv(int8,int8)->int32 as 9 shifted
    (N*H*W,C)@(C,O) dot_generals, int32-accumulated on the VPU.

    Bit-exact with lax.conv_general_dilated (integer sums commute) but
    lowered through XLA's MATMUL path instead of its conv path — the
    tools/probe_mxu_int8.py question: on v5e, XLA's int8 conv lowering
    may not reach the MXU's 2x int8 rate while its int8 matmul does."""
    n, h, w, c = x.shape
    w9 = w_hwio.reshape(9, c, w_hwio.shape[-1])
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = jax.lax.slice(xp, (0, dy, dx, 0), (n, dy + h, dx + w, c))
            y = jax.lax.dot_general(
                tap.reshape(n * h * w, c), w9[dy * 3 + dx],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            acc = y if acc is None else acc + y
    return acc.reshape(n, h, w, -1)


def _int8_conv(a_q, w_q, strides, padding, groups=1, conv_impl="conv"):
    """conv(int8,int8)->int32, through the requested lowering. conv_impl
    "dots" reroutes the two shapes that dominate the deploy graph —
    3x3/stride-1/pad-1 and 1x1/stride-1 — onto the matmul path; every
    other geometry falls back to the conv path."""
    if conv_impl == "dots" and groups == 1 and strides == (1, 1):
        kh, kw = w_q.shape[:2]
        same1 = padding in (((1, 1), (1, 1)), "SAME", [(1, 1), (1, 1)])
        if (kh, kw) == (3, 3) and same1:
            return conv3x3_as_dots(a_q, w_q)
        valid = padding in (((0, 0), (0, 0)), "SAME", "VALID",
                            [(0, 0), (0, 0)])
        if (kh, kw) == (1, 1) and valid:
            n, h, w, c = a_q.shape
            y = jax.lax.dot_general(
                a_q.reshape(n * h * w, c), w_q.reshape(c, -1),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            return y.reshape(n, h, w, -1)
    return jax.lax.conv_general_dilated(
        a_q, w_q, window_strides=strides, padding=padding,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def _chain_repblock(x, sub_paths, amax_by_path, weight_table,
                    out_dtype=None, conv_impl="conv", exit_amax=None):
    """Run a deploy-mode RepBlock (a strictly sequential chain of biased
    3x3-conv + ReLU links, layers/blocks.py RepBlock) entirely in int8:
    quantize once at chain entry, then each internal link goes
    conv(int8,int8)->int32 -> fused {scale+bias+relu+requant} -> int8,
    dequantizing to the model dtype only at chain exit.

    vs the per-conv interceptor path this removes the bf16 round-trip
    between links (dequant write + read + quant write, ~5 bytes/elem of HBM
    traffic per link at b128@640 resolution) and stores inter-link
    activations at 1 byte/elem instead of 2 — the TPU analogue of
    TensorRT's int8-in/int8-out layer fusion the reference relies on for
    its 1.6-1.7x INT8 speedups (tools/qat/README.md:75-80).

    ReLU commutes into the requant exactly: with positive scales,
    relu(a*y+b)/s == max((a/s)*y + b/s, 0), so each link's epilogue is one
    fused FMA+max+round+clip on the int32 accumulator (XLA fuses it into
    the conv output, int8 in / int8 out).

    An int8 input is accepted as ALREADY quantized at this chain's entry
    scale (the stage-handoff path: the producing downsample conv requanted
    straight to our first conv's calibrated amax); out_dtype then supplies
    the exit dtype an int8 input cannot.

    With exit_amax (chain_exit_handoffs: the chain's output has a single
    conv consumer), the LAST link also requantizes straight to the
    consumer's calibrated scale and the chain returns int8 codes — the
    chain never touches bf16 on either side."""
    scales = [jnp.float32(amax_by_path[p]) / 127.0 for p in sub_paths]
    if x.dtype == jnp.int8:
        q = x
    else:
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scales[0]),
                     -128, 127).astype(jnp.int8)
    out_dtype = out_dtype if out_dtype is not None else x.dtype
    for i, p in enumerate(sub_paths):
        w_q, w_scale, bias = weight_table[p]
        y32 = _int8_conv(q, w_q, (1, 1), ((1, 1), (1, 1)),
                         conv_impl=conv_impl)
        if i + 1 < len(sub_paths):
            a = scales[i] * w_scale / scales[i + 1]   # per-out-channel
            b = bias / scales[i + 1]
            # relu folds into the clip's lower bound (codes of relu'd
            # values are >= 0 under a symmetric positive scale)
            q = jnp.clip(jnp.round(y32.astype(jnp.float32) * a + b),
                         0, 127).astype(jnp.int8)
        elif exit_amax is not None:
            s_exit = jnp.float32(exit_amax) / 127.0
            a = scales[i] * w_scale / s_exit
            b = bias / s_exit
            return jnp.clip(jnp.round(y32.astype(jnp.float32) * a + b),
                            0, 127).astype(jnp.int8)
        else:
            yf = y32.astype(jnp.float32) * (scales[i] * w_scale) + bias
            return jnp.maximum(yf, 0.0).astype(out_dtype)


def int8_apply(model, variables, x, amax_by_path: Dict[str, float],
               weight_table: Dict[str, Tuple],
               skip_substrings: Sequence[str] = DEFAULT_SKIP_SUBSTRINGS,
               chain_repblocks: bool = True, stage_handoffs: bool = True,
               conv_impl: str = "conv", **apply_kwargs):
    """Forward pass executing calibrated convs in int8. With
    chain_repblocks (default), deploy-mode RepVGG RepBlock stages run as
    fused int8->int8 chains (_chain_repblock) instead of per-conv
    quantize/dequant round-trips. With stage_handoffs (default),
    single-consumer producer convs ACROSS THE WHOLE GRAPH (graph_handoffs:
    backbone spine + SPPF internals + BiFusion seams + the P5->neck seam)
    requantize their int32 accumulator straight to the consumer's
    calibrated int8 scale, and RepBlock chains with a single-consumer exit
    (chain_exit_handoffs: Rep_p4->reduce_layer1, Rep_n4->head stem, the
    ERBlock_5_rep->SPPF seam) exit as int8 codes — the consumer detects
    the int8 input and skips its own quantize. The subsequent ReLU is an
    identity on the handed-off codes (the requant clip's lower bound is
    0); handoffs whose producer activation is not ReLU are never emitted
    (relu fold legality, graph_handoffs docstring)."""
    from yololp_tpu.layers.blocks import RepBlock, RepVGGBlock

    model_dtype = getattr(model, "dtype", x.dtype)
    cfg = getattr(model, "config", None)
    training_mode = (cfg.get("training_mode", "repvgg")
                     if hasattr(cfg, "get") else "repvgg")
    relu_acts = training_mode != "conv_silu"
    handoffs = (graph_handoffs(amax_by_path, weight_table, skip_substrings,
                               relu_acts=relu_acts)
                if stage_handoffs else {})
    chain_exits = (chain_exit_handoffs(amax_by_path, weight_table,
                                       skip_substrings)
                   if (stage_handoffs and chain_repblocks) else {})

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if (chain_repblocks and isinstance(m, RepBlock)
                and context.method_name == "__call__" and m.deploy
                and m.block is RepVGGBlock):
            path = _module_path(context)
            names = ["conv1"] + [f"block_{i}" for i in range(m.n - 1)]
            sub = [f"{path}/{n}/conv" for n in names]
            if all(p in amax_by_path and p in weight_table
                   and not _skip(p, skip_substrings) for p in sub):
                x_in = args[0]
                if (conv_impl == "pallas"
                        and x_in.shape[1] == x_in.shape[2]):
                    # fused pallas links: conv+requant in one kernel, the
                    # int32 accumulator never leaves VMEM (no exit handoff
                    # on this path — the kernel's epilogue writes bf16)
                    from yololp_tpu.ops.pallas_conv import \
                        chain_repblock_pallas
                    return chain_repblock_pallas(x_in, sub, amax_by_path,
                                                 weight_table,
                                                 out_dtype=model_dtype)
                cons = chain_exits.get(path)
                return _chain_repblock(
                    x_in, sub, amax_by_path, weight_table,
                    out_dtype=model_dtype, conv_impl=conv_impl,
                    exit_amax=(amax_by_path[cons] if cons is not None
                               else None))
        if (isinstance(m, nn.Conv) and context.method_name == "__call__"):
            path = _module_path(context)
            if (path in amax_by_path and path in weight_table
                    and not _skip(path, skip_substrings)):
                a = args[0]
                w_q, w_scale, bias = weight_table[path]
                x_scale = jnp.asarray(amax_by_path[path], jnp.float32) / 127.0
                if a.dtype == jnp.int8:
                    # handed off: already quantized at OUR calibrated scale
                    a_q = a
                else:
                    a_q = jnp.clip(
                        jnp.round(a.astype(jnp.float32) / x_scale),
                        -128, 127).astype(jnp.int8)
                strides = m.strides if isinstance(m.strides, tuple) else (1, 1)
                padding = m.padding
                y = _int8_conv(a_q, w_q, strides, padding,
                               groups=m.feature_group_count,
                               conv_impl=conv_impl)
                cons = handoffs.get(path)
                if cons is not None:
                    s_next = jnp.asarray(amax_by_path[cons],
                                         jnp.float32) / 127.0
                    aa = x_scale * w_scale / s_next   # per-out-channel
                    bb = bias / s_next
                    # relu folds into the clip's lower bound; the module's
                    # own nn.relu is then an identity on these codes
                    return jnp.clip(jnp.round(y.astype(jnp.float32) * aa
                                              + bb),
                                    0, 127).astype(jnp.int8)
                y = (y.astype(jnp.float32) * (x_scale * w_scale)
                     + bias).astype(model_dtype
                                    if a.dtype == jnp.int8 else a.dtype)
                return y
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        return model.apply(variables, x, **apply_kwargs)


def make_int8_infer_fn(model, variables, amax_by_path: Dict[str, float],
                       skip_substrings: Sequence[str] = DEFAULT_SKIP_SUBSTRINGS,
                       with_nms: bool = True, conf_thres: float = 0.4,
                       iou_thres: float = 0.45, max_det: int = 300,
                       candidate_selector: str = "topk",
                       conv_impl: str = "conv"):
    """Jitted uint8-batch -> detections pipeline running calibrated convs in
    int8 (drop-in for the bf16 deploy path).

    The first call tries the fully-fused executor (graph + chain-exit
    handoffs); if that program fails to compile/execute on the attached
    backend, the fn PERMANENTLY falls back to the backbone-spine-only
    configuration (stage_handoffs=False) that every prior round verified
    on hardware, with a warning — an accuracy eval must degrade to a
    slower program, never die."""
    import warnings

    from yololp_tpu.ops.nms import non_max_suppression

    table = quantize_kernels_int8(variables["params"], skip_substrings)

    def make(stage_handoffs):
        @jax.jit
        def run(images_u8):
            x = (images_u8.astype(model.dtype)
                 / jnp.asarray(255.0, model.dtype))
            pred = int8_apply(model, variables, x, amax_by_path, table,
                              skip_substrings, conv_impl=conv_impl,
                              stage_handoffs=stage_handoffs, train=False)
            if not with_nms:
                return pred
            return non_max_suppression(
                pred.astype(jnp.float32), conf_thres=conf_thres,
                iou_thres=iou_thres, max_det=max_det,
                candidate_selector=candidate_selector)
        return run

    fused, conservative = make(True), make(False)
    state = {"fallback": False}

    def run(images_u8):
        if not state["fallback"]:
            try:
                return fused(images_u8)
            except Exception as e:  # noqa: BLE001 — backend lowering guard
                state["fallback"] = True
                warnings.warn(
                    "int8 fused-handoff executor failed on this backend "
                    f"({e}); falling back to stage_handoffs=False")
        return conservative(images_u8)

    return run
