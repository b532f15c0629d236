"""Model export: StableHLO end-to-end graph for native (PJRT C API) clients.

Behavioral reference: deploy/ONNX/export_onnx.py + yolov6/models/end2end.py —
the reference exports a fused ONNX graph, optionally wrapping NMS as a
TRT/ORT plugin op ('End2End'). The TPU-native equivalent exports the fused
deploy model as a PORTABLE StableHLO ARTIFACT via jax.export, with weights
inlined as constants, in two flavors:

  * 'raw':     uint8 image batch -> (B, A, 290) decoded predictions
  * 'end2end': uint8 image batch -> (detections (B, max_det, 28),
               valid mask, counts) — NMS compiled into the graph, so the
               client does zero post-processing (end2end.py analogue).

The emitted `.stablehlo` bytes are exactly what PJRT_Client_Compile accepts
as the 'mlir' program format — the C++ runner in deploy/pjrt_cpp consumes
them directly against any PJRT plugin (libtpu / axon / CPU).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from yololp_tpu.layers.fuse import fuse_variables_jit
from yololp_tpu.models.yolo import Model, build_model
from yololp_tpu.ops.nms import non_max_suppression
from yololp_tpu.utils.checkpoint import load_inference_variables
from yololp_tpu.utils.config import Config


def build_export_fn(config, variables, end2end: bool = True,
                    conf_thres: float = 0.4, iou_thres: float = 0.45,
                    max_det: int = 300, half: bool = True,
                    npro: int = 31, nalp: int = 24, nads: int = 37,
                    calib_amax=None):
    """With `calib_amax` (a {module_path: amax} dict from PTQ calibration),
    the exported graph EXECUTES calibrated convs in int8 on the MXU
    (quant/int8_infer.py) — the deployable analogue of the reference's
    TensorRT INT8 engine build (deploy/TensorRT/onnx_to_trt.py +
    calibrator.py): weights are inlined as int8 constants, so the artifact
    itself is the int8 engine."""
    dtype = jnp.bfloat16 if half else jnp.float32
    model = Model(config=config, npro=npro, nalp=nalp, nads=nads,
                  deploy=True, dtype=dtype)
    if calib_amax is not None:
        from yololp_tpu.quant.int8_infer import (int8_apply,
                                                 quantize_kernels_int8)

        weight_table = quantize_kernels_int8(variables["params"])

    def fn(images_u8):
        x = images_u8.astype(dtype) / jnp.asarray(255.0, dtype)
        if calib_amax is not None:
            pred = int8_apply(model, variables, x, calib_amax, weight_table,
                              train=False)
        else:
            pred = model.apply(variables, x, train=False)
        if not end2end:
            return pred
        det, valid, num = non_max_suppression(
            pred.astype(jnp.float32), conf_thres=conf_thres,
            iou_thres=iou_thres, max_det=max_det)
        return det, valid, num

    return fn


def export_stablehlo(config_name_or_path: str, weights: Optional[str],
                     out_path: str, batch: int = 1, img_size: int = 640,
                     end2end: bool = True, conf_thres: float = 0.4,
                     iou_thres: float = 0.45, max_det: int = 300,
                     half: bool = True,
                     calib_pt: Optional[str] = None) -> Tuple[str, str]:
    """Export to `<out_path>` (portable StableHLO bytes) + a sidecar
    `<out_path>.json` metadata file. Returns both paths.

    `calib_pt` (amax json from train.py --quant --calib) makes the artifact
    a TRUE int8 engine: calibrated convs run with int8 operands / int32
    accumulation on the MXU, kernels inlined as int8 constants."""
    config = (Config.fromfile(config_name_or_path)
              if config_name_or_path.endswith(".py")
              else Config.named(config_name_or_path))
    if weights:
        variables = load_inference_variables(weights)
    else:
        _, train_vars = build_model(
            config, img_size=(64, 64),
            dtype=jnp.bfloat16 if half else jnp.float32)
        variables = fuse_variables_jit(train_vars)

    calib_amax = None
    if calib_pt:
        from yololp_tpu.quant.quantize import load_amax

        calib_amax = load_amax(calib_pt)

    fn = build_export_fn(config, variables, end2end=end2end,
                         conf_thres=conf_thres, iou_thres=iou_thres,
                         max_det=max_det, half=half, calib_amax=calib_amax)
    example = jnp.zeros((batch, img_size, img_size, 3), jnp.uint8)
    exported = jax.export.export(jax.jit(fn))(example)

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(exported.mlir_module_serialized)
    meta = {
        "input": {"shape": [batch, img_size, img_size, 3], "dtype": "uint8"},
        "outputs": ([{"name": "detections", "shape": [batch, max_det, 28],
                      "dtype": "float32"},
                     {"name": "valid", "shape": [batch, max_det],
                      "dtype": "bool"},
                     {"name": "num", "shape": [batch], "dtype": "int32"}]
                    if end2end else
                    [{"name": "pred", "shape": list(exported.out_avals[0].shape),
                      "dtype": "float32"}]),
        "end2end": end2end,
        "int8": calib_pt is not None,
        "conf_thres": conf_thres,
        "iou_thres": iou_thres,
        "max_det": max_det,
        "calling_convention_version": exported.calling_convention_version,
        "platforms": list(exported.platforms),
    }
    meta_path = out_path + ".json"
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=1)
    # sidecar: serialized default CompileOptionsProto for PJRT_Client_Compile
    try:
        from jaxlib import _jax

        with open(out_path + ".copts", "wb") as f:
            f.write(_jax.CompileOptions().SerializeAsString())
    except (ImportError, AttributeError):
        pass
    return out_path, meta_path


def export_saved_model(config_name_or_path: str, weights: Optional[str],
                       out_dir: str, batch: int = 1, img_size: int = 640,
                       end2end: bool = True, conf_thres: float = 0.4,
                       iou_thres: float = 0.45, max_det: int = 300,
                       half: bool = False) -> str:
    """TensorFlow SavedModel export via jax2tf — the analogue of the
    reference's ONNX/OpenVINO exports (deploy/ONNX/export_onnx.py,
    deploy/OpenVINO/export_openvino.py) for TF-serving-style consumers."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    config = (Config.fromfile(config_name_or_path)
              if config_name_or_path.endswith(".py")
              else Config.named(config_name_or_path))
    if weights:
        variables = load_inference_variables(weights)
    else:
        _, train_vars = build_model(
            config, img_size=(64, 64),
            dtype=jnp.bfloat16 if half else jnp.float32)
        variables = fuse_variables_jit(train_vars)

    fn = build_export_fn(config, variables, end2end=end2end,
                         conf_thres=conf_thres, iou_thres=iou_thres,
                         max_det=max_det, half=half)
    tf_fn = tf.function(
        jax2tf.convert(fn, with_gradient=False),
        input_signature=[tf.TensorSpec((batch, img_size, img_size, 3),
                                       tf.uint8, name="images")],
        autograph=False)
    module = tf.Module()
    module.serve = tf_fn
    tf.saved_model.save(module, out_dir,
                        signatures={"serving_default": tf_fn})
    return out_dir
