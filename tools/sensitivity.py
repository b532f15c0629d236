#!/usr/bin/env python3
"""Per-layer quantization sensitivity analysis
(reference: tools/partial_quantization/sensitivity_analyse.py).

Quantizes ONE conv at a time (input fake-quant at its calibrated amax +
per-channel weight fake-quant) and measures the LP-metric mAP drop on a val
subset, ranking layers by sensitivity. The most sensitive layers go into
cfg.ptq/qat sensitive_layers_list for partial quantization.

Usage:
  python tools/sensitivity.py --weights best.msgpack --conf-file yololps \
      --data data/dataset.yaml --calib-pt calib_amax.json --max-images 128
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def main(args=None):
    p = argparse.ArgumentParser("quantization sensitivity analysis")
    p.add_argument("--weights", type=str, default=None)
    p.add_argument("--conf-file", type=str, default="yololps")
    p.add_argument("--data", type=str, default=None)
    p.add_argument("--synthetic-data", type=str, default=None)
    p.add_argument("--calib-pt", type=str, required=True)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--max-images", type=int, default=128)
    p.add_argument("--device", default="tpu")
    p.add_argument("--out", default="sensitivity.json")
    args = p.parse_args(args)

    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from yololp_tpu.core.evaler import Evaler
    from yololp_tpu.data.vocab import load_dataset_yaml
    from yololp_tpu.layers.fuse import fuse_variables_jit
    from yololp_tpu.models import Model, build_model
    from yololp_tpu.ops.nms import non_max_suppression
    from yololp_tpu.quant.quantize import (
        load_amax, quantize_weights, quantized_apply)
    from yololp_tpu.utils.checkpoint import load_inference_variables
    from yololp_tpu.utils.config import Config

    cfg = (Config.fromfile(args.conf_file) if args.conf_file.endswith(".py")
           else Config.named(args.conf_file))
    if args.synthetic_data:
        data_dict = {"val": osp.join(args.synthetic_data, "images", "val"),
                     "npro": 31, "nalp": 24, "nads": 37}
    else:
        data_dict = load_dataset_yaml(args.data)

    if args.weights:
        variables = load_inference_variables(args.weights)
    else:
        _, tv = build_model(cfg, img_size=(64, 64))
        variables = fuse_variables_jit(tv)
    model = Model(config=cfg, deploy=True, dtype=jnp.bfloat16)
    amax = load_amax(args.calib_pt)

    ev = Evaler(data_dict, args.batch_size, args.img_size)
    loader, dataset = ev.init_data("val")

    # pre-load a bounded subset of batches so every variant sees the same data
    batches = []
    seen = 0
    for item in loader:
        batches.append(item)
        seen += len(item[0])
        if seen >= args.max_images:
            break

    def run_variant(target_layer):
        """target_layer None = fp baseline; '__all__' = everything quantized;
        else quantize only that conv."""
        if target_layer is None:
            run = ev.make_infer_fn(model, variables)
        else:
            if target_layer == "__all__":
                sub_amax = amax
            else:
                sub_amax = {target_layer: amax[target_layer]}
            skip_for_weights = tuple(k.rsplit("/", 1)[0] for k in amax
                                     if target_layer not in ("__all__", k))
            qparams = quantize_weights(
                variables["params"],
                skip_substrings=skip_for_weights if target_layer != "__all__"
                else ("proj_conv",))
            qvars = {"params": qparams}

            @jax.jit
            def run(images_u8):
                x = images_u8.astype(model.dtype) / jnp.asarray(255.0, model.dtype)
                pred = quantized_apply(model, qvars, x, sub_amax)
                return non_max_suppression(pred.astype(jnp.float32),
                                           conf_thres=ev.conf_thres,
                                           iou_thres=ev.iou_thres,
                                           max_det=ev.max_det)

        preds, targets = ev.predict(run, batches)
        return float(ev.eval(preds, targets)[0])

    base = run_variant(None)
    full = run_variant("__all__")
    print(f"baseline mAP {base:.4f} | fully-quantized mAP {full:.4f}")

    results = {}
    for i, layer in enumerate(sorted(amax)):
        m = run_variant(layer)
        results[layer] = base - m
        print(f"[{i + 1}/{len(amax)}] {layer}: mAP drop {base - m:+.4f}")

    ranked = sorted(results.items(), key=lambda kv: -kv[1])
    with open(args.out, "w") as f:
        json.dump({"baseline_mAP": base, "full_quant_mAP": full,
                   "drops": dict(ranked)}, f, indent=1)
    print(f"ranked sensitivity written to {args.out}; top-5:")
    for k, v in ranked[:5]:
        print(f"  {k}: {v:+.4f}")


if __name__ == "__main__":
    main()
