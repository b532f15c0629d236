#!/usr/bin/env python3
"""Evaluation CLI (reference: tools/eval.py).

Prints the LP metric: AP per IoU bucket, mAP/mAP50/mAP75/mAP50-95, recall,
and the speed report (pre / infer / post ms per image).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def get_args_parser():
    p = argparse.ArgumentParser("YOLO-LP TPU evaluation", add_help=True)
    p.add_argument("--data", type=str, default=None, help="dataset yaml")
    p.add_argument("--weights", type=str, required=True)
    p.add_argument("--conf-file", type=str, default="yololps")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--conf-thres", type=float, default=0.03)
    p.add_argument("--iou-thres", type=float, default=0.65)
    p.add_argument("--task", default="val", choices=["val", "test", "speed"])
    p.add_argument("--device", default="tpu")
    p.add_argument("--half", action="store_true", default=True)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--test_load_size", type=int, default=None)
    p.add_argument("--letterbox_return_int", action="store_true")
    p.add_argument("--rect", action="store_true",
                   help="reference-protocol rect-batched val (aspect-sorted "
                        "batches, pad 0.5; quantized shapes on TPU)")
    p.add_argument("--mesh", type=int, default=0,
                   help="shard the eval batch data-parallel over N devices "
                        "(0 = single-device); batch-size must divide by N")
    p.add_argument("--nms-selector", default="topk",
                   choices=["topk", "approx"],
                   help="pre-NMS candidate selection: exact lax.top_k or "
                        "lax.approx_max_k (TPU PartialReduce, faster)")
    p.add_argument("--native-preproc", action="store_true",
                   help="native C++ threaded batch decode+letterbox for the "
                        "val loader (plain square protocol only)")
    p.add_argument("--synthetic-data", type=str, default=None,
                   help="path to a make_synthetic_dataset root (smoke/demo)")
    p.add_argument("--int8", action="store_true",
                   help="execute calibrated convs in int8 (needs --calib-pt)")
    p.add_argument("--calib-pt", type=str, default=None,
                   help="calibration amax json (from train.py --quant --calib)")
    p.add_argument("--conv-impl", default="conv", choices=["conv", "dots", "pallas"],
                   help="int8 conv lowering: XLA conv path, or 3x3/1x1 "
                        "convs rerouted onto the matmul path (dots)")
    p.add_argument("--save-json", action="store_true",
                   help="also emit COCO-format prediction/annotation jsons "
                        "(+ COCOeval when pycocotools is installed)")
    p.add_argument("--save-dir", type=str, default="runs/val/exp")
    p.add_argument("--eval-params", type=str, default=None,
                   help="experiment config with eval_params overrides "
                        "(e.g. yololp_tpu/configs/experiment/eval_640_repro.py)")
    p.add_argument("--model-name", type=str, default="default",
                   help="key into eval_params (reference tools/eval.py:51)")
    return p


def apply_eval_params(args):
    """Per-model eval-knob overrides (reference tools/eval.py:51-67)."""
    if not args.eval_params:
        return args
    from yololp_tpu.utils.config import Config

    cfg = Config.fromfile(args.eval_params)
    params = cfg.get("eval_params") or {}
    entry = params.get(args.model_name) or params.get("default") or {}
    for key, attr in (("img_size", "img_size"),
                      ("test_load_size", "test_load_size"),
                      ("letterbox_return_int", "letterbox_return_int"),
                      ("conf_thres", "conf_thres"),
                      ("iou_thres", "iou_thres")):
        if key in entry:
            v = entry[key]
            # reference semantics: a 2-list is [train_override, standalone]
            if isinstance(v, (list, tuple)) and len(v) == 2:
                v = v[1]
            setattr(args, attr, v)
    return args


def main(args=None):
    args = get_args_parser().parse_args(args)
    args.test_load_size = getattr(args, "test_load_size", None)
    args.letterbox_return_int = getattr(args, "letterbox_return_int", False)
    args = apply_eval_params(args)
    if args.task == "speed":  # speed task thresholds (evaler.py:592)
        args.conf_thres = max(args.conf_thres, 0.4)
    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from yololp_tpu.core.evaler import run_eval
    from yololp_tpu.data.vocab import load_dataset_yaml
    from yololp_tpu.models.yolo import Model
    from yololp_tpu.utils.checkpoint import load_inference_variables
    from yololp_tpu.utils.config import Config

    cfg = (Config.fromfile(args.conf_file) if args.conf_file.endswith(".py")
           else Config.named(args.conf_file))
    if args.synthetic_data:
        data_dict = {"val": osp.join(args.synthetic_data, "images", "val"),
                     "npro": 31, "nalp": 24, "nads": 37}
    else:
        assert args.data, "--data or --synthetic-data required"
        data_dict = load_dataset_yaml(args.data)

    eval_hyp = {}
    if args.test_load_size:
        eval_hyp["test_load_size"] = args.test_load_size
    if args.letterbox_return_int:
        eval_hyp["letterbox_return_int"] = True

    variables = load_inference_variables(args.weights)
    model = Model(config=cfg, npro=int(data_dict.get("npro", 31)),
                  nalp=int(data_dict.get("nalp", 24)),
                  nads=int(data_dict.get("nads", 37)), deploy=True,
                  dtype=jnp.bfloat16 if args.half else jnp.float32)

    mesh = None
    if args.mesh:
        from yololp_tpu.parallel.infer import infer_mesh

        mesh = infer_mesh(args.mesh)
        assert mesh is not None and mesh.size == args.mesh, \
            f"--mesh {args.mesh} needs {args.mesh} visible devices"

    run_fn = None
    if args.int8:
        assert args.calib_pt, "--int8 requires --calib-pt"
        from yololp_tpu.quant.int8_infer import make_int8_infer_fn
        from yololp_tpu.quant.quantize import load_amax

        int8_run = make_int8_infer_fn(
            model, variables, load_amax(args.calib_pt),
            conf_thres=args.conf_thres, iou_thres=args.iou_thres,
            candidate_selector=args.nms_selector, conv_impl=args.conv_impl)
        run_fn = lambda _vars, images: int8_run(images)

    out = run_eval(
        model, variables, data_dict, batch_size=args.batch_size,
        img_size=args.img_size, conf_thres=args.conf_thres,
        iou_thres=args.iou_thres, half=args.half, workers=args.workers,
        eval_hyp=eval_hyp, task="val" if args.task == "speed" else args.task,
        return_preds=args.save_json, run_fn=run_fn, rect=args.rect,
        native=args.native_preproc, mesh=mesh,
        nms_selector=args.nms_selector)
    if args.save_json:
        results, speed, (preds, targets, paths) = out
        from yololp_tpu.utils.coco import (
            cocoeval_if_available, predictions_to_coco_json)

        pred_json = osp.join(args.save_dir, "predictions.json")
        predictions_to_coco_json(dict(zip(paths, preds)), pred_json)
        # annotations in the SAME (letterboxed) coordinate space as the preds
        import json as _json

        anno = {"categories": [{"id": i, "name": str(i), "supercategory": ""}
                               for i in range(31)],
                "images": [], "annotations": []}
        ann_id = 0
        for path, tgt in zip(paths, targets):
            img_id = osp.splitext(osp.basename(path))[0]
            anno["images"].append({"file_name": osp.basename(path),
                                   "id": img_id, "width": args.img_size,
                                   "height": args.img_size})
            for row in tgt:
                x1, y1, x2, y2 = (float(v) for v in row[8:12])
                anno["annotations"].append(
                    {"area": (x2 - x1) * (y2 - y1),
                     "bbox": [x1, y1, x2 - x1, y2 - y1],
                     "category_id": int(row[0]), "id": ann_id,
                     "image_id": img_id, "iscrowd": 0, "segmentation": []})
                ann_id += 1
        anno_json = osp.join(args.save_dir, "instances_val.json")
        with open(anno_json, "w") as f:
            _json.dump(anno, f)
        print(f"COCO jsons: {pred_json} + {anno_json}")
        stats = cocoeval_if_available(anno_json, pred_json)
        if stats is not None:
            print("COCOeval mAP:", stats[0])
    else:
        results, speed = out

    mAP, mAP50, mAP75, mAP5095, recall, mAP_list, recall_list = results
    print("AP per IoU bucket [0.50..0.95]:")
    for i, (ap, rc) in enumerate(zip(mAP_list, recall_list)):
        ap_s = "  n/a " if ap == -1 else f"{ap:.4f}"  # -1 = empty bucket
        print(f"  IoU {0.5 + i * 0.05:.2f}: AP={ap_s} recall={rc:.4f}")
    print(f"mAP={mAP:.4f} mAP50={mAP50:.4f} mAP75={mAP75:.4f} "
          f"mAP50-95={mAP5095:.4f} recall={recall:.4f}")
    print(f"speed per image: pre {speed['pre_ms']:.2f} ms, "
          f"infer {speed['infer_ms']:.2f} ms, post {speed['post_ms']:.2f} ms")


if __name__ == "__main__":
    main()
