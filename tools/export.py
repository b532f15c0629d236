#!/usr/bin/env python3
"""Export CLI (reference: deploy/ONNX/export_onnx.py + end2end.py).

Formats:
  stablehlo  — portable artifact for the native PJRT client (deploy/pjrt_cpp)
  saved_model — TF SavedModel via jax2tf (ONNX/OpenVINO-consumer analogue)

Example:
  python tools/export.py --weights best_ckpt.msgpack --conf-file yololps \
      --format stablehlo --out model.stablehlo --end2end
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def main(args=None):
    p = argparse.ArgumentParser("YOLO-LP TPU export")
    p.add_argument("--weights", type=str, default=None)
    p.add_argument("--conf-file", type=str, default="yololps")
    p.add_argument("--format", choices=["stablehlo", "saved_model"],
                   default="stablehlo")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--end2end", action="store_true", default=True,
                   help="compile decode+NMS into the graph")
    p.add_argument("--no-end2end", dest="end2end", action="store_false")
    p.add_argument("--conf-thres", type=float, default=0.4)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--half", action="store_true", default=True)
    p.add_argument("--fp32", dest="half", action="store_false")
    p.add_argument("--int8", action="store_true",
                   help="export a TRUE int8 engine: calibrated convs run "
                        "int8xint8->int32 on the MXU (needs --calib-pt); "
                        "TensorRT onnx_to_trt.py analogue")
    p.add_argument("--calib-pt", type=str, default=None,
                   help="calibration amax json (from train.py --quant "
                        "--calib)")
    p.add_argument("--device", default="cpu",
                   help="export runs host-side; cpu is fine")
    args = p.parse_args(args)

    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.int8:
        assert args.calib_pt, "--int8 requires --calib-pt"
        assert args.format == "stablehlo", "--int8 is stablehlo-only"

    if args.format == "stablehlo":
        from yololp_tpu.export.export import export_stablehlo

        path, meta = export_stablehlo(
            args.conf_file, args.weights, args.out, batch=args.batch_size,
            img_size=args.img_size, end2end=args.end2end,
            conf_thres=args.conf_thres, iou_thres=args.iou_thres,
            max_det=args.max_det, half=args.half,
            calib_pt=args.calib_pt if args.int8 else None)
        print(f"StableHLO artifact: {path} (+ {meta}, + .copts sidecar)")
        print("Run it natively: make -C deploy/pjrt_cpp && "
              f"deploy/pjrt_cpp/yololp_runner --plugin <pjrt.so> --model {path} "
              f"--copts {path}.copts --image img.jpg --size {args.img_size}")
    else:
        from yololp_tpu.export.export import export_saved_model

        out = export_saved_model(
            args.conf_file, args.weights, args.out, batch=args.batch_size,
            img_size=args.img_size, end2end=args.end2end,
            conf_thres=args.conf_thres, iou_thres=args.iou_thres,
            max_det=args.max_det, half=False)
        print(f"SavedModel: {out}")


if __name__ == "__main__":
    main()
