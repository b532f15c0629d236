#!/usr/bin/env python3
"""Inference CLI (reference: tools/infer.py).

Example:
  python tools/infer.py --weights runs/train/exp/weights/best_ckpt.msgpack \
      --conf-file yololp_tpu/configs/yololps.py --source img.jpg
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
    parser = argparse.ArgumentParser("YOLO-LP TPU inference", add_help=True)
    parser.add_argument("--weights", type=str, default=None,
                        help="checkpoint path (.msgpack); omit for random init smoke run")
    parser.add_argument("--source", type=str, required=True,
                        help="image file / dir / glob / video")
    parser.add_argument("--conf-file", dest="conf_file", type=str, default="yololps",
                        help="model config: built-in name or .py path")
    parser.add_argument("--yaml", type=str, default=None, help="dataset yaml (vocab)")
    parser.add_argument("--img-size", nargs="+", type=int, default=[640, 640])
    parser.add_argument("--conf-thres", type=float, default=0.4)
    parser.add_argument("--iou-thres", type=float, default=0.45)
    parser.add_argument("--max-det", type=int, default=1000)
    parser.add_argument("--nms-selector", default="topk",
                        choices=["topk", "approx"])
    parser.add_argument("--device", default="tpu", help="tpu or cpu")
    parser.add_argument("--save-txt", action="store_true", default=True)
    parser.add_argument("--not-save-img", action="store_true")
    parser.add_argument("--project", default="runs/inference")
    parser.add_argument("--name", default="exp")
    parser.add_argument("--half", action="store_true", default=True,
                        help="bf16 compute")
    parser.add_argument("--batch-size", type=int, default=1,
                        help=">1 enables the batched throughput path")
    parser.add_argument("--int8", action="store_true",
                        help="execute calibrated convs in int8")
    parser.add_argument("--conv-impl", default="conv",
                        choices=["conv", "dots", "pallas"],
                        help="int8 conv lowering (see eval.py)")
    parser.add_argument("--calib-pt", type=str, default=None,
                        help="calibration amax json (required with --int8)")
    return parser


def main(args=None):
    args = get_args_parser().parse_args(args)
    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from yololp_tpu.core.inferer import Inferer

    img_size = args.img_size if len(args.img_size) == 2 else args.img_size * 2
    inferer = Inferer(args.source, args.weights, args.conf_file,
                      img_size=img_size, half=args.half,
                      conf_thres=args.conf_thres, iou_thres=args.iou_thres,
                      max_det=args.max_det, nms_selector=args.nms_selector)
    if args.int8:
        assert args.calib_pt, "--int8 requires --calib-pt"
        from yololp_tpu.quant.int8_infer import make_int8_infer_fn
        from yololp_tpu.quant.quantize import load_amax

        inferer._run = make_int8_infer_fn(
            inferer.model, inferer.variables, load_amax(args.calib_pt),
            conf_thres=args.conf_thres, iou_thres=args.iou_thres,
            max_det=args.max_det, conv_impl=args.conv_impl)
    save_dir = osp.join(args.project, args.name)
    if args.batch_size > 1:
        results = inferer.infer_batched(save_dir, batch_size=args.batch_size,
                                        save_txt=args.save_txt,
                                        save_img=not args.not_save_img)
    else:
        inferer.warmup()
        results = inferer.infer(save_dir, save_txt=args.save_txt,
                                save_img=not args.not_save_img)
    for path, dets in results:
        strings = [inferer.plate_text(d) for d in dets]
        print(f"{path}: {len(dets)} plate(s) {strings}")
    print(f"Average FPS: {inferer.fps_calc.accumulate():.1f}")
    print(f"Results saved to {save_dir}")


if __name__ == "__main__":
    main()
