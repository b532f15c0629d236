#!/usr/bin/env python3
"""Weight-transplant parity harness (cross-framework accuracy artifact).

Maps a trained yololp-tpu checkpoint onto the reference torch Model
(yolov6/models/yolo.py) via yololp_tpu.utils.transplant, then runs the
*reference's own* evaluator (yolov6/core/evaler.py:160-283 LP metric, its
dataloader, its NMS) and OUR evaluator on the same val images, printing the
side-by-side metrics. This closes the "same weights -> same metrics" loop
end-to-end: op-level golden tests prove layer parity, this proves pipeline
parity.

Environment shims (the reference tree is not runnable as-is in this image):
  * pycocotools absent -> stubbed (only the COCO-json path needs it)
  * torchvision absent -> torchvision.ops.nms replaced with an exact greedy
    NMS (same semantics)
  * the reference dataset ctor crashes on its missing font assets
    (yolov6/data/generate/Blue.py:5) -> paste/generate classes stubbed
    (never used at val)

Usage:
  python tools/transplant.py --weights runs/train/X/weights/best_ckpt.msgpack \
      --conf-file yololp_tpu/configs/experiment/yololps_synth.py \
      --data runs/data/synth24k.yaml --img-size 320 --max-images 256 \
      [--out /tmp/transplanted_state_dict.pt] [--device cpu]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import tempfile
import types

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

REFERENCE_DIR = "/root/reference"


def install_reference_shims():
    """Make the reference tree importable: pycocotools + torchvision stubs."""
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)

    if "pycocotools" not in sys.modules:
        pc = types.ModuleType("pycocotools")
        pc.coco = types.ModuleType("pycocotools.coco")
        pc.cocoeval = types.ModuleType("pycocotools.cocoeval")
        pc.coco.COCO = object
        pc.cocoeval.COCOeval = object
        sys.modules["pycocotools"] = pc
        sys.modules["pycocotools.coco"] = pc.coco
        sys.modules["pycocotools.cocoeval"] = pc.cocoeval

    try:
        import torchvision  # noqa: F401
    except ImportError:
        import torch

        def _greedy_nms(boxes, scores, iou_threshold):
            """Exact greedy NMS, same semantics as torchvision.ops.nms."""
            order = scores.argsort(descending=True)
            keep = []
            while order.numel() > 0:
                i = order[0]
                keep.append(i)
                if order.numel() == 1:
                    break
                rest = order[1:]
                b1, b2 = boxes[i], boxes[rest]
                lt = torch.max(b1[:2], b2[:, :2])
                rb = torch.min(b1[2:], b2[:, 2:])
                inter = (rb - lt).clamp(min=0).prod(-1)
                a1 = (b1[2:] - b1[:2]).clamp(min=0).prod(-1)
                a2 = (b2[:, 2:] - b2[:, :2]).clamp(min=0).prod(-1)
                iou = inter / (a1 + a2 - inter + 1e-12)
                order = rest[iou <= iou_threshold]
            return torch.stack(keep) if keep else torch.zeros(0, dtype=torch.long)

        tv = types.ModuleType("torchvision")
        tv.ops = types.ModuleType("torchvision.ops")
        tv.ops.nms = _greedy_nms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv.ops


def patch_reference_generators():
    """The reference TrainValDataset unconditionally constructs its plate
    generators (datasets.py:74-75), which crash on font assets missing from
    the tree; they are never used for task='val'."""
    import yolov6.data.datasets as ds

    class _NoGen:
        def __init__(self, *a, **k):
            pass

    ds.Blue_Gen = ds.Green_S_Gen = ds.Yel_S_Gen = ds.Green_B_Gen = _NoGen
    ds.generate = _NoGen


def make_subset(data_yaml: str, n: int, workdir: str):
    """Symlink the first n val images+labels into a temp dataset dir and
    return a data dict pointing at it (both evaluators see the same files)."""
    import yaml

    with open(data_yaml) as f:
        data = yaml.safe_load(f)
    src_img = data["val"]
    if n <= 0:
        return data, src_img
    src_lbl = src_img.replace("/images/", "/labels/")
    img_dir = osp.join(workdir, "images", "val")
    lbl_dir = osp.join(workdir, "labels", "val")
    os.makedirs(img_dir)
    os.makedirs(lbl_dir)
    names = sorted(os.listdir(src_img))[:n]
    for name in names:
        # absolute targets: a relative target would dangle from the temp dir
        os.symlink(osp.abspath(osp.join(src_img, name)),
                   osp.join(img_dir, name))
        lbl = osp.splitext(name)[0] + ".txt"
        if osp.exists(osp.join(src_lbl, lbl)):
            os.symlink(osp.abspath(osp.join(src_lbl, lbl)),
                       osp.join(lbl_dir, lbl))
    sub = dict(data)
    sub["val"] = img_dir
    return sub, img_dir


def reference_eval(state_dict, config, data, img_size, batch_size,
                   conf_thres, iou_thres):
    """Run the reference Evaler end-to-end (its loader, NMS, LP metric) on a
    transplanted model. Returns [mAP, mAP50, mAP75, mAP50_95, recall, ...]."""
    import torch

    install_reference_shims()
    patch_reference_generators()
    from yolov6.core.evaler import Evaler as RefEvaler

    from yololp_tpu.utils.transplant import (build_reference_model,
                                             load_into_reference)

    model = build_reference_model(config)
    load_into_reference(model, state_dict)
    model.float().eval()

    data = dict(data)
    data.setdefault("names", ["plate"])
    ev = RefEvaler(data, batch_size=batch_size, img_size=img_size,
                   conf_thres=conf_thres, iou_thres=iou_thres,
                   device=torch.device("cpu"), half=False,
                   test_load_size=img_size)
    ev.stride = 32
    loader = ev.init_data(None, "val")
    with torch.no_grad():
        preds, targets, _, _ = ev.predict(model, loader, "val")
    return ev.eval(preds, targets, model, "val")


def our_eval(variables, config, data, img_size, batch_size, conf_thres,
             iou_thres, rect):
    import jax.numpy as jnp

    from yololp_tpu.core.evaler import run_eval
    from yololp_tpu.layers.fuse import fuse_variables
    from yololp_tpu.models.yolo import build_model

    model, _ = build_model(config, img_size=(img_size, img_size),
                           deploy=True, dtype=jnp.float32,
                           batch_size=batch_size)
    deploy_vars = fuse_variables(variables)
    results, speed = run_eval(
        model, deploy_vars, data, batch_size=batch_size, img_size=img_size,
        conf_thres=conf_thres, iou_thres=iou_thres, half=False,
        eval_hyp={"test_load_size": img_size}, rect=rect)
    return results


def shared_batch_eval(variables, state_dict, config, data, img_size,
                      batch_size, conf_thres, iou_thres):
    """Loader-controlled parity: both models consume the SAME letterboxed
    batches (our rect val loader), then each framework's NMS+metric scores
    its own predictions. Any delta here is model/NMS/metric — loader pixel
    differences are excluded by construction. Returns (ours, theirs) metric
    rows plus cross-scored variants.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    install_reference_shims()
    from yolov6.utils.nms import non_max_suppression as ref_nms

    from yololp_tpu.core.evaler import Evaler as OurEvaler
    from yololp_tpu.layers.fuse import fuse_variables
    from yololp_tpu.models.yolo import build_model
    from yololp_tpu.utils.transplant import (build_reference_model,
                                             load_into_reference)

    model, _ = build_model(config, img_size=(img_size, img_size),
                           deploy=True, dtype=jnp.float32,
                           batch_size=batch_size)
    deploy_vars = fuse_variables(variables)
    tmodel = build_reference_model(config)
    load_into_reference(tmodel, state_dict)
    tmodel.float().eval()

    ev = OurEvaler(data, batch_size, img_size, conf_thres, iou_thres,
                   half=False, eval_hyp={"test_load_size": img_size})
    loader, _ = ev.init_data("val", rect=True)
    run_fn = ev.make_infer_fn(model, deploy_vars)

    our_preds, our_targets = ev.predict(run_fn, loader)

    ref_preds = []
    with torch.no_grad():
        for imgs, labels, masks, paths, _shapes in loader:
            x = torch.from_numpy(
                np.ascontiguousarray(imgs.transpose(0, 3, 1, 2))).float() / 255
            out = tmodel(x)[0]
            dets = ref_nms(out, conf_thres, iou_thres, multi_label=True)
            ref_preds.extend(d.numpy() for d in dets)
    assert len(ref_preds) == len(our_preds)

    def their_metric(preds, targets):
        install_reference_shims()
        from yolov6.core.evaler import Evaler as RefEvaler

        ev_ref = RefEvaler.__new__(RefEvaler)
        ev_ref.speed_result = torch.zeros(4)  # eval() always reports speed
        tp = [[torch.from_numpy(np.asarray(p, np.float32)) for p in preds]]
        tt = [[torch.from_numpy(np.asarray(t, np.float32)) for t in targets]]
        return ev_ref.eval(tp, tt, None, "val")

    ours_scored_ours = ev.eval(our_preds, our_targets)
    theirs_scored_theirs = their_metric(ref_preds, our_targets)
    ours_scored_theirs = their_metric(our_preds, our_targets)
    theirs_scored_ours = ev.eval(ref_preds, our_targets)
    return (ours_scored_ours, theirs_scored_theirs, ours_scored_theirs,
            theirs_scored_ours)


def main():
    p = argparse.ArgumentParser("weight-transplant parity harness")
    p.add_argument("--weights", required=True, help="our msgpack checkpoint")
    p.add_argument("--conf-file", required=True)
    p.add_argument("--out", default=None, help="save torch state_dict here")
    p.add_argument("--data", default=None, help="dataset yaml for --compare")
    p.add_argument("--img-size", type=int, default=320)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--conf-thres", type=float, default=0.03)
    p.add_argument("--iou-thres", type=float, default=0.65)
    p.add_argument("--max-images", type=int, default=256,
                   help="evaluate on the first N val images (0 = all)")
    p.add_argument("--rect", action="store_true",
                   help="use our rect val protocol (reference always rects)")
    p.add_argument("--skip-ours", action="store_true")
    p.add_argument("--shared-batches", action="store_true",
                   help="also run the loader-controlled 4-way parity matrix "
                        "(both models on identical letterboxed batches)")
    p.add_argument("--only-shared", action="store_true",
                   help="skip the per-framework evals; run only the 4-way "
                        "shared-batch matrix")
    p.add_argument("--device", default="cpu", choices=["cpu", "tpu"],
                   help="backend for OUR evaler (reference side is torch "
                        "CPU). Default cpu so comparisons never contend "
                        "with a live TPU training run.")
    args = p.parse_args()

    if args.device == "cpu":
        # the axon plugin overrides JAX_PLATFORMS at import; force cpu
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from yololp_tpu.utils.checkpoint import load_checkpoint_raw
    from yololp_tpu.utils.config import Config
    from yololp_tpu.utils.transplant import to_torch_state_dict

    config = Config.fromfile(args.conf_file)
    ckpt = load_checkpoint_raw(args.weights)
    if ckpt.get("format") == "deploy":
        raise SystemExit("transplant needs a train-format checkpoint "
                         "(deploy ckpts have fused branches the reference "
                         "train model does not)")
    variables = ckpt.get("ema") or ckpt["variables"]
    reg_max = int(config.model.head.reg_max)
    sd = to_torch_state_dict(variables, reg_max=reg_max)
    print(f"converted {len(sd)} tensors from {args.weights}")

    if args.out:
        import torch

        torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
                   args.out)
        print(f"saved torch state_dict -> {args.out}")

    if not args.data:
        return

    import yaml  # noqa: F401

    with tempfile.TemporaryDirectory() as tmp:
        data, _ = make_subset(args.data, args.max_images, tmp)

        if args.only_shared:
            args.shared_batches = True
            print("\n=== loader-controlled 4-way parity matrix ===")
            rows = shared_batch_eval(
                variables, sd, config, data, args.img_size, args.batch_size,
                args.conf_thres, args.iou_thres)
            labels = ["our model+NMS, our metric",
                      "ref model+NMS, ref metric",
                      "our model+NMS, ref metric",
                      "ref model+NMS, our metric"]
            names = ["mAP", "mAP50", "mAP75", "mAP50_95", "recall"]
            for label, row in zip(labels, rows):
                vals = {k: round(float(v), 4) for k, v in zip(names, row[:5])}
                print(f"  {label:28s} {vals}")
            return

        print(f"\n=== reference evaler (torch CPU, its loader/NMS/metric) ===")
        ref = reference_eval(sd, config, data, args.img_size,
                             args.batch_size, args.conf_thres, args.iou_thres)
        names = ["mAP", "mAP50", "mAP75", "mAP50_95", "recall"]
        ref_row = {k: float(v) for k, v in zip(names, ref[:5])}
        print("reference:", {k: round(v, 4) for k, v in ref_row.items()})

        if args.skip_ours:
            return

        print(f"\n=== our evaler (jax, our loader/NMS/metric) ===")
        ours = our_eval(variables, config, data, args.img_size,
                        args.batch_size, args.conf_thres, args.iou_thres,
                        rect=True)
        our_row = {k: float(v) for k, v in zip(names, ours[:5])}
        print("ours:     ", {k: round(v, 4) for k, v in our_row.items()})
        print("\nside-by-side (ours - reference):")
        for k in names:
            print(f"  {k:10s} ours={our_row[k]:.4f} ref={ref_row[k]:.4f} "
                  f"delta={our_row[k] - ref_row[k]:+.4f}")

        if args.shared_batches:
            print("\n=== loader-controlled 4-way parity matrix ===")
            rows = shared_batch_eval(
                variables, sd, config, data, args.img_size, args.batch_size,
                args.conf_thres, args.iou_thres)
            labels = ["our model+NMS, our metric",
                      "ref model+NMS, ref metric",
                      "our model+NMS, ref metric",
                      "ref model+NMS, our metric"]
            for label, row in zip(labels, rows):
                vals = {k: round(float(v), 4) for k, v in zip(names, row[:5])}
                print(f"  {label:28s} {vals}")


if __name__ == "__main__":
    main()
