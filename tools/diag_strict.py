#!/usr/bin/env python3
"""Strict-metric failure decomposition: what gates the LP mAP.

The LP metric (core/evaler.py eval, reference yolov6/core/evaler.py:160-283)
requires, per ground-truth plate: a matched box (IoU >= 0.7 to count in the
headline mAP), the corner criterion (mean-L1 of 8 corner coords <
0.1*sqrt(area)), and ALL EIGHT characters correct. This tool decomposes the
misses into those stages and reports per-slot accuracy + top confusion
pairs, so "mAP 0.57" becomes "corners pass 92%, ad3 is the weakest slot,
藏<->赣 dominates province errors".

No reference counterpart (it has no per-task diagnostics); complements
tools/diag_province.py (size-bucketed province accuracy).

Usage:
    python tools/diag_strict.py --ckpt runs/train/X/weights/best_ckpt.msgpack \
        --data runs/data/synth14k_v2.yaml --conf-file \
        yololp_tpu/configs/experiment/yololps_synth.py --img-size 448
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402

PRO = ["皖", "沪", "津", "渝", "冀", "晋", "蒙", "辽", "吉", "黑", "苏", "浙",
       "京", "闽", "赣", "鲁", "豫", "鄂", "湘", "粤", "桂", "琼", "川", "贵",
       "云", "藏", "陕", "甘", "青", "宁", "新"]
ALP = list("ABCDEFGHJKLMNPQRSTUVWXYZ")
ADS = list("ABCDEFGHJKLMNPQRSTUVWXYZ0123456789") + ["警", "学", "O"]
SLOT_NAMES = ["pro", "alp", "ad0", "ad1", "ad2", "ad3", "ad4", "ad5"]
SLOT_VOCABS = [PRO, ALP] + [ADS] * 6


def decompose(preds, targets):
    """Per-GT stage pass counts at the headline (IoU>=0.7) gate."""
    n_gt = sum(len(t) for t in targets)
    stats = dict(gt=n_gt, matched50=0, matched70=0, corner_ok=0,
                 cls_ok=0, both_ok=0)
    slot_total = np.zeros(8, int)
    slot_right = np.zeros(8, int)
    n_wrong_slots = np.zeros(9, int)  # histogram: how many slots wrong
    for pred, target in zip(preds, targets):
        if len(target) == 0:
            continue
        if len(pred) == 0:
            continue
        a, b = pred[:, :4], target[:, 8:12]
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        lt = np.maximum(a[:, None, :2], b[None, :, :2])
        rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        iou = inter / (area_a[:, None] + area_b[None, :] - inter + 1e-12)
        best_iou = iou.max(0)
        best_pred = iou.argmax(0)
        for k in range(len(target)):
            if best_iou[k] < 0.5:
                continue
            stats["matched50"] += 1
            if best_iou[k] < 0.7:
                continue
            stats["matched70"] += 1
            p, t = pred[best_pred[k]], target[k]
            tb = t[8:12]
            area = (tb[2] - tb[0]) * (tb[3] - tb[1])
            is_cor = (np.abs(p[4:12] - t[12:20]).sum() / 8.0
                      < 0.1 * np.sqrt(max(area, 0.0)))
            slots_ok = p[20:28].astype(int) == t[:8].astype(int)
            slot_total += 1
            slot_right += slots_ok
            n_wrong_slots[8 - slots_ok.sum()] += 1
            stats["corner_ok"] += int(is_cor)
            stats["cls_ok"] += int(slots_ok.all())
            stats["both_ok"] += int(is_cor and slots_ok.all())
    return stats, slot_total, slot_right, n_wrong_slots


def top_confusions(mats, k=5):
    out = []
    for slot, (m, vocab) in enumerate(zip(mats, SLOT_VOCABS)):
        m = m.copy()
        np.fill_diagonal(m, 0)
        pairs = []
        # m[pred, true] over in-vocab classes only
        core = m[: len(vocab), : len(vocab)]
        flat = np.argsort(core.ravel())[::-1][:k]
        for idx in flat:
            pcls, tcls = np.unravel_index(idx, core.shape)
            if core[pcls, tcls] == 0:
                break
            pairs.append(f"{vocab[tcls]}->{vocab[pcls]} x{core[pcls, tcls]}")
        out.append((SLOT_NAMES[slot], pairs))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--conf-file", default="yololps")
    p.add_argument("--img-size", type=int, default=448)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--conf-thres", type=float, default=0.03)
    p.add_argument("--iou-thres", type=float, default=0.65)
    p.add_argument("--device", default="tpu")
    p.add_argument("--workers", type=int, default=2)
    args = p.parse_args(argv)

    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from yololp_tpu.core.evaler import run_eval
    from yololp_tpu.data.vocab import load_dataset_yaml
    from yololp_tpu.models import Model
    from yololp_tpu.utils.checkpoint import load_inference_variables
    from yololp_tpu.utils.config import Config
    from yololp_tpu.utils.metrics import character_confusions

    cfg = (Config.fromfile(args.conf_file) if args.conf_file.endswith(".py")
           else Config.named(args.conf_file))
    data_dict = load_dataset_yaml(args.data)
    variables = load_inference_variables(args.ckpt)
    model = Model(config=cfg, npro=int(data_dict.get("npro", 31)),
                  nalp=int(data_dict.get("nalp", 24)),
                  nads=int(data_dict.get("nads", 37)), deploy=True,
                  dtype=jnp.bfloat16)

    results, speed, (preds, targets, _paths) = run_eval(
        model, variables, data_dict, batch_size=args.batch_size,
        img_size=args.img_size, conf_thres=args.conf_thres,
        iou_thres=args.iou_thres, workers=args.workers, return_preds=True)
    mAP, mAP50, mAP75, mAP5095, recall = results[:5]
    print(f"\nstrict metric: mAP={mAP:.4f} mAP50={mAP50:.4f} "
          f"recall={recall:.4f}")

    stats, slot_total, slot_right, n_wrong = decompose(preds, targets)
    g = stats["gt"]
    m70 = max(stats["matched70"], 1)
    print(f"\nstage funnel over {g} GT plates (headline gate IoU>=0.7):")
    print(f"  matched @IoU>=0.5      {stats['matched50']:6d}  "
          f"({stats['matched50'] / max(g, 1):.3f} of GT)")
    print(f"  matched @IoU>=0.7      {stats['matched70']:6d}  "
          f"({stats['matched70'] / max(g, 1):.3f} of GT)")
    print(f"  corner criterion pass  {stats['corner_ok']:6d}  "
          f"({stats['corner_ok'] / m70:.3f} of matched70)")
    print(f"  all-8-chars pass       {stats['cls_ok']:6d}  "
          f"({stats['cls_ok'] / m70:.3f} of matched70)")
    print(f"  both (scored right)    {stats['both_ok']:6d}  "
          f"({stats['both_ok'] / m70:.3f} of matched70)")

    print("\nper-slot accuracy on matched70:")
    for name, r, t in zip(SLOT_NAMES, slot_right, slot_total):
        print(f"  {name}: {r / max(t, 1):.4f}  ({t - r} wrong)")
    print("\n#wrong-slots histogram (matched70): "
          + " ".join(f"{i}:{c}" for i, c in enumerate(n_wrong) if c))

    mats = character_confusions(preds, targets,
                                nads=int(data_dict.get("nads", 37)))
    print("\ntop confusion pairs per slot (true->pred):")
    for name, pairs in top_confusions(mats):
        if pairs:
            print(f"  {name}: " + ", ".join(pairs))


if __name__ == "__main__":
    main()
