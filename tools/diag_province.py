#!/usr/bin/env python3
"""Province-head diagnostic: accuracy vs plate size + confusion pairs.

Matches detections to ground truth at IoU>=0.5 and buckets province-class
accuracy by the GT plate's pixel width at eval resolution, separating the
two candidate failure modes behind a high pro_loss:
  * illegibility  -> accuracy collapses below a width threshold but is high
    for large plates;
  * glyph confusion -> accuracy is flat-ish in size with specific
    (true, pred) pairs dominating the confusion table.

No reference counterpart (the reference has no per-task diagnostic tooling);
complements utils/metrics.py's per-slot char confusions.

Usage:
    python tools/diag_province.py --ckpt runs/train/X/weights/final_ckpt.msgpack \
        --data runs/data/synth24k.yaml --img-size 320 [--device cpu]
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--conf-file", default="yololps")
    p.add_argument("--img-size", type=int, default=320)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--conf-thres", type=float, default=0.03)
    p.add_argument("--device", default=None)
    p.add_argument("--max-images", type=int, default=0, help="0 = all")
    args = p.parse_args(argv)

    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from yololp_tpu.core.evaler import Evaler
    from yololp_tpu.data.vocab import PRO_NAMES, load_dataset_yaml
    from yololp_tpu.models import Model
    from yololp_tpu.utils.checkpoint import load_inference_variables
    from yololp_tpu.utils.config import Config

    data_dict = load_dataset_yaml(args.data)
    variables = load_inference_variables(args.ckpt)
    model = Model(config=Config.named(args.conf_file),
                  npro=int(data_dict.get("npro", 31)),
                  nalp=int(data_dict.get("nalp", 24)),
                  nads=int(data_dict.get("nads", 37)),
                  deploy=True, dtype=jnp.bfloat16)
    variables = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), variables)

    ev = Evaler(data_dict, batch_size=args.batch_size, img_size=args.img_size,
                conf_thres=args.conf_thres)
    loader, _ = ev.init_data("val")
    run_fn = ev.make_infer_fn(model, variables)
    preds, targets = ev.predict(run_fn, loader)
    if args.max_images:
        preds, targets = preds[: args.max_images], targets[: args.max_images]

    # match & collect (gt plate width px, true pro, pred pro)
    rows = []
    n_gt = n_matched = 0
    for det, tgt in zip(preds, targets):
        n_gt += len(tgt)
        if len(tgt) == 0:
            continue
        if len(det) == 0:
            for t in tgt:
                rows.append((float(t[10] - t[8]), int(t[0]), -1))
            continue
        iou = Evaler._box_iou(det[:, :4], tgt[:, 8:12])
        used = set()
        for ti in range(len(tgt)):
            cand = [(iou[pi, ti], pi) for pi in range(len(det))
                    if pi not in used and iou[pi, ti] >= 0.5]
            if cand:
                _, pi = max(cand)
                used.add(pi)
                n_matched += 1
                rows.append((float(tgt[ti, 10] - tgt[ti, 8]),
                             int(tgt[ti, 0]), int(det[pi, 20])))
            else:
                rows.append((float(tgt[ti, 10] - tgt[ti, 8]),
                             int(tgt[ti, 0]), -1))

    widths = np.array([r[0] for r in rows])
    ok = np.array([r[1] == r[2] for r in rows])
    det_ok = np.array([r[2] >= 0 for r in rows])
    print(f"gt plates: {n_gt}  matched: {n_matched} "
          f"({100 * n_matched / max(n_gt, 1):.1f}%)")
    edges = [0, 40, 60, 80, 100, 130, 1e9]
    print(f"{'plate width px':>16} {'n':>6} {'det%':>6} {'pro acc%':>9}")
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = (widths >= lo) & (widths < hi)
        if m.sum() == 0:
            continue
        lab = f"[{lo:.0f},{'inf' if hi > 1e8 else f'{hi:.0f}'})"
        print(f"{lab:>16} {int(m.sum()):>6} {100 * det_ok[m].mean():>5.1f} "
              f"{100 * ok[m & det_ok].mean() if (m & det_ok).any() else 0:>8.1f}")

    conf = collections.Counter((r[1], r[2]) for r in rows
                               if r[2] >= 0 and r[1] != r[2])
    print("\ntop confusions (true -> pred, count):")
    for (t, pr), c in conf.most_common(15):
        print(f"  {PRO_NAMES[t]} -> {PRO_NAMES[pr]}: {c}")
    per_true = collections.defaultdict(lambda: [0, 0])
    for r in rows:
        if r[2] >= 0:
            per_true[r[1]][1] += 1
            per_true[r[1]][0] += int(r[1] == r[2])
    accs = {PRO_NAMES[k]: round(v[0] / v[1], 3)
            for k, v in sorted(per_true.items()) if v[1] >= 5}
    print("\nper-province acc:", json.dumps(accs, ensure_ascii=False))


if __name__ == "__main__":
    main()
