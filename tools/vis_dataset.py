#!/usr/bin/env python3
"""Dataset visualization (reference: yolov6/data/vis_dataset.py + show.py).

Draws N samples (optionally with train-time augmentation) as annotated
images + a grid, for label sanity checks.

Usage:
  python tools/vis_dataset.py --img-dir /data/CCPD_lp/images/train \
      --out vis/ --n 8 [--augment]
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
    p = argparse.ArgumentParser("dataset visualization")
    p.add_argument("--img-dir", required=True)
    p.add_argument("--out", default="./vis")
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--augment", action="store_true",
                   help="apply the full train augmentation pipeline")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(args)

    import cv2
    import numpy as np
    import random

    from yololp_tpu.data.datasets import TrainValDataset
    from yololp_tpu.utils.config import Config
    from yololp_tpu.utils.visualize import draw_labels, image_grid

    random.seed(args.seed)
    hyp = Config.named("yololps")["data_aug"] if args.augment else {}
    ds = TrainValDataset(args.img_dir, img_size=args.img_size,
                         augment=args.augment, hyp=dict(hyp), seed=args.seed)
    os.makedirs(args.out, exist_ok=True)
    drawn = []
    for i in range(min(args.n, len(ds))):
        rgb, labels, mask, path, _ = ds[i]
        bgr = cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR)
        img = draw_labels(bgr, labels[mask > 0])
        cv2.imwrite(osp.join(args.out, f"sample_{i}_{osp.basename(path)}"), img)
        drawn.append(img)
    grid = image_grid(drawn)
    cv2.imwrite(osp.join(args.out, "grid.jpg"), grid)
    print(f"{len(drawn)} annotated samples + grid.jpg written to {args.out}")


if __name__ == "__main__":
    main()
