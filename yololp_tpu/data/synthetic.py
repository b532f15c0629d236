"""Synthetic CCPD-like dataset writer (for smoke training, CI, and demos).

Creates the on-disk layout the reference expects (images/<split>/*.jpg +
labels/<split>/*.txt with 20-float rows) by pasting generated plates onto
procedural backgrounds. The reference has no equivalent single entry point
(its data/generate.py writes plates only); this utility makes the whole
train/eval pipeline runnable without CCPD.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Optional

import cv2
import numpy as np

from yololp_tpu.data.generate import PlateGenerator, paste_plates


def make_synthetic_dataset(root: str, n_train: int = 64, n_val: int = 16,
                           img_size: int = 640, seed: int = 0,
                           cjk_font_path: Optional[str] = None) -> dict:
    """Write images/{train,val} + labels/{train,val}; returns a data dict
    compatible with load_dataset_yaml's output."""
    rng = np.random.default_rng(seed)
    gen = PlateGenerator(seed=seed, cjk_font_path=cjk_font_path)
    for split, n in (("train", n_train), ("val", n_val)):
        img_dir = osp.join(root, "images", split)
        lbl_dir = osp.join(root, "labels", split)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(lbl_dir, exist_ok=True)
        for i in range(n):
            h = w = img_size
            base = rng.integers(0, 255, 3)
            img = np.clip(base[None, None, :]
                          + rng.normal(0, 40, (h, w, 3)), 0, 255).astype(np.uint8)
            img = cv2.GaussianBlur(img, (0, 0), 2)
            labels = np.zeros((0, 20), np.float32)
            img, labels = paste_plates(img, labels, gen, rng=rng,
                                       min_num=1, max_num=3)
            cv2.imwrite(osp.join(img_dir, f"{split}_{i:05d}.jpg"), img)
            with open(osp.join(lbl_dir, f"{split}_{i:05d}.txt"), "w") as f:
                for row in labels:
                    cls = row[:8]
                    x1, y1, x2, y2 = row[8:12]
                    cx, cy = (x1 + x2) / 2 / w, (y1 + y2) / 2 / h
                    bw, bh = (x2 - x1) / w, (y2 - y1) / h
                    cors = row[12:20].copy()
                    cors[0::2] = np.clip(cors[0::2] / w, 0, 1)
                    cors[1::2] = np.clip(cors[1::2] / h, 0, 1)
                    vals = list(cls.astype(int)) + [cx, cy, bw, bh] + list(cors)
                    f.write(" ".join(f"{v:.6f}" if isinstance(v, float) else str(v)
                                     for v in vals) + "\n")
    return {"train": osp.join(root, "images", "train"),
            "val": osp.join(root, "images", "val"),
            "test": osp.join(root, "images", "val"),
            "is_coco": False, "npro": 31, "nalp": 24, "nads": 37}
