#!/usr/bin/env python3
"""Generate a synthetic CCPD-like dataset + its yaml, in resumable chunks.

Wraps data/synthetic.make_synthetic_dataset (chunked via its `start` offset
so an interrupted generation continues where it stopped) and writes the
data yaml the train/eval CLIs consume.

Usage:
    python tools/make_dataset.py --root runs/data/synth14k_v2 \
        --n-train 14000 --n-val 2000 --img-size 640 \
        --ratio-min 0.16 --ratio-max 0.5 --diversity 1.0
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import time

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--n-train", type=int, default=14000)
    p.add_argument("--n-val", type=int, default=2000)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ratio-min", type=float, default=0.1)
    p.add_argument("--ratio-max", type=float, default=0.4)
    p.add_argument("--diversity", type=float, default=0.0)
    p.add_argument("--chunk", type=int, default=1000)
    p.add_argument("--cjk-font", type=str, default=None)
    args = p.parse_args(argv)

    from yololp_tpu.data.synthetic import make_synthetic_dataset

    t0 = time.time()

    def _resume_point(split):
        # count existing files once, round down to a chunk boundary
        d = osp.join(args.root, "images", split)
        if not osp.isdir(d):
            return 0
        n = sum(1 for f in os.listdir(d) if f.endswith(".jpg"))
        return (n // args.chunk) * args.chunk

    done = _resume_point("train")
    if done:
        print(f"resuming at train image {done}")
    for start in range(done, args.n_train, args.chunk):
        n = min(args.chunk, args.n_train - start)
        make_synthetic_dataset(
            args.root, n_train=n, n_val=0, img_size=args.img_size,
            seed=args.seed, cjk_font_path=args.cjk_font,
            ratio_min=args.ratio_min, ratio_max=args.ratio_max,
            start=start, diversity=args.diversity)
        el = time.time() - t0
        print(f"train {start + n}/{args.n_train}  ({el:.0f}s elapsed)",
              flush=True)

    # val resumes independently so an interrupted val generation completes
    # on re-run (same chunked rng-stream scheme as train)
    vdone = _resume_point("val")
    if vdone:
        print(f"resuming at val image {vdone}")
    for start in range(vdone, args.n_val, args.chunk):
        n = min(args.chunk, args.n_val - start)
        make_synthetic_dataset(
            args.root, n_train=0, n_val=n, img_size=args.img_size,
            seed=args.seed, cjk_font_path=args.cjk_font,
            ratio_min=args.ratio_min, ratio_max=args.ratio_max,
            start=start, diversity=args.diversity)
        el = time.time() - t0
        print(f"val {start + n}/{args.n_val}  ({el:.0f}s elapsed)",
              flush=True)

    # yaml computed independently of the loops so an already-complete
    # generation still (re)writes it; a zero-image generator call returns
    # the authoritative data dict (paths + vocab sizes) without duplicating
    # its schema here
    data = make_synthetic_dataset(
        args.root, n_train=0, n_val=0, img_size=args.img_size,
        seed=args.seed, cjk_font_path=args.cjk_font,
        ratio_min=args.ratio_min, ratio_max=args.ratio_max,
        diversity=args.diversity)
    yaml_path = args.root.rstrip("/") + ".yaml"
    with open(yaml_path, "w") as f:
        for k, v in data.items():
            f.write(f"{k}: {v}\n")
    print(f"wrote {yaml_path}")


if __name__ == "__main__":
    main()
