#!/usr/bin/env python3
"""LP-head knowledge-distillation proof: student baseline vs distilled student.

The reference ships a distillation flag (tools/train.py --distill) whose loss
path cannot run against the LP head (SURVEY §2.11: ComputeLoss_distill indexes
class logits the LP head never emits). This repo redesigned distillation for
the LP head (losses/distill.py: temperature-softened KL on all 8 character
tasks + objectness, cosine ramp-down weight); this script produces the
end-to-end evidence the redesign helps:

  A. train the student config from scratch           -> baseline val metrics
  B. train it again with --distill from a teacher    -> distilled val metrics
  C. eval both best checkpoints with tools/eval.py   -> RESULTS.md table

Both runs share data, epochs, seed, and schedule; the ONLY delta is the
distillation loss term. Stages are subprocesses over the existing CLIs so any
stage can be re-run by hand.

Example (synthetic data, teacher from the yololps generalization run):
  python tools/distill_proof.py --data runs/data/synth24k.yaml \
      --teacher-ckpt runs/train/yololps_synth24k/weights/best_ckpt.msgpack \
      --epochs 120 --img-size 320 --batch-size 64
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import subprocess
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

from tools.repopt_qat_pipeline import parse_eval, run  # noqa: E402


def best_val_from_log(log_jsonl: str):
    """Best val/mAP row recorded during training (engine eval epochs)."""
    best = None
    with open(log_jsonl) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "val/mAP" in rec and (best is None
                                     or rec["val/mAP"] > best["val/mAP"]):
                best = rec
    return best


def main(argv=None):
    p = argparse.ArgumentParser("LP distillation proof")
    p.add_argument("--data", required=True, help="dataset yaml")
    p.add_argument("--student-conf",
                   default=osp.join(ROOT, "yololp_tpu", "configs",
                                    "experiment", "yololpn_synth.py"))
    p.add_argument("--teacher-conf",
                   default=osp.join(ROOT, "yololp_tpu", "configs",
                                    "experiment", "yololps_synth.py"))
    p.add_argument("--teacher-ckpt", required=True)
    p.add_argument("--img-size", type=int, default=320)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=120)
    p.add_argument("--eval-interval", type=int, default=10)
    p.add_argument("--heavy-eval-range", type=int, default=5)
    p.add_argument("--device", default="tpu")
    p.add_argument("--cache-device", action="store_true", default=True)
    p.add_argument("--no-cache-device", dest="cache_device",
                   action="store_false")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output-dir", default="runs/distill_proof")
    p.add_argument("--skip-baseline", action="store_true",
                   help="reuse an existing baseline run")
    args = p.parse_args(argv)

    if not osp.isfile(args.teacher_ckpt):
        raise SystemExit(f"teacher checkpoint not found: {args.teacher_ckpt}")
    out = osp.abspath(args.output_dir)
    os.makedirs(out, exist_ok=True)
    py = sys.executable
    train = [py, osp.join(ROOT, "tools", "train.py")]
    common = ["--data-path", args.data, "--conf-file", args.student_conf,
              "--img-size", str(args.img_size), "--batch-size",
              str(args.batch_size), "--epochs", str(args.epochs),
              "--eval-interval", str(args.eval_interval),
              "--heavy-eval-range", str(args.heavy_eval_range),
              "--stop_aug_last_n_epoch", "0", "--seed", str(args.seed),
              "--device", args.device, "--output-dir", out, "--workers", "0"]
    if args.cache_device:
        common += ["--cache-device"]

    base_dir = osp.join(out, "baseline")
    kd_dir = osp.join(out, "distill")
    if not (args.skip_baseline
            and osp.isfile(osp.join(base_dir, "weights",
                                    "best_ckpt.msgpack"))):
        run(train + common + ["--name", "baseline"],
            osp.join(out, "baseline.log"))
    run(train + common + ["--name", "distill", "--distill",
                          "--teacher-ckpt", args.teacher_ckpt,
                          "--teacher-conf", args.teacher_conf],
        osp.join(out, "distill.log"))

    # ---- eval both best checkpoints under the strict LP metric ----
    evalp = [py, osp.join(ROOT, "tools", "eval.py")]
    eval_common = ["--data", args.data, "--conf-file", args.student_conf,
                   "--img-size", str(args.img_size), "--batch-size",
                   str(args.batch_size), "--device", args.device]
    rows = {}
    for name, d in (("baseline", base_dir), ("distill", kd_dir)):
        ckpt = osp.join(d, "weights", "best_ckpt.msgpack")
        if not osp.isfile(ckpt):
            ckpt = osp.join(d, "weights", "last_ckpt.msgpack")
        log = osp.join(out, f"eval_{name}.log")
        run(evalp + eval_common + ["--weights", ckpt,
                                   "--save-dir", osp.join(out, f"val_{name}")],
            log)
        rows[name] = parse_eval(log)
        rows[name]["train_best"] = best_val_from_log(
            osp.join(d, "train_log.jsonl"))

    lines = ["# LP distillation proof", "",
             f"student={osp.basename(args.student_conf)} "
             f"teacher={args.teacher_ckpt}",
             f"data={args.data} img={args.img_size} b={args.batch_size} "
             f"epochs={args.epochs} seed={args.seed}", "",
             "| run | mAP | mAP50 | mAP75 | mAP50-95 | recall | "
             "best during train |",
             "|---|---|---|---|---|---|---|"]
    for name, r in rows.items():
        tb = r["train_best"]
        tb_s = (f"{tb['val/mAP']:.4f} @e{tb['epoch']}" if tb else "n/a")
        lines.append(f"| {name} | {r['mAP']:.4f} | {r['mAP50']:.4f} | "
                     f"{r['mAP75']:.4f} | {r['mAP50_95']:.4f} | "
                     f"{r['recall']:.4f} | {tb_s} |")
    delta = rows["distill"]["mAP"] - rows["baseline"]["mAP"]
    lines += ["", f"distill - baseline mAP delta: {delta:+.4f}"]
    results = osp.join(out, "RESULTS.md")
    with open(results, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwritten: {results}")


if __name__ == "__main__":
    main()
