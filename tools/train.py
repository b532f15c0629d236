#!/usr/bin/env python3
"""Training CLI (reference: tools/train.py).

Examples:
  python tools/train.py --conf-file yololps --data-path data/dataset.yaml
  python tools/train.py --conf-file yololpn --synthetic-data --epochs 3 \
      --img-size 256 --batch-size 8 --device cpu     # smoke run, no dataset
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
    p = argparse.ArgumentParser("YOLO-LP TPU training", add_help=True)
    p.add_argument("--data-path", type=str, default=None, help="dataset yaml")
    p.add_argument("--conf-file", type=str, default="yololps",
                   help="model config: built-in name or .py path")
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=32,
                   help="GLOBAL batch size (sharded over the mesh)")
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--device", default="tpu", help="tpu or cpu")
    p.add_argument("--eval-interval", type=int, default=20)
    p.add_argument("--heavy-eval-range", type=int, default=50,
                   help="eval every epoch in the last N epochs")
    p.add_argument("--stop_aug_last_n_epoch", type=int, default=15)
    p.add_argument("--save_ckpt_on_last_n_epoch", type=int, default=0)
    p.add_argument("--save-every-epoch", action="store_true",
                   help="save last_ckpt every epoch (default: eval epochs only)")
    p.add_argument("--output-dir", default="./runs/train")
    p.add_argument("--name", default="exp")
    p.add_argument("--resume", nargs="?", const=True, default=False)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--approx-topk", action="store_true",
                   help="use approx_max_k (TPU PartialReduce, recall 0.95) "
                        "for the assigner's top-k instead of the full sort; "
                        "the loss+assigner grad is sort-latency-bound "
                        "(docs/perf/r5) so this trades exact reference "
                        "parity for ~10 ms of the b32@640 step")
    p.add_argument("--assigner", choices=["atss", "tal", "atss_tal"],
                   default=None,
                   help="override the label assigner: atss (reference "
                        "parity), tal, or atss_tal (ATSS warmup epochs then "
                        "task-aligned; recommended — ATSS alone has a "
                        "zero-foreground band for plate-aspect boxes)")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--fp32", dest="bf16", action="store_false")
    p.add_argument("--data-parallel", action="store_true", default=True,
                   help="shard batches over all local devices")
    p.add_argument("--cache-device", action="store_true",
                   help="stage the whole dataset in device HBM and gather "
                        "batches on-device (no-augmentation runs only)")
    p.add_argument("--epochs-per-dispatch", type=int, default=1,
                   help="with --cache-device: scan up to K consecutive "
                        "epochs in ONE XLA dispatch (chunks break at eval/"
                        "ckpt epochs and assigner-schedule switches); "
                        "amortizes the per-epoch host turnaround, which "
                        "dominates wall time over a remote-TPU tunnel")
    p.add_argument("--synthetic-data", action="store_true",
                   help="generate a small synthetic dataset (smoke/demo)")
    p.add_argument("--synthetic-n", type=int, default=64)
    p.add_argument("--quant", action="store_true",
                   help="QAT training (requires a calib amax file)")
    p.add_argument("--calib", action="store_true",
                   help="with --quant: run PTQ calibration then exit")
    p.add_argument("--calib-pt", type=str, default=None,
                   help="calibration amax json for QAT (overrides cfg.qat)")
    p.add_argument("--distill", action="store_true",
                   help="LP-head knowledge distillation (needs --teacher-ckpt)")
    p.add_argument("--teacher-ckpt", type=str, default=None)
    p.add_argument("--teacher-conf", type=str, default=None,
                   help="teacher model config (defaults to --conf-file)")
    return p


def main(args=None):
    args = get_args_parser().parse_args(args)
    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # multi-host rendezvous BEFORE any other jax use (reference
    # dist.init_process_group, tools/train.py:105-110). No-op unless
    # COORDINATOR_ADDRESS is set.
    from yololp_tpu.parallel.mesh import initialize_distributed

    initialize_distributed()

    from yololp_tpu.core.engine import Trainer
    from yololp_tpu.data.vocab import load_dataset_yaml
    from yololp_tpu.utils.config import Config

    cfg = (Config.fromfile(args.conf_file) if args.conf_file.endswith(".py")
           else Config.named(args.conf_file))

    if args.synthetic_data:
        import jax

        from yololp_tpu.data.synthetic import make_synthetic_dataset

        root = osp.join(args.output_dir, "synthetic_data")
        if jax.process_index() == 0:
            # single writer: concurrent processes generating into the same
            # root would race on the same image files (half-written JPEGs)
            data_dict = make_synthetic_dataset(
                root, n_train=args.synthetic_n,
                n_val=max(args.synthetic_n // 4, 4),
                img_size=args.img_size, seed=args.seed)
        else:
            data_dict = {"train": osp.join(root, "images", "train"),
                         "val": osp.join(root, "images", "val"),
                         "test": osp.join(root, "images", "val"),
                         "is_coco": False, "npro": 31, "nalp": 24, "nads": 37}
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("synthetic_data_written")
    else:
        assert args.data_path, "--data-path or --synthetic-data required"
        data_dict = load_dataset_yaml(args.data_path)

    args.save_dir = osp.join(args.output_dir, args.name)

    mesh = None
    if args.data_parallel and (len(jax.devices()) > 1
                               or jax.process_count() > 1):
        # jax.devices() is GLOBAL after initialize_distributed: the 1-D data
        # mesh spans ICI within a slice and DCN across hosts (SURVEY §2.13)
        from jax.sharding import Mesh
        import numpy as np

        mesh = Mesh(np.asarray(jax.devices()), ("data",))
        assert args.batch_size % len(jax.devices()) == 0, \
            "device count must divide the global batch size"

    trainer = Trainer(args, cfg, data_dict, device_mesh=mesh)
    if args.quant and args.calib:
        if args.resume:
            trainer.resume(args.resume if isinstance(args.resume, str) else
                           osp.join(args.save_dir, "weights",
                                    "last_ckpt.msgpack"))
        trainer.calibrate()
        return
    resume_path = None
    if args.resume:
        resume_path = (args.resume if isinstance(args.resume, str) else
                       osp.join(args.save_dir, "weights", "last_ckpt.msgpack"))
    best = trainer.train(resume_path=resume_path)
    print(f"Training done. best mAP={best:.4f}. Checkpoints in "
          f"{osp.join(args.save_dir, 'weights')}")


if __name__ == "__main__":
    main()
