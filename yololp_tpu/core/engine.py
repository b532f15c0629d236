"""Training engine (reference: yolov6/core/engine.py Trainer).

Orchestrates: data loaders -> jitted train step (forward/loss/SGD/EMA inside
one XLA program, optionally pjit over a device mesh) -> per-epoch eval with
the LP metric -> last/best checkpointing -> scalar logging (jsonl + optional
tensorboard). The hot loop does no host-side math beyond feeding uint8
batches.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import time
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from yololp_tpu.core.evaler import run_eval
from yololp_tpu.core.train_step import TrainState, init_train_state, make_train_step
from yololp_tpu.data.datasets import create_dataloader
from yololp_tpu.layers.fuse import fuse_variables_jit
from yololp_tpu.losses.loss import LossConfig
from yololp_tpu.models.yolo import Model, build_model
from yololp_tpu.solver.build import SolverConfig
from yololp_tpu.utils.checkpoint import save_checkpoint
from yololp_tpu.utils.config import Config

LOSS_NAMES = ["iou_loss", "cor_loss", "dfl_loss", "cls_loss",
              "pro_loss", "alp_loss", "ads_loss"]


class _ReplayLoader:
    """Caches the wrapped loader's batches in host RAM on the first full
    pass and replays them afterwards (used for repeated in-training evals
    when the dataset is small enough to pin, e.g. --cache-device runs)."""

    def __init__(self, loader):
        self.loader = loader
        self.cached = None

    def __len__(self):
        return len(self.cached) if self.cached is not None else len(self.loader)

    def __iter__(self):
        if self.cached is not None:
            yield from self.cached
            return
        acc = []
        for batch in self.loader:
            acc.append(batch)
            yield batch
        self.cached = acc


class Trainer:
    def __init__(self, args, cfg: Config, data_dict: Dict, device_mesh=None):
        self.args = args
        self.cfg = cfg
        self.data_dict = data_dict
        self.img_size = int(args.img_size)
        self.batch_size = int(args.batch_size)
        self.epochs = int(args.epochs)
        self.save_dir = args.save_dir
        self.mesh = device_mesh
        os.makedirs(osp.join(self.save_dir, "weights"), exist_ok=True)

        self.npro = int(data_dict.get("npro", 31))
        self.nalp = int(data_dict.get("nalp", 24))
        self.nads = int(data_dict.get("nads", 37))

        # multi-host DP: each host loads a disjoint shard and feeds its
        # local slice of the global batch (reference: DistributedSampler +
        # per-rank batch, data_load.py:65-67, engine.py:365)
        self.n_procs = jax.process_count()
        self.is_main = jax.process_index() == 0
        assert self.batch_size % self.n_procs == 0, \
            "process count must divide the global batch size"
        host_batch = self.batch_size // self.n_procs
        shard = ((jax.process_index(), self.n_procs)
                 if self.n_procs > 1 else None)

        hyp = dict(cfg["data_aug"])
        self.cache = None
        if getattr(args, "cache_device", False):
            # HBM-resident dataset: batches gathered on-device by index (see
            # data/device_cache.py). Deterministic no-aug protocol only.
            # Multi-device AND multi-host: the dataset is staged replicated
            # on every device of the (global) mesh, the per-epoch index
            # matrix is a pure function of (seed, epoch) so every process
            # computes the identical global schedule, and the batch gather
            # is sharded over 'data' — each device gathers its own slice
            # locally, zero cross-device traffic.
            assert self.n_procs == 1 or self.mesh is not None, \
                "multi-process --cache-device requires a global device mesh"
            aug_on = [k for k, v in hyp.items()
                      if k != "test_load_size" and float(v or 0) != 0.0]
            assert not aug_on, (
                f"--cache-device requires all augmentations off, got {aug_on}")
            from yololp_tpu.data.datasets import TrainValDataset
            from yololp_tpu.data.device_cache import DeviceCachedData

            cache_sh = None
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                cache_sh = NamedSharding(self.mesh, P())  # replicated
            self.train_dataset = TrainValDataset(
                data_dict["train"], img_size=self.img_size, augment=False,
                task="train")
            self.cache = DeviceCachedData(self.train_dataset,
                                          seed=getattr(args, "seed", 0),
                                          sharding=cache_sh)
            self.train_loader = None
            # the cached gather runs on the GLOBAL batch (sharded per
            # device); every process steps the same schedule
            self.steps_per_epoch = max(
                self.cache.steps_per_epoch(self.batch_size), 1)
        else:
            self.train_loader, self.train_dataset = create_dataloader(
                data_dict["train"], self.img_size, host_batch, hyp=hyp,
                augment=True, workers=int(args.workers), task="train",
                seed=getattr(args, "seed", 0), process_shard=shard)
            self.steps_per_epoch = max(len(self.train_loader), 1)

        dtype = jnp.bfloat16 if getattr(args, "bf16", True) else jnp.float32
        self.model = Model(config=cfg, npro=self.npro, nalp=self.nalp,
                           nads=self.nads, deploy=False, dtype=dtype)
        _, variables = build_model(cfg, self.npro, self.nalp, self.nads,
                                   img_size=(64, 64), dtype=dtype,
                                   seed=getattr(args, "seed", 0))
        self.state = init_train_state(variables)

        head = cfg["model"]["head"]
        # Assigner schedule. 'atss' (reference parity: ATSS for every epoch,
        # losses/loss.py:44-46 — TAL is dead code upstream), 'tal', or
        # 'atss_tal' (upstream-yolov6-3.0 style: ATSS for the first
        # `atss_warmup_epoch` epochs while predictions are random, then the
        # task-aligned assigner). ATSS's mean+std IoU threshold has a
        # ZERO-foreground band for LP-aspect (≈3.8:1) boxes whose height
        # crosses the stride-16/32 handoff (e.g. 100-120px-wide plates at
        # 320 input — measured round 3, tools/diag_province.py); TAL has no
        # such hole, so 'atss_tal' is the accuracy-recommended setting.
        assigner = str(getattr(args, "assigner", None)
                       or head.get("assigner", "atss"))
        # configs inherited from the reference say atss_warmup_epoch=0 (its
        # formal assigner is ALSO atss, so the value is vestigial there);
        # for the real atss->tal schedule 0 would mean cold-start TAL on
        # random predictions — treat 0/absent as the upstream default of 4
        # (pure-TAL-from-epoch-0 is spelled --assigner tal)
        self.atss_warmup_epoch = (int(head.get("atss_warmup_epoch") or 4)
                                  if assigner == "atss_tal" else 0)
        self.loss_cfg = LossConfig(
            img_size=(self.img_size, self.img_size),
            strides=tuple(head["strides"]), npro=self.npro, nalp=self.nalp,
            nads=self.nads, use_dfl=bool(head["use_dfl"]),
            reg_max=int(head["reg_max"]), iou_type=head["iou_type"],
            assigner="atss" if assigner == "atss_tal" else assigner,
            approx_topk=bool(getattr(args, "approx_topk", False)))
        self._loss_cfg_formal = (self.loss_cfg._replace(assigner="tal")
                                 if assigner == "atss_tal" else self.loss_cfg)
        solver = cfg["solver"]
        weight_decay = solver["weight_decay"]

        # ---- RepOpt stage-2 (engine.py:67-70 + RepOptimizer.py) ----
        grad_masks = None
        if cfg.get("training_mode") == "repopt" and cfg.get("scales"):
            from yololp_tpu.solver.repopt import (
                gradient_masks, load_scales, reinitialize)

            scales = load_scales(cfg["scales"])
            params = reinitialize(self.state.params, scales,
                                  jax.random.PRNGKey(getattr(args, "seed", 0)))
            self.state = self.state._replace(params=params, ema_params=params)
            grad_masks = gradient_masks(params, scales)
            # RepOptimizer.get_optimizer_param scales wd by the effective batch
            accumulate = max(1, round(64 / self.batch_size))
            weight_decay = weight_decay * self.batch_size * accumulate / 64

        self.solver_cfg = SolverConfig(
            lr0=solver["lr0"], lrf=solver["lrf"], momentum=solver["momentum"],
            weight_decay=weight_decay,
            warmup_epochs=solver["warmup_epochs"],
            warmup_momentum=solver["warmup_momentum"],
            warmup_bias_lr=solver["warmup_bias_lr"],
            lr_scheduler=solver["lr_scheduler"], epochs=self.epochs,
            steps_per_epoch=self.steps_per_epoch)

        # ---- QAT (engine.py:558-573 quant_setup / qat flow) ----
        quant_amax, quant_skip = None, ("proj_conv",)
        if getattr(args, "quant", False) and not getattr(args, "calib", False):
            from yololp_tpu.quant.quantize import load_amax

            qat_cfg = cfg.get("qat") or {}
            calib_path = getattr(args, "calib_pt", None) or qat_cfg.get("calib_pt")
            assert calib_path, "QAT requires a calibration amax file (--calib first)"
            quant_amax = load_amax(calib_path)
            if qat_cfg.get("sensitive_layers_skip"):
                quant_skip = quant_skip + tuple(qat_cfg["sensitive_layers_list"])

        # ---- LP knowledge distillation (designed new — the reference's
        # distill path cannot run against the LP head, SURVEY §2.11) ----
        teacher = None
        if getattr(args, "distill", False):
            from yololp_tpu.utils.checkpoint import load_checkpoint_raw

            t_cfg_name = getattr(args, "teacher_conf", None) or args.conf_file
            t_cfg = (Config.fromfile(t_cfg_name) if t_cfg_name.endswith(".py")
                     else Config.named(t_cfg_name))
            t_model = Model(config=t_cfg, npro=self.npro, nalp=self.nalp,
                            nads=self.nads, deploy=False, dtype=dtype)
            t_ckpt = load_checkpoint_raw(args.teacher_ckpt)
            t_vars = t_ckpt.get("ema") or t_ckpt["variables"]
            teacher = (t_model, t_vars)

        self._data_sh = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._data_sh = NamedSharding(self.mesh, P("data"))
            self.state = jax.device_put(
                self.state, NamedSharding(self.mesh, P()))

        def _build_fns(loss_cfg):
            """(step_fn, epoch_fn) for one assigner config; compiled lazily
            per assigner so the 'atss_tal' schedule costs a second compile
            only when the switch epoch is actually reached."""
            step_fn = make_train_step(
                self.model, loss_cfg, self.solver_cfg,
                self.batch_size, grad_masks=grad_masks,
                quant_amax=quant_amax, quant_skip=quant_skip,
                teacher=teacher,
                distill_cfg=dict(
                    cfg["model"]["head"].get("distill_weight") or {}))
            if self.cache is not None:
                from yololp_tpu.data.device_cache import (make_cached_epoch,
                                                          make_cached_multi_epoch)

                # whole-epoch scan program. NOT donating the state: at
                # epoch 0 params/ema_params alias the same buffers
                # (init_train_state, resume) and XLA rejects donating one
                # buffer twice.
                batch_sh = self._data_sh if self.mesh is not None else None
                return (None,
                        jax.jit(make_cached_epoch(
                            step_fn, self.cache.img_shape, batch_sh)),
                        jax.jit(make_cached_multi_epoch(
                            step_fn, self.cache.img_shape, batch_sh)))
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                repl = NamedSharding(self.mesh, P())
                return jax.jit(
                    step_fn,
                    in_shardings=(repl, self._data_sh, self._data_sh,
                                  self._data_sh),
                    out_shardings=(repl, repl, repl)), None, None
            assert self.n_procs == 1, "multi-host training requires a mesh"
            return jax.jit(step_fn), None, None

        self._build_train_fns = _build_fns
        self._train_fns_cache = {}
        self.step_fn, self.epoch_fn, self.multi_epoch_fn = \
            self._fns_for_epoch(0)

        self.best_ap = -1.0
        self.best_stop_aug_ap = -1.0
        self.log_path = osp.join(self.save_dir, "train_log.jsonl")
        self.tb = self._try_tensorboard() if self.is_main else None

    def _fns_for_epoch(self, epoch: int):
        """(step_fn, epoch_fn) honoring the assigner schedule."""
        loss_cfg = (self.loss_cfg if epoch < self.atss_warmup_epoch
                    or self._loss_cfg_formal is self.loss_cfg
                    else self._loss_cfg_formal)
        key = loss_cfg.assigner
        if key not in self._train_fns_cache:
            self._train_fns_cache[key] = self._build_train_fns(loss_cfg)
        return self._train_fns_cache[key]

    def _to_global(self, arr):
        """Host batch -> device array. Multi-host: each process contributes
        its local shard of the global batch (the pjit-era equivalent of
        DDP's per-rank inputs); single-host: plain transfer."""
        if self.n_procs > 1:
            return jax.make_array_from_process_local_data(
                self._data_sh, np.asarray(arr))
        return jnp.asarray(arr)

    def _try_tensorboard(self):
        try:
            from torch.utils.tensorboard import SummaryWriter

            return SummaryWriter(osp.join(self.save_dir, "tb"))
        except (ImportError, OSError):
            return None

    def _log(self, record: Dict):
        with open(self.log_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self.tb is not None:
            step = record.get("step", 0)
            for k, v in record.items():
                if isinstance(v, (int, float)) and k != "step":
                    self.tb.add_scalar(k, v, step)

    # ---- checkpoints (engine.py:168-196 policy) ----

    def save(self, name: str, epoch: int):
        ckpt = {
            "format": "train", "step": int(self.state.step), "epoch": epoch,
            "variables": {"params": self.state.params,
                          "batch_stats": self.state.batch_stats},
            "ema": {"params": self.state.ema_params,
                    "batch_stats": self.state.ema_stats},
            "opt_state": {"momentum": self.state.momentum,
                          "ema_updates": self.state.ema_updates,
                          "last_opt_step": self.state.last_opt_step},
            "meta": {"cfg": str(self.cfg.get("_filename", "")),
                     "img_size": self.img_size},
        }
        save_checkpoint(ckpt, osp.join(self.save_dir, "weights", name))

    def resume(self, path: str):
        from yololp_tpu.utils.checkpoint import load_checkpoint_raw

        ckpt = load_checkpoint_raw(path)
        v = ckpt["variables"]
        ema = ckpt.get("ema") or v
        opt = ckpt.get("opt_state") or {}
        st = self.state
        self.state = TrainState(
            params=v["params"], batch_stats=v.get("batch_stats", {}),
            momentum=opt.get("momentum", st.momentum),
            grad_accum=jax.tree_util.tree_map(jnp.zeros_like, v["params"]),
            ema_params=ema["params"], ema_stats=ema.get("batch_stats", {}),
            ema_updates=jnp.asarray(opt.get("ema_updates", 0), jnp.int32),
            step=jnp.asarray(ckpt.get("step", 0), jnp.int32),
            last_opt_step=jnp.asarray(opt.get("last_opt_step", -1), jnp.int32))
        if self.mesh is not None:
            # restore the replicated placement (the checkpoint loads as host
            # arrays; the epoch_fn path has no in_shardings to re-place them)
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.state = jax.device_put(
                self.state, NamedSharding(self.mesh, P()))
        self.resumed_epoch = int(ckpt.get("epoch", -1))
        return self.resumed_epoch + 1

    # ---- eval hook ----

    def eval_model(self):
        ema = {"params": self.state.ema_params,
               "batch_stats": self.state.ema_stats}
        if self.n_procs > 1:
            # Rank-0 eval must be PROCESS-LOCAL (reference: rank-0 evals the
            # replicated DDP model). The train state is committed to the
            # global multi-host mesh; running a jit on it from one process
            # alone would hang on collectives the other hosts never join.
            # The state is fully replicated (P()), so device_get gives this
            # host a complete copy; everything downstream then compiles and
            # runs on local devices only, while the other hosts' queued
            # train steps simply wait for process 0 to rejoin.
            ema = jax.device_get(ema)
        variables = fuse_variables_jit(ema)
        if not hasattr(self, "_eval_cache"):
            from yololp_tpu.core.evaler import Evaler

            eval_model = Model(config=self.cfg, npro=self.npro,
                               nalp=self.nalp, nads=self.nads, deploy=True,
                               dtype=self.model.dtype)
            ev = Evaler(self.data_dict, self.batch_size, self.img_size,
                        workers=int(self.args.workers))
            loader, _ = ev.init_data("val")
            if self.cache is not None:
                # decode the val set once, replay host batches on later evals
                loader = _ReplayLoader(loader)
            # variables-as-argument: ONE compiled eval program for all epochs
            run_fn = ev.make_infer_fn(eval_model)
            self._eval_cache = (eval_model, ev, loader, run_fn)
        eval_model, ev, loader, run_fn = self._eval_cache
        results, speed, (preds, _targets, paths) = run_eval(
            eval_model, variables, self.data_dict, evaler=ev, loader=loader,
            run_fn=run_fn, return_preds=True)
        self._save_val_vis(preds, paths)
        return results, speed

    def _save_val_vis(self, preds, paths, max_imgs: int = 8):
        """Val predictions with corner quads + plate strings
        (engine.py:449-535 write_tbimg 'val' parity)."""
        try:
            import cv2

            from yololp_tpu.data.images import letterbox
            from yololp_tpu.utils.visualize import draw_detections, image_grid

            drawn = []
            for path, det in list(zip(paths, preds))[:max_imgs]:
                bgr = cv2.imread(path)
                if bgr is None:
                    continue
                boxed = letterbox(bgr, self.img_size, auto=False)[0]
                drawn.append(draw_detections(boxed, det))
            if drawn:
                grid = image_grid(drawn)
                out = osp.join(self.save_dir, "vis", "val_predictions.jpg")
                os.makedirs(osp.dirname(out), exist_ok=True)
                cv2.imwrite(out, grid)
        except Exception as e:  # noqa: BLE001 — vis must never kill training
            print(f"val vis skipped: {e}")

    # ---- PTQ calibration (engine.py:539-556 calibrate) ----

    def calibrate(self):
        """Run PTQ calibration over cfg.ptq.calib_batches batches; saves the
        per-conv amax json + a calib checkpoint; returns the amax dict."""
        from yololp_tpu.quant.quantize import calibrate as _calibrate, save_amax

        ptq = self.cfg.get("ptq") or {}
        n_batches = int(ptq.get("calib_batches", 4))
        method = ("max" if ptq.get("calib_method", "max") == "max"
                  else ptq.get("histogram_amax_method", "entropy"))
        skip = ("proj_conv",)
        if ptq.get("sensitive_layers_skip"):
            skip = skip + tuple(ptq.get("sensitive_layers_list", ()))

        variables = fuse_variables_jit(
            {"params": self.state.ema_params,
             "batch_stats": self.state.ema_stats})
        deploy = Model(config=self.cfg, npro=self.npro, nalp=self.nalp,
                       nads=self.nads, deploy=True, dtype=self.model.dtype)
        batches = []
        for imgs, _, _, _, _ in self.train_loader:
            batches.append(imgs)
            if len(batches) >= n_batches:
                break
        amax = _calibrate(deploy, variables, batches, method=method,
                          percentile=float(ptq.get("histogram_amax_percentile",
                                                    99.99)),
                          skip_substrings=skip)
        out = osp.join(self.save_dir, "weights", "calib_amax.json")
        save_amax(amax, out)
        # preserve the source epoch: a QAT finetune resuming this checkpoint
        # with --epochs N+10 must continue the epoch LOOP from the source
        # run's position, not restart at 0 (the step-driven lr schedule was
        # already correct; the loop length was not)
        self.save("calib_ckpt.msgpack",
                  epoch=getattr(self, "resumed_epoch", -1))
        print(f"PTQ calibration ({method}) over {len(batches)} batches -> {out}")
        return amax

    # ---- main loop ----

    def _run_cached_epoch(self, epoch: int):
        """One whole-epoch scan dispatch over the HBM-resident dataset;
        returns (mean loss items, steps run)."""
        c = self.cache
        idx_mat = c.epoch_index_matrix(self.batch_size, epoch)
        self._maybe_train_vis(epoch, idx_mat[0])
        if self.mesh is not None:
            # every process computed the identical matrix (pure fn of
            # seed+epoch), so a replicated global placement is well-defined;
            # a plain jnp.asarray would commit to one local device and a
            # multi-host jit would reject it
            from jax.sharding import NamedSharding, PartitionSpec as P

            from yololp_tpu.data.device_cache import put_replicated

            idx_dev = put_replicated(
                NamedSharding(self.mesh, P()))(idx_mat)
        else:
            idx_dev = jnp.asarray(idx_mat)
        self.state, items_sum = self.epoch_fn(
            self.state, c.images, c.labels, c.masks, idx_dev)
        return np.asarray(items_sum) / max(len(idx_mat), 1), len(idx_mat)

    def _maybe_train_vis(self, epoch: int, idx_row):
        if epoch % 10 == 0 and self.is_main:
            from yololp_tpu.utils.visualize import save_train_batch_vis

            c = self.cache
            save_train_batch_vis(
                c.host_images[idx_row], c.host_labels[idx_row],
                c.host_masks[idx_row],
                osp.join(self.save_dir, "vis", f"train_batch_e{epoch}.jpg"))

    def _run_cached_epochs(self, e0: int, k: int):
        """K consecutive epochs as ONE scan dispatch
        (make_cached_multi_epoch) — identical math to k sequential
        _run_cached_epoch calls, paying the host turnaround once. Returns
        [(mean loss items, steps)] per epoch."""
        c = self.cache
        mats = np.stack([c.epoch_index_matrix(self.batch_size, e)
                         for e in range(e0, e0 + k)])
        for i in range(k):
            self._maybe_train_vis(e0 + i, mats[i][0])
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from yololp_tpu.data.device_cache import put_replicated

            idx_dev = put_replicated(NamedSharding(self.mesh, P()))(mats)
        else:
            idx_dev = jnp.asarray(mats)
        self.state, items = self.multi_epoch_fn(
            self.state, c.images, c.labels, c.masks, idx_dev)
        items = np.asarray(items)
        s = mats.shape[1]
        return [(items[i] / max(s, 1), s) for i in range(k)]

    def train(self, resume_path: Optional[str] = None):
        start_epoch = self.resume(resume_path) if resume_path else 0
        if start_epoch >= self.epochs:
            raise ValueError(
                f"resume epoch {start_epoch} >= --epochs {self.epochs}: the "
                f"training loop would run zero epochs. Pass --epochs greater "
                f"than the resumed checkpoint's epoch (e.g. resumed_epoch + "
                f"finetune_epochs).")
        stop_aug_epoch = self.epochs - int(
            getattr(self.args, "stop_aug_last_n_epoch", 15))
        eval_interval = int(getattr(self.args, "eval_interval", 20))
        eval_final_n = int(getattr(self.args, "heavy_eval_range", 50))
        epd = max(1, int(getattr(self.args, "epochs_per_dispatch", 1)))

        def _evals_after(j):
            return ((j % eval_interval == 0)
                    or (j >= self.epochs - eval_final_n)
                    or (j == self.epochs - 1))

        def _saves_after(j):
            n_last = int(getattr(self.args, "save_ckpt_on_last_n_epoch", 0)
                         or 0)
            return (getattr(self.args, "save_every_epoch", False)
                    or (n_last and j >= self.epochs - n_last))

        # epoch -> (mean_items, n_steps, wall_s, end_step) for epochs already
        # executed inside a multi-epoch chunk dispatch
        pending = {}

        for epoch in range(start_epoch, self.epochs):
            if epoch == stop_aug_epoch and self.train_loader is not None:
                self.train_dataset.disable_heavy_aug()
            self.step_fn, self.epoch_fn, self.multi_epoch_fn = \
                self._fns_for_epoch(epoch)
            t0 = time.time()
            epoch_wall = None
            epoch_end_step = None
            if self.cache is not None:
                if epoch in pending:
                    (mean_items, n_steps, epoch_wall,
                     epoch_end_step) = pending.pop(epoch)
                elif epd > 1:
                    # extend the chunk while no epoch inside it needs a
                    # host-side action (eval, per-epoch ckpt) or a different
                    # compiled fn (assigner schedule); the chunk's last
                    # epoch MAY be an eval epoch — eval runs on the state
                    # the chunk returns
                    k = 1
                    fns0 = self._fns_for_epoch(epoch)
                    while (k < epd and epoch + k < self.epochs
                           and not _evals_after(epoch + k - 1)
                           and not _saves_after(epoch + k - 1)
                           and self._fns_for_epoch(epoch + k) is fns0):
                        k += 1
                    if k == 1:
                        # reuse the already-compiled single-epoch program
                        mean_items, n_steps = self._run_cached_epoch(epoch)
                    else:
                        per = self._run_cached_epochs(epoch, k)
                        wall = (time.time() - t0) / k
                        # the state is only materialized at chunk end; the
                        # per-epoch step counters are reconstructed from the
                        # fixed steps/epoch so the log matches the
                        # per-epoch-dispatch loop record-for-record
                        end = int(self.state.step)
                        for i, (mi, ns) in enumerate(per):
                            pending[epoch + i] = (
                                mi, ns, wall, end - ns * (k - 1 - i))
                        (mean_items, n_steps, epoch_wall,
                         epoch_end_step) = pending.pop(epoch)
                else:
                    mean_items, n_steps = self._run_cached_epoch(epoch)
            else:
                items_sum = None  # accumulated ON DEVICE: a host read per
                n_steps = 0       # step would sync the dispatch pipeline
                for imgs, labels, masks, _, _ in self.train_loader:
                    if n_steps == 0 and epoch % 10 == 0 and self.is_main:
                        # train-batch vis (engine.py:449 write_tbimg)
                        from yololp_tpu.utils.visualize import \
                            save_train_batch_vis

                        save_train_batch_vis(
                            imgs, labels, masks,
                            osp.join(self.save_dir, "vis",
                                     f"train_batch_e{epoch}.jpg"))
                    self.state, total, items = self.step_fn(
                        self.state, self._to_global(imgs),
                        self._to_global(labels), self._to_global(masks))
                    items_sum = (items if items_sum is None
                                 else items_sum + items)
                    n_steps += 1
                mean_items = (np.asarray(items_sum) if items_sum is not None
                              else np.zeros(7)) / max(n_steps, 1)
            record = {"epoch": epoch,
                      "step": (epoch_end_step if epoch_end_step is not None
                               else int(self.state.step)),
                      "epoch_time_s": round(
                          epoch_wall if epoch_wall is not None
                          else time.time() - t0, 1),
                      **{f"train/{k}": float(v)
                         for k, v in zip(LOSS_NAMES, mean_items)}}

            do_eval = ((epoch % eval_interval == 0)
                       or (epoch >= self.epochs - eval_final_n)
                       or (epoch == self.epochs - 1))
            # process-0-only eval/ckpt/logging (reference rank-0 gating,
            # engine.py:74-76,172); other hosts keep feeding train steps
            do_eval = do_eval and self.is_main
            if not self.is_main:
                continue
            if do_eval:
                results, speed = self.eval_model()
                ap = float(results[0])
                record.update({"val/mAP": ap, "val/mAP50": float(results[1]),
                               "val/mAP75": float(results[2]),
                               "val/mAP50_95": float(results[3]),
                               "val/recall": float(results[4]), **speed})
                self.save("last_ckpt.msgpack", epoch)
                if ap > self.best_ap:
                    self.best_ap = ap
                    self.save("best_ckpt.msgpack", epoch)
                # best within the stop-aug window (engine.py:191-196)
                if epoch >= stop_aug_epoch and ap > self.best_stop_aug_ap:
                    self.best_stop_aug_ap = ap
                    self.save("best_stop_aug_ckpt.msgpack", epoch)
            elif epoch == self.epochs - 1 or getattr(
                    self.args, "save_every_epoch", False):
                # serializing the full train state every epoch costs more
                # than a fast epoch; default to eval-epochs + final only
                self.save("last_ckpt.msgpack", epoch)
            if getattr(self.args, "save_ckpt_on_last_n_epoch", 0) and \
                    epoch >= self.epochs - self.args.save_ckpt_on_last_n_epoch:
                self.save(f"{epoch}_ckpt.msgpack", epoch)
            self._log(record)
            print(f"epoch {epoch}: " + " ".join(
                f"{k.split('/')[-1]}={v:.4f}" for k, v in record.items()
                if isinstance(v, float)))

        # end-of-training strip (checkpoint.py:46 strip_optimizer): a final
        # EMA-only, optimizer-free checkpoint alongside the resumable ones
        from yololp_tpu.utils.checkpoint import strip_checkpoint

        last = osp.join(self.save_dir, "weights", "last_ckpt.msgpack")
        if self.is_main and osp.isfile(last):
            strip_checkpoint(last, osp.join(self.save_dir, "weights",
                                            "final_ckpt.msgpack"))
        return self.best_ap
