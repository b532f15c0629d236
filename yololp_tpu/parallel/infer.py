"""Data-parallel sharded inference/eval over a device Mesh.

Round-2 gap: training had the mesh path end-to-end, but the inference
bench, Evaler, and export were single-device — while the north-star target
is a v5e-8 AGGREGATE number. This module shards the whole e2e program
(uint8 -> normalize -> fused forward -> 290-col decode -> fixed-shape NMS)
over a 1-D 'data' mesh.

Everything in the program is per-image along the leading batch axis (the
NMS in ops/nms.py vmaps over the batch), so XLA's SPMD partitioner splits
it with ZERO cross-device collectives — aggregate throughput scales
linearly, bounded only by host->device staging. Reference analogue: the
DDP per-rank eval loop (yolov6/core/evaler.py predict under DistributedDataParallel).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from yololp_tpu.ops.nms import non_max_suppression


def make_sharded_infer_fn(model, variables, mesh: Mesh,
                          conf_thres: float = 0.03, iou_thres: float = 0.65,
                          max_det: int = 300, pre_nms_topk: int = 512,
                          dtype=None, candidate_selector: str = "topk"):
    """Build run(images_u8) sharding the batch over mesh axis 'data'.

    `variables` are replicated across the mesh once, here. The returned
    callable accepts a host numpy batch or a device array; the global batch
    size must be divisible by the mesh size (Evaler.predict pads tail
    batches to a fixed batch, so this holds for every batch it feeds).
    Returns (run, put): `put` pre-stages a batch with the input sharding
    (optional — run() also accepts plain numpy).
    """
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    variables = jax.device_put(variables, repl)
    dtype = dtype or model.dtype

    @partial(jax.jit,
             in_shardings=(data_sh,),
             out_shardings=(data_sh, data_sh, data_sh))
    def run(images_u8):
        x = images_u8.astype(dtype) / jnp.asarray(255.0, dtype)
        pred = model.apply(variables, x, train=False)
        return non_max_suppression(pred.astype(jnp.float32),
                                   conf_thres=conf_thres,
                                   iou_thres=iou_thres, max_det=max_det,
                                   pre_nms_topk=pre_nms_topk,
                                   candidate_selector=candidate_selector)

    def put(batch_u8):
        return jax.device_put(batch_u8, data_sh)

    return run, put


def infer_mesh(n_devices: Optional[int] = None) -> Optional[Mesh]:
    """1-D data mesh over the visible devices; None when single-device (the
    plain jit path has no resharding overhead to pay)."""
    import numpy as np

    devices = jax.devices()
    if n_devices:
        devices = devices[:n_devices]
    if len(devices) <= 1:
        return None
    return Mesh(np.asarray(devices), ("data",))
