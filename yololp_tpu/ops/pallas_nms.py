"""Pallas TPU kernel: exact greedy NMS suppression.

Computes the EXACT sequential greedy result in one pallas_call: per batch
item, the IoU matrix is built once in VMEM and a K-step lax.fori_loop walks
rows, clearing suppressed candidates with single-row VPU ops.

Measured on v5e (B=128, K=256): 6.3ms vs 2.0ms for the XLA 16-iteration
fixpoint (ops/nms.greedy_nms_mask) — the sequential K-step loop serializes
where XLA's batched fixpoint iterations parallelize, so the XLA path stays
the default and this kernel is the guaranteed-exact alternative (the
fixpoint is exact up to suppression chains deeper than its iteration
count). Profiling showed the real NMS cost is candidate top_k + compaction,
not the greedy mask.

Inputs are score-sorted boxes (the caller top-k's first). Returns the keep
mask as float32 (1.0 = kept).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, keep_ref, sup_ref, *, iou_thres: float,
                k: int):
    boxes = boxes_ref[0]                       # (K, 4) f32
    x1 = boxes[:, 0:1]
    y1 = boxes[:, 1:2]
    x2 = boxes[:, 2:3]
    y2 = boxes[:, 3:4]
    area = (x2 - x1) * (y2 - y1)               # (K, 1)

    # pairwise IoU (K, K): row i supresses col j
    ix1 = jnp.maximum(x1, x1.T)
    iy1 = jnp.maximum(y1, y1.T)
    ix2 = jnp.minimum(x2, x2.T)
    iy2 = jnp.minimum(y2, y2.T)
    inter = (jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0))
    iou = inter / (area + area.T - inter + 1e-9)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    # suppression only flows forward (j > i), in f32 for cheap VPU blending
    sup = jnp.where((iou > iou_thres) & (col_ids > row_ids), 1.0, 0.0)

    sup_ref[:, :] = sup  # stage in VMEM scratch so rows can be dyn-indexed
    keep_ref[0, 0, :] = valid_ref[0, 0, :]
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, _):
        # dynamic LANE indexing isn't lowerable on TPU; read keep[i] as a
        # masked reduction instead (one VPU op)
        onehot = (lane_ids == i).astype(jnp.float32)            # (1, K)
        alive = jnp.sum(keep_ref[0, 0, :] * onehot[0])          # scalar
        row = sup_ref[pl.ds(i, 1), :][0]                        # (K,) sublane dyn ok
        keep_ref[0, 0, :] = keep_ref[0, 0, :] * (1.0 - row * alive)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnames=("iou_thres", "interpret"))
def pallas_greedy_nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
                           iou_thres: float = 0.45,
                           interpret: bool = False) -> jnp.ndarray:
    """boxes (B, K, 4) score-sorted, scores (B, K); returns bool keep (B, K)."""
    b, k, _ = boxes.shape
    # masks carried as (B, 1, K): the (1, 1, K) block's trailing dims equal
    # the array's, satisfying the mosaic (8, 128)-divisibility rule
    valid = (scores > 0.0).astype(jnp.float32)[:, None, :]
    kernel = functools.partial(_nms_kernel, iou_thres=iou_thres, k=k)
    keep = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, k), jnp.float32)],
        interpret=interpret,
    )(boxes.astype(jnp.float32), valid)
    return keep[:, 0, :] > 0.5
