"""Fixed-shape, on-device NMS over the 290-column LP prediction tensor.

Behavioral reference: yolov6/utils/nms.py (non_max_suppression). The
reference runs a per-image python loop + torchvision.ops.nms on host; here the
whole pipeline is a fixed-shape jnp program (top-k candidate selection, IoU
matrix, greedy suppression to fixpoint) that jits and batches on the TPU with
no host round-trip.

Column layout in (effidehead.py:287-301):
  [0:4] bbox xywh (pixels), [4] obj (==1), [5:13] corners,
  [13:44] province(31), [44:68] alphabet(24), [68:290] 6 x characters(37).

Output layout (28 cols, matches nms.py:93-96):
  [0:4] xyxy, [4:12] corners, [12:20] per-task confidences
  (pro, alp, ad0..ad5), [20:28] per-task argmax class indices (as float).

The reference's confidence mask has an upstream bug (ad4 counted twice, ad5
dropped — nms.py:90-91); we compute the true mean-of-8 by default and expose
`compat_ad4_bug=True` for bit-parity experiments.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from yololp_tpu.ops.geometry import pairwise_iou, xywh2xyxy

NPRO, NALP, NADS = 31, 24, 37


def _split_scores(cls):
    """(…, 276) -> list of 8 per-task score tensors."""
    out = [cls[..., :NPRO], cls[..., NPRO:NPRO + NALP]]
    base = NPRO + NALP
    for i in range(6):
        out.append(cls[..., base + i * NADS: base + (i + 1) * NADS])
    return out


def greedy_nms_mask(boxes, scores, iou_thres: float, iters: int = 0):
    """Greedy NMS keep-mask for score-sorted boxes (B, K, 4) via fixpoint.

    keep_i = valid_i and no kept j<i with IoU(j, i) > thres. That recurrence
    has a unique solution (induction on i), so ANY fixpoint of the parallel
    update map is the exact greedy answer. Default (iters=0) iterates to
    convergence with a while_loop — exact for arbitrarily deep suppression
    chains, and cheaper than a fixed bound when chains are shallow (the
    common case at detection thresholds). iters>0 keeps the legacy fixed
    bound for experiments.
    """
    k = boxes.shape[-2]
    iou = pairwise_iou(boxes, boxes)
    higher = (jnp.arange(k)[:, None] < jnp.arange(k)[None, :])  # j < i (row j suppresses col i)
    sup_matrix = (iou > iou_thres) & higher
    valid = scores > 0.0

    def step(keep):
        suppressed = jnp.any(sup_matrix & keep[..., :, None], axis=-2)
        return valid & ~suppressed

    if iters:
        return jax.lax.fori_loop(0, iters, lambda _, kp: step(kp), valid)

    def cond(state):
        i, _, changed = state
        return changed & (i < k)

    def body(state):
        i, keep, _ = state
        new = step(keep)
        return i + 1, new, jnp.any(new != keep)

    _, keep, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), valid, jnp.bool_(True)))
    return keep


def stable_compact_order(keep: jnp.ndarray, max_det: int) -> jnp.ndarray:
    """Order that moves kept slots to the front, preserving relative order.

    Equivalent to `argsort(~keep, stable=True)[..., :max_det]` but built from
    two cumsums + one scatter instead of a full sort: dest(kept_i) =
    (#kept before i), dest(dropped_i) = n_kept + (#dropped before i) — a
    permutation by construction, inverted with one `.at[].set`. TPU sorts
    are expensive relative to scans; this is the compaction half of the
    NMS cost named by ops/pallas_nms.py's profiling note.
    """
    k = keep.shape[-1]
    ck = jnp.cumsum(keep, axis=-1)
    n_kept = ck[..., -1:]
    dest = jnp.where(keep, ck - 1, n_kept + jnp.cumsum(~keep, axis=-1) - 1)
    src = jnp.broadcast_to(jnp.arange(k), keep.shape)
    order = jnp.zeros(keep.shape, jnp.int32)
    order = jax.vmap(lambda o, d, s: o.at[d].set(s))(order, dest, src)
    return order[..., :max_det]


@functools.partial(
    jax.jit,
    static_argnames=("conf_thres", "iou_thres", "max_det", "pre_nms_topk",
                     "compat_ad4_bug", "nms_iters", "candidate_selector"),
)
def non_max_suppression(
    prediction: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    pre_nms_topk: int = 512,
    compat_ad4_bug: bool = False,
    nms_iters: int = 0,
    candidate_selector: str = "topk",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched fixed-shape NMS.

    Args:
      prediction: (B, A, 290) decoded head output.
      candidate_selector: "topk" (exact lax.top_k) or "approx"
        (lax.approx_max_k, the TPU-native PartialReduce candidate select —
        faster; may miss a sub-threshold tail candidate, recall>=0.95).
    Returns:
      detections: (B, max_det, 28) padded with zeros.
      valid: (B, max_det) bool keep mask.
      num_valid: (B,) int32 count.
    """
    b, a, _ = prediction.shape
    box = xywh2xyxy(prediction[..., :4])
    corners = prediction[..., 5:13]
    obj = prediction[..., 4:5]
    cls = prediction[..., 13:] * obj  # conf = obj_conf * cls_conf (nms.py:76)

    task_scores = _split_scores(cls)
    confs = jnp.stack([jnp.max(t, axis=-1) for t in task_scores], -1)   # (B, A, 8)
    preds = jnp.stack([jnp.argmax(t, axis=-1) for t in task_scores], -1)

    if compat_ad4_bug:
        # nms.py:90-91 sums ad4 twice and omits ad5
        mask_conf = (confs[..., :7].sum(-1) + confs[..., 6]) / 8.0
    else:
        mask_conf = confs.mean(-1)
    score = confs.mean(-1)  # NMS ranking score (nms.py:118-120)

    gate = mask_conf >= conf_thres
    gated_score = jnp.where(gate, score, 0.0)

    k = min(pre_nms_topk, a)
    if candidate_selector == "approx" and k < a:
        top_score, top_idx = jax.lax.approx_max_k(gated_score, k)
    else:
        top_score, top_idx = jax.lax.top_k(gated_score, k)  # sorted descending
    take = lambda t: jnp.take_along_axis(
        t, top_idx[..., None] if t.ndim == 3 else top_idx, axis=1)
    box_k = take(box)
    cor_k = take(corners)
    confs_k = take(confs)
    preds_k = take(preds)

    keep = greedy_nms_mask(box_k, top_score, iou_thres, iters=nms_iters)

    # stable-compact kept detections to the front, capped at max_det
    order = stable_compact_order(keep, max_det)
    gather = lambda t: jnp.take_along_axis(
        t, order[..., None] if t.ndim == 3 else order, axis=1)
    det = jnp.concatenate(
        [gather(box_k), gather(cor_k), gather(confs_k),
         gather(preds_k).astype(jnp.float32)], -1)
    valid = jnp.take_along_axis(keep, order, axis=1)
    det = jnp.where(valid[..., None], det, 0.0)
    return det, valid, valid.sum(-1).astype(jnp.int32)
