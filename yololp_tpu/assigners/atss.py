"""ATSS label assignment as a fixed-shape, jit-able jnp program.

Behavioral reference: yolov6/assigners/atss_assigner.py (LP-extended ATSS:
carries province/alphabet/6-character labels + corner targets through the
assignment) and assigner_utils.py. The reference is torch with dynamic
shapes, an OOM->CPU fallback, and an empty-gt early-out; here ground truths
are padded to a static n_max_boxes and masked, so the whole assignment jits
into the training step with no host sync. The empty-gt case needs no special
path: masked candidate indices collapse to slot 0 and the >1 dedup zeroes
them out, yielding an all-background assignment.

Args mirror the reference forward (atss_assigner.py:59) with gt_pro/gt_alp
as (B, M) and gt_ads as (B, M, 6); returns the same 9 quantities with ads
batched: target_ads (B, A, 6) and target_ads_scores (B, A, 6, nads).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from yololp_tpu.ops.geometry import pairwise_iou, pairwise_iou_mmdet


class ATSSResult(NamedTuple):
    target_pro: jnp.ndarray          # (B, A) int32, bg = npro
    target_alp: jnp.ndarray          # (B, A) int32, bg = nalp
    target_ads: jnp.ndarray          # (B, A, 6) int32, bg = nads
    target_bboxes: jnp.ndarray       # (B, A, 4) xyxy
    target_corners: jnp.ndarray      # (B, A, 8)
    target_pro_scores: jnp.ndarray   # (B, A, npro)
    target_alp_scores: jnp.ndarray   # (B, A, nalp)
    target_ads_scores: jnp.ndarray   # (B, A, 6, nads)
    fg_mask: jnp.ndarray             # (B, A) bool


def _center_distances(gt_bboxes, anchors):
    """(B, M, A) euclidean distance gt-center <-> anchor-cell-center
    (assigner_utils.dist_calculator)."""
    gt_c = (gt_bboxes[..., 0:2] + gt_bboxes[..., 2:4]) / 2.0          # (B, M, 2)
    ac_c = (anchors[:, 0:2] + anchors[:, 2:4]) / 2.0                  # (A, 2)
    d = gt_c[:, :, None, :] - ac_c[None, None, :, :]
    return jnp.sqrt(jnp.sum(d * d, -1)), ac_c


def _in_gts(ac_points, gt_bboxes, eps: float = 1e-9):
    """(B, M, A) anchor-center strictly inside gt box
    (assigner_utils.select_candidates_in_gts)."""
    lt = ac_points[None, None, :, :] - gt_bboxes[:, :, None, 0:2]
    rb = gt_bboxes[:, :, None, 2:4] - ac_points[None, None, :, :]
    deltas = jnp.concatenate([lt, rb], -1)
    return (jnp.min(deltas, -1) > eps).astype(gt_bboxes.dtype)


def _topk_indices(x, k: int, approx: bool):
    """top-k indices along the last axis; `approx=True` uses
    jax.lax.approx_max_k (TPU PartialReduce, recall_target 0.95) instead of
    the full sort — the one op class the VPU can't accelerate. Opt-in only:
    it trades element-exact reference parity for ~10 ms of the 113 ms
    b32@640 train step (docs/perf/r5/README.md attribution)."""
    if approx and k < x.shape[-1]:
        # recall_target pinned explicitly: the documented contract must not
        # drift if a future JAX changes approx_max_k's default.
        _, idxs = jax.lax.approx_max_k(x, k, recall_target=0.95)
    else:
        _, idxs = jax.lax.top_k(x, k)
    return idxs


def _select_topk_candidates(distances, n_level_list: Sequence[int], mask_gt,
                            topk: int, approx: bool = False):
    """Per-level top-k nearest anchors (atss_assigner.py:557-584).

    Returns (is_in_candidate (B, M, A), candidate_idxs (B, M, L*k_l) with
    global anchor indices).
    """
    is_in, cand = [], []
    start = 0
    mask = mask_gt.astype(bool)  # (B, M, 1)
    for n in n_level_list:
        k = min(topk, n)
        level = jax.lax.dynamic_slice_in_dim(distances, start, n, axis=-1)
        idxs = _topk_indices(-level, k, approx)                  # (B, M, k)
        cand.append(idxs + start)
        masked = jnp.where(mask, idxs, 0)
        onehot = jax.nn.one_hot(masked, n, dtype=distances.dtype).sum(-2)
        onehot = jnp.where(onehot > 1, 0.0, onehot)
        is_in.append(onehot)
        start += n
    return jnp.concatenate(is_in, -1), jnp.concatenate(cand, -1)


def _threshold(is_in_candidate, candidate_idxs, overlaps):
    """mean+std(ddof=1) of candidate IoUs per gt (atss_assigner.py:586-605)."""
    masked_overlaps = jnp.where(is_in_candidate > 0, overlaps, 0.0)  # (B, M, A)
    cand = jnp.take_along_axis(masked_overlaps, candidate_idxs, axis=-1)  # (B, M, K)
    mean = cand.mean(-1, keepdims=True)
    std = cand.std(-1, keepdims=True, ddof=1)
    return mean + std, masked_overlaps


def _resolve_conflicts(mask_pos, overlaps):
    """Keep only the highest-IoU gt for multi-assigned anchors
    (assigner_utils.select_highest_overlaps)."""
    fg = mask_pos.sum(-2)                                  # (B, A)
    multi = (fg[:, None, :] > 1)                           # (B, 1->M, A)
    is_max = jax.nn.one_hot(overlaps.argmax(-2), overlaps.shape[-2],
                            dtype=overlaps.dtype)          # (B, A, M)
    is_max = jnp.swapaxes(is_max, -1, -2)                  # (B, M, A)
    mask_pos = jnp.where(multi, is_max, mask_pos)
    fg = mask_pos.sum(-2)
    target_gt_idx = mask_pos.argmax(-2)                    # (B, A)
    return target_gt_idx, fg, mask_pos


@functools.partial(jax.jit, static_argnames=("n_level_list", "topk", "npro",
                                             "nalp", "nads", "approx_topk"))
def atss_assign(
    anchors: jnp.ndarray,            # (A, 4) grid-cell boxes, image pixels
    n_level_list: tuple,             # static per-level anchor counts
    gt_pro: jnp.ndarray,             # (B, M)
    gt_alp: jnp.ndarray,             # (B, M)
    gt_ads: jnp.ndarray,             # (B, M, 6)
    gt_bboxes: jnp.ndarray,          # (B, M, 4) xyxy pixels
    gt_corners: jnp.ndarray,         # (B, M, 8) pixels
    mask_gt: jnp.ndarray,            # (B, M, 1) 1.0 for real gts
    pd_bboxes: jnp.ndarray | None,   # (B, A, 4) xyxy pixels (detached preds)
    topk: int = 9,
    npro: int = 31,
    nalp: int = 24,
    nads: int = 37,
    approx_topk: bool = False,
) -> ATSSResult:
    bsz, n_max = gt_bboxes.shape[:2]
    n_anchors = anchors.shape[0]

    overlaps = pairwise_iou_mmdet(
        gt_bboxes.reshape(-1, 4), anchors).reshape(bsz, n_max, n_anchors)
    distances, ac_points = _center_distances(gt_bboxes, anchors)

    is_in_candidate, candidate_idxs = _select_topk_candidates(
        distances, n_level_list, mask_gt, topk, approx=approx_topk)
    thr, iou_candidates = _threshold(is_in_candidate, candidate_idxs, overlaps)

    is_pos = jnp.where(iou_candidates > thr, is_in_candidate, 0.0)
    mask_pos = is_pos * _in_gts(ac_points, gt_bboxes) * mask_gt

    target_gt_idx, fg, mask_pos = _resolve_conflicts(mask_pos, overlaps)
    fg_pos = fg > 0

    # ---- gather targets (atss_assigner.py:607-665) ----
    def gather(x):  # (B, M, ...) gathered along M by target_gt_idx (B, A)
        idx = target_gt_idx
        return jax.vmap(lambda xi, ii: jnp.take(xi, ii, axis=0))(x, idx)

    bg = lambda t, bg_idx: jnp.where(fg_pos, t, bg_idx).astype(jnp.int32)
    target_pro = bg(gather(gt_pro.astype(jnp.int32)), npro)
    target_alp = bg(gather(gt_alp.astype(jnp.int32)), nalp)
    target_ads = jnp.where(fg_pos[..., None],
                           gather(gt_ads.astype(jnp.int32)), nads)
    target_bboxes = gather(gt_bboxes)
    target_corners = gather(gt_corners)

    pro_scores = jax.nn.one_hot(target_pro, npro + 1)[..., :npro]
    alp_scores = jax.nn.one_hot(target_alp, nalp + 1)[..., :nalp]
    ads_scores = jax.nn.one_hot(target_ads, nads + 1)[..., :nads]  # (B, A, 6, nads)

    if pd_bboxes is not None:
        ious = pairwise_iou(gt_bboxes, pd_bboxes) * mask_pos       # (B, M, A)
        ious = ious.max(-2)[..., None]                             # (B, A, 1)
        pro_scores = pro_scores * ious
        alp_scores = alp_scores * ious
        ads_scores = ads_scores * ious[..., None, :]

    return ATSSResult(target_pro, target_alp, target_ads, target_bboxes,
                      target_corners, pro_scores, alp_scores, ads_scores,
                      fg_pos)
