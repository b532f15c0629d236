"""Task-Aligned (TAL) label assignment — fixed-shape jnp, fully LP-adapted.

Behavioral reference: yolov6/assigners/tal_assigner.py. In the reference the
LP adaptation is INCOMPLETE and the assigner is dead code (only 5 of 6
character slots, background indices never applied, only the province scores
get the align-metric normalization; disabled at loss.py:46). This is the
completed TPU-native version, exposed as an alternative to ATSS
(LossConfig.assigner='tal'):

  * align metric = score(gt_pro_class)^alpha * IoU(gt, pred)^beta
    (alpha=1, beta=6, topk=13), candidates restricted to anchors inside the
    gt box; conflicts resolved by highest IoU (same helper as ATSS).
  * all 8 task one-hot scores are normalized by the per-gt align metric
    (the reference's TODO), background labels applied like ATSS.

Returns the same ATSSResult structure for drop-in use by the loss.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from yololp_tpu.assigners.atss import (ATSSResult, _in_gts, _resolve_conflicts,
                                       _topk_indices)
from yololp_tpu.ops.geometry import pairwise_iou


def _topk_mask(metrics, topk: int, mask_gt, approx: bool = False):
    """(B, M, A) metrics -> one-hot candidate mask of per-gt top-k anchors
    (tal_assigner.select_topk_candidates semantics incl. the >1 dedup)."""
    a = metrics.shape[-1]
    k = min(topk, a)
    idxs = _topk_indices(metrics, k, approx)
    masked = jnp.where(mask_gt.astype(bool), idxs, 0)
    onehot = jax.nn.one_hot(masked, a, dtype=metrics.dtype).sum(-2)
    return jnp.where(onehot > 1, 0.0, onehot)


@functools.partial(jax.jit, static_argnames=("topk", "npro", "nalp", "nads",
                                             "alpha", "beta", "approx_topk"))
def tal_assign(
    pd_pro_scores: jnp.ndarray,   # (B, A, npro) sigmoided
    pd_bboxes: jnp.ndarray,       # (B, A, 4) xyxy pixels (detached)
    anc_points: jnp.ndarray,      # (A, 2) pixels
    gt_pro: jnp.ndarray,          # (B, M)
    gt_alp: jnp.ndarray,          # (B, M)
    gt_ads: jnp.ndarray,          # (B, M, 6)
    gt_bboxes: jnp.ndarray,       # (B, M, 4) xyxy pixels
    gt_corners: jnp.ndarray,      # (B, M, 8)
    mask_gt: jnp.ndarray,         # (B, M, 1)
    topk: int = 13,
    npro: int = 31,
    nalp: int = 24,
    nads: int = 37,
    alpha: float = 1.0,
    beta: float = 6.0,
    eps: float = 1e-9,
    approx_topk: bool = False,
) -> ATSSResult:
    bsz, n_max = gt_bboxes.shape[:2]

    # align metric (tal_assigner.get_box_metrics)
    gt_idx = jnp.clip(gt_pro.astype(jnp.int32), 0, npro - 1)   # (B, M)
    # score of each anchor for each gt's province class: (B, M, A)
    bbox_scores = jnp.take_along_axis(
        jnp.swapaxes(pd_pro_scores, 1, 2), gt_idx[..., None], axis=1)
    overlaps = pairwise_iou(gt_bboxes, pd_bboxes)               # (B, M, A)
    align_metric = jnp.power(bbox_scores, alpha) * jnp.power(overlaps, beta)

    in_gts = _in_gts(anc_points, gt_bboxes)
    mask_topk = _topk_mask(align_metric * in_gts, topk, mask_gt,
                           approx=approx_topk)
    mask_pos = mask_topk * in_gts * mask_gt

    target_gt_idx, fg, mask_pos = _resolve_conflicts(mask_pos, overlaps)
    fg_pos = fg > 0

    def gather(x):
        return jax.vmap(lambda xi, ii: jnp.take(xi, ii, axis=0))(
            x, target_gt_idx)

    bg = lambda t, bg_idx: jnp.where(fg_pos, t, bg_idx).astype(jnp.int32)
    target_pro = bg(gather(gt_pro.astype(jnp.int32)), npro)
    target_alp = bg(gather(gt_alp.astype(jnp.int32)), nalp)
    target_ads = jnp.where(fg_pos[..., None],
                           gather(gt_ads.astype(jnp.int32)), nads)
    target_bboxes = gather(gt_bboxes)
    target_corners = gather(gt_corners)

    pro_scores = jax.nn.one_hot(target_pro, npro + 1)[..., :npro]
    alp_scores = jax.nn.one_hot(target_alp, nalp + 1)[..., :nalp]
    ads_scores = jax.nn.one_hot(target_ads, nads + 1)[..., :nads]

    # align-metric normalization (the reference applies it to pro only and
    # leaves a TODO; we apply it to all 8 task scores)
    am = align_metric * mask_pos
    pos_align = am.max(-1, keepdims=True)                       # (B, M, 1)
    pos_overlap = (overlaps * mask_pos).max(-1, keepdims=True)
    norm = (am * pos_overlap / (pos_align + eps)).max(-2)[..., None]  # (B, A, 1)
    pro_scores = pro_scores * norm
    alp_scores = alp_scores * norm
    ads_scores = ads_scores * norm[..., None, :]

    return ATSSResult(target_pro, target_alp, target_ads, target_bboxes,
                      target_corners, pro_scores, alp_scores, ads_scores,
                      fg_pos)
