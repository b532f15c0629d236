"""Box / corner coordinate codecs and IoU family — pure jnp, fully jit-able.

Behavioral reference (formulas only, re-implemented TPU-first):
  * dist2bbox / bbox2dist / dist2cor / cor2dist: yolov6/utils/general.py:29-83
  * IoU loss family (GIoU/DIoU/CIoU/SIoU):       yolov6/utils/figure_iou.py:7-107
  * pairwise IoU (assigner):                     yolov6/assigners/iou2d_calculator.py,
                                                 yolov6/assigners/assigner_utils.py:734-754

All functions are shape-polymorphic over leading batch dims and never perform
data-dependent control flow, so they trace once under jit and fuse on the VPU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xywh2xyxy(b):
    """(cx, cy, w, h) -> (x1, y1, x2, y2) over the last axis."""
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], -1)


def xyxy2xywh(b):
    """(x1, y1, x2, y2) -> (cx, cy, w, h) over the last axis."""
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], -1)


def dist2bbox(distance, anchor_points, box_format: str = "xyxy"):
    """Decode (l, t, r, b) distances around anchor points into boxes.

    Matches yolov6/utils/general.py:29 (dist2bbox).
    """
    lt, rb = jnp.split(distance, 2, axis=-1)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if box_format == "xyxy":
        return jnp.concatenate([x1y1, x2y2], -1)
    if box_format == "xywh":
        return jnp.concatenate([(x1y1 + x2y2) * 0.5, x2y2 - x1y1], -1)
    raise ValueError(f"unknown box_format {box_format!r}")


def bbox2dist(anchor_points, bbox, reg_max):
    """Encode xyxy boxes as clipped (l, t, r, b) distances (general.py:43)."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    dist = jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], -1)
    return jnp.clip(dist, 0, reg_max - 0.01)


def dist2cor(distance, anchor_points):
    """Decode 8 signed corner offsets into the 4 plate-corner quad.

    The LP corner parameterization (general.py:51): with anchor (ax, ay) and
    offsets (lt, lb, rb, rt) each of 2 values:
      TL = a - lt; BL = (ax - lb.x, ay + lb.y); BR = a + rb; TR = (ax + rt.x, ay - rt.y)
    """
    lt, lb, rb, rt = jnp.split(distance, 4, axis=-1)
    ax, ay = jnp.split(anchor_points, 2, axis=-1)
    x2, y2 = jnp.split(lb, 2, axis=-1)
    x4, y4 = jnp.split(rt, 2, axis=-1)
    x1y1 = anchor_points - lt
    x2y2 = jnp.concatenate([ax - x2, ay + y2], -1)
    x3y3 = anchor_points + rb
    x4y4 = jnp.concatenate([ax + x4, ay - y4], -1)
    return jnp.concatenate([x1y1, x2y2, x3y3, x4y4], -1)


def cor2dist(anchor_points, corner, reg_max):
    """Inverse of dist2cor, clipped to [0, reg_max) (general.py:68)."""
    c1, c2, c3, c4 = jnp.split(corner, 4, axis=-1)
    ax, ay = jnp.split(anchor_points, 2, axis=-1)
    x2, y2 = jnp.split(c2, 2, axis=-1)
    x4, y4 = jnp.split(c4, 2, axis=-1)
    lt = anchor_points - c1
    lb = jnp.concatenate([ax - x2, y2 - ay], -1)
    rb = c3 - anchor_points
    rt = jnp.concatenate([x4 - ax, ay - y4], -1)
    dist = jnp.concatenate([lt, lb, rb, rt], -1)
    return jnp.clip(dist, 0, reg_max - 0.01)


def pairwise_iou(box1, box2, eps: float = 1e-9):
    """IoU between every box in box1 (..., M, 4) and box2 (..., N, 4), xyxy.

    Returns (..., M, N). Matches assigner_utils.iou_calculator semantics
    (areas clipped at 0, eps added to union).
    """
    b1 = box1[..., :, None, :]
    b2 = box2[..., None, :, :]
    x1y1 = jnp.maximum(b1[..., 0:2], b2[..., 0:2])
    x2y2 = jnp.minimum(b1[..., 2:4], b2[..., 2:4])
    overlap = jnp.prod(jnp.clip(x2y2 - x1y1, 0, None), -1)
    area1 = jnp.prod(jnp.clip(b1[..., 2:4] - b1[..., 0:2], 0, None), -1)
    area2 = jnp.prod(jnp.clip(b2[..., 2:4] - b2[..., 0:2], 0, None), -1)
    return overlap / (area1 + area2 - overlap + eps)


def pairwise_iou_mmdet(box1, box2, eps: float = 1e-6):
    """IoU with mmdet's bbox_overlaps numerics (iou2d_calculator.py).

    Differences from pairwise_iou: plain (non-clipped) areas, eps applied via
    jnp.maximum on the union rather than added.
    """
    area1 = (box1[..., 2] - box1[..., 0]) * (box1[..., 3] - box1[..., 1])
    area2 = (box2[..., 2] - box2[..., 0]) * (box2[..., 3] - box2[..., 1])
    lt = jnp.maximum(box1[..., :, None, :2], box2[..., None, :, :2])
    rb = jnp.minimum(box1[..., :, None, 2:], box2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    overlap = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - overlap
    return overlap / jnp.maximum(union, eps)


def iou_loss(box1, box2, iou_type: str = "giou", box_format: str = "xyxy",
             eps: float = 1e-10):
    """Elementwise IoU loss between aligned boxes (last dim 4). Returns 1 - IoU*.

    Matches yolov6/utils/figure_iou.py IOUloss.__call__ for the aligned
    (equal-shape) path used by BboxLoss. Supported: iou, giou, diou, ciou, siou.
    """
    if box_format == "xywh":
        box1 = xywh2xyxy(box1)
        box2 = xywh2xyxy(box2)
    b1_x1, b1_y1, b1_x2, b1_y2 = jnp.split(box1, 4, axis=-1)
    b2_x1, b2_y1, b2_x2, b2_y2 = jnp.split(box2, 4, axis=-1)

    inter = (jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None)
             * jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None))
    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
    iou_type = iou_type.lower()
    if iou_type == "giou":
        c_area = cw * ch + eps
        iou = iou - (c_area - union) / c_area
    elif iou_type in ("diou", "ciou"):
        c2 = cw**2 + ch**2 + eps
        rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2
                + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4.0
        if iou_type == "diou":
            iou = iou - rho2 / c2
        else:
            v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
            alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
            iou = iou - (rho2 / c2 + v * alpha)
    elif iou_type == "siou":
        s_cw = (b2_x1 + b2_x2 - b1_x1 - b1_x2) * 0.5 + eps
        s_ch = (b2_y1 + b2_y2 - b1_y1 - b1_y2) * 0.5 + eps
        sigma = jnp.sqrt(s_cw**2 + s_ch**2)
        sin_alpha_1 = jnp.abs(s_cw) / sigma
        sin_alpha_2 = jnp.abs(s_ch) / sigma
        threshold = 2**0.5 / 2
        sin_alpha = jnp.where(sin_alpha_1 > threshold, sin_alpha_2, sin_alpha_1)
        angle_cost = jnp.cos(jnp.arcsin(sin_alpha) * 2 - math.pi / 2)
        rho_x = (s_cw / cw) ** 2
        rho_y = (s_ch / ch) ** 2
        gamma = angle_cost - 2
        distance_cost = 2 - jnp.exp(gamma * rho_x) - jnp.exp(gamma * rho_y)
        omiga_w = jnp.abs(w1 - w2) / jnp.maximum(w1, w2)
        omiga_h = jnp.abs(h1 - h2) / jnp.maximum(h1, h2)
        shape_cost = ((1 - jnp.exp(-omiga_w)) ** 4 + (1 - jnp.exp(-omiga_h)) ** 4)
        iou = iou - 0.5 * (distance_cost + shape_cost)
    elif iou_type != "iou":
        raise ValueError(f"unknown iou_type {iou_type!r}")
    return 1.0 - iou
