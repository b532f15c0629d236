from yololp_tpu.ops.geometry import (
    bbox2dist,
    cor2dist,
    dist2bbox,
    dist2cor,
    iou_loss,
    pairwise_iou,
    pairwise_iou_mmdet,
    xywh2xyxy,
    xyxy2xywh,
)
from yololp_tpu.ops.anchors import anchor_points_eval, anchors_train, feat_sizes

__all__ = [
    "bbox2dist", "cor2dist", "dist2bbox", "dist2cor", "iou_loss",
    "pairwise_iou", "pairwise_iou_mmdet", "xywh2xyxy", "xyxy2xywh",
    "anchor_points_eval", "anchors_train", "feat_sizes",
]
