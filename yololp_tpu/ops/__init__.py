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
from yololp_tpu.ops.anchors import (
    anchor_points_eval,
    anchor_points_from_shapes,
    anchors_train,
    feat_sizes,
)
from yololp_tpu.ops.nms import greedy_nms_mask, non_max_suppression

__all__ = [
    "bbox2dist", "cor2dist", "dist2bbox", "dist2cor", "iou_loss",
    "pairwise_iou", "pairwise_iou_mmdet", "xywh2xyxy", "xyxy2xywh",
    "anchor_points_eval", "anchor_points_from_shapes", "anchors_train",
    "feat_sizes", "greedy_nms_mask", "non_max_suppression",
]
