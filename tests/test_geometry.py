"""Unit + golden-parity tests for the geometry codec library.

Golden tests import the reference's torch implementation (read-only at
/root/reference) and check numerical agreement with our jnp re-implementation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from yololp_tpu.ops import (
    anchor_points_eval,
    anchors_train,
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
from conftest import add_reference_to_path, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

rng = np.random.default_rng(0)


def random_boxes(n, scale=100.0):
    xy = rng.uniform(5, scale, size=(n, 2)).astype(np.float32)
    wh = rng.uniform(1, scale / 2, size=(n, 2)).astype(np.float32)
    return np.concatenate([xy - wh / 2, xy + wh / 2], -1)


def test_xywh_xyxy_roundtrip():
    b = random_boxes(64)
    out = np.asarray(xywh2xyxy(xyxy2xywh(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, rtol=1e-5, atol=1e-4)


def test_dist2bbox_roundtrip():
    pts = rng.uniform(10, 90, size=(32, 2)).astype(np.float32)
    dist = rng.uniform(0, 10, size=(32, 4)).astype(np.float32)
    box = dist2bbox(jnp.asarray(dist), jnp.asarray(pts), box_format="xyxy")
    back = bbox2dist(jnp.asarray(pts), box, reg_max=16)
    np.testing.assert_allclose(np.asarray(back), np.clip(dist, 0, 15.99), rtol=1e-5, atol=1e-4)


def test_dist2cor_roundtrip():
    pts = rng.uniform(20, 80, size=(32, 2)).astype(np.float32)
    dist = rng.uniform(0, 10, size=(32, 8)).astype(np.float32)
    cor = dist2cor(jnp.asarray(dist), jnp.asarray(pts))
    back = cor2dist(jnp.asarray(pts), cor, reg_max=16)
    np.testing.assert_allclose(np.asarray(back), np.clip(dist, 0, 15.99), rtol=1e-5, atol=1e-4)


@requires_reference
def test_dist2cor_matches_reference():
    add_reference_to_path()
    import torch
    from yolov6.utils.general import dist2cor as ref_dist2cor
    from yolov6.utils.general import dist2bbox as ref_dist2bbox

    pts = rng.uniform(0, 80, size=(100, 2)).astype(np.float32)
    dist8 = rng.uniform(-5, 10, size=(100, 8)).astype(np.float32)
    dist4 = rng.uniform(-5, 10, size=(100, 4)).astype(np.float32)

    ref_c = ref_dist2cor(torch.from_numpy(dist8), torch.from_numpy(pts)).numpy()
    ours_c = np.asarray(dist2cor(jnp.asarray(dist8), jnp.asarray(pts)))
    np.testing.assert_allclose(ours_c, ref_c, rtol=1e-6, atol=1e-5)

    for fmt in ("xyxy", "xywh"):
        ref_b = ref_dist2bbox(torch.from_numpy(dist4), torch.from_numpy(pts), box_format=fmt).numpy()
        ours_b = np.asarray(dist2bbox(jnp.asarray(dist4), jnp.asarray(pts), box_format=fmt))
        np.testing.assert_allclose(ours_b, ref_b, rtol=1e-6, atol=1e-5)


@requires_reference
@pytest.mark.parametrize("iou_type", ["iou", "giou", "diou", "ciou", "siou"])
def test_iou_loss_matches_reference(iou_type):
    add_reference_to_path()
    import torch
    from yolov6.utils.figure_iou import IOUloss

    b1 = random_boxes(128)
    b2 = random_boxes(128)
    ref = IOUloss(box_format="xyxy", iou_type=iou_type, eps=1e-10)(
        torch.from_numpy(b1), torch.from_numpy(b2)
    ).numpy()
    ours = np.asarray(iou_loss(jnp.asarray(b1), jnp.asarray(b2), iou_type=iou_type))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@requires_reference
def test_pairwise_iou_matches_reference():
    add_reference_to_path()
    import torch
    from yolov6.assigners.assigner_utils import iou_calculator
    from yolov6.assigners.iou2d_calculator import iou2d_calculator

    g = random_boxes(8).reshape(2, 4, 4)
    p = random_boxes(20).reshape(2, 10, 4)
    ref = iou_calculator(torch.from_numpy(g), torch.from_numpy(p)).numpy()
    ours = np.asarray(pairwise_iou(jnp.asarray(g), jnp.asarray(p)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    g2 = random_boxes(6)
    p2 = random_boxes(40)
    ref2 = iou2d_calculator(torch.from_numpy(g2), torch.from_numpy(p2)).numpy()
    ours2 = np.asarray(pairwise_iou_mmdet(jnp.asarray(g2), jnp.asarray(p2)))
    np.testing.assert_allclose(ours2, ref2, rtol=1e-5, atol=1e-5)


@requires_reference
def test_anchors_match_reference():
    add_reference_to_path()
    import torch
    from yolov6.assigners.anchor_generator import generate_anchors

    strides = [8, 16, 32]
    feats = [torch.zeros(1, 8, 640 // s, 640 // s) for s in strides]

    ref_pts, ref_strides = generate_anchors(
        feats, torch.tensor(strides), 5.0, 0.5, device="cpu", is_eval=True, mode="af"
    )
    pts, st = anchor_points_eval((640, 640), strides)
    np.testing.assert_allclose(np.asarray(pts), ref_pts.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(st), ref_strides.numpy(), atol=1e-6)

    ref_anchors, ref_points, ref_nlist, ref_stride_t = generate_anchors(
        feats, strides, 5.0, 0.5, device="cpu", is_eval=False, mode="af"
    )
    anc, apts, nlist, st_t = anchors_train((640, 640), strides)
    assert nlist == ref_nlist
    np.testing.assert_allclose(np.asarray(anc), ref_anchors.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(apts), ref_points.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(st_t), ref_stride_t.numpy(), atol=1e-6)
