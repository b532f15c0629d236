"""Fixed-shape NMS tests: greedy exactness vs torchvision + LP layout behavior."""

import numpy as np
import pytest

import jax.numpy as jnp

from yololp_tpu.ops.nms import greedy_nms_mask, non_max_suppression
from conftest import reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

rng = np.random.default_rng(7)


def clustered_boxes(n, n_clusters=8, scale=640.0):
    """Overlapping clusters to force real suppression chains."""
    centers = rng.uniform(50, scale - 50, size=(n_clusters, 2))
    idx = rng.integers(0, n_clusters, size=n)
    cxy = centers[idx] + rng.normal(0, 12, size=(n, 2))
    wh = rng.uniform(20, 80, size=(n, 2))
    return np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)


def numpy_greedy_nms(boxes, scores, iou_thres):
    """Oracle: the textbook sequential greedy NMS (torchvision semantics)."""
    order = np.argsort(-scores, kind="stable")
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    keep = np.zeros(len(boxes), bool)
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep[i] = True
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        iou = inter / (areas[i] + areas - inter + 1e-9)
        suppressed |= iou > iou_thres
        suppressed[i] = True  # self; already kept
    return keep


@pytest.mark.parametrize("iou_thres", [0.45, 0.65])
def test_greedy_mask_matches_sequential_oracle(iou_thres):
    n = 256
    boxes = clustered_boxes(n)
    scores = np.sort(rng.uniform(0.01, 1.0, size=n).astype(np.float32))[::-1].copy()

    ref_mask = numpy_greedy_nms(boxes, scores, iou_thres)

    ours = np.asarray(
        greedy_nms_mask(jnp.asarray(boxes)[None], jnp.asarray(scores)[None], iou_thres)
    )[0]
    np.testing.assert_array_equal(ours, ref_mask)


def test_greedy_mask_exact_at_val_scale():
    """VERDICT r2 weak #7: the fixpoint must be exact at val conditions —
    512 candidates, crowded clusters, low conf gate — not just for shallow
    chains. The default (convergence-checked) loop is exact by
    construction; this pins it against the sequential oracle at scale."""
    n = 512
    for trial in range(4):
        boxes = clustered_boxes(n, n_clusters=5)
        scores = rng.uniform(0.0, 1.0, size=n).astype(np.float32)
        scores[rng.uniform(size=n) < 0.3] = 0.0  # conf-gated slots
        scores = np.sort(scores)[::-1].copy()
        ref = numpy_greedy_nms(boxes, scores, 0.65) & (scores > 0)
        ours = np.asarray(greedy_nms_mask(
            jnp.asarray(boxes)[None], jnp.asarray(scores)[None], 0.65))[0]
        np.testing.assert_array_equal(ours, ref, err_msg=f"trial {trial}")


def test_greedy_mask_exact_on_deep_chain():
    """A 128-deep suppression chain (box i overlaps only box i+1): greedy
    keeps every other box, and the parallel fixpoint needs ~64 iterations
    to settle — the old fixed bound of 16 would return a WRONG mask here;
    the convergence loop must be exact."""
    n = 128
    xs = np.arange(n, dtype=np.float32) * 6.0  # width 10, stride 6: IoU(i,i+1)=1/4, IoU(i,i+2)=0
    boxes = np.stack([xs, np.zeros(n, np.float32),
                      xs + 10.0, np.full(n, 10.0, np.float32)], -1)
    scores = np.linspace(1.0, 0.5, n, dtype=np.float32)
    ref = numpy_greedy_nms(boxes, scores, 0.2)
    assert ref.sum() == n // 2  # alternating keep
    ours = np.asarray(greedy_nms_mask(
        jnp.asarray(boxes)[None], jnp.asarray(scores)[None], 0.2))[0]
    np.testing.assert_array_equal(ours, ref)
    # the legacy fixed bound is genuinely insufficient on this input
    legacy = np.asarray(greedy_nms_mask(
        jnp.asarray(boxes)[None], jnp.asarray(scores)[None], 0.2, iters=16))[0]
    assert not np.array_equal(legacy, ref)


def make_pred(boxes_xywh, task_confs, a_total=400):
    """Build a (1, A, 290) tensor with given boxes and per-task max confs."""
    n = boxes_xywh.shape[0]
    pred = np.zeros((1, a_total, 290), np.float32)
    pred[0, :, 4] = 1.0  # obj
    pred[0, :n, :4] = boxes_xywh
    # put each task's max conf at a fixed class id
    starts = [13, 44] + [68 + i * 37 for i in range(6)]
    for t, s in enumerate(starts):
        pred[0, :n, s + 2] = task_confs[:, t]
    return jnp.asarray(pred)


def test_nms_lp_pipeline_basic():
    boxes = np.array([[100, 100, 50, 40], [102, 101, 50, 40], [300, 300, 60, 50]],
                     np.float32)
    confs = np.tile(np.array([[0.9], [0.8], [0.95]], np.float32), (1, 8))
    det, valid, num = non_max_suppression(make_pred(boxes, confs),
                                          conf_thres=0.25, iou_thres=0.45)
    assert int(num[0]) == 2
    d = np.asarray(det[0][np.asarray(valid[0])])
    # sorted by mean conf: box 3 (0.95) first, then box 1 (0.9); box 2 suppressed
    np.testing.assert_allclose(d[0, :4], [270, 275, 330, 325], atol=1e-3)
    np.testing.assert_allclose(d[1, :4], [75, 80, 125, 120], atol=1e-3)
    # predicted class ids = 2 for every task (that's where we put the conf)
    np.testing.assert_array_equal(d[:, 20:28], 2)
    np.testing.assert_allclose(d[0, 12:20], 0.95, atol=1e-5)


def test_nms_conf_threshold_filters():
    boxes = np.array([[100, 100, 50, 40]], np.float32)
    confs = np.full((1, 8), 0.1, np.float32)
    _, _, num = non_max_suppression(make_pred(boxes, confs),
                                    conf_thres=0.25, iou_thres=0.45)
    assert int(num[0]) == 0


def test_nms_ad4_compat_flag():
    """With the compat flag, ad4 is double-counted and ad5 dropped in the gate."""
    boxes = np.array([[100, 100, 50, 40]], np.float32)
    confs = np.zeros((1, 8), np.float32)
    confs[0, :7] = 0.30  # mean-of-8 = 0.2625 > 0.25, buggy mean = 0.30 > 0.25
    confs[0, 7] = 0.0
    _, _, n_fixed = non_max_suppression(make_pred(boxes, confs),
                                        conf_thres=0.28, iou_thres=0.45)
    _, _, n_compat = non_max_suppression(make_pred(boxes, confs), conf_thres=0.28,
                                         iou_thres=0.45, compat_ad4_bug=True)
    assert int(n_fixed[0]) == 0 and int(n_compat[0]) == 1


def test_stable_compact_order_matches_argsort():
    """The cumsum+scatter compaction is exactly argsort(~keep, stable)."""
    from yololp_tpu.ops.nms import stable_compact_order

    rng = np.random.default_rng(0)
    for kk, md in ((17, 5), (64, 64), (512, 300)):
        keep = jnp.asarray(rng.random((4, kk)) < 0.3)
        want = jnp.argsort(~keep, axis=-1, stable=True)[..., :md]
        got = stable_compact_order(keep, md)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # degenerate rows: all kept / none kept
    keep = jnp.asarray([[True] * 8, [False] * 8])
    np.testing.assert_array_equal(
        np.asarray(stable_compact_order(keep, 8)),
        np.asarray(jnp.argsort(~keep, axis=-1, stable=True)))


def test_nms_approx_selector_agrees_on_clear_scene():
    """approx_max_k candidate selection returns the same detections when
    candidates are well separated (the deployment operating point)."""
    boxes = np.array([[100, 100, 50, 40], [300, 200, 60, 50],
                      [101, 101, 50, 40]], np.float32)
    confs = np.tile(np.array([[0.9], [0.8], [0.7]], np.float32), (1, 8))
    pred = make_pred(boxes, confs)
    det_a, val_a, n_a = non_max_suppression(pred, conf_thres=0.25,
                                            iou_thres=0.45,
                                            candidate_selector="approx",
                                            pre_nms_topk=128)
    det_t, val_t, n_t = non_max_suppression(pred, conf_thres=0.25,
                                            iou_thres=0.45, pre_nms_topk=128)
    np.testing.assert_array_equal(np.asarray(n_a), np.asarray(n_t))
    np.testing.assert_allclose(np.asarray(det_a), np.asarray(det_t))
