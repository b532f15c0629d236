"""Metrics toolkit tests: AP computation parity + confusion matrix behavior."""

import numpy as np
import pytest

from yololp_tpu.utils.metrics import ConfusionMatrix, ap_per_class, compute_ap
from conftest import add_reference_to_path, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

rng = np.random.default_rng(33)


@requires_reference
def test_ap_matches_reference():
    add_reference_to_path()
    import matplotlib

    matplotlib.use("Agg")
    from yolov6.utils.metrics import ap_per_class as ref_ap
    from yolov6.utils.metrics import compute_ap as ref_compute_ap

    n = 200
    tp = (rng.uniform(0, 1, (n, 10)) > 0.5).astype(np.float64)
    conf = rng.uniform(0, 1, n)
    pred_cls = rng.integers(0, 5, n).astype(float)
    target_cls = rng.integers(0, 5, 150).astype(float)

    p, r, ap, f1, uc = ap_per_class(tp, conf, pred_cls, target_cls)
    rp, rr, rap, rf1, ruc = ref_ap(tp, conf, pred_cls, target_cls)
    np.testing.assert_allclose(ap, rap, rtol=1e-8)
    np.testing.assert_allclose(p, rp, rtol=1e-8)
    np.testing.assert_allclose(f1, rf1, rtol=1e-8)
    np.testing.assert_array_equal(uc, ruc)

    rec = np.sort(rng.uniform(0, 1, 50))
    pre = rng.uniform(0, 1, 50)
    a1, _, _ = compute_ap(rec, pre)
    a2, _, _ = ref_compute_ap(rec, pre)
    np.testing.assert_allclose(a1, a2, rtol=1e-10)


def test_confusion_matrix_counts():
    cm = ConfusionMatrix(nc=3, conf=0.25, iou_thres=0.45)
    dets = np.array([[10, 10, 50, 50, 0.9, 1],     # matches gt cls 1 -> TP
                     [100, 100, 150, 150, 0.8, 2],  # no gt -> FP
                     [10, 10, 50, 50, 0.1, 0]],     # below conf -> dropped
                    np.float32)
    labels = np.array([[1, 12, 12, 52, 52],         # matched
                       [0, 300, 300, 340, 340]],    # unmatched -> FN
                      np.float32)
    cm.process_batch(dets, labels)
    assert cm.matrix[1, 1] == 1        # TP cls1
    assert cm.matrix[2, 3] == 1        # FP cls2 vs background
    assert cm.matrix[3, 0] == 1        # FN background vs cls0
