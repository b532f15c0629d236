"""TAL assigner tests: structure, background handling, and loss integration."""

import numpy as np

import jax.numpy as jnp

import conftest  # noqa: F401
from yololp_tpu.assigners.tal import tal_assign
from yololp_tpu.losses.loss import LossConfig, compute_loss
from yololp_tpu.models.effidehead import HeadTrainOutput
from yololp_tpu.ops.anchors import anchors_train

rng = np.random.default_rng(21)
IMG = 160
STRIDES = (8, 16, 32)


def n_anchors():
    return sum((IMG // s) ** 2 for s in STRIDES)


def test_tal_assigns_center_anchor():
    a = n_anchors()
    _, pts, _, _ = anchors_train((IMG, IMG), STRIDES)
    bsz, m = 1, 2
    gt_pro = np.full((bsz, m), -1, np.float32)
    gt_alp = np.full((bsz, m), -1, np.float32)
    gt_ads = np.full((bsz, m, 6), -1, np.float32)
    gt_bboxes = np.zeros((bsz, m, 4), np.float32)
    gt_corners = np.zeros((bsz, m, 8), np.float32)
    mask = np.zeros((bsz, m, 1), np.float32)
    gt_pro[0, 0], gt_alp[0, 0] = 5, 3
    gt_ads[0, 0] = [1, 2, 3, 4, 5, 36]
    gt_bboxes[0, 0] = [40, 40, 120, 90]
    mask[0, 0] = 1

    scores = np.full((bsz, a, 31), 0.5, np.float32)
    # preds: perfect box at every anchor near the gt
    pd = np.tile(gt_bboxes[0, 0], (bsz, a, 1)).astype(np.float32)

    res = tal_assign(jnp.asarray(scores), jnp.asarray(pd), pts,
                     jnp.asarray(gt_pro), jnp.asarray(gt_alp),
                     jnp.asarray(gt_ads), jnp.asarray(gt_bboxes),
                     jnp.asarray(gt_corners), jnp.asarray(mask))
    fg = np.asarray(res.fg_mask)
    assert fg.sum() > 0
    # assigned anchors carry gt classes; all others are background
    tp = np.asarray(res.target_pro)
    assert set(np.unique(tp[fg])) == {5}
    assert set(np.unique(tp[~fg])) == {31}
    tads = np.asarray(res.target_ads)
    assert (tads[fg][:, 5] == 36).all()
    assert (tads[~fg] == 37).all()
    # scores normalized: max <= 1, positive where fg
    ps = np.asarray(res.target_pro_scores)
    assert ps.max() <= 1.0 + 1e-5 and ps[fg].sum() > 0


def test_loss_with_tal_assigner_finite():
    a = n_anchors()
    sig = lambda s: rng.uniform(0.01, 0.99, s).astype(np.float32)
    out = HeadTrainOutput(None, jnp.asarray(sig((2, a, 31))),
                          jnp.asarray(sig((2, a, 24))),
                          jnp.asarray(sig((2, a, 6, 37))),
                          jnp.asarray(rng.uniform(0, 4, (2, a, 4)).astype(np.float32)),
                          jnp.asarray(rng.uniform(-2, 2, (2, a, 8)).astype(np.float32)))
    labels = np.zeros((2, 3, 20), np.float32)
    labels[..., :8] = -1
    mask = np.zeros((2, 3), np.float32)
    labels[0, 0, :8] = [1, 2, 3, 4, 5, 6, 7, 36]
    labels[0, 0, 8:12] = [0.5, 0.5, 0.25, 0.12]
    labels[0, 0, 12:20] = [0.375, 0.44, 0.375, 0.56, 0.625, 0.56, 0.625, 0.44]
    mask[0, 0] = 1
    cfg = LossConfig(img_size=(IMG, IMG), strides=STRIDES, assigner="tal")
    total, items = compute_loss(out, jnp.asarray(labels), jnp.asarray(mask), cfg)
    assert np.isfinite(float(total))
    assert np.isfinite(np.asarray(items)).all()


def test_tal_covers_atss_dead_band():
    """ATSS's mean+std IoU threshold yields ZERO foreground anchors for
    plate-aspect (~3.8:1) boxes whose height crosses the stride-16/32
    handoff (measured: 100-120px-wide plates at 320 input left a 25.7%
    detection-rate hole in the round-2 flagship, tools/diag_province.py).
    TAL must assign foreground across that whole band — this is the
    regression test for the 'atss_tal' schedule's reason to exist."""
    from yololp_tpu.assigners.atss import atss_assign

    img = 320
    anchors, pts, n_level, st = anchors_train((img, img), STRIDES)
    a = pts.shape[0]
    r = np.random.default_rng(0)
    scores = jnp.asarray(r.uniform(0, 0.3, (1, a, 31)), jnp.float32)
    half = np.asarray(st) * 2.5
    pd = jnp.asarray(
        np.concatenate([np.asarray(pts) - half, np.asarray(pts) + half],
                       -1)[None], jnp.float32)
    aspect = 272 / 72.0
    zeros = lambda *s: jnp.zeros(s, jnp.float32)
    atss_dead = []
    for wpx in (100, 105, 110, 115):
        h = wpx / aspect
        cx, cy = 163.0, 157.0
        bb = jnp.array([[[cx - wpx / 2, cy - h / 2, cx + wpx / 2,
                          cy + h / 2]]], jnp.float32)
        res_tal = tal_assign(scores, pd, pts, zeros(1, 1), zeros(1, 1),
                             zeros(1, 1, 6), bb, zeros(1, 1, 8),
                             jnp.ones((1, 1, 1)))
        assert float(np.asarray(res_tal.fg_mask).sum()) > 0, \
            f"TAL assigned no fg at width {wpx}"
        res_atss = atss_assign(anchors, tuple(n_level), zeros(1, 1),
                               zeros(1, 1), zeros(1, 1, 6), bb,
                               zeros(1, 1, 8), jnp.ones((1, 1, 1)), None)
        atss_dead.append(float(np.asarray(res_atss.fg_mask).sum()) == 0)
    # document the ATSS hole itself: if this starts failing, the band moved
    # or the ATSS port changed behavior — either way worth knowing
    assert all(atss_dead), "ATSS dead band disappeared (port changed?)"


def test_tal_approx_topk_branch_compiles():
    """approx_topk plumbing through tal_assign (ADVICE r4): exact on CPU."""
    import numpy as _np
    from yololp_tpu.assigners.tal import tal_assign
    from yololp_tpu.ops.anchors import anchors_train as _anchors_train
    _rng = _np.random.default_rng(7)
    img, bsz, n_max = 128, 2, 3
    _, points, _, _ = _anchors_train((img, img), [8, 16, 32])
    a = points.shape[0]
    cxy = _rng.uniform(20, img - 20, (bsz, n_max, 2))
    wh = _rng.uniform(20, 60, (bsz, n_max, 2))
    gt_b = _np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(_np.float32)
    gt_c = _np.concatenate([gt_b[..., [0, 1]], gt_b[..., [0, 3]],
                            gt_b[..., [2, 3]], gt_b[..., [2, 1]]], -1)
    pd_c = _rng.uniform(0, img, (bsz, a, 2))
    pd_w = _rng.uniform(10, 60, (bsz, a, 2))
    pd_b = _np.concatenate([pd_c - pd_w / 2, pd_c + pd_w / 2], -1)
    scores = _rng.uniform(0, 1, (bsz, a, 31)).astype(_np.float32)
    common = (jnp.asarray(scores), jnp.asarray(pd_b.astype(_np.float32)),
              points,
              jnp.asarray(_rng.integers(0, 31, (bsz, n_max)).astype(_np.float32)),
              jnp.asarray(_rng.integers(0, 24, (bsz, n_max)).astype(_np.float32)),
              jnp.asarray(_rng.integers(0, 37, (bsz, n_max, 6)).astype(_np.float32)),
              jnp.asarray(gt_b), jnp.asarray(gt_c.astype(_np.float32)),
              jnp.asarray(_np.ones((bsz, n_max, 1), _np.float32)))
    exact = tal_assign(*common, approx_topk=False)
    approx = tal_assign(*common, approx_topk=True)
    _np.testing.assert_array_equal(_np.asarray(exact.fg_mask),
                                   _np.asarray(approx.fg_mask))
