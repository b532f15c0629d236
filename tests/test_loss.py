"""Golden-parity test: full LP training loss vs the reference ComputeLoss.

The reference class hard-codes .cuda() in its ctor (loss.py:52-54); the test
monkeypatches nn.Module.cuda to a no-op so the math runs on CPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from yololp_tpu.losses.loss import LossConfig, compute_loss, varifocal_loss, wing_loss
from yololp_tpu.models.effidehead import HeadTrainOutput
from conftest import add_reference_to_path, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

rng = np.random.default_rng(11)

IMG = 320
STRIDES = (8, 16, 32)


def n_anchors(img=IMG):
    return sum((img // s) ** 2 for s in STRIDES)


def random_head_outputs(bsz, use_dfl=False, reg_max=0):
    a = n_anchors()
    sig = lambda shape: rng.uniform(0.001, 0.999, shape).astype(np.float32)
    pro = sig((bsz, a, 31))
    alp = sig((bsz, a, 24))
    ads = sig((bsz, a, 6, 37))
    nreg = 4 * (reg_max + 1)
    reg = rng.uniform(-2, 6, (bsz, a, nreg)).astype(np.float32)
    cor = rng.uniform(-4, 4, (bsz, a, 8)).astype(np.float32)
    return pro, alp, ads, reg, cor


def random_targets(bsz, counts):
    """Flat (N, 21) reference targets + our padded (B, M, 20) + mask."""
    rows = []
    m = max(counts)
    padded = np.zeros((bsz, m, 20), np.float32)
    padded[..., :8] = -1
    mask = np.zeros((bsz, m), np.float32)
    for b, n in enumerate(counts):
        for i in range(n):
            pro = rng.integers(0, 31)
            alp = rng.integers(0, 24)
            ads = rng.integers(0, 37, 6)
            cxy = rng.uniform(0.2, 0.8, 2)
            wh = rng.uniform(0.05, 0.3, 2)
            box = np.array([cxy[0], cxy[1], wh[0], wh[1]])
            x1, y1 = cxy - wh / 2
            x2, y2 = cxy + wh / 2
            corners = np.array([x1, y1, x1, y2, x2, y2, x2, y1])
            row = np.concatenate([[b, pro, alp], ads, box, corners])
            rows.append(row)
            padded[b, i, 0] = pro
            padded[b, i, 1] = alp
            padded[b, i, 2:8] = ads
            padded[b, i, 8:12] = box
            padded[b, i, 12:20] = corners
            mask[b, i] = 1
    flat = np.stack(rows).astype(np.float32)
    return flat, padded, mask


@requires_reference
@pytest.mark.parametrize("use_dfl,reg_max,iou_type",
                         [(False, 0, "giou"), (False, 0, "siou"),
                          (True, 16, "giou")])
def test_full_loss_matches_reference(use_dfl, reg_max, iou_type, monkeypatch):
    add_reference_to_path()
    import torch
    import torch.nn as nn

    monkeypatch.setattr(nn.Module, "cuda", lambda self, *a, **k: self)
    from yolov6.models.losses.loss import ComputeLoss

    bsz = 2
    pro, alp, ads, reg, cor = random_head_outputs(bsz, use_dfl, reg_max)
    flat, padded, mask = random_targets(bsz, [3, 1])

    feats = [torch.zeros(bsz, 8, IMG // s, IMG // s) for s in STRIDES]
    t = torch.from_numpy
    outputs_ref = (feats, t(pro), t(alp),
                   *[t(np.ascontiguousarray(ads[:, :, i])) for i in range(6)],
                   t(reg), t(cor))
    ref_loss_fn = ComputeLoss(
        fpn_strides=list(STRIDES), ori_img_size=IMG, warmup_epoch=0,
        use_dfl=use_dfl, reg_max=reg_max, iou_type=iou_type)
    with torch.no_grad():
        ref_total, ref_items = ref_loss_fn(outputs_ref, t(flat),
                                           epoch_num=1, step_num=1)

    cfg = LossConfig(img_size=(IMG, IMG), strides=STRIDES, use_dfl=use_dfl,
                     reg_max=reg_max, iou_type=iou_type)
    out = HeadTrainOutput(None, jnp.asarray(pro), jnp.asarray(alp),
                          jnp.asarray(ads), jnp.asarray(reg), jnp.asarray(cor))
    total, items = compute_loss(out, jnp.asarray(padded), jnp.asarray(mask), cfg)

    np.testing.assert_allclose(float(total), float(ref_total), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(items), ref_items.numpy(),
                               rtol=2e-4, atol=2e-4)


@requires_reference
def test_varifocal_and_wing_match_reference():
    add_reference_to_path()
    import torch
    from yolov6.models.losses.loss import VarifocalLoss, WingLoss

    pred = rng.uniform(0.001, 0.999, (2, 50, 31)).astype(np.float32)
    gt = (rng.uniform(0, 1, (2, 50, 31)) * rng.integers(0, 2, (2, 50, 31))).astype(np.float32)
    label = rng.integers(0, 2, (2, 50, 31)).astype(np.float32)
    t = torch.from_numpy
    ref = VarifocalLoss()(t(pred), t(gt), t(label)).item()
    ours = float(varifocal_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(label)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)

    x = rng.uniform(-20, 20, (40, 8)).astype(np.float32)
    tt = rng.uniform(-20, 20, (40, 8)).astype(np.float32)
    tt[0, :3] = -1
    ref_w = WingLoss()(t(x), t(tt)).numpy()
    ours_w = np.asarray(wing_loss(jnp.asarray(x), jnp.asarray(tt)))
    np.testing.assert_allclose(ours_w, ref_w, rtol=1e-5, atol=1e-5)


def test_loss_zero_gt_finite():
    bsz = 2
    pro, alp, ads, reg, cor = random_head_outputs(bsz)
    padded = np.zeros((bsz, 3, 20), np.float32)
    padded[..., :8] = -1
    mask = np.zeros((bsz, 3), np.float32)
    cfg = LossConfig(img_size=(IMG, IMG), strides=STRIDES)
    out = HeadTrainOutput(None, jnp.asarray(pro), jnp.asarray(alp),
                          jnp.asarray(ads), jnp.asarray(reg), jnp.asarray(cor))
    total, items = compute_loss(out, jnp.asarray(padded), jnp.asarray(mask), cfg)
    assert np.isfinite(float(total))
    assert np.isfinite(np.asarray(items)).all()
