"""Golden-parity test: fixed-shape jnp ATSS vs the reference torch assigner."""

import numpy as np
import pytest

import jax.numpy as jnp

from yololp_tpu.assigners.atss import atss_assign
from yololp_tpu.ops.anchors import anchors_train
from conftest import add_reference_to_path, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

rng = np.random.default_rng(123)


def make_scene(bsz=2, n_max=4, img=320):
    """Random padded gt scene in pixel coords."""
    gt_pro = rng.integers(0, 31, (bsz, n_max)).astype(np.float32)
    gt_alp = rng.integers(0, 24, (bsz, n_max)).astype(np.float32)
    gt_ads = rng.integers(0, 37, (bsz, n_max, 6)).astype(np.float32)
    cxy = rng.uniform(60, img - 60, (bsz, n_max, 2))
    wh = rng.uniform(40, 120, (bsz, n_max, 2))
    gt_bboxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
    gt_corners = np.concatenate(
        [gt_bboxes[..., [0, 1]], gt_bboxes[..., [0, 3]],
         gt_bboxes[..., [2, 3]], gt_bboxes[..., [2, 1]]], -1).astype(np.float32)
    # mask out the last gt of image 0 and last two of image 1
    mask = np.ones((bsz, n_max, 1), np.float32)
    mask[0, -1] = 0
    mask[1, -2:] = 0
    gt_bboxes *= mask
    gt_corners *= mask
    gt_pro = np.where(mask[..., 0] > 0, gt_pro, -1)
    gt_alp = np.where(mask[..., 0] > 0, gt_alp, -1)
    gt_ads = np.where(mask[..., None, 0].repeat(6, -1).reshape(bsz, n_max, 6) > 0,
                      gt_ads, -1)
    return gt_pro, gt_alp, gt_ads, gt_bboxes, gt_corners, mask


@requires_reference
@pytest.mark.parametrize("with_pd", [True, False])
def test_atss_matches_reference(with_pd):
    add_reference_to_path()
    import torch
    from yolov6.assigners.atss_assigner import ATSSAssigner

    img = 320
    strides = [8, 16, 32]
    anchors, points, n_list, stride_t = anchors_train((img, img), strides)
    gt_pro, gt_alp, gt_ads, gt_bboxes, gt_corners, mask = make_scene(img=img)
    bsz, n_max = gt_pro.shape
    a_total = anchors.shape[0]
    pd = None
    pd_t = None
    if with_pd:
        cxy = rng.uniform(0, img, (bsz, a_total, 2))
        wh = rng.uniform(10, 100, (bsz, a_total, 2))
        pd = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
        pd_t = torch.from_numpy(pd)

    ref = ATSSAssigner(9, npro=31, nalp=24, nads=37)
    with torch.no_grad():
        (r_pro, r_alp, r_ads, r_boxes, r_cors, r_pro_s, r_alp_s, r_ads_s,
         r_fg) = ref(
            torch.from_numpy(np.asarray(anchors)), n_list,
            torch.from_numpy(gt_pro), torch.from_numpy(gt_alp),
            torch.from_numpy(gt_ads), torch.from_numpy(gt_bboxes),
            torch.from_numpy(gt_corners), torch.from_numpy(mask), pd_t)

    ours = atss_assign(
        anchors, tuple(n_list), jnp.asarray(gt_pro), jnp.asarray(gt_alp),
        jnp.asarray(gt_ads), jnp.asarray(gt_bboxes), jnp.asarray(gt_corners),
        jnp.asarray(mask), jnp.asarray(pd) if with_pd else None)

    np.testing.assert_array_equal(np.asarray(ours.fg_mask), r_fg.numpy())
    np.testing.assert_array_equal(np.asarray(ours.target_pro), r_pro.numpy())
    np.testing.assert_array_equal(np.asarray(ours.target_alp), r_alp.numpy())
    for i in range(6):
        np.testing.assert_array_equal(np.asarray(ours.target_ads[..., i]),
                                      r_ads[i].numpy())
    # box/corner targets only matter where fg
    fg = r_fg.numpy().astype(bool)[..., None]
    np.testing.assert_allclose(np.asarray(ours.target_bboxes) * fg,
                               r_boxes.numpy() * fg, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours.target_corners) * fg,
                               r_cors.numpy() * fg, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours.target_pro_scores),
                               r_pro_s.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.target_alp_scores),
                               r_alp_s.numpy(), rtol=1e-5, atol=1e-5)
    for i in range(6):
        np.testing.assert_allclose(np.asarray(ours.target_ads_scores[..., i, :]),
                                   r_ads_s[i].numpy(), rtol=1e-5, atol=1e-5)


def test_atss_all_padded_gts_is_all_background():
    img = 128
    strides = [8, 16, 32]
    anchors, _, n_list, _ = anchors_train((img, img), strides)
    bsz, n_max = 2, 3
    z = np.zeros
    res = atss_assign(
        anchors, tuple(n_list),
        jnp.asarray(-np.ones((bsz, n_max), np.float32)),
        jnp.asarray(-np.ones((bsz, n_max), np.float32)),
        jnp.asarray(-np.ones((bsz, n_max, 6), np.float32)),
        jnp.asarray(z((bsz, n_max, 4), np.float32)),
        jnp.asarray(z((bsz, n_max, 8), np.float32)),
        jnp.asarray(z((bsz, n_max, 1), np.float32)), None)
    assert not bool(np.asarray(res.fg_mask).any())
    assert (np.asarray(res.target_pro) == 31).all()
    assert (np.asarray(res.target_ads) == 37).all()
    assert np.asarray(res.target_pro_scores).sum() == 0


def test_atss_approx_topk_branch_compiles_and_matches_on_cpu():
    """The --approx-topk lever (ADVICE r4): keep the approx_max_k branch
    compiling and semantically sane. On CPU approx_max_k is exact, so the
    assignment must equal the full-sort path bit-for-bit."""
    img = 128
    strides = [8, 16, 32]
    anchors, _, n_list, _ = anchors_train((img, img), strides)
    gt_pro, gt_alp, gt_ads, gt_bboxes, gt_corners, mask = make_scene(img=img)
    args = (anchors, tuple(n_list), jnp.asarray(gt_pro), jnp.asarray(gt_alp),
            jnp.asarray(gt_ads), jnp.asarray(gt_bboxes * 128 / 320),
            jnp.asarray(gt_corners * 128 / 320), jnp.asarray(mask), None)
    exact = atss_assign(*args, approx_topk=False)
    approx = atss_assign(*args, approx_topk=True)
    np.testing.assert_array_equal(np.asarray(exact.fg_mask),
                                  np.asarray(approx.fg_mask))
    np.testing.assert_array_equal(np.asarray(exact.target_pro),
                                  np.asarray(approx.target_pro))
    np.testing.assert_allclose(np.asarray(exact.target_bboxes),
                               np.asarray(approx.target_bboxes))
