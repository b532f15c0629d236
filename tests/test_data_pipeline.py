"""Data-pipeline label-math tests: letterbox bookkeeping, identity affine,
paste consistency, dataset round-trip."""

import os

import cv2
import numpy as np

import conftest  # noqa: F401
from yololp_tpu.data.augment import random_affine
from yololp_tpu.data.datasets import TrainValDataset
from yololp_tpu.data.generate import PlateGenerator, paste_plates

rng = np.random.default_rng(41)


def _write_sample(root, w=640, h=480):
    os.makedirs(f"{root}/images/val", exist_ok=True)
    os.makedirs(f"{root}/labels/val", exist_ok=True)
    img = np.full((h, w, 3), 90, np.uint8)
    # plate box centered at (0.5, 0.5), size (0.4, 0.2) normalized
    row = [3, 5, 1, 2, 3, 4, 5, 36,
           0.5, 0.5, 0.4, 0.2,
           0.3, 0.4, 0.3, 0.6, 0.7, 0.6, 0.7, 0.4]
    cv2.imwrite(f"{root}/images/val/a.jpg", img)
    with open(f"{root}/labels/val/a.txt", "w") as f:
        f.write(" ".join(str(v) for v in row))
    return row


def test_val_letterbox_label_roundtrip(tmp_path):
    """640x480 -> 320 square letterbox: normalized labels must land where
    the letterbox math puts them (ratio 0.5, pad_h (320-240)/2 = 40)."""
    root = str(tmp_path)
    row = _write_sample(root)
    ds = TrainValDataset(f"{root}/images/val", img_size=320, augment=False,
                         task="val")
    img, labels, mask, _, shapes = ds[0]
    assert img.shape == (320, 320, 3)
    lbl = labels[mask > 0][0]
    # x: full width maps to full width -> cx stays 0.5; w stays 0.4
    np.testing.assert_allclose(lbl[8], 0.5, atol=1e-3)
    np.testing.assert_allclose(lbl[10], 0.4, atol=1e-3)
    # y: content occupies rows [40, 280] of 320 -> cy = (40 + 0.5*240)/320
    np.testing.assert_allclose(lbl[9], (40 + 0.5 * 240) / 320, atol=2e-3)
    np.testing.assert_allclose(lbl[11], 0.2 * 240 / 320, atol=2e-3)
    # corners follow the same mapping
    np.testing.assert_allclose(lbl[12], 0.3, atol=1e-3)          # x1
    np.testing.assert_allclose(lbl[13], (40 + 0.4 * 240) / 320, atol=2e-3)
    (h0, w0), _ = shapes
    assert (h0, w0) == (480, 640)


def test_rect_val_loader_shapes_and_labels(tmp_path):
    """--rect compat mode: aspect-sorted batches, per-batch shapes stride-
    rounded with pad 0.5 then quantized to multiples of 64; labels follow
    the per-batch letterbox."""
    from yololp_tpu.data.datasets import RectValLoader

    root = str(tmp_path)
    os.makedirs(f"{root}/images/val", exist_ok=True)
    os.makedirs(f"{root}/labels/val", exist_ok=True)
    row = [3, 5, 1, 2, 3, 4, 5, 36, 0.5, 0.5, 0.4, 0.2,
           0.3, 0.4, 0.3, 0.6, 0.7, 0.6, 0.7, 0.4]
    sizes = [(480, 640), (360, 640), (640, 480), (512, 512)]  # (h, w)
    for i, (h, w) in enumerate(sizes):
        cv2.imwrite(f"{root}/images/val/r{i}.jpg",
                    np.full((h, w, 3), 90, np.uint8))
        with open(f"{root}/labels/val/r{i}.txt", "w") as f:
            f.write(" ".join(str(v) for v in row))
    ds = TrainValDataset(f"{root}/images/val", img_size=320, augment=False,
                         task="val")
    loader = RectValLoader(ds, batch_size=2, img_size=320)
    batches = list(loader)
    assert len(batches) == 2
    for imgs, labels, masks, paths, _ in batches:
        h, w = imgs.shape[1], imgs.shape[2]
        assert h % 64 == 0 and w % 64 == 0  # quantized shapes
        assert max(h, w) <= 320 + 64 + 32   # near img_size
        for j in range(imgs.shape[0]):
            lbl = labels[j][masks[j] > 0]
            assert len(lbl) == 1
            # boxes stay inside the normalized frame and keep cx ordering
            assert 0 <= lbl[0, 8:].min() and lbl[0, 8:].max() <= 1
    # wide images (ar < 1) get a shorter-than-wide batch shape
    ar_shapes = dict(zip([tuple(b[0].shape[1:3]) for b in batches],
                         [None] * 2))
    assert any(h < w for h, w in ar_shapes)


def test_native_val_loader_matches_standard_loader(tmp_path):
    """NativeValLoader (C++ batch decode+letterbox, cv2 fallback) must
    produce the same images and labels as the per-image python val path."""
    from yololp_tpu.data.datasets import NativeValLoader, _Loader

    root = str(tmp_path)
    os.makedirs(f"{root}/images/val", exist_ok=True)
    os.makedirs(f"{root}/labels/val", exist_ok=True)
    row = [3, 5, 1, 2, 3, 4, 5, 36, 0.5, 0.5, 0.4, 0.2,
           0.3, 0.4, 0.3, 0.6, 0.7, 0.6, 0.7, 0.4]
    # (200, 260) is SMALLER than img_size: catches scaleup mismatches (the
    # val protocol never upscales; an uncapped native ratio would differ)
    for i, (h, w) in enumerate([(480, 640), (600, 400), (320, 320),
                                (200, 260)]):
        # smooth content: isolates pipeline differences from interpolation-
        # kernel noise (AREA vs LINEAR differ wildly on white noise)
        gy = np.linspace(0, 255, h, dtype=np.float32)[:, None]
        gx = np.linspace(0, 255, w, dtype=np.float32)[None, :]
        img = np.stack([gy + 0 * gx, 0 * gy + gx, (gy + gx) / 2],
                       -1).astype(np.uint8)
        cv2.imwrite(f"{root}/images/val/n{i}.jpg", img,
                    [cv2.IMWRITE_JPEG_QUALITY, 98])
        with open(f"{root}/labels/val/n{i}.txt", "w") as f:
            f.write(" ".join(str(v) for v in row))
    ds = TrainValDataset(f"{root}/images/val", img_size=320, augment=False,
                         task="val")
    std = list(_Loader(ds, 2, shuffle=False, drop_last=False))
    nat = list(NativeValLoader(ds, 2, 320))
    assert len(std) == len(nat)
    for (si, sl, sm, sp, _), (ni, nl, nm, np_, _) in zip(std, nat):
        assert sp == np_
        np.testing.assert_array_equal(sm, nm)
        np.testing.assert_allclose(sl, nl, atol=5e-3)
        # pixel content matches up to jpeg/resize rounding
        diff = np.abs(si.astype(np.int16) - ni.astype(np.int16)).mean()
        assert diff < 4.0, diff


def test_identity_affine_preserves_labels():
    img = np.full((320, 320, 3), 120, np.uint8)
    labels = np.zeros((1, 20), np.float32)
    labels[0, :8] = [1, 2, 3, 4, 5, 6, 7, 36]
    labels[0, 8:12] = [100, 120, 220, 180]          # pixel xyxy
    labels[0, 12:20] = [100, 120, 100, 180, 220, 180, 220, 120]
    out_img, out = random_affine(img.copy(), labels.copy(), degrees=0,
                                 translate=0, scale=0, shear=0,
                                 new_shape=(320, 320))
    np.testing.assert_allclose(out[0, 8:20], labels[0, 8:20], atol=1e-6)
    assert out_img.shape == (320, 320, 3)


def test_paste_labels_inside_image_and_nonoverlapping():
    gen = PlateGenerator(seed=1)
    img = np.full((480, 640, 3), 80, np.uint8)
    base = np.zeros((1, 20), np.float32)
    base[0, 8:12] = [0, 0, 120, 90]  # occupied corner
    base[0, 12:20] = [0, 0, 0, 90, 120, 90, 120, 0]
    out_img, labels = paste_plates(img, base.copy(), gen,
                                   rng=np.random.default_rng(2),
                                   min_num=3, max_num=3)
    assert len(labels) >= 1
    for i, row in enumerate(labels):
        x1, y1, x2, y2 = row[8:12]
        assert 0 <= x1 < x2 <= 640 and 0 <= y1 < y2 <= 480
        # pasted plates must not overlap the pre-existing box
        if i > 0:
            ix = max(0, min(x2, 120) - max(x1, 0))
            iy = max(0, min(y2, 90) - max(y1, 0))
            assert ix * iy == 0, (i, row[8:12])
        # classes valid
        assert 0 <= row[0] < 31 and 0 <= row[1] < 24
        assert all(0 <= c < 37 for c in row[2:8])
