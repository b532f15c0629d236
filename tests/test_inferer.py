"""Inferer unit tests (random init, small images): single + batched paths."""

import numpy as np

import conftest  # noqa: F401
from yololp_tpu.core.inferer import Inferer

rng = np.random.default_rng(3)


def test_detect_and_detect_batch_contracts(tmp_path):
    img = rng.integers(0, 255, (240, 320, 3), np.uint8)
    inferer = Inferer(str(tmp_path), None, "yololpn", img_size=128, half=False,
                      conf_thres=0.009, max_det=5)
    dets = inferer.detect(img)
    assert dets.shape[1] == 28 and len(dets) <= 5
    # coords rescaled into source bounds
    if len(dets):
        assert dets[:, 0:12:2].max() <= 320 and dets[:, 1:12:2].max() <= 240
        assert dets[:, :12].min() >= 0
        s = inferer.plate_text(dets[0])
        assert len(s) >= 8  # province glyph + 7 chars

    batch = [img, rng.integers(0, 255, (480, 480, 3), np.uint8)]
    out = inferer.detect_batch(batch)
    assert len(out) == 2
    for d, src in zip(out, batch):
        assert d.shape[1] == 28 and len(d) <= 5
        if len(d):
            assert d[:, 0:12:2].max() <= src.shape[1]
            assert d[:, 1:12:2].max() <= src.shape[0]

    # encoded path: native C++ batch decode+letterbox (cv2 fallback if the
    # .so is unbuilt) must agree with the decoded path
    import cv2

    bufs = [cv2.imencode(".jpg", b)[1].tobytes() for b in batch]
    out_enc = inferer.detect_batch_encoded(bufs)
    assert len(out_enc) == 2
    for d_enc, d_dec in zip(out_enc, out):
        assert d_enc.shape == d_dec.shape
        if len(d_enc):
            np.testing.assert_allclose(d_enc[:, :12], d_dec[:, :12],
                                       rtol=0.1, atol=8.0)  # jpeg lossy


def test_infer_batched_uses_encoded_image_path(tmp_path):
    import cv2

    from yololp_tpu.data.native import native_available

    src = tmp_path / "imgs"
    src.mkdir()
    for i in range(3):
        cv2.imwrite(str(src / f"im{i}.jpg"),
                    rng.integers(0, 255, (200, 260, 3), np.uint8))
    inferer = Inferer(str(src), None, "yololpn", img_size=128, half=False,
                      conf_thres=0.009, max_det=5)
    calls = []
    orig = Inferer.detect_batch_encoded
    try:
        Inferer.detect_batch_encoded = (
            lambda self, bufs: calls.append(len(bufs)) or orig(self, bufs))
        results = inferer.infer_batched(str(tmp_path / "out"), batch_size=2)
    finally:
        Inferer.detect_batch_encoded = orig
    assert len(results) == 3
    assert all(d.shape[1] == 28 for _, d in results)
    # the still-image stream must actually go through the encoded-bytes
    # path (native C++ batch decode when built, cv2 fallback otherwise)
    assert sum(calls) == 4  # 2 + padded tail batch of 2
