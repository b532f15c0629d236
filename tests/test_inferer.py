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
