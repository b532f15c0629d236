"""Authored CJK stroke-glyph library (data/glyphs.py).

The glyphs replace both the reference's missing CJK font (its generator
crashes on `platech.ttf`) and the round-1 pseudo-glyph fallback; the
recognition head's province classes train on these, so they must cover the
vocabulary, be individually substantial, and be pairwise distinct.
"""

import numpy as np
import pytest

from yololp_tpu.data import glyphs
from yololp_tpu.data.vocab import ADS_NAMES, ALP_NAMES, PRO_NAMES

CJK_VOCAB = sorted(set(PRO_NAMES) | {c for c in ADS_NAMES if ord(c) > 127})


def test_covers_full_vocabulary():
    missing = [c for c in CJK_VOCAB if c not in glyphs.GLYPH_CHARS]
    assert not missing, missing


@pytest.mark.parametrize("ch", CJK_VOCAB)
def test_glyph_renders_with_substance(ch):
    g = glyphs.render_glyph(ch, 45, 70)
    assert g.shape == (70, 45) and g.dtype == np.uint8
    ink = (g > 96).mean()
    assert 0.08 < ink < 0.75, f"{ch}: ink ratio {ink:.3f}"
    # ink must span most of the cell (no degenerate corner squiggle)
    ys, xs = np.nonzero(g > 96)
    assert ys.max() - ys.min() > 40 and xs.max() - xs.min() > 25


def test_glyphs_pairwise_distinct():
    rendered = {c: (glyphs.render_glyph(c, 32, 48) > 96) for c in CJK_VOCAB}
    chars = list(rendered)
    worst = (1.0, None)
    for i, a in enumerate(chars):
        for b in chars[i + 1:]:
            ga, gb = rendered[a], rendered[b]
            inter = (ga & gb).sum()
            union = (ga | gb).sum()
            iou = inter / max(union, 1)
            if iou < worst[0]:
                worst = (iou, (a, b))
            assert iou < 0.82, f"{a} vs {b}: ink IoU {iou:.3f}"


def test_latin_and_mixed_text_render():
    for ch in ALP_NAMES + [c for c in ADS_NAMES if ord(c) < 128]:
        g = glyphs.render_latin(ch, 23, 70)
        assert (g > 96).mean() > 0.05, ch
    txt = glyphs.render_text("皖A12345 警 0.87", size=24)
    assert txt.shape[0] == 24 and txt.shape[1] > 150
    assert (txt > 96).mean() > 0.05


def test_latin_font_is_not_the_reference_asset():
    import hashlib
    import os

    path = glyphs.find_latin_font()
    assert path and os.path.isfile(path)
    md5 = hashlib.md5(open(path, "rb").read()).hexdigest()
    assert md5 != "2c13a37c4c3035b1f27cb1f316119b4d"  # reference platechar.ttf
