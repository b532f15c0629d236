#!/usr/bin/env python3
"""Render the authored CJK glyph contact sheet (data/glyphs.py) for visual QA.

Usage: python tools/vis_glyphs.py [--out glyphs.png] [--cell 96]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def main(argv=None):
    p = argparse.ArgumentParser("glyph sheet")
    p.add_argument("--out", default="glyphs.png")
    p.add_argument("--cell", type=int, default=96)
    args = p.parse_args(argv)

    import cv2

    from yololp_tpu.data.glyphs import glyph_sheet
    from yololp_tpu.data.vocab import PRO_NAMES

    sheet = 255 - glyph_sheet(PRO_NAMES + ["警", "学"], cell=args.cell)
    cv2.imwrite(args.out, sheet)
    print(f"wrote {args.out} ({sheet.shape[1]}x{sheet.shape[0]})")


if __name__ == "__main__":
    main()
