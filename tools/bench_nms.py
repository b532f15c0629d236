#!/usr/bin/env python3
"""NMS-stage variant bench: candidate select x compaction x fixpoint.

Times non_max_suppression end-to-end on realistic decoded predictions at
serving shape (default B=128, A=8400 @640) for each combination of:
  - candidate_selector: exact lax.top_k vs lax.approx_max_k
  - nms_iters: 0 (exact while_loop fixpoint) vs 16 (legacy fixed bound)
plus the isolated candidate-select step (gate+score+select only, via a
dead-NMS program), so the top_k share named by ops/pallas_nms.py's
profiling note is measured directly.

Fills the role of the reference's trtexec NMS-plugin timing experiments
(deploy/TensorRT); reports JSON.
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def main(argv=None):
    p = argparse.ArgumentParser("NMS variant bench")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--anchors", type=int, default=8400)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--conf-thres", type=float, default=0.4)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--pre-nms-topk", type=int, default=512)
    p.add_argument("--device", default=None, choices=["cpu", "tpu"])
    args = p.parse_args(argv)

    if args.device == "cpu":
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax
    import jax.numpy as jnp

    from yololp_tpu.ops.nms import non_max_suppression

    B, A = args.batch_size, args.anchors
    rng = np.random.default_rng(0)
    # realistic decoded tensor: most anchors below threshold, clustered boxes
    pred = np.zeros((B, A, 290), np.float32)
    pred[..., 0] = rng.uniform(40, 600, (B, A))
    pred[..., 1] = rng.uniform(40, 600, (B, A))
    pred[..., 2] = rng.uniform(20, 120, (B, A))
    pred[..., 3] = rng.uniform(10, 60, (B, A))
    pred[..., 4] = 1.0
    # ~1.5% of anchors carry confident per-task scores
    hot = rng.random((B, A)) < 0.015
    starts = [13, 44] + [68 + i * 37 for i in range(6)]
    for s in starts:
        cls = rng.integers(0, 8, (B, A))
        pred[np.arange(B)[:, None], np.arange(A)[None, :], s + cls] = \
            np.where(hot, rng.uniform(0.5, 1.0, (B, A)), 0.02)
    x = jax.device_put(jnp.asarray(pred))

    from jax import lax

    from yololp_tpu.utils.profiler import timed_scan

    def bench(fn):
        """Trusted protocol (r4e): K carry-perturbed iterations inside one
        scan, value-fetch completion, rolled operands — the back-to-back
        async loop this replaces is replay/ack-unsafe on the tunnel."""
        def prog(p0, c0):
            def body(c, _):
                out = fn(p0 + c * jnp.float32(1e-6))
                s = sum(jnp.sum(t.astype(jnp.float32)) * 1e-9
                        for t in jax.tree.leaves(out))
                return c + 1, s
            return lax.scan(body, c0, None, length=args.iters)[1]
        return timed_scan(prog, args.iters, x, jnp.float32(0)) * 1e3

    res = {"batch": B, "anchors": A}
    for sel in ("topk", "approx"):
        for iters_k in (0, 16):
            f = jax.jit(lambda p_, s=sel, k=iters_k: non_max_suppression(
                p_, conf_thres=args.conf_thres, iou_thres=args.iou_thres,
                max_det=300, pre_nms_topk=args.pre_nms_topk,
                nms_iters=k, candidate_selector=s))
            res[f"{sel}_iters{iters_k}_ms"] = round(bench(f), 3)

    # isolated candidate select: return only (scores, idx) so DCE removes
    # the suppression + compaction stages. Score layout comes from the real
    # NMS module so the probe can never drift from the measured program.
    from yololp_tpu.ops.nms import _split_scores

    k = min(args.pre_nms_topk, A)
    for sel in ("topk", "approx"):
        def cand(p_, s=sel):
            cls = p_[..., 13:] * p_[..., 4:5]
            score = jnp.stack(
                [t.max(-1) for t in _split_scores(cls)], -1).mean(-1)
            gated = jnp.where(score >= args.conf_thres, score, 0.0)
            if s == "approx" and k < A:
                return jax.lax.approx_max_k(gated, k)
            return jax.lax.top_k(gated, k)
        res[f"candidate_only_{sel}_ms"] = round(bench(jax.jit(cand)), 3)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
