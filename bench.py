#!/usr/bin/env python3
"""Benchmark: yololps end-to-end inference throughput on the attached TPU.

Measures the full on-device pipeline per image at 640x640: uint8 batch ->
normalize -> fused (reparameterized) forward in bf16 -> 290-col decode ->
fixed-shape NMS. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}
Baseline (BASELINE.md north star): 5000 img/s aggregate on v5e-8, i.e.
625 img/s/chip; vs_baseline is measured per-chip throughput / 625.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from yololp_tpu.layers.fuse import fuse_variables_jit as fuse_variables
    from yololp_tpu.models import Model, build_model
    from yololp_tpu.ops.nms import non_max_suppression
    from yololp_tpu.utils.config import Config

    batch = 128
    img = 640
    cfg = Config.named("yololps")
    _, train_vars = build_model(cfg, img_size=(64, 64), dtype=jnp.bfloat16)
    variables = fuse_variables(train_vars)
    model = Model(config=cfg, deploy=True, dtype=jnp.bfloat16)

    @jax.jit
    def run(images_u8):
        x = images_u8.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        pred = model.apply(variables, x, train=False)
        det, valid, num = non_max_suppression(
            pred, conf_thres=0.4, iou_thres=0.45, max_det=300, pre_nms_topk=256)
        return det, num

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (batch, img, img, 3), np.uint8))

    # warmup / compile
    jax.block_until_ready(run(images))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    ips = batch * iters / dt
    per_chip_target = 5000.0 / 8.0
    print(json.dumps({
        "metric": "yololps 640x640 e2e inference (fwd+decode+NMS, bf16, b128) per chip",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips / per_chip_target, 3),
    }))


if __name__ == "__main__":
    main()
