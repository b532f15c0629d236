"""Pallas greedy-NMS kernel: exactness vs the sequential oracle (interpret
mode on CPU; the compiled path is exercised on TPU by bench/infer)."""

import numpy as np

import jax.numpy as jnp

import conftest  # noqa: F401
from yololp_tpu.ops.pallas_nms import pallas_greedy_nms_mask
from test_nms import clustered_boxes, numpy_greedy_nms

rng = np.random.default_rng(7)


def test_pallas_nms_matches_oracle():
    B, K = 4, 256
    boxes = np.stack([clustered_boxes(K) for _ in range(B)])
    scores = np.sort(rng.uniform(0.01, 1, (B, K)).astype(np.float32),
                     -1)[:, ::-1].copy()
    scores[0, 200:] = 0  # invalid tail
    keep = np.asarray(pallas_greedy_nms_mask(
        jnp.asarray(boxes), jnp.asarray(scores), 0.45, interpret=True))
    for b in range(B):
        ref = numpy_greedy_nms(boxes[b], scores[b], 0.45) & (scores[b] > 0)
        np.testing.assert_array_equal(keep[b], ref)
