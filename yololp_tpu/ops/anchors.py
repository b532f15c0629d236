"""Anchor-point generation for the anchor-free LP head — static shapes.

Behavioral reference: yolov6/assigners/anchor_generator.py (generate_anchors).
Because every shape in this framework is static under jit, anchors are computed
from (height, width) feature-map sizes rather than live tensors, and are
constant-folded by XLA.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp


def feat_sizes(img_size: Tuple[int, int], strides: Sequence[int]):
    """Per-level (h, w) grids for an (H, W) input."""
    h, w = img_size
    return [(h // s, w // s) for s in strides]


def anchor_points_from_shapes(shapes, strides, grid_cell_offset: float = 0.5):
    """Like anchor_points_eval but from explicit per-level (h, w) shapes."""
    points, strides_out = [], []
    for (h, w), stride in zip(shapes, strides):
        sx = np.arange(w, dtype=np.float32) + grid_cell_offset
        sy = np.arange(h, dtype=np.float32) + grid_cell_offset
        gy, gx = np.meshgrid(sy, sx, indexing="ij")
        points.append(np.stack([gx, gy], -1).reshape(-1, 2))
        strides_out.append(np.full((h * w, 1), stride, dtype=np.float32))
    return jnp.asarray(np.concatenate(points)), jnp.asarray(np.concatenate(strides_out))


def anchor_points_eval(img_size, strides, grid_cell_offset: float = 0.5):
    """Eval-mode anchors: grid-cell centers in *grid units* + per-anchor stride.

    Returns (anchor_points (A, 2), stride_tensor (A, 1)) as jnp arrays.
    Matches anchor_generator.generate_anchors(is_eval=True, mode='af').
    """
    points, strides_out = [], []
    for (h, w), stride in zip(feat_sizes(img_size, strides), strides):
        sx = np.arange(w, dtype=np.float32) + grid_cell_offset
        sy = np.arange(h, dtype=np.float32) + grid_cell_offset
        gy, gx = np.meshgrid(sy, sx, indexing="ij")
        points.append(np.stack([gx, gy], -1).reshape(-1, 2))
        strides_out.append(np.full((h * w, 1), stride, dtype=np.float32))
    return jnp.asarray(np.concatenate(points)), jnp.asarray(np.concatenate(strides_out))


def anchors_train(img_size, strides, grid_cell_size: float = 5.0,
                  grid_cell_offset: float = 0.5):
    """Train-mode anchors in *image pixel units*.

    Returns (anchors (A, 4) cell boxes, anchor_points (A, 2), num_anchors_list,
    stride_tensor (A, 1)). Matches generate_anchors(is_eval=False, mode='af').
    """
    cell_boxes, points, n_list, strides_out = [], [], [], []
    for (h, w), stride in zip(feat_sizes(img_size, strides), strides):
        half = grid_cell_size * stride * 0.5
        sx = (np.arange(w, dtype=np.float32) + grid_cell_offset) * stride
        sy = (np.arange(h, dtype=np.float32) + grid_cell_offset) * stride
        gy, gx = np.meshgrid(sy, sx, indexing="ij")
        cell = np.stack([gx - half, gy - half, gx + half, gy + half], -1).reshape(-1, 4)
        cell_boxes.append(cell)
        points.append(np.stack([gx, gy], -1).reshape(-1, 2))
        n_list.append(h * w)
        strides_out.append(np.full((h * w, 1), stride, dtype=np.float32))
    return (jnp.asarray(np.concatenate(cell_boxes)),
            jnp.asarray(np.concatenate(points)),
            n_list,
            jnp.asarray(np.concatenate(strides_out)))
