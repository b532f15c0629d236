"""LP Efficient Decoupled Head — the core novelty of YOLO-LP, rebuilt TPU-first.

Behavioral reference: yolov6/models/effidehead.py (Detect +
build_effidehead_layer). Per FPN level the reference builds 13 modules: a 1x1
stem, one 3x3 cls conv feeding EIGHT separate 1x1 classification preds
(province[npro], alphabet[nalp], 6 x character[nads]), and one 3x3 reg conv
feeding box-distance (4*(reg_max+1)) and corner-offset (8) preds.

TPU-first redesign: the eight 1x1 classification convs are ONE fused 1x1 conv
with npro+nalp+6*nads output channels (mathematically identical — independent
1x1 convs concatenated along the output axis — but one big MXU matmul instead
of eight thin ones); likewise reg+cor fuse into one 1x1 conv. Bias init
reproduces effidehead.py:66-150: cls bias = -log((1-p)/p) with p=0.01, reg/cor
bias = 1.0, all pred kernels zero-initialized.

Train output: HeadTrainOutput with sigmoided scores shaped (B, A, C); the 6
character heads are batched as (B, A, 6, nads). Eval output: the 290-column
tensor [bbox_xywh(4), obj(=1), corners(8), pro(31), alp(24), ads(6*37)]
(effidehead.py:287-301) decoded fully on device.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Sequence

import jax.numpy as jnp
from flax import linen as nn

from yololp_tpu.layers.blocks import ConvBNAct
from yololp_tpu.ops.anchors import anchor_points_from_shapes
from yololp_tpu.ops.geometry import dist2bbox, dist2cor


class HeadTrainOutput(NamedTuple):
    """Equivalent of the reference's 11-tuple train output (effidehead.py:152)."""

    feats: Any            # list of (B, H, W, C) stem outputs per level
    pro: jnp.ndarray      # (B, A, npro)   sigmoided
    alp: jnp.ndarray      # (B, A, nalp)   sigmoided
    ads: jnp.ndarray      # (B, A, 6, nads) sigmoided
    reg: jnp.ndarray      # (B, A, 4*(reg_max+1)) raw distances/distribution
    cor: jnp.ndarray      # (B, A, 8) raw corner offsets


def _cls_bias_init(prior_prob: float = 1e-2):
    b = -math.log((1 - prior_prob) / prior_prob)

    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, b, dtype)

    return init


class Detect(nn.Module):
    """Anchor-free LP detection head over 3 (or 4) FPN levels."""

    npro: int = 31
    nalp: int = 24
    nads: int = 37
    num_layers: int = 3
    use_dfl: bool = True
    reg_max: int = 16
    deploy: bool = False
    dtype: Any = jnp.float32
    grid_cell_offset: float = 0.5
    grid_cell_size: float = 5.0

    @property
    def strides(self) -> Sequence[int]:
        return (8, 16, 32) if self.num_layers == 3 else (8, 16, 32, 64)

    @property
    def ncls(self) -> int:
        return self.npro + self.nalp + 6 * self.nads

    @nn.compact
    def __call__(self, xs, train: bool = False):
        nreg = 4 * (self.reg_max + 1)
        pro_sl = slice(0, self.npro)
        alp_sl = slice(self.npro, self.npro + self.nalp)
        ads_start = self.npro + self.nalp

        cls_flat, reg_flat, cor_flat, feats = [], [], [], []
        for i, x in enumerate(xs):
            c = x.shape[-1]
            stem = ConvBNAct(c, 1, 1, act=nn.silu, deploy=self.deploy,
                             dtype=self.dtype, name=f"stem{i}")(x, train)
            feats.append(stem)
            cls_feat = ConvBNAct(c, 3, 1, act=nn.silu, deploy=self.deploy,
                                 dtype=self.dtype, name=f"cls_conv{i}")(stem, train)
            reg_feat = ConvBNAct(c, 3, 1, act=nn.silu, deploy=self.deploy,
                                 dtype=self.dtype, name=f"reg_conv{i}")(stem, train)
            # fused 8-task classification pred (zero kernel, prior-prob bias)
            cls_out = nn.Conv(self.ncls, (1, 1), use_bias=True,
                              kernel_init=nn.initializers.zeros,
                              bias_init=_cls_bias_init(),
                              dtype=self.dtype, param_dtype=jnp.float32,
                              name=f"cls_pred{i}")(cls_feat)
            # fused reg+cor pred (zero kernel, bias 1.0)
            regcor = nn.Conv(nreg + 8, (1, 1), use_bias=True,
                             kernel_init=nn.initializers.zeros,
                             bias_init=nn.initializers.ones,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"reg_pred{i}")(reg_feat)
            b = x.shape[0]
            cls_flat.append(cls_out.reshape(b, -1, self.ncls))
            reg_flat.append(regcor[..., :nreg].reshape(b, -1, nreg))
            cor_flat.append(regcor[..., nreg:].reshape(b, -1, 8))

        cls_scores = nn.sigmoid(jnp.concatenate(cls_flat, 1).astype(jnp.float32))
        reg_distri = jnp.concatenate(reg_flat, 1).astype(jnp.float32)
        cor_distri = jnp.concatenate(cor_flat, 1).astype(jnp.float32)

        pro = cls_scores[..., pro_sl]
        alp = cls_scores[..., alp_sl]
        ads = cls_scores[..., ads_start:].reshape(
            cls_scores.shape[0], cls_scores.shape[1], 6, self.nads)

        if train:
            return HeadTrainOutput(feats, pro, alp, ads, reg_distri, cor_distri)

        # ---- eval decode (effidehead.py:214-301) ----
        shapes = [(x.shape[1], x.shape[2]) for x in xs]
        anchor_points, stride_tensor = anchor_points_from_shapes(
            shapes, self.strides, self.grid_cell_offset)

        if self.use_dfl:
            b, a, _ = reg_distri.shape
            dist = nn.softmax(reg_distri.reshape(b, a, 4, self.reg_max + 1), axis=-1)
            proj = jnp.arange(self.reg_max + 1, dtype=jnp.float32)
            reg_dist = jnp.einsum("bakr,r->bak", dist, proj)
        else:
            reg_dist = reg_distri

        pred_bboxes = dist2bbox(reg_dist, anchor_points, box_format="xywh")
        pred_corners = dist2cor(cor_distri, anchor_points)
        pred_bboxes = pred_bboxes * stride_tensor
        pred_corners = pred_corners * stride_tensor

        b, a = pred_bboxes.shape[:2]
        obj = jnp.ones((b, a, 1), pred_bboxes.dtype)
        ads_flat = ads.reshape(b, a, 6 * self.nads)
        return jnp.concatenate(
            [pred_bboxes, obj, pred_corners, pro, alp, ads_flat], -1)
