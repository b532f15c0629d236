"""Necks: RepPANNeck / RepBiFPANNeck (+P6, +CSP variants) — flax, NHWC.

Behavioral reference: yolov6/models/reppan.py (8 classes). The LP models use
RepBiFPANNeck (reppan.py:131): BiFusion top-down over (P2,P3,P4,P5) then
stride-2 bottom-up, emitting [P3(s8), P4(s16), P5(s32)] maps.

Channel indexing convention (matches the reference): channels_list is the
scaled concatenation backbone_out_channels(5 entries, or 6 for P6) ++
neck_out_channels(6 entries); comments below give yololps values.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from yololp_tpu.layers.blocks import (
    BepC3,
    BiFusion,
    ConvBNAct,
    RepBlock,
    RepVGGBlock,
    Transpose,
)


class RepPANNeck(nn.Module):
    """Classic PAN with ConvTranspose upsample + concat (reppan.py:6)."""

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    block: Any = RepVGGBlock
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        cl, nr = self.channels_list, self.num_repeats
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        simconv = lambda c, k, s, name: ConvBNAct(c, k, s, act=nn.relu, name=name, **kw)
        rep = lambda c, n, name: RepBlock(c, n=n, block=self.block, name=name, **kw)
        (x2, x1, x0) = xs

        fpn_out0 = simconv(cl[5], 1, 1, "reduce_layer0")(x0, train)
        up0 = Transpose(cl[5], dtype=self.dtype, name="upsample0")(fpn_out0)
        f_out0 = rep(cl[5], nr[5], "Rep_p4")(
            jnp.concatenate([up0, x1], -1), train)

        fpn_out1 = simconv(cl[6], 1, 1, "reduce_layer1")(f_out0, train)
        up1 = Transpose(cl[6], dtype=self.dtype, name="upsample1")(fpn_out1)
        pan_out2 = rep(cl[6], nr[6], "Rep_p3")(
            jnp.concatenate([up1, x2], -1), train)

        down1 = simconv(cl[7], 3, 2, "downsample2")(pan_out2, train)
        pan_out1 = rep(cl[8], nr[7], "Rep_n3")(
            jnp.concatenate([down1, fpn_out1], -1), train)

        down0 = simconv(cl[9], 3, 2, "downsample1")(pan_out1, train)
        pan_out0 = rep(cl[10], nr[8], "Rep_n4")(
            jnp.concatenate([down0, fpn_out0], -1), train)

        return [pan_out2, pan_out1, pan_out0]


class RepBiFPANNeck(nn.Module):
    """BiFusion PAN (reppan.py:131) — consumes (P2,P3,P4,P5), the LP neck."""

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    block: Any = RepVGGBlock
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        cl, nr = self.channels_list, self.num_repeats
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        simconv = lambda c, k, s, name: ConvBNAct(c, k, s, act=nn.relu, name=name, **kw)
        rep = lambda c, n, name: RepBlock(c, n=n, block=self.block, name=name, **kw)
        (x3, x2, x1, x0) = xs  # (P2 s4, P3 s8, P4 s16, P5 s32)

        fpn_out0 = simconv(cl[5], 1, 1, "reduce_layer0")(x0, train)      # 256
        f_out0 = rep(cl[5], nr[5], "Rep_p4")(
            BiFusion(cl[5], name="Bifusion0", **kw)([fpn_out0, x1, x2], train), train)

        fpn_out1 = simconv(cl[6], 1, 1, "reduce_layer1")(f_out0, train)  # 128
        pan_out2 = rep(cl[6], nr[6], "Rep_p3")(
            BiFusion(cl[6], name="Bifusion1", **kw)([fpn_out1, x2, x3], train), train)

        down1 = simconv(cl[7], 3, 2, "downsample2")(pan_out2, train)
        pan_out1 = rep(cl[8], nr[7], "Rep_n3")(
            jnp.concatenate([down1, fpn_out1], -1), train)

        down0 = simconv(cl[9], 3, 2, "downsample1")(pan_out1, train)
        pan_out0 = rep(cl[10], nr[8], "Rep_n4")(
            jnp.concatenate([down0, fpn_out0], -1), train)

        return [pan_out2, pan_out1, pan_out0]


class RepPANNeck6(nn.Module):
    """P6 PAN (reppan.py:239): 4 inputs (P3..P6), 4 outputs."""

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    block: Any = RepVGGBlock
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        cl, nr = self.channels_list, self.num_repeats
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        simconv = lambda c, k, s, name: ConvBNAct(c, k, s, act=nn.relu, name=name, **kw)
        rep = lambda c, n, name: RepBlock(c, n=n, block=self.block, name=name, **kw)
        (x3, x2, x1, x0) = xs  # P3, P4, P5, P6

        fpn_out0 = simconv(cl[6], 1, 1, "reduce_layer0")(x0, train)
        up0 = Transpose(cl[6], dtype=self.dtype, name="upsample0")(fpn_out0)
        f_out0 = rep(cl[6], nr[6], "Rep_p5")(jnp.concatenate([up0, x1], -1), train)

        fpn_out1 = simconv(cl[7], 1, 1, "reduce_layer1")(f_out0, train)
        up1 = Transpose(cl[7], dtype=self.dtype, name="upsample1")(fpn_out1)
        f_out1 = rep(cl[7], nr[7], "Rep_p4")(jnp.concatenate([up1, x2], -1), train)

        fpn_out2 = simconv(cl[8], 1, 1, "reduce_layer2")(f_out1, train)
        up2 = Transpose(cl[8], dtype=self.dtype, name="upsample2")(fpn_out2)
        pan_out3 = rep(cl[8], nr[8], "Rep_p3")(jnp.concatenate([up2, x3], -1), train)

        down2 = simconv(cl[8], 3, 2, "downsample2")(pan_out3, train)
        pan_out2 = rep(cl[9], nr[9], "Rep_n4")(
            jnp.concatenate([down2, fpn_out2], -1), train)

        down1 = simconv(cl[9], 3, 2, "downsample1")(pan_out2, train)
        pan_out1 = rep(cl[10], nr[10], "Rep_n5")(
            jnp.concatenate([down1, fpn_out1], -1), train)

        down0 = simconv(cl[10], 3, 2, "downsample0")(pan_out1, train)
        pan_out0 = rep(cl[11], nr[11], "Rep_n6")(
            jnp.concatenate([down0, fpn_out0], -1), train)

        return [pan_out3, pan_out2, pan_out1, pan_out0]


class RepBiFPANNeck6(nn.Module):
    """P6 BiFusion PAN (reppan.py:393): 5 inputs (P2..P6), 4 outputs."""

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    block: Any = RepVGGBlock
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        cl, nr = self.channels_list, self.num_repeats
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        simconv = lambda c, k, s, name: ConvBNAct(c, k, s, act=nn.relu, name=name, **kw)
        rep = lambda c, n, name: RepBlock(c, n=n, block=self.block, name=name, **kw)
        (x4, x3, x2, x1, x0) = xs  # P2..P6

        fpn_out0 = simconv(cl[6], 1, 1, "reduce_layer0")(x0, train)
        f_out0 = rep(cl[6], nr[6], "Rep_p5")(
            BiFusion(cl[6], name="Bifusion0", **kw)([fpn_out0, x1, x2], train), train)

        fpn_out1 = simconv(cl[7], 1, 1, "reduce_layer1")(f_out0, train)
        f_out1 = rep(cl[7], nr[7], "Rep_p4")(
            BiFusion(cl[7], name="Bifusion1", **kw)([fpn_out1, x2, x3], train), train)

        fpn_out2 = simconv(cl[8], 1, 1, "reduce_layer2")(f_out1, train)
        pan_out3 = rep(cl[8], nr[8], "Rep_p3")(
            BiFusion(cl[8], name="Bifusion2", **kw)([fpn_out2, x3, x4], train), train)

        down2 = simconv(cl[8], 3, 2, "downsample2")(pan_out3, train)
        pan_out2 = rep(cl[9], nr[9], "Rep_n4")(
            jnp.concatenate([down2, fpn_out2], -1), train)

        down1 = simconv(cl[9], 3, 2, "downsample1")(pan_out2, train)
        pan_out1 = rep(cl[10], nr[10], "Rep_n5")(
            jnp.concatenate([down1, fpn_out1], -1), train)

        down0 = simconv(cl[10], 3, 2, "downsample0")(pan_out1, train)
        pan_out0 = rep(cl[11], nr[11], "Rep_n6")(
            jnp.concatenate([down0, fpn_out0], -1), train)

        return [pan_out3, pan_out2, pan_out1, pan_out0]


class CSPRepPANNeck(nn.Module):
    """reppan.py:543 — RepPANNeck with BepC3 stages (m/l models)."""

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    block: Any = RepVGGBlock
    csp_e: float = 0.5
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        cl, nr = self.channels_list, self.num_repeats
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        simconv = lambda c, k, s, name: ConvBNAct(c, k, s, act=nn.relu, name=name, **kw)
        csp = lambda c, n, name: BepC3(c, n=n, e=self.csp_e, block=self.block,
                                       name=name, **kw)
        (x2, x1, x0) = xs

        fpn_out0 = simconv(cl[5], 1, 1, "reduce_layer0")(x0, train)
        up0 = Transpose(cl[5], dtype=self.dtype, name="upsample0")(fpn_out0)
        f_out0 = csp(cl[5], nr[5], "Rep_p4")(jnp.concatenate([up0, x1], -1), train)

        fpn_out1 = simconv(cl[6], 1, 1, "reduce_layer1")(f_out0, train)
        up1 = Transpose(cl[6], dtype=self.dtype, name="upsample1")(fpn_out1)
        pan_out2 = csp(cl[6], nr[6], "Rep_p3")(jnp.concatenate([up1, x2], -1), train)

        down1 = simconv(cl[7], 3, 2, "downsample2")(pan_out2, train)
        pan_out1 = csp(cl[8], nr[7], "Rep_n3")(
            jnp.concatenate([down1, fpn_out1], -1), train)

        down0 = simconv(cl[9], 3, 2, "downsample1")(pan_out1, train)
        pan_out0 = csp(cl[10], nr[8], "Rep_n4")(
            jnp.concatenate([down0, fpn_out0], -1), train)

        return [pan_out2, pan_out1, pan_out0]


class CSPRepBiFPANNeck(nn.Module):
    """reppan.py:657 — RepBiFPANNeck with BepC3 stages."""

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    block: Any = RepVGGBlock
    csp_e: float = 0.5
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        cl, nr = self.channels_list, self.num_repeats
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        simconv = lambda c, k, s, name: ConvBNAct(c, k, s, act=nn.relu, name=name, **kw)
        csp = lambda c, n, name: BepC3(c, n=n, e=self.csp_e, block=self.block,
                                       name=name, **kw)
        (x3, x2, x1, x0) = xs

        fpn_out0 = simconv(cl[5], 1, 1, "reduce_layer0")(x0, train)
        f_out0 = csp(cl[5], nr[5], "Rep_p4")(
            BiFusion(cl[5], name="Bifusion0", **kw)([fpn_out0, x1, x2], train), train)

        fpn_out1 = simconv(cl[6], 1, 1, "reduce_layer1")(f_out0, train)
        pan_out2 = csp(cl[6], nr[6], "Rep_p3")(
            BiFusion(cl[6], name="Bifusion1", **kw)([fpn_out1, x2, x3], train), train)

        down1 = simconv(cl[7], 3, 2, "downsample2")(pan_out2, train)
        pan_out1 = csp(cl[8], nr[7], "Rep_n3")(
            jnp.concatenate([down1, fpn_out1], -1), train)

        down0 = simconv(cl[9], 3, 2, "downsample1")(pan_out1, train)
        pan_out0 = csp(cl[10], nr[8], "Rep_n4")(
            jnp.concatenate([down0, fpn_out0], -1), train)

        return [pan_out2, pan_out1, pan_out0]


class CSPRepPANNeck_P6(nn.Module):
    """reppan.py:771 — P6 CSP PAN."""

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    block: Any = RepVGGBlock
    csp_e: float = 0.5
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        cl, nr = self.channels_list, self.num_repeats
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        simconv = lambda c, k, s, name: ConvBNAct(c, k, s, act=nn.relu, name=name, **kw)
        csp = lambda c, n, name: BepC3(c, n=n, e=self.csp_e, block=self.block,
                                       name=name, **kw)
        (x3, x2, x1, x0) = xs

        fpn_out0 = simconv(cl[6], 1, 1, "reduce_layer0")(x0, train)
        up0 = Transpose(cl[6], dtype=self.dtype, name="upsample0")(fpn_out0)
        f_out0 = csp(cl[6], nr[6], "Rep_p5")(jnp.concatenate([up0, x1], -1), train)

        fpn_out1 = simconv(cl[7], 1, 1, "reduce_layer1")(f_out0, train)
        up1 = Transpose(cl[7], dtype=self.dtype, name="upsample1")(fpn_out1)
        f_out1 = csp(cl[7], nr[7], "Rep_p4")(jnp.concatenate([up1, x2], -1), train)

        fpn_out2 = simconv(cl[8], 1, 1, "reduce_layer2")(f_out1, train)
        up2 = Transpose(cl[8], dtype=self.dtype, name="upsample2")(fpn_out2)
        pan_out3 = csp(cl[8], nr[8], "Rep_p3")(jnp.concatenate([up2, x3], -1), train)

        down2 = simconv(cl[8], 3, 2, "downsample2")(pan_out3, train)
        pan_out2 = csp(cl[9], nr[9], "Rep_n4")(
            jnp.concatenate([down2, fpn_out2], -1), train)

        down1 = simconv(cl[9], 3, 2, "downsample1")(pan_out2, train)
        pan_out1 = csp(cl[10], nr[10], "Rep_n5")(
            jnp.concatenate([down1, fpn_out1], -1), train)

        down0 = simconv(cl[10], 3, 2, "downsample0")(pan_out1, train)
        pan_out0 = csp(cl[11], nr[11], "Rep_n6")(
            jnp.concatenate([down0, fpn_out0], -1), train)

        return [pan_out3, pan_out2, pan_out1, pan_out0]


class CSPRepBiFPANNeck_P6(nn.Module):
    """reppan.py:930 — P6 CSP BiFusion PAN."""

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    block: Any = RepVGGBlock
    csp_e: float = 0.5
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        cl, nr = self.channels_list, self.num_repeats
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        simconv = lambda c, k, s, name: ConvBNAct(c, k, s, act=nn.relu, name=name, **kw)
        csp = lambda c, n, name: BepC3(c, n=n, e=self.csp_e, block=self.block,
                                       name=name, **kw)
        (x4, x3, x2, x1, x0) = xs

        fpn_out0 = simconv(cl[6], 1, 1, "reduce_layer0")(x0, train)
        f_out0 = csp(cl[6], nr[6], "Rep_p5")(
            BiFusion(cl[6], name="Bifusion0", **kw)([fpn_out0, x1, x2], train), train)

        fpn_out1 = simconv(cl[7], 1, 1, "reduce_layer1")(f_out0, train)
        f_out1 = csp(cl[7], nr[7], "Rep_p4")(
            BiFusion(cl[7], name="Bifusion1", **kw)([fpn_out1, x2, x3], train), train)

        fpn_out2 = simconv(cl[8], 1, 1, "reduce_layer2")(f_out1, train)
        pan_out3 = csp(cl[8], nr[8], "Rep_p3")(
            BiFusion(cl[8], name="Bifusion2", **kw)([fpn_out2, x3, x4], train), train)

        down2 = simconv(cl[8], 3, 2, "downsample2")(pan_out3, train)
        pan_out2 = csp(cl[9], nr[9], "Rep_n4")(
            jnp.concatenate([down2, fpn_out2], -1), train)

        down1 = simconv(cl[9], 3, 2, "downsample1")(pan_out2, train)
        pan_out1 = csp(cl[10], nr[10], "Rep_n5")(
            jnp.concatenate([down1, fpn_out1], -1), train)

        down0 = simconv(cl[10], 3, 2, "downsample0")(pan_out1, train)
        pan_out0 = csp(cl[11], nr[11], "Rep_n6")(
            jnp.concatenate([down0, fpn_out0], -1), train)

        return [pan_out3, pan_out2, pan_out1, pan_out0]
