"""Backbones: EfficientRep (+P6), CSPBepBackbone (+P6) — flax, NHWC.

Behavioral reference: yolov6/models/efficientrep.py. Stage structure:
stem (stride-2 rep block) then ERBlock_2..5(+6): each a stride-2 rep block +
RepBlock stage; the deepest stage appends an SPPF variant. With fuse_P2 the
stride-4 ERBlock_2 output is also emitted (used by RepBiFPANNeck for the LP
models, configs/yololps.py:11).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from yololp_tpu.layers.blocks import (
    BepC3,
    CSPSPPF,
    ConvWrapper,
    RepBlock,
    RepVGGBlock,
    SPPF,
    SimCSPSPPF,
    SimSPPF,
)


def _sppf_cls(block, cspsppf: bool):
    if cspsppf:
        return CSPSPPF if block is ConvWrapper else SimCSPSPPF
    return SPPF if block is ConvWrapper else SimSPPF


class EfficientRep(nn.Module):
    """efficientrep.py:6 — rep-style backbone, 3 or 4 (with P2) outputs."""

    channels_list: Sequence[int]  # scaled [64,128,256,512,1024]-style list
    num_repeats: Sequence[int]
    block: Any = RepVGGBlock
    fuse_P2: bool = False
    cspsppf: bool = False
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cl, nr = self.channels_list, self.num_repeats
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        outputs = []
        x = self.block(cl[0], stride=2, name="stem", **kw)(x, train)
        for i, stage in enumerate(("ERBlock_2", "ERBlock_3", "ERBlock_4", "ERBlock_5")):
            c = cl[i + 1]
            x = self.block(c, stride=2, name=f"{stage}_down", **kw)(x, train)
            x = RepBlock(c, n=nr[i + 1], block=self.block,
                         name=f"{stage}_rep", **kw)(x, train)
            if stage == "ERBlock_5":
                x = _sppf_cls(self.block, self.cspsppf)(
                    c, name="ERBlock_5_sppf", **kw)(x, train)
            if stage == "ERBlock_2" and self.fuse_P2:
                outputs.append(x)
            elif stage != "ERBlock_2":
                outputs.append(x)
        return tuple(outputs)


class EfficientRep6(nn.Module):
    """efficientrep.py:120 — P6 variant (adds stride-64 ERBlock_6 + SPPF there)."""

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    block: Any = RepVGGBlock
    fuse_P2: bool = False
    cspsppf: bool = False
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cl, nr = self.channels_list, self.num_repeats
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        outputs = []
        x = self.block(cl[0], stride=2, name="stem", **kw)(x, train)
        stages = ("ERBlock_2", "ERBlock_3", "ERBlock_4", "ERBlock_5", "ERBlock_6")
        for i, stage in enumerate(stages):
            c = cl[i + 1]
            x = self.block(c, stride=2, name=f"{stage}_down", **kw)(x, train)
            x = RepBlock(c, n=nr[i + 1], block=self.block,
                         name=f"{stage}_rep", **kw)(x, train)
            if stage == "ERBlock_6":
                x = (SimCSPSPPF if self.cspsppf else SimSPPF)(
                    c, name="ERBlock_6_sppf", **kw)(x, train)
            if stage == "ERBlock_2" and self.fuse_P2:
                outputs.append(x)
            elif stage != "ERBlock_2":
                outputs.append(x)
        return tuple(outputs)


class CSPBepBackbone(nn.Module):
    """efficientrep.py:249 — CSP (BepC3) backbone for m/l models."""

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    block: Any = RepVGGBlock
    csp_e: float = 0.5
    fuse_P2: bool = False
    cspsppf: bool = False
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cl, nr = self.channels_list, self.num_repeats
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        outputs = []
        x = self.block(cl[0], stride=2, name="stem", **kw)(x, train)
        for i, stage in enumerate(("ERBlock_2", "ERBlock_3", "ERBlock_4", "ERBlock_5")):
            c = cl[i + 1]
            x = self.block(c, stride=2, name=f"{stage}_down", **kw)(x, train)
            x = BepC3(c, n=nr[i + 1], e=self.csp_e, block=self.block,
                      name=f"{stage}_csp", **kw)(x, train)
            if stage == "ERBlock_5":
                x = _sppf_cls(self.block, self.cspsppf)(
                    c, name="ERBlock_5_sppf", **kw)(x, train)
            if stage == "ERBlock_2" and self.fuse_P2:
                outputs.append(x)
            elif stage != "ERBlock_2":
                outputs.append(x)
        return tuple(outputs)


class CSPBepBackbone_P6(nn.Module):
    """efficientrep.py:367 — CSP P6 backbone."""

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    block: Any = RepVGGBlock
    csp_e: float = 0.5
    fuse_P2: bool = False
    cspsppf: bool = False
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cl, nr = self.channels_list, self.num_repeats
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        outputs = []
        x = self.block(cl[0], stride=2, name="stem", **kw)(x, train)
        stages = ("ERBlock_2", "ERBlock_3", "ERBlock_4", "ERBlock_5", "ERBlock_6")
        for i, stage in enumerate(stages):
            c = cl[i + 1]
            x = self.block(c, stride=2, name=f"{stage}_down", **kw)(x, train)
            x = BepC3(c, n=nr[i + 1], e=self.csp_e, block=self.block,
                      name=f"{stage}_csp", **kw)(x, train)
            if stage == "ERBlock_6":
                x = (SimCSPSPPF if self.cspsppf else SimSPPF)(
                    c, name="ERBlock_6_sppf", **kw)(x, train)
            if stage == "ERBlock_2" and self.fuse_P2:
                outputs.append(x)
            elif stage != "ERBlock_2":
                outputs.append(x)
        return tuple(outputs)
