"""Layer/block primitives — flax.linen, NHWC, TPU-first.

Behavioral reference: yolov6/layers/common.py (Conv, SimConv, RepVGGBlock,
RealVGGBlock, LinearAddBlock, RepBlock, BottleRep, BepC3, SPPF family,
BiFusion, Transpose, get_block). Re-designed for TPU:

  * NHWC activations / HWIO kernels (XLA's native TPU conv layout).
  * Explicit torch-style padding (k//2 on both sides) so stride-2 geometry
    matches the reference exactly.
  * Every block takes a static `deploy` flag. In deploy mode, Conv+BN pairs
    and the 3-branch RepVGG block collapse to a single biased conv; the
    matching pure param transform lives in yololp_tpu.layers.fuse.
  * `dtype` is the compute dtype (bf16 on TPU), `param_dtype` stays fp32.

Naming contract (relied on by fuse.py): a fusible Conv+BN pair is always
submodules named 'conv' + 'bn'; RepVGG branches are 'rbr_dense_conv',
'rbr_dense_bn', 'rbr_1x1_conv', 'rbr_1x1_bn', 'rbr_identity_bn'; the deploy
conv is named 'conv'.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

# Reference BN hyperparams: torch_utils.initialize_weights sets eps=1e-3,
# torch momentum=0.03 (flax running-average momentum = 1 - 0.03).
BN_EPS = 1e-3
BN_MOMENTUM = 0.97


def torch_pad(kernel_size: int):
    p = kernel_size // 2
    return ((p, p), (p, p))


class BatchNorm(nn.BatchNorm):
    """BatchNorm with the reference's eps/momentum defaults."""

    epsilon: float = BN_EPS
    momentum: float = BN_MOMENTUM


class ConvBNAct(nn.Module):
    """Conv + BN + activation (reference Conv=SiLU / SimConv=ReLU).

    deploy=True replaces conv+BN with a single biased conv (weights produced
    by fuse.fold_conv_bn). conv_bias=True mirrors the reference's
    ConvWrapper/SimConvWrapper which keep a conv bias *and* BN.
    """

    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    groups: int = 1
    act: Optional[Callable] = nn.silu
    conv_bias: bool = False
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=torch_pad(self.kernel_size),
            feature_group_count=self.groups,
            use_bias=self.conv_bias or self.deploy,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if not self.deploy:
            y = BatchNorm(use_running_average=not train, dtype=self.dtype,
                          param_dtype=jnp.float32, name="bn")(y)
        return self.act(y) if self.act is not None else y


SimConv = functools.partial(ConvBNAct, act=nn.relu)
SiluConv = functools.partial(ConvBNAct, act=nn.silu)


class RepVGGBlock(nn.Module):
    """3-branch structural-reparameterization block (common.py:208).

    Train graph: 3x3 conv+BN + 1x1 conv+BN + (identity BN when in==out and
    stride==1), summed then ReLU. Deploy graph: single biased 3x3 conv + ReLU,
    numerically identical after fuse.fold_repvgg.
    """

    out_channels: int
    stride: int = 1
    groups: int = 1
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = functools.partial(
            nn.Conv, features=self.out_channels, strides=(self.stride, self.stride),
            feature_group_count=self.groups, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32)
        bn = functools.partial(
            BatchNorm, use_running_average=not train, dtype=self.dtype,
            param_dtype=jnp.float32)

        if self.deploy:
            y = nn.Conv(self.out_channels, (3, 3), strides=(self.stride, self.stride),
                        padding=torch_pad(3), feature_group_count=self.groups,
                        use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
                        name="conv")(x)
            return nn.relu(y)

        dense = bn(name="rbr_dense_bn")(
            conv(kernel_size=(3, 3), padding=torch_pad(3), name="rbr_dense_conv")(x))
        one = bn(name="rbr_1x1_bn")(
            conv(kernel_size=(1, 1), padding=((0, 0), (0, 0)), name="rbr_1x1_conv")(x))
        y = dense + one
        if x.shape[-1] == self.out_channels and self.stride == 1:
            y = y + bn(name="rbr_identity_bn")(x)
        return nn.relu(y)


class RealVGGBlock(nn.Module):
    """Plain conv-BN-ReLU (RepOpt target net, common.py:328)."""

    out_channels: int
    stride: int = 1
    groups: int = 1  # reference ignores groups here; kept for API parity
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBNAct(self.out_channels, 3, self.stride, act=nn.relu,
                         deploy=self.deploy, dtype=self.dtype, name="cell")(x, train)


class ScaleLayer(nn.Module):
    """Per-channel learnable scale (+ optional bias) — common.py:348."""

    use_bias: bool = True
    scale_init: float = 1.0

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.constant(self.scale_init), (c,))
        y = x * w
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (c,))
        return y


class LinearAddBlock(nn.Module):
    """CSLA hyper-search block (common.py:369): scaled 3x3 + scaled 1x1
    (+ scaled identity), shared BN, ReLU. `is_csla` freezes the conv scales
    (handled by the optimizer mask, not here)."""

    out_channels: int
    stride: int = 1
    conv_scale_init: float = 1.0
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deploy:
            y = nn.Conv(self.out_channels, (3, 3), strides=(self.stride, self.stride),
                        padding=torch_pad(3), use_bias=True, dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv")(x)
            return nn.relu(y)
        conv = functools.partial(
            nn.Conv, features=self.out_channels, strides=(self.stride, self.stride),
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        y = ScaleLayer(use_bias=False, scale_init=self.conv_scale_init, name="scale_conv")(
            conv(kernel_size=(3, 3), padding=torch_pad(3), name="conv")(x))
        y = y + ScaleLayer(use_bias=False, scale_init=self.conv_scale_init, name="scale_1x1")(
            conv(kernel_size=(1, 1), padding=((0, 0), (0, 0)), name="conv_1x1")(x))
        if x.shape[-1] == self.out_channels and self.stride == 1:
            y = y + ScaleLayer(use_bias=False, scale_init=1.0, name="scale_identity")(x)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      param_dtype=jnp.float32, name="bn")(y)
        return nn.relu(y)


class ConvWrapper(nn.Module):
    """conv_silu training mode block (common.py:67): biased conv + BN + SiLU."""

    out_channels: int
    stride: int = 1
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBNAct(self.out_channels, 3, self.stride, act=nn.silu,
                         conv_bias=True, deploy=self.deploy, dtype=self.dtype,
                         name="block")(x, train)


class SimConvWrapper(nn.Module):
    """conv_relu training mode block (common.py:77): biased conv + BN + ReLU."""

    out_channels: int
    stride: int = 1
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBNAct(self.out_channels, 3, self.stride, act=nn.relu,
                         conv_bias=True, deploy=self.deploy, dtype=self.dtype,
                         name="block")(x, train)


def _max_pool5(x):
    return nn.max_pool(x, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2)))


class SPPFBase(nn.Module):
    """SPPF (common.py:88/106): 1x1 reduce, 3x stacked 5x5 maxpool, 1x1 out."""

    out_channels: int
    act: Callable = nn.relu  # SimSPPF; SPPF uses silu
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        cba = functools.partial(ConvBNAct, act=self.act, deploy=self.deploy,
                                dtype=self.dtype)
        x = cba(c_, 1, 1, name="cv1")(x, train)
        y1 = _max_pool5(x)
        y2 = _max_pool5(y1)
        y3 = _max_pool5(y2)
        return cba(self.out_channels, 1, 1, name="cv2")(
            jnp.concatenate([x, y1, y2, y3], -1), train)


SimSPPF = functools.partial(SPPFBase, act=nn.relu)
SPPF = functools.partial(SPPFBase, act=nn.silu)


class CSPSPPFBase(nn.Module):
    """CSP-SPPF (common.py:124/149)."""

    out_channels: int
    e: float = 0.5
    act: Callable = nn.relu  # SimCSPSPPF; CSPSPPF uses silu
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.out_channels * self.e)
        cba = functools.partial(ConvBNAct, act=self.act, deploy=self.deploy,
                                dtype=self.dtype)
        x1 = cba(c_, 1, 1, name="cv1")(x, train)
        x1 = cba(c_, 3, 1, name="cv3")(x1, train)
        x1 = cba(c_, 1, 1, name="cv4")(x1, train)
        y0 = cba(c_, 1, 1, name="cv2")(x, train)
        y1 = _max_pool5(x1)
        y2 = _max_pool5(y1)
        y3 = _max_pool5(y2)
        m = cba(c_, 1, 1, name="cv5")(jnp.concatenate([x1, y1, y2, y3], -1), train)
        m = cba(c_, 3, 1, name="cv6")(m, train)
        return cba(self.out_channels, 1, 1, name="cv7")(
            jnp.concatenate([y0, m], -1), train)


SimCSPSPPF = functools.partial(CSPSPPFBase, act=nn.relu)
CSPSPPF = functools.partial(CSPSPPFBase, act=nn.silu)


class Transpose(nn.Module):
    """2x learnable upsample via ConvTranspose(k=2, s=2) — common.py:174."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            self.out_channels, (2, 2), strides=(2, 2), padding="VALID",
            use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
            name="upsample_transpose")(x)


class BottleRep(nn.Module):
    """Two rep blocks with optional weighted residual (common.py:437)."""

    out_channels: int
    block: Any = RepVGGBlock
    weight: bool = False
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = self.block(self.out_channels, deploy=self.deploy, dtype=self.dtype,
                       name="conv1")(x, train)
        y = self.block(self.out_channels, deploy=self.deploy, dtype=self.dtype,
                       name="conv2")(y, train)
        if x.shape[-1] == self.out_channels:
            alpha = (self.param("alpha", nn.initializers.ones, (1,))
                     if self.weight else 1.0)
            y = y + alpha * x
        return y


class RepBlock(nn.Module):
    """Stage of n rep-style blocks (common.py:416). When block is BottleRep,
    uses n//2 BottleReps with weighted residuals (the CSP 'm' path)."""

    out_channels: int
    n: int = 1
    block: Any = RepVGGBlock
    basic_block: Any = RepVGGBlock
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.block is BottleRep:
            x = BottleRep(self.out_channels, block=self.basic_block, weight=True,
                          deploy=self.deploy, dtype=self.dtype, name="conv1")(x, train)
            n = self.n // 2
            for i in range(n - 1):
                x = BottleRep(self.out_channels, block=self.basic_block, weight=True,
                              deploy=self.deploy, dtype=self.dtype,
                              name=f"block_{i}")(x, train)
        else:
            x = self.block(self.out_channels, deploy=self.deploy, dtype=self.dtype,
                           name="conv1")(x, train)
            for i in range(self.n - 1):
                x = self.block(self.out_channels, deploy=self.deploy, dtype=self.dtype,
                               name=f"block_{i}")(x, train)
        return x


class BepC3(nn.Module):
    """CSP block with BottleRep inner stage (common.py:479)."""

    out_channels: int
    n: int = 1
    e: float = 0.5
    concat: bool = True
    block: Any = RepVGGBlock
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.out_channels * self.e)
        act = nn.silu if self.block is ConvWrapper else nn.relu
        cba = functools.partial(ConvBNAct, act=act, deploy=self.deploy,
                                dtype=self.dtype)
        y1 = cba(c_, 1, 1, name="cv1")(x, train)
        y1 = RepBlock(c_, n=self.n, block=BottleRep, basic_block=self.block,
                      deploy=self.deploy, dtype=self.dtype, name="m")(y1, train)
        if self.concat:
            y2 = cba(c_, 1, 1, name="cv2")(x, train)
            return cba(self.out_channels, 1, 1, name="cv3")(
                jnp.concatenate([y1, y2], -1), train)
        return cba(self.out_channels, 1, 1, name="cv3")(y1, train)


class BiFusion(nn.Module):
    """BiFusion neck block (common.py:504): learnable 2x upsample of the deep
    map + 1x1-reduced same-level map + stride-2 downsample of the shallow map,
    concat then 1x1."""

    out_channels: int
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence, train: bool = False):
        deep, same, shallow = xs
        cba = functools.partial(ConvBNAct, act=nn.relu, deploy=self.deploy,
                                dtype=self.dtype)
        x0 = Transpose(self.out_channels, dtype=self.dtype, name="upsample")(deep)
        x1 = cba(self.out_channels, 1, 1, name="cv1")(same, train)
        x2 = cba(self.out_channels, 3, 2, name="downsample")(
            cba(self.out_channels, 1, 1, name="cv2")(shallow, train), train)
        return cba(self.out_channels, 1, 1, name="cv3")(
            jnp.concatenate([x0, x1, x2], -1), train)


def get_block(mode: str):
    """Training-mode block selector (common.py:530)."""
    return {
        "repvgg": RepVGGBlock,
        "hyper_search": LinearAddBlock,
        "repopt": RealVGGBlock,
        "conv_relu": SimConvWrapper,
        "conv_silu": ConvWrapper,
    }[mode]
