"""Structural reparameterization as pure param-pytree transforms.

The reference mutates nn.Modules in place (RepVGGBlock.switch_to_deploy,
common.py:308; fuse_conv_and_bn, torch_utils.py:50). Here fusion is a pure
function: train-mode variables {'params', 'batch_stats'} -> deploy-mode params
consumed by the same model definition built with deploy=True. Applied at
checkpoint-load / trace time, so inference always runs the single-conv graph
and XLA sees only biased convs + ReLU (which it fuses on the MXU).

Kernel layout is HWIO (flax default). Fusion math mirrors
common.py:268-306 (get_equivalent_kernel_bias / _fuse_bn_tensor) exactly,
computed in fp32.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from yololp_tpu.layers.blocks import BN_EPS

_REPVGG_KEYS = {"rbr_dense_conv", "rbr_dense_bn", "rbr_1x1_conv", "rbr_1x1_bn"}
_LINEARADD_KEYS = {"conv", "scale_conv", "conv_1x1", "scale_1x1", "bn"}


def fold_conv_bn(kernel, bn_params, bn_stats, conv_bias=None, eps: float = BN_EPS):
    """Fold BatchNorm(conv(x) + b0) into (kernel', bias'). kernel is HWIO."""
    kernel = jnp.asarray(kernel, jnp.float32)
    scale = jnp.asarray(bn_params["scale"], jnp.float32)
    bias = jnp.asarray(bn_params["bias"], jnp.float32)
    mean = jnp.asarray(bn_stats["mean"], jnp.float32)
    var = jnp.asarray(bn_stats["var"], jnp.float32)
    t = scale / jnp.sqrt(var + eps)  # per output channel
    fused_kernel = kernel * t  # broadcasts over the last (O) axis
    b0 = jnp.asarray(conv_bias, jnp.float32) if conv_bias is not None else 0.0
    fused_bias = (b0 - mean) * t + bias
    return fused_kernel, fused_bias


def _identity_kernel_3x3(in_channels: int, out_channels: int, groups: int = 1):
    """Dirac 3x3 kernel in HWIO equal to the identity map (common.py:287-292)."""
    input_dim = in_channels // groups
    k = np.zeros((3, 3, input_dim, out_channels), dtype=np.float32)
    for o in range(out_channels):
        k[1, 1, o % input_dim, o] = 1.0
    return jnp.asarray(k)


def _pad_1x1_to_3x3(kernel1x1):
    return jnp.pad(kernel1x1, ((1, 1), (1, 1), (0, 0), (0, 0)))


def fold_repvgg(params: Dict, stats: Dict, eps: float = BN_EPS):
    """Fuse the 3 RepVGG branches into one biased 3x3 conv (common.py:268)."""
    k3, b3 = fold_conv_bn(params["rbr_dense_conv"]["kernel"],
                          params["rbr_dense_bn"], stats["rbr_dense_bn"], eps=eps)
    k1, b1 = fold_conv_bn(params["rbr_1x1_conv"]["kernel"],
                          params["rbr_1x1_bn"], stats["rbr_1x1_bn"], eps=eps)
    kernel = k3 + _pad_1x1_to_3x3(k1)
    bias = b3 + b1
    if "rbr_identity_bn" in params:
        # identity branch only exists when in==out and stride==1 (groups=1 here)
        kid = _identity_kernel_3x3(k3.shape[2], k3.shape[3], groups=1)
        ki, bi = fold_conv_bn(kid, params["rbr_identity_bn"],
                              stats["rbr_identity_bn"], eps=eps)
        kernel = kernel + ki
        bias = bias + bi
    return {"conv": {"kernel": kernel, "bias": bias}}


def fold_linear_add(params: Dict, stats: Dict, eps: float = BN_EPS):
    """Fuse a LinearAddBlock (CSLA) into one biased 3x3 conv.

    equivalent kernel = scale_conv*k3 + pad(scale_1x1*k1) [+ scale_id*I],
    then fold the trailing shared BN.
    """
    k3 = jnp.asarray(params["conv"]["kernel"], jnp.float32)
    k1 = jnp.asarray(params["conv_1x1"]["kernel"], jnp.float32)
    kernel = (k3 * jnp.asarray(params["scale_conv"]["weight"], jnp.float32)
              + _pad_1x1_to_3x3(
                  k1 * jnp.asarray(params["scale_1x1"]["weight"], jnp.float32)))
    if "scale_identity" in params:
        kid = _identity_kernel_3x3(k3.shape[2], k3.shape[3])
        kernel = kernel + kid * jnp.asarray(
            params["scale_identity"]["weight"], jnp.float32)
    fused_kernel, fused_bias = fold_conv_bn(kernel, params["bn"], stats["bn"], eps=eps)
    return {"conv": {"kernel": fused_kernel, "bias": fused_bias}}


def _is_conv_leaf(node) -> bool:
    return isinstance(node, dict) and "kernel" in node


def fuse_tree(params: Any, stats: Optional[Dict], eps: float = BN_EPS):
    """Recursively fold every fusible pattern in a params tree.

    Patterns (by the blocks.py naming contract):
      * RepVGG branches              -> single 'conv'
      * LinearAddBlock (CSLA)        -> single 'conv'
      * sibling 'conv' + 'bn' pair   -> biased 'conv' (BN removed)
    Everything else is passed through unchanged.
    """
    if not isinstance(params, dict):
        return params
    stats = stats or {}
    keys = set(params.keys())
    if _REPVGG_KEYS <= keys:
        return fold_repvgg(params, stats, eps=eps)
    if _LINEARADD_KEYS <= keys:
        return fold_linear_add(params, stats, eps=eps)
    out = {}
    if "conv" in keys and "bn" in keys and _is_conv_leaf(params["conv"]):
        kernel, bias = fold_conv_bn(
            params["conv"]["kernel"], params["bn"], stats.get("bn", {}),
            conv_bias=params["conv"].get("bias"), eps=eps)
        out["conv"] = {"kernel": kernel, "bias": bias}
        keys -= {"conv", "bn"}
    for k in keys:
        out[k] = fuse_tree(params[k], stats.get(k), eps=eps)
    return out


def fuse_variables(variables: Dict, eps: float = BN_EPS) -> Dict:
    """{'params': train_params, 'batch_stats': stats} -> {'params': deploy}."""
    return {"params": fuse_tree(variables["params"],
                                variables.get("batch_stats", {}), eps=eps)}


def fuse_variables_jit(variables: Dict, eps: float = BN_EPS) -> Dict:
    """Jitted fusion: one compiled program instead of hundreds of tiny eager
    dispatches (matters on remote/tunneled TPU backends)."""
    import jax

    return jax.jit(lambda v: fuse_variables(v, eps=eps))(variables)
