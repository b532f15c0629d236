"""Layer-block tests: fusion exactness + golden parity vs reference torch blocks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yololp_tpu.layers import (
    ConvBNAct,
    LinearAddBlock,
    RepVGGBlock,
    fuse_variables,
)
from conftest import add_reference_to_path, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

rng = np.random.default_rng(42)


def randomize_stats(variables, key=0):
    """Give batch_stats / params non-trivial values so fusion is a real test."""
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(key), len(leaves))
    new = [jax.random.uniform(k, l.shape, l.dtype, 0.05, 1.5) for k, l in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, new)


@pytest.mark.parametrize("cin,cout,stride", [(8, 8, 1), (8, 16, 2), (16, 16, 2)])
def test_repvgg_fuse_equivalence(cin, cout, stride):
    x = jnp.asarray(rng.normal(size=(2, 16, 16, cin)).astype(np.float32))
    block = RepVGGBlock(cout, stride=stride)
    variables = block.init(jax.random.PRNGKey(0), x)
    variables = randomize_stats(variables)

    y_branched = block.apply(variables, x, train=False)
    deploy = RepVGGBlock(cout, stride=stride, deploy=True)
    fused = fuse_variables(variables)
    y_fused = deploy.apply(fused, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_branched),
                               rtol=1e-4, atol=1e-4)


def test_convbn_fold_equivalence():
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8)).astype(np.float32))
    m = ConvBNAct(16, kernel_size=3, stride=2, act=None)
    variables = randomize_stats(m.init(jax.random.PRNGKey(1), x))
    y = m.apply(variables, x, train=False)
    md = ConvBNAct(16, kernel_size=3, stride=2, act=None, deploy=True)
    y2 = md.apply(fuse_variables(variables), x)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), rtol=1e-4, atol=1e-4)


def test_linear_add_fuse_equivalence():
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 12)).astype(np.float32))
    m = LinearAddBlock(12, stride=1)
    variables = randomize_stats(m.init(jax.random.PRNGKey(2), x))
    y = m.apply(variables, x, train=False)
    md = LinearAddBlock(12, stride=1, deploy=True)
    y2 = md.apply(fuse_variables(variables), x)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), rtol=1e-4, atol=1e-4)


def _torch_conv_to_hwio(w):
    return np.ascontiguousarray(w.detach().numpy().transpose(2, 3, 1, 0))


@requires_reference
@pytest.mark.parametrize("cin,cout,stride", [(8, 8, 1), (8, 16, 2)])
def test_repvgg_matches_torch_reference(cin, cout, stride):
    """Load reference RepVGGBlock weights into our block; outputs must match
    both in branched (train-graph, eval stats) and fused (deploy) form."""
    add_reference_to_path()
    import torch
    from yolov6.layers.common import RepVGGBlock as TorchRepVGG

    tb = TorchRepVGG(cin, cout, 3, stride=stride)
    tb.eval()
    with torch.no_grad():
        # non-trivial BN stats; eps=1e-3 mirrors the reference's model-level
        # initialize_weights (torch_utils.py:38-47), which our BatchNorm uses
        for mod in [tb.rbr_dense.bn, tb.rbr_1x1.bn] + (
            [tb.rbr_identity] if tb.rbr_identity is not None else []
        ):
            mod.eps = 1e-3
            mod.running_mean.uniform_(-0.5, 0.5)
            mod.running_var.uniform_(0.5, 1.5)
            mod.weight.uniform_(0.5, 1.5)
            mod.bias.uniform_(-0.5, 0.5)

    xn = rng.normal(size=(2, cin, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tb(torch.from_numpy(xn)).numpy()

    def bn_tree(bn):
        return (
            {"scale": jnp.asarray(bn.weight.detach().numpy()),
             "bias": jnp.asarray(bn.bias.detach().numpy())},
            {"mean": jnp.asarray(bn.running_mean.numpy()),
             "var": jnp.asarray(bn.running_var.numpy())},
        )

    params = {
        "rbr_dense_conv": {"kernel": jnp.asarray(_torch_conv_to_hwio(tb.rbr_dense.conv.weight))},
        "rbr_1x1_conv": {"kernel": jnp.asarray(_torch_conv_to_hwio(tb.rbr_1x1.conv.weight))},
    }
    stats = {}
    params["rbr_dense_bn"], stats["rbr_dense_bn"] = bn_tree(tb.rbr_dense.bn)
    params["rbr_1x1_bn"], stats["rbr_1x1_bn"] = bn_tree(tb.rbr_1x1.bn)
    if tb.rbr_identity is not None:
        params["rbr_identity_bn"], stats["rbr_identity_bn"] = bn_tree(tb.rbr_identity)
    variables = {"params": params, "batch_stats": stats}

    x = jnp.asarray(xn.transpose(0, 2, 3, 1))  # NCHW -> NHWC
    ours = RepVGGBlock(cout, stride=stride).apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4)

    # reference deploy fusion vs ours
    tb.switch_to_deploy()
    with torch.no_grad():
        ref_deploy = tb(torch.from_numpy(xn)).numpy()
    fused = fuse_variables(variables)
    ref_kernel = _torch_conv_to_hwio(tb.rbr_reparam.weight)
    np.testing.assert_allclose(
        np.asarray(fused["params"]["conv"]["kernel"]), ref_kernel, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(fused["params"]["conv"]["bias"]),
        tb.rbr_reparam.bias.detach().numpy(), rtol=1e-4, atol=1e-5)
    ours_deploy = RepVGGBlock(cout, stride=stride, deploy=True).apply(fused, x)
    np.testing.assert_allclose(
        np.asarray(ours_deploy).transpose(0, 3, 1, 2), ref_deploy, rtol=1e-4, atol=1e-4)
