"""RepOpt tests: scale extraction, reinit, gradient masks, and the CSLA
equivalence theorem (one masked GD step on the merged kernel == merging
after one GD step on the branches)."""

import numpy as np

import jax
import jax.numpy as jnp

import conftest  # noqa: F401
from yololp_tpu.models import build_model
from yololp_tpu.solver.repopt import (
    extract_scales,
    gradient_masks,
    load_scales,
    reinitialize,
    save_scales,
)
from yololp_tpu.utils.config import Config

rng = np.random.default_rng(5)


def test_extract_reinit_mask_roundtrip(tmp_path):
    hs_cfg = Config.named("repopt/yolov6n_hs")
    opt_cfg = Config.named("repopt/yolov6n_opt")
    _, hs_vars = build_model(hs_cfg, img_size=(64, 64))
    _, opt_vars = build_model(opt_cfg, img_size=(64, 64), seed=1)

    scales = extract_scales(hs_vars["params"])
    assert len(scales) > 10
    # identity-branch blocks yield triples, stride/channel-change blocks pairs
    assert {len(s) for s in scales} == {2, 3}

    p = tmp_path / "scales.msgpack"
    save_scales(scales, str(p))
    loaded = load_scales(str(p))
    for a, b in zip(scales, loaded):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y)

    new_params = reinitialize(opt_vars["params"], scales, jax.random.PRNGKey(0))
    masks = gradient_masks(new_params, scales)
    # structure preserved, kernels changed
    flat_old = jax.tree_util.tree_leaves(opt_vars["params"])
    flat_new = jax.tree_util.tree_leaves(new_params)
    assert len(flat_old) == len(flat_new)
    # at least one mask leaf is a real (non-scalar) mask with center boost
    mask_leaves = [m for m in jax.tree_util.tree_leaves(masks) if m.ndim == 4]
    assert len(mask_leaves) == len(scales)
    m = mask_leaves[0]
    assert float(m[1, 1].mean()) > float(m[0, 0].mean())


def test_csla_equivalence_one_step():
    """W_merged = s_c*W3 + s_1*pad(W1). One GD step on (W3, W1) with shared
    output grad == one masked GD step on W_merged with mask
    s_c^2 + s_1^2 at center (RepOpt's defining property)."""
    in_ch, out_ch = 4, 4
    w3 = rng.normal(size=(3, 3, in_ch, out_ch)).astype(np.float32)
    w1 = rng.normal(size=(1, 1, in_ch, out_ch)).astype(np.float32)
    s_c = rng.uniform(0.5, 1.5, out_ch).astype(np.float32)
    s_1 = rng.uniform(0.5, 1.5, out_ch).astype(np.float32)
    x = rng.normal(size=(2, 8, 8, in_ch)).astype(np.float32)
    target = rng.normal(size=(2, 8, 8, out_ch)).astype(np.float32)

    def conv(xx, w):
        return jax.lax.conv_general_dilated(
            xx, w, (1, 1), ((1, 1), (1, 1)) if w.shape[0] == 3 else ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def csla_loss(w3_, w1_):
        y = conv(x, w3_ * s_c) + conv(x, w1_ * s_1)
        return ((y - target) ** 2).sum()

    def merged(w3_, w1_):
        return w3_ * s_c + jnp.pad(w1_ * s_1, ((1, 1), (1, 1), (0, 0), (0, 0)))

    def merged_loss(w):
        y = conv(x, w)
        return ((y - target) ** 2).sum()

    lr = 0.01
    g3, g1 = jax.grad(csla_loss, argnums=(0, 1))(jnp.asarray(w3), jnp.asarray(w1))
    merged_after_branch_step = merged(w3 - lr * g3, w1 - lr * g1)

    w = merged(jnp.asarray(w3), jnp.asarray(w1))
    g = jax.grad(merged_loss)(w)
    mask = jnp.ones_like(w) * (s_c ** 2)
    mask = mask.at[1, 1].add(jnp.ones((in_ch, out_ch)) * (s_1 ** 2))
    merged_after_masked_step = w - lr * g * mask

    np.testing.assert_allclose(np.asarray(merged_after_masked_step),
                               np.asarray(merged_after_branch_step),
                               rtol=1e-4, atol=1e-4)
