"""Bit-exactness of the fused pallas int8 conv (ops/pallas_conv.py)
against the XLA formulation it replaces (quant/int8_infer._chain_repblock
per-link math). Runs in interpret mode on the CPU test backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from yololp_tpu.ops.pallas_conv import (chain_repblock_pallas,
                                        conv3x3_int8_fused)
from yololp_tpu.quant.int8_infer import _chain_repblock


def _ref_link(x, w, a, b, relu=True, out_int8=True, out_dtype=jnp.bfloat16):
    y32 = lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    yf = y32.astype(jnp.float32) * a + b
    if out_int8:
        lo = 0.0 if relu else -128.0
        return jnp.clip(jnp.round(yf), lo, 127.0).astype(jnp.int8)
    if relu:
        yf = jnp.maximum(yf, 0.0)
    return yf.astype(out_dtype)


@pytest.mark.parametrize("s,c,row_tile", [(16, 128, None), (16, 128, 4),
                                          (8, 256, None), (16, 64, 8)])
def test_fused_link_bit_exact(s, c, row_tile):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (2, s, s, c)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, c, c)), jnp.int8)
    a = jnp.asarray(rng.random(c) * 0.02 + 1e-4, jnp.float32)
    b = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    w9 = w.reshape(9, c, c)

    got = conv3x3_int8_fused(x, w9, a, b, relu=True, out_dtype=jnp.int8,
                             row_tile=row_tile)
    assert got.dtype == jnp.int8
    assert jnp.array_equal(got, _ref_link(x, w, a, b))

    # float exit: the epilogue's mul+add may or may not contract to an FMA
    # depending on the lowering, so the f32 pre-cast value can differ by
    # 1 ULP and flip an occasional bf16 rounding — near-exact, not exact
    got_f = conv3x3_int8_fused(x, w9, a, b, relu=True,
                               out_dtype=jnp.bfloat16, row_tile=row_tile)
    want_f = _ref_link(x, w, a, b, out_int8=False)
    np.testing.assert_allclose(np.asarray(got_f, np.float32),
                               np.asarray(want_f, np.float32),
                               rtol=1e-2, atol=1e-2)
    exact = float(jnp.mean((got_f == want_f).astype(jnp.float32)))
    assert exact > 0.99


def test_no_relu_variant():
    rng = np.random.default_rng(1)
    c = 128
    x = jnp.asarray(rng.integers(-127, 128, (1, 8, 8, c)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, c, c)), jnp.int8)
    a = jnp.asarray(rng.random(c) * 0.02 + 1e-4, jnp.float32)
    b = jnp.zeros((c,), jnp.float32)
    got = conv3x3_int8_fused(x, w.reshape(9, c, c), a, b, relu=False,
                             out_dtype=jnp.int8)
    assert jnp.array_equal(got, _ref_link(x, w, a, b, relu=False))
    # negative codes must survive without the relu clamp
    assert int(jnp.min(got)) < 0


@pytest.mark.parametrize("entry_int8", [False, True])
def test_chain_matches_xla_chain(entry_int8):
    """Whole-chain drop-in: pallas chain == int8_infer._chain_repblock,
    for both a bf16 entry (quantize at entry) and a handed-off int8
    entry."""
    rng = np.random.default_rng(2)
    c, s, links = 64, 16, 3
    paths = [f"blk/link_{i}/conv" for i in range(links)]
    amax = {p: float(rng.random() * 4 + 2) for p in paths}
    table = {p: (jnp.asarray(rng.integers(-127, 128, (3, 3, c, c)),
                             jnp.int8),
                 jnp.asarray(rng.random(c) * 0.01 + 1e-4, jnp.float32),
                 jnp.asarray(rng.standard_normal(c) * 0.05, jnp.float32))
             for p in paths}
    if entry_int8:
        x = jnp.asarray(rng.integers(0, 128, (2, s, s, c)), jnp.int8)
        kw = dict(out_dtype=jnp.bfloat16)
    else:
        x = jnp.asarray(rng.standard_normal((2, s, s, c)) * 0.5,
                        jnp.bfloat16)
        kw = {}

    want = _chain_repblock(x, paths, amax, table, **kw)
    got = chain_repblock_pallas(x, paths, amax, table, **kw)
    assert got.dtype == want.dtype
    # interior links are int8 round+clip (exact); only the exit cast can
    # wobble by one bf16 ULP via FMA contraction differences
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-2, atol=1e-2)
    exact = float(jnp.mean((got == want).astype(jnp.float32)))
    assert exact > 0.99


def test_row_tile_must_divide():
    x = jnp.zeros((1, 16, 16, 128), jnp.int8)
    w9 = jnp.zeros((9, 128, 128), jnp.int8)
    a = jnp.ones((128,), jnp.float32)
    b = jnp.zeros((128,), jnp.float32)
    with pytest.raises(AssertionError):
        conv3x3_int8_fused(x, w9, a, b, row_tile=5)
