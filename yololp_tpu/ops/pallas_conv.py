"""Pallas fused int8 3x3 conv + requant for the deploy RepBlock chains.

Why this kernel exists: XLA's conv(int8,int8)->int32 on v5e DOES deliver
the datasheet int8 rate (315-392 TOPS = 2.1-2.5x the bf16 conv rate under
the trusted in-scan protocol, probe_mxu_v5 r4e — earlier "1.2-1.5x"
readings were measurement artifacts and are retracted), but it cannot fuse
the per-channel requantize epilogue into the convolution — each chain link
round-trips an int32 accumulator through HBM, and the epilogue is ~25% of
chain wall time. Fusing that epilogue is this kernel's one justification.
Measured result (probe_pallas_conv, r4e): 0.85-0.97x of the XLA path —
the fusion win does not currently beat XLA's conv schedule, so the kernel
stays an opt-in exactness/fusion reference, not the default. This kernel
computes one
RepBlock link as nine shifted (rows*S, C) @ (C, O) MXU contractions over a
VMEM-resident input slab, applies the requant epilogue (per-out-channel
scale + bias, relu folded into the clip's lower bound, round, saturate) on
the int32 accumulator while it is still on-chip, and writes int8 — HBM
traffic is 1 byte/elem in + 1 byte/elem out, nothing else.

Semantics match quant/int8_infer._chain_repblock's per-link math: int8
outputs are BIT-exact (int32 accumulation is order-independent and the
round/clip epilogue absorbs sub-ULP float differences); float chain-exit
outputs can differ by one bf16 ULP where the lowering does or does not
contract the epilogue's mul+add into an FMA (tests/test_pallas_conv.py
pins both down).

Role parity: the reference's TensorRT engine does the same int8-in/int8-out
layer fusion on GPU (its INT8 speedups in tools/qat/README.md:75-80 come
from fused conv+requant TRT layers); this is the TPU-native equivalent,
hand-scheduled because XLA's conv path won't do it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_row_tile(s: int, c: int, vmem_budget: int = 6 * 2**20) -> int:
    """Largest row tile TR dividing S whose working set fits the budget:
    2x input slab (TR+2, S+2, C) int8 (double-buffered), 2x output
    (TR, S, O) int8, int32 accumulator + f32 epilogue temp. The 6 MB
    budget is empirical: a 10 MB estimate crashed the mosaic compile at
    (S=160, C=64) on v5e (runs/q4e/probe_pallas_conv2.json)."""
    for tr in [t for t in (s, s // 2, s // 4, s // 8) if t and s % t == 0]:
        need = (2 * (tr + 2) * (s + 2) * c      # in slabs, int8
                + 2 * tr * s * c                # out tiles, int8
                + 2 * tr * s * c * 4)           # acc + epilogue temp, int32
        if need <= vmem_budget:
            return tr
    return max(s // 8, 1)


def _conv_kernel(x_ref, w_ref, a_ref, b_ref, o_ref, *, tr, s, relu,
                 out_int8):
    """One (batch image, row tile) grid step.

    x_ref: (1, TR+2, S+2, C) int8 — padded input slab incl. halo rows/cols
    w_ref: (9, C, O) int8 — HWIO kernel reshaped, tap-major
    a_ref/b_ref: (1, O) f32 — fused requant scale / bias (see int8_infer)
    o_ref: (1, TR, S, O) int8 or bf16
    """
    x = x_ref[0]                                   # (TR+2, S+2, C)
    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = x[dy:dy + tr, dx:dx + s, :].reshape(tr * s, -1)
            y = jax.lax.dot_general(
                tap, w_ref[dy * 3 + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = y if acc is None else acc + y
    yf = acc.astype(jnp.float32) * a_ref[0] + b_ref[0]
    if out_int8:
        lo = 0.0 if relu else -128.0               # relu folds into the clip
        q = jnp.clip(jnp.round(yf), lo, 127.0).astype(jnp.int8)
        o_ref[0] = q.reshape(tr, s, -1)
    else:
        if relu:
            yf = jnp.maximum(yf, 0.0)
        o_ref[0] = yf.astype(o_ref.dtype).reshape(tr, s, -1)


def conv3x3_int8_fused(x_q, w9, a, b, *, relu=True, out_dtype=jnp.int8,
                       row_tile=None, interpret=None):
    """Fused 3x3/stride-1/pad-1 conv(int8,int8)->int32 -> requant.

    x_q: (N, S, S, C) int8, already quantized at the link's input scale.
    w9:  (9, C, O) int8 (HWIO kernel `w.reshape(9, C, O)`).
    a,b: (O,) f32 epilogue: out = clip(round(acc*a + b), lo, 127) for int8
         (lo = 0 when relu), or relu(acc*a + b) for a float out_dtype.

    Returns (N, S, S, O) in out_dtype. Use out_dtype=int8 for interior
    chain links / stage handoffs, bf16/f32 for the chain exit.
    """
    n, s, s2, c = x_q.shape
    assert s == s2, "square feature maps only (the model's are)"
    o = w9.shape[-1]
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    tr = row_tile or _pick_row_tile(s, max(c, o))
    assert s % tr == 0, (s, tr)
    out_int8 = jnp.dtype(out_dtype) == jnp.dtype(jnp.int8)

    xp = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    kern = functools.partial(_conv_kernel, tr=tr, s=s, relu=relu,
                             out_int8=out_int8)
    grid = (n, s // tr)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            # element-granular offsets (pl.Element on EVERY dim — mosaic
            # rejects mixing): consecutive row slabs overlap by the 2 halo
            # rows, which blocked indexing cannot express
            pl.BlockSpec((pl.Element(1), pl.Element(tr + 2),
                          pl.Element(s + 2), pl.Element(c)),
                         lambda i, r: (i, r * tr, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, o), lambda i, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, s, o), lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, s, s, o), out_dtype),
        interpret=interpret,
    )(xp, w9, a.reshape(1, o).astype(jnp.float32),
      b.reshape(1, o).astype(jnp.float32))


def chain_repblock_pallas(x, sub_paths, amax_by_path, weight_table,
                          out_dtype=None):
    """Drop-in for quant/int8_infer._chain_repblock through the fused
    kernel: quantize once at entry, run every link conv+requant int8->int8
    on-chip, dequantize+relu at exit. Same math, same signature subset."""
    scales = [jnp.float32(amax_by_path[p]) / 127.0 for p in sub_paths]
    if x.dtype == jnp.int8:
        q = x
    else:
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scales[0]),
                     -128, 127).astype(jnp.int8)
    out_dtype = out_dtype if out_dtype is not None else x.dtype
    for i, p in enumerate(sub_paths):
        w_q, w_scale, bias = weight_table[p]
        kh, kw, c, o = w_q.shape
        w9 = w_q.reshape(kh * kw, c, o)
        if i + 1 < len(sub_paths):
            a = scales[i] * w_scale / scales[i + 1]
            b = bias / scales[i + 1]
            q = conv3x3_int8_fused(q, w9, a, b, relu=True,
                                   out_dtype=jnp.int8)
        else:
            a = scales[i] * w_scale
            return conv3x3_int8_fused(q, w9, a, bias, relu=True,
                                      out_dtype=out_dtype)
