#!/usr/bin/env python3
"""Is 2x int8 reachable on this chip's MXU, and through which lowering?

profile_int8's conv micro + the r4 bench agree: XLA's conv(int8,int8)->int32
delivers only ~1.1-1.3x the bf16 conv rate on v5e, far from the 2x the
int8 MXU datasheet rate (394 TOPS vs 197 bf16 TFLOPS) promises and the
1.6-1.7x the reference banks via TensorRT (tools/qat/README.md:75-80).
This probe isolates WHERE the gap is by timing the same contraction
through three lowerings, bf16 vs int8 each:

  matmul_xla     jnp.dot / lax.dot_general          (XLA's matmul path)
  matmul_pallas  hand-tiled Mosaic kernel           (bypasses XLA lowering)
  conv_xla       lax.conv_general_dilated 3x3       (XLA's conv path)
  conv_9dots     3x3 conv as 9 shifted dot_generals (conv on the matmul path)

If matmul_int8 ~ 2x matmul_bf16 while conv_int8 ~ 1.2x, the executor fix
is to reformulate the deploy convs onto the matmul path (conv_9dots or a
pallas conv); if even the pallas int8 matmul is ~1x, the 2x simply is not
reachable from this software stack and docs/tutorial_quant.md should say
so with this probe as evidence.

Timing protocol: yololp_tpu.utils.profiler.timed_scan_delta2 (K
data-dependent iterations in one program; same-buffer median walls, K/2K
differencing with a replay-scaling guard). Fresh-buffer differencing
(timed_scan_delta) buried the signal under a seconds-scale noisy operand
transfer — see tools/diag_scan_walls.py.
"""

from __future__ import annotations

import argparse
import functools
import json
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


# ---- pallas tiled matmul (bf16 and int8) -----------------------------------

def _mm_kernel(a_ref, b_ref, o_ref, acc_t):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_t)


def pallas_matmul(a, b, acc_t, bm):
    """(M,K)@(K,N) with full-K blocks: grid over M tiles, B resident.

    K,N <= 2048 here, so one (bm,K) A-tile + the whole (K,N) B + the
    (bm,N) out tile fit VMEM comfortably; the MXU sees (bm,K)x(K,N)
    contractions with zero re-tiling cleverness — deliberately minimal,
    this is a rate probe, not a production kernel.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = a.shape
    _, N = b.shape
    kern = functools.partial(_mm_kernel, acc_t=acc_t)
    return pl.pallas_call(
        kern,
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), acc_t),
        interpret=_INTERPRET,
    )(a, b)


# ---- probe cases ------------------------------------------------------------

def _chain_f(y):
    """(M,N)fp32 -> (M,N)bf16 next input, finite."""
    return (y * jnp.asarray(1e-2, jnp.float32)).astype(jnp.bfloat16)


def _chain_i(y):
    """(M,N)int32 -> (M,N)int8 next input."""
    return jnp.clip(y >> 12, -127, 127).astype(jnp.int8)


def matmul_case(M, K, iters, use_pallas, bm):
    """Square-K chained matmul: x_{t+1} = g(x_t @ w). Returns (bf16_s, int8_s)
    per-iteration seconds, tunnel round-trip cancelled (timed_scan_delta:
    a 20-iteration matmul program is ~1 ms of device work inside a ~50 ms
    dispatch, so single-program timing is pure latency)."""
    from yololp_tpu.utils.profiler import timed_scan_delta2 as timed_scan_delta

    def make_run(mm, chain):
        def of_k(k):
            def run(x0, w):
                def body(x, _):
                    return chain(mm(x, w)), ()
                return lax.scan(body, x0, None, length=k)[0]
            return run
        return of_k

    if use_pallas:
        mm_f = lambda x, w: pallas_matmul(x, w, jnp.float32, bm)  # noqa: E731
        mm_i = lambda x, w: pallas_matmul(x, w, jnp.int32, bm)    # noqa: E731
    else:
        mm_f = lambda x, w: jax.lax.dot_general(                   # noqa: E731
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        mm_i = lambda x, w: jax.lax.dot_general(                   # noqa: E731
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    xb = jnp.asarray(np.random.randn(M, K) * 0.1, jnp.bfloat16)
    wb = jnp.asarray(np.random.randn(K, K) * 0.05, jnp.bfloat16)
    t_f = timed_scan_delta(make_run(mm_f, _chain_f), iters, xb, wb)

    xi = jnp.asarray(np.random.randint(-127, 128, (M, K)), jnp.int8)
    wi = jnp.asarray(np.random.randint(-127, 128, (K, K)), jnp.int8)
    t_i = timed_scan_delta(make_run(mm_i, _chain_i), iters, xi, wi)
    return t_f, t_i


def conv9dots(x, w9):
    """3x3 same-conv as 9 shifted (N*H*W,C)@(C,C) dots, int32 accumulated.

    x: (N,H,W,C) int8; w9: (9,C,C) int8 (HWIO kernel reshaped). Every tap
    runs on the matmul path; the 9 int32 partials sum on the VPU.
    """
    N, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = lax.slice(xp, (0, dy, dx, 0), (N, dy + H, dx + W, C))
            y = jax.lax.dot_general(
                tap.reshape(N * H * W, C), w9[dy * 3 + dx],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            acc = y if acc is None else acc + y
    return acc.reshape(N, H, W, C)


def conv_case(B, S, C, iters):
    """3x3 same-ch conv at one model geometry: XLA conv bf16/int8 +
    9-dots int8. Returns dict of per-iter seconds (round-trip
    cancelled — see matmul_case)."""
    from yololp_tpu.utils.profiler import timed_scan_delta2 as timed_scan_delta

    def conv(x, w, pet):
        return lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet)

    def make_scan(step):
        def of_k(k):
            def run(x0, w):
                def body(x, _):
                    return step(x, w), ()
                return lax.scan(body, x0, None, length=k)[0]
            return run
        return of_k

    xb = jnp.asarray(np.random.randn(B, S, S, C) * 0.1, jnp.bfloat16)
    wb = jnp.asarray(np.random.randn(3, 3, C, C) * 0.01, jnp.bfloat16)
    xi = jnp.asarray(np.random.randint(-127, 128, (B, S, S, C)), jnp.int8)
    wi = jnp.asarray(np.random.randint(-127, 128, (3, 3, C, C)), jnp.int8)
    w9 = jnp.asarray(np.random.randint(-127, 128, (9, C, C)), jnp.int8)

    return {
        "conv_xla_bf16_s": timed_scan_delta(
            make_scan(lambda x, w: _chain_f(conv(x, w, jnp.float32))),
            iters, xb, wb),
        "conv_xla_int8_s": timed_scan_delta(
            make_scan(lambda x, w: _chain_i(conv(x, w, jnp.int32))),
            iters, xi, wi),
        "conv_9dots_int8_s": timed_scan_delta(
            make_scan(lambda x, w: _chain_i(conv9dots(x, w))),
            iters, xi, w9),
    }


def main(argv=None):
    p = argparse.ArgumentParser("MXU int8 rate probe")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--bm", type=int, default=512, help="pallas M tile")
    p.add_argument("--device", default=None, choices=["cpu", "tpu"])
    p.add_argument("--skip-pallas", action="store_true")
    p.add_argument("--small", action="store_true",
                   help="tiny shapes (CPU smoke)")
    args = p.parse_args(argv)

    if args.device == "cpu":
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"

    global jax, jnp, np, lax, _INTERPRET
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    _INTERPRET = jax.devices()[0].platform == "cpu"

    out = {"platform": jax.devices()[0].platform}

    # Shapes sized so a K-iteration program is >=10 ms of device work even
    # at peak rate: the r4d2 run used 2-GFLOP/iter cases whose whole program
    # fit inside the tunnel's ~50 ms round-trip jitter and reported 0.5-1.8
    # "TFLOP/s" for matmuls the chip runs 50x faster.
    mm_shapes = ([(256, 128)] if args.small
                 else [(16384, 512), (8192, 1024), (4096, 2048)])
    mm_iters = args.iters if args.small else args.iters * 5
    rows = []
    for M, K in mm_shapes:
        flops = 2 * M * K * K  # per iter
        row = {"M": M, "K": K}
        t_f, t_i = matmul_case(M, K, mm_iters, False, args.bm)
        row["xla_bf16_tflops"] = round(flops / t_f / 1e12, 1)
        row["xla_int8_tops"] = round(flops / t_i / 1e12, 1)
        row["xla_int8_speedup"] = round(t_f / t_i, 3)
        if not args.skip_pallas:
            bm = min(args.bm, M)
            try:
                t_f, t_i = matmul_case(M, K, mm_iters, True, bm)
                row["pallas_bf16_tflops"] = round(flops / t_f / 1e12, 1)
                row["pallas_int8_tops"] = round(flops / t_i / 1e12, 1)
                row["pallas_int8_speedup"] = round(t_f / t_i, 3)
            except Exception as e:  # noqa: BLE001 — e.g. VMEM overflow at K=2048
                row["pallas_error"] = f"{type(e).__name__}: {e}"[:200]
        rows.append(row)
    out["matmul"] = rows

    conv_shapes = ([(2, 16, 64)] if args.small
                   else [(128, 80, 128), (128, 40, 256), (128, 20, 512)])
    crows = []
    for B, S, C in conv_shapes:
        flops = 2 * B * S * S * C * C * 9
        r = conv_case(B, S, C, args.iters)
        crows.append({
            "B": B, "S": S, "C": C,
            "conv_bf16_tflops": round(flops / r["conv_xla_bf16_s"] / 1e12, 1),
            "conv_int8_tops": round(flops / r["conv_xla_int8_s"] / 1e12, 1),
            "conv_int8_speedup":
                round(r["conv_xla_bf16_s"] / r["conv_xla_int8_s"], 3),
            "c9dots_int8_tops":
                round(flops / r["conv_9dots_int8_s"] / 1e12, 1),
            "c9dots_vs_conv_bf16":
                round(r["conv_xla_bf16_s"] / r["conv_9dots_int8_s"], 3),
        })
    out["conv3x3"] = crows
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
