"""int8 PTQ / QAT as JAX graph passes (no module-code changes).

Behavioral reference: tools/qat/qat_utils.py (module swap to
pytorch-quantization fake-quant convs, calibration via collect_stats +
compute_amax max/histogram-entropy/percentile/mse, sensitive-layer skip
lists) and tools/partial_quantization/*. TPU-native redesign:

  * Activation observation/fake-quant is a flax `intercept_methods` pass
    over `nn.Conv` / `nn.ConvTranspose` calls — calibration captures
    per-conv input amax (or log-spaced histograms) as extra jitted outputs;
    quantized inference/QAT fake-quants the same inputs by module path.
  * Weight fake-quant is a pure per-output-channel params transform.
  * fake_quant uses a straight-through estimator (custom_vjp) so QAT
    gradients flow; under jit the whole thing stays one XLA program.

Module paths look like 'backbone/stem/conv'; skip lists match by substring
(mirroring the reference's name-keyword matching).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

HIST_BINS = 2048

# layers the reference never quantizes (qat_utils.py:61 skips proj_conv and
# the sensitive head layers from the config list), plus the stem: its
# 3-channel input pads to 32 int8 sublanes and the quantized stem measures
# NET SLOWER than bf16 (+1.4 ms/batch at b128@640 — runs/q4e/
# probe_int8_e2e.json r4e: int8_full 33.85 ms vs skip_stem 32.41 ms),
# while also being the network's most quantization-sensitive layer
# (standard TRT practice keeps the first conv in higher precision).
DEFAULT_SKIP_SUBSTRINGS: Tuple[str, ...] = ("proj_conv", "backbone/stem")


@jax.custom_vjp
def fake_quant(x, amax, num_bits: int = 8):
    qmax = 2.0 ** (num_bits - 1) - 1.0
    scale = jnp.maximum(amax, 1e-9) / qmax
    q = jnp.round(jnp.clip(x / scale, -qmax - 1, qmax))
    return q * scale


def _fq_fwd(x, amax, num_bits=8):
    return fake_quant(x, amax, num_bits), (x, amax)


def _fq_bwd(res, g):
    x, amax = res
    # straight-through inside the clip range, zero outside
    inside = (jnp.abs(x) <= jnp.maximum(amax, 1e-9)).astype(g.dtype)
    return g * inside, None, None


fake_quant.defvjp(_fq_fwd, _fq_bwd)


def _module_path(context) -> str:
    return "/".join(str(p) for p in context.module.path)


def _is_quantizable(context) -> bool:
    return (isinstance(context.module, (nn.Conv, nn.ConvTranspose))
            and context.method_name == "__call__")


def _skip(path: str, skip_substrings: Sequence[str]) -> bool:
    return any(s in path for s in skip_substrings)


# ---------------- calibration ----------------


def make_calib_fn(model, variables, mode: str = "max",
                  skip_substrings: Sequence[str] = DEFAULT_SKIP_SUBSTRINGS,
                  amax_by_path: Dict[str, float] | None = None):
    """Returns a jitted fn(images_u8) -> stats dict.

    mode 'max': per-conv input amax.
    mode 'histogram': per-conv |x| histogram over HIST_BINS *linear* bins on
    [0, global_amax], where global_amax comes from `amax_by_path` (a prior
    max-mode pass). Fixing the bin edges per path makes cross-batch merging
    a plain histogram sum — this mirrors pytorch-quantization's
    HistogramCalibrator, whose bin width is frozen after the first batch so
    all batches accumulate into one consistently-binned histogram
    (calibrator semantics behind tools/qat/qat_utils.py:53-59).
    """
    if mode == "histogram" and not amax_by_path:
        raise ValueError("histogram mode needs amax_by_path from a prior "
                         "max-mode calibration pass (two-pass binning)")

    def forward(x):
        captured: Dict[str, jnp.ndarray] = {}

        def interceptor(next_fun, args, kwargs, context):
            if _is_quantizable(context):
                path = _module_path(context)
                if not _skip(path, skip_substrings):
                    a = jnp.abs(args[0].astype(jnp.float32))
                    if mode == "max":
                        captured[path] = jnp.max(a)
                    elif path in amax_by_path:
                        width = max(amax_by_path[path], 1e-12) / HIST_BINS
                        idx = jnp.clip((a / width).astype(jnp.int32),
                                       0, HIST_BINS - 1)
                        captured[path] = jnp.zeros(
                            HIST_BINS, jnp.float32).at[idx.reshape(-1)].add(1.0)
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            model.apply(variables, x, train=False)
        return captured

    @jax.jit
    def calib(images_u8):
        x = images_u8.astype(model.dtype) / jnp.asarray(255.0, model.dtype)
        return forward(x)

    return calib


def merge_calib_stats(per_batch: List[Dict], mode: str = "max") -> Dict:
    """Reduce per-batch stats: max over batches / summed histograms (the
    histograms share bin edges by construction — see make_calib_fn)."""
    merged = {}
    for stats in per_batch:
        for k, v in stats.items():
            if mode == "max":
                merged[k] = max(merged.get(k, 0.0), float(v))
            else:
                hist = np.asarray(v, np.float64)
                merged[k] = merged[k] + hist if k in merged else hist
    return merged


def _amax_percentile(hist: np.ndarray, edges: np.ndarray,
                     percentile: float) -> float:
    """pytorch-quantization _compute_amax_percentile, with one deliberate
    deviation: the reference returns edges[idx] (the LEFT edge of the bin
    where the cdf first reaches the percentile), which degenerates to
    amax=0.0 (a zero quant scale) when the first bin alone crosses the
    percentile. We return the bin's RIGHT edge — one bin wider (negligible
    at 2048 bins), never zero."""
    total = hist.sum()
    if total <= 0:
        return float(edges[-1])
    cdf = np.cumsum(hist) / total
    idx = int(np.searchsorted(cdf, percentile / 100.0))
    return float(edges[min(idx + 1, len(edges) - 1)])


def _amax_entropy(hist: np.ndarray, edges: np.ndarray, num_bits: int = 8,
                  stride: int = 1, start_bin: int = 128) -> float:
    """TensorRT-style KL-divergence amax search, matching
    pytorch-quantization calib.histogram._compute_amax_entropy: for each
    candidate clip bin i, quantize hist[:i] down to 2^(num_bits-1) levels
    (averaging counts within each level, zeros stay zero), fold the clipped
    tail into the last reference bin, and take the clip minimizing
    KL(reference || quantized). Last argmin wins (widest amax on ties)."""
    bins = hist.astype(np.float64).copy()
    if len(bins) < start_bin + 1:
        return float(edges[-1])
    bins[0] = bins[1]
    nlevels = 1 << (num_bits - 1)
    divergences = []
    for i in range(start_bin, len(bins) + 1, stride):
        space = np.linspace(0, i, num=nlevels + 1)
        digitized = np.digitize(np.arange(i), space) - 1
        digitized = np.where(bins[:i] == 0, -1, digitized)
        counts = np.zeros(nlevels)
        occup = np.zeros(nlevels)
        valid = digitized >= 0
        np.add.at(counts, digitized[valid], bins[:i][valid])
        np.add.at(occup, digitized[valid], 1.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            density_per_level = np.where(occup > 0, counts / occup, 0.0)
        q = np.where(valid, density_per_level[np.clip(digitized, 0, None)], 0.0)
        q_total = q.sum() + bins[i:].sum()
        p = bins[:i].copy()
        p[-1] += bins[i:].sum()
        p_total = p.sum()
        if q_total <= 0 or p_total <= 0:
            divergences.append(np.inf)
            continue
        p /= p_total
        q /= q_total
        mask = (p > 0) & (q > 0)
        kl = np.sum(p[mask] * np.log(p[mask] / q[mask]))
        # scipy.stats.entropy(p, q) is +inf when p>0 where q==0
        if np.any((p > 0) & (q <= 0)):
            kl = np.inf
        divergences.append(kl)
    div = np.asarray(divergences)
    last_argmin = len(div) - 1 - int(np.argmin(div[::-1]))
    return float(edges[min(last_argmin * stride + start_bin, len(edges) - 1)])


def _amax_mse(hist: np.ndarray, edges: np.ndarray, num_bits: int = 8,
              stride: int = 1, start_bin: int = 128) -> float:
    """pytorch-quantization _compute_amax_mse: scan candidate amax = bin
    center, fake-quant all bin centers against it, pick min Σ hist·err²."""
    centers = (edges[:-1] + edges[1:]) / 2.0
    qmax = 2.0 ** (num_bits - 1) - 1.0
    best_amax, best_err = float(edges[-1]), np.inf
    for i in range(start_bin, len(centers), stride):
        amax = centers[i]
        scale = amax / qmax
        q = np.clip(np.round(centers / scale), -qmax - 1, qmax) * scale
        err = float((hist * (centers - q) ** 2).sum())
        if err < best_err:
            best_err, best_amax = err, float(amax)
    return best_amax


def compute_amax(stats: Dict, method: str = "max", percentile: float = 99.99,
                 amax_by_path: Dict[str, float] | None = None,
                 num_bits: int = 8) -> Dict[str, float]:
    """Histogram→amax reduction matching pytorch-quantization's
    compute_amax methods (max / percentile / entropy / mse), the procedures
    the reference invokes at tools/qat/qat_utils.py:39-51."""
    if method == "max":
        return {k: float(v) for k, v in stats.items()}
    out = {}
    for k, hist in stats.items():
        top = max(amax_by_path[k], 1e-12)
        edges = np.linspace(0.0, top, HIST_BINS + 1)
        hist = np.asarray(hist, np.float64)
        if method == "percentile":
            out[k] = _amax_percentile(hist, edges, percentile)
        elif method == "entropy":
            out[k] = _amax_entropy(hist, edges, num_bits=num_bits)
        elif method == "mse":
            out[k] = _amax_mse(hist, edges, num_bits=num_bits)
        else:
            raise ValueError(method)
    return out


def calibrate(model, variables, batches, method: str = "max",
              percentile: float = 99.99,
              skip_substrings: Sequence[str] = DEFAULT_SKIP_SUBSTRINGS
              ) -> Dict[str, float]:
    """Full PTQ calibration: run batches, return per-conv input amax.

    Histogram methods are two-pass: pass 1 (max mode) finds each conv
    input's global amax; pass 2 histograms every batch into linear bins on
    [0, global_amax] so the cross-batch merge is exact."""
    calib_fn = make_calib_fn(model, variables, mode="max",
                             skip_substrings=skip_substrings)
    batches = [jnp.asarray(b) for b in batches]
    per_batch = [jax.device_get(calib_fn(b)) for b in batches]
    global_amax = merge_calib_stats(per_batch, mode="max")
    if method == "max":
        return global_amax
    hist_fn = make_calib_fn(model, variables, mode="histogram",
                            skip_substrings=skip_substrings,
                            amax_by_path=global_amax)
    per_batch = [jax.device_get(hist_fn(b)) for b in batches]
    merged = merge_calib_stats(per_batch, mode="histogram")
    return compute_amax(merged, method=method, percentile=percentile,
                        amax_by_path=global_amax)


# ---------------- quantized execution ----------------


def quantize_weights(params, num_bits: int = 8,
                     skip_substrings: Sequence[str] = DEFAULT_SKIP_SUBSTRINGS):
    """Per-output-channel fake-quant of every conv kernel (pure transform)."""

    def walk(tree, path=""):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            p = f"{path}/{k}" if path else str(k)
            if (k == "kernel" and hasattr(v, "ndim") and v.ndim >= 2
                    and not _skip(path, skip_substrings)):
                axes = tuple(range(v.ndim - 1))
                amax = jnp.max(jnp.abs(v.astype(jnp.float32)), axis=axes)
                out[k] = fake_quant(v.astype(jnp.float32), amax,
                                    num_bits).astype(v.dtype)
            else:
                out[k] = walk(v, p)
        return out

    return walk(params)


def quantized_apply(model, variables, x, amax_by_path: Dict[str, float],
                    num_bits: int = 8,
                    skip_substrings: Sequence[str] = DEFAULT_SKIP_SUBSTRINGS,
                    train: bool = False, **apply_kwargs):
    """Forward with per-conv input fake-quant (weights quantized separately
    via quantize_weights). Usable inside jit and inside a QAT loss."""

    def interceptor(next_fun, args, kwargs, context):
        if _is_quantizable(context):
            path = _module_path(context)
            if path in amax_by_path and not _skip(path, skip_substrings):
                a0 = fake_quant(
                    args[0].astype(jnp.float32),
                    jnp.asarray(amax_by_path[path], jnp.float32),
                    num_bits).astype(args[0].dtype)
                args = (a0,) + args[1:]
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        return model.apply(variables, x, train=train, **apply_kwargs)


def save_amax(amax: Dict[str, float], path: str):
    import json, os

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(amax, f, indent=1)


def load_amax(path: str) -> Dict[str, float]:
    import json

    with open(path) as f:
        return json.load(f)
