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
# the sensitive head layers from the config list)
DEFAULT_SKIP_SUBSTRINGS: Tuple[str, ...] = ("proj_conv",)


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
                  skip_substrings: Sequence[str] = DEFAULT_SKIP_SUBSTRINGS):
    """Returns a jitted fn(images_u8) -> stats dict. mode 'max': per-conv
    input amax; mode 'histogram': (amax_seen, histogram over log-spaced
    bins in [amax*2^-20, amax])."""

    def forward(x):
        captured: Dict[str, jnp.ndarray] = {}

        def interceptor(next_fun, args, kwargs, context):
            if _is_quantizable(context):
                path = _module_path(context)
                if not _skip(path, skip_substrings):
                    a = jnp.abs(args[0].astype(jnp.float32))
                    amax = jnp.max(a)
                    if mode == "max":
                        captured[path] = amax
                    else:
                        # fixed log2-spaced histogram relative to batch amax
                        log_a = jnp.log2(jnp.maximum(a, 1e-12))
                        log_max = jnp.log2(jnp.maximum(amax, 1e-12))
                        edges0 = log_max - 20.0
                        idx = jnp.clip(((log_a - edges0) / 20.0 * HIST_BINS)
                                       .astype(jnp.int32), 0, HIST_BINS - 1)
                        hist = jnp.zeros(HIST_BINS, jnp.float32).at[
                            idx.reshape(-1)].add(1.0)
                        captured[path] = (amax, hist)
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
    """Reduce per-batch stats: max over batches (and summed histograms)."""
    merged = {}
    for stats in per_batch:
        for k, v in stats.items():
            if mode == "max":
                v = float(v)
                merged[k] = max(merged.get(k, 0.0), v)
            else:
                amax, hist = float(v[0]), np.asarray(v[1])
                if k in merged:
                    pa, ph = merged[k]
                    merged[k] = (max(pa, amax), ph + hist)
                else:
                    merged[k] = (amax, hist)
    return merged


def compute_amax(stats: Dict, method: str = "max",
                 percentile: float = 99.99) -> Dict[str, float]:
    """Histogram amax reduction (reference compute_amax: max / percentile /
    entropy / mse over pytorch-quantization histograms)."""
    if method == "max":
        return {k: (v if isinstance(v, float) else float(v[0]))
                for k, v in stats.items()}
    out = {}
    for k, (amax_seen, hist) in stats.items():
        centers = amax_seen * np.exp2(
            (np.arange(HIST_BINS) + 0.5) / HIST_BINS * 20.0 - 20.0)
        if method == "percentile":
            cdf = np.cumsum(hist) / max(hist.sum(), 1)
            idx = int(np.searchsorted(cdf, percentile / 100.0))
            out[k] = float(centers[min(idx, HIST_BINS - 1)])
        elif method in ("entropy", "mse"):
            # scan candidate clip points, pick min quantization error
            best, best_err = amax_seen, np.inf
            probs = hist / max(hist.sum(), 1)
            for frac in np.linspace(0.25, 1.0, 16):
                clip = amax_seen * frac
                q = np.clip(centers, 0, clip)
                levels = np.round(q / clip * 127) / 127 * clip
                err = (probs * (centers - np.minimum(centers, levels)) ** 2).sum() \
                    if method == "mse" else \
                    (probs * np.abs(np.minimum(centers, clip) - levels)).sum() \
                    + probs[centers > clip].sum() * clip * 0.1
                if err < best_err:
                    best, best_err = clip, err
            out[k] = float(best)
        else:
            raise ValueError(method)
    return out


def calibrate(model, variables, batches, method: str = "max",
              percentile: float = 99.99,
              skip_substrings: Sequence[str] = DEFAULT_SKIP_SUBSTRINGS
              ) -> Dict[str, float]:
    """Full PTQ calibration: run batches, return per-conv input amax."""
    mode = "max" if method == "max" else "histogram"
    calib_fn = make_calib_fn(model, variables, mode=mode,
                             skip_substrings=skip_substrings)
    per_batch = [jax.device_get(calib_fn(jnp.asarray(b))) for b in batches]
    merged = merge_calib_stats(per_batch, mode=mode)
    return compute_amax(merged, method="max" if method == "max" else method,
                        percentile=percentile)


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
