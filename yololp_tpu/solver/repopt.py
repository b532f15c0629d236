"""RepOpt (RepVGG-over-optimizer) as pure param-tree transforms + grad masks.

Behavioral reference: yolov6/utils/RepOptimizer.py. Two-stage flow
(docs/tutorial_repopt.md):
  1. hyper-search: train the CSLA net (LinearAddBlock, training_mode
     'hyper_search'); its per-branch scale vectors are the search result.
  2. repopt: train the plain single-conv net (RealVGGBlock, training_mode
     'repopt') whose conv kernels are (a) re-initialized as the
     scale-weighted sum of a fresh 3x3/1x1 (+identity) and (b) trained with
     per-weight GRADIENT MASKS: mask = scale_conv^2 everywhere, + scale_1x1^2
     at the 3x3 center, + 1 on the center diagonal when the identity branch
     exists (RepOptimizer.py:136-152). The result is an inference-style net
     that trains like the multi-branch one and quantizes cleanly.

Blocks are located purely by the params-tree naming contract:
LinearAddBlock = {conv, conv_1x1, scale_conv, scale_1x1 [, scale_identity],
bn}; RealVGGBlock = a child named 'cell' holding {conv, bn}. Pairing between
the CSLA tree and the repopt tree is by identical tree order (both nets are
built from the same config with only the block class swapped).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_CSLA_KEYS = {"conv", "conv_1x1", "scale_conv", "scale_1x1", "bn"}


def _walk(tree, path=()):
    if not isinstance(tree, dict):
        return
    keys = set(tree.keys())
    if _CSLA_KEYS <= keys:
        yield path, "csla", tree
        return
    if "cell" in keys and isinstance(tree["cell"], dict) \
            and "conv" in tree["cell"]:
        yield path, "realvgg", tree
        return
    for k in sorted(keys):
        yield from _walk(tree[k], path + (k,))


def extract_scales(csla_params: Dict) -> List[Tuple[np.ndarray, ...]]:
    """Scale triples/pairs from a trained hyper-search params tree, in tree
    order (RepOptimizer.extract_scales). Triple = (identity, 1x1, conv)."""
    scales = []
    for _, kind, node in _walk(csla_params):
        if kind != "csla":
            continue
        if "scale_identity" in node:
            scales.append((np.asarray(node["scale_identity"]["weight"]),
                           np.asarray(node["scale_1x1"]["weight"]),
                           np.asarray(node["scale_conv"]["weight"])))
        else:
            scales.append((np.asarray(node["scale_1x1"]["weight"]),
                           np.asarray(node["scale_conv"]["weight"])))
    return scales


def _realvgg_conv_paths(params: Dict) -> List[Tuple]:
    return [path + ("cell", "conv", "kernel")
            for path, kind, _ in _walk(params) if kind == "realvgg"]


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path, value):
    out = dict(tree)
    node = out
    for k in path[:-1]:
        node[k] = dict(node[k])
        node = node[k]
    node[path[-1]] = value
    return out


def reinitialize(params: Dict, scales: List[Tuple], rng_key,
                 use_identity_scales: bool = True) -> Dict:
    """Re-init each RealVGG 3x3 kernel as the CSLA-equivalent sum
    (RepOptimizer.reinitialize). Kernels are HWIO; scales are per-output."""
    paths = _realvgg_conv_paths(params)
    assert len(paths) == len(scales), (
        f"{len(paths)} RealVGG blocks vs {len(scales)} scale entries")
    keys = jax.random.split(rng_key, len(paths))
    for path, sc, key in zip(paths, scales, keys):
        k3 = jnp.asarray(_get(params, path), jnp.float32)
        in_ch, out_ch = k3.shape[2], k3.shape[3]
        # fresh 1x1 kernel, torch Conv2d default init: U(-b, b), b = 1/sqrt(fan_in)
        bound = 1.0 / np.sqrt(in_ch * 1 * 1)
        k1 = jax.random.uniform(key, (1, 1, in_ch, out_ch), jnp.float32,
                                -bound, bound)
        pad1 = jnp.pad(k1, ((1, 1), (1, 1), (0, 0), (0, 0)))
        if len(sc) == 2:
            new = k3 * jnp.asarray(sc[1]) + pad1 * jnp.asarray(sc[0])
        else:
            assert in_ch == out_ch
            new = k3 * jnp.asarray(sc[2]) + pad1 * jnp.asarray(sc[1])
            eye = jnp.zeros((3, 3, in_ch, out_ch), jnp.float32)
            eye = eye.at[1, 1, jnp.arange(in_ch), jnp.arange(out_ch)].set(1.0)
            if use_identity_scales:
                new = new + eye * jnp.asarray(sc[0])
            else:
                new = new + eye
        params = _set(params, path, new.astype(_get(params, path).dtype))
    return params


def gradient_masks(params: Dict, scales: Optional[List[Tuple]]) -> Dict:
    """Mask tree matching params: 1.0 everywhere except RealVGG 3x3 kernels
    (RepOptimizer.generate_gradient_masks)."""
    masks = jax.tree_util.tree_map(lambda x: jnp.ones((), x.dtype), params)
    if scales is None:
        return masks
    paths = _realvgg_conv_paths(params)
    assert len(paths) == len(scales)
    for path, sc in zip(paths, scales):
        k = _get(params, path)
        h, w, in_ch, out_ch = k.shape
        s_conv = jnp.asarray(sc[-1], jnp.float32)
        s_1x1 = jnp.asarray(sc[-2], jnp.float32)
        mask = jnp.ones(k.shape, jnp.float32) * (s_conv ** 2)
        mask = mask.at[1, 1].add(jnp.ones((in_ch, out_ch)) * (s_1x1 ** 2))
        if len(sc) == 3:
            assert in_ch == out_ch
            mask = mask.at[1, 1, jnp.arange(in_ch), jnp.arange(out_ch)].add(1.0)
        masks = _set(masks, path, mask)
    return masks


def save_scales(scales: List[Tuple], path: str):
    from flax import serialization

    payload = {"scales": [[np.asarray(s) for s in tup] for tup in scales]}
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_scales(path: str) -> List[Tuple]:
    """Load scales from a save_scales() file OR a hyper-search training
    checkpoint (extracting from its CSLA params, like RepOptimizer loading
    the scales ckpt, engine.py:67-70)."""
    from flax import serialization

    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if "scales" in payload:
        return [tuple(np.asarray(s) for s in (tup.values()
                if isinstance(tup, dict) else tup))
                for tup in payload["scales"]]
    variables = payload.get("ema") or payload["variables"]
    return extract_scales(variables["params"])
