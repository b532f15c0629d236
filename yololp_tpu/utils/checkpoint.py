"""Checkpoint I/O (reference: yolov6/utils/checkpoint.py).

A checkpoint is a single msgpack file holding a dict:
  {'format': 'train'|'deploy', 'step': int, 'variables': {...},
   'ema': {...}|None, 'opt_state': {...}|None, 'meta': {...}}
Eval/infer prefer 'ema' over 'variables' like the reference (checkpoint.py:22),
and fold to deploy params via fuse_variables at load time.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from yololp_tpu.layers.fuse import fuse_variables


def _to_numpy(tree):
    def conv(x):
        if isinstance(x, (jax.Array, np.ndarray)):
            return np.asarray(x)
        return x  # python scalars / strings pass through msgpack natively

    return jax.tree_util.tree_map(conv, tree)


def save_checkpoint(ckpt: Dict[str, Any], path: str):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = serialization.msgpack_serialize(_to_numpy(ckpt))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)


def load_checkpoint_raw(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_inference_variables(path: str) -> Dict[str, Any]:
    """Load a checkpoint for inference: prefer EMA, fold to deploy params."""
    ckpt = load_checkpoint_raw(path)
    variables = ckpt.get("ema") or ckpt["variables"]
    if ckpt.get("format") == "deploy":
        return variables
    return fuse_variables(variables)


def save_best_copy(last_path: str, best_path: str):
    """Mirror the reference's best_ckpt.pt copy policy (checkpoint.py:35-43)."""
    shutil.copyfile(last_path, best_path)


def strip_checkpoint(path: str, out_path: Optional[str] = None):
    """End-of-training strip (checkpoint.py:46): replace model with EMA, drop
    optimizer state, mark finalized."""
    ckpt = load_checkpoint_raw(path)
    if ckpt.get("ema"):
        ckpt["variables"] = ckpt["ema"]
    ckpt["ema"] = None
    ckpt["opt_state"] = None
    save_checkpoint(ckpt, out_path or path)
