"""yololp-tpu: TPU-native (JAX/XLA/Pallas/pjit) license-plate detection framework.

A from-scratch rebuild of the capabilities of KyleHuang9/YOLO-LP (a keypoint-based
Chinese license-plate detector + end-to-end plate-string recognizer forked from
Meituan YOLOv6): one anchor-free network predicts, per anchor point, a bounding box,
the 4 plate corner keypoints, and the full 8-slot plate string
(province + alphabet + 6 characters).

Design is TPU-first:
  * NHWC layout, bf16 compute on the MXU, fp32 params.
  * RepVGG structural reparameterization and conv+BN folding are pure functional
    transforms over the param pytree applied at checkpoint-load/trace time.
  * Decode + confidence filtering + NMS are fixed-shape and run on device.
  * ATSS label assignment is a fixed-shape jit-able jnp program (no host syncs,
    no OOM/CPU fallback path).
  * Scaling is a jax.sharding Mesh + jit/shard_map data-parallel step (the
    reference's only parallelism axis is DDP; see SURVEY.md §2.13).
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: first compile of the full model over the
# tunneled TPU costs 2-10 minutes; every CLI/bench process retraces the same
# fixed-shape programs, so a disk cache turns all but the first process's
# compile into a fast deserialize. Opt out / redirect with the standard
# JAX_COMPILATION_CACHE_DIR env var.
import os as _os

if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    try:
        import jax as _jax

        _cache_dir = _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            ".cache", "jax")
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        pass
del _os
