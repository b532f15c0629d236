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
