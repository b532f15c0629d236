"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's DDP stack (SURVEY.md §2.13).

The reference's parallelism is data-parallel only: NCCL process groups
(tools/train.py:105-110), DistributedSampler, per-rank batch slicing, loss
scaled by world_size so DDP's grad-mean becomes a sum (engine.py:161-162),
rank-0-only EMA/eval/ckpt. Here the equivalents are:

  * a 1-D 'data' Mesh over all chips (ICI within a slice, DCN across hosts),
  * batches sharded over 'data' with NamedSharding; TrainState replicated,
  * gradient reduction is implicit — XLA inserts the psum when the jitted
    train step consumes sharded batches and produces replicated state,
  * per-host data sharding (shard_dataset_indices) replaces the
    DistributedSampler,
  * process-0-only checkpoint/eval mirrors the rank-0 pattern.

Multi-host: call jax.distributed.initialize() per host before building the
mesh (initialize_distributed wraps the env plumbing).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """jax.distributed.initialize with env:// style defaults
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID), mirroring the
    reference's env-rendezvous (envs.py:12-17)."""
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator is None:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes or int(os.environ.get("NUM_PROCESSES", 1)),
        process_id=process_id or int(os.environ.get("PROCESS_ID", 0)))


def data_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over (up to) all global devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_spatial_mesh(n_data: int, n_spatial: int) -> Mesh:
    """2-D (data, spatial) mesh: batch sharded over 'data', the image height
    dim over 'spatial'. XLA's SPMD partitioner inserts the conv halo
    exchanges automatically — the giant-input scaling axis SURVEY.md §2.13
    proposes (the reference has no equivalent; it is DP-only)."""
    devices = np.asarray(jax.devices()[: n_data * n_spatial])
    return Mesh(devices.reshape(n_data, n_spatial), ("data", "spatial"))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) images: batch over 'data', height over 'spatial'."""
    return NamedSharding(mesh, P("data", "spatial"))


def shard_dataset_indices(n_items: int, shuffle_seed: int = 0,
                          epoch: int = 0) -> np.ndarray:
    """Per-host index shard (replaces DistributedSampler, data_load.py:65).
    Epoch-seeded shuffle mirrors sampler.set_epoch (engine.py:310)."""
    rng = np.random.default_rng(shuffle_seed + epoch)
    idxs = rng.permutation(n_items)
    return idxs[jax.process_index()::jax.process_count()]


def is_main_process() -> bool:
    return jax.process_index() == 0
