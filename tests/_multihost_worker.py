"""Worker process for the 2-process jax.distributed CPU test.

Each process owns 1 virtual CPU device (xla_force_host_platform_device_count)
and contributes its local half of an 8-image global batch via
jax.make_array_from_process_local_data — exactly the multi-host path
tools/train.py + core/engine.py use (reference: DDP per-rank batches,
yolov6/core/engine.py:365). Rank 0 prints per-step losses for comparison
against a single-process run on the same global batch.

Usage: python _multihost_worker.py <coordinator> <num_procs> <proc_id> \
           [devs_per_proc] [dataset_dir]

devs_per_proc > 1 gives each process several virtual local devices, so the
global mesh SPANS processes with multiple local shards per process — the
v5e-pod topology (multiple chips per host, DCN across hosts) rather than
the 1-chip-per-host degenerate case.
"""

import os
import sys

if __name__ == "__main__":
    # Worker-process env setup: must happen before jax import. Guarded so
    # that IMPORTING this module for its helpers (test_multihost.py does)
    # never mutates the importer's os.environ — an inherited
    # device_count=1 would poison every later subprocess that builds a
    # virtual CPU mesh (this bit tests/test_parallel.py once).
    os.environ["JAX_PLATFORMS"] = "cpu"
    _devs = sys.argv[4] if len(sys.argv) > 4 else "1"
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    os.environ["XLA_FLAGS"] = " ".join(
        flags + [f"--xla_force_host_platform_device_count={_devs}"])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def make_fixed_batch(global_batch: int, img: int):
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (global_batch, img, img, 3), np.uint8)
    labels = np.zeros((global_batch, 4, 20), np.float32)
    labels[..., :8] = -1
    mask = np.zeros((global_batch, 4), np.float32)
    for b in range(global_batch):
        labels[b, 0, :8] = [1, 2, 3, 4, 5, 6, 7, 36]
        labels[b, 0, 8:12] = [0.5, 0.5, 0.4, 0.2]
        labels[b, 0, 12:20] = [0.3, 0.4, 0.3, 0.6, 0.7, 0.6, 0.7, 0.4]
        mask[b, 0] = 1
    return images, labels, mask


def run_steps(mesh, images, labels, mask, n_steps: int = 3,
              multihost: bool = False):
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from yololp_tpu.core.train_step import init_train_state, make_train_step
    from yololp_tpu.losses.loss import LossConfig
    from yololp_tpu.models import build_model
    from yololp_tpu.solver.build import SolverConfig
    from yololp_tpu.utils.config import Config

    img = images.shape[1]
    batch = images.shape[0] * (jax.process_count() if multihost else 1)
    cfg = Config.named("yololpn")
    _, variables = build_model(cfg, img_size=(img, img), seed=0)
    state = init_train_state(variables)
    loss_cfg = LossConfig(img_size=(img, img), iou_type="siou")
    solver_cfg = SolverConfig(epochs=2, steps_per_epoch=n_steps)
    step_fn = make_train_step(_build_model_obj(cfg), loss_cfg, solver_cfg,
                              batch_size=batch)

    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    step = jax.jit(step_fn, in_shardings=(repl, data_sh, data_sh, data_sh),
                   out_shardings=(repl, repl, repl))

    def to_dev(arr):
        if multihost:
            return jax.make_array_from_process_local_data(data_sh, arr)
        return jax.device_put(arr, data_sh)

    state = jax.device_put(state, repl)
    losses = []
    for i in range(n_steps):
        im, lb, mk = to_dev(images), to_dev(labels), to_dev(mask)
        if i == 0 and multihost:
            step.lower(state, im, lb, mk).compile()
            barrier("train_step_compiled")
        state, total, _ = step(state, im, lb, mk)
        losses.append(float(jax.device_get(total)))
    return losses


def _build_model_obj(cfg):
    from yololp_tpu.models import Model

    return Model(config=cfg, deploy=False)


def barrier(name: str, timeout_ms: int = 900_000):
    """Coordination-service barrier (NOT a gloo collective).

    XLA's gloo KV-store rendezvous has a hardcoded 30s deadline, so any
    cross-process collective whose gloo context is created right after a
    long, scheduler-skewed local compile can die with DEADLINE_EXCEEDED on
    a contended 1-CPU host. The fix pattern: AOT-compile, hold everyone
    here (gRPC barrier, our own generous timeout), then execute — gloo
    context creation happens with ~zero skew."""
    client = jax._src.distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)


def run_cached_epochs(mesh, dataset_dir: str, n_epochs: int = 2,
                      batch: int = 4):
    """The --cache-device core path on a (possibly multi-process) mesh:
    dataset staged REPLICATED on every device, whole-epoch lax.scan with the
    batch gather sharded over 'data'. Every process computes the identical
    (seed, epoch)-derived index matrix, so the losses must match a
    single-process run exactly (core/engine.py multi-host cached path)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from yololp_tpu.core.train_step import init_train_state, make_train_step
    from yololp_tpu.data.datasets import TrainValDataset
    from yololp_tpu.data.device_cache import (DeviceCachedData,
                                              make_cached_epoch,
                                              put_replicated)
    from yololp_tpu.losses.loss import LossConfig
    from yololp_tpu.models import build_model
    from yololp_tpu.solver.build import SolverConfig
    from yololp_tpu.utils.config import Config

    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    ds = TrainValDataset(dataset_dir, img_size=64, augment=False,
                         task="train")
    cache = DeviceCachedData(ds, seed=3, sharding=repl)

    cfg = Config.named("yololpn")
    _, variables = build_model(cfg, img_size=(64, 64), seed=0)
    state = jax.device_put(init_train_state(variables), repl)
    loss_cfg = LossConfig(img_size=(64, 64), iou_type="siou")
    steps = cache.steps_per_epoch(batch)
    solver_cfg = SolverConfig(epochs=n_epochs, steps_per_epoch=steps)
    step_fn = make_train_step(_build_model_obj(cfg), loss_cfg, solver_cfg,
                              batch_size=batch)
    epoch_fn = jax.jit(make_cached_epoch(step_fn, cache.img_shape, data_sh))

    multihost = jax.process_count() > 1
    sums = []
    for epoch in range(n_epochs):
        idx = put_replicated(repl)(cache.epoch_index_matrix(batch, epoch))
        if epoch == 0 and multihost:
            epoch_fn.lower(state, cache.images, cache.labels, cache.masks,
                           idx).compile()
            barrier("cached_epoch_compiled")
        state, items = epoch_fn(state, cache.images, cache.labels,
                                cache.masks, idx)
        sums.append(np.asarray(jax.device_get(items)))
    return np.stack(sums)


def main():
    coordinator, num_procs, proc_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
    devs_per_proc = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    dataset_dir = sys.argv[5] if len(sys.argv) > 5 else None
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_procs, process_id=proc_id)
    assert jax.process_count() == num_procs
    assert len(jax.local_devices()) == devs_per_proc, len(jax.local_devices())
    assert len(jax.devices()) == num_procs * devs_per_proc, len(jax.devices())

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    # Warm-up collective while both processes are still in lockstep: the
    # gloo context for the all-device group is created with ~0 skew here.
    # Without it, the FIRST real collective fires only after minutes of
    # per-process jit compilation, and on a contended 1-CPU host the
    # processes can arrive >30s apart — past XLA's hardcoded gloo KV-store
    # deadline (GetKeyValue ... 30s), killing the run.
    data_sh = NamedSharding(mesh, P("data"))
    warm = jax.jit(lambda x: x.sum(), in_shardings=data_sh,
                   out_shardings=NamedSharding(mesh, P()))
    x = jax.make_array_from_process_local_data(
        data_sh, np.ones(devs_per_proc, np.float32),
        (num_procs * devs_per_proc,))
    np.testing.assert_allclose(jax.device_get(warm(x)),
                               num_procs * devs_per_proc)
    if dataset_dir:  # --cache-device core-path mode
        sums = run_cached_epochs(mesh, dataset_dir)
        if proc_id == 0:
            print("CACHED " + " ".join(f"{v:.6f}" for v in sums.ravel()))
        return
    img, global_batch = 64, 8
    images, labels, mask = make_fixed_batch(global_batch, img)
    lo = proc_id * (global_batch // num_procs)
    hi = lo + global_batch // num_procs
    losses = run_steps(mesh, images[lo:hi], labels[lo:hi], mask[lo:hi],
                       multihost=True)
    if proc_id == 0:
        print("LOSSES " + " ".join(f"{v:.6f}" for v in losses))


if __name__ == "__main__":
    main()
