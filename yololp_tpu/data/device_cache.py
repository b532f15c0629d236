"""HBM-resident dataset cache: train batches gathered on-device by index.

TPU-first input pipeline for synthetic / fixed-size datasets: the whole
dataset (uint8 images + padded labels + masks) is staged into device HBM
once, and each training step receives only a (B,) int32 index vector from
the host — the batch gather happens INSIDE the jitted train step, so
per-step host->device traffic is ~128 bytes instead of tens of MB. This
removes the host decode + PCIe/tunnel transfer bottleneck entirely (the
reference instead scales torch DataLoader workers with host cores,
yolov6/data/data_load.py:14-63 — a host-bound design this sandbox's 1-CPU
host cannot drive at TPU speed).

Preprocessing (decode + letterbox + label normalization) runs once and is
memoized on disk next to the images (.npy memmaps keyed by size/count), so
repeated runs over the same dataset start in seconds.

Only valid for the deterministic no-augmentation protocol (the synthetic
accuracy runs, configs/experiment/*): geometric/color augmentation would
have to be re-applied per epoch, which is exactly the host work this path
exists to avoid. The Trainer asserts augs are off before enabling it.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Optional, Tuple

import numpy as np


def _content_fingerprint(dataset) -> str:
    """Cheap dataset-content key: per-file (name, size, mtime) of every image
    plus the parsed labels. Keying the memo on count/size alone would let a
    dataset regenerated IN PLACE (same file count, new pixels/labels) silently
    train on stale cached arrays."""
    import hashlib

    h = hashlib.md5()
    for p in dataset.img_paths:
        st = os.stat(p)
        h.update(f"{osp.basename(p)}:{st.st_size}:{st.st_mtime_ns}".encode())
    for lbl in dataset.labels:
        h.update(np.ascontiguousarray(lbl, np.float32).tobytes())
    return h.hexdigest()[:12]


def _cache_paths(img_dir: str, img_size: int, n: int, max_boxes: int,
                 fingerprint: str = ""):
    tag = f"devcache_{img_size}_{n}_{max_boxes}"
    if fingerprint:
        tag += f"_{fingerprint}"
    return {k: osp.join(img_dir, f".{tag}.{k}.npy")
            for k in ("images", "labels", "masks")}


def precompute_items(dataset, verbose: bool = True
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Run the deterministic val-protocol item path (letterbox + normalize +
    pad) over the whole dataset; returns host arrays
    (N, S, S, 3) u8 / (N, M, 20) f32 / (N, M) f32. Disk-memoized."""
    assert not dataset.augment, "device cache requires augment=False"
    n = len(dataset)
    s = dataset.img_size
    m = dataset.max_boxes
    paths = _cache_paths(dataset.img_dir, s, n, m,
                         _content_fingerprint(dataset))
    if all(osp.isfile(p) for p in paths.values()):
        return (np.load(paths["images"], mmap_mode="r"),
                np.load(paths["labels"]), np.load(paths["masks"]))

    # an in-place dataset regeneration changes the fingerprint — drop the
    # previous generation's multi-GB memos for this shape key instead of
    # letting them accumulate next to the images
    import glob as _glob
    stale = set(_glob.glob(osp.join(
        dataset.img_dir, f".devcache_{s}_{n}_{m}_*.npy"))) - set(paths.values())
    for p in stale:
        try:
            os.remove(p)
        except OSError:
            pass

    # pid-unique tmp names + atomic replace: concurrent precomputes (e.g.
    # several multi-host processes sharing one filesystem) each write their
    # own tmp and the identical final content, so last-rename wins safely
    tmp = f".tmp.{os.getpid()}"
    images = np.lib.format.open_memmap(
        paths["images"] + tmp, mode="w+", dtype=np.uint8, shape=(n, s, s, 3))
    labels = np.empty((n, m, 20), np.float32)
    masks = np.empty((n, m), np.float32)
    for i in range(n):
        rgb, lbl, msk, _path, _shapes = dataset[i]
        images[i] = rgb
        labels[i] = lbl
        masks[i] = msk
        if verbose and (i + 1) % 2000 == 0:
            print(f"device-cache precompute: {i + 1}/{n}", flush=True)
    images.flush()
    np.save(paths["labels"] + tmp, labels)
    np.save(paths["masks"] + tmp, masks)
    for k in ("labels", "masks"):
        # np.save appends .npy to names without the suffix
        os.replace(paths[k] + tmp + ".npy", paths[k])
    os.replace(paths["images"] + tmp, paths["images"])
    return np.load(paths["images"], mmap_mode="r"), labels, masks


def put_replicated(sharding):
    """Host-array -> device placement honoring `sharding` (None: default
    device). Uses make_array_from_callback, which — unlike device_put —
    accepts shardings spanning non-addressable devices, so the same code
    stages the dataset on a single chip, a single-host mesh, or a global
    multi-host mesh (each process feeds only its local shards; for the
    replicated specs used here every process passes identical data)."""
    import jax

    if sharding is None:
        return jax.device_put
    return lambda a: jax.make_array_from_callback(
        a.shape, sharding, lambda idx: a[idx])


class DeviceCachedData:
    """Stages the dataset into HBM; `host_images` stays available (memmap)
    for visualization without a device read-back."""

    def __init__(self, dataset, seed: int = 0, sharding=None):
        import jax

        self.host_images, self.host_labels, self.host_masks = \
            precompute_items(dataset)
        host_labels, host_masks = self.host_labels, self.host_masks
        self.n = len(self.host_images)
        self.img_shape = self.host_images.shape[1:]  # (H, W, 3)
        put = put_replicated(sharding)
        # stage images FLAT (N, H*W*3): gathering a 4-D uint8 array makes
        # XLA insert a whole-array layout copy inside the program (observed:
        # +7.4GB HBM -> OOM); the 2-D tiled layout is gather-native
        self.images = put(self.host_images.reshape(self.n, -1))
        self.labels = put(host_labels)
        self.masks = put(host_masks)
        self.seed = seed

    def _perm(self, epoch: int) -> np.ndarray:
        # permutation is a pure function of (seed, epoch) so a resumed run
        # (start_epoch=k) sees exactly the shuffle order the original run
        # would have at epoch k — a stateful generator would replay the
        # sequence from index 0 on every process start
        return np.random.default_rng((self.seed, epoch)).permutation(self.n)

    def epoch_batches(self, batch_size: int, epoch: int = 0):
        """Yields (B,) int32 index arrays, one per step; drops the tail."""
        perm = self._perm(epoch)
        for b0 in range(0, self.n - batch_size + 1, batch_size):
            yield perm[b0:b0 + batch_size].astype(np.int32)

    def epoch_index_matrix(self, batch_size: int, epoch: int = 0) -> np.ndarray:
        """One epoch's shuffled batch indices as an (S, B) int32 matrix —
        the only per-epoch host->device transfer in the scan path."""
        s = self.steps_per_epoch(batch_size)
        perm = self._perm(epoch)[: s * batch_size]
        return perm.reshape(s, batch_size).astype(np.int32)

    def steps_per_epoch(self, batch_size: int) -> int:
        return self.n // batch_size


def make_cached_step(step_fn, img_shape, batch_sharding=None):
    """Wrap train_step so the batch gather happens inside jit:
    cached_step(state, images_all, labels_all, masks_all, idxs).
    images_all is the FLAT (N, H*W*3) staging layout; img_shape=(H, W, C)
    restores the batch to NHWC after the gather.

    batch_sharding: optional NamedSharding(P('data')) — with the dataset
    staged REPLICATED on every device of a mesh, constraining the gathered
    batch to the data axis makes each device gather only its local slice,
    so the cached path data-parallelizes over a single-host mesh with no
    cross-device traffic."""
    import jax

    def cached_step(state, images_all, labels_all, masks_all, idxs):
        images = images_all[idxs].reshape((idxs.shape[0],) + tuple(img_shape))
        labels, masks = labels_all[idxs], masks_all[idxs]
        if batch_sharding is not None:
            images = jax.lax.with_sharding_constraint(images, batch_sharding)
            labels = jax.lax.with_sharding_constraint(labels, batch_sharding)
            masks = jax.lax.with_sharding_constraint(masks, batch_sharding)
        return step_fn(state, images, labels, masks)

    return cached_step


def make_cached_epoch(step_fn, img_shape, batch_sharding=None):
    """A WHOLE training epoch as one XLA program: lax.scan of the train
    step over an (S, B) index matrix, gathering each batch from the
    HBM-resident dataset. One host dispatch + one 7-float readback per
    epoch — per-step Python dispatch over a remote-TPU tunnel costs more
    than the step itself (measured ~60ms/step vs ~18ms compute).

    epoch_fn(state, images_all, labels_all, masks_all, idx_mat)
      -> (state, loss_items_sum)
    """
    import jax
    import jax.numpy as jnp

    cached_step = make_cached_step(step_fn, img_shape, batch_sharding)

    def epoch_fn(state, images_all, labels_all, masks_all, idx_mat):
        def body(st, idxs):
            st, _total, items = cached_step(
                st, images_all, labels_all, masks_all, idxs)
            return st, items

        state, items_all = jax.lax.scan(body, state, idx_mat)
        return state, jnp.sum(items_all, axis=0)

    return epoch_fn


def make_cached_multi_epoch(step_fn, img_shape, batch_sharding=None):
    """K consecutive training epochs as ONE XLA program: lax.scan of the
    train step over a (K, S, B) index tensor (K stacked shuffled epochs).
    The per-epoch host turnaround (dispatch + items readback + Python
    bookkeeping, ~25s/epoch measured over the remote-TPU tunnel in the r3
    flagship run vs ~7s of device compute) is paid once per K epochs
    instead of once per epoch. The math is identical to K sequential
    make_cached_epoch dispatches: the LR/EMA schedules depend only on
    state.step, which advances inside the step.

    multi_epoch_fn(state, images_all, labels_all, masks_all, idx_mats)
      -> (state, per-epoch loss_items sums (K, n_items))

    Retraces per distinct K; callers should keep K constant across chunks
    (e.g. the eval interval) so it compiles once.
    """
    import jax
    import jax.numpy as jnp

    cached_step = make_cached_step(step_fn, img_shape, batch_sharding)

    def multi_epoch_fn(state, images_all, labels_all, masks_all, idx_mats):
        k, s, b = idx_mats.shape

        def body(st, idxs):
            st, _total, items = cached_step(
                st, images_all, labels_all, masks_all, idxs)
            return st, items

        state, items_all = jax.lax.scan(body, state,
                                        idx_mats.reshape(k * s, b))
        return state, jnp.sum(items_all.reshape((k, s) + items_all.shape[1:]),
                              axis=1)

    return multi_epoch_fn
