"""Device-cache path: precompute == per-item loader output; the gathered
train step matches the plain train step bit-for-bit."""

import os
import os.path as osp

import numpy as np

import jax
import jax.numpy as jnp

import conftest  # noqa: F401
from yololp_tpu.core.train_step import init_train_state, make_train_step
from yololp_tpu.data.datasets import TrainValDataset
from yololp_tpu.data.device_cache import (
    DeviceCachedData,
    make_cached_epoch,
    make_cached_step,
    precompute_items,
)
from yololp_tpu.data.synthetic import make_synthetic_dataset
from yololp_tpu.losses.loss import LossConfig
from yololp_tpu.models import build_model
from yololp_tpu.solver.build import SolverConfig
from yololp_tpu.utils.config import Config

IMG = 64


def _dataset(tmp_path, n=6):
    root = str(tmp_path / "synth")
    make_synthetic_dataset(root, n_train=n, n_val=2, img_size=IMG, seed=0)
    return TrainValDataset(osp.join(root, "images", "train"), img_size=IMG,
                           augment=False, task="train")


def test_precompute_matches_items_and_memoizes(tmp_path):
    ds = _dataset(tmp_path)
    imgs, labels, masks = precompute_items(ds, verbose=False)
    assert imgs.shape == (len(ds), IMG, IMG, 3) and imgs.dtype == np.uint8
    for i in (0, len(ds) - 1):
        rgb, lbl, msk, _, _ = ds[i]
        np.testing.assert_array_equal(imgs[i], rgb)
        np.testing.assert_array_equal(labels[i], lbl)
        np.testing.assert_array_equal(masks[i], msk)
    # second call must hit the on-disk memo (images come back memmapped)
    imgs2, labels2, _ = precompute_items(ds, verbose=False)
    assert isinstance(imgs2, np.memmap)
    np.testing.assert_array_equal(np.asarray(imgs2), np.asarray(imgs))
    np.testing.assert_array_equal(labels2, labels)


def test_epoch_batches_cover_dataset_once(tmp_path):
    ds = _dataset(tmp_path)
    cache = DeviceCachedData(ds, seed=1)
    batches = list(cache.epoch_batches(batch_size=2, epoch=0))
    assert len(batches) == len(ds) // 2
    seen = np.concatenate(batches)
    assert sorted(seen.tolist()) == list(range(len(ds)))
    # a different epoch reshuffles
    batches2 = list(cache.epoch_batches(batch_size=2, epoch=1))
    assert not all(np.array_equal(a, b) for a, b in zip(batches, batches2))
    # permutation is a pure function of (seed, epoch): a resumed run replays
    # epoch k's order exactly, not epoch 0's
    cache2 = DeviceCachedData(ds, seed=1)
    for a, b in zip(batches2, cache2.epoch_batches(batch_size=2, epoch=1)):
        np.testing.assert_array_equal(a, b)


def test_cached_step_matches_plain_step(tmp_path):
    ds = _dataset(tmp_path, n=4)
    cache = DeviceCachedData(ds, seed=0)

    cfg = Config.named("yololpn")
    model, variables = build_model(cfg, img_size=(IMG, IMG))
    loss_cfg = LossConfig(img_size=(IMG, IMG), iou_type="siou")
    solver = SolverConfig(lr0=0.02, epochs=2, steps_per_epoch=2)
    step_fn = make_train_step(model, loss_cfg, solver, batch_size=2)

    assert cache.images.ndim == 2  # flat staging layout (N, H*W*3)
    idxs = np.asarray([2, 0], np.int32)
    state = init_train_state(variables)
    s1, total1, items1 = jax.jit(make_cached_step(step_fn, cache.img_shape))(
        state, cache.images, cache.labels, cache.masks, jnp.asarray(idxs))

    state = init_train_state(variables)
    s2, total2, items2 = jax.jit(step_fn)(
        state, jnp.asarray(cache.host_images[idxs]),
        jnp.asarray(cache.host_labels[idxs]),
        jnp.asarray(cache.host_masks[idxs]))

    assert float(total1) == float(total2)
    np.testing.assert_array_equal(np.asarray(items1), np.asarray(items2))
    leaves1 = jax.tree_util.tree_leaves(s1.params)
    leaves2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # whole-epoch scan == the same steps applied sequentially
    idx_mat = np.asarray([[2, 0], [1, 3]], np.int32)
    state = init_train_state(variables)
    se, items_sum = jax.jit(make_cached_epoch(step_fn, cache.img_shape))(
        state, cache.images, cache.labels, cache.masks, jnp.asarray(idx_mat))

    state = init_train_state(variables)
    step_j = jax.jit(make_cached_step(step_fn, cache.img_shape))
    acc = None
    for row in idx_mat:
        state, _total, items = step_j(state, cache.images, cache.labels,
                                      cache.masks, jnp.asarray(row))
        acc = items if acc is None else acc + items
    np.testing.assert_allclose(np.asarray(items_sum), np.asarray(acc),
                               rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(se.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    assert int(se.step) == 2


def test_precompute_invalidates_on_content_change(tmp_path):
    """Regenerating a dataset IN PLACE (same count, new pixels/labels) must
    not serve stale cached arrays (memo keyed by content fingerprint)."""
    import time

    root = str(tmp_path / "synth")
    make_synthetic_dataset(root, n_train=4, n_val=2, img_size=IMG, seed=0)
    ds = TrainValDataset(osp.join(root, "images", "train"), img_size=IMG,
                         augment=False, task="train")
    imgs0, _, _ = precompute_items(ds, verbose=False)
    imgs0 = np.asarray(imgs0).copy()
    time.sleep(0.01)  # ensure distinct mtimes
    make_synthetic_dataset(root, n_train=4, n_val=2, img_size=IMG, seed=7)
    # label cache is keyed by (paths, label size+mtime): no manual removal
    ds2 = TrainValDataset(osp.join(root, "images", "train"), img_size=IMG,
                          augment=False, task="train")
    imgs1, _, _ = precompute_items(ds2, verbose=False)
    assert not np.array_equal(imgs0, np.asarray(imgs1))
    rgb, _, _, _, _ = ds2[0]
    np.testing.assert_array_equal(np.asarray(imgs1[0]), rgb)


def test_cached_epoch_sharded_matches_unsharded(tmp_path):
    """The mesh path (dataset replicated, batch gather constrained to the
    data axis) must compute exactly the unsharded result."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    ds = _dataset(tmp_path, n=4)
    cfg = Config.named("yololpn")
    model, variables = build_model(cfg, img_size=(IMG, IMG))
    loss_cfg = LossConfig(img_size=(IMG, IMG), iou_type="siou")
    solver = SolverConfig(lr0=0.02, epochs=2, steps_per_epoch=2)
    step_fn = make_train_step(model, loss_cfg, solver, batch_size=2)
    idx_mat = np.asarray([[2, 0], [1, 3]], np.int32)

    cache = DeviceCachedData(ds, seed=0)
    state = init_train_state(variables)
    s_ref, items_ref = jax.jit(make_cached_epoch(step_fn, cache.img_shape))(
        state, cache.images, cache.labels, cache.masks, jnp.asarray(idx_mat))

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("data",))
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    cache_sh = DeviceCachedData(ds, seed=0, sharding=repl)
    state = jax.device_put(init_train_state(variables), repl)
    s_sh, items_sh = jax.jit(
        make_cached_epoch(step_fn, cache_sh.img_shape, data_sh))(
        state, cache_sh.images, cache_sh.labels, cache_sh.masks,
        jnp.asarray(idx_mat))

    np.testing.assert_allclose(np.asarray(items_sh), np.asarray(items_ref),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_sh.params),
                    jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_multi_epoch_matches_sequential_epochs(tmp_path):
    """K chunked epochs in one dispatch (make_cached_multi_epoch) == K
    sequential make_cached_epoch dispatches: same final params, same
    per-epoch loss-item sums."""
    from yololp_tpu.data.device_cache import make_cached_multi_epoch

    ds = _dataset(tmp_path, n=4)
    cache = DeviceCachedData(ds, seed=0)
    cfg = Config.named("yololpn")
    model, variables = build_model(cfg, img_size=(IMG, IMG))
    loss_cfg = LossConfig(img_size=(IMG, IMG), iou_type="siou")
    solver = SolverConfig(lr0=0.02, epochs=4, steps_per_epoch=2)
    step_fn = make_train_step(model, loss_cfg, solver, batch_size=2)

    mats = np.stack([
        cache.epoch_index_matrix(batch_size=2, epoch=e) for e in range(2)])

    state = init_train_state(variables)
    s_multi, items_multi = jax.jit(
        make_cached_multi_epoch(step_fn, cache.img_shape))(
        state, cache.images, cache.labels, cache.masks, jnp.asarray(mats))
    assert items_multi.shape[0] == 2

    state = init_train_state(variables)
    epoch_j = jax.jit(make_cached_epoch(step_fn, cache.img_shape))
    per_epoch = []
    for e in range(2):
        state, items = epoch_j(state, cache.images, cache.labels,
                               cache.masks, jnp.asarray(mats[e]))
        per_epoch.append(np.asarray(items))

    np.testing.assert_allclose(np.asarray(items_multi), np.stack(per_epoch),
                               rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_multi.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    assert int(s_multi.step) == 4
