"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np

import conftest  # noqa: F401  (forces 8-device CPU backend)
import jax

import __graft_entry__ as graft
from yololp_tpu.parallel.mesh import data_mesh, shard_dataset_indices


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_dryrun_multichip_full_train_step():
    graft.dryrun_multichip(8)


def test_entry_forward():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 8400, 290)


def test_mesh_and_index_sharding():
    mesh = data_mesh(4)
    assert mesh.shape == {"data": 4}
    idxs = shard_dataset_indices(100, shuffle_seed=1, epoch=0)
    assert len(idxs) == 100  # single process: full shard
    idxs2 = shard_dataset_indices(100, shuffle_seed=1, epoch=1)
    assert not np.array_equal(idxs, idxs2)  # epoch reshuffle
