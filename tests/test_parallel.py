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


def test_spatial_sharding_forward():
    """2x4 (data, spatial) mesh: conv halos handled by the SPMD partitioner."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from yololp_tpu.models import Model, build_model
    from yololp_tpu.parallel.mesh import data_spatial_mesh, image_sharding
    from yololp_tpu.utils.config import Config

    cfg = Config.named("yololpn")
    model, variables = build_model(cfg, img_size=(128, 128))
    mesh = data_spatial_mesh(2, 4)
    repl = NamedSharding(mesh, P())
    variables = jax.device_put(variables, repl)

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False),
                  in_shardings=(repl, image_sharding(mesh)),
                  out_shardings=repl)
    x = jax.device_put(np.zeros((2, 128, 128, 3), np.float32),
                       image_sharding(mesh))
    y = jax.block_until_ready(fwd(variables, x))
    a = sum((128 // s) ** 2 for s in (8, 16, 32))
    assert y.shape == (2, a, 290)
    # numerics must match the unsharded forward (halo exchange correctness)
    y_ref = model.apply(jax.device_get(variables), jnp.zeros((2, 128, 128, 3)),
                        train=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
