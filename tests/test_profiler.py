"""Unit tests for the trusted timing protocol helpers (utils/profiler).

These run on the CPU test backend where block_until_ready IS a real
barrier — the tests pin the protocol mechanics (value-fetch reduction,
pytree-aware operand rolling, K->2K scaling guard), not tunnel behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from yololp_tpu.utils.profiler import (_fresh_rolled, timed_scan,
                                       timed_scan_delta2)


def _make_matmul_scan(k):
    def run(x0, w):
        def body(x, _):
            return jnp.tanh(x @ w), ()
        return lax.scan(body, x0, None, length=k)[0]
    return run


def test_timed_scan_returns_positive_per_iter():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((128, 128)),
                    jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).standard_normal((128, 128))
                    * 0.1, jnp.float32)
    dt = timed_scan(_make_matmul_scan(4), 4, x, w)
    assert dt > 0


def test_delta2_scales_and_guards():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((256, 256)),
                    jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).standard_normal((256, 256))
                    * 0.1, jnp.float32)
    dt = timed_scan_delta2(_make_matmul_scan, 8, x, w, repeats=2)
    assert dt > 0

    # a make_fn whose cost does NOT scale with K must trip the guard.
    # Walls of the two identical-cost programs differ only by host noise,
    # so under a loaded CI host one attempt can spuriously exceed the 5%
    # scaling threshold — retry a few times; a real regression (the guard
    # gone) never raises on any attempt.
    def constant_cost(k):
        return _make_matmul_scan(8)  # ignores k

    for attempt in range(3):
        try:
            timed_scan_delta2(constant_cost, 8, x, w, repeats=3)
        except RuntimeError as e:
            assert "did not scale" in str(e)
            break
    else:
        pytest.fail("K->2K scaling guard never tripped in 3 attempts")


def test_fresh_rolled_changes_contents_not_structure():
    x = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
    scalar = jnp.float32(3.0)
    tree = {"a": scalar, "b": x}
    (r_tree, r_scalar) = _fresh_rolled((tree, scalar), 1)
    assert r_scalar == scalar
    assert r_tree["a"] == tree["a"]
    # first array leaf rolled along axis 0
    np.testing.assert_array_equal(np.asarray(r_tree["b"]),
                                  np.roll(np.asarray(x), 1, axis=0))


def test_fresh_rolled_no_arrays_is_identity():
    op = (jnp.float32(1.0), 2)
    assert _fresh_rolled(op, 3) == op
