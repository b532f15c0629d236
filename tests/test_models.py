"""Model-zoo smoke + structure tests (shapes, param counts, fusion, decode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yololp_tpu.layers import fuse_variables
from yololp_tpu.models import Model, build_model, scaled_lists
from yololp_tpu.utils import Config
import conftest  # noqa: F401  (forces cpu backend)

IMG = 128  # small inputs for CI speed; strides still exercise all levels


@pytest.fixture(scope="module")
def lpn():
    cfg = Config.named("yololpn")
    model, variables = build_model(cfg, img_size=(IMG, IMG))
    return cfg, model, variables


def test_scaled_lists_match_reference_shapes():
    cfg = Config.named("yololps")
    num_repeat, channels = scaled_lists(cfg)
    # width 0.5 over [64,128,256,512,1024, 256,128,128,256,256,512]
    assert channels == [32, 64, 128, 256, 512, 128, 64, 64, 128, 128, 256]
    # depth 0.33 over [1,6,12,18,6, 12,12,12,12] (round, min 1 for >1)
    assert num_repeat == [1, 2, 4, 6, 2, 4, 4, 4, 4]


def test_train_output_shapes(lpn):
    cfg, model, variables = lpn
    x = jnp.zeros((2, IMG, IMG, 3))
    out, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    A = (IMG // 8) ** 2 + (IMG // 16) ** 2 + (IMG // 32) ** 2
    assert out.pro.shape == (2, A, 31)
    assert out.alp.shape == (2, A, 24)
    assert out.ads.shape == (2, A, 6, 37)
    assert out.reg.shape == (2, A, 4)   # reg_max=0, use_dfl=False
    assert out.cor.shape == (2, A, 8)
    assert len(out.feats) == 3


def test_eval_output_290_and_prior_prob(lpn):
    cfg, model, variables = lpn
    x = jnp.zeros((1, IMG, IMG, 3))
    y = model.apply(variables, x, train=False)
    A = (IMG // 8) ** 2 + (IMG // 16) ** 2 + (IMG // 32) ** 2
    assert y.shape == (1, A, 290)
    np.testing.assert_allclose(np.asarray(y[..., 4]), 1.0)  # obj column
    # zero-init pred kernels + prior-prob bias => every class score == 0.01
    np.testing.assert_allclose(np.asarray(y[0, 0, 13:]), 0.01, atol=1e-5)


def test_fused_model_matches_train_model(lpn):
    cfg, model, variables = lpn
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, IMG, IMG, 3)),
                    jnp.float32)
    y_train_graph = model.apply(variables, x, train=False)
    deploy_model = Model(config=cfg, deploy=True)
    y_deploy = deploy_model.apply(fuse_variables(variables), x, train=False)
    np.testing.assert_allclose(np.asarray(y_deploy), np.asarray(y_train_graph),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("name", ["yolov6n", "yolov6s"])
def test_generic_yolov6_configs_build(name):
    cfg = Config.named(name)
    model, variables = build_model(cfg, img_size=(64, 64))
    y = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    A = (64 // 8) ** 2 + (64 // 16) ** 2 + (64 // 32) ** 2
    assert y.shape == (1, A, 290)
