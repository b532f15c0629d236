"""Config-zoo smoke tests: representative configs from each family build and
produce the 290-col decode. (All 34 configs were validated once manually;
CI keeps one per family for speed.)"""

import pytest

import jax.numpy as jnp

from yololp_tpu.models import build_model
from yololp_tpu.utils.config import Config
import conftest  # noqa: F401

FAMILY_REPS = [
    "yololpn",                # LP nano (EfficientRep+P2+cspsppf, siou)
    "yolov6m",                # CSP backbone/neck + DFL head
    "yolov6n6",               # P6: EfficientRep6 + RepBiFPANNeck6, 4 levels
    "base/yolov6s_base",      # conv_relu mode, plain RepPANNeck, no P2
    "repopt/yolov6_tiny_hs",  # hyper_search (LinearAddBlock CSLA)
    "repopt/yolov6n_opt",     # repopt (RealVGGBlock)
]


@pytest.mark.parametrize("name", FAMILY_REPS)
def test_config_builds_and_decodes(name):
    cfg = Config.named(name)
    p6 = cfg["model"]["head"]["num_layers"] == 4
    img = 128 if p6 else 64
    model, variables = build_model(cfg, img_size=(img, img))
    y = model.apply(variables, jnp.zeros((1, img, img, 3)), train=False)
    strides = (8, 16, 32, 64) if p6 else (8, 16, 32)
    a = sum((img // s) ** 2 for s in strides)
    assert y.shape == (1, a, 290)


def test_qat_config_carries_ptq_qat_dicts():
    cfg = Config.named("repopt/yolov6s_opt_qat")
    assert cfg["ptq"]["num_bits"] == 8
    assert cfg["qat"]["sensitive_layers_list"]
    assert cfg["training_mode"] == "repopt"
