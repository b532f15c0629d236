"""Model assembly: config -> backbone + neck + head (reference yolov6/models/yolo.py).

Differences from the reference by design:
  * No eval() of type strings — an explicit registry.
  * The model is a flax Module; `build_model` returns (module, variables).
  * NHWC input (B, H, W, 3), float in [0, 1].
  * Width/depth scaling identical: repeats scaled by depth_multiple
    (round(i*d) for i>1), channels by width_multiple with make_divisible(x, 8)
    (yolo.py:49-66).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from yololp_tpu.layers.blocks import get_block
from yololp_tpu.models import efficientrep as _bb
from yololp_tpu.models import reppan as _nk
from yololp_tpu.models.effidehead import Detect

BACKBONES = {
    "EfficientRep": _bb.EfficientRep,
    "EfficientRep6": _bb.EfficientRep6,
    "CSPBepBackbone": _bb.CSPBepBackbone,
    "CSPBepBackbone_P6": _bb.CSPBepBackbone_P6,
}

NECKS = {
    "RepPANNeck": _nk.RepPANNeck,
    "RepBiFPANNeck": _nk.RepBiFPANNeck,
    "RepPANNeck6": _nk.RepPANNeck6,
    "RepBiFPANNeck6": _nk.RepBiFPANNeck6,
    "CSPRepPANNeck": _nk.CSPRepPANNeck,
    "CSPRepBiFPANNeck": _nk.CSPRepBiFPANNeck,
    "CSPRepPANNeck_P6": _nk.CSPRepPANNeck_P6,
    "CSPRepBiFPANNeck_P6": _nk.CSPRepBiFPANNeck_P6,
}


def make_divisible(x, divisor=8):
    return int(math.ceil(x / divisor) * divisor)


def scaled_lists(config):
    """Apply depth/width multipliers (yolo.py:65-66)."""
    m = config["model"]
    depth_mul = m["depth_multiple"]
    width_mul = m["width_multiple"]
    num_repeat = [
        (max(round(i * depth_mul), 1) if i > 1 else i)
        for i in (list(m["backbone"]["num_repeats"])
                  + list(m["neck"]["num_repeats"]))
    ]
    channels_list = [
        make_divisible(i * width_mul, 8)
        for i in (list(m["backbone"]["out_channels"])
                  + list(m["neck"]["out_channels"]))
    ]
    return num_repeat, channels_list


class Model(nn.Module):
    """backbone -> neck -> head. Train: HeadTrainOutput; eval: (B, A, 290)."""

    config: Any
    npro: int = 31
    nalp: int = 24
    nads: int = 37
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        num_repeat, channels_list = scaled_lists(cfg)
        mcfg = cfg["model"]
        block = get_block(cfg.get("training_mode", "repvgg"))
        kw = dict(deploy=self.deploy, dtype=self.dtype)

        bb_cls = BACKBONES[mcfg["backbone"]["type"]]
        bb_kw = dict(channels_list=channels_list, num_repeats=num_repeat,
                     block=block, fuse_P2=bool(mcfg["backbone"].get("fuse_P2")),
                     cspsppf=bool(mcfg["backbone"].get("cspsppf")), **kw)
        if "CSP" in mcfg["backbone"]["type"]:
            bb_kw["csp_e"] = mcfg["backbone"]["csp_e"]
        feats = bb_cls(name="backbone", **bb_kw)(x, train)

        nk_cls = NECKS[mcfg["neck"]["type"]]
        nk_kw = dict(channels_list=channels_list, num_repeats=num_repeat,
                     block=block, **kw)
        if "CSP" in mcfg["neck"]["type"]:
            nk_kw["csp_e"] = mcfg["neck"]["csp_e"]
        feats = nk_cls(name="neck", **nk_kw)(feats, train)

        head = Detect(
            npro=self.npro, nalp=self.nalp, nads=self.nads,
            num_layers=mcfg["head"]["num_layers"],
            use_dfl=bool(mcfg["head"]["use_dfl"]),
            reg_max=int(mcfg["head"]["reg_max"]),
            name="detect", **kw)
        return head(feats, train)


def build_model(config, npro=31, nalp=24, nads=37, img_size=(640, 640),
                deploy: bool = False, dtype=jnp.float32, seed: int = 0,
                batch_size: int = 1):
    """Instantiate the module and initialize variables for the given size."""
    model = Model(config=config, npro=npro, nalp=nalp, nads=nads,
                  deploy=deploy, dtype=dtype)
    dummy = jnp.zeros((batch_size, img_size[0], img_size[1], 3), dtype)
    # jit the init: unjitted flax init dispatches hundreds of tiny eager ops,
    # which is pathologically slow over a remote/tunneled TPU backend.
    init_fn = jax.jit(lambda k: model.init(k, dummy, train=not deploy))
    variables = init_fn(jax.random.PRNGKey(seed))
    return model, variables
