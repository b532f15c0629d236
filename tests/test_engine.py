"""Trainer orchestration tests (reference: yolov6/core/engine.py seams).

These cover the seams nothing else exercises directly — resume epoch math,
the stop-aug loader rebuild, best/best-stop-aug checkpoint selection, and
the QAT calib-checkpoint epoch guard (the class of bug advisor round 2
found). The jitted step fn is stubbed: what's under test is the host-side
orchestration, not the XLA program (test_train_step covers that).
"""

import os
import os.path as osp
import types

import numpy as np
import pytest

import jax.numpy as jnp

import conftest  # noqa: F401
from yololp_tpu.core.engine import Trainer
from yololp_tpu.data.synthetic import make_synthetic_dataset
from yololp_tpu.utils.checkpoint import load_checkpoint_raw
from yololp_tpu.utils.config import Config


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("engine_data") / "ds")
    return make_synthetic_dataset(root, n_train=8, n_val=4, img_size=64,
                                  seed=3)


def make_args(tmp_path, **over):
    a = types.SimpleNamespace(
        img_size=64, batch_size=4, epochs=3, workers=0,
        save_dir=str(tmp_path / "run"), conf_file="yololpn",
        seed=0, bf16=False, cache_device=False, assigner="atss",
        stop_aug_last_n_epoch=1, eval_interval=1, heavy_eval_range=0,
        quant=False, calib=False, distill=False)
    for k, v in over.items():
        setattr(a, k, v)
    return a


def make_trainer(tmp_path, tiny_data, **over):
    cfg = Config.named("yololpn")
    return Trainer(make_args(tmp_path, **over), cfg, dict(tiny_data))


def stub_fns(trainer, aps):
    """Replace the jitted step fn with a step counter and the eval hook
    with a scripted AP sequence; returns the list of epochs that evaled."""
    def fake_step(state, imgs, labels, masks):
        return (state._replace(step=state.step + 1), jnp.float32(0.0),
                jnp.zeros(7))

    trainer._build_train_fns = lambda loss_cfg: (fake_step, None, None)
    trainer._train_fns_cache = {}
    trainer.step_fn, trainer.epoch_fn = fake_step, None
    trainer.multi_epoch_fn = None

    calls = []

    def fake_eval():
        ap = aps[len(calls) % len(aps)]
        calls.append(ap)
        return ([ap, ap, ap, ap, ap],
                {"pre_ms": 0.0, "infer_ms": 0.0, "post_ms": 0.0})

    trainer.eval_model = fake_eval
    return calls


def test_best_ckpt_selection(tmp_path, tiny_data):
    """best_ckpt tracks the max AP; best_stop_aug_ckpt tracks the max
    within the stop-aug window (engine.py:191-196 policy)."""
    tr = make_trainer(tmp_path, tiny_data, epochs=3,
                      stop_aug_last_n_epoch=1)  # window = epoch 2 only
    stub_fns(tr, aps=[0.1, 0.5, 0.3])
    best = tr.train()
    assert best == pytest.approx(0.5)
    wdir = osp.join(tr.save_dir, "weights")
    assert load_checkpoint_raw(osp.join(wdir, "best_ckpt.msgpack"))["epoch"] == 1
    assert load_checkpoint_raw(osp.join(wdir, "last_ckpt.msgpack"))["epoch"] == 2
    # stop-aug window opened at epoch 2 (ap 0.3 < global best 0.5)
    assert load_checkpoint_raw(
        osp.join(wdir, "best_stop_aug_ckpt.msgpack"))["epoch"] == 2
    # end-of-training strip wrote the EMA-only deploy checkpoint
    final = load_checkpoint_raw(osp.join(wdir, "final_ckpt.msgpack"))
    assert final["opt_state"] is None and final["ema"] is None


def test_resume_epoch_math(tmp_path, tiny_data):
    """resume() returns saved_epoch + 1 and restores the step counter."""
    tr = make_trainer(tmp_path, tiny_data)
    stub_fns(tr, aps=[0.0])
    tr.state = tr.state._replace(step=jnp.asarray(123, jnp.int32))
    tr.save("resume_src.msgpack", epoch=5)

    tr2 = make_trainer(tmp_path / "b", tiny_data, epochs=7)
    start = tr2.resume(osp.join(tr.save_dir, "weights", "resume_src.msgpack"))
    assert start == 6
    assert int(tr2.state.step) == 123
    assert tr2.resumed_epoch == 5


def test_resume_past_end_raises(tmp_path, tiny_data):
    """Resuming at an epoch >= --epochs must fail loudly, not silently run
    zero epochs (the advisor-r2 QAT zero-epoch-resume bug)."""
    tr = make_trainer(tmp_path, tiny_data, epochs=3)
    stub_fns(tr, aps=[0.0])
    tr.save("late.msgpack", epoch=9)
    tr2 = make_trainer(tmp_path / "b", tiny_data, epochs=3)
    stub_fns(tr2, aps=[0.0])
    with pytest.raises(ValueError, match="zero epochs"):
        tr2.train(resume_path=osp.join(tr.save_dir, "weights", "late.msgpack"))


def test_stop_aug_disables_heavy_aug(tmp_path, tiny_data):
    """At epochs - stop_aug_last_n_epoch the train dataset's mosaic/mixup
    are zeroed (engine.py:305-308 behavior)."""
    tr = make_trainer(tmp_path, tiny_data, epochs=2, stop_aug_last_n_epoch=1)
    stub_fns(tr, aps=[0.0])
    tr.train_dataset.hyp["mosaic"] = 1.0
    tr.train_dataset.hyp["mixup"] = 0.5
    tr.train()
    assert tr.train_dataset.hyp["mosaic"] == 0.0
    assert tr.train_dataset.hyp["mixup"] == 0.0


def test_assigner_schedule_switches_fns(tmp_path, tiny_data):
    """atss_tal: epochs < atss_warmup_epoch build the 'atss' fns, later
    epochs the 'tal' fns, each compiled once (engine._fns_for_epoch)."""
    tr = make_trainer(tmp_path, tiny_data, assigner="atss_tal")
    built = []
    real_build = tr._build_train_fns

    def spy(loss_cfg):
        built.append(loss_cfg.assigner)
        return (lambda s, i, l, m: (s, jnp.float32(0.0), jnp.zeros(7))), None

    tr._build_train_fns = spy
    tr._train_fns_cache = {}
    warm = tr.atss_warmup_epoch
    assert warm >= 1
    tr._fns_for_epoch(0)
    tr._fns_for_epoch(warm - 1)
    tr._fns_for_epoch(warm)
    tr._fns_for_epoch(warm + 1)
    assert built == ["atss", "tal"]
    del real_build


def test_calibrate_preserves_source_epoch(tmp_path, tiny_data):
    """calibrate() stamps the calib checkpoint with the RESUMED epoch so a
    QAT finetune continues the loop from the source run's position."""
    tr = make_trainer(tmp_path, tiny_data)
    stub_fns(tr, aps=[0.0])
    tr.save("src.msgpack", epoch=7)

    tr2 = make_trainer(tmp_path / "b", tiny_data)
    tr2.resume(osp.join(tr.save_dir, "weights", "src.msgpack"))
    tr2.calibrate()
    wdir = osp.join(tr2.save_dir, "weights")
    assert load_checkpoint_raw(osp.join(wdir, "calib_ckpt.msgpack"))["epoch"] == 7
    assert osp.isfile(osp.join(wdir, "calib_amax.json"))
    # a fresh (non-resumed) trainer stamps -1: the guard default
    tr3 = make_trainer(tmp_path / "c", tiny_data)
    tr3.calibrate()
    assert load_checkpoint_raw(
        osp.join(tr3.save_dir, "weights",
                 "calib_ckpt.msgpack"))["epoch"] == -1


def test_epochs_per_dispatch_matches_per_epoch(tmp_path, tiny_data):
    """--epochs-per-dispatch chunking (engine.train cache path) must be a
    pure dispatch-granularity change: same final params and same per-epoch
    loss items as the per-epoch loop, with chunks breaking at eval epochs."""
    import json

    import jax

    def run(sub, epd):
        cfg = Config.named("yololpn")
        cfg["data_aug"] = {k: 0.0 for k in cfg["data_aug"]}
        args = make_args(tmp_path / sub, cache_device=True, assigner="atss",
                         epochs=5, eval_interval=3, heavy_eval_range=0,
                         epochs_per_dispatch=epd)
        tr = Trainer(args, cfg, dict(tiny_data))
        evals = []
        tr.eval_model = lambda: (evals.append(True) or
                                 ([0.0] * 5, {"pre_ms": 0.0, "infer_ms": 0.0,
                                              "post_ms": 0.0}))
        tr.train()
        log = [json.loads(l) for l in open(tr.log_path)]
        return tr, log, len(evals)

    tr1, log1, ev1 = run("epd1", 1)
    tr4, log4, ev4 = run("epd4", 4)

    assert ev1 == ev4 and len(log1) == len(log4) == 5
    for r1, r4 in zip(log1, log4):
        assert r1["epoch"] == r4["epoch"] and r1["step"] == r4["step"]
        for k in r1:
            if k.startswith("train/"):
                np.testing.assert_allclose(r1[k], r4[k], rtol=1e-5,
                                           atol=1e-6, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(tr1.state.params),
                    jax.tree_util.tree_leaves(tr4.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
