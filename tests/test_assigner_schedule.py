"""Engine assigner-schedule tests (atss warmup -> tal formal).

The schedule exists because ATSS has a zero-foreground band for
plate-aspect boxes (see test_tal.test_tal_covers_atss_dead_band); these
tests pin the switching logic itself. jit compilation is lazy, so
requesting the step fns never actually compiles anything here.
"""

import argparse

import conftest  # noqa: F401


def _trainer(tmp_path, assigner):
    from yololp_tpu.core.engine import Trainer
    from yololp_tpu.data.synthetic import make_synthetic_dataset
    from yololp_tpu.utils.config import Config

    data = make_synthetic_dataset(str(tmp_path / "data"), n_train=4, n_val=2,
                                  img_size=128, seed=0)
    args = argparse.Namespace(
        conf_file="yololpn", img_size=128, batch_size=2, epochs=8, workers=0,
        eval_interval=100, heavy_eval_range=0,
        output_dir=str(tmp_path / "out"), save_dir=str(tmp_path / "out/exp"),
        name="exp", seed=0, bf16=True, data_parallel=False,
        cache_device=False, quant=False, calib=False, distill=False,
        assigner=assigner, resume=False)
    return Trainer(args, Config.named("yololpn"), data)


def test_atss_tal_switches_at_warmup_epoch(tmp_path):
    tr = _trainer(tmp_path, "atss_tal")
    # config's vestigial atss_warmup_epoch=0 must not disable the warmup
    assert tr.atss_warmup_epoch == 4
    warm = tr._fns_for_epoch(0)
    assert tr._fns_for_epoch(3) is warm
    formal = tr._fns_for_epoch(4)
    assert formal is not warm
    assert tr._fns_for_epoch(7) is formal
    assert sorted(tr._train_fns_cache) == ["atss", "tal"]
    assert tr.loss_cfg.assigner == "atss"
    assert tr._loss_cfg_formal.assigner == "tal"


def test_default_assigner_is_single_program(tmp_path):
    tr = _trainer(tmp_path, None)  # config default: atss (reference parity)
    assert tr.atss_warmup_epoch == 0
    assert tr._fns_for_epoch(0) is tr._fns_for_epoch(100)
    assert sorted(tr._train_fns_cache) == ["atss"]
