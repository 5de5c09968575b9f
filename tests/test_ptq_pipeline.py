"""E2E tests: data layer, config system, PTQ pipeline on a tiny model."""

import numpy as np
import pytest

from dlmc_quant_tpu.data import get_dataloader
from dlmc_quant_tpu.training.ptq import run_ptq
from dlmc_quant_tpu.utils.config import ConfigParser, set_by_path
from dlmc_quant_tpu.utils.metric_tracker import MetricTracker


class TestDataLayer:
    def test_synthetic_cifar_loader(self):
        dl = get_dataloader("CIFAR10", batch_size=32, training=True)
        x, y = next(iter(dl))
        assert x.shape == (32, 32, 32, 3) and y.shape == (32,)
        assert x.dtype == np.float32
        # normalized
        assert abs(float(x.mean())) < 2.0

    def test_validation_split(self):
        dl = get_dataloader("CIFAR10", batch_size=32, training=True,
                            validation_split=0.1)
        val = dl.split_validation()
        assert val is not None
        assert dl.n_samples + val.n_samples == len(dl.dataset)
        # disjoint
        assert not set(dl.indices) & set(val.indices)

    def test_epoch_reshuffle_deterministic(self):
        dl = get_dataloader("CIFAR10", batch_size=16, training=True)
        dl.set_epoch(0)
        a = next(iter(dl))[1]
        dl.set_epoch(0)
        b = next(iter(dl))[1]
        np.testing.assert_array_equal(a, b)
        dl.set_epoch(1)
        c = next(iter(dl))[1]
        assert not np.array_equal(a, c)

    def test_calibration_subsampling(self):
        dl = get_dataloader("CIFAR10", batch_size=16, training=True,
                            n_samples=64, random_sample=True)
        assert len(dl.dataset) == 64

    def test_host_sharding(self):
        dl = get_dataloader("CIFAR10", batch_size=16, training=False)
        s0, s1 = dl.shard(0, 2), dl.shard(1, 2)
        assert abs(s0.n_samples - s1.n_samples) <= 1
        assert not set(s0.indices) & set(s1.indices)


class TestConfig:
    def test_roundtrip_and_overrides(self, tmp_path):
        cfg = {"name": "t", "arch": {"type": "cifar_resnet20", "args": {}},
               "trainer": {"epochs": 3}}
        c = ConfigParser(cfg, modification={"trainer;epochs": 5},
                         save_to_disk=False)
        assert c["trainer"]["epochs"] == 5
        assert "random_seed" in c.config

    def test_save_to_disk(self, tmp_path):
        cfg = {"name": "t", "save_dir": str(tmp_path)}
        c = ConfigParser(cfg)
        assert (c.save_dir / "config.yaml").exists()

    def test_set_by_path(self):
        d = {}
        set_by_path(d, "a;b;c", 1)
        assert d == {"a": {"b": {"c": 1}}}

    def test_init_obj_registry(self):
        from dlmc_quant_tpu.models import get_model
        c = ConfigParser({"arch": {"type": "cifar_resnet20",
                                   "args": {"num_classes": 10}}},
                         save_to_disk=False)
        m = c.init_obj("arch", get_model)
        assert m.num_classes == 10


class TestMetricTracker:
    def test_windows(self):
        mt = MetricTracker("loss")
        mt.update("loss", 1.0)
        mt.update("loss", 3.0)
        assert mt.avg("loss") == 2.0
        mt.reset_batch()
        mt.update("loss", 5.0)
        assert mt.avg_batch("loss") == 5.0
        assert mt.avg("loss") == 3.0


@pytest.fixture(scope="module")
def tiny_ptq_config():
    return {
        "name": "tiny_ptq",
        "random_seed": 0,
        "arch": {"type": "cifar_resnet20", "args": {"num_classes": 10}},
        "dataloaders": {
            "calibration": {"type": "CIFAR10",
                            "args": {"batch_size": 32, "training": True,
                                     "n_samples": 128}},
            "eval": {"type": "CIFAR10",
                     "args": {"batch_size": 64, "training": False,
                              "n_samples": 256}},
        },
        "quantization": {
            "quantization_type": None,
            "weight": {"enable": True, "type": "minmax_channel",
                       "args": {"n_bits": 8, "signed": True}},
            "input": {"enable": True, "type": "minmax_tensor",
                      "args": {"n_bits": 8, "signed": False}},
        },
        "loss": "cross_entropy",
        "metrics": ["accuracy"],
        "observe_passes": 2,
        # fidelity test below compares against the fp32 eval on the
        # checkpoint's ORIGINAL BN stats; stat refresh is tested apart
        "bn_recal": False,
    }


class TestPTQPipeline:
    def test_e2e_w8a8(self, tiny_ptq_config):
        res = run_ptq(tiny_ptq_config)
        assert res["fp32"] is not None and res["quant"] is not None
        # W8A8 on an untrained net: quantized loss must track FP closely
        assert abs(res["quant"]["loss"] - res["fp32"]["loss"]) \
            / res["fp32"]["loss"] < 0.05
        # quantizer params materialized
        assert "wt_scale" in res["variables"]["params"]["conv1"]

    def test_e2e_bn_recal_improves_loss(self, tiny_ptq_config):
        # with stat refresh on (default), the quantized model's BN
        # statistics match the data — on an untrained net (init stats
        # mean 0 / var 1) that strictly reduces eval loss
        cfg = dict(tiny_ptq_config)
        cfg["bn_recal"] = True
        res = run_ptq(cfg)
        assert res["quant"]["loss"] < res["fp32"]["loss"]

    def test_e2e_checkpoint_roundtrip(self, tiny_ptq_config, tmp_path):
        from dlmc_quant_tpu.utils.checkpoint import (load_checkpoint,
                                                     save_checkpoint)
        res = run_ptq(tiny_ptq_config)
        p = save_checkpoint(tmp_path / "ckpt", res["variables"],
                            metadata={"quant": res["quant"]})
        tree, meta = load_checkpoint(p, target=res["variables"])
        np.testing.assert_allclose(
            np.asarray(tree["params"]["conv1"]["wt_scale"]),
            np.asarray(res["variables"]["params"]["conv1"]["wt_scale"]))
        assert "quant" in meta

    def test_e2e_real_int_eval(self, tiny_ptq_config):
        """eval_int: the PTQ pipeline also evaluates through the real
        integer execution path (serve configuration)."""
        cfg = {**tiny_ptq_config, "eval_int": True, "int_qmode": "int"}
        res = run_ptq(cfg)
        assert res["int"] is not None
        # real-int8 loss tracks the fake-quant eval loss closely
        assert abs(res["int"]["loss"] - res["quant"]["loss"]) \
            / res["quant"]["loss"] < 0.05
