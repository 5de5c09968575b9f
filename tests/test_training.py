"""Trainer-layer tests: losses, schedulers, optimizers, E2E training on a
tiny model over the 8-device CPU mesh (data-parallel pjit)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlmc_quant_tpu.data import get_dataloader
from dlmc_quant_tpu.models import get_model
from dlmc_quant_tpu.parallel.mesh import make_mesh
from dlmc_quant_tpu.quant.config import scheme_from_dict
from dlmc_quant_tpu.quant.layers import calibrate
from dlmc_quant_tpu.training import losses as L
from dlmc_quant_tpu.training import schedulers as S
from dlmc_quant_tpu.training.optimizers import build_optimizer
from dlmc_quant_tpu.training.qat import QATTrainer
from dlmc_quant_tpu.training.trainer import Trainer


class TestLosses:
    def test_cross_entropy_golden(self):
        logits = jnp.array([[10.0, 0.0], [0.0, 10.0]])
        labels = jnp.array([0, 1])
        assert float(L.cross_entropy(logits, labels)) < 1e-3

    def test_l2_loss_golden(self):
        a = jnp.ones((2, 3))
        b = jnp.zeros((2, 3))
        assert float(L.l2_loss(a, b)) == 3.0  # per-row SSE=3, mean over batch

    def test_kl_loss_zero_for_same(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 10))
        assert abs(float(L.kl_loss(x, x))) < 1e-6

    def test_smoothlabel(self):
        logits = jnp.array([[10.0, 0.0]])
        labels = jnp.array([0])
        v = float(L.smoothlabel_ce_loss(logits, labels, 0.1))
        assert v > float(L.cross_entropy(logits, labels))

    def test_kurtosis_gaussian_near_3(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (10000,))
        # kurtosis of N(0,1) ~ 3 → (3-1.8)^2 ≈ 1.44
        assert 1.0 < float(L.kurtosis(w)) < 2.0


class TestSchedulers:
    def test_multistep(self):
        s = S.MultiStepLR(0.1, milestones=[2, 4], steps_per_epc=10,
                          gamma=0.1)
        assert float(s(0)) == pytest.approx(0.1)
        assert float(s(25)) == pytest.approx(0.01)
        assert float(s(45)) == pytest.approx(0.001)

    def test_warmup(self):
        s = S.CosineDecayLR(1.0, total_steps=100, warmup_steps=10)
        assert float(s(0)) == pytest.approx(0.1)
        assert float(s(9)) == pytest.approx(1.0)
        assert float(s(10)) == pytest.approx(1.0, abs=1e-3)
        assert float(s(109)) == pytest.approx(0.0, abs=1e-3)

    def test_cosine_annealing_restarts(self):
        s = S.CosineAnnealingLR(1.0, cycle_steps=10)
        assert float(s(0)) == pytest.approx(1.0)
        assert float(s(10)) == pytest.approx(1.0)  # restart
        assert float(s(5)) < 0.6

    def test_exponential(self):
        s = S.ExponentialLR(1.0, gamma=0.1, steps_per_epc=10)
        assert float(s(10)) == pytest.approx(0.1, rel=1e-3)

    def test_plateau(self):
        s = S.ReduceLROnPlateau(1.0, mode="min", factor=0.1, patience=1)
        for epoch_metric in (1.0, 1.0, 1.0, 1.0):
            s.record(epoch_metric)
            s.epoch_end()
        assert s.lr == pytest.approx(0.1)

    def test_plateau_state_roundtrip(self):
        s = S.ReduceLROnPlateau(1.0)
        s.record(0.5)
        s.epoch_end()
        d = s.state_dict()
        s2 = S.ReduceLROnPlateau(1.0)
        s2.load_state_dict(d)
        assert s2.state["best"] == 0.5


class TestOptimizers:
    def test_param_groups_lr(self):
        params = {"a": {"wt_alpha": jnp.ones(())},
                  "b": {"kernel": jnp.ones((2, 2))}}
        tx = build_optimizer("SGD", 0.1, momentum=0.0,
                             param_groups=[("wt_alpha", {"lr": 1.0})])
        state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        assert float(updates["a"]["wt_alpha"]) == pytest.approx(-1.0)
        assert float(updates["b"]["kernel"][0, 0]) == pytest.approx(-0.1)

    def test_grad_clip(self):
        params = {"k": jnp.ones(4)}
        tx = build_optimizer("SGD", 1.0, momentum=0.0, grad_clip=0.1)
        st = tx.init(params)
        up, _ = tx.update({"k": jnp.full(4, 100.0)}, st, params)
        assert float(jnp.linalg.norm(up["k"])) == pytest.approx(0.1, rel=1e-3)


class _TinyNet:
    """Small conv net for fast trainer tests (shares the QConv/QDense/BN
    structure of the zoo models without their compile cost)."""

    def __new__(cls, scheme=None):
        import flax.linen as nn
        from dlmc_quant_tpu.quant.layers import QConv, QDense

        class Net(nn.Module):
            scheme: object = None

            @nn.compact
            def __call__(self, x, train=False, qmode="eval"):
                x = QConv(8, (3, 3), (2, 2), name="conv1",
                          scheme=self.scheme)(x, qmode=qmode)
                x = nn.BatchNorm(use_running_average=not train,
                                 name="bn1")(x)
                x = nn.relu(x)
                x = QConv(16, (3, 3), (2, 2), name="conv2",
                          scheme=self.scheme)(x, qmode=qmode)
                x = nn.relu(x)
                x = jnp.mean(x, axis=(1, 2))
                return QDense(10, name="linear",
                              scheme=self.scheme)(x, qmode=qmode)

        return Net(scheme=scheme)


def _tiny_setup(scheme=None, n_train=256, bs=64):
    model = _TinyNet(scheme=scheme)
    train = get_dataloader("CIFAR10", batch_size=bs, training=True,
                           n_samples=n_train)
    val = get_dataloader("CIFAR10", batch_size=bs, training=False,
                         n_samples=128)
    x, _ = next(iter(train))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    return model, variables, train, val


class TestTrainerE2E:
    def test_fp_training_learns(self):
        model, variables, train, val = _tiny_setup(n_train=512)
        sched = S.CosineDecayLR(0.01, total_steps=len(train) * 40)
        tx = build_optimizer("Adam", sched)
        tr = Trainer(model, variables, tx, sched, train, val,
                     config={"epochs": 40, "monitor": "max val_accuracy"},
                     mesh=make_mesh(8))
        res = tr.train()
        # synthetic data is separable; 40 short epochs must beat chance
        assert res["val_accuracy"] > 0.25, res

    def test_qat_training_runs_and_tracks_scales(self):
        scheme = scheme_from_dict({
            "quantization_type": None,
            "weight": {"enable": True, "type": "LSQ",
                       "args": {"n_bits": 4, "signed": True}},
            "input": {"enable": True, "type": "LSQ",
                      "args": {"n_bits": 4, "signed": False}},
        })
        model, variables, train, val = _tiny_setup(scheme, n_train=128)
        variables = calibrate(model, variables,
                              [jnp.asarray(next(iter(train))[0])])
        sched = S.CosineDecayLR(0.01, total_steps=len(train) * 2)
        tx = build_optimizer("SGD", sched, momentum=0.9, grad_clip=5.0)
        tr = QATTrainer(model, variables, tx, sched, train, val,
                        config={"epochs": 2, "freeze_bn": True},
                        mesh=make_mesh(8))
        s_before = float(jax.tree_util.tree_leaves(
            tr.state.params["conv1"]["wt_scale"])[0])
        res = tr.train()
        assert np.isfinite(res["loss"])
        s_after = float(jax.tree_util.tree_leaves(
            tr.state.params["conv1"]["wt_scale"])[0])
        assert s_after != s_before  # LSQ scale actually learned

    def test_rootq_training_runs(self):
        scheme = scheme_from_dict({
            "quantization_type": "RootQ",
            "momentum": 0.01,
            "weight": {"enable": True, "type": "minmax_tensor",
                       "args": {"n_bits": 4, "signed": True}},
            "input": {"enable": True, "type": "minmax_tensor",
                      "args": {"n_bits": 4, "signed": False}},
        })
        model, variables, train, val = _tiny_setup(scheme, n_train=128)
        variables = calibrate(model, variables,
                              [jnp.asarray(next(iter(train))[0])])
        sched = S.CosineDecayLR(0.01, total_steps=len(train))
        tx = build_optimizer(
            "SGD", sched, momentum=0.9,
            param_groups=[("wt_alpha", {"lr": 0.001, "type": "Adam"})])
        tr = QATTrainer(model, variables, tx, sched, train, None,
                        config={"epochs": 1}, mesh=make_mesh(8))
        res = tr.train()
        assert np.isfinite(res["loss"])

    def test_checkpoint_resume(self, tmp_path):
        model, variables, train, val = _tiny_setup(n_train=128)
        sched = S.CosineDecayLR(0.05, total_steps=len(train) * 2)
        tx = build_optimizer("SGD", sched, momentum=0.9)
        tr = Trainer(model, variables, tx, sched, train, None,
                     config={"epochs": 1}, mesh=make_mesh(8))
        tr.train()
        tr.save(tmp_path / "ck", metadata={"epoch": 1})
        tr2 = Trainer(model, variables, tx, sched, train, None,
                      config={"epochs": 2}, mesh=make_mesh(8),
                      resume=tmp_path / "ck")
        assert tr2.start_epoch == 2
        np.testing.assert_allclose(
            np.asarray(tr2.state.params["conv1"]["kernel"]),
            np.asarray(tr.state.params["conv1"]["kernel"]))


class TestPlateauInTrainer:
    def test_plateau_lr_injected_and_decays(self):
        """ReduceLROnPlateau drives the optimizer through
        inject_hyperparams: with patience 0 and a flat metric the rate
        must drop after the plateau epochs."""
        model, variables, train, val = _tiny_setup(n_train=128)
        sched = S.ReduceLROnPlateau(0.05, mode="min", factor=0.5,
                                    patience=0, threshold=1e9)
        tx = build_optimizer("SGD", sched)
        tr = Trainer(model, variables, tx, sched, train, None,
                     config={"epochs": 3}, mesh=make_mesh(8))
        tr.train()
        # threshold=1e9 means no epoch ever counts as an improvement
        # after the first, so with patience 0 epochs 2 and 3 each halve
        assert sched.lr == pytest.approx(0.05 * 0.5 * 0.5)

        def find_hp(s):
            if hasattr(s, "hyperparams"):
                return s
            if isinstance(s, tuple):
                for e in s:
                    r = find_hp(e)
                    if r is not None:
                        return r
            return None

        hp = find_hp(tr.state.opt_state)
        assert hp is not None
        assert float(hp.hyperparams["learning_rate"]) == pytest.approx(
            sched.lr)
