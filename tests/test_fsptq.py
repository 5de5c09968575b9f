"""RepAPQ/FSPTQ reconstruction tests on a tiny fused RepVGG."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlmc_quant_tpu.models.fuse import repvgg_fuse
from dlmc_quant_tpu.models.repvgg import RepVGG
from dlmc_quant_tpu.quant.config import scheme_from_dict
from dlmc_quant_tpu.quant.layers import calibrate
from dlmc_quant_tpu.training.fsptq import (
    FSPTQTrainer, capture_block_io, discover_blocks,
)


def _fsptq_scheme(n_bits=4, recon_type=None):
    return scheme_from_dict({
        "quantization_type": "FSPTQ",
        "weight": {"enable": True, "type": "minmax_channel",
                   "recon_type": recon_type,
                   "args": {"n_bits": n_bits, "signed": True}},
        "input": {"enable": True, "type": "minmax_tensor",
                  "args": {"n_bits": 8, "signed": False}},
    })


@pytest.fixture(scope="module")
def fused_repvgg():
    m = RepVGG(num_blocks=(1, 1, 1, 1),
               width_multiplier=(0.25, 0.25, 0.25, 0.25), num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(1), x)
    # make BN stats non-trivial
    _, upd = m.apply(v, x, train=True, mutable=["batch_stats"])
    v = {**v, "batch_stats": upd["batch_stats"]}
    dm, dv = repvgg_fuse(m, v, x)
    return dm, dv, x


class TestDiscovery:
    def test_discover_blocks_order(self, fused_repvgg):
        dm, dv, x = fused_repvgg
        targets = discover_blocks(dm, dv, x)
        names = [".".join(p) for p, _ in targets]
        assert names[0] == "stage0"
        assert names[-1] == "linear"
        assert len(names) == 6  # 5 blocks + linear

    def test_capture_io_shapes(self, fused_repvgg):
        dm, dv, x = fused_repvgg
        xin, xout = capture_block_io(dm, dv, [x, x], ("stage0",), "fp")
        assert xin.shape[0] == 16 and xin.shape[-1] == 3
        assert xout.shape[-1] == 16  # stage0 width at 0.25 mult


class TestReconstruction:
    def test_w4_reconstruction_improves_output_match(self, fused_repvgg):
        dm, dv, x = fused_repvgg
        scheme = _fsptq_scheme(n_bits=4)
        qm = dataclasses.replace(dm, scheme=scheme)
        import flax
        qv = qm.init(jax.random.PRNGKey(2), x)
        flatq = flax.traverse_util.flatten_dict(qv["params"])
        flatd = flax.traverse_util.flatten_dict(dv["params"])
        for k, val in flatd.items():
            flatq[k] = val
        qv = {**qv, "params": flax.traverse_util.unflatten_dict(flatq)}
        qv = calibrate(qm, qv, [x])

        y_fp = dm.apply(dv, x)
        y_before = qm.apply(qv, x, qmode="eval")
        err_before = float(jnp.mean((y_before - y_fp) ** 2))

        tr = FSPTQTrainer(qm, qv, dm, dv, [x], iters=60, batch_size=8)
        out = tr.train()
        y_after = qm.apply(out["variables"], x, qmode="eval")
        err_after = float(jnp.mean((y_after - y_fp) ** 2))
        assert err_after < err_before, (err_before, err_after)

    def test_adaround_reconstruction(self, fused_repvgg):
        dm, dv, x = fused_repvgg
        scheme = _fsptq_scheme(n_bits=4, recon_type="adaround")
        qm = dataclasses.replace(dm, scheme=scheme)
        import flax
        qv = qm.init(jax.random.PRNGKey(2), x)
        flatq = flax.traverse_util.flatten_dict(qv["params"])
        for k, val in flax.traverse_util.flatten_dict(dv["params"]).items():
            flatq[k] = val
        qv = {**qv, "params": flax.traverse_util.unflatten_dict(flatq)}
        qv = calibrate(qm, qv, [x])
        tr = FSPTQTrainer(qm, qv, dm, dv, [x], iters=40, batch_size=8)
        out = tr.train()
        assert all(np.isfinite(l) for l in out["block_losses"].values())


class TestAdaRoundRegularizer:
    def test_round_reg_binarizes_soft_targets(self):
        """β-annealed rounding regularizer pushes h(α) to {0,1}: at low
        β the penalty gradient drives middling alphas outward."""
        import jax
        import jax.numpy as jnp
        from dlmc_quant_tpu.training.fsptq import _round_reg

        params = {"alpha": jnp.zeros((32,))}     # h(alpha=0) ~ 0.5
        mid = float(_round_reg(params, jnp.float32(2.0)))
        done = float(_round_reg({"alpha": jnp.full((32,), 8.0)},
                                jnp.float32(2.0)))
        assert mid > 25.0           # ~1 per element at h=0.5
        assert done < 1e-3          # ~0 once targets saturate
        g = jax.grad(lambda p: _round_reg(p, jnp.float32(2.0)))(
            {"alpha": jnp.full((4,), 0.3)})
        assert float(jnp.max(jnp.abs(g["alpha"]))) > 0  # pushes outward

    def test_reconstruct_applies_reg_only_with_alpha(self):
        from dlmc_quant_tpu.training.fsptq import _has_alpha
        assert _has_alpha({"a": {"alpha": 1}})
        assert not _has_alpha({"a": {"wt_scale": 1}})


class TestBNRecalibration:
    def test_bn_stats_refresh_under_quantization(self):
        """Quantized weights shift pre-BN distributions; bn_recalibrate
        must move running stats toward the quantized forward's actual
        statistics (the W4 frozen-BN mismatch fix)."""
        from dlmc_quant_tpu.models import get_model
        from dlmc_quant_tpu.training.ptq import bn_recalibrate

        model = get_model("cifar_resnet20", num_classes=10,
                          scheme=_fsptq_scheme(n_bits=4))
        x = jax.random.normal(jax.random.PRNGKey(0), (16, 32, 32, 3))
        v = jax.jit(model.init)(jax.random.PRNGKey(1), x)
        v = calibrate(model, v, [x])
        v2 = bn_recalibrate(model, v, [x], min_updates=50)
        # stats moved
        m0 = v["batch_stats"]["bn1"]["mean"]
        m1 = v2["batch_stats"]["bn1"]["mean"]
        assert float(jnp.max(jnp.abs(m1 - m0))) > 1e-6
        # converged to the quantized forward's batch stats: one more
        # train-mode forward barely changes them
        _, upd = model.apply(v2, x, train=True, qmode="eval",
                             mutable=["batch_stats"])
        m2 = upd["batch_stats"]["bn1"]["mean"]
        drift0 = float(jnp.max(jnp.abs(m1 - m0)))
        # EMA update is m*0.9 + batch*0.1 -> residual step must be tiny
        # relative to the initial correction
        assert float(jnp.max(jnp.abs(m2 - m1))) < 0.2 * max(drift0, 1e-6)
        # model without BN passes through unchanged
        dm = get_model("RepVGG_A0", num_classes=10,
                       scheme=_fsptq_scheme(), deploy=True)
        dx = jax.random.normal(jax.random.PRNGKey(2), (4, 32, 32, 3))
        dvars = jax.jit(dm.init)(jax.random.PRNGKey(3), dx)
        dvars = calibrate(dm, dvars, [dx])
        out = bn_recalibrate(dm, dvars, [dx])
        assert "batch_stats" not in out


class TestReconAcceptanceGate:
    def test_harmful_recon_is_reverted(self, fused_repvgg, monkeypatch):
        """If a block's reconstruction returns params that reduce
        teacher agreement, the trainer must restore the calibrated
        params for that block."""
        import dlmc_quant_tpu.training.fsptq as fsptq_mod

        dm, dv, x = fused_repvgg
        scheme = _fsptq_scheme(n_bits=8)
        qm = dataclasses.replace(dm, scheme=scheme)
        qv = jax.jit(qm.init)(jax.random.PRNGKey(0), x)
        import flax
        qv = flax.core.unfreeze(qv)
        flatq = flax.traverse_util.flatten_dict(qv["params"])
        for k, v in flax.traverse_util.flatten_dict(dv["params"]).items():
            flatq[k] = v
        qv["params"] = flax.traverse_util.unflatten_dict(flatq)
        qv = calibrate(qm, qv, [x])

        def garbage_recon(block, block_vars, x_cache, y_fp, *a, **k):
            bad = jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p), block_vars["params"])
            return bad, 0.0

        monkeypatch.setattr(fsptq_mod, "reconstruct_block", garbage_recon)
        tr = FSPTQTrainer(qm, qv, dm, dv, [x], iters=2)
        before = jax.tree_util.tree_map(np.asarray, tr.variables["params"])
        out = tr.train()
        after = out["variables"]["params"]
        # zeroed params would destroy agreement -> every block reverted
        for (pa, la), (pb, lb) in zip(
                flax.traverse_util.flatten_dict(before).items(),
                flax.traverse_util.flatten_dict(after).items()):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
