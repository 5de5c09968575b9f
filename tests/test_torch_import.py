"""torch→pytree checkpoint ingestion tests (torch CPU is available)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dlmc_quant_tpu.models import get_model
from dlmc_quant_tpu.utils.bidict import BiDict
from dlmc_quant_tpu.utils.torch_import import (build_name_mapping,
                                               import_torch_checkpoint)


class TestBiDict:
    def test_reverse_lookup(self):
        d = BiDict({"a": 1, "b": 2})
        assert d[:2] == "b"
        d["c"] = 3
        assert d[:3] == "c"
        assert d["a"] == 1


def _torch_tiny_resnetish():
    """A torch net whose conv/linear/bn call order matches the flax
    tiny model built below."""
    import torch.nn as nn

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 8, 3, padding=1, bias=False)
            self.bn1 = nn.BatchNorm2d(8)
            self.conv2 = nn.Conv2d(8, 16, 3, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(16)
            self.fc = nn.Linear(16, 10)

        def forward(self, x):
            import torch.nn.functional as F
            x = F.relu(self.bn1(self.conv1(x)))
            x = F.relu(self.bn2(self.conv2(x)))
            x = x.mean(dim=(2, 3))
            return self.fc(x)

    return Net()


def _flax_tiny():
    import flax.linen as nn

    from dlmc_quant_tpu.quant.layers import QConv, QDense

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, qmode="eval"):
            x = QConv(8, (3, 3), use_bias=False, name="conv1")(x)
            x = nn.BatchNorm(use_running_average=not train, name="bn1")(x)
            x = nn.relu(x)
            x = QConv(16, (3, 3), use_bias=False, name="conv2")(x)
            x = nn.BatchNorm(use_running_average=not train, name="bn2")(x)
            x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            return QDense(10, name="fc")(x)

    return Net()


class TestTorchImport:
    def test_outputs_match_torch(self, tmp_path):
        tnet = _torch_tiny_resnetish().eval()
        # non-trivial BN stats
        with torch.no_grad():
            tnet.bn1.running_mean.uniform_(-0.5, 0.5)
            tnet.bn1.running_var.uniform_(0.5, 1.5)
        ckpt = tmp_path / "m.pth"
        torch.save({"state_dict": tnet.state_dict()}, ckpt)

        fnet = _flax_tiny()
        x = np.random.default_rng(0).random((2, 16, 16, 3)).astype(np.float32)
        v = fnet.init(jax.random.PRNGKey(0), jnp.asarray(x))
        v = import_torch_checkpoint(ckpt, fnet, v)

        y_flax = np.asarray(fnet.apply(v, jnp.asarray(x)))
        with torch.no_grad():
            y_torch = tnet(torch.from_numpy(
                x.transpose(0, 3, 1, 2))).numpy()
        np.testing.assert_allclose(y_flax, y_torch, rtol=1e-4, atol=1e-5)

    def test_name_mapping_bidirectional(self):
        tnet = _torch_tiny_resnetish()
        sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
        fnet = _flax_tiny()
        v = fnet.init(jax.random.PRNGKey(0), jnp.ones((1, 16, 16, 3)))
        m = build_name_mapping(v, sd)
        assert m["conv1"] == "conv1"
        assert m["fc"] == "fc"
        # reverse lookup: torch name → flax path (BiDict slice idiom)
        assert m[:"conv2"] == "conv2"
        assert m[:"bn1"] == "bn1"

    def test_stream_mismatch_raises(self, tmp_path):
        tnet = _torch_tiny_resnetish()
        ckpt = tmp_path / "m.pth"
        torch.save(tnet.state_dict(), ckpt)
        m = get_model("cifar_resnet20")
        v = m.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))
        with pytest.raises(ValueError, match="stream mismatch"):
            import_torch_checkpoint(ckpt, m, v)
