"""RepVGG — reparameterizable VGG-style network (NHWC, flax).

Train form: every block is 3×3-conv+BN ∥ 1×1-conv+BN ∥ identity-BN,
summed, then (optional SE and) ReLU.  Deploy form: each block is a single
fused 3×3 conv — produced by the pure pytree transform
:func:`dlmc_quant_tpu.models.fuse.repvgg_fuse` (the reference mutates
modules in place via ``switch_to_deploy``; ref:
model/classification/repvgg.py:132-147,297-305).

Capability parity: factories RepVGG_A0..B3g4 and D2se with the same
width multipliers / grouped-conv maps (ref: repvgg.py:197-277); block
structure ref: repvgg.py:22-64; SE ref: repvgg.py:307-322.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from dlmc_quant_tpu.models.registry import register
from dlmc_quant_tpu.quant.chain import materialize, qrelu
from dlmc_quant_tpu.quant.config import QuantScheme
from dlmc_quant_tpu.quant.layers import QConv, QDense

# global block indices using grouped convs in the g2/g4 variants
# (ref: repvgg.py:191-195)
_OPTIONAL_GROUPWISE_LAYERS = [2, 4, 6, 8, 10, 12, 14, 16, 18, 20, 22, 24, 26]
_G2_MAP = {l: 2 for l in _OPTIONAL_GROUPWISE_LAYERS}
_G4_MAP = {l: 4 for l in _OPTIONAL_GROUPWISE_LAYERS}


class SEBlock(nn.Module):
    """Squeeze-and-excitation (ref: repvgg.py:307-322)."""
    channels: int
    ratio: int = 16
    scheme: Optional[QuantScheme] = None

    @nn.compact
    def __call__(self, x, qmode: str = "eval"):
        from dlmc_quant_tpu.quant.chain import materialize
        x = materialize(x)          # SE gating needs concrete values
        qmode = "int" if qmode == "intc" else qmode
        s = jnp.mean(x, axis=(1, 2))                    # (N, C)
        s = QDense(self.channels // self.ratio, name="down",
                   scheme=self.scheme)(s, qmode=qmode)
        s = nn.relu(s)
        s = QDense(self.channels, name="up",
                   scheme=self.scheme)(s, qmode=qmode)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


class RepVGGBlock(nn.Module):
    """3×3 ∥ 1×1 ∥ identity branches (train) or fused conv (deploy).

    ref: repvgg.py:22-90
    """
    features: int
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1
    use_se: bool = False
    deploy: bool = False
    scheme: Optional[QuantScheme] = None

    @nn.compact
    def __call__(self, x, train: bool = False, qmode: str = "eval"):
        if not self.deploy and qmode == "intc":
            qmode = "int"       # chaining needs the fused single-conv form
        if self.deploy:
            out = QConv(self.features, (3, 3), self.strides, padding=[(1, 1), (1, 1)],
                        feature_group_count=self.groups, use_bias=True,
                        name="reparam", scheme=self.scheme)(x, qmode=qmode)
        else:
            norm = lambda name: nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=name)
            dense = QConv(self.features, (3, 3), self.strides,
                          padding=[(1, 1), (1, 1)],
                          feature_group_count=self.groups, use_bias=False,
                          name="rbr_dense", scheme=self.scheme)(x, qmode=qmode)
            dense = norm("rbr_dense_bn")(dense)
            one = QConv(self.features, (1, 1), self.strides, padding="VALID",
                        feature_group_count=self.groups, use_bias=False,
                        name="rbr_1x1", scheme=self.scheme)(x, qmode=qmode)
            one = norm("rbr_1x1_bn")(one)
            out = dense + one
            if x.shape[-1] == self.features and self.strides == (1, 1):
                out = out + norm("rbr_identity")(x)
        if self.use_se:
            out = SEBlock(self.features, name="se",
                          scheme=self.scheme)(out, qmode=qmode)
        # qrelu stays lazy on a chained (qmode='intc') deferred epilogue
        # so the consumer layer can fold ReLU+quantize into one clamp
        return qrelu(out)


class RepVGG(nn.Module):
    """ref: repvgg.py:150-195 (architecture), stages of RepVGGBlocks."""
    num_blocks: Tuple[int, ...] = (2, 4, 14, 1)
    width_multiplier: Tuple[float, ...] = (0.75, 0.75, 0.75, 2.5)
    num_classes: int = 1000
    override_groups_map: Optional[Dict[int, int]] = None
    use_se: bool = False
    deploy: bool = False
    scheme: Optional[QuantScheme] = None

    @nn.compact
    def __call__(self, x, train: bool = False, qmode: str = "eval"):
        gmap = self.override_groups_map or {}
        widths = [int(64 * self.width_multiplier[0]),
                  int(128 * self.width_multiplier[1]),
                  int(256 * self.width_multiplier[2]),
                  int(512 * self.width_multiplier[3])]
        stage0_w = min(64, int(64 * self.width_multiplier[0]))

        x = RepVGGBlock(stage0_w, strides=(2, 2), use_se=self.use_se,
                        deploy=self.deploy, name="stage0",
                        scheme=self.scheme)(x, train=train, qmode=qmode)
        layer_idx = 1
        for si, (n, w) in enumerate(zip(self.num_blocks, widths), start=1):
            for bi in range(n):
                strides = (2, 2) if bi == 0 else (1, 1)
                groups = gmap.get(layer_idx, 1)
                x = RepVGGBlock(
                    w, strides=strides, groups=groups, use_se=self.use_se,
                    deploy=self.deploy, name=f"stage{si}_{bi}",
                    scheme=self.scheme)(x, train=train, qmode=qmode)
                layer_idx += 1
        x = jnp.mean(materialize(x), axis=(1, 2))
        return materialize(QDense(self.num_classes, name="linear",
                                  scheme=self.scheme)(x, qmode=qmode))


def _factory(name, num_blocks, widths, gmap=None, use_se=False):
    @register(name)
    def fn(num_classes: int = 1000, deploy: bool = False, scheme=None,
           **kw):
        return RepVGG(num_blocks=num_blocks, width_multiplier=widths,
                      num_classes=num_classes,
                      override_groups_map=gmap, use_se=use_se,
                      deploy=deploy, scheme=scheme, **kw)
    fn.__name__ = name
    return fn


# factories, same variants as ref: repvgg.py:197-277
RepVGG_A0 = _factory("RepVGG_A0", (2, 4, 14, 1), (0.75, 0.75, 0.75, 2.5))
RepVGG_A1 = _factory("RepVGG_A1", (2, 4, 14, 1), (1.0, 1.0, 1.0, 2.5))
RepVGG_A2 = _factory("RepVGG_A2", (2, 4, 14, 1), (1.5, 1.5, 1.5, 2.75))
RepVGG_B0 = _factory("RepVGG_B0", (4, 6, 16, 1), (1.0, 1.0, 1.0, 2.5))
RepVGG_B1 = _factory("RepVGG_B1", (4, 6, 16, 1), (2.0, 2.0, 2.0, 4.0))
RepVGG_B1g2 = _factory("RepVGG_B1g2", (4, 6, 16, 1), (2.0, 2.0, 2.0, 4.0), _G2_MAP)
RepVGG_B1g4 = _factory("RepVGG_B1g4", (4, 6, 16, 1), (2.0, 2.0, 2.0, 4.0), _G4_MAP)
RepVGG_B2 = _factory("RepVGG_B2", (4, 6, 16, 1), (2.5, 2.5, 2.5, 5.0))
RepVGG_B2g2 = _factory("RepVGG_B2g2", (4, 6, 16, 1), (2.5, 2.5, 2.5, 5.0), _G2_MAP)
RepVGG_B2g4 = _factory("RepVGG_B2g4", (4, 6, 16, 1), (2.5, 2.5, 2.5, 5.0), _G4_MAP)
RepVGG_B3 = _factory("RepVGG_B3", (4, 6, 16, 1), (3.0, 3.0, 3.0, 5.0))
RepVGG_B3g2 = _factory("RepVGG_B3g2", (4, 6, 16, 1), (3.0, 3.0, 3.0, 5.0), _G2_MAP)
RepVGG_B3g4 = _factory("RepVGG_B3g4", (4, 6, 16, 1), (3.0, 3.0, 3.0, 5.0), _G4_MAP)
RepVGG_D2se = _factory("RepVGG_D2se", (8, 14, 24, 1), (2.5, 2.5, 2.5, 5.0),
                       use_se=True)
