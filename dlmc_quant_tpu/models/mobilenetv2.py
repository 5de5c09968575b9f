"""MobileNetV2 (NHWC, flax): CIFAR and ImageNet/PROFIT variants.

Inverted-residual (expand 1×1 → depthwise 3×3 → project 1×1) blocks.
Capability parity: ref: model/classification/cifar_mobilenet_v2.py (264
LoC, CIFAR stride layout) and mobilenet_profit.py (ImageNet variant with
ReLU activations for quantization friendliness).

Every variant also has a **deploy form** (``deploy=True``): BatchNorms
folded into conv biases ahead of time
(:func:`dlmc_quant_tpu.models.fuse.mobilenet_deploy`), activations as
chain-aware ReLU6/ReLU, and the linear-bottleneck residual adds closed
by ``QBlockOutput(relu=False)`` — so ``qmode='intc'`` runs the network
int8-resident end-to-end (the ReLU6 upper clamp folds into the
consumer's quantize, quant/chain.py:qrelu6).  The reference runs BN at
inference forever (ref: dlmc/utils/merge_bn.py exists but its deploy
path stops at fp32 emulation).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from dlmc_quant_tpu.models.registry import register
from dlmc_quant_tpu.quant.chain import materialize, qrelu, qrelu6
from dlmc_quant_tpu.quant.config import QuantScheme
from dlmc_quant_tpu.quant.layers import QBlockOutput, QConv, QDense


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


def _make_divisible(v, divisor=8, min_value=None):
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class InvertedResidual(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    expand_ratio: int = 6
    relu6: bool = True
    deploy: bool = False
    scheme: Optional[QuantScheme] = None

    @nn.compact
    def __call__(self, x, train: bool = False, qmode: str = "eval"):
        dep = self.deploy
        act = qrelu6 if self.relu6 else qrelu
        in_features = x.shape[-1]
        hidden = in_features * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = QConv(hidden, (1, 1), use_bias=dep, name="expand",
                      scheme=self.scheme)(y, qmode=qmode)
            y = act(y if dep else _bn(train, "expand_bn")(y))
        y = QConv(hidden, (3, 3), self.strides, feature_group_count=hidden,
                  use_bias=dep, name="depthwise",
                  scheme=self.scheme)(y, qmode=qmode)
        y = act(y if dep else _bn(train, "depthwise_bn")(y))
        y = QConv(self.features, (1, 1), use_bias=dep, name="project",
                  scheme=self.scheme)(y, qmode=qmode)
        if not dep:
            y = _bn(train, "project_bn")(y)
        if self.strides == (1, 1) and in_features == self.features:
            if dep:
                # linear bottleneck: residual add with NO activation
                return QBlockOutput(name="out_q", relu=False,
                                    scheme=self.scheme)(y, x, qmode=qmode)
            return y + x
        return y


class MobileNetV2(nn.Module):
    num_classes: int = 1000
    width_mult: float = 1.0
    cifar: bool = False         # stride-1 stem + first stage (32×32 inputs)
    relu6: bool = True
    deploy: bool = False
    scheme: Optional[QuantScheme] = None

    # (expansion, channels, repeats, stride)
    CFG = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
           (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))

    @nn.compact
    def __call__(self, x, train: bool = False, qmode: str = "eval"):
        dep = self.deploy
        if not dep and qmode == "intc":
            qmode = "int"       # chaining needs the BN-folded form
        act = qrelu6 if self.relu6 else qrelu
        stem = _make_divisible(32 * self.width_mult)
        stem_stride = (1, 1) if self.cifar else (2, 2)
        x = QConv(stem, (3, 3), stem_stride, use_bias=dep,
                  name="conv_stem", scheme=self.scheme)(x, qmode=qmode)
        x = act(x if dep else _bn(train, "bn_stem")(x))
        for si, (t, c, n, s) in enumerate(self.CFG):
            c = _make_divisible(c * self.width_mult)
            if self.cifar and si == 1:
                s = 1
            for bi in range(n):
                strides = (s, s) if bi == 0 else (1, 1)
                x = InvertedResidual(
                    c, strides, expand_ratio=t, relu6=self.relu6,
                    deploy=dep, name=f"block{si}_{bi}",
                    scheme=self.scheme)(x, train=train, qmode=qmode)
        head = _make_divisible(1280 * max(1.0, self.width_mult))
        x = QConv(head, (1, 1), use_bias=dep, name="conv_head",
                  scheme=self.scheme)(x, qmode=qmode)
        x = act(x if dep else _bn(train, "bn_head")(x))
        x = jnp.mean(materialize(x), axis=(1, 2))
        return materialize(QDense(self.num_classes, name="linear",
                                  scheme=self.scheme)(x, qmode=qmode))


@register("cifar_mobilenet_v2")
def cifar_mobilenet_v2(num_classes: int = 10, width_mult: float = 1.0,
                       scheme=None, **kw):
    """ref: model/classification/cifar_mobilenet_v2.py"""
    return MobileNetV2(num_classes=num_classes, width_mult=width_mult,
                       cifar=True, scheme=scheme, **kw)


@register("mobilenet_v2")
def mobilenet_v2(num_classes: int = 1000, width_mult: float = 1.0,
                 scheme=None, **kw):
    return MobileNetV2(num_classes=num_classes, width_mult=width_mult,
                       scheme=scheme, **kw)


@register("profit_mobilenet_v2")
def profit_mobilenet_v2(num_classes: int = 1000, width_mult: float = 1.0,
                        scheme=None, **kw):
    """ReLU (not ReLU6) variant for quantization friendliness.
    ref: model/classification/mobilenet_profit.py"""
    return MobileNetV2(num_classes=num_classes, width_mult=width_mult,
                       relu6=False, scheme=scheme, **kw)
