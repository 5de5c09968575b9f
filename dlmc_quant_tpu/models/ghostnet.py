"""GhostNet (NHWC, flax).

Ghost modules generate half the features with a regular conv and the
rest with a cheap depthwise conv over them; bottlenecks with optional SE
and depthwise stride.  Capability parity: ref:
model/classification/ghostnet.py (261 LoC, width-1.0 config table).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from dlmc_quant_tpu.models.mobilenetv2 import _make_divisible
from dlmc_quant_tpu.models.registry import register
from dlmc_quant_tpu.quant.chain import materialize, qrelu
from dlmc_quant_tpu.quant.config import QuantScheme
from dlmc_quant_tpu.quant.layers import QBlockOutput, QConv, QDense


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


def _hard_sigmoid(x):
    return jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


class SqueezeExcite(nn.Module):
    channels: int
    se_ratio: float = 0.25
    scheme: Optional[QuantScheme] = None

    @nn.compact
    def __call__(self, x, qmode="eval"):
        x = materialize(x)          # SE gating needs concrete values
        qmode = "int" if qmode == "intc" else qmode
        red = _make_divisible(self.channels * self.se_ratio, 4)
        s = jnp.mean(x, axis=(1, 2))
        s = nn.relu(QDense(red, name="reduce",
                           scheme=self.scheme)(s, qmode=qmode))
        s = _hard_sigmoid(QDense(self.channels, name="expand",
                                 scheme=self.scheme)(s, qmode=qmode))
        return x * s[:, None, None, :]


class GhostModule(nn.Module):
    features: int
    kernel_size: int = 1
    ratio: int = 2
    dw_size: int = 3
    strides: Tuple[int, int] = (1, 1)
    relu: bool = True
    deploy: bool = False
    scheme: Optional[QuantScheme] = None

    @nn.compact
    def __call__(self, x, train=False, qmode="eval"):
        dep = self.deploy
        init_ch = -(-self.features // self.ratio)
        new_ch = init_ch * (self.ratio - 1)
        k, d = self.kernel_size, self.dw_size
        y1 = QConv(init_ch, (k, k), self.strides,
                   padding=[(k // 2, k // 2)] * 2, use_bias=dep,
                   name="primary", scheme=self.scheme)(x, qmode=qmode)
        if not dep:
            y1 = _bn(train, "primary_bn")(y1)
        if self.relu:
            y1 = qrelu(y1)
        y2 = QConv(new_ch, (d, d), padding=[(d // 2, d // 2)] * 2,
                   feature_group_count=init_ch, use_bias=dep,
                   name="cheap", scheme=self.scheme)(y1, qmode=qmode)
        if not dep:
            y2 = _bn(train, "cheap_bn")(y2)
        if self.relu:
            y2 = qrelu(y2)
        # concat closes the chain (two independent grids)
        return jnp.concatenate([materialize(y1), materialize(y2)],
                               axis=-1)[..., :self.features]


class GhostBottleneck(nn.Module):
    mid_features: int
    out_features: int
    dw_kernel_size: int = 3
    strides: Tuple[int, int] = (1, 1)
    se_ratio: float = 0.0
    deploy: bool = False
    scheme: Optional[QuantScheme] = None

    @nn.compact
    def __call__(self, x, train=False, qmode="eval"):
        dep = self.deploy
        shortcut = x
        y = GhostModule(self.mid_features, relu=True, name="ghost1",
                        deploy=dep,
                        scheme=self.scheme)(x, train=train, qmode=qmode)
        if self.strides != (1, 1):
            k = self.dw_kernel_size
            y = QConv(self.mid_features, (k, k), self.strides,
                      padding=[(k // 2, k // 2)] * 2,
                      feature_group_count=self.mid_features, use_bias=dep,
                      name="dw", scheme=self.scheme)(y, qmode=qmode)
            if not dep:
                y = _bn(train, "dw_bn")(y)
        if self.se_ratio > 0:
            y = SqueezeExcite(self.mid_features, self.se_ratio, name="se",
                              scheme=self.scheme)(y, qmode=qmode)
        y = GhostModule(self.out_features, relu=False, name="ghost2",
                        deploy=dep,
                        scheme=self.scheme)(y, train=train, qmode=qmode)
        if (x.shape[-1] != self.out_features or self.strides != (1, 1)):
            k = self.dw_kernel_size
            shortcut = QConv(x.shape[-1], (k, k), self.strides,
                             padding=[(k // 2, k // 2)] * 2,
                             feature_group_count=x.shape[-1],
                             use_bias=dep, name="shortcut_dw",
                             scheme=self.scheme)(x, qmode=qmode)
            if not dep:
                shortcut = _bn(train, "shortcut_dw_bn")(shortcut)
            shortcut = QConv(self.out_features, (1, 1), use_bias=dep,
                             name="shortcut_pw",
                             scheme=self.scheme)(shortcut, qmode=qmode)
            if not dep:
                shortcut = _bn(train, "shortcut_pw_bn")(shortcut)
        if dep:
            # ghost modules already materialized their concat, but the
            # shortcut may still be deferred; the block output quantizer
            # closes both onto one grid (no activation on the add)
            return QBlockOutput(name="out_q", relu=False,
                                scheme=self.scheme)(y, shortcut, qmode=qmode)
        return y + shortcut


class GhostNet(nn.Module):
    num_classes: int = 1000
    width: float = 1.0
    deploy: bool = False
    scheme: Optional[QuantScheme] = None

    # (dw_kernel, mid, out, se_ratio, stride) — standard GhostNet-1.0 table
    CFG = (
        ((3, 16, 16, 0, 1),),
        ((3, 48, 24, 0, 2),),
        ((3, 72, 24, 0, 1),),
        ((5, 72, 40, 0.25, 2),),
        ((5, 120, 40, 0.25, 1),),
        ((3, 240, 80, 0, 2),),
        ((3, 200, 80, 0, 1), (3, 184, 80, 0, 1), (3, 184, 80, 0, 1),
         (3, 480, 112, 0.25, 1), (3, 672, 112, 0.25, 1)),
        ((5, 672, 160, 0.25, 2),),
        ((5, 960, 160, 0, 1), (5, 960, 160, 0.25, 1),
         (5, 960, 160, 0, 1), (5, 960, 160, 0.25, 1)),
    )

    @nn.compact
    def __call__(self, x, train=False, qmode="eval"):
        dep = self.deploy
        if not dep and qmode == "intc":
            qmode = "int"       # chaining needs the BN-folded form
        w = self.width
        stem = _make_divisible(16 * w, 4)
        x = QConv(stem, (3, 3), (2, 2), use_bias=dep, name="conv_stem",
                  scheme=self.scheme)(x, qmode=qmode)
        x = qrelu(x if dep else _bn(train, "bn_stem")(x))
        bi = 0
        for stage in self.CFG:
            for (k, mid, out, se, s) in stage:
                x = GhostBottleneck(
                    _make_divisible(mid * w, 4), _make_divisible(out * w, 4),
                    k, (s, s), se_ratio=se, deploy=dep, name=f"block{bi}",
                    scheme=self.scheme)(x, train=train, qmode=qmode)
                bi += 1
        head = _make_divisible(960 * w, 4)
        x = QConv(head, (1, 1), use_bias=dep, name="conv_head",
                  scheme=self.scheme)(x, qmode=qmode)
        x = qrelu(x if dep else _bn(train, "bn_head")(x))
        x = jnp.mean(materialize(x), axis=(1, 2))
        x = qrelu(QDense(1280, name="fc1",
                         scheme=self.scheme)(x, qmode=qmode))
        return materialize(QDense(self.num_classes, name="linear",
                                  scheme=self.scheme)(x, qmode=qmode))


@register("ghostnet")
def ghostnet(num_classes: int = 1000, width: float = 1.0, scheme=None, **kw):
    return GhostNet(num_classes=num_classes, width=width, scheme=scheme,
                    **kw)
