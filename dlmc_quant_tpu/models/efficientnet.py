"""EfficientNet-B0..B7 (NHWC, flax): MBConv + SE + swish + drop-connect.

Capability parity: ref: model/classification/efficientnet.py +
efficientnet_block.py (Swish/SE/drop-connect/SameConv, CIFAR factories
cifar_efficientnetb0..b7).  Compound-scaling coefficients are the
standard (width, depth, dropout) table.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dlmc_quant_tpu.models.registry import register
from dlmc_quant_tpu.quant.config import QuantScheme
from dlmc_quant_tpu.quant.layers import QConv, QDense


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-3, name=name)


def _round_filters(filters, width_mult, divisor=8):
    filters *= width_mult
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def _round_repeats(repeats, depth_mult):
    return int(math.ceil(depth_mult * repeats))


def _drop_connect(x, rate, deterministic, rng):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
    return x * mask / keep


class MBConv(nn.Module):
    features: int
    kernel_size: int = 3
    strides: Tuple[int, int] = (1, 1)
    expand_ratio: int = 6
    se_ratio: float = 0.25
    drop_rate: float = 0.0
    deploy: bool = False
    scheme: Optional[QuantScheme] = None

    @nn.compact
    def __call__(self, x, train=False, qmode="eval"):
        dep = self.deploy
        swish = nn.swish
        in_features = x.shape[-1]
        hidden = in_features * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = QConv(hidden, (1, 1), use_bias=dep, name="expand",
                      scheme=self.scheme)(y, qmode=qmode)
            y = swish(y if dep else _bn(train, "expand_bn")(y))
        k = self.kernel_size
        y = QConv(hidden, (k, k), self.strides,
                  padding=[(k // 2, k // 2)] * 2, feature_group_count=hidden,
                  use_bias=dep, name="depthwise",
                  scheme=self.scheme)(y, qmode=qmode)
        y = swish(y if dep else _bn(train, "depthwise_bn")(y))
        if self.se_ratio > 0:
            red = max(1, int(in_features * self.se_ratio))
            s = jnp.mean(y, axis=(1, 2))
            s = swish(QDense(red, name="se_reduce",
                             scheme=self.scheme)(s, qmode=qmode))
            s = nn.sigmoid(QDense(hidden, name="se_expand",
                                  scheme=self.scheme)(s, qmode=qmode))
            y = y * s[:, None, None, :]
        y = QConv(self.features, (1, 1), use_bias=dep, name="project",
                  scheme=self.scheme)(y, qmode=qmode)
        if not dep:
            y = _bn(train, "project_bn")(y)
        if self.strides == (1, 1) and in_features == self.features:
            if train and self.drop_rate > 0:
                y = _drop_connect(y, self.drop_rate, not train,
                                  self.make_rng("dropout"))
            y = y + x
        return y


class EfficientNet(nn.Module):
    width_mult: float = 1.0
    depth_mult: float = 1.0
    dropout: float = 0.2
    num_classes: int = 1000
    cifar: bool = False
    deploy: bool = False           # BN-folded twin (swish keeps the int
    scheme: Optional[QuantScheme] = None   # path un-chained: intc->int)

    # (expand, channels, repeats, stride, kernel)
    CFG = ((1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
           (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
           (6, 320, 1, 1, 3))

    @nn.compact
    def __call__(self, x, train=False, qmode="eval"):
        dep = self.deploy
        if qmode == "intc":
            qmode = "int"       # swish closes every chain anyway
        stem = _round_filters(32, self.width_mult)
        stride = (1, 1) if self.cifar else (2, 2)
        x = QConv(stem, (3, 3), stride, use_bias=dep, name="conv_stem",
                  scheme=self.scheme)(x, qmode=qmode)
        x = nn.swish(x if dep else _bn(train, "bn_stem")(x))
        total_blocks = sum(_round_repeats(r, self.depth_mult)
                           for (_, _, r, _, _) in self.CFG)
        bi = 0
        for si, (t, c, r, s, k) in enumerate(self.CFG):
            c = _round_filters(c, self.width_mult)
            r = _round_repeats(r, self.depth_mult)
            if self.cifar and si == 1:
                s = 1
            for j in range(r):
                strides = (s, s) if j == 0 else (1, 1)
                drop = self.dropout * bi / max(total_blocks, 1)
                x = MBConv(c, k, strides, expand_ratio=t,
                           drop_rate=drop, deploy=dep,
                           name=f"block{si}_{j}",
                           scheme=self.scheme)(x, train=train, qmode=qmode)
                bi += 1
        head = _round_filters(1280, self.width_mult)
        x = QConv(head, (1, 1), use_bias=dep, name="conv_head",
                  scheme=self.scheme)(x, qmode=qmode)
        x = nn.swish(x if dep else _bn(train, "bn_head")(x))
        x = jnp.mean(x, axis=(1, 2))
        if train and self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return QDense(self.num_classes, name="linear",
                      scheme=self.scheme)(x, qmode=qmode)


# (width, depth, dropout) per variant
_COEFFS = {
    "b0": (1.0, 1.0, 0.2), "b1": (1.0, 1.1, 0.2), "b2": (1.1, 1.2, 0.3),
    "b3": (1.2, 1.4, 0.3), "b4": (1.4, 1.8, 0.4), "b5": (1.6, 2.2, 0.4),
    "b6": (1.8, 2.6, 0.5), "b7": (2.0, 3.1, 0.5),
}

for _v, (_w, _d, _p) in _COEFFS.items():
    def _mk(v=_v, w=_w, d=_d, p=_p):
        @register(f"cifar_efficientnet{v}")
        def cifar_fn(num_classes: int = 10, scheme=None, **kw):
            return EfficientNet(w, d, p, num_classes, cifar=True,
                                scheme=scheme, **kw)

        @register(f"efficientnet{v}")
        def fn(num_classes: int = 1000, scheme=None, **kw):
            return EfficientNet(w, d, p, num_classes, scheme=scheme, **kw)
        return cifar_fn, fn
    _mk()
