"""CIFAR ResNets (NHWC, flax): resnet20..1202 and resnet18..152 variants.

Capability parity with the reference's CIFAR zoo:
  ref: model/classification/cifarresnet.py (20/32/44/56/110/1202,
       3-stage 16/32/64 widths, option-A/B shortcuts)
  ref: model/classification/cifarresnet_large.py (18/34/50/101/152,
       ImageNet-style blocks with a 3×3 CIFAR stem)

Every variant also has a **deploy form** (``deploy=True``): BatchNorms
are folded into the conv biases ahead of time
(:func:`dlmc_quant_tpu.models.fuse.resnet_deploy`), so the runtime
graph is conv(+bias) → relu chains plus residual adds — the form the
int8 path wants, with intra-block boundaries chained via
``qmode='intc'`` (quant/chain.py).  The reference has no deploy form
for ResNets; it runs BN at inference forever.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from dlmc_quant_tpu.models.registry import register
from dlmc_quant_tpu.quant.chain import (QuantizedTensor, materialize,
                                         qmaxpool, qrelu)
from dlmc_quant_tpu.quant.config import QuantScheme
from dlmc_quant_tpu.quant.layers import QBlockOutput, QConv, QDense


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class BasicBlock(nn.Module):
    """3×3 + 3×3 residual block.  ref: cifarresnet.py BasicBlock."""
    features: int
    strides: Tuple[int, int] = (1, 1)
    option: str = "B"  # 'A' = pad shortcut (CIFAR), 'B' = 1x1 conv
    deploy: bool = False
    scheme: Optional[QuantScheme] = None

    @nn.compact
    def __call__(self, x, train: bool = False, qmode: str = "eval"):
        dep = self.deploy
        if not dep and qmode == "intc":
            qmode = "int"       # chaining needs the BN-folded form
        residual = x
        y = QConv(self.features, (3, 3), self.strides, use_bias=dep,
                  name="conv1", scheme=self.scheme)(x, qmode=qmode)
        if not dep:
            y = _bn(train, "bn1")(y)
        y = qrelu(y)
        y = QConv(self.features, (3, 3), use_bias=dep,
                  name="conv2", scheme=self.scheme)(y, qmode=qmode)
        if not dep:
            y = _bn(train, "bn2")(y)
        if self.strides != (1, 1) or x.shape[-1] != self.features:
            if self.option == "A":
                # parameter-free: stride-subsample + zero-pad channels
                pad = self.features - x.shape[-1]
                pads = ((0, 0), (0, 0), (0, 0),
                        (pad // 2, pad - pad // 2))
                if isinstance(x, QuantizedTensor):
                    # chained codes: slice codes, pad with the code for
                    # real 0 — stays int8-resident through the shortcut
                    qc = x.q[:, ::self.strides[0], ::self.strides[1], :]
                    residual = QuantizedTensor(
                        jnp.pad(qc, pads, constant_values=x.zero_code()),
                        x.scale, x.bias)
                else:
                    residual = jnp.pad(
                        materialize(x)[:, ::self.strides[0],
                                       ::self.strides[1], :], pads)
            else:
                residual = QConv(self.features, (1, 1), self.strides,
                                 use_bias=dep, name="downsample",
                                 scheme=self.scheme)(x, qmode=qmode)
                if not dep:
                    residual = _bn(train, "downsample_bn")(residual)
        if dep:
            return QBlockOutput(name="out_q", scheme=self.scheme)(
                y, residual, qmode=qmode)
        return nn.relu(materialize(y) + materialize(residual))


class Bottleneck(nn.Module):
    """1×1-3×3-1×1 bottleneck (expansion 4).  ref: cifarresnet_large.py."""
    features: int
    strides: Tuple[int, int] = (1, 1)
    deploy: bool = False
    scheme: Optional[QuantScheme] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False, qmode: str = "eval"):
        dep = self.deploy
        if not dep and qmode == "intc":
            qmode = "int"
        out_features = self.features * self.expansion
        residual = x
        y = QConv(self.features, (1, 1), use_bias=dep, name="conv1",
                  scheme=self.scheme)(x, qmode=qmode)
        y = qrelu(y if dep else _bn(train, "bn1")(y))
        y = QConv(self.features, (3, 3), self.strides, use_bias=dep,
                  name="conv2", scheme=self.scheme)(y, qmode=qmode)
        y = qrelu(y if dep else _bn(train, "bn2")(y))
        y = QConv(out_features, (1, 1), use_bias=dep, name="conv3",
                  scheme=self.scheme)(y, qmode=qmode)
        if not dep:
            y = _bn(train, "bn3")(y)
        if self.strides != (1, 1) or x.shape[-1] != out_features:
            residual = QConv(out_features, (1, 1), self.strides,
                             use_bias=dep, name="downsample",
                             scheme=self.scheme)(x, qmode=qmode)
            if not dep:
                residual = _bn(train, "downsample_bn")(residual)
        if dep:
            return QBlockOutput(name="out_q", scheme=self.scheme)(
                y, residual, qmode=qmode)
        return nn.relu(materialize(y) + materialize(residual))


class CifarResNet(nn.Module):
    """3-stage CIFAR ResNet (widths 16/32/64).  ref: cifarresnet.py."""
    depth_n: int = 3                       # blocks per stage; depth = 6n+2
    num_classes: int = 10
    option: str = "A"
    deploy: bool = False
    scheme: Optional[QuantScheme] = None

    @nn.compact
    def __call__(self, x, train: bool = False, qmode: str = "eval"):
        if not self.deploy and qmode == "intc":
            qmode = "int"       # chaining needs the BN-folded form
        x = QConv(16, (3, 3), use_bias=self.deploy, name="conv1",
                  scheme=self.scheme)(x, qmode=qmode)
        if not self.deploy:
            x = _bn(train, "bn1")(x)
        x = qrelu(x)
        for si, w in enumerate((16, 32, 64), start=1):
            for bi in range(self.depth_n):
                strides = (2, 2) if (bi == 0 and si > 1) else (1, 1)
                x = BasicBlock(w, strides, option=self.option,
                               deploy=self.deploy, name=f"layer{si}_{bi}",
                               scheme=self.scheme)(x, train=train,
                                                   qmode=qmode)
        x = jnp.mean(materialize(x), axis=(1, 2))
        return materialize(QDense(self.num_classes, name="linear",
                                  scheme=self.scheme)(x, qmode=qmode))


class CifarResNetLarge(nn.Module):
    """ImageNet-style ResNet; CIFAR 3×3 stem or ImageNet 7×7+maxpool stem.

    ref: cifarresnet_large.py (18/34 BasicBlock, 50/101/152 Bottleneck);
    the ``imagenet_stem`` variant mirrors torchvision resnet50 etc., which
    the reference re-exports wholesale (model/__init__.py:1-4).
    """
    stage_sizes: Tuple[int, ...] = (2, 2, 2, 2)
    bottleneck: bool = False
    num_classes: int = 10
    imagenet_stem: bool = False
    deploy: bool = False
    scheme: Optional[QuantScheme] = None

    @nn.compact
    def __call__(self, x, train: bool = False, qmode: str = "eval"):
        if not self.deploy and qmode == "intc":
            qmode = "int"       # chaining needs the BN-folded form
        if self.imagenet_stem:
            x = QConv(64, (7, 7), (2, 2), use_bias=self.deploy,
                      name="conv1", scheme=self.scheme)(x, qmode=qmode)
            if not self.deploy:
                x = _bn(train, "bn1")(x)
            # maxpool commutes with the (monotone) epilogue: stays lazy
            # on the chain so block1 folds relu+quantize (chain.qmaxpool)
            x = qmaxpool(qrelu(x), (3, 3), (2, 2), ((1, 1), (1, 1)))
        else:
            x = QConv(64, (3, 3), use_bias=self.deploy, name="conv1",
                      scheme=self.scheme)(x, qmode=qmode)
            if not self.deploy:
                x = _bn(train, "bn1")(x)
            x = qrelu(x)
        block = Bottleneck if self.bottleneck else BasicBlock
        for si, (n, w) in enumerate(zip(self.stage_sizes,
                                        (64, 128, 256, 512)), start=1):
            for bi in range(n):
                strides = (2, 2) if (bi == 0 and si > 1) else (1, 1)
                x = block(w, strides, deploy=self.deploy,
                          name=f"layer{si}_{bi}",
                          scheme=self.scheme)(x, train=train, qmode=qmode)
        x = jnp.mean(materialize(x), axis=(1, 2))
        return materialize(QDense(self.num_classes, name="linear",
                                  scheme=self.scheme)(x, qmode=qmode))


def _small(name, n):
    @register(name)
    def fn(num_classes: int = 10, scheme=None, option: str = "A", **kw):
        return CifarResNet(depth_n=n, num_classes=num_classes,
                           option=option, scheme=scheme, **kw)
    fn.__name__ = name
    return fn


def _large(name, sizes, bottleneck):
    @register(name)
    def fn(num_classes: int = 10, scheme=None, **kw):
        return CifarResNetLarge(stage_sizes=sizes, bottleneck=bottleneck,
                                num_classes=num_classes, scheme=scheme, **kw)
    fn.__name__ = name
    return fn


cifar_resnet20 = _small("cifar_resnet20", 3)
cifar_resnet32 = _small("cifar_resnet32", 5)
cifar_resnet44 = _small("cifar_resnet44", 7)
cifar_resnet56 = _small("cifar_resnet56", 9)
cifar_resnet110 = _small("cifar_resnet110", 18)
cifar_resnet1202 = _small("cifar_resnet1202", 200)

cifar_resnet18 = _large("cifar_resnet18", (2, 2, 2, 2), False)
cifar_resnet34 = _large("cifar_resnet34", (3, 4, 6, 3), False)
cifar_resnet50 = _large("cifar_resnet50", (3, 4, 6, 3), True)
cifar_resnet101 = _large("cifar_resnet101", (3, 4, 23, 3), True)
cifar_resnet152 = _large("cifar_resnet152", (3, 8, 36, 3), True)


def _imagenet(name, sizes, bottleneck):
    @register(name)
    def fn(num_classes: int = 1000, scheme=None, **kw):
        return CifarResNetLarge(stage_sizes=sizes, bottleneck=bottleneck,
                                num_classes=num_classes, imagenet_stem=True,
                                scheme=scheme, **kw)
    fn.__name__ = name
    return fn


resnet18 = _imagenet("resnet18", (2, 2, 2, 2), False)
resnet34 = _imagenet("resnet34", (3, 4, 6, 3), False)
resnet50 = _imagenet("resnet50", (3, 4, 6, 3), True)
resnet101 = _imagenet("resnet101", (3, 4, 23, 3), True)
resnet152 = _imagenet("resnet152", (3, 8, 36, 3), True)
