"""MobileOne (NHWC, flax): reparameterizable depthwise-separable network.

Each stage alternates depthwise and pointwise *reparam* blocks: at train
time a block is k parallel conv+BN branches (+ a scale 1×1 branch for
depthwise, + identity BN when shapes allow), summed and ReLU'd; at
deploy it fuses to a single conv — same capability class as RepVGG
branch fusion, which is what RepAPQ targets (MobileOne is named in the
north star; the reference repo itself has no MobileOne —
SURVEY.md §2.8).  Fusion transform: :func:`mobileone_fuse`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp

from dlmc_quant_tpu.models.fuse import (
    _bn_only_to_conv, _pad_1x1_to_3x3, fold_conv_bn,
)
from dlmc_quant_tpu.models.registry import register
from dlmc_quant_tpu.quant.config import QuantScheme
from dlmc_quant_tpu.quant.chain import materialize, qrelu
from dlmc_quant_tpu.quant.layers import QConv, QDense


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class MobileOneBlock(nn.Module):
    """One reparam conv block (either depthwise 3×3 or pointwise 1×1).

    Train form: ``num_conv_branches`` conv+BN branches ∥ (scale-branch
    1×1 conv+BN when kernel is 3×3) ∥ (identity BN when in==out and
    stride 1); deploy form: a single conv with bias.
    """
    features: int
    kernel_size: int = 3
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1
    num_conv_branches: int = 1
    deploy: bool = False
    scheme: Optional[QuantScheme] = None

    @nn.compact
    def __call__(self, x, train: bool = False, qmode: str = "eval"):
        k = self.kernel_size
        pad = [(k // 2, k // 2)] * 2
        if not self.deploy and qmode == "intc":
            qmode = "int"   # chaining needs the fused single-conv form
        if self.deploy:
            out = QConv(self.features, (k, k), self.strides, padding=pad,
                        feature_group_count=self.groups, use_bias=True,
                        name="reparam", scheme=self.scheme)(x, qmode=qmode)
            # lazy on a chained (intc) deferred epilogue — see quant/chain.py
            return qrelu(out)
        out = 0.0
        for b in range(self.num_conv_branches):
            y = QConv(self.features, (k, k), self.strides, padding=pad,
                      feature_group_count=self.groups, use_bias=False,
                      name=f"conv{b}", scheme=self.scheme)(x, qmode=qmode)
            out = out + _bn(train, f"conv{b}_bn")(y)
        if k > 1:
            y = QConv(self.features, (1, 1), self.strides, padding="VALID",
                      feature_group_count=self.groups, use_bias=False,
                      name="scale_branch", scheme=self.scheme)(x, qmode=qmode)
            out = out + _bn(train, "scale_branch_bn")(y)
        if x.shape[-1] == self.features and self.strides == (1, 1):
            out = out + _bn(train, "identity_bn")(x)
        return nn.relu(out)


class MobileOne(nn.Module):
    num_blocks: Tuple[int, ...] = (2, 8, 10, 1)
    width_multipliers: Tuple[float, ...] = (1.5, 1.5, 2.0, 2.5)
    num_conv_branches: int = 1
    num_classes: int = 1000
    deploy: bool = False
    scheme: Optional[QuantScheme] = None

    BASE = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False, qmode: str = "eval"):
        widths = [min(64, int(64 * self.width_multipliers[0]))] + [
            int(b * m) for b, m in zip(self.BASE, self.width_multipliers)]
        x = MobileOneBlock(widths[0], 3, (2, 2), deploy=self.deploy,
                           name="stage0",
                           scheme=self.scheme)(x, train=train, qmode=qmode)
        for si, (n, w) in enumerate(zip(self.num_blocks, widths[1:]),
                                    start=1):
            for bi in range(n):
                strides = (2, 2) if bi == 0 else (1, 1)
                in_ch = x.shape[-1]
                # depthwise then pointwise reparam blocks
                x = MobileOneBlock(
                    in_ch, 3, strides, groups=in_ch,
                    num_conv_branches=self.num_conv_branches,
                    deploy=self.deploy, name=f"stage{si}_{bi}_dw",
                    scheme=self.scheme)(x, train=train, qmode=qmode)
                x = MobileOneBlock(
                    w, 1, (1, 1),
                    num_conv_branches=self.num_conv_branches,
                    deploy=self.deploy, name=f"stage{si}_{bi}_pw",
                    scheme=self.scheme)(x, train=train, qmode=qmode)
        x = jnp.mean(materialize(x), axis=(1, 2))
        return materialize(QDense(self.num_classes, name="linear",
                                  scheme=self.scheme)(x, qmode=qmode))


def fuse_mobileone_block(block_params, block_stats, in_features: int,
                         kernel_size: int, groups: int,
                         num_conv_branches: int):
    """Fuse a MobileOneBlock's branches into (kernel, bias)."""
    def bn(name):
        p, s = block_params[name], block_stats[name]
        return p["scale"], p["bias"], s["mean"], s["var"]

    kernel, bias = None, None
    for b in range(num_conv_branches):
        kb, bb = fold_conv_bn(block_params[f"conv{b}"]["kernel"], None,
                              *bn(f"conv{b}_bn"))
        kernel = kb if kernel is None else kernel + kb
        bias = bb if bias is None else bias + bb
    if kernel_size > 1 and "scale_branch" in block_params:
        ks, bs = fold_conv_bn(
            _pad_1x1_to_3x3(block_params["scale_branch"]["kernel"]),
            None, *bn("scale_branch_bn"))
        kernel, bias = kernel + ks, bias + bs
    if "identity_bn" in block_params:
        kid, bid = _bn_only_to_conv(*bn("identity_bn"), in_features, groups)
        if kernel_size == 1:
            kid = kid[1:2, 1:2]
        kernel, bias = kernel + kid, bias + bid
    return kernel, bias


def mobileone_fuse(model: MobileOne, variables, example_input, rngs=None):
    """Train-form MobileOne → deploy-form (model, variables)."""
    deploy_model = dataclasses.replace(model, deploy=True)
    key = rngs if rngs is not None else jax.random.PRNGKey(0)
    deploy_vars = flax.core.unfreeze(deploy_model.init(key, example_input))
    params, stats = variables["params"], variables["batch_stats"]
    new_params = flax.core.unfreeze(deploy_vars["params"])

    def fuse_into(name, in_features, ksize, groups, branches=None):
        k, b = fuse_mobileone_block(
            params[name], stats[name], in_features, ksize, groups,
            model.num_conv_branches if branches is None else branches)
        new_params[name]["reparam"]["kernel"] = k
        new_params[name]["reparam"]["bias"] = b

    widths = [min(64, int(64 * model.width_multipliers[0]))] + [
        int(b * m) for b, m in zip(MobileOne.BASE, model.width_multipliers)]
    fuse_into("stage0", example_input.shape[-1], 3, 1, branches=1)
    cur = widths[0]
    for si, (n, w) in enumerate(zip(model.num_blocks, widths[1:]), start=1):
        for bi in range(n):
            fuse_into(f"stage{si}_{bi}_dw", cur, 3, cur)
            fuse_into(f"stage{si}_{bi}_pw", cur, 1, 1)
            cur = w
    new_params["linear"] = params["linear"]
    deploy_vars["params"] = new_params
    deploy_vars.pop("batch_stats", None)
    return deploy_model, deploy_vars


def _factory(name, blocks, widths, k):
    @register(name)
    def fn(num_classes: int = 1000, deploy: bool = False, scheme=None, **kw):
        return MobileOne(num_blocks=blocks, width_multipliers=widths,
                         num_conv_branches=k, num_classes=num_classes,
                         deploy=deploy, scheme=scheme, **kw)
    fn.__name__ = name
    return fn


MobileOne_S0 = _factory("MobileOne_S0", (2, 8, 10, 1),
                        (0.75, 1.0, 1.0, 2.0), 4)
MobileOne_S1 = _factory("MobileOne_S1", (2, 8, 10, 1),
                        (1.5, 1.5, 2.0, 2.5), 1)
MobileOne_S2 = _factory("MobileOne_S2", (2, 8, 10, 1),
                        (1.5, 2.0, 2.5, 4.0), 1)
MobileOne_S3 = _factory("MobileOne_S3", (2, 8, 10, 1),
                        (2.0, 2.5, 3.0, 4.0), 1)
MobileOne_S4 = _factory("MobileOne_S4", (2, 8, 10, 1),
                        (3.0, 3.5, 3.5, 4.0), 1)
