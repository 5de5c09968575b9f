"""Reparameterization transforms: BN folding and RepVGG branch fusion.

Pure pytree→pytree weight algebra — the TPU-native replacement for the
reference's in-place module mutation (``switch_to_deploy`` ref:
model/classification/repvgg.py:132-147; ``merge_bn`` ref:
dlmc/utils/merge_bn.py:45-113).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax

BN_EPS = 1e-5


def fold_conv_bn(kernel, bias, gamma, beta, mean, var, eps: float = BN_EPS):
    """Fold BatchNorm(γ,β,μ,σ²) into a conv kernel/bias (HWIO layout).

    ``k' = k·γ/σ`` per output channel, ``b' = β + (b − μ)·γ/σ``.
    ref: merge_bn.py:64-111 (same algebra, torch OIHW there).
    """
    std = jnp.sqrt(var + eps)
    t = gamma / std                                     # (O,)
    kernel = kernel * t.reshape((1,) * (kernel.ndim - 1) + (-1,))
    if bias is None:
        bias = jnp.zeros_like(mean)
    return kernel, beta + (bias - mean) * t


def _bn_only_to_conv(gamma, beta, mean, var, in_features: int, groups: int,
                     eps: float = BN_EPS):
    """Express an identity-BN branch as an equivalent 3×3 conv (HWIO).

    ref: repvgg.py:104-130 (identity-as-3×3-kernel construction).
    """
    out_features = gamma.shape[0]
    ig = in_features // groups
    kernel = jnp.zeros((3, 3, ig, out_features))
    o = jnp.arange(out_features)
    kernel = kernel.at[1, 1, o % ig, o].set(1.0)
    return fold_conv_bn(kernel, None, gamma, beta, mean, var, eps)


def _pad_1x1_to_3x3(kernel):
    """Center a 1×1 kernel in a 3×3 (HWIO).  ref: repvgg.py:98-102"""
    return jnp.pad(kernel, ((1, 1), (1, 1), (0, 0), (0, 0)))


def fuse_repvgg_block(block_params, block_stats, in_features: int,
                      groups: int = 1):
    """Fuse one RepVGG block's three branches into (kernel3x3, bias).

    ref: repvgg.py:92-130 (get_equivalent_kernel_bias / _fuse_bn_tensor)
    """
    def bn(name):
        p, s = block_params[name], block_stats[name]
        return p["scale"], p["bias"], s["mean"], s["var"]

    k3, b3 = fold_conv_bn(block_params["rbr_dense"]["kernel"], None,
                          *bn("rbr_dense_bn"))
    k1, b1 = fold_conv_bn(_pad_1x1_to_3x3(block_params["rbr_1x1"]["kernel"]),
                          None, *bn("rbr_1x1_bn"))
    kernel, bias = k3 + k1, b3 + b1
    if "rbr_identity" in block_params:
        kid, bid = _bn_only_to_conv(*bn("rbr_identity"), in_features, groups)
        kernel, bias = kernel + kid, bias + bid
    return kernel, bias


def merge_bn(model, variables, example_input, allow_missing: bool = True):
    """Fold every Conv→BatchNorm pair's scale into the conv kernel.

    Generic, graph-driven equivalent of the reference's name-heuristic
    ``merge_bn`` (ref: dlmc/utils/merge_bn.py:13-113): conv→BN pairs are
    discovered from the traced compute graph, the kernel absorbs γ/σ,
    and the BN is neutralized into a pure bias-add (scale=1, mean=0,
    var=1−ε, bias=β−μγ/σ) — numerically exact, so quantizers downstream
    observe the *folded* weights, which is the point of BN merging
    before PTQ.

    Returns new variables; the model definition is unchanged.
    """
    from dlmc_quant_tpu.utils.count_ops import get_compute_graph

    graph = get_compute_graph(model, example_input, style="top")
    new_vars = jax.tree_util.tree_map(lambda a: a, flax.core.unfreeze(variables))
    params = new_vars["params"]
    stats = new_vars.get("batch_stats", {})

    def subtree(tree, path):
        node = tree
        for p in path.split("."):
            if p not in node:
                return None
            node = node[p]
        return node

    n_folded = 0
    for conv_path, consumers in graph.items():
        conv_p = subtree(params, conv_path)
        if conv_p is None or "kernel" not in conv_p:
            continue
        bns = [c for c in consumers
               if subtree(stats, c) is not None
               and "mean" in (subtree(stats, c) or {})]
        if len(bns) != 1:
            continue
        bn_path = bns[0]
        bn_p, bn_s = subtree(params, bn_path), subtree(stats, bn_path)
        eps = BN_EPS
        k, b = fold_conv_bn(conv_p["kernel"], conv_p.get("bias"),
                            bn_p["scale"], bn_p["bias"],
                            bn_s["mean"], bn_s["var"], eps)
        conv_p["kernel"] = k
        if "bias" in conv_p:
            conv_p["bias"] = jnp.zeros_like(conv_p["bias"])
        bn_p["scale"] = jnp.ones_like(bn_p["scale"])
        bn_p["bias"] = b
        bn_s["mean"] = jnp.zeros_like(bn_s["mean"])
        bn_s["var"] = jnp.full_like(bn_s["var"], 1.0 - eps)
        n_folded += 1
    if n_folded == 0 and not allow_missing:
        raise ValueError("merge_bn found no conv→BN pairs to fold")
    return new_vars


def repvgg_fuse(model, variables, example_input, rngs=None):
    """Train-form RepVGG → deploy-form (model, variables).

    Walks every block subtree in ``variables``, fuses branches, and
    populates a ``deploy=True`` model's variable tree (quantizer params,
    if a scheme is attached, are freshly initialized — calibrate after
    fusing, as the reference pipeline does:
    ref: example/quantization/FSPTQuant.py:65-80).
    """
    deploy_model = dataclasses.replace(model, deploy=True)
    key = rngs if rngs is not None else jax.random.PRNGKey(0)
    deploy_vars = deploy_model.init(key, example_input)
    deploy_vars = flax.core.unfreeze(deploy_vars)

    params = variables["params"]
    stats = variables["batch_stats"]
    new_params = flax.core.unfreeze(deploy_vars["params"])

    gmap = model.override_groups_map or {}
    widths = [int(64 * model.width_multiplier[0]),
              int(128 * model.width_multiplier[1]),
              int(256 * model.width_multiplier[2]),
              int(512 * model.width_multiplier[3])]

    def fuse_into(name, in_features, groups):
        k, b = fuse_repvgg_block(params[name], stats[name], in_features,
                                 groups)
        new_params[name]["reparam"]["kernel"] = k
        new_params[name]["reparam"]["bias"] = b
        if "se" in params[name]:
            new_params[name]["se"] = params[name]["se"]

    in_f = example_input.shape[-1]
    stage0_w = min(64, int(64 * model.width_multiplier[0]))
    fuse_into("stage0", in_f, 1)
    prev_w = stage0_w
    layer_idx = 1
    for si, (n, w) in enumerate(zip(model.num_blocks, widths), start=1):
        for bi in range(n):
            groups = gmap.get(layer_idx, 1)
            fuse_into(f"stage{si}_{bi}", prev_w, groups)
            prev_w = w
            layer_idx += 1
    new_params["linear"] = params["linear"]

    deploy_vars["params"] = new_params
    deploy_vars.pop("batch_stats", None)
    return deploy_model, deploy_vars


_RESNET_BN_PARTNERS = {"conv1": "bn1", "conv2": "bn2", "conv3": "bn3",
                       "downsample": "downsample_bn"}
_MOBILENET_BN_PARTNERS = {"expand": "expand_bn", "depthwise": "depthwise_bn",
                          "project": "project_bn", "conv_stem": "bn_stem",
                          "conv_head": "bn_head"}
_GHOSTNET_BN_PARTNERS = {"primary": "primary_bn", "cheap": "cheap_bn",
                         "dw": "dw_bn", "shortcut_dw": "shortcut_dw_bn",
                         "shortcut_pw": "shortcut_pw_bn",
                         "conv_stem": "bn_stem", "conv_head": "bn_head"}


def _fold_bn_deploy(model, variables, partners, example_input, rngs,
                    eps: float = BN_EPS):
    """Shared conv↔BN-partner fold into a ``deploy=True`` twin.

    Exact: same algebra as :func:`fold_conv_bn`
    (ref: dlmc/utils/merge_bn.py:64-111); the reference has no deploy
    conversion for non-reparam nets at all.
    """
    import jax as _jax

    deploy_model = dataclasses.replace(model, deploy=True)
    variables = flax.core.unfreeze(variables)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    rngs = rngs or _jax.random.PRNGKey(0)
    template = flax.core.unfreeze(
        _jax.jit(deploy_model.init)(rngs, example_input))

    def fold_level(p, s, tmpl):
        out = dict(tmpl)            # keeps template-only leaves (out_q)
        for k, v in p.items():
            bn = partners.get(k)
            if bn is not None and bn in p:
                kern, bias = fold_conv_bn(
                    v["kernel"], v.get("bias"),
                    p[bn]["scale"], p[bn]["bias"],
                    s[bn]["mean"], s[bn]["var"], eps)
                # carry the source conv's calibrated quantizer params
                # (in_scale/wt_scale/alpha) over the fresh-init template
                # — only kernel/bias change under BN folding.  NOTE:
                # weight scales calibrated on the *unfolded* kernel do
                # not describe the folded one; rerun calibrate (and
                # prepare_deploy) after conversion, as the deploy
                # pipeline does (ref: example/quantization/
                # FSPTQuant.py:65-80 refits after merge_bn too).
                out[k] = {**tmpl.get(k, {}),
                          **{kk: vv for kk, vv in v.items()
                             if kk not in ("kernel", "bias")},
                          "kernel": kern, "bias": bias}
            elif k in partners.values():
                continue                      # absorbed into its conv
            elif isinstance(v, dict):
                out[k] = fold_level(v, s.get(k, {}), tmpl.get(k, {}))
            else:
                out[k] = v
        return out

    def deep_merge(tmpl, src):
        """Overlay source leaves on the template (template-only leaves —
        e.g. the deploy-form block-output quantizer state — survive)."""
        if not isinstance(tmpl, dict) or not isinstance(src, dict):
            return src
        out = dict(tmpl)
        for k, v in src.items():
            out[k] = deep_merge(tmpl.get(k), v) if k in tmpl else v
        return out

    new_vars = {"params": fold_level(params, stats, template["params"])}
    for col, tree in template.items():
        if col not in ("params", "batch_stats"):
            new_vars[col] = tree
    for col, tree in variables.items():
        if col not in ("params", "batch_stats"):
            new_vars[col] = deep_merge(new_vars.get(col, {}), tree)
    return deploy_model, new_vars


def resnet_deploy(model, variables, example_input=None, rngs=None):
    """Train-form ResNet → BN-free deploy form (model, variables).

    The deploy twin's forward is pure conv(+bias) → relu chains plus
    residual adds closed by block-output quantizers — the graph the
    chained int8 path (qmode='intc') wants.  Works for CifarResNet /
    CifarResNetLarge (all resnet* factories); partner discovery by this
    zoo's fixed naming (conv1↔bn1, …, downsample↔downsample_bn).
    NOTE: rerun ``calibrate`` + ``prepare_deploy`` after conversion —
    scales calibrated on the train form do not describe the folded
    weights (the reference pipeline refits after merge_bn too,
    ref: example/quantization/FSPTQuant.py:65-80).
    """
    if example_input is None:
        example_input = jnp.zeros((1, 32, 32, 3), jnp.float32)
    return _fold_bn_deploy(model, variables, _RESNET_BN_PARTNERS,
                           example_input, rngs)


def ghostnet_deploy(model, variables, example_input=None, rngs=None):
    """Train-form GhostNet → BN-free deploy form (model, variables).

    Ghost-module concats close the chain (two independent grids), but
    every conv runs BN-free int8 and bottleneck residual adds chain
    through ``QBlockOutput`` (models/ghostnet.py).  Rerun ``calibrate``
    + ``prepare_deploy`` after conversion.
    """
    if example_input is None:
        example_input = jnp.zeros((1, 224, 224, 3), jnp.float32)
    return _fold_bn_deploy(model, variables, _GHOSTNET_BN_PARTNERS,
                           example_input, rngs)


def efficientnet_deploy(model, variables, example_input=None, rngs=None):
    """Train-form EfficientNet → BN-free deploy form (model, variables).

    Swish keeps the int path un-chained (qmode='intc' degrades to
    'int'), but the deploy twin removes all inference-time BN
    arithmetic.  Rerun ``calibrate`` + ``prepare_deploy`` after.
    """
    if example_input is None:
        size = 32 if getattr(model, "cifar", False) else 224
        example_input = jnp.zeros((1, size, size, 3), jnp.float32)
    # EfficientNet BatchNorms use epsilon=1e-3 (models/efficientnet.py)
    return _fold_bn_deploy(model, variables, _MOBILENET_BN_PARTNERS,
                           example_input, rngs, eps=1e-3)


def mobilenet_deploy(model, variables, example_input=None, rngs=None):
    """Train-form MobileNetV2 → BN-free deploy form (model, variables).

    Same fold as :func:`resnet_deploy` with the MobileNet naming
    (expand/depthwise/project↔*_bn, conv_stem↔bn_stem,
    conv_head↔bn_head); the deploy twin chains int8 through ReLU6 and
    the linear-bottleneck residual adds (models/mobilenetv2.py).
    Rerun ``calibrate`` + ``prepare_deploy`` after conversion.
    """
    if example_input is None:
        size = 32 if getattr(model, "cifar", False) else 224
        example_input = jnp.zeros((1, size, size, 3), jnp.float32)
    return _fold_bn_deploy(model, variables, _MOBILENET_BN_PARTNERS,
                           example_input, rngs)
