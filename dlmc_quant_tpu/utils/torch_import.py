"""One-way torch→pytree checkpoint ingestion.

The reference loads torchvision/timm/RepVGG ``.pth`` checkpoints
(ref: example/quantization/post_training_quantization.py:45-49,
RootQ_train.py:37-53); this module maps a torch ``state_dict`` onto our
flax variable trees so pretrained GPU checkpoints can seed TPU runs
(SURVEY.md §7.3 "pretrained-weight ingestion").

Layout conversions: conv OIHW→HWIO, linear (O,I)→(I,O); BatchNorm
weight/bias/running_mean/running_var → scale/bias + batch_stats.

Name mapping is structural, not hard-coded: torch modules and flax
modules are both enumerated in *call order* (conv/linear/bn streams
matched independently), which works for sequentially-defined
architectures like the zoo's.  A dict of explicit overrides handles
stragglers.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

import flax

from dlmc_quant_tpu.utils.bidict import BiDict


def _load_state_dict(path):
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k.replace("module.", ""): v.detach().cpu().numpy()
            for k, v in obj.items()}


def _torch_streams(sd: Dict[str, np.ndarray]):
    """Split a torch state_dict into ordered conv/linear/bn streams."""
    convs: List[Tuple[str, np.ndarray, Optional[np.ndarray]]] = []
    linears: List[Tuple[str, np.ndarray, Optional[np.ndarray]]] = []
    bns: List[Tuple[str, Dict[str, np.ndarray]]] = []
    for key in sd:
        if not key.endswith(".weight"):
            continue
        base = key[:-len(".weight")]
        w = sd[key]
        b = sd.get(base + ".bias")
        if w.ndim == 4:
            convs.append((base, w, b))
        elif w.ndim == 2:
            linears.append((base, w, b))
        elif w.ndim == 1 and base + ".running_mean" in sd:
            bns.append((base, {
                "scale": w, "bias": b,
                "mean": sd[base + ".running_mean"],
                "var": sd[base + ".running_var"],
            }))
    return convs, linears, bns


def _flax_streams(variables):
    params = flax.traverse_util.flatten_dict(variables["params"])
    stats = flax.traverse_util.flatten_dict(
        variables.get("batch_stats", {}))
    convs, linears, bns = [], [], []
    for path, leaf in params.items():
        if path[-1] != "kernel":
            continue
        if leaf.ndim == 4:
            convs.append(path[:-1])
        elif leaf.ndim == 2:
            linears.append(path[:-1])
    seen = set()
    for path in stats:
        mod = path[:-1]
        if mod not in seen:
            seen.add(mod)
            bns.append(mod)
    return convs, linears, bns, params, stats


def build_name_mapping(variables, sd) -> BiDict:
    """Call-order flax-path ↔ torch-module-name mapping as a
    :class:`~dlmc_quant_tpu.utils.bidict.BiDict`.

    Forward lookup ``m['layer1_0.conv1']`` gives the torch module name;
    reverse lookup ``m[:'layer1.0.conv1']`` recovers the flax path —
    useful for auditing a structural match and for exporting back.
    ref: dlmc/utils/bidict.py:4-21 (the reverse-lookup idiom).
    """
    t_convs, t_linears, t_bns = _torch_streams(sd)
    f_convs, f_linears, f_bns, _, _ = _flax_streams(variables)
    m = BiDict()
    for ours, theirs in ((f_convs, t_convs), (f_linears, t_linears),
                         (f_bns, t_bns)):
        for fpath, entry in zip(ours, theirs):
            m[".".join(fpath)] = entry[0]
    return m


def import_torch_checkpoint(path, model, variables,
                            strict: bool = True):
    """Load a torch .pth into a flax variable tree by call-order matching.

    Returns updated variables.  With ``strict`` the conv/linear/bn
    stream lengths must match exactly.
    """
    sd = _load_state_dict(path)
    t_convs, t_linears, t_bns = _torch_streams(sd)
    f_convs, f_linears, f_bns, params, stats = _flax_streams(variables)

    for name, ours, theirs in (("conv", f_convs, t_convs),
                               ("linear", f_linears, t_linears),
                               ("batchnorm", f_bns, t_bns)):
        if len(ours) != len(theirs):
            msg = (f"{name} stream mismatch: flax has {len(ours)}, "
                   f"torch has {len(theirs)}")
            if strict:
                raise ValueError(msg)

    for fpath, (tname, w, b) in zip(f_convs, t_convs):
        k = np.transpose(w, (2, 3, 1, 0))              # OIHW → HWIO
        if params[fpath + ("kernel",)].shape != k.shape:
            raise ValueError(
                f"shape mismatch {fpath} {params[fpath + ('kernel',)].shape}"
                f" vs torch {tname} {k.shape}")
        params[fpath + ("kernel",)] = k
        if b is not None and fpath + ("bias",) in params:
            params[fpath + ("bias",)] = b
    for fpath, (tname, w, b) in zip(f_linears, t_linears):
        params[fpath + ("kernel",)] = w.T              # (O,I) → (I,O)
        if b is not None and fpath + ("bias",) in params:
            params[fpath + ("bias",)] = b
    for fpath, (tname, d) in zip(f_bns, t_bns):
        params[fpath + ("scale",)] = d["scale"]
        params[fpath + ("bias",)] = d["bias"]
        stats[fpath + ("mean",)] = d["mean"]
        stats[fpath + ("var",)] = d["var"]

    new = dict(variables)
    new["params"] = flax.traverse_util.unflatten_dict(params)
    if stats:
        new["batch_stats"] = flax.traverse_util.unflatten_dict(stats)
    return new
