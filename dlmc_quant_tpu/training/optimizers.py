"""Optimizer construction (optax) with per-parameter-group learning rates.

Replaces torch.optim construction-by-reflection (ref: parse_config.py:
96-109 + RootQ_train.py:65-79 param-group splitting) with optax
transforms.  Param groups are selected by regex on the flattened param
path — the same mechanism the reference uses by name suffix
(``*wt_alpha`` with ``alpha_lr``, FSPTQ's ``*scales``/weight/bias/γβ
groups, ref: trainer/fsptq_trainer.py:136-152).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Mapping, Optional, Sequence, Tuple, Union

import jax
import optax
import flax

ScheduleOrFloat = Union[float, Callable]


def _base_tx(opt_type: str, lr: ScheduleOrFloat, momentum: float = 0.9,
             weight_decay: float = 0.0, nesterov: bool = False,
             betas=(0.9, 0.999), eps: float = 1e-8) -> optax.GradientTransformation:
    t = opt_type.lower()
    if t == "sgd":
        tx = optax.sgd(lr, momentum=momentum, nesterov=nesterov)
    elif t == "adam":
        tx = optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    elif t == "adamw":
        return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                           weight_decay=weight_decay)
    else:
        raise ValueError(f"unknown optimizer {opt_type!r}")
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def build_optimizer(opt_type: str, lr: ScheduleOrFloat,
                    param_groups: Optional[Sequence[Tuple[str, Dict]]] = None,
                    grad_clip: Optional[float] = None,
                    **kwargs) -> optax.GradientTransformation:
    """Build an optax transformation.

    ``param_groups`` is a list of ``(path_regex, overrides)`` where
    overrides may change lr/weight_decay/etc. for params whose
    '/'-joined path matches; first match wins, unmatched params use the
    base settings.  ``grad_clip`` adds global-norm clipping
    (ref: quantization_aware_training_trainer.py:68-69).
    """
    from dlmc_quant_tpu.training.schedulers import ReduceLROnPlateau
    if isinstance(lr, ReduceLROnPlateau):
        # metric-driven schedule: the rate is an injected hyperparameter
        # the Trainer rewrites after each epoch (sched.epoch_end) — a
        # jitted schedule callable can't see host-side plateau state
        if param_groups:
            raise ValueError("ReduceLROnPlateau cannot be combined with "
                             "param_groups")
        tx = optax.inject_hyperparams(
            lambda learning_rate: _base_tx(opt_type, learning_rate,
                                           **kwargs))(
            learning_rate=lr.lr)
        if grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
        return tx

    if param_groups:
        labels_and_tx = {"__default__": _base_tx(opt_type, lr, **kwargs)}
        compiled = []
        for i, (pattern, overrides) in enumerate(param_groups):
            label = f"group{i}"
            merged = dict(kwargs)
            merged.update({k: v for k, v in overrides.items()
                           if k not in ("type",)})
            g_lr = merged.pop("lr", lr)
            g_type = overrides.get("type", opt_type)
            labels_and_tx[label] = _base_tx(g_type, g_lr, **merged)
            compiled.append((re.compile(pattern), label))

        def label_fn(params):
            flat = flax.traverse_util.flatten_dict(params)
            out = {}
            for path in flat:
                joined = "/".join(str(p) for p in path)
                lab = "__default__"
                for rx, label in compiled:
                    if rx.search(joined):
                        lab = label
                        break
                out[path] = lab
            return flax.traverse_util.unflatten_dict(out)

        tx = optax.multi_transform(labels_and_tx, label_fn)
    else:
        tx = _base_tx(opt_type, lr, **kwargs)

    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


OPTIMIZERS = {"SGD": "sgd", "Adam": "adam", "AdamW": "adamw"}
