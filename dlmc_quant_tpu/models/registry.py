"""Model registry: name → factory(**kwargs) -> nn.Module.

Replaces the reference's reflection-based construction
(``getattr(module_arch, cfg['type'])(**cfg['args'])``,
ref: parse_config.py:96-109 + model/__init__.py:1-4) with an explicit
registry — same YAML ``arch: {type, args}`` grammar, no dynamic globals.
"""

from __future__ import annotations

from typing import Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        if name in _REGISTRY:
            raise ValueError(f"duplicate model name {name!r}")
        _REGISTRY[name] = fn
        return fn
    return deco


def get_model(name: str, **kwargs):
    # import model modules lazily so the registry is populated on first use
    from dlmc_quant_tpu.models import (  # noqa: F401
        efficientnet, ghostnet, mobilenetv2, mobileone, repvgg, resnet_cifar,
    )
    if name in _REGISTRY:
        return _REGISTRY[name](**kwargs)
    # tolerate case variations (configs say e.g. 'mobileone_s1')
    folded = {k.lower(): k for k in _REGISTRY}
    if name.lower() in folded:
        return _REGISTRY[folded[name.lower()]](**kwargs)
    raise ValueError(
        f"unknown model {name!r}; known: {sorted(_REGISTRY)}")


def list_models():
    from dlmc_quant_tpu.models import (  # noqa: F401
        efficientnet, ghostnet, mobilenetv2, mobileone, repvgg, resnet_cifar,
    )
    return sorted(_REGISTRY)
