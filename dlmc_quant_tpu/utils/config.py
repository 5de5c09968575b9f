"""YAML config system: parsing, run directories, CLI overrides, resume.

Same YAML schema-by-convention as the reference
(``name/n_gpu→n_devices/random_seed/arch/dataloaders/quantization/
optimizer/loss/metrics/lr_scheduler/trainer``) and the same CLI surface:
``-c/--config``, ``-r/--resume``, ``-d/--device``, plus extensible option
tuples with ``;``-separated key paths.  ref: parse_config.py:1-181.

Object construction goes through explicit registries
(:func:`init_obj` / :func:`init_ftn`) instead of ``getattr`` reflection
over star-imported modules (ref: parse_config.py:96-124) — same YAML
``{type, args}`` grammar, no dynamic globals.
"""

from __future__ import annotations

import argparse
import functools
import random
from collections import namedtuple
from datetime import datetime
from pathlib import Path
from typing import Any, Callable, Dict, Mapping, Optional, Sequence

import numpy as np
import yaml

CustomArg = namedtuple("CustomArg", "flags type target")


def read_yaml(path) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f)


def write_yaml(obj, path) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(obj, f, default_flow_style=False, sort_keys=False)


def ensure_dir(p: Path) -> Path:
    p = Path(p)
    p.mkdir(parents=True, exist_ok=True)
    return p


def set_by_path(tree: Dict, keys: str, value) -> None:
    """Set a value at a ';'-separated key path.  ref: parse_config.py:166-175"""
    ks = keys.split(";")
    node = tree
    for k in ks[:-1]:
        node = node.setdefault(k, {})
    node[ks[-1]] = value


def get_by_path(tree: Mapping, keys: Sequence[str]):
    return functools.reduce(lambda t, k: t[k], keys, tree)


class ConfigParser:
    """Parsed run configuration + run-dir management + object factory.

    ref: parse_config.py:13-154.  ``save_to_disk=False`` suppresses all
    persistence (ref: parse_config.py:30-58).
    """

    def __init__(self, config: Dict, resume: Optional[str] = None,
                 modification: Optional[Dict[str, Any]] = None,
                 run_id: Optional[str] = None, save_to_disk: bool = True):
        config = dict(config)
        for k, v in (modification or {}).items():
            if v is not None:
                set_by_path(config, k, v)
        self._config = config
        self.resume = resume

        # seed default injection (ref: parse_config.py:24-25)
        self._config.setdefault("random_seed", random.randint(0, 2 ** 31 - 1))

        self.save_to_disk = save_to_disk
        if save_to_disk:
            save_root = Path(self._config.get("save_dir", "saved"))
            name = self._config.get("name", "run")
            run_id = run_id or datetime.now().strftime(r"%m%d_%H%M%S")
            self._save_dir = save_root / "models" / name / run_id
            self._log_dir = save_root / "log" / name / run_id
            ensure_dir(self._save_dir)
            ensure_dir(self._log_dir)
            write_yaml(self._config, self._save_dir / "config.yaml")
        else:
            self._save_dir = None
            self._log_dir = None

    # -- construction ------------------------------------------------------

    @classmethod
    def from_args(cls, args=None, options: Sequence[CustomArg] = (),
                  save_to_disk: bool = True) -> "ConfigParser":
        """CLI: -c/--config, -r/--resume, -d/--device + custom options.

        ref: parse_config.py:66-94
        """
        parser = argparse.ArgumentParser(description="dlmc_quant_tpu")
        parser.add_argument("-c", "--config", default=None, type=str,
                            help="config yaml path")
        parser.add_argument("-r", "--resume", default=None, type=str,
                            help="checkpoint path to resume from")
        parser.add_argument("-d", "--device", default=None, type=str,
                            help="visible device indices")
        for opt in options:
            parser.add_argument(*opt.flags, default=None, type=opt.type)
        ns = parser.parse_args(args)

        resume = ns.resume
        if resume is not None:
            cfg_path = Path(resume).parent / "config.yaml"
        elif ns.config is not None:
            cfg_path = Path(ns.config)
        else:
            parser.error("either -c/--config or -r/--resume is required")
        config = read_yaml(cfg_path)
        if ns.config and resume:
            config.update(read_yaml(ns.config))

        modification = {
            opt.target: getattr(ns, opt.flags[-1].lstrip("-").replace("-", "_"))
            for opt in options}
        if ns.device is not None:
            modification["device"] = ns.device
        return cls(config, resume, modification, save_to_disk=save_to_disk)

    # -- object factory ----------------------------------------------------

    def init_obj(self, name: str, registry: Callable[..., Any], *args,
                 **kwargs):
        """``registry(cfg['type'], *args, **cfg['args'], **kwargs)``.

        ``registry`` is a lookup callable like
        ``dlmc_quant_tpu.models.get_model`` (name, **kw) or a plain dict of
        factories.  ref: parse_config.py:96-109
        """
        spec = self[name]
        cfg_args = dict(spec.get("args") or {})
        overlap = set(cfg_args) & set(kwargs)
        if overlap:
            raise ValueError(f"config args overwritten: {overlap}")
        cfg_args.update(kwargs)
        if isinstance(registry, Mapping):
            return registry[spec["type"]](*args, **cfg_args)
        return registry(spec["type"], *args, **cfg_args)

    def init_ftn(self, name: str, registry, *args, **kwargs):
        """Partial-application variant.  ref: parse_config.py:111-124"""
        spec = self[name]
        cfg_args = dict(spec.get("args") or {})
        cfg_args.update(kwargs)
        fn = registry[spec["type"]] if isinstance(registry, Mapping) \
            else functools.partial(registry, spec["type"])
        return functools.partial(fn, *args, **cfg_args)

    # -- mapping protocol --------------------------------------------------

    def __getitem__(self, name: str):
        return self._config[name]

    def get(self, name: str, default=None):
        return self._config.get(name, default)

    def __contains__(self, name: str):
        return name in self._config

    @property
    def config(self) -> Dict:
        return self._config

    @property
    def save_dir(self) -> Optional[Path]:
        return self._save_dir

    @property
    def log_dir(self) -> Optional[Path]:
        return self._log_dir

    @property
    def seed(self) -> int:
        return int(self._config["random_seed"])
