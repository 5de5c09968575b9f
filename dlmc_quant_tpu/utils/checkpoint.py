"""Checkpoint save/load (orbax) for variable pytrees and trainer state.

Quantized checkpoints round-trip automatically because all quantizer
state (scales/bounds/alpha in 'params', offsets/EMA/observer state in
'qstate') lives in the variable tree.
ref: base/base_trainer.py:136-228 (periodic + rolling-best checkpoints,
resume with monitor state), post_training_quantization.py:94-101.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_numpy(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(path, tree: Dict[str, Any],
                    metadata: Optional[Dict] = None) -> Path:
    """Save a pytree (+ JSON metadata) to ``path`` (a directory)."""
    path = Path(path).absolute()
    if path.exists():
        shutil.rmtree(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, _to_numpy(tree))
    if metadata is not None:
        (path / "metadata.json").write_text(json.dumps(metadata, default=str))
    return path


def load_checkpoint(path, target=None):
    """Load a pytree; with ``target`` restores matching structure/dtypes."""
    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            tree = ckptr.restore(path, item=_to_numpy(target))
        else:
            tree = ckptr.restore(path)
    meta_path = path / "metadata.json"
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return tree, meta


class CheckpointManager:
    """Periodic + rolling-best checkpoints with previous-best deletion.

    ref: base/base_trainer.py:136-180
    """

    def __init__(self, save_dir, monitor_metric: str = "val_accuracy"):
        self.save_dir = Path(save_dir)
        self.monitor_metric = monitor_metric
        self._best_path: Optional[Path] = None

    def save_epoch(self, epoch: int, tree, metadata=None, best: bool = False):
        name = f"checkpoint-epoch{epoch}" + ("-best" if best else "")
        return save_checkpoint(self.save_dir / name, tree, metadata)

    def save_best(self, tree, metadata=None):
        new = self.save_dir / f"model_best-{self.monitor_metric}"
        save_checkpoint(new, tree, metadata)
        self._best_path = new
        return new
