"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's DP/DDP machinery
(ref: base/base_trainer.py:20-25, example/quantization/
DDP_RootQ_train.py:30-64): one process per host, a
``Mesh(('data', 'model'))`` over all devices, batch sharded on ``data``,
params replicated (training) or sharded on ``model`` (serving).
Gradient all-reduce is inserted by XLA SPMD — no NCCL, no process
spawning, collectives ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Tuple[str, ...] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    Default: 1-D ``data`` mesh over all devices.  ``shape`` splits the
    devices over multiple named axes, e.g. axes=('data','model'),
    shape=(2, 4).
    """
    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axes)


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """device_put a (x, y) batch with the leading dim sharded on ``axis``."""
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, data_sharding(mesh, a.ndim, axis)), batch)


def replicate_tree(tree, mesh: Mesh):
    return jax.device_put(tree, replicate(mesh))
