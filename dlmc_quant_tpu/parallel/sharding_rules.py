"""Parameter sharding rules for tensor-parallel (model-axis) layouts.

Quantized weights are sharded over the mesh 'model' axis on their
output-channel dimension (last axis of HWIO/IO kernels); per-channel
quantizer scales, biases, BN stats and integer-plan leaves follow the
same rule so every per-channel quantity stays aligned with its kernel
shard.  Anything not divisible by the axis size is replicated.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_pspec(leaf, n_shards: int, axis: str = "model") -> P:
    shape = np.shape(leaf)
    if len(shape) == 0:
        return P()
    if shape[-1] % n_shards == 0 and shape[-1] >= n_shards:
        return P(*([None] * (len(shape) - 1)), axis)
    return P()


def shard_params(tree, mesh: Mesh, axis: str = "model"):
    """device_put every leaf with its inferred model-axis sharding."""
    n = mesh.shape[axis]

    def put(leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, param_pspec(leaf, n, axis)))

    return jax.tree_util.tree_map(put, tree)
