"""Analytic MAC/FLOP counting and module-graph tracing.

TPU-native equivalents of the reference's forward-hook counters:
  * :func:`count_ops` — per-layer MACs from traced shapes
    (ref: dlmc/utils/count_operations/counter.py:12-54, count_fn.py:6-31)
  * :func:`get_compute_graph` — producer/consumer module graph
    (ref: dlmc/utils/tracker.py:18-91, which walks grad_fn; here we
    record tensor identities during an abstract trace)

Both run under ``jax.eval_shape`` — no FLOPs are spent tracing.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import numpy as np


def _conv_macs(mod, x_shape, out_shape) -> int:
    """b·H_o·W_o·c_out · k_h·k_w·c_in/groups (ref: count_fn.py:6-22)."""
    kh, kw = mod.kernel_size
    cin = x_shape[-1] // mod.feature_group_count
    return int(np.prod(out_shape)) * kh * kw * cin


def _dense_macs(mod, x_shape, out_shape) -> int:
    return int(np.prod(out_shape)) * x_shape[-1]


def count_ops(model, sample_input, **apply_kw) -> Dict[str, int]:
    """Per-layer MAC counts keyed by dotted module path, plus 'total'."""
    from dlmc_quant_tpu.quant.layers import QConv, QDense

    counts: Dict[str, int] = {}

    def interceptor(next_fn, args, kwargs, context):
        out = next_fn(*args, **kwargs)
        mod = context.module
        path = ".".join(str(p) for p in mod.path) or mod.name or "<root>"
        if isinstance(mod, (QConv, nn.Conv)):
            counts[path] = _conv_macs(mod, args[0].shape, out.shape)
        elif isinstance(mod, (QDense, nn.Dense)):
            counts[path] = _dense_macs(mod, args[0].shape, out.shape)
        return out

    def run(x):
        with nn.intercept_methods(interceptor):
            variables = model.init(jax.random.PRNGKey(0), x, **apply_kw)
        return variables

    jax.eval_shape(run, sample_input)
    counts["total"] = sum(counts.values())
    return counts


def get_compute_graph(model, sample_input, track_types: Optional[tuple] = None,
                      style: str = "top", **apply_kw
                      ) -> Dict[str, List[str]]:
    """Producer/consumer edges between tracked modules.

    ``style='top'`` maps each module to its consumers, ``'bottom'`` to
    its producers (ref: tracker.py 'top'/'bottom' styles).  Tracking
    works by tagging output tracer ids during an abstract trace.
    """
    from dlmc_quant_tpu.quant.layers import QConv, QDense

    track_types = track_types or (QConv, QDense, nn.Conv, nn.Dense,
                                  nn.BatchNorm)
    produced_by: Dict[int, str] = {}
    producers: Dict[str, List[str]] = {}

    def _ids(tree):
        return [id(l) for l in jax.tree_util.tree_leaves(tree)
                if hasattr(l, "shape")]

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        path = ".".join(str(p) for p in mod.path) or mod.name or "<root>"
        tracked = isinstance(mod, track_types)
        if tracked:
            srcs = sorted({produced_by[i] for i in _ids(args)
                           if i in produced_by})
            producers[path] = srcs
        out = next_fn(*args, **kwargs)
        if tracked:
            for i in _ids(out):
                produced_by[i] = path
        return out

    def run(x):
        with nn.intercept_methods(interceptor):
            return model.init(jax.random.PRNGKey(0), x, **apply_kw)

    jax.eval_shape(run, sample_input)

    if style == "bottom":
        return producers
    consumers: Dict[str, List[str]] = {p: [] for p in producers}
    for node, srcs in producers.items():
        for s in srcs:
            consumers.setdefault(s, []).append(node)
    return consumers
