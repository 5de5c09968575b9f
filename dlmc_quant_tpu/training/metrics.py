"""Evaluation metrics.  ref: trainer/metric/metric.py:4-20"""

from __future__ import annotations

import jax.numpy as jnp


def accuracy(logits, labels):
    return jnp.mean((jnp.argmax(logits, axis=-1) == labels)
                    .astype(jnp.float32))


def top5_acc(logits, labels):
    top5 = jnp.argsort(logits, axis=-1)[:, -5:]
    return jnp.mean(jnp.any(top5 == labels[:, None], axis=-1)
                    .astype(jnp.float32))


METRICS = {"accuracy": accuracy, "top5_acc": top5_acc}


def get_metric(name: str):
    try:
        return METRICS[name]
    except KeyError:
        raise ValueError(f"unknown metric {name!r}; known: "
                         f"{sorted(METRICS)}") from None
