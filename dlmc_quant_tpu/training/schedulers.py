"""Step-based LR schedules with linear warmup (optax-compatible).

All schedules are pure ``step -> lr`` callables (resume = just pass the
restored step; no mutable scheduler state to checkpoint), except
:class:`ReduceLROnPlateau`, which is inherently metric-driven and kept as
a small stateful object whose state is a checkpointable dict.

Capability parity: ref: scheduler/lr_scheduler.py:8-477 (MultiStepLR /
ReduceLROnPlateau / CosineCyclicLR / CosineDecayLR / CosineAnnealingLR /
ExponentialLR, all step-based with warmup_steps).
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Sequence

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def _with_warmup(base: Schedule, lr: float, warmup_steps: int) -> Schedule:
    """Linear warmup 0→lr over ``warmup_steps``, then the base schedule
    evaluated on (step - warmup).  ref: lr_scheduler.py:24-41"""
    if warmup_steps <= 0:
        return base

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * (step + 1.0) / warmup_steps
        return jnp.where(step < warmup_steps, warm,
                         base(step - warmup_steps))
    return sched


def MultiStepLR(lr: float, milestones: Sequence[int], steps_per_epc: int,
                gamma: float = 0.1, warmup_steps: int = 0) -> Schedule:
    """Decay by gamma at epoch milestones × steps_per_epc.

    ref: lr_scheduler.py:60-106
    """
    ms = jnp.asarray([m * steps_per_epc for m in milestones], jnp.float32)

    def base(step):
        k = jnp.sum(jnp.asarray(step, jnp.float32) >= ms)
        return lr * gamma ** k
    return _with_warmup(base, lr, warmup_steps)


def _span_steps(steps, epochs, steps_per_epc, what: str) -> int:
    """Span given in steps, or in epochs × steps_per_epc (the trainer
    injects steps_per_epc like the reference's init_obj(optimizer,
    len(train_loader)) — ref: RootQ_train.py:79)."""
    if steps is not None:
        return int(steps)
    if epochs is not None and steps_per_epc is not None:
        return int(epochs * steps_per_epc)
    raise ValueError(f"{what}: give either a *_steps value or an "
                     "epoch count (with steps_per_epc)")


def CosineDecayLR(lr: float, total_steps: int = None,
                  warmup_steps: int = 0, min_lr: float = 0.0,
                  total_epochs: int = None,
                  steps_per_epc: int = None) -> Schedule:
    """Half-cosine decay lr→min_lr over total_steps (or total_epochs).

    ref: lr_scheduler.py:364-396
    """
    total_steps = _span_steps(total_steps, total_epochs, steps_per_epc,
                              "CosineDecayLR")
    span = max(total_steps - warmup_steps, 1)

    def base(step):
        t = jnp.clip(jnp.asarray(step, jnp.float32) / span, 0.0, 1.0)
        return min_lr + (lr - min_lr) * 0.5 * (1.0 + jnp.cos(math.pi * t))
    return _with_warmup(base, lr, warmup_steps)


def CosineAnnealingLR(lr: float, cycle_steps: int = None,
                      warmup_steps: int = 0,
                      min_lr: float = 0.0, t_mult: float = 1.0,
                      cycle_epochs: int = None,
                      steps_per_epc: int = None) -> Schedule:
    """Restarting cosine cycles.  ref: lr_scheduler.py:399-452"""
    cycle_steps = _span_steps(cycle_steps, cycle_epochs, steps_per_epc,
                              "CosineAnnealingLR")
    def base(step):
        step = jnp.asarray(step, jnp.float32)
        if t_mult == 1.0:
            t = (step % cycle_steps) / cycle_steps
        else:
            # geometric cycle growth, computed in closed form
            n = jnp.floor(jnp.log1p(step * (t_mult - 1.0) / cycle_steps)
                          / jnp.log(t_mult))
            start = cycle_steps * (t_mult ** n - 1.0) / (t_mult - 1.0)
            length = cycle_steps * t_mult ** n
            t = (step - start) / length
        return min_lr + (lr - min_lr) * 0.5 * (1.0 + jnp.cos(math.pi * t))
    return _with_warmup(base, lr, warmup_steps)


def CosineCyclicLR(lr: float, cycle_steps: int = None,
                   warmup_steps: int = 0, min_lr: float = 0.0,
                   cycle_epochs: int = None,
                   steps_per_epc: int = None) -> Schedule:
    """Symmetric cosine oscillation between lr and min_lr.

    ref: lr_scheduler.py:306-361
    """
    cycle_steps = _span_steps(cycle_steps, cycle_epochs, steps_per_epc,
                              "CosineCyclicLR")
    def base(step):
        t = (jnp.asarray(step, jnp.float32) % cycle_steps) / cycle_steps
        return min_lr + (lr - min_lr) * 0.5 * (1.0 + jnp.cos(
            2.0 * math.pi * t))
    return _with_warmup(base, lr, warmup_steps)


def ExponentialLR(lr: float, gamma: float, steps_per_epc: int,
                  warmup_steps: int = 0) -> Schedule:
    """Per-step gamma^(1/steps_per_epc) decay.  ref: lr_scheduler.py:455-477"""
    per_step = gamma ** (1.0 / steps_per_epc)

    def base(step):
        return lr * per_step ** jnp.asarray(step, jnp.float32)
    return _with_warmup(base, lr, warmup_steps)


class ReduceLROnPlateau:
    """Metric-driven decay; per-epoch metric averaging behind a step API.

    Call ``record(value)`` each step and ``epoch_end()`` once per epoch;
    ``lr`` is the current rate.  State is a plain dict for checkpointing.
    ref: lr_scheduler.py:109-303
    """

    def __init__(self, lr: float, mode: str = "min", factor: float = 0.1,
                 patience: int = 10, min_lr: float = 0.0,
                 threshold: float = 1e-4, warmup_steps: int = 0,
                 steps_per_epc: int = None):  # accepted for parity; the
        # epoch boundary is explicit here (epoch_end) rather than counted
        self.base_lr = lr
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.threshold = threshold
        self.warmup_steps = warmup_steps
        self.state = {"lr": lr, "best": None, "bad_epochs": 0,
                      "step": 0, "sum": 0.0, "count": 0}

    @property
    def lr(self) -> float:
        s = self.state
        if s["step"] < self.warmup_steps:
            return self.base_lr * (s["step"] + 1) / self.warmup_steps
        return s["lr"]

    def record(self, value: float):
        self.state["sum"] += float(value)
        self.state["count"] += 1
        self.state["step"] += 1

    def epoch_end(self):
        s = self.state
        if not s["count"]:
            return
        avg = s["sum"] / s["count"]
        s["sum"], s["count"] = 0.0, 0
        better = (s["best"] is None
                  or (self.mode == "min" and avg < s["best"] - self.threshold)
                  or (self.mode == "max" and avg > s["best"] + self.threshold))
        if better:
            s["best"], s["bad_epochs"] = avg, 0
        else:
            s["bad_epochs"] += 1
            if s["bad_epochs"] > self.patience:
                s["lr"] = max(s["lr"] * self.factor, self.min_lr)
                s["bad_epochs"] = 0

    def state_dict(self) -> Dict:
        return dict(self.state)

    def load_state_dict(self, d: Dict):
        self.state.update(d)


SCHEDULERS = {
    "MultiStepLR": MultiStepLR,
    "CosineDecayLR": CosineDecayLR,
    "CosineAnnealingLR": CosineAnnealingLR,
    "CosineCyclicLR": CosineCyclicLR,
    "ExponentialLR": ExponentialLR,
    "ReduceLROnPlateau": ReduceLROnPlateau,
}


def get_scheduler(name: str, **kwargs):
    try:
        return SCHEDULERS[name](**kwargs)
    except KeyError:
        raise ValueError(f"unknown scheduler {name!r}; known: "
                         f"{sorted(SCHEDULERS)}") from None
