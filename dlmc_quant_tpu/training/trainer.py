"""Trainers: base epoch loop + classification trainer (+ QAT subclass in
``qat.py``).

Functional TPU design: one jitted, mesh-sharded ``train_step`` over an
explicit TrainState; the trainer class around it reproduces the
reference's training framework behavior — per-epoch fixed seeds,
monitor/early-stop, periodic + rolling-best checkpoints, mid-epoch
validation, log densities, metric tracking, TensorBoard.

ref: base/base_trainer.py:14-279, trainer/classification_trainer.py.
"""

from __future__ import annotations

import math
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from dlmc_quant_tpu.parallel.mesh import (
    data_sharding, make_mesh, replicate, shard_batch,
)
from dlmc_quant_tpu.training.losses import get_loss, kurtosis
from dlmc_quant_tpu.training.metrics import get_metric
from dlmc_quant_tpu.utils.checkpoint import (
    CheckpointManager, load_checkpoint, save_checkpoint,
)
from dlmc_quant_tpu.utils.logging import TensorboardWriter, get_logger
from dlmc_quant_tpu.utils.metric_tracker import MetricTracker


class TrainState(struct.PyTreeNode):
    params: Any
    qstate: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.qstate:
            v["qstate"] = self.qstate
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def _parse_monitor(spec: str):
    """'max val_accuracy' → (mode, metric).  ref: base_trainer.py:53-62"""
    if not spec or spec == "off":
        return None, None
    mode, metric = spec.split()
    assert mode in ("min", "max")
    return mode, metric


class Trainer:
    """Classification trainer (ref: trainer/classification_trainer.py).

    ``config`` keys consumed (trainer section): epochs, save_period,
    monitor, early_stop, train_log_density, valid_log_density,
    kurtosis (weight), grad_clip_param, freeze_bn.
    """

    # qmode used during gradient steps; subclasses override
    train_qmode = "train"

    def __init__(self, model, variables, optimizer, lr_schedule,
                 train_loader, valid_loader=None, config: Optional[Dict] = None,
                 loss: str = "cross_entropy", metrics=("accuracy",),
                 mesh=None, save_dir=None, log_dir=None, logger=None,
                 resume: Optional[str] = None):
        self.model = model
        self.optimizer = optimizer
        self.lr_schedule = lr_schedule
        self.train_loader = train_loader
        self.valid_loader = valid_loader
        cfg = dict(config or {})
        self.epochs = int(cfg.get("epochs", 1))
        self.save_period = int(cfg.get("save_period", self.epochs))
        self.monitor_mode, self.monitor_metric = _parse_monitor(
            cfg.get("monitor", "off"))
        self.early_stop = int(cfg.get("early_stop", 0) or 0)
        self.kurtosis_weight = float(cfg.get("kurtosis", 0) or 0)
        self.freeze_bn = bool(cfg.get("freeze_bn", False))
        self.cfg = cfg

        self.loss_fn = get_loss(loss)
        self.metric_fns = {m: get_metric(m) for m in metrics}

        self.mesh = mesh if mesh is not None else make_mesh()
        self.process_index = jax.process_index()
        self.logger = logger or get_logger("trainer", self.process_index)
        self.writer = TensorboardWriter(
            log_dir, self.logger,
            enabled=log_dir is not None and self.process_index == 0)
        self.ckpt = CheckpointManager(save_dir, self.monitor_metric or "loss") \
            if save_dir else None

        # log-step scheduling as fractions of an epoch
        # (ref: base_trainer.py:35-40)
        spe = max(len(train_loader), 1)
        self.train_log_step = max(
            int(spe * float(cfg.get("train_log_density", 1.0))), 1)
        self.valid_log_step = max(
            int(spe * float(cfg.get("valid_log_density", 1.0))), 1)

        # private copies of every leaf: the jitted train step donates the
        # TrainState, which would otherwise invalidate caller-owned arrays
        # and trip on aliased buffers (calibration can leave the same
        # array in params and qstate)
        variables = jax.tree_util.tree_map(jnp.array, variables)
        opt_state = optimizer.init(variables["params"])
        self.state = TrainState(
            params=variables["params"],
            qstate=variables.get("qstate", {}),
            batch_stats=variables.get("batch_stats", {}),
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32))
        self.start_epoch = 1
        self.monitor_best = (math.inf if self.monitor_mode == "min"
                             else -math.inf)
        self.not_improved = 0
        if resume:
            self._resume(resume)

        # metric-driven LR: ReduceLROnPlateau state lives on the host;
        # its current rate is an injected optax hyperparameter rewritten
        # after every epoch (see _sync_plateau_lr)
        from dlmc_quant_tpu.training.schedulers import ReduceLROnPlateau
        self.plateau = (lr_schedule
                        if isinstance(lr_schedule, ReduceLROnPlateau)
                        else None)

        # per-epoch fixed seeds for reproducible fine-tuning
        # (ref: base_trainer.py:50-51,92-96)
        seed = int(cfg.get("random_seed", 0))
        rng = np.random.default_rng(seed)
        self.epoch_seeds = rng.integers(0, 2 ** 31 - 1, self.epochs + 1)

        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self.tracker = MetricTracker("loss", *self.metric_fns,
                                     writer=self.writer)

    # ------------------------------------------------------------------
    def _mutable_collections(self):
        cols = []
        if self.state.batch_stats:
            cols.append("batch_stats")
        if self.state.qstate:
            cols.append("qstate")
        return cols

    def _apply_kwargs(self):
        return {}

    def _build_train_step(self):
        mutable = self._mutable_collections()
        bn_train = not self.freeze_bn
        kw = self._apply_kwargs()
        qmode = self.train_qmode
        kurt_w = self.kurtosis_weight

        def train_step(state: TrainState, x, y):
            def loss_fn(params):
                variables = {"params": params}
                if state.qstate:
                    variables["qstate"] = state.qstate
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                out = self.model.apply(variables, x, train=bn_train,
                                       qmode=qmode, mutable=mutable, **kw)
                logits, upd = out if mutable else (out, {})
                loss = self.loss_fn(logits, y)
                if kurt_w:
                    # kurtosis regularization of conv kernels
                    # (ref: classification_trainer.py:20-30,49-50)
                    kerns = [p for path, p in
                             jax.tree_util.tree_flatten_with_path(params)[0]
                             if p.ndim == 4
                             and path[-1].key == "kernel"]
                    if kerns:
                        loss = loss + kurt_w * jnp.mean(
                            jnp.stack([kurtosis(k) for k in kerns]))
                return loss, (logits, upd)

            (loss, (logits, upd)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=params,
                qstate=upd.get("qstate", state.qstate),
                batch_stats=upd.get("batch_stats", state.batch_stats),
                opt_state=opt_state,
                step=state.step + 1)
            metrics = {"loss": loss}
            for name, fn in self.metric_fns.items():
                metrics[name] = fn(logits, y)
            return new_state, metrics

        return jax.jit(
            train_step,
            in_shardings=(replicate(self.mesh),
                          data_sharding(self.mesh, 4),
                          data_sharding(self.mesh, 1)),
            out_shardings=(replicate(self.mesh), replicate(self.mesh)),
            donate_argnums=(0,))

    def _build_eval_step(self):
        kw = self._apply_kwargs()
        qmode = "eval" if self.train_qmode != "fp" else "fp"

        def eval_step(state: TrainState, x):
            # returns replicated logits; metrics are computed on the
            # unpadded rows by the caller (eval batches may need padding
            # to the data-axis size — see _valid_epoch)
            return self.model.apply(state.variables(), x, train=False,
                                    qmode=qmode, **kw)

        return jax.jit(
            eval_step,
            in_shardings=(replicate(self.mesh),
                          data_sharding(self.mesh, 4)),
            out_shardings=replicate(self.mesh))

    # ------------------------------------------------------------------
    def _put_batch(self, x, y):
        return shard_batch((jnp.asarray(x), jnp.asarray(y)), self.mesh)

    def _sync_plateau_lr(self, result: Dict[str, float]):
        """Feed the epoch metric to ReduceLROnPlateau and rewrite the
        injected learning_rate hyperparameter in the optimizer state."""
        metric = result.get("val_loss", result.get("loss"))
        if metric is None:
            return
        self.plateau.record(metric)
        self.plateau.epoch_end()

        def rewrite(s):
            if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
                hp = dict(s.hyperparams)
                hp["learning_rate"] = jnp.asarray(self.plateau.lr,
                                                  jnp.float32)
                return s._replace(hyperparams=hp)
            if isinstance(s, tuple) and not hasattr(s, "_fields"):
                return tuple(rewrite(e) for e in s)
            return s

        self.state = self.state.replace(
            opt_state=rewrite(self.state.opt_state))

    def train(self) -> Dict[str, float]:
        """Epoch loop with monitor/early-stop.  ref: base_trainer.py:86-111"""
        last = {}
        for epoch in range(self.start_epoch, self.epochs + 1):
            result = self._train_epoch(epoch)
            last = result
            if self.plateau is not None:
                self._sync_plateau_lr(result)
            if self.monitor_mode:
                current = result.get(self.monitor_metric)
                if current is not None:
                    improved = (current < self.monitor_best
                                if self.monitor_mode == "min"
                                else current > self.monitor_best)
                    if improved:
                        self.monitor_best = current
                        self.not_improved = 0
                        if self.ckpt and self.process_index == 0:
                            self.ckpt.save_best(
                                self._resume_tree(),
                                {"epoch": epoch,
                                 self.monitor_metric: current})
                    else:
                        self.not_improved += 1
                    if self.early_stop and self.not_improved >= self.early_stop:
                        self.logger.info(
                            "early stop at epoch %d (no improvement in %d)",
                            epoch, self.early_stop)
                        break
            if (self.ckpt and self.process_index == 0
                    and epoch % self.save_period == 0):
                self.ckpt.save_epoch(epoch, self._resume_tree(),
                                     {"epoch": epoch, **result,
                                      "monitor_best": self.monitor_best})
        return last

    def _on_step(self, epoch: int, batch_idx: int, batch=None):
        """Subclass hook before each gradient step.  ``batch`` is the
        live (x, y) about to be stepped on (host arrays)."""

    def _train_epoch(self, epoch: int) -> Dict[str, float]:
        self.train_loader.set_epoch(int(self.epoch_seeds[epoch % len(
            self.epoch_seeds)]))
        self.tracker.reset()
        t0 = time.time()
        n_batches = len(self.train_loader)
        result: Dict[str, float] = {}
        for i, (x, y) in enumerate(self.train_loader):
            self._on_step(epoch, i, (x, y))
            xb, yb = self._put_batch(x, y)
            self.state, metrics = self._train_step(self.state, xb, yb)
            if self.cfg.get("detect_anomalies"):
                # failure detection (the reference has none, SURVEY.md §5):
                # a non-finite loss aborts before it can poison the params
                loss_val = float(metrics["loss"])
                if not math.isfinite(loss_val):
                    raise FloatingPointError(
                        f"non-finite loss {loss_val} at epoch {epoch} "
                        f"step {i} — aborting (set detect_anomalies: false "
                        f"to disable)")
            if (i + 1) % self.train_log_step == 0 or i + 1 == n_batches:
                if self.process_index == 0:
                    step = int((epoch - 1) * n_batches + i)
                    self.writer.set_step(step)
                for k, v in metrics.items():
                    self.tracker.update(k, float(v))
                self._log_quant_scalars()
                if self.plateau is not None:
                    cur_lr = self.plateau.lr
                elif callable(self.lr_schedule):
                    cur_lr = float(self.lr_schedule(self.state.step))
                else:
                    cur_lr = float(self.lr_schedule)
                self.logger.info(
                    "epoch %d [%d/%d] loss=%.4f lr=%.2e",
                    epoch, i + 1, n_batches, self.tracker.avg("loss"),
                    cur_lr)
            # mid-epoch validation on process 0 (ref: trainer:72-85)
            if (self.valid_loader is not None
                    and (i + 1) % self.valid_log_step == 0
                    and i + 1 < n_batches):
                result.update(self._valid_epoch(epoch))
        result = {**{k: self.tracker.avg(k)
                     for k in ["loss", *self.metric_fns]}, **result}
        if self.valid_loader is not None:
            result.update(self._valid_epoch(epoch))
        self.logger.info("epoch %d done in %.1fs: %s", epoch,
                         time.time() - t0, _fmt(result))
        return result

    def _valid_epoch(self, epoch: int) -> Dict[str, float]:
        totals: Dict[str, float] = {}
        n = 0
        dsize = int(self.mesh.shape.get("data", 1))
        for x, y in self.valid_loader:
            bs = len(y)
            x = np.asarray(x)
            pad = (-bs) % dsize
            if pad:   # last eval batch may not divide the data axis
                x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
            xb = jax.device_put(jnp.asarray(x),
                                data_sharding(self.mesh, x.ndim))
            logits = self._eval_step(self.state, xb)[:bs]
            yb = jnp.asarray(np.asarray(y))
            m = {"loss": self.loss_fn(logits, yb)}
            for name, fn in self.metric_fns.items():
                m[name] = fn(logits, yb)
            for k, v in m.items():
                totals[k] = totals.get(k, 0.0) + float(v) * bs
            n += bs
        out = {f"val_{k}": v / max(n, 1) for k, v in totals.items()}
        if self.process_index == 0:
            self.writer.set_step(int(self.state.step), "valid")
            for k, v in out.items():
                self.writer.add_scalar(k, v)
        return out

    def _log_quant_scalars(self):
        """Subclass hook: QAT logs in_scale/wt_alpha etc."""

    # ------------------------------------------------------------------
    def _resume_tree(self):
        """Full trainer state: what epoch/best checkpoints store, so -r
        restores optimizer/step too (ref: base_trainer.py:261-273)."""
        return {
            "variables": self.state.variables(),
            "opt_state": self.state.opt_state,
            "step": np.asarray(self.state.step),
        }

    def save(self, path, metadata=None):
        return save_checkpoint(path, self._resume_tree(), metadata)

    def _resume(self, path):
        """ref: base_trainer.py:182-228"""
        try:
            tree, meta = load_checkpoint(path, target=self._resume_tree())
        except Exception:
            # weights-only checkpoint (PTQ quantized_model, legacy best
            # files): restore variables, keep fresh optimizer/step
            vtree, meta = load_checkpoint(
                path, target=self.state.variables())
            self.logger.info("weights-only checkpoint; optimizer state "
                             "re-initialized")
            tree = {"variables": vtree,
                    "opt_state": self.state.opt_state,
                    "step": np.asarray(self.state.step)}
        v = tree["variables"]
        self.state = self.state.replace(
            params=v["params"], qstate=v.get("qstate", {}),
            batch_stats=v.get("batch_stats", {}),
            opt_state=tree["opt_state"],
            step=jnp.asarray(tree["step"]))
        self.start_epoch = int(meta.get("epoch", 0)) + 1
        if "monitor_best" in meta:
            self.monitor_best = float(meta["monitor_best"])
        self.logger.info("resumed from %s at epoch %d", path,
                         self.start_epoch)


def _fmt(d: Dict[str, float]) -> str:
    return " ".join(f"{k}={v:.4f}" for k, v in d.items())
