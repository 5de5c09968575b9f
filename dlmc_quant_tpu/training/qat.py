"""QAT trainer: LSQ / RootQ quantization-aware training.

ref: trainer/quantization_aware_training_trainer.py — adds to the base
trainer: periodic quantizer re-calibration, freeze_bn, grad-norm
clipping (built into the optimizer here), and TensorBoard tracking of
quantizer scalars (in_scale / wt_upper / wt_lower / wt_alpha).
"""

from __future__ import annotations

from typing import Dict

import flax
import jax
import jax.numpy as jnp

from dlmc_quant_tpu.quant.layers import calibrate
from dlmc_quant_tpu.training.trainer import Trainer


class QATTrainer(Trainer):
    """config extras (trainer section): update_qparams_period (steps),
    freeze_bn, grad_clip_param (wired via build_optimizer).
    """

    train_qmode = "train"

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.update_qparams_period = int(
            self.cfg.get("update_qparams_period", 0) or 0)

    def _on_step(self, epoch: int, batch_idx: int, batch=None):
        """Periodic re-calibration on the *current* batch of the live
        stream, matching the reference's reset_qparams-then-forward
        semantics (ref: qat trainer:43-48) — each recalibration sees a
        different batch as data drifts."""
        if (self.update_qparams_period
                and int(self.state.step) > 0
                and int(self.state.step) % self.update_qparams_period == 0):
            x = batch[0] if batch is not None \
                else next(iter(self.train_loader))[0]
            variables = calibrate(self.model, self.state.variables(),
                                  [jnp.asarray(x)])
            # fresh buffers: the donated train step must not see aliases
            variables = jax.tree_util.tree_map(jnp.array, variables)
            self.state = self.state.replace(
                params=variables["params"],
                qstate=variables.get("qstate", self.state.qstate))
            self.logger.info("re-calibrated quantizers at step %d",
                             int(self.state.step))

    def _log_quant_scalars(self):
        """Track quantizer scalars (ref: qat trainer:91-93,138-140)."""
        if self.process_index != 0 or self.writer.writer is None:
            return
        flat = flax.traverse_util.flatten_dict(self.state.params)
        for path, val in flat.items():
            leaf = path[-1]
            if leaf in ("in_scale", "wt_scale", "wt_upper", "wt_lower",
                        "wt_alpha") and val.size == 1:
                self.writer.add_scalar("/".join(path), float(val))
