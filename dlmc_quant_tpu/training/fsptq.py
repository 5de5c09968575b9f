"""FSPTQ / RepAPQ reconstruction trainer.

Per-layer/per-block output reconstruction for (branch-fused) PTQ models:
cache the FP teacher's block outputs and the quantized student's block
inputs over a calibration set, then per block run a short Adam + cosine
loop training only quantizer scales (and AdaRound alphas / weights at
tiny LR) against the L2 reconstruction objective — "within several
minutes".

ref: trainer/fsptq_trainer.py:28-161 (capture hooks, per-group LRs,
random-64 minibatches, cosine schedule, final validation), and
example/quantization/FSPTQuant.py:98-107 (block_dict wiring).

TPU design notes: capture uses ``nn.intercept_methods`` (the functional
equivalent of torch forward hooks); the inner loop is one jitted step
over cached activation tensors that live on device; blocks are trained
in topological order so later blocks reconstruct against the already-
quantized earlier ones, exactly like the reference's sequential walk.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Sequence, Tuple

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dlmc_quant_tpu.training.losses import l2_loss
from dlmc_quant_tpu.training.schedulers import CosineAnnealingLR
from dlmc_quant_tpu.utils.logging import get_logger

# per-param-group LRs (ref: fsptq_trainer.py:136-152 generate_optimizer)
DEFAULT_GROUP_LRS = {
    "kernel": 1e-5,
    "bias": 1e-5,
    "scale_like": 1e-3,      # wt_scale / in_scale / alpha
    "bn": 0.1,               # BatchNorm scale/bias
}

DEFAULT_BLOCK_TYPES = ("RepVGGBlock", "BasicBlock", "Bottleneck",
                       "MobileOneBlock")
DEFAULT_LAYER_NAMES = ("conv1", "linear", "reparam")


def _get_subtree(tree, path: Tuple[str, ...]):
    node = tree
    for p in path:
        if node is None or p not in node:
            return {}
        node = node[p]
    return node


def _set_subtree(tree, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def discover_blocks(model, variables, sample_x,
                    block_types: Sequence[str] = DEFAULT_BLOCK_TYPES,
                    layer_names: Sequence[str] = DEFAULT_LAYER_NAMES,
                    **apply_kw) -> List[Tuple[Tuple[str, ...], nn.Module]]:
    """Find reconstruction targets: top-level modules whose type name is
    in ``block_types`` or whose name is in ``layer_names``; returns
    (path, unbound module clone) in call order.
    ref: fsptq_trainer.py:37-45 + FSPTQuant.py:102
    """
    found: Dict[Tuple[str, ...], nn.Module] = {}
    order: List[Tuple[str, ...]] = []

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        path = tuple(str(p) for p in mod.path)
        if path and (type(mod).__name__ in block_types
                     or path[-1] in layer_names):
            # record only outermost matching modules
            if not any(path[:len(p)] == p for p in found if len(p) < len(path)):
                if path not in found:
                    found[path] = mod.clone(parent=None)
                    order.append(path)
        return next_fn(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        model.apply(variables, sample_x, qmode="fp", **apply_kw)
    return [(p, found[p]) for p in order]


def first_quant_path(model, variables, sample_x, **apply_kw) -> Optional[str]:
    """Path of the first quantized layer (call order) whose activation
    quantizer is enabled, or None.  Used to reproduce the reference's
    ``change_model_state``: activation quant stays OFF on the first conv
    during reconstruction and eval (ref: fsptq_trainer.py:155-161)."""
    scheme = getattr(model, "scheme", None)
    if scheme is None:
        return None
    hit: List[str] = []

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if not hit and hasattr(mod, "_resolve_cfg"):
            path = ".".join(str(p) for p in mod.path)
            cfg = scheme.resolve(path)
            if cfg is not None and cfg.input.enable:
                hit.append(path)
        return next_fn(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        model.apply(variables, sample_x, qmode="fp", **apply_kw)
    return hit[0] if hit else None


def disable_act_quant_on(model, path: str):
    """New model whose scheme disables input quantization for ``path``.

    Prepends an override carrying the layer's fully-resolved config with
    ``input.enable`` forced off, so any existing override for that layer
    is preserved (resolution stops at the first match)."""
    import dataclasses as dc
    import re as _re

    from dlmc_quant_tpu.quant.config import _freeze

    scheme = model.scheme
    cfg = scheme.resolve(path)
    if cfg is None:
        return model
    opts = cfg.to_dict()
    opts["input"]["enable"] = False
    new_over = (((
        _re.escape(path) + "$",), _freeze(opts)),) + scheme.override_options
    return dc.replace(model, scheme=dc.replace(
        scheme, override_options=new_over))


def capture_block_io(model, variables, batches, target: Tuple[str, ...],
                     qmode: str, **apply_kw):
    """Run the model over ``batches`` capturing (input, output) of the
    target module.  ref: fsptq_trainer.py:46-67 (hook caching loop).
    """
    def run(v, xb):
        cap = {}

        def interceptor(next_fn, args, kwargs, context):
            path = tuple(str(p) for p in context.module.path)
            out = next_fn(*args, **kwargs)
            if path == target:
                cap["in"], cap["out"] = args[0], out
            return out

        with nn.intercept_methods(interceptor):
            model.apply(v, xb, qmode=qmode, **apply_kw)
        return cap["in"], cap["out"]

    run = jax.jit(run)  # interception happens at trace time
    ins, outs = [], []
    for xb in batches:
        i, o = run(variables, xb)
        ins.append(i)
        outs.append(o)
    return jnp.concatenate(ins), jnp.concatenate(outs)


def _group_label(path: Tuple[str, ...]) -> str:
    leaf = path[-1]
    if leaf in ("kernel",):
        return "kernel"
    if leaf in ("bias",) and "bn" not in "/".join(path).lower():
        return "bias"
    if leaf in ("scale",):      # BatchNorm scale
        return "bn"
    return "scale_like"          # wt_scale / in_scale / alpha / bounds


def _round_reg(params, beta):
    """AdaRound rounding regularizer: Σ 1 − |2·h(α) − 1|^β over every
    ``alpha`` leaf, where h(α) is the rectified-sigmoid soft target.

    Pushes soft targets to {0, 1} as β anneals down, so the hard
    (α ≥ 0) eval decision matches what reconstruction optimized —
    WITHOUT it the soft targets drift toward 0.5 and hard thresholding
    scrambles them (AdaRound paper Eq. 24; the reference's FSPTQ trains
    a plain l2 with no regularizer, ref: fsptq_trainer.py:76-103, and
    measurably loses to nearest rounding at W4 because of it).
    """
    from dlmc_quant_tpu.quant.layers import (ADAROUND_GAMMA, ADAROUND_ZETA)

    flat = flax.traverse_util.flatten_dict(params)
    reg = jnp.float32(0.0)
    for path, leaf in flat.items():
        if path[-1] == "alpha":
            h = jnp.clip(jax.nn.sigmoid(leaf)
                         * (ADAROUND_ZETA - ADAROUND_GAMMA)
                         + ADAROUND_GAMMA, 0.0, 1.0)
            reg = reg + jnp.sum(1.0 - jnp.abs(2.0 * h - 1.0) ** beta)
    return reg


def _has_alpha(params) -> bool:
    return any(p[-1] == "alpha"
               for p in flax.traverse_util.flatten_dict(params))


def reconstruct_block(block: nn.Module, block_vars: Dict, x_cache, y_fp,
                      iters: int = 2000, batch_size: int = 64,
                      lrs: Optional[Dict[str, float]] = None,
                      seed: int = 0, train_qmode: str = "train",
                      round_reg_lambda: float = 0.01,
                      holdout_frac: float = 0.25):
    """Adam + cosine reconstruction of one block against cached FP outputs.

    ref: fsptq_trainer.py:76-103.  Blocks with AdaRound ``alpha``
    params additionally get the β-annealed rounding regularizer
    (:func:`_round_reg`): warmup 20 % of iters with no regularization,
    then β anneals 20 → 2 (the AdaRound paper's schedule).

    Unlike the reference, a ``holdout_frac`` slice of the cached set is
    NEVER trained on; the returned params are the iterate with the best
    held-out reconstruction l2 (evaluated every ~50 iters inside the
    scan, in *eval* qmode so AdaRound's hard decision is scored), with
    the initial calibrated params as iterate 0.  On data where fitting
    the teacher's responses to 1024 images is fitting noise, the best
    held-out iterate is an early one — reconstruction can then never
    end WORSE than calibration (measured: default-LR recon cost 21
    top-1 points on the noise-dominated synthetic task before this).
    """
    lrs = {**DEFAULT_GROUP_LRS, **(lrs or {})}
    params = block_vars["params"]

    flat = flax.traverse_util.flatten_dict(params)
    labels = flax.traverse_util.unflatten_dict(
        {p: _group_label(p) for p in flat})
    sched = {g: CosineAnnealingLR(lr, cycle_steps=iters)
             for g, lr in lrs.items()}
    tx = optax.multi_transform(
        {g: optax.adam(sched[g]) for g in lrs}, labels)
    opt_state = tx.init(params)

    rest = {k: v for k, v in block_vars.items() if k != "params"}
    n_total = x_cache.shape[0]
    # deterministic holdout split of the cached activations
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n_total)
    n_hold = max(int(holdout_frac * n_total), 1) if holdout_frac > 0 else 0
    hold_idx = jnp.asarray(perm[:n_hold].astype(np.int32))
    train_idx = perm[n_hold:]
    n = len(train_idx)
    use_reg = round_reg_lambda > 0 and _has_alpha(params)
    warmup = int(0.2 * iters)
    eval_every = max(min(50, iters // 4), 1)

    # Pre-draw every minibatch's indices and the regularizer schedule,
    # then run ALL iterations on device in one lax.scan — one dispatch
    # per block instead of `iters` (a Python step loop paid per-call
    # dispatch latency on the TPU tunnel: ~300 ms × 800 iters ≈ 4 min
    # per block; the scan runs the same work in seconds).
    bs = min(batch_size, n)
    idx_all = jnp.asarray(
        np.stack([train_idx[rng.choice(n, bs, replace=False)]
                  for _ in range(iters)]).astype(np.int32))
    it_ar = np.arange(iters, dtype=np.float32)
    t_ar = np.clip((it_ar - warmup) / max(iters - warmup, 1), 0.0, None)
    if use_reg:
        lam_all = jnp.asarray(
            np.where(it_ar >= warmup, round_reg_lambda, 0.0)
            .astype(np.float32))
        beta_all = jnp.asarray((20.0 - 18.0 * t_ar).astype(np.float32))
    else:
        lam_all = jnp.zeros(iters, jnp.float32)
        beta_all = jnp.full(iters, 20.0, jnp.float32)
    check_all = jnp.asarray(
        ((np.arange(iters) + 1) % eval_every == 0) if n_hold else
        np.zeros(iters, bool))

    def hold_l2(p):
        out = block.apply({"params": p, **rest}, x_cache[hold_idx],
                          qmode="eval")
        return l2_loss(out, y_fp[hold_idx])

    @jax.jit
    def run(params, opt_state):
        best0 = hold_l2(params) if n_hold else jnp.float32(jnp.inf)

        def body(carry, xs):
            params, opt_state, best_l2, best_params = carry
            idx, lam, beta, check = xs

            def loss_fn(p):
                out = block.apply({"params": p, **rest}, x_cache[idx],
                                  qmode=train_qmode)
                loss = l2_loss(out, y_fp[idx])
                if use_reg:
                    loss = loss + lam * _round_reg(p, beta)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if n_hold:
                cur = jax.lax.cond(check, lambda: hold_l2(params),
                                   lambda: jnp.float32(jnp.inf))
                better = cur < best_l2
                best_l2 = jnp.where(better, cur, best_l2)
                best_params = jax.tree_util.tree_map(
                    lambda b, p: jnp.where(better, p, b), best_params,
                    params)
            return (params, opt_state, best_l2, best_params), loss

        (params, _, best_l2, best_params), losses = jax.lax.scan(
            body, (params, opt_state, best0, params),
            (idx_all, lam_all, beta_all, check_all))
        if n_hold:
            return best_params, best_l2
        return params, losses[-1]

    params, loss = run(params, opt_state)
    return params, float(loss)


class FSPTQTrainer:
    """Orchestrates RepAPQ reconstruction over all blocks.

    ref: trainer/fsptq_trainer.py:28-161.  The student must already be
    calibrated (explicit calibrate pass, replacing the reference's lazy
    init inside the capture forward).
    """

    def __init__(self, model, variables, fp_model, fp_variables,
                 cal_batches, iters: int = 2000, batch_size: int = 64,
                 lrs: Optional[Dict[str, float]] = None,
                 block_types: Sequence[str] = DEFAULT_BLOCK_TYPES,
                 layer_names: Sequence[str] = DEFAULT_LAYER_NAMES,
                 logger=None, disable_first_act_quant: bool = False,
                 bn_recal: bool = True):
        self.model = model
        self.variables = flax.core.unfreeze(variables)
        self.fp_model = fp_model
        self.fp_variables = fp_variables
        self.cal_batches = [jnp.asarray(b) for b in cal_batches]
        self.iters = iters
        self.batch_size = batch_size
        self.lrs = lrs
        self.block_types = block_types
        self.layer_names = layer_names
        self.logger = logger or get_logger("fsptq")
        # ref: fsptq_trainer.py:155-161 change_model_state keeps
        # activation quant OFF on the first conv during reconstruction
        # and validation; expressed here as a prepended scheme override.
        self.disable_first_act_quant = disable_first_act_quant
        if disable_first_act_quant:
            path = first_quant_path(self.model, self.variables,
                                    self.cal_batches[0])
            if path is not None:
                self.model = disable_act_quant_on(self.model, path)
                self.logger.info(
                    "disabled activation quant on first layer %s", path)
        self.bn_recal = bn_recal and "batch_stats" in self.variables

    def _refresh_bn(self, recalibrate_quantizers: bool):
        """BN-stat re-estimation under quantization noise (see
        training/ptq.py:bn_recalibrate — the frozen-stat mismatch
        otherwise compounds block by block and reconstruction chases a
        drifting input distribution).  Optionally re-runs quantizer
        calibration afterwards: activation scales were observed under
        the stale statistics."""
        from dlmc_quant_tpu.quant.layers import calibrate
        from dlmc_quant_tpu.training.ptq import bn_recalibrate

        self.variables = bn_recalibrate(self.model, self.variables,
                                        self.cal_batches)
        if recalibrate_quantizers:
            self.variables = flax.core.unfreeze(calibrate(
                self.model, self.variables, self.cal_batches,
                observe_passes=len(self.cal_batches)))

    def _teacher_preds(self):
        """FP teacher's argmax on the calibration batches (label-free
        acceptance signal, like the reference's model-vs-fp_model
        validation; ref: fsptq_trainer.py:104-132)."""
        fn = jax.jit(lambda v, x: jnp.argmax(
            self.fp_model.apply(v, x, qmode="fp"), -1))
        return [fn(self.fp_variables, b) for b in self.cal_batches]

    def _agreement(self, teacher_preds) -> float:
        if not hasattr(self, "_agree_fn"):      # one trace, many calls
            self._agree_fn = jax.jit(lambda v, x: jnp.argmax(
                self.model.apply(v, x, qmode="eval"), -1))
        hits = tot = 0
        for b, t in zip(self.cal_batches, teacher_preds):
            hits += int(jnp.sum(self._agree_fn(self.variables, b) == t))
            tot += int(t.size)
        return hits / max(tot, 1)

    def train(self) -> Dict:
        t0 = time.time()
        if self.bn_recal:
            self._refresh_bn(recalibrate_quantizers=True)
            self.logger.info("BN statistics re-estimated pre-recon")
        targets = discover_blocks(self.model, self.variables,
                                  self.cal_batches[0],
                                  self.block_types, self.layer_names)
        self.logger.info("reconstructing %d blocks: %s", len(targets),
                         [".".join(p) for p, _ in targets])
        # Per-block acceptance: a block's reconstruction is kept only if
        # the quantized model's agreement with the FP teacher does not
        # drop.  Reconstruction minimizes output l2 on the calibration
        # set; on data whose teacher responses are noise-dominated the
        # l2-optimal params can be *accuracy-worse* (measured: -21
        # top-1 on the hard synthetic task while per-block held-out l2
        # improved) — this gate makes reconstruction never-worse-than-
        # calibration, block by block, without labels.  The reference
        # validates once at the end and keeps the best full model
        # (fsptq_trainer.py:104-132); block granularity is strictly
        # finer.
        teacher_preds = self._teacher_preds()
        agree = self._agreement(teacher_preds)
        self.logger.info("teacher agreement after calibration: %.4f",
                         agree)
        losses = {}
        for path, block in targets:
            x_cache, _ = capture_block_io(
                self.model, self.variables, self.cal_batches, path,
                qmode="eval")
            _, y_fp = capture_block_io(
                self.fp_model, self.fp_variables, self.cal_batches, path,
                qmode="fp")
            block_vars = {
                "params": _get_subtree(self.variables["params"], path)}
            for col in ("qstate", "batch_stats"):
                sub = _get_subtree(self.variables.get(col, {}), path)
                if sub:
                    block_vars[col] = sub
            old_params = block_vars["params"]
            new_params, loss = reconstruct_block(
                block, block_vars, x_cache, y_fp, self.iters,
                self.batch_size, self.lrs)
            _set_subtree(self.variables["params"], path, new_params)
            new_agree = self._agreement(teacher_preds)
            if new_agree < agree:
                _set_subtree(self.variables["params"], path, old_params)
                self.logger.info(
                    "block %-16s recon l2=%.5f REVERTED "
                    "(agreement %.4f -> %.4f)", ".".join(path), loss,
                    agree, new_agree)
            else:
                agree = new_agree
                self.logger.info("block %-16s recon l2=%.5f kept "
                                 "(agreement %.4f)", ".".join(path),
                                 loss, agree)
            losses[".".join(path)] = loss
        if self.bn_recal:
            # reconstruction moved scales/γ/β; align the running stats
            # with the final deployed forward (quantizer params stay)
            self._refresh_bn(recalibrate_quantizers=False)
            self.logger.info("BN statistics re-estimated post-recon")
        self.logger.info("reconstruction done in %.1fs (final teacher "
                         "agreement %.4f)", time.time() - t0, agree)
        return {"variables": self.variables, "block_losses": losses}
