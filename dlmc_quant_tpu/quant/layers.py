"""Quantized layers (flax linen): QConv and QDense.

Design (TPU-first, not a translation of the reference's module surgery):

* Models are pure functions of a param pytree; a layer is quantized when
  the model's :class:`~dlmc_quant_tpu.quant.config.QuantScheme` resolves a
  config for its pytree path (regex exclude/override, resolved at trace
  time — replaces the reference's in-place ``__new__`` class swap,
  ref: dlmc/utils/quantize.py:103-136).
* Calibration is an **explicit pass**, not lazy first-forward init
  (ref: modules/base.py:82-129 does it lazily).  Run ``qmode='calibrate'``
  with ``mutable=['qcal', 'qstate']``: every quantized layer computes its
  observer and writes results to the ``qcal`` collection, quantizing as it
  goes so downstream layers calibrate against upstream quantization noise
  — identical numerics to the reference's first-batch init.  Then
  :func:`merge_calibration` folds ``qcal`` into params/qstate.
* Multi-batch observers: run ``qmode='observe'`` over N batches first
  (streaming min/max/percentile state in ``qstate``), then one
  ``'calibrate'`` pass finalizes from the accumulated stats.
* Variable collections: ``params`` = learnables (kernel/bias + quantizer
  scales/bounds/alpha), ``qstate`` = non-learned quantizer state
  (offsets, EMA running stats, streaming observer stats).

Estimator families (``scheme.quantization_type``):
  * ``None``/'LSQ' — LSQ-style fake quant, learnable step size
    (ref: modules/base.py)
  * ``'RootQ'``    — learned clip bounds + root surrogate, EMA running
    stats (ref: RootQ/base.py)
  * ``'FSPTQ'``    — per-channel trainable weight scales, optional
    AdaRound soft rounding (ref: FSPTQuant/base.py)

Layout is NHWC / HWIO (TPU-native).  Per-channel weight axis = output
channels (last axis of HWIO/IO kernels), matching the reference's OIHW
axis 0 semantics.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from dlmc_quant_tpu.ops import observers as obs
from dlmc_quant_tpu.ops import rootq_math as rq
from dlmc_quant_tpu.ops.numerics import (
    channel_param_shape,
    floor_pass,
    grad_scale,
    lsq_fake_quant,
    lsq_init_scale,
    round_pass,
)
from dlmc_quant_tpu.quant.config import LayerQConfig, QuantScheme, TensorQConfig

Dtype = Any

QMODES = ("train", "eval", "calibrate", "observe", "fp")

# AdaRound rectified-sigmoid constants (ref: FSPTQuant/base.py:62-63)
ADAROUND_GAMMA, ADAROUND_ZETA, ADAROUND_BETA = -0.1, 1.1, 2.0 / 3.0


def _sg(x):
    return jax.lax.stop_gradient(x)


# ---------------------------------------------------------------------------
# kernel layout helpers: observers speak (O, I, *spatial); kernels are
# HWIO (conv) or IO (dense)
# ---------------------------------------------------------------------------

def _to_oi(kernel: jnp.ndarray) -> jnp.ndarray:
    """HWIO → OIHW (conv) or IO → OI (dense)."""
    if kernel.ndim == 4:
        return jnp.transpose(kernel, (3, 2, 0, 1))
    return kernel.T


def _wt_stat_shape(cfg: TensorQConfig, kernel_shape) -> Tuple[int, ...]:
    """Static shape of the weight scale/offset parameter."""
    if cfg.per_channel:
        return (kernel_shape[-1],)                       # output channels
    if cfg.per_pixel:
        if len(kernel_shape) != 4:
            raise ValueError("per-pixel weight quantization needs a conv kernel")
        return tuple(kernel_shape[:2])                   # (H, W)
    return ()


def _wt_bshape(cfg: TensorQConfig, stat, kernel_ndim: int):
    """Reshape a weight stat to broadcast against an HWIO/IO kernel."""
    if cfg.per_channel:
        return stat.reshape(channel_param_shape(kernel_ndim, kernel_ndim - 1))
    if cfg.per_pixel:
        return stat.reshape(stat.shape + (1, 1))         # (H, W, 1, 1)
    return stat


def _oi_stat_to_store(cfg: TensorQConfig, stat_oi) -> jnp.ndarray:
    """Observer output (broadcast-shaped in OI layout) → stored stat shape."""
    if cfg.per_channel or cfg.per_pixel:
        return jnp.squeeze(stat_oi)
    return jnp.reshape(stat_oi, ())


def _in_stat_shape(cfg: TensorQConfig, x_shape) -> Tuple[int, ...]:
    return (x_shape[-1],) if cfg.per_channel else ()


def _in_bshape(cfg: TensorQConfig, stat, x_ndim: int):
    if cfg.per_channel:
        return stat.reshape(channel_param_shape(x_ndim, x_ndim - 1))
    return stat


# ---------------------------------------------------------------------------
# quantizer mixin — all estimator families; methods run inside linen apply
# ---------------------------------------------------------------------------

class _QuantOps:
    """Shared quantizer machinery for QConv / QDense (no dataclass fields)."""

    # --- common -----------------------------------------------------------

    def _layer_path(self) -> str:
        return ".".join(self.scope.path) if self.scope.path else self.name or ""

    def _resolve_cfg(self) -> Optional[LayerQConfig]:
        if self.scheme is None:
            return None
        return self.scheme.resolve(self._layer_path())

    def _family(self) -> str:
        t = self.scheme.quantization_type
        return (t or "LSQ").lower()

    # --- LSQ / plain fake-quant family (ref: modules/base.py) ------------

    def _lsq_input(self, x, cfg: TensorQConfig, qmode: str):
        qmin, qmax = cfg.qrange
        sshape = _in_stat_shape(cfg, x.shape)
        scale = self.param("in_scale", nn.initializers.ones, sshape)
        offset = self.variable("qstate", "in_offset",
                               lambda: jnp.zeros(sshape))
        stream = self.variable("qstate", "in_stream",
                               lambda: obs.streaming_init(sshape))

        if qmode == "observe":
            stream.value = obs.streaming_update(
                stream.value, _sg(x),
                ch_axis=(x.ndim - 1) if cfg.per_channel else None)
            return x

        if qmode == "calibrate":
            xd = _sg(x)
            if cfg.type == "LSQ":
                s = lsq_init_scale(
                    xd, qmax,
                    axis=None if not cfg.per_channel
                    else tuple(range(x.ndim - 1)))
                off = jnp.zeros(sshape)
            elif (cfg.type.startswith(("minmax", "percentile"))
                  and not cfg.per_pixel):
                s, off = jax.lax.cond(
                    stream.value.count > 0,
                    lambda: obs.streaming_finalize(
                        stream.value, cfg.type, cfg.n_bits, cfg.signed),
                    lambda: _batch_observe(xd, cfg, x.ndim - 1))
            else:
                kw = cfg.observer_kwargs
                if cfg.per_channel:
                    kw["ch_axis"] = x.ndim - 1
                s_b, off_b = obs.get_qparams_tensor(xd, cfg.type, **kw)
                s = (jnp.squeeze(s_b) if cfg.per_channel
                     else jnp.reshape(s_b, ()))
                off = (jnp.squeeze(off_b) if cfg.per_channel
                       else jnp.reshape(off_b, ()))
            s = jnp.reshape(s, sshape)
            off = jnp.reshape(off, sshape)
            self.variable("qcal", "in_scale", lambda: s).value = s
            offset.value = off
            scale_val, off_val = s, off
        else:
            scale_val, off_val = scale, offset.value

        g = 1.0 / jnp.sqrt(float(x.size) * float(max(qmax, 1)))
        return lsq_fake_quant(x, _in_bshape(cfg, scale_val, x.ndim),
                              _in_bshape(cfg, off_val, x.ndim),
                              qmin, qmax, g)

    def _lsq_weight(self, kernel, x_q, cfg: TensorQConfig, qmode: str,
                    forward_oi: Callable):
        qmin, qmax = cfg.qrange
        sshape = _wt_stat_shape(cfg, kernel.shape)
        scale = self.param("wt_scale", nn.initializers.ones, sshape)
        offset = self.variable("qstate", "wt_offset",
                               lambda: jnp.zeros(sshape))

        if qmode == "calibrate":
            w_oi = _to_oi(_sg(kernel))
            if cfg.type == "LSQ":
                s = lsq_init_scale(w_oi, qmax,
                                   axis=None if not cfg.per_channel
                                   else tuple(range(1, w_oi.ndim)))
                off = jnp.zeros(sshape)
            elif obs.is_output_observer(cfg.type):
                kw = cfg.observer_kwargs
                if cfg.per_channel:
                    kw["ch_axis"] = 0
                s_b, off_b = obs.get_qparams_output(
                    _sg(x_q), w_oi, forward_oi, cfg.type, **kw)
                s, off = _oi_stat_to_store(cfg, s_b), _oi_stat_to_store(cfg, off_b)
            else:
                kw = cfg.observer_kwargs
                if cfg.per_channel:
                    kw["ch_axis"] = 0
                s_b, off_b = obs.get_qparams_tensor(w_oi, cfg.type, **kw)
                s, off = _oi_stat_to_store(cfg, s_b), _oi_stat_to_store(cfg, off_b)
            s = jnp.reshape(s, sshape)
            off = jnp.reshape(off, sshape)
            self.variable("qcal", "wt_scale", lambda: s).value = s
            offset.value = off
            scale_val, off_val = s, off
        else:
            scale_val, off_val = scale, offset.value

        g = 1.0 / jnp.sqrt(float(kernel.size) * float(max(qmax, 1)))
        return lsq_fake_quant(kernel, _wt_bshape(cfg, scale_val, kernel.ndim),
                              _wt_bshape(cfg, off_val, kernel.ndim),
                              qmin, qmax, g)

    # --- RootQ family (ref: RootQ/base.py) --------------------------------

    def _rootq_input(self, x, cfg: TensorQConfig, momentum: float, qmode: str):
        qmin, qmax = cfg.qrange
        span = float(qmax - qmin)
        scale = self.param("in_scale", nn.initializers.ones, ())
        run_scale = self.variable("qstate", "in_run_scale",
                                  lambda: jnp.zeros(()))

        if qmode == "observe":
            return x  # RootQ init uses a single batch (ref: base.py:79-90)

        if qmode == "calibrate":
            xd = _sg(x)
            s0 = (jnp.max(xd) - jnp.min(xd)) / span   # ref: base.py:80
            self.variable("qcal", "in_scale", lambda: s0).value = s0
            run_scale.value = s0
            running = s0
        elif qmode == "train":
            running = (1.0 - momentum) * run_scale.value + momentum * scale
            g_i = 1.0 / jnp.sqrt(float(x.size) * float(max(qmax, 1)))
            running = grad_scale(running, g_i)        # ref: base.py:93-97
            run_scale.value = _sg(running)
        else:
            running = run_scale.value

        return rq.rootq_act_fake_quant(x, running, qmax, qmin)

    def _rootq_weight(self, kernel, cfg: TensorQConfig, momentum: float,
                      qmode: str):
        qmin, qmax = cfg.qrange
        upper = self.param("wt_upper", nn.initializers.constant(1.0), ())
        lower = self.param("wt_lower", nn.initializers.constant(-1.0), ())
        alpha = self.param("wt_alpha", nn.initializers.constant(0.25), ())
        run_upper = self.variable("qstate", "wt_run_upper",
                                  lambda: jnp.ones(()))
        run_lower = self.variable("qstate", "wt_run_lower",
                                  lambda: -jnp.ones(()))

        if qmode == "calibrate":
            wd = _sg(kernel)
            wmax = 2.0 * jnp.mean(jnp.abs(wd)) * jnp.sqrt(float(max(qmax, 1)))
            self.variable("qcal", "wt_upper", lambda: wmax).value = wmax
            self.variable("qcal", "wt_lower", lambda: -wmax).value = -wmax
            run_upper.value, run_lower.value = wmax, -wmax
            u, l = wmax, -wmax                        # ref: base.py:113-129
        elif qmode == "train":
            g_w = 1.0 / jnp.sqrt(float(kernel.size) * float(max(qmax, 1)))
            u = (1.0 - momentum) * run_upper.value + momentum * upper
            l = (1.0 - momentum) * run_lower.value + momentum * lower
            u, l = grad_scale(u, g_w), grad_scale(l, g_w)  # ref: base.py:136-140
            run_upper.value, run_lower.value = _sg(u), _sg(l)
        else:
            u, l = run_upper.value, run_lower.value

        return rq.rootq_weight_fake_quant(kernel, u, l, alpha, qmin, qmax)

    # --- FSPTQ / RepAPQ family (ref: FSPTQuant/base.py) -------------------

    def _fsptq_input(self, x, cfg: TensorQConfig, qmode: str):
        qmin, qmax = cfg.qrange
        scale = self.param("in_scale", nn.initializers.ones, ())
        offset = self.variable("qstate", "in_offset", lambda: jnp.zeros(()))
        stream = self.variable("qstate", "in_stream",
                               lambda: obs.streaming_init(()))

        if qmode == "observe":
            stream.value = obs.streaming_update(stream.value, _sg(x))
            return x

        if qmode == "calibrate":
            xd = _sg(x)
            if cfg.type.startswith(("minmax", "percentile")):
                s, off_f = jax.lax.cond(
                    stream.value.count > 0,
                    lambda: obs.streaming_finalize(
                        stream.value, cfg.type, cfg.n_bits, cfg.signed),
                    lambda: _batch_observe(xd, cfg, None))
            else:
                s, off_f = obs.get_qparams_tensor(xd, cfg.type,
                                                  **cfg.observer_kwargs)
                s, off_f = jnp.reshape(s, ()), jnp.reshape(off_f, ())
            # integer zero-point convention (the reference stores the float
            # min here and adds it to integers, FSPTQuant/base.py:99-108 —
            # we use the principled int zero-point)
            zp = jnp.clip(jnp.round(-off_f / s), qmin, qmax)
            self.variable("qcal", "in_scale", lambda: s).value = s
            offset.value = zp
            s_val, zp_val = s, zp
        else:
            s_val, zp_val = scale, offset.value

        q = jnp.clip(round_pass(x / s_val) + zp_val, qmin, qmax)
        return (q - zp_val) * s_val                   # ref: base.py:108-109

    def _fsptq_weight(self, kernel, cfg: TensorQConfig, qmode: str,
                      x_q=None, forward_oi: Optional[Callable] = None):
        qmin, qmax = cfg.qrange
        sshape = _wt_stat_shape(cfg, kernel.shape)
        scale = self.param("wt_scale", nn.initializers.ones, sshape)
        adaround = cfg.recon_type == "adaround"
        if adaround:
            alpha = self.param("alpha", nn.initializers.ones, kernel.shape)

        if qmode == "calibrate":
            w_oi = _to_oi(_sg(kernel))
            kw = cfg.observer_kwargs
            if cfg.per_channel:
                kw["ch_axis"] = 0
            if obs.is_output_observer(cfg.type):
                # '*output*' observer types dispatch from any quantized
                # module family in the reference (fnmatch at
                # modules/base.py:106-129) — FSPTQ included
                s_b, _ = obs.get_qparams_output(
                    _sg(x_q), w_oi, forward_oi, cfg.type, **kw)
            else:
                s_b, _ = obs.get_qparams_tensor(w_oi, cfg.type, **kw)
            s = jnp.reshape(_oi_stat_to_store(cfg, s_b), sshape) + 1e-6
            self.variable("qcal", "wt_scale", lambda: s).value = s
            self.variable("qstate", "org_weight",
                          lambda: _sg(kernel)).value = _sg(kernel)
            if adaround:
                # init alpha so sigmoid recovers the fractional remainder
                # (ref: FSPTQuant/base.py:69-76)
                s_bc = _wt_bshape(cfg, s, kernel.ndim)
                t = _sg(kernel) / s_bc
                rest = t - jnp.floor(t)
                a0 = -jnp.log(
                    (ADAROUND_ZETA - ADAROUND_GAMMA)
                    / jnp.clip(rest - ADAROUND_GAMMA, 1e-6, None) - 1.0)
                self.variable("qcal", "alpha", lambda: a0).value = a0
                alpha_val = a0
            s_val = s
        else:
            s_val = scale
            if adaround:
                alpha_val = alpha

        s_bc = _wt_bshape(cfg, s_val, kernel.ndim)
        if adaround:
            t = jnp.floor(kernel / s_bc)
            if qmode == "train":
                soft = jnp.clip(
                    jax.nn.sigmoid(alpha_val)
                    * (ADAROUND_ZETA - ADAROUND_GAMMA) + ADAROUND_GAMMA,
                    0.0, 1.0)                          # ref: base.py:78-79
                q = t + soft
            else:
                q = t + (alpha_val >= 0).astype(kernel.dtype)
        else:
            q = round_pass(kernel / s_bc)              # ref: base.py:148-149
        q = jnp.clip(q, qmin, qmax)
        return q * s_bc

    # --- dispatch ---------------------------------------------------------

    def _quantize(self, x, kernel, qmode: str, forward_oi: Callable):
        """Apply (input, weight) quantizers per the resolved config."""
        cfg = self._resolve_cfg()
        if cfg is None or qmode == "fp":
            return x, kernel
        fam = self._family()
        x_q, w_q = x, kernel
        if fam == "rootq":
            if cfg.input.enable:
                x_q = self._rootq_input(x, cfg.input, cfg.momentum, qmode)
            if cfg.weight.enable:
                w_q = self._rootq_weight(kernel, cfg.weight, cfg.momentum,
                                         qmode)
        elif fam == "fsptq":
            if cfg.input.enable:
                x_q = self._fsptq_input(x, cfg.input, qmode)
            if cfg.weight.enable:
                w_q = self._fsptq_weight(kernel, cfg.weight, qmode,
                                         x_q, forward_oi)
        else:  # LSQ / plain
            if cfg.input.enable:
                x_q = self._lsq_input(x, cfg.input, qmode)
            if cfg.weight.enable:
                w_q = self._lsq_weight(kernel, x_q, cfg.weight, qmode,
                                       forward_oi)
        if qmode == "observe":
            return x_q, kernel  # FP forward while accumulating stats
        return x_q, w_q


class _IntOps:
    """Integer-execution plan builder shared by QConv/QDense.

    See quant/deploy.py for the math.  Plans live in the 'qint'
    collection; built during qmode='deploy_prep', consumed by
    qmode='int'.
    """

    def _act_qrange(self, cfg: LayerQConfig):
        """Effective integer grid of the activation quantizer.

        RootQ clips activations to [0, scale·span] and rounds — an
        unsigned grid of `span` levels whatever the config's signed flag
        says (ref: RootQ/base.py:108-111)."""
        aq = cfg.input
        if self._family() == "rootq":
            return 0, aq.qmax - aq.qmin
        return aq.qrange

    def _build_int_plan(self, kernel, bias, cfg: LayerQConfig,
                        colsum_fn: Callable):
        from dlmc_quant_tpu.quant import deploy as dp

        fam = self._family()
        # gather this layer's quantizer params/state from live variables
        pcol = {name: self.get_variable("params", name)
                for name in ("wt_scale", "in_scale")
                if self.has_variable("params", name)}
        qcol = {name: self.get_variable("qstate", name)
                for name in ("wt_offset", "in_offset", "wt_run_upper",
                             "wt_run_lower", "in_run_scale")
                if self.has_variable("qstate", name)}

        wq, aq = cfg.weight, cfg.input
        if wq.enable:
            if wq.per_pixel:
                raise ValueError(
                    f"{self._layer_path()}: per-pixel weights have no "
                    "integer execution plan (use fake-quant eval)")
            s_w, o_w = dp.affine_from_quantizer(fam, wq, pcol, qcol,
                                                "weight")
            s_w = jnp.reshape(s_w, (-1,)) if wq.per_channel \
                else jnp.reshape(s_w, ())
            if (fam == "fsptq" and wq.recon_type == "adaround"
                    and self.has_variable("params", "alpha")):
                # learned rounding: floor + hard alpha decision
                # (ref: FSPTQuant/base.py:136-141 eval branch)
                alpha = self.get_variable("params", "alpha")
                s_b = _wt_bshape(wq, s_w, kernel.ndim)
                q = jnp.floor(kernel / s_b) + (alpha >= 0)
                w_int = jnp.clip(q, wq.qmin, wq.qmax).astype(jnp.int8)
            else:
                w_int = dp.quantize_weight_int(kernel, s_w, wq.qmin, wq.qmax)
        else:
            raise ValueError(
                f"{self._layer_path()}: weight quantization disabled — "
                "nothing to deploy")

        plan = {"w_scale": s_w.astype(jnp.float32)}
        if wq.n_bits <= 4 and dp.int4_native_supported():
            # native S4 dtype: XLA packs two-per-byte in device memory
            # and contracts directly (mixed s8xs4 dot) — halves weight
            # HBM traffic with no unpack pass
            plan["w_i4"] = w_int.astype(jnp.int4)
        elif wq.n_bits <= 4:
            # two-nibbles-per-byte packing halves weight memory; unpacked
            # on the fly at forward (cheap vs activation traffic)
            plan["w_int4"] = dp.pack_int4(w_int)
        else:
            plan["w_int"] = w_int
        if aq.enable:
            if aq.per_channel or aq.per_pixel:
                raise ValueError(
                    f"{self._layer_path()}: integer path needs per-tensor "
                    "activation quantization")
            s_x, o_x = dp.affine_from_quantizer(fam, aq, pcol, qcol,
                                                "input")
            s_x = jnp.reshape(s_x, ())
            o_x = jnp.reshape(o_x, ())
            aqmin, aqmax = self._act_qrange(cfg)
            shift = dp.act_shift(aqmax)
            colsum = colsum_fn(w_int.astype(jnp.int32)).astype(jnp.float32)
            bias_eff = (shift * s_x + o_x) * plan["w_scale"] * colsum
            if bias is not None:
                bias_eff = bias_eff + bias
            plan.update({
                "in_scale": s_x.astype(jnp.float32),
                "in_inv_scale": (1.0 / s_x).astype(jnp.float32),
                "in_qbias": (-o_x / s_x - shift).astype(jnp.float32),
                "in_offset": o_x.astype(jnp.float32),
                "pad_val": dp.int8_pad_value(s_x, o_x, aqmin, aqmax),
                "bias_eff": bias_eff.astype(jnp.float32),
                # raw colsum + bias so a consumer can re-derive the
                # epilogue for codes arriving on a *different* grid
                # (chained residual boundaries, quant/chain.py
                # QuantizedTensor)
                "colsum": colsum,
                "bias0": (bias.astype(jnp.float32) if bias is not None
                          else jnp.zeros_like(colsum)),
            })
        return plan

    def _store_plan(self, plan):
        for name, val in plan.items():
            self.variable("qint", name, lambda v=val: v).value = val

    def _load_plan(self):
        names = ("w_int", "w_int4", "w_i4", "w_scale", "in_scale",
                 "in_inv_scale", "in_qbias", "in_offset", "pad_val",
                 "bias_eff", "colsum", "bias0")
        return {n: self.get_variable("qint", n) for n in names
                if self.has_variable("qint", n)}

    def _plan_weights(self, plan, kernel_shape):
        """Integer kernel from the plan.  May return an int4-dtype array
        (native path): QDense contracts it directly; convs upcast at
        trace time (XLA fuses the convert, HBM storage stays S4)."""
        from dlmc_quant_tpu.quant import deploy as dp
        if "w_i4" in plan:
            return plan["w_i4"]
        if "w_int4" in plan:
            return dp.unpack_int4(plan["w_int4"], kernel_shape[0])
        return plan["w_int"]


def _s2d_conv(x_i8, w_int, pad_val):
    """3x3/s2 SAME(0,1) conv as a space-to-depth 2x2/s1 VALID conv.

    x_i8 (N, H, W, C) int8 with H, W even; returns int32 accumulator of
    shape (N, H//2, W//2, O).  Exact: the kernel is zero-padded to 4x4
    so the extra padded row/col contribute nothing; the genuine SAME
    pad column/row is filled with the activation zero-point code.
    """
    n, h, w, c = x_i8.shape
    o = w_int.shape[-1]
    xp = jnp.pad(x_i8, ((0, 0), (0, 2), (0, 2), (0, 0)),
                 constant_values=pad_val)
    hp, wp = h + 2, w + 2
    xs = xp.reshape(n, hp // 2, 2, wp // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp // 2, wp // 2, 4 * c)
    w4 = jnp.pad(w_int, ((0, 1), (0, 1), (0, 0), (0, 0)))
    w2 = w4.reshape(2, 2, 2, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
    w2 = w2.reshape(2, 2, 4 * c, o)
    return jax.lax.conv_general_dilated(
        xs, w2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def _batch_observe(x, cfg: TensorQConfig, ch_axis):
    kw = cfg.observer_kwargs
    name = cfg.type
    if cfg.per_channel and ch_axis is not None:
        kw["ch_axis"] = ch_axis
        s, off = obs.get_qparams_tensor(x, name, **kw)
        return jnp.squeeze(s), jnp.squeeze(off)
    if name.startswith("percentile"):
        s, off = obs.percentile_tensor(x, **kw)
    else:
        s, off = obs.minmax_tensor(x, **kw)
    return jnp.reshape(s, ()), jnp.reshape(off, ())


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------

class QConv(nn.Module, _QuantOps, _IntOps):
    """Quantization-aware 2D convolution (NHWC / HWIO).

    With ``scheme=None`` (or an unresolved path) this is a plain conv.
    ref counterparts: QConv2d (modules/conv.py:8-19), RootQConv2d
    (RootQ/conv.py:8-24), FSPTQConv2d (FSPTQuant/conv.py:8-24).
    """
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    scheme: Optional[QuantScheme] = None
    kernel_init: Callable = nn.initializers.he_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, qmode: str = "eval"):
        in_features = x.shape[-1] // self.feature_group_count
        kshape = self.kernel_size + (in_features, self.features)
        kernel = self.param("kernel", self.kernel_init, kshape)
        bias = (self.param("bias", self.bias_init, (self.features,))
                if self.use_bias else None)

        def conv(inp, k):
            y = jax.lax.conv_general_dilated(
                inp, k, window_strides=self.strides, padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.feature_group_count,
                preferred_element_type=jnp.float32)
            if bias is not None:
                y = y + bias
            return y

        def forward_oi(inp, w_oi):
            # observers hand back OIHW weights; run the real op on them
            return conv(inp, jnp.transpose(w_oi, (2, 3, 1, 0)))

        if qmode in ("deploy_prep", "int", "intc"):
            cfg = self._resolve_cfg()
            if cfg is not None and cfg.weight.enable:
                return self._int_conv(x, kernel, bias, cfg, qmode, conv)
            from dlmc_quant_tpu.quant.chain import materialize
            return conv(materialize(x), kernel)

        x_q, w_q = self._quantize(x, kernel, qmode, forward_oi)
        return conv(x_q, w_q)

    # -- integer execution ----------------------------------------------

    def _spatial_pads(self, x):
        """Explicit (lo, hi) spatial pads matching self.padding."""
        if isinstance(self.padding, str):
            if self.padding == "VALID":
                return ((0, 0), (0, 0))
            pads = []
            for d in range(2):
                size, k, s = x.shape[1 + d], self.kernel_size[d], \
                    self.strides[d]
                total = max((-(-size // s) - 1) * s + k - size, 0)
                pads.append((total // 2, total - total // 2))
            return tuple(pads)
        return tuple(tuple(p) for p in self.padding)

    def _int_conv(self, x, kernel, bias, cfg, qmode: str, conv):
        from dlmc_quant_tpu.quant import deploy as dp
        from dlmc_quant_tpu.quant import chain as qchain

        if qmode == "deploy_prep":
            plan = self._build_int_plan(
                kernel, bias, cfg,
                colsum_fn=lambda w: jnp.sum(w, axis=(0, 1, 2)))
            self._store_plan(plan)
        else:
            plan = self._load_plan()

        w_int = self._plan_weights(plan, kernel.shape)
        if "in_scale" not in plan:
            # weight-only quantization: dequantize to bf16, MXU bf16 conv
            x = qchain.materialize(x)
            s_b = _wt_bshape(cfg.weight, plan["w_scale"], kernel.ndim)
            w_deq = (w_int.astype(jnp.bfloat16)
                     * s_b.astype(jnp.bfloat16))
            return conv(x.astype(jnp.bfloat16), w_deq).astype(jnp.float32)

        aqmin, aqmax = self._act_qrange(cfg)
        shift = dp.act_shift(aqmax)
        in_scale, bias_eff, pad_val = (plan.get("in_scale"),
                                       plan.get("bias_eff"),
                                       plan.get("pad_val"))
        if isinstance(x, qchain.QuantizedTensor):
            # chained residual boundary: codes arrive on the *producer's*
            # grid (value ≈ q·s + b); adapt the epilogue instead of
            # requantizing — bias term re-derived from the stored
            # column-sums, so the int8 codes feed the MXU directly
            x_i8 = x.q
            in_scale = x.scale
            bias_eff = x.bias * plan["w_scale"] * plan["colsum"] \
                + plan["bias0"]
            pad_val = x.zero_code()
        elif isinstance(x, qchain.DeferredEpilogue):
            # chained boundary: fold producer epilogue + ReLU + this
            # layer's act quantize into one FMA + clamp (see chain.py)
            x_i8 = qchain.fold_quantize(x, plan["in_inv_scale"],
                                        plan["in_qbias"],
                                        aqmin - shift, aqmax - shift)
        else:
            x_i8, _ = dp.act_to_int8(x, plan["in_scale"],
                                     plan["in_offset"], aqmin, aqmax,
                                     inv_s_x=plan.get("in_inv_scale"),
                                     qbias=plan.get("in_qbias"))
        if w_int.dtype == jnp.int4:
            # conv lowering wants int8 taps; the convert fuses into the
            # conv's weight load while HBM storage stays packed S4
            w_int = w_int.astype(jnp.int8)
        pads = self._spatial_pads(x)
        (plo, phi), (qlo, qhi) = pads
        if (dp.USE_S2D_STEM
                and self.kernel_size == (3, 3) and self.strides == (2, 2)
                and self.feature_group_count == 1
                and x.shape[-1] * 9 < 128
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
                and pads == ((0, 1), (0, 1))):
            # space-to-depth stem: a 3x3/s2 conv over few channels (the
            # ImageNet stem, C=3 -> K=27) regrouped as one 2x2/s1 conv
            # over 4C channels (K=4*4C), numerically identical (the
            # added taps are zero).  Opt-in: measured on the v5e chip
            # (tools/mirror_morph.py) the input relayout costs slightly
            # more than the fatter contraction saves (~+0.2 ms on a
            # RepVGG-A0 batch-256 forward), XLA's native small-C conv
            # lowering is already adequate.
            acc = _s2d_conv(x_i8, w_int, pad_val)
        else:
            x_p = jnp.pad(x_i8, ((0, 0), (plo, phi), (qlo, qhi), (0, 0)),
                          constant_values=pad_val)
            acc = jax.lax.conv_general_dilated(
                x_p, w_int, window_strides=self.strides, padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.feature_group_count,
                preferred_element_type=jnp.int32)
        scale = (in_scale * plan["w_scale"]).reshape(1, 1, 1, -1)
        if qmode == "intc":
            return qchain.DeferredEpilogue(
                acc, scale, bias_eff.reshape(1, 1, 1, -1))
        return acc.astype(jnp.float32) * scale + bias_eff


class QDense(nn.Module, _QuantOps, _IntOps):
    """Quantization-aware dense layer (kernel layout (in, out)).

    ref counterparts: QLinear (modules/linear.py:7-13), RootQLinear,
    FSPTQLinear.
    """
    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    scheme: Optional[QuantScheme] = None
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, qmode: str = "eval"):
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        bias = (self.param("bias", self.bias_init, (self.features,))
                if self.use_bias else None)

        def dense(inp, k):
            y = jnp.dot(inp, k, preferred_element_type=jnp.float32)
            if bias is not None:
                y = y + bias
            return y

        def forward_oi(inp, w_oi):
            return dense(inp, w_oi.T)

        if qmode in ("deploy_prep", "int", "intc"):
            cfg = self._resolve_cfg()
            if cfg is not None and cfg.weight.enable:
                return self._int_dense(x, kernel, bias, cfg, qmode, dense)
            from dlmc_quant_tpu.quant.chain import materialize
            return dense(materialize(x), kernel)

        x_q, w_q = self._quantize(x, kernel, qmode, forward_oi)
        return dense(x_q, w_q)

    def _int_dense(self, x, kernel, bias, cfg, qmode: str, dense):
        from dlmc_quant_tpu.quant import chain as qchain
        from dlmc_quant_tpu.quant import deploy as dp

        if qmode == "deploy_prep":
            plan = self._build_int_plan(
                kernel, bias, cfg, colsum_fn=lambda w: jnp.sum(w, axis=0))
            self._store_plan(plan)
        else:
            plan = self._load_plan()

        w_int = self._plan_weights(plan, kernel.shape)
        if "in_scale" not in plan:
            x = qchain.materialize(x)
            s_b = _wt_bshape(cfg.weight, plan["w_scale"], kernel.ndim)
            w_deq = w_int.astype(jnp.bfloat16) * s_b.astype(jnp.bfloat16)
            return dense(x.astype(jnp.bfloat16), w_deq).astype(jnp.float32)

        aqmin, aqmax = self._act_qrange(cfg)
        shift = dp.act_shift(aqmax)
        in_scale, bias_eff = plan.get("in_scale"), plan.get("bias_eff")
        if isinstance(x, qchain.QuantizedTensor):
            # grid-adapted epilogue for chained codes (see _int_conv)
            x_i8 = x.q
            in_scale = x.scale
            bias_eff = x.bias * plan["w_scale"] * plan["colsum"] \
                + plan["bias0"]
        elif isinstance(x, qchain.DeferredEpilogue):
            x_i8 = qchain.fold_quantize(x, plan["in_inv_scale"],
                                        plan["in_qbias"],
                                        aqmin - shift, aqmax - shift)
        else:
            x_i8, _ = dp.act_to_int8(x, plan["in_scale"],
                                     plan["in_offset"], aqmin, aqmax,
                                     inv_s_x=plan.get("in_inv_scale"),
                                     qbias=plan.get("in_qbias"))
        acc = jnp.dot(x_i8, w_int, preferred_element_type=jnp.int32)
        scale = in_scale * plan["w_scale"]
        if qmode == "intc":
            return qchain.DeferredEpilogue(acc, jnp.reshape(scale, (1, -1)),
                                           bias_eff.reshape(1, -1))
        return acc.astype(jnp.float32) * scale + bias_eff


class QBlockOutput(nn.Module, _QuantOps):
    """Residual-block output quantizer: ``relu(trunk + shortcut)`` → int8.

    The missing link for int8-resident residual nets: in every qmode but
    ``'intc'`` this is exactly ``relu(y + r)`` (so train/eval/PTQ
    numerics are untouched); in ``'intc'`` it folds *trunk epilogue +
    shortcut + ReLU + quantize* into one fused clamp emitting a
    :class:`~dlmc_quant_tpu.quant.chain.QuantizedTensor` on the block's
    own calibrated per-tensor grid.  Downstream, both consumers of the
    block output (next conv1 and next shortcut) read those int8 codes
    straight from HBM — 1 byte/value instead of 4, and no separate
    add/relu/quantize passes.

    Calibration: ``qmode='calibrate'`` observes the f32 block output
    with the scheme's input-observer config and stores scale (param,
    via the ``qcal`` merge) and float offset (``qstate``) — single
    batch, like the reference's lazy first-forward init (ref:
    modules/base.py:82-129).  ``deploy_prep`` then freezes the grid
    into a ``qint`` plan.  The reference has no analogue (its deploy
    path emulates in fp32 end-to-end).

    ``relu=False`` for linear-bottleneck residuals (MobileNetV2: the
    add has no activation) — the fold's lower bound is then the grid
    minimum, not the code of 0.
    """
    scheme: Optional[QuantScheme] = None
    relu: bool = True

    def _sum(self, y, r):
        from dlmc_quant_tpu.quant import chain as qchain
        v = qchain.materialize(y) + qchain.materialize(r)
        return nn.relu(v) if self.relu else v

    @nn.compact
    def __call__(self, y, r, qmode: str = "eval"):
        from dlmc_quant_tpu.quant import chain as qchain
        from dlmc_quant_tpu.quant import deploy as dp

        cfg = self._resolve_cfg()
        enabled = (cfg is not None and cfg.input.enable
                   and not cfg.input.per_channel and not cfg.input.per_pixel)
        if not enabled:
            return self._sum(y, r)

        aq = cfg.input
        qmin, qmax = aq.qrange
        scale = self.param("out_scale", nn.initializers.ones, ())
        offset = self.variable("qstate", "out_offset", lambda: jnp.zeros(()))

        if qmode == "calibrate":
            v = self._sum(y, r)
            s, off = _batch_observe(_sg(v), aq, None)
            self.variable("qcal", "out_scale", lambda: s).value = s
            offset.value = off
            return v

        if qmode == "deploy_prep":
            s_x = jnp.reshape(scale, ())
            o_x = jnp.reshape(offset.value, ())
            shift = dp.act_shift(qmax)
            if self.relu:
                lo = jnp.clip(jnp.round(-o_x / s_x), qmin, qmax) - shift
            else:
                lo = jnp.float32(qmin - shift)
            plan = {
                "bq_inv": (1.0 / s_x).astype(jnp.float32),
                "bq_qbias": (-o_x / s_x - shift).astype(jnp.float32),
                "bq_lo": lo.astype(jnp.float32),
                "bq_scale": s_x.astype(jnp.float32),
                "bq_bias": (shift * s_x + o_x).astype(jnp.float32),
            }
            for name, val in plan.items():
                self.variable("qint", name, lambda v=val: v).value = val
            return self._sum(y, r)

        if qmode == "intc" and self.has_variable("qint", "bq_inv"):
            shift = dp.act_shift(qmax)
            q = qchain.fold_sum_quantize(
                [y, r],
                self.get_variable("qint", "bq_inv"),
                self.get_variable("qint", "bq_qbias"),
                self.get_variable("qint", "bq_lo"),
                qmax - shift)
            return qchain.QuantizedTensor(
                q, self.get_variable("qint", "bq_scale"),
                self.get_variable("qint", "bq_bias"))

        return self._sum(y, r)


# ---------------------------------------------------------------------------
# calibration driver utilities
# ---------------------------------------------------------------------------

def merge_calibration(variables, qcal):
    """Fold the 'qcal' collection produced by a calibrate pass into the
    variable tree: leaves whose (path, name) match a params leaf replace
    it; everything else lands nowhere (offsets/EMA state were already
    written into 'qstate' during the pass).
    """
    import flax

    flat_params = flax.traverse_util.flatten_dict(variables.get("params", {}))
    flat_qcal = flax.traverse_util.flatten_dict(qcal)
    for path, val in flat_qcal.items():
        if path in flat_params:
            flat_params[path] = val
    new = dict(variables)
    new["params"] = flax.traverse_util.unflatten_dict(flat_params)
    return new


_CAL_FN_CACHE: dict = {}


def _calibration_fns(model, apply_kw_items):
    """Jitted observe/calibrate passes, cached per (model, apply_kw).

    ``jax.jit`` caches per *function object*; building a fresh lambda on
    every :func:`calibrate` call (as earlier revisions did) forced a
    retrace per call, which QAT periodic recalibration
    (training/qat.py) pays every ``update_qparams_period`` steps.
    flax Modules are hashable frozen dataclasses, so they key a plain
    dict; jit's own arg-shape cache handles varying batch shapes.  The
    reference gets this for free via persistent module buffers
    (ref: trainer/quantization_aware_training_trainer.py:43-48).
    """
    key = (model, apply_kw_items)
    if key not in _CAL_FN_CACHE:
        apply_kw = dict(apply_kw_items)
        observe_fn = jax.jit(lambda v, b: model.apply(
            v, b, qmode="observe", mutable=["qstate"], **apply_kw)[1])
        cal_fn = jax.jit(lambda v, b: model.apply(
            v, b, qmode="calibrate", mutable=["qcal", "qstate"],
            **apply_kw)[1])
        _CAL_FN_CACHE[key] = (observe_fn, cal_fn)
    return _CAL_FN_CACHE[key]


def calibrate(model, variables, batches, observe_passes: int = 0, **apply_kw):
    """Explicit calibration: optional multi-batch 'observe' sweep, then a
    single 'calibrate' pass on the first batch; returns updated variables.

    ``batches`` is a sequence of model inputs (first positional arg).
    Replaces the reference's implicit first-forward lazy init
    (ref: example/quantization/post_training_quantization.py:68-71).
    """
    batches = list(batches)
    observe_fn, cal_fn = _calibration_fns(
        model, tuple(sorted(apply_kw.items())))
    if observe_passes:
        for b in batches[:observe_passes]:
            upd = observe_fn(variables, b)
            if "qstate" in upd:     # absent when no quantizer keeps state
                variables = {**variables, "qstate": upd["qstate"]}
    upd = cal_fn(variables, batches[0])
    if "qstate" in upd:
        variables = {**variables, "qstate": upd["qstate"]}
    return merge_calibration(variables, upd.get("qcal", {}))
