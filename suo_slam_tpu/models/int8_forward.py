"""int8-RESIDENT inference forward for PkpNet: activations live in HBM as int8.

Why: the bf16 model is HBM-bandwidth bound (~240 MB/crop of activation
traffic). The first int8 path (`models/quant.py`) runs the convs on the MXU
in int8 (+21%) but still ships every inter-layer activation as bf16 — the
quantize step is pure extra traffic. This executor makes int8 the STORAGE
format: every tensor materialized between fusions is int8 with a calibrated
scale (per-tensor at conv inputs — required to factor the scale out of the
convolution — and per-channel on the residual trunk, where consumers are
elementwise/pool/upsample and the finer scale halves quantization noise).

Fusion discipline (verified in the device trace):
- conv + dequant + BN-affine + relu + requantize compile to ONE kOutput
  fusion per conv (`clamp_convert_fusion`): the int32 conv result never hits
  HBM. The affine is pre-folded into the dequant multiplier/bias so the
  per-element epilogue is minimal (mul-add, max, round, clip).
- nearest-upsample + skip-add junctions are written as reshape-broadcast
  adds so XLA fuses them into one s8 -> s8 kernel instead of materializing
  the 4x-upsampled tensor.
- maxpool acts on the int8 tensor directly (monotone; scale positive).

Hand traversal of the flax variables tree (module names are deterministic:
Conv_k / Norm_k / Residual_k / Hourglass_k in creation order, mirroring
`models/hourglass.py` / `models/pkpnet.py`); exactness of the traversal vs
`net.apply` is checked in `tests/test_int8_forward.py` via the
full-precision calib engine. This path supersedes the round-1 pallas
fused-block experiments (removed): those lost end-to-end to plain XLA,
while int8 storage beats it by cutting the bytes themselves.

Calibration: `calibrate(net, variables, batches)` runs the SAME traversal
with a recording engine and returns the per-point absmax tuple; point
identity is the sequential order of materialization, shared by construction
between the calib and int8 engines.

Accuracy-critical pieces staying full precision: the 7x7 stem conv (small
traffic, awkward MXU packing) and the softmax/soft-argmax + validity
readout (f32 internals, `ops/heatmap.py`). The heatmap-logits HEAD conv
does run through the engine — its input is already int8 and the extra
per-channel 8-bit weight noise measured an order below the activation
quantization noise (reference hot loop: `lib/object_slam.py:1077-1167`).

Inference only; norm="batch"; prior_mode "post_stem" or "concat"
(the latter for torch-converted reference checkpoints).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import heatmap as hm
from .pkpnet import PkpNetOutput

BN_EPS = 1e-5


class QT(NamedTuple):
    """int8 tensor + its dequantization scale (x ~= q * s; s is [] or [C])."""

    q: jax.Array
    s: jax.Array


def _bn_affine(p, s):
    a = p["scale"] * jax.lax.rsqrt(s["var"] + BN_EPS)
    return a, p["bias"] - s["mean"] * a


def _norm_params(p, s, name_p, name_s=None):
    name_s = name_s or name_p
    return _bn_affine(p[name_p]["MaskedBatchNorm_0"], s[name_s]["MaskedBatchNorm_0"])


def _upsample2x_q(q):
    """Nearest 2x upsample of the RAW int8 tensor. XLA materializes the
    broadcast operand of the junction add either way (verified in the device
    trace) — broadcasting the s8 codes instead of the dequantized f32 values
    makes that materialization 4x smaller."""
    n, h, w, c = q.shape
    up = jnp.broadcast_to(q[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return up.reshape(n, 2 * h, 2 * w, c)


class _CalAct(NamedTuple):
    """Calibration-engine activation: f32 array + per-channel tag (keeps the
    structural path — and therefore quant-point indices — identical between
    the calib and int8 engines)."""

    x: jax.Array
    pc: bool


class _CalibEngine:
    """Records per-point absmax; all math in f32 (exact reference for int8)."""

    int8 = False

    def __init__(self):
        self.absmax = []

    def _record(self, xf, pc):
        if pc:
            self.absmax.append(
                jnp.max(jnp.abs(xf), axis=tuple(range(xf.ndim - 1))).astype(jnp.float32)
            )
        else:
            self.absmax.append(jnp.max(jnp.abs(xf)).astype(jnp.float32))

    def quant(self, xf, pc=False):
        self._record(xf, pc)
        return _CalAct(xf, pc)

    def skip_scale(self):
        # placeholder absmax so a (hypothetical) no-prior calibration still
        # yields a tuple the with-prior executor can index; real runs always
        # calibrate WITH a prior (worst-case all-ones, see `calibrate`)
        self.absmax.append(jnp.ones((), jnp.float32))

    def quant_pair(self, xf, aff_a, aff_b, pc=True):
        """Dual-output quantization point: the raw trunk tensor AND the next
        block's pre-normed conv input, from the same virtual f32 value (two
        calibration points, same order as the quant+nrq it replaces)."""
        raw = self.quant(xf, pc)
        normed = self.quant(jnp.maximum(xf * aff_a + aff_b, 0.0))
        return raw, normed

    def dequant(self, a):
        return a.x

    def is_per_channel(self, a):
        return a.pc

    def channels(self, a):
        return a.x.shape[-1]

    def nrq(self, a, aff_a, aff_b):
        """norm-affine + relu + (re)quantize: s8 -> s8 elementwise fusion."""
        y = jnp.maximum(a.x * aff_a + aff_b, 0.0)
        self._record(y, False)
        return _CalAct(y, False)

    def conv_raw(self, a, p, strides=(1, 1), padding="SAME"):
        """conv + bias as virtual f32 (consumed by an add junction)."""
        assert not a.pc, "conv inputs must be per-tensor quantized"
        # input-contract check: must survive `python -O` (a stripped assert
        # would turn this into silent mis-scaling), so raise explicitly
        if p["kernel"].dtype == jnp.int8:
            raise ValueError(
                "calibration/f32 reference needs the ORIGINAL f32 weights — "
                "this tree came from quantize_weights (s8 codes would be used "
                "as weights, silently mis-scaling everything downstream)"
            )
        y = jax.lax.conv_general_dilated(
            a.x.astype(jnp.float32), p["kernel"].astype(jnp.float32),
            strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return y + p["bias"]

    def conv_nrq(self, a, p, aff_a, aff_b, strides=(1, 1), padding="SAME"):
        """conv + affine + relu + quantize: one kOutput fusion in int8."""
        y = self.conv_raw(a, p, strides, padding)
        y = jnp.maximum(y * aff_a + aff_b, 0.0)
        self._record(y, False)
        return _CalAct(y, False)

    def maxpool(self, a):
        y = jax.lax.reduce_window(
            a.x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
        return _CalAct(y, a.pc)

    def upsample_add(self, up1, low):
        return up1.x + _upsample2x_q(low.x)


def _quantize_kernel(kernel):
    """Per-out-channel s8 weight quantization — the ONE definition shared by
    on-the-fly `_conv_i8` and `quantize_weights` (bit-identical contract)."""
    s_w = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)
    return wq, s_w


class _Int8Engine:
    """Executes with int8-resident activations using calibrated scales."""

    int8 = True

    def __init__(self, scales):
        self.scales = scales  # tuple of f32 absmax per quant point ([] or [C])
        self.i = 0

    def _next_scale(self):
        if self.i >= len(self.scales):
            raise ValueError(
                f"int8 scale-sequence drift: traversal needs more than the "
                f"{len(self.scales)} calibration points in `scales` — the "
                "scales tuple does not match this network architecture"
            )
        s = jnp.maximum(self.scales[self.i], 1e-6) / 127.0
        self.i += 1
        return s

    def skip_scale(self):
        """Consume a calibration point whose math is statically absent (the
        prior quant in a no-prior program) — keeps the point sequence
        aligned with the with-prior calibration."""
        self.i += 1

    @staticmethod
    def _q(xf, s):
        return jnp.clip(jnp.round(xf), -127, 127).astype(jnp.int8), s

    def quant(self, xf, pc=False):
        s = self._next_scale()
        q, s = self._q(xf / s.astype(xf.dtype), s)
        return QT(q, s)

    def quant_pair(self, xf, aff_a, aff_b, pc=True):
        """Emit the raw trunk tensor AND the next block's normed conv input
        from ONE virtual value: XLA forms a multi-output fusion, so the
        trunk tensor is not re-read by a separate nrq kernel at every
        chained block boundary (s8 re-reads dominated the 64x64 level).
        Numerically this skips the nrq's double quantization (the norm here
        applies to the pre-quantization value) — strictly less noise."""
        raw = self.quant(xf, pc)
        s_n = self._next_scale()
        m = (aff_a / s_n).astype(xf.dtype)
        c = (aff_b / s_n).astype(xf.dtype)
        q, s = self._q(jnp.maximum(xf * m + c, 0.0), s_n)
        return raw, QT(q, s)

    def dequant(self, a: QT):
        return a.q.astype(jnp.bfloat16) * a.s.astype(jnp.bfloat16)

    def is_per_channel(self, a):
        return a.s.ndim > 0

    def channels(self, a):
        return a.q.shape[-1]

    def nrq(self, a: QT, aff_a, aff_b):
        s_out = self._next_scale()
        # folded: relu(deq(q)*a + b)/s_out  ->  max(q*m + c, 0); bf16 epilogue
        m = ((a.s * aff_a) / s_out).astype(jnp.bfloat16)
        c = (aff_b / s_out).astype(jnp.bfloat16)
        q, s = self._q(jnp.maximum(a.q.astype(jnp.bfloat16) * m + c, 0.0), s_out)
        return QT(q, s)

    def _conv_i8(self, a: QT, p, strides, padding):
        assert a.s.ndim == 0, "conv inputs must be per-tensor quantized"
        kernel = p["kernel"]
        if kernel.dtype == jnp.int8:
            # pre-quantized tree from `quantize_weights` — skips the per-call
            # absmax/round/clip over every kernel (bit-identical results)
            wq, s_w = kernel, p["kernel_scale"]
        else:
            wq, s_w = _quantize_kernel(kernel)
        # bf16 accumulation: rel RMS vs exact int32 accum measured 1.7e-3 —
        # an order below the int8 quantization noise itself — and it halves
        # the epilogue's element width.
        y = jax.lax.conv_general_dilated(
            a.q, wq, strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )
        return y, a.s * s_w  # bf16 accum, per-out-channel dequant scale [C]

    def conv_raw(self, a: QT, p, strides=(1, 1), padding="SAME"):
        y, s_acc = self._conv_i8(a, p, strides, padding)
        return y * s_acc.astype(jnp.bfloat16) + p["bias"].astype(jnp.bfloat16)

    def conv_nrq(self, a: QT, p, aff_a, aff_b, strides=(1, 1), padding="SAME"):
        y, s_acc = self._conv_i8(a, p, strides, padding)
        s_out = self._next_scale()
        # folded epilogue: relu((y*s_acc + bias)*a + b)/s_out = max(y*m + c, 0)
        m = ((s_acc * aff_a) / s_out).astype(jnp.bfloat16)
        c = ((p["bias"] * aff_a + aff_b) / s_out).astype(jnp.bfloat16)
        q, s = self._q(jnp.maximum(y * m + c, 0.0), s_out)
        return QT(q, s)

    def maxpool(self, a: QT):
        q = jax.lax.reduce_window(
            a.q, jnp.int8(-128), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
        return QT(q, a.s)

    def upsample_add(self, up1: QT, low: QT):
        # XLA materializes the upsampled operand either way (sublane-
        # replicating broadcasts don't fuse into consumers); the barrier
        # stops it from hoisting the dequant convert before the broadcast,
        # which would materialize the 4x tensor in bf16 instead of s8
        # (device trace: 671 MB broadcast + 536 MB consumer re-read per
        # junction at batch 256, ~0.4 ms/junction extra).
        up = jax.lax.optimization_barrier(_upsample2x_q(low.q))
        return self.dequant(up1) + up.astype(jnp.bfloat16) * low.s.astype(jnp.bfloat16)


def _residual(eng, p, s, act_x, features, out_pc=True, pre_norm=None,
              pair_aff=None):
    """hourglass.Residual with int8-resident staging.

    out_pc=False when the block output feeds a convolution directly (per-
    tensor scale required there); trunk outputs default to per-channel.
    pre_norm: the block's normed+relu'd conv input already emitted by the
    producer's dual-output fusion (skips this block's own nrq pass).
    pair_aff: (a, b) Norm_0 affine of the NEXT chained block — when given,
    returns (raw_out, normed_out) from one quant_pair fusion."""
    cin = eng.channels(act_x)
    a1, b1 = _norm_params(p, s, "Norm_1")
    a2, b2 = _norm_params(p, s, "Norm_2")
    if pre_norm is None:
        a0, b0 = _norm_params(p, s, "Norm_0")
        act1 = eng.nrq(act_x, a0, b0)
    else:
        act1 = pre_norm
    act2 = eng.conv_nrq(act1, p["Conv_0"], a1, b1)
    act3 = eng.conv_nrq(act2, p["Conv_1"], a2, b2, padding=[(1, 1), (1, 1)])
    if cin != features:
        # Projection skip consumes the RAW block input (`hourglass.py:141-142`).
        # Two convolutions feed the output add, but XLA can output-fuse only
        # ONE conv per fusion — the other would materialize its s32 result
        # (4 B/elt, verified in the device trace). So conv_2 requantizes in
        # its own kOutput fusion and conv_3 fuses into the add.
        y = eng.dequant(eng.quant(eng.conv_raw(act3, p["Conv_2"])))
        skip = eng.conv_raw(_per_tensor(eng, act_x), p["Conv_3"])
    else:
        y = eng.conv_raw(act3, p["Conv_2"])
        skip = eng.dequant(act_x)
    if pair_aff is None:
        return eng.quant(skip + y, pc=out_pc)
    return eng.quant_pair(skip + y, pair_aff[0], pair_aff[1], pc=out_pc)


def _norm0_aff(p, s, name):
    return _norm_params(p[name], s[name], "Norm_0")


def _res_chain(eng, p, s, act, features, idxs, pre_norm=None,
               last_out_pc=True, tail_aff=None):
    """Consecutive Residual blocks with every boundary's Norm_0 fused into
    the producer's dual-output quantization (no standalone nrq re-read of
    the trunk tensor between chained blocks).

    tail_aff: pair the LAST block's output with a downstream consumer's
    Norm_0 too (e.g. across a junction). Returns (act, pre_norm_or_None)."""
    for j, i in enumerate(idxs):
        last = j == len(idxs) - 1
        aff = tail_aff if last else _norm0_aff(p, s, f"Residual_{idxs[j + 1]}")
        res = _residual(eng, p[f"Residual_{i}"], s[f"Residual_{i}"], act,
                        features, out_pc=(last_out_pc if last else True),
                        pre_norm=pre_norm, pair_aff=aff)
        if aff is None:
            act, pre_norm = res, None
        else:
            act, pre_norm = res
    return act, pre_norm


def _per_tensor(eng, act):
    """Requantize a per-channel trunk tensor for direct conv consumption."""
    if eng.is_per_channel(act):
        return eng.quant(eng.dequant(act))
    return act


def _hourglass(eng, p, s, act_x, depth, n_modules, features, pre_norm=None,
               ret_aff=None):
    """pre_norm: act_x's normed form already emitted by the producer (used
    by the up1 chain's first block; the maxpool branch still consumes the
    raw tensor). ret_aff: when given, the return junction dual-emits the
    caller's next Norm_0 input too (returns a (raw, normed) pair)."""
    nm = n_modules
    up1, _ = _res_chain(eng, p, s, act_x, features, list(range(nm)),
                        pre_norm=pre_norm)
    low = eng.maxpool(act_x)
    if depth > 1:
        # chain the pooled blocks straight into the inner hourglass's first
        # up1 block (the inner maxpool branch reads the raw tensor)
        inner_aff = _norm0_aff(p["Hourglass_0"], s["Hourglass_0"], "Residual_0")
        low, pn = _res_chain(eng, p, s, low, features,
                             list(range(nm, 2 * nm)), tail_aff=inner_aff)
        # the inner return junction dual-emits our after-chain's first norm
        after0 = _norm0_aff(p, s, f"Residual_{2 * nm}")
        low, pn = _hourglass(eng, p["Hourglass_0"], s["Hourglass_0"], low,
                             depth - 1, nm, features, pre_norm=pn,
                             ret_aff=after0)
        low, _ = _res_chain(eng, p, s, low, features,
                            list(range(2 * nm, 3 * nm)), pre_norm=pn)
    else:
        # innermost: pooled chain -> bottom chain -> after chain, one run
        low, _ = _res_chain(eng, p, s, low, features,
                            list(range(nm, 4 * nm)))
    out = eng.upsample_add(up1, low)
    if ret_aff is None:
        return eng.quant(out, pc=True)
    return eng.quant_pair(out, ret_aff[0], ret_aff[1], pc=True)


def _traverse(eng, variables, images_roi, prior_kp, net, no_prior=False):
    """Shared calib/int8 traversal; mirrors PkpNet.__call__ module order.

    no_prior=True compiles a program with the prior path STATICALLY absent
    (render, quantization, and injection conv all gone) while still
    consuming the prior's calibration point, so the same scales tuple
    serves both programs. Bit-identical to running the with-prior program
    on an all-zero prior (zero codes contribute exactly zero through the
    conv and add)."""
    p = variables["params"]["HourglassNet_0"]
    s = variables["batch_stats"]["HourglassNet_0"]
    n, h, w, _ = images_roi.shape
    num_kp, features, n_modules = net.num_kp, net.features, net.n_modules
    concat = net.prior_mode == "concat"
    phw = (h, w) if concat else (h // 4, w // 4)
    if prior_kp is None and not no_prior:
        prior_kp = jnp.zeros((n,) + phw + (num_kp,), jnp.float32)

    # stem conv stays full precision for the IMAGE channels (small traffic,
    # awkward MXU packing). Measured: computing it in bf16 instead changes
    # nothing (5037 vs 5035 crops/s) — the stem bucket is HBM/fusion-bound,
    # not MXU-bound.
    k0 = p["Conv_0"]["kernel"]
    x = jax.lax.conv_general_dilated(
        images_roi.astype(jnp.float32),
        (k0[:, :, :3, :] if concat else k0).astype(jnp.float32),
        (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + p["Conv_0"]["bias"]
    if concat:
        # reference wiring: prior channels concat at FULL resolution before
        # the stem (`lib/models/pkpnet.py:95-101`; torch-converted
        # checkpoints). Computed DECOMPOSED — conv(cat(img, prior), W) ==
        # conv(img, W[:,:,:3]) + conv(prior, W[:,:,3:]) — with the
        # 41-channel prior half on the int8 MXU path: the fused 44-channel
        # f32 stem conv was ~15x the image-stem FLOPs plus a 4 B/elt
        # full-res prior read; int8 cuts both. Same quantization pattern as
        # post_stem's Conv_1 prior injection (accuracy bounded by the same
        # tests/int8_accuracy protocol).
        if no_prior:
            eng.skip_scale()
        else:
            prior_act = eng.quant(prior_kp.astype(jnp.float32))
            x = x + eng.conv_raw(
                prior_act,
                {"kernel": k0[:, :, 3:, :], "bias": jnp.zeros((), jnp.float32)},
                strides=(2, 2), padding=[(3, 3), (3, 3)],
            ).astype(jnp.float32)
    a0, b0 = _norm_params(p, s, "Norm_0")
    x = jnp.maximum(x * a0 + b0, 0.0)
    # stem output dual-emits Residual_0's normed input (chained boundary);
    # every block->block boundary below does the same — the standalone nrq
    # re-read of the trunk tensor only remains after maxpools, where the
    # norm affine (possibly negative scale) does not commute with the pool.
    act, pn = eng.quant_pair(x, *_norm0_aff(p, s, "Residual_0"), pc=False)
    act = _residual(eng, p["Residual_0"], s["Residual_0"], act, 128,
                    pre_norm=pn)
    act = eng.maxpool(act)
    act, pn = _residual(eng, p["Residual_1"], s["Residual_1"], act, 128,
                        pair_aff=_norm0_aff(p, s, "Residual_2"))
    hg0_aff = _norm0_aff(p["Hourglass_0"], s["Hourglass_0"], "Residual_0")
    if concat:
        act, pn = _residual(eng, p["Residual_2"], s["Residual_2"], act,
                            features, pre_norm=pn, pair_aff=hg0_aff)
        conv_i = 1
    else:
        act = _residual(eng, p["Residual_2"], s["Residual_2"], act, features,
                        pre_norm=pn)
        if no_prior:
            eng.skip_scale()
            inj = eng.dequant(act)
        else:
            prior_act = eng.quant(prior_kp.astype(jnp.float32))
            inj = eng.dequant(act) + eng.conv_raw(prior_act, p["Conv_1"])
        act, pn = eng.quant_pair(inj, *hg0_aff, pc=True)
        conv_i = 2

    norm_i, res_i = 1, 3
    outs = []
    for i in range(net.n_stack):
        # the hourglass return junction dual-emits the ll chain's first norm
        hg, pn = _hourglass(eng, p[f"Hourglass_{i}"], s[f"Hourglass_{i}"],
                            act, 4, n_modules, features, pre_norm=pn,
                            ret_aff=_norm0_aff(p, s, f"Residual_{res_i}"))
        # the last block's output feeds a conv directly -> per-tensor
        ll, _ = _res_chain(eng, p, s, hg, features,
                           list(range(res_i, res_i + n_modules)),
                           pre_norm=pn, last_out_pc=False)
        res_i += n_modules
        a_l, b_l = _norm_params(p, s, f"Norm_{norm_i}")
        norm_i += 1
        ll_act = eng.conv_nrq(ll, p[f"Conv_{conv_i}"], a_l, b_l)
        conv_i += 1
        # Heatmap-logits head: its input is already int8-quantized (ll_act
        # also feeds the inter-stack convs), so running the head conv in the
        # engine only adds per-channel 8-bit WEIGHT noise while avoiding a
        # 2-byte dequant materialization of the full feature map. Logits
        # stay in the engine dtype (bf16 for the int8 engine — their values
        # already carry int8-activation noise an order above bf16 rounding);
        # the readout's moment contraction runs f32-HIGHEST regardless
        # (`ops/heatmap.py soft_argmax_from_logits`).
        raw = eng.conv_raw(ll_act, p[f"Conv_{conv_i}"])
        conv_i += 1
        outs.append(raw)
        if i < net.n_stack - 1:
            # 3-way junction with two convs: requantize one conv in its own
            # kOutput fusion so neither materializes s32 (see _residual note)
            ll_q = eng.quant(eng.conv_raw(ll_act, p[f"Conv_{conv_i}"]))
            conv_i += 1
            raw_act = eng.quant(raw)
            tmp_ = eng.conv_raw(raw_act, p[f"Conv_{conv_i}"])
            conv_i += 1
            act, pn = eng.quant_pair(
                eng.dequant(act) + eng.dequant(ll_q) + tmp_,
                *_norm0_aff(p[f"Hourglass_{i + 1}"], s[f"Hourglass_{i + 1}"],
                            "Residual_0"),
                pc=True,
            )
    return outs


def _readout(variables, outs, net):
    raw = outs[-1]
    if net.transpose_heatmaps:
        raw = jnp.swapaxes(raw, 1, 2)
    uv, cov, prob = hm.soft_argmax_from_logits(raw, calc_cov=net.calc_cov)
    # validity head stays full precision: accumulate the spatial mean in f32
    # even when the logits are stored bf16 (a bf16 reduction over 4096
    # elements carries ~1e-2 error — enough to flip kp_mask near the 0.3
    # threshold)
    pooled = jnp.mean(raw.astype(jnp.float32), axis=(1, 2))
    y = jnp.maximum(pooled, 0.0)
    dp = variables["params"]["Dense_0"]
    logits = y @ dp["kernel"] + dp["bias"]
    return PkpNetOutput(
        uv=uv, cov=cov, prob=prob, prob_logits=raw,
        kp_mask_logits=logits, kp_mask=jax.nn.sigmoid(logits),
        aux_logits=tuple(outs[:-1]),
    )


def calibrate(net, variables, batches, prior_batches=None):
    """Run calibration batches; returns the per-point absmax tuple.

    prior_batches=None calibrates with a WORST-CASE all-ones prior (the
    prior's value range is [0, 1] by construction — peak-1 Gaussians,
    `ops/heatmap.py`). Calibrating on a zero prior would record absmax 0
    for the prior quant point and collapse its scale to ~1e-8, silently
    clipping every real prior to noise at inference. Pass real prior
    batches for tighter (per-channel-representative) scales.
    """
    assert net.norm == "batch" and net.prior_mode in ("post_stem", "concat")

    @jax.jit
    def one(x, prior):
        eng = _CalibEngine()
        _traverse(eng, variables, x, prior, net)
        return tuple(eng.absmax)  # mixed [] (conv inputs) and [C] (trunk)

    scales = None
    for i, x in enumerate(batches):
        if prior_batches is None:
            ph, pw = net.prior_hw(x.shape[1:3])
            prior = jnp.ones((x.shape[0], ph, pw, net.num_kp), jnp.float32)
        else:
            prior = prior_batches[i]
        s = one(x, prior)
        scales = s if scales is None else jax.tree.map(jnp.maximum, scales, s)
    return scales


def save_scales(path, scales):
    """Persist a calibration-scale tuple (`calibrate` output) as an .npz
    checkpoint sidecar. Order is the contract — the int8 traversal consumes
    scales positionally — so entries are stored under zero-padded indices."""
    import numpy as np

    arrays = {f"s{i:04d}": np.asarray(s, np.float32) for i, s in enumerate(scales)}
    arrays["n"] = np.asarray(len(scales), np.int64)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_scales(path):
    """Load a `save_scales` sidecar back into the tuple `make_int8_apply`
    consumes. Architecture mismatch (wrong count) is caught by the executor's
    scale-sequence drift check at trace time."""
    import numpy as np

    with np.load(path) as z:
        n = int(z["n"])
        return tuple(jnp.asarray(z[f"s{i:04d}"]) for i in range(n))


def quantize_weights(net, variables):
    """Pre-quantize every engine-consumed conv kernel to (s8 codes,
    per-out-channel scale) — bit-identical outputs to on-the-fly
    quantization (`_conv_i8` detects the s8 dtype), but the per-call
    absmax/round/clip over ~13M weights disappears from the traced forward
    (it cannot constant-fold: `variables` is a traced jit argument).

    Returns a NEW variables dict for `make_int8_apply` ONLY — the stem conv
    (full-precision by design) and non-conv params are untouched, but
    `net.apply` / `calibrate` need the original f32 weights.
    """
    assert net.norm == "batch"
    # tree.map rebuilds every dict container, so mutating the copy's nodes
    # cannot touch the caller's tree; leaves are shared (no device copies)
    variables = jax.tree.map(lambda x: x, variables)

    def walk(node, path):
        if not isinstance(node, dict):
            return
        k = node.get("kernel")
        if k is not None and getattr(k, "ndim", 0) == 4 and k.dtype != jnp.int8:
            if path[-2:] == ("HourglassNet_0", "Conv_0"):
                return  # the full-precision stem
            node["kernel"], node["kernel_scale"] = _quantize_kernel(jnp.asarray(k))
            return
        for name, child in node.items():
            walk(child, path + (name,))

    walk(variables["params"], ())
    return variables


def make_int8_apply(net, no_prior=False):
    """Returns apply(variables, scales, images_roi, prior) -> PkpNetOutput.

    `scales` is the absmax tuple from `calibrate`. The returned callable is
    jit-compatible; activations are int8-resident end to end in the backbone.

    no_prior=True builds the statically-prior-free program (prior render /
    quant / injection conv all absent; bit-identical outputs to the default
    program on an all-zero prior) — the SLAM engine uses it for
    non-symmetric batches and single-view evaluation, which never carry
    priors. Consumes the SAME scales tuple.

    (The Pallas per-block/whole-level kernel variants of this executor were
    removed after losing end to end to this XLA path — see BENCHMARKS.md
    "Pallas int8 kernel post-mortem" and git history for the code.)
    """
    assert net.norm == "batch" and net.prior_mode in ("post_stem", "concat")

    def apply(variables, scales, images_roi, prior_kp=None):
        eng = _Int8Engine(scales)
        outs = _traverse(eng, variables, images_roi, prior_kp, net,
                         no_prior=no_prior)
        # every calibration point must be consumed exactly once and in
        # order — catches any scale-sequence drift at trace time rather
        # than as silent mis-scaling (ValueError so `python -O` can't
        # strip the input-contract check)
        if eng.i != len(scales):
            raise ValueError(
                f"int8 scale-sequence drift: traversal consumed {eng.i} "
                f"calibration points but `scales` has {len(scales)} — the "
                "scales tuple does not match this network architecture"
            )
        return _readout(variables, outs, net)

    return apply


def make_f32_reference_apply(net):
    """The calib-engine traversal as a plain forward (test oracle: identical
    graph shape to the int8 path, full precision)."""

    def apply(variables, images_roi, prior_kp=None):
        eng = _CalibEngine()
        outs = _traverse(eng, variables, images_roi, prior_kp, net)
        return _readout(variables, outs, net)

    return apply
