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

Accuracy-critical pieces stay full precision: the 7x7 stem conv input (RGB,
3 channels — negligible traffic, awkward MXU packing), the heatmap-logits
head, soft-argmax readout and the validity classifier
(reference hot loop: `lib/object_slam.py:1077-1167`).

Inference only; norm="batch", prior_mode="post_stem".
"""

from __future__ import annotations

import os
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


class _Int8Engine:
    """Executes with int8-resident activations using calibrated scales.

    fused=True routes eligible residual blocks through the Pallas megakernel
    (`ops/int8_residual.py`): whole block in VMEM, one HBM read + write.
    interpret runs that kernel in the Pallas interpreter (CPU test tier)."""

    int8 = True

    def __init__(self, scales, fused=False, interpret=False):
        self.scales = scales  # tuple of f32 absmax per quant point ([] or [C])
        self.i = 0
        self.fused = fused
        self.interpret = interpret

    def _next_scale(self):
        s = jnp.maximum(self.scales[self.i], 1e-6) / 127.0
        self.i += 1
        return s

    @staticmethod
    def _q(xf, s):
        return jnp.clip(jnp.round(xf), -127, 127).astype(jnp.int8), s

    def quant(self, xf, pc=False):
        s = self._next_scale()
        q, s = self._q(xf / s.astype(xf.dtype), s)
        return QT(q, s)

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
        s_w = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12) / 127.0
        wq = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)
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


def _residual(eng, p, s, act_x, features, out_pc=True):
    """hourglass.Residual with int8-resident staging.

    out_pc=False when the block output feeds a convolution directly (per-
    tensor scale required there); trunk outputs default to per-channel."""
    cin = eng.channels(act_x)
    if getattr(eng, "fused", False) and cin == features:
        n, h, w, _ = act_x.q.shape
        # kernel constraints: C and M=C/2 multiples of 128, W a multiple of
        # 32 (int8 sublane tile), and enough rows for the fusion to pay
        if features % 256 == 0 and h * w >= 1024 and w % 32 == 0:
            return _residual_fused(eng, p, s, act_x, features)
    a0, b0 = _norm_params(p, s, "Norm_0")
    a1, b1 = _norm_params(p, s, "Norm_1")
    a2, b2 = _norm_params(p, s, "Norm_2")
    act1 = eng.nrq(act_x, a0, b0)
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
    return eng.quant(skip + y, pc=out_pc)


def _vec(v, n):
    """To a broadcastable [1, n] f32 epilogue vector (scalars broadcast)."""
    v = jnp.asarray(v, jnp.float32)
    v = v.reshape(1, -1) if v.ndim else v.reshape(1, 1)
    return jnp.broadcast_to(v, (1, n))


def _wq(kernel):
    """Per-out-channel int8 weight quantization (same as `_conv_i8`)."""
    sw = jnp.maximum(
        jnp.max(jnp.abs(kernel), axis=tuple(range(kernel.ndim - 1))),
        1e-12,
    ) / 127.0
    return jnp.clip(jnp.round(kernel / sw), -127, 127).astype(jnp.int8), sw


def _fold_residual(eng: "_Int8Engine", p, s, s_in, features: int):
    """Fold one non-projection residual block's scales/affines into the 12
    kernel epilogue vectors (`int8_residual.residual_rows` order).

    Consumes the SAME four calibration points, in the same order, as the
    unfused path (nrq, conv_nrq x2, output quant) — calibration always runs
    the unfused `_CalibEngine` traversal, so point identity is shared by
    construction. Returns (vecs, s_out)."""
    a0, b0 = _norm_params(p, s, "Norm_0")
    a1, b1 = _norm_params(p, s, "Norm_1")
    a2, b2 = _norm_params(p, s, "Norm_2")
    s1 = eng._next_scale()
    s2 = eng._next_scale()
    s3 = eng._next_scale()
    so = eng._next_scale()
    k1, sw1 = _wq(p["Conv_0"]["kernel"][0, 0])   # [C, M]
    k2, sw2 = _wq(p["Conv_1"]["kernel"])         # [3, 3, M, M]
    k3, sw3 = _wq(p["Conv_2"]["kernel"][0, 0])   # [M, C]
    c, mid = features, features // 2
    vecs = (
        _vec(s_in * a0 / s1, c), _vec(b0 / s1, c),
        k1,
        _vec(s1 * sw1 * a1 / s2, mid),
        _vec((p["Conv_0"]["bias"] * a1 + b1) / s2, mid),
        k2,
        _vec(s2 * sw2 * a2 / s3, mid),
        _vec((p["Conv_1"]["bias"] * a2 + b2) / s3, mid),
        k3,
        _vec(s_in / so, c), _vec(s3 * sw3 / so, c),
        _vec(p["Conv_2"]["bias"] / so, c),
    )
    return vecs, so


def _fold_chain(eng, p, s, s_in, features, res_ids):
    blocks = []
    s_cur = s_in
    for rid in res_ids:
        vecs, s_cur = _fold_residual(eng, p[rid], s[rid], s_cur, features)
        blocks.append(vecs)
    return tuple(blocks), s_cur


def _fold_junction(eng, s_up, s_low, features):
    """upsample-add junction quant: codes = q8(up*g_up + upsample(low)*g_low).
    Consumes the junction's single calibration point."""
    s_j = eng._next_scale()
    return (_vec(s_up / s_j, features), _vec(s_low / s_j, features), s_j)


def _residual_fused(eng: "_Int8Engine", p, s, act_x: QT, features: int) -> QT:
    """Non-projection residual via the per-block Pallas kernel.

    Numerics vs unfused: f32 epilogues and exact s32 conv accumulation
    (unfused uses bf16 for both) — strictly tighter; cross-path code
    agreement is pinned by `tests/test_int8_residual.py`."""
    from ..ops.int8_residual import fused_residual_int8

    vecs, so = _fold_residual(eng, p, s, act_x.s, features)
    w2cat = jnp.concatenate([vecs[5][:, j] for j in range(3)], axis=1)
    args = vecs[:5] + (w2cat,) + vecs[6:]
    q_out = fused_residual_int8(act_x.q, *args, interpret=eng.interpret)
    return QT(q_out, so)


def _kernel_level_ok(h, w, features):
    return features % 256 == 0 and h * w >= 1024 and w % 32 == 0


def _chain_or_xla(eng, p, s, act, res_ids, features):
    """A residual chain: whole-chain kernel at kernelable levels, otherwise
    the existing per-block path (which itself falls back to plain XLA)."""
    from ..ops.int8_hourglass import chain_int8

    n, h, w, _ = act.q.shape
    if _kernel_level_ok(h, w, features):
        blocks, s_out = _fold_chain(eng, p, s, act.s, features, res_ids)
        return QT(chain_int8(act.q, blocks, interpret=eng.interpret), s_out)
    for rid in res_ids:
        act = _residual(eng, p[rid], s[rid], act, features)
    return act


def _hourglass_fused(eng, p, s, act, depth, n_modules, features):
    """Fused hourglass level: returns the UNJUNCTIONED pair
    (up1 at this level, post-chain output at half resolution); the caller
    fuses the return junction into its own post chain (`jchain_int8`) or
    the stack tail (`tail_int8`). Mirrors `_hourglass`'s module order and
    calibration-point sequence exactly."""
    from ..ops.int8_hourglass import chain_int8, jchain_int8

    m = n_modules
    up_ids = [f"Residual_{i}" for i in range(m)]
    pre_ids = [f"Residual_{i}" for i in range(m, 2 * m)]
    post_start = 2 * m if depth > 1 else 3 * m
    post_ids = [f"Residual_{i}" for i in range(post_start, post_start + m)]

    n, h, w, _ = act.q.shape
    blocks_up, s_up = _fold_chain(eng, p, s, act.s, features, up_ids)
    up_q, pool_q = chain_int8(act.q, blocks_up, pool=True,
                              interpret=eng.interpret)
    up1 = QT(up_q, s_up)
    low = QT(pool_q, act.s)

    low = _chain_or_xla(eng, p, s, low, pre_ids, features)

    if depth > 1:
        # recurse fused only while the child can kernel its own level
        if _kernel_level_ok(h // 2, w // 2, features) and depth - 1 > 1:
            cu, cl = _hourglass_fused(eng, p["Hourglass_0"], s["Hourglass_0"],
                                      low, depth - 1, m, features)
            g_up, g_low, s_j = _fold_junction(eng, cu.s, cl.s, features)
            blocks, s_out = _fold_chain(eng, p, s, s_j, features, post_ids)
            low = QT(jchain_int8(cu.q, cl.q, g_up, g_low, blocks,
                                 interpret=eng.interpret), s_out)
        else:
            j = _hourglass(eng, p["Hourglass_0"], s["Hourglass_0"], low,
                           depth - 1, m, features)
            low = _chain_or_xla(eng, p, s, j, post_ids, features)
    else:
        inner_ids = [f"Residual_{i}" for i in range(2 * m, 3 * m)]
        low = _chain_or_xla(eng, p, s, low, inner_ids, features)
        low = _chain_or_xla(eng, p, s, low, post_ids, features)
    return up1, low


def _stack_tail(eng, p, s, up1: QT, low: QT, act: QT, net, conv_i, norm_i,
                res_i, last: bool):
    """Top junction + ll chain + lin/head convs (+ inter-stack) in one
    kernel. Returns (raw f32, next act QT or None). Consumes calibration
    points in the unfused traversal's exact order: junction, ll blocks,
    lin conv, [ll_q, raw_act, act'] (`_traverse`)."""
    from ..ops.int8_hourglass import tail_int8

    feats, kp = net.features, net.num_kp
    g_up, g_low, s_j = _fold_junction(eng, up1.s, low.s, feats)
    ll_ids = [f"Residual_{res_i + i}" for i in range(net.n_modules)]
    blocks, s_ll = _fold_chain(eng, p, s, s_j, feats, ll_ids)

    a_l, b_l = _norm_params(p, s, f"Norm_{norm_i}")
    w_lin, sw_lin = _wq(p[f"Conv_{conv_i}"]["kernel"][0, 0])
    s_llact = eng._next_scale()
    lin = (w_lin,
           _vec(s_ll * sw_lin * a_l / s_llact, feats),
           _vec((p[f"Conv_{conv_i}"]["bias"] * a_l + b_l) / s_llact, feats))

    kh = p[f"Conv_{conv_i + 1}"]["kernel"][0, 0]          # [C, kp]
    bh = p[f"Conv_{conv_i + 1}"]["bias"]                  # [kp]
    kh_p = jnp.zeros((feats, 128), kh.dtype).at[:, :kp].set(kh)
    w_head, sw_head = _wq(kh_p)
    head = (w_head,
            _vec(s_llact * sw_head, 128),
            _vec(jnp.zeros((128,), jnp.float32).at[:kp].set(bh), 128))

    inter = None
    if not last:
        w_i1, sw_i1 = _wq(p[f"Conv_{conv_i + 2}"]["kernel"][0, 0])
        s_llq = eng._next_scale()
        s_rawact = eng._next_scale()
        ki2 = p[f"Conv_{conv_i + 3}"]["kernel"][0, 0]     # [kp, C]
        bi2 = p[f"Conv_{conv_i + 3}"]["bias"]
        ki2_p = jnp.zeros((128, feats), ki2.dtype).at[:kp, :].set(ki2)
        w_i2, sw_i2 = _wq(ki2_p)
        s_next = eng._next_scale()
        inter = (w_i1,
                 _vec(s_llact * sw_i1 / s_llq, feats),
                 _vec(p[f"Conv_{conv_i + 2}"]["bias"] / s_llq, feats),
                 _vec(1.0 / s_rawact, 128),
                 w_i2,
                 _vec(act.s / s_next, feats),
                 _vec(s_llq / s_next, feats),
                 _vec(s_rawact * sw_i2 / s_next, feats),
                 _vec(bi2 / s_next, feats))

    raw, act_q = tail_int8(up1.q, low.q, act.q, g_up, g_low, blocks, lin,
                           head, inter, kp, interpret=eng.interpret)
    act_next = None if last else QT(act_q, s_next)
    return raw.astype(jnp.float32), act_next


def _per_tensor(eng, act):
    """Requantize a per-channel trunk tensor for direct conv consumption."""
    if eng.is_per_channel(act):
        return eng.quant(eng.dequant(act))
    return act


def _hourglass(eng, p, s, act_x, depth, n_modules, features):
    r = 0
    up1 = act_x
    for _ in range(n_modules):
        up1 = _residual(eng, p[f"Residual_{r}"], s[f"Residual_{r}"], up1, features)
        r += 1
    low = eng.maxpool(act_x)
    for _ in range(n_modules):
        low = _residual(eng, p[f"Residual_{r}"], s[f"Residual_{r}"], low, features)
        r += 1
    if depth > 1:
        low = _hourglass(eng, p["Hourglass_0"], s["Hourglass_0"], low,
                         depth - 1, n_modules, features)
    else:
        for _ in range(n_modules):
            low = _residual(eng, p[f"Residual_{r}"], s[f"Residual_{r}"], low,
                            features)
            r += 1
    for _ in range(n_modules):
        low = _residual(eng, p[f"Residual_{r}"], s[f"Residual_{r}"], low, features)
        r += 1
    return eng.quant(eng.upsample_add(up1, low), pc=True)


def _traverse(eng, variables, images_roi, prior_kp, net):
    """Shared calib/int8 traversal; mirrors PkpNet.__call__ module order."""
    p = variables["params"]["HourglassNet_0"]
    s = variables["batch_stats"]["HourglassNet_0"]
    n, h, w, _ = images_roi.shape
    num_kp, features, n_modules = net.num_kp, net.features, net.n_modules
    if prior_kp is None:
        prior_kp = jnp.zeros((n, h // 4, w // 4, num_kp), jnp.float32)

    # stem conv stays full precision (3-channel input, tiny traffic)
    x = jax.lax.conv_general_dilated(
        images_roi.astype(jnp.float32), p["Conv_0"]["kernel"].astype(jnp.float32),
        (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + p["Conv_0"]["bias"]
    a0, b0 = _norm_params(p, s, "Norm_0")
    x = jnp.maximum(x * a0 + b0, 0.0)
    act = eng.quant(x)
    act = _residual(eng, p["Residual_0"], s["Residual_0"], act, 128)
    act = eng.maxpool(act)
    act = _residual(eng, p["Residual_1"], s["Residual_1"], act, 128)
    act = _residual(eng, p["Residual_2"], s["Residual_2"], act, features)
    prior_act = eng.quant(prior_kp.astype(jnp.float32))
    act = eng.quant(
        eng.dequant(act) + eng.conv_raw(prior_act, p["Conv_1"]), pc=True
    )

    conv_i, norm_i, res_i = 2, 1, 3
    outs = []
    for i in range(net.n_stack):
        n_, th, tw, _ = (act.q if hasattr(act, "q") else act.x).shape
        if (getattr(eng, "fused", False) and _kernel_level_ok(th, tw, features)
                and th * tw >= 4096):
            # whole-level megakernel path: the 64x64 and 32x32 trunk flows
            # kernel -> kernel with no XLA ops between (see
            # `ops/int8_hourglass.py` for why boundaries matter)
            up1, low = _hourglass_fused(eng, p[f"Hourglass_{i}"],
                                        s[f"Hourglass_{i}"], act, 4,
                                        n_modules, features)
            raw, act_next = _stack_tail(eng, p, s, up1, low, act, net,
                                        conv_i, norm_i, res_i,
                                        last=(i == net.n_stack - 1))
            outs.append(raw)
            res_i += n_modules
            norm_i += 1
            conv_i += 2 if i == net.n_stack - 1 else 4
            act = act_next
            continue
        hg = _hourglass(eng, p[f"Hourglass_{i}"], s[f"Hourglass_{i}"], act,
                        4, n_modules, features)
        ll = hg
        for m in range(n_modules):
            # the last block's output feeds a conv directly -> per-tensor
            ll = _residual(eng, p[f"Residual_{res_i}"], s[f"Residual_{res_i}"],
                           ll, features, out_pc=(m < n_modules - 1))
            res_i += 1
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
            act = eng.quant(
                eng.dequant(act) + eng.dequant(ll_q) + tmp_, pc=True
            )
    return outs


def _readout(variables, outs, net):
    raw = outs[-1]
    if net.transpose_heatmaps:
        raw = jnp.swapaxes(raw, 1, 2)
    uv, cov, prob = hm.soft_argmax_from_logits(raw, calc_cov=net.calc_cov)
    pooled = jnp.mean(raw, axis=(1, 2))
    y = jnp.maximum(pooled, 0.0)
    dp = variables["params"]["Dense_0"]
    logits = y @ dp["kernel"] + dp["bias"]
    return PkpNetOutput(
        uv=uv, cov=cov, prob=prob, prob_logits=raw,
        kp_mask_logits=logits, kp_mask=jax.nn.sigmoid(logits),
        aux_logits=tuple(outs[:-1]),
    )


def calibrate(net, variables, batches, prior_batches=None):
    """Run calibration batches; returns the per-point absmax tuple."""
    assert net.norm == "batch" and net.prior_mode == "post_stem"

    @jax.jit
    def one(x, prior):
        eng = _CalibEngine()
        _traverse(eng, variables, x, prior, net)
        return tuple(eng.absmax)  # mixed [] (conv inputs) and [C] (trunk)

    scales = None
    for i, x in enumerate(batches):
        prior = None if prior_batches is None else prior_batches[i]
        s = one(x, prior)
        scales = s if scales is None else jax.tree.map(jnp.maximum, scales, s)
    return scales


def make_int8_apply(net, fused=None):
    """Returns apply(variables, scales, images_roi, prior) -> PkpNetOutput.

    `scales` is the absmax tuple from `calibrate`. The returned callable is
    jit-compatible; activations are int8-resident end to end in the backbone.

    fused=True additionally runs eligible residual blocks through the Pallas
    megakernel (`ops/int8_residual.py`). Default OFF: the per-block kernel
    beats the unfused XLA block 3.2 vs 4.7 ms in isolation (batch 256,
    64x64x256, v5e) but LOSES end to end — XLA lays the surrounding int8
    graph out in a transposed {3,0,2,1} (batch-as-sublanes) tiling, and each
    pallas boundary forces materialized relayout copies plus de-fused
    maxpool/upsample neighbors (+33 ms/batch-256, device trace). Set
    SUO_INT8_FUSED=1 to enable for experiments. On CPU backends the kernel
    runs in the Pallas interpreter (slow; tests only).
    """
    assert net.norm == "batch" and net.prior_mode == "post_stem"
    if fused is None:
        fused = os.environ.get("SUO_INT8_FUSED", "0") == "1"
    interpret = jax.default_backend() == "cpu"

    def apply(variables, scales, images_roi, prior_kp=None):
        eng = _Int8Engine(scales, fused=fused, interpret=interpret)
        outs = _traverse(eng, variables, images_roi, prior_kp, net)
        # every calibration point must be consumed exactly once and in
        # order — catches any fused/unfused scale-sequence drift at trace
        # time rather than as silent mis-scaling
        assert eng.i == len(scales), (eng.i, len(scales))
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
