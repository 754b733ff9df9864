"""Whole-level Pallas megakernels for the int8-resident hourglass trunk.

The per-block kernel (`ops/int8_residual.py`) beats the unfused XLA int8
block in isolation but LOSES end to end: XLA lays the surrounding int8
graph out in a transposed {3,0,2,1} (batch-as-sublanes) tiling, so every
pallas boundary forces materialized relayout copies plus de-fused
maxpool/upsample neighbors (device trace: +33 ms/batch-256). The fix is to
remove the boundaries: these kernels absorb entire trunk segments so 64x64
and 32x32 tensors flow kernel -> kernel in default layout with NO XLA ops
between them (reference hot loop: `lib/object_slam.py:1077-1167`; hourglass
structure: `lib/models/hg.py:6-119`).

Three kernels, one grid step per sample, all block math shared with
`int8_residual.residual_rows`:

- `chain_int8(x, blocks, pool=...)` — n_modules residual blocks chained in
  VMEM; optionally also emits maxpool2x2 of the INPUT (the hourglass always
  pools the same tensor another chain consumes, so the input is read from
  HBM once). The pool runs in row space via two halving tricks (lane-pair
  max for dx, sublane-half max for dy) — Mosaic supports no strided 3-D
  gathers.
- `jchain_int8(up1, low, ...)` — the hourglass return junction
  quant(deq(up1) + upsample2x(deq(low))) followed by the parent's post
  chain. Upsample is a broadcast+reshape on the VMEM tile.
- `tail_int8(up1, low, act, ...)` — the top junction + the ll chain + the
  1x1 lin/heatmap-head convs + (non-final stacks) the two inter-stack 1x1
  convs and the 3-way junction producing the next stack's trunk. Emits the
  heatmap logits (bf16, the same precision the unfused path materializes)
  and the next trunk act in one pass.

All folding of scales/affines into the [1, C] f32 epilogue vectors happens
in `models/int8_forward` (`_fold_residual` and friends); calibration-point
identity and ORDER are shared with the unfused engine by construction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .int8_residual import _dot_s8, _q8, residual_rows, zero_halo

N_BLOCK_VECS = 12


def _maxpool_rows_to_block(x8, h, w):
    """2x2/stride-2 maxpool of [R, C] int8 codes -> [h/2, w/2, C] codes.

    Codes order matches values order (positive scale), so pooling codes
    equals pooling values. x-pairs are adjacent rows in row-major row space:
    fold them as lane pairs of an [R/2, 2C] view; y-pairs become sublane
    halves of an [h/2, w, C] view of the result."""
    c = x8.shape[-1]
    xf = x8.reshape(h * w // 2, 2 * c).astype(jnp.float32)
    a = jnp.maximum(xf[:, :c], xf[:, c:])           # [R/2, C]: x-pooled
    t3 = a.reshape(h // 2, w, c)                    # row pairs side by side
    u = jnp.maximum(t3[:, :w // 2, :], t3[:, w // 2:, :])
    return u.astype(jnp.int8)


def _upsample_rows(low3):
    """Nearest 2x upsample of an [h2, w2, C] f32 tile -> [R=4*h2*w2, C]."""
    h2, w2, c = low3.shape
    up = jnp.broadcast_to(low3[:, None, :, None, :], (h2, 2, w2, 2, c))
    return up.reshape(4 * h2 * w2, c)


def _vspec(a):
    return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                        memory_space=pltpu.VMEM)


def _img_spec(shape):
    return pl.BlockSpec((1,) + shape, lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _prep_blocks(blocks):
    """Flatten block vec tuples; concat each w2q [3,3,M,M] -> [3, 3M, M]."""
    flat = []
    for b in blocks:
        assert len(b) == N_BLOCK_VECS
        b = list(b)
        w2q = b[5]
        b[5] = jnp.concatenate([w2q[:, j] for j in range(3)], axis=1)
        flat.extend(b)
    return flat


def _block_args(refs, i):
    return tuple(refs[i * N_BLOCK_VECS:(i + 1) * N_BLOCK_VECS])


def _chain_rows(x8, refs, s_ref, h, w, n_blocks):
    for b in range(n_blocks):
        x8 = residual_rows(x8, _block_args(refs, b), s_ref, h, w)
    return x8


def _cost(n, h, w, c, m, n_blocks, extra_flops=0):
    per_block = h * w * (c * m * 2 + 9 * m * m * 2 + m * c * 2)
    return pl.CostEstimate(
        flops=n * (n_blocks * per_block + extra_flops),
        bytes_accessed=2 * n * h * w * c,
        transcendentals=0,
    )


def _scratch(h, w, m):
    return [pltpu.VMEM((h * w + 2 * w, 3 * m), jnp.int8)]


_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


# ---------------------------------------------------------------- chain ---

def _chain_kernel(x_ref, *refs, h, w, n_blocks, pool):
    if pool:
        out_ref, pool_ref, s_ref = refs[-3], refs[-2], refs[-1]
    else:
        out_ref, s_ref = refs[-2], refs[-1]
    zero_halo(s_ref, h, w)
    c = x_ref.shape[-1]
    x8 = x_ref[0].reshape(h * w, c)
    if pool:
        pool_ref[0] = _maxpool_rows_to_block(x8, h, w)
    out = _chain_rows(x8, refs, s_ref, h, w, n_blocks)
    out_ref[0] = out.reshape(h, w, c)


@partial(jax.jit, static_argnames=("pool", "interpret", "n_blocks"))
def _chain_call(q_in, *flat, pool, interpret, n_blocks):
    n, h, w, c = q_in.shape
    m = flat[2].shape[-1]
    out_shape = [jax.ShapeDtypeStruct((n, h, w, c), jnp.int8)]
    out_specs = [_img_spec((h, w, c))]
    if pool:
        out_shape.append(jax.ShapeDtypeStruct((n, h // 2, w // 2, c), jnp.int8))
        out_specs.append(_img_spec((h // 2, w // 2, c)))
    return pl.pallas_call(
        partial(_chain_kernel, h=h, w=w, n_blocks=n_blocks, pool=pool),
        out_shape=tuple(out_shape) if pool else out_shape[0],
        grid=(n,),
        in_specs=[_img_spec((h, w, c))] + [_vspec(a) for a in flat],
        out_specs=tuple(out_specs) if pool else out_specs[0],
        scratch_shapes=_scratch(h, w, m),
        compiler_params=_PARAMS,
        cost_estimate=_cost(n, h, w, c, m, n_blocks),
        interpret=interpret,
    )(q_in, *flat)


def chain_int8(q_in, blocks, pool=False, interpret=False):
    """n_blocks chained residual blocks (+ optional maxpool of the input).

    q_in [N, H, W, C] int8; blocks: tuple of 12-tuples (see
    `int8_residual.residual_rows`). Returns q_out or (q_out, q_pool)."""
    flat = _prep_blocks(blocks)
    return _chain_call(q_in, *flat, pool=pool, interpret=interpret,
                       n_blocks=len(blocks))


# --------------------------------------------------------------- jchain ---

def _jchain_kernel(up_ref, low_ref, g_up, g_low, *refs, h, w, n_blocks):
    out_ref, s_ref = refs[-2], refs[-1]
    zero_halo(s_ref, h, w)
    c = up_ref.shape[-1]
    upf = up_ref[0].reshape(h * w, c).astype(jnp.float32)
    lowf = low_ref[0].astype(jnp.float32)
    x8 = _q8(upf * g_up[:] + _upsample_rows(lowf) * g_low[:])
    out = _chain_rows(x8, refs, s_ref, h, w, n_blocks)
    out_ref[0] = out.reshape(h, w, c)


@partial(jax.jit, static_argnames=("interpret", "n_blocks"))
def _jchain_call(up_q, low_q, g_up, g_low, *flat, interpret, n_blocks):
    n, h, w, c = up_q.shape
    m = flat[2].shape[-1]
    return pl.pallas_call(
        partial(_jchain_kernel, h=h, w=w, n_blocks=n_blocks),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), jnp.int8),
        grid=(n,),
        in_specs=[_img_spec((h, w, c)), _img_spec((h // 2, w // 2, c)),
                  _vspec(g_up), _vspec(g_low)] + [_vspec(a) for a in flat],
        out_specs=_img_spec((h, w, c)),
        scratch_shapes=_scratch(h, w, m),
        compiler_params=_PARAMS,
        cost_estimate=_cost(n, h, w, c, m, n_blocks),
        interpret=interpret,
    )(up_q, low_q, g_up, g_low, *flat)


def jchain_int8(up_q, low_q, g_up, g_low, blocks, interpret=False):
    """Hourglass return junction + the parent's post chain.

    x = quant(deq(up1) + upsample2x(deq(low))) folded as
    q8(up_codes * g_up + upsample(low_codes) * g_low), then n_blocks
    residual blocks. up_q [N, H, W, C], low_q [N, H/2, W/2, C]."""
    flat = _prep_blocks(blocks)
    return _jchain_call(up_q, low_q, g_up, g_low, *flat,
                        interpret=interpret, n_blocks=len(blocks))


# ----------------------------------------------------------------- tail ---

def _tail_kernel(*refs, h, w, n_blocks, kp, inter):
    # inputs: up, low, [act], g_up, g_low, blocks*12, lin(w,m,c),
    #         head(w,g,b), [inter: w_i1,g_i1,b_i1,inv_r,w_i2,ga,gl,gt,cb]
    # outputs: raw, [act_out]; scratch: s_ref
    i = 0
    up_ref = refs[i]; i += 1
    low_ref = refs[i]; i += 1
    if inter:
        act_ref = refs[i]; i += 1
    g_up = refs[i]; g_low = refs[i + 1]; i += 2
    blockrefs = refs[i:i + n_blocks * N_BLOCK_VECS]
    i += n_blocks * N_BLOCK_VECS
    w_lin, m_l, c_l = refs[i:i + 3]; i += 3
    w_head, g_head, b_head = refs[i:i + 3]; i += 3
    if inter:
        w_i1, g_i1, b_i1, inv_r, w_i2, ga, gl, gt, cb = refs[i:i + 9]
        i += 9
    raw_ref = refs[i]; i += 1
    if inter:
        act_out_ref = refs[i]; i += 1
    s_ref = refs[i]

    zero_halo(s_ref, h, w)
    c = up_ref.shape[-1]
    r = h * w
    upf = up_ref[0].reshape(r, c).astype(jnp.float32)
    lowf = low_ref[0].astype(jnp.float32)
    x8 = _q8(upf * g_up[:] + _upsample_rows(lowf) * g_low[:])
    ll8 = _chain_rows(x8, blockrefs, s_ref, h, w, n_blocks)

    # lin: 1x1 C->C conv + norm-relu-quant
    acc = _dot_s8(ll8, w_lin[:]).astype(jnp.float32)
    llact8 = _q8(jnp.maximum(acc * m_l[:] + c_l[:], 0.0))

    # heatmap head: 1x1 C->num_kp (weights zero-padded to 128 lanes)
    acch = _dot_s8(llact8, w_head[:]).astype(jnp.float32)
    rawf = acch * g_head[:] + b_head[:]
    raw_ref[0] = rawf[:, :kp].astype(jnp.bfloat16).reshape(h, w, kp)

    if inter:
        # inter-stack: ll' conv, requant of raw, raw' conv, 3-way junction
        acc1 = _dot_s8(llact8, w_i1[:]).astype(jnp.float32)
        llq8 = _q8(acc1 * g_i1[:] + b_i1[:])
        raw8 = _q8(rawf * inv_r[:])
        acc2 = _dot_s8(raw8, w_i2[:]).astype(jnp.float32)
        actf = act_ref[0].reshape(r, c).astype(jnp.float32)
        nxt = _q8(actf * ga[:] + llq8.astype(jnp.float32) * gl[:]
                  + acc2 * gt[:] + cb[:])
        act_out_ref[0] = nxt.reshape(h, w, c)


@partial(jax.jit, static_argnames=("interpret", "kp", "n_blocks", "inter"))
def _tail_call(up_q, low_q, act_q, *ops, interpret, kp, n_blocks, inter):
    n, h, w, c = up_q.shape
    m = ops[4].shape[-1]  # blocks start at ops[2] (g_up, g_low first)
    extra = h * w * c * (c * 2 + 128 * 2) * (2 if inter else 1)
    out_shape = [jax.ShapeDtypeStruct((n, h, w, kp), jnp.bfloat16)]
    out_specs = [_img_spec((h, w, kp))]
    ins = [up_q, low_q] + ([act_q] if inter else []) + list(ops)
    in_specs = [_img_spec((h, w, c)), _img_spec((h // 2, w // 2, c))]
    if inter:
        in_specs.append(_img_spec((h, w, c)))
        out_shape.append(jax.ShapeDtypeStruct((n, h, w, c), jnp.int8))
        out_specs.append(_img_spec((h, w, c)))
    in_specs += [_vspec(a) for a in ops]
    return pl.pallas_call(
        partial(_tail_kernel, h=h, w=w, n_blocks=n_blocks, kp=kp,
                inter=inter),
        out_shape=tuple(out_shape),
        grid=(n,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=_scratch(h, w, m),
        compiler_params=_PARAMS,
        cost_estimate=_cost(n, h, w, c, m, n_blocks, extra_flops=extra),
        interpret=interpret,
    )(*ins)


def tail_int8(up_q, low_q, act_q, g_up, g_low, blocks, lin, head, inter,
              kp, interpret=False):
    """Stack tail: top junction + ll chain + lin/head convs (+ inter-stack).

    lin = (w_lin [C, C] s8, m_l, c_l); head = (w_head [C, 128] s8 zero-
    padded past kp, g_head, b_head); inter = None (final stack) or
    (w_i1 [C, C], g_i1, b_i1, inv_r [1, 128], w_i2 [128, C], ga, gl, gt,
    cb). Returns (raw bf16 [N, H, W, kp], act_next or None)."""
    flat = _prep_blocks(blocks)
    ops = [g_up, g_low] + flat + list(lin) + list(head)
    if inter is not None:
        ops += list(inter)
    outs = _tail_call(up_q, low_q, act_q, *ops, interpret=interpret, kp=kp,
                      n_blocks=len(blocks), inter=inter is not None)
    if inter is not None:
        return outs[0], outs[1]
    return outs[0], None
