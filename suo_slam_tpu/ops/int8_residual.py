"""Pallas int8-resident fused residual block (inference hot path).

One kernel executes an entire pre-activation bottleneck residual block
(`models/hourglass.Residual`, reference `Residual.py:3-35`) on int8 codes:

    q1 = quant(relu(deq(x)*a0 + b0))            # norm-relu     (s8 -> s8)
    q2 = quant(relu(conv1x1(q1)*m1 + c1))       # 1x1 C -> M    (s8 -> s8)
    q3 = quant(relu(conv3x3(q2)*m2 + c2))       # 3x3 M -> M    (s8 -> s8)
    out = quant(deq(x) + conv1x1(q3)*g3 + b3)   # 1x1 M -> C + skip

All scale/affine algebra is folded OUTSIDE the kernel into per-channel f32
vectors (`models/int8_forward._residual_fused`), so the kernel sees only
multiply-add epilogues. Convolutions run as s8 x s8 -> s32 dot_generals on
the MXU (2x the bf16 rate).

The 3x3 conv avoids both the NHWC window relayouts that sank the round-1
bf16 kernel (git history: `ops/fused_residual.py`) and per-tap VPU work:
the three dx-shifts of q2 are built ONCE with `pltpu.roll` + boundary masks
and stored side by side in an [R + 2W, 3M] int8 scratch whose top/bottom W
rows are zero (the dy halo). The nine taps then collapse into three fat
[R, 3M] x [3M, M] matmuls whose LHS are aligned static row-slices of the
scratch — dy shifts cost nothing, and the fatter K dimension feeds the MXU
better than nine thin [R, M] products. Measured on v5e (batch 256,
64x64x256): 3.2 ms vs 4.7 ms for the unfused XLA int8 block sequence and
4.5 ms for the naive 9-rolled-tap kernel; floor (MXU + DMA, epilogues
removed) is 2.2 ms.

Why this beats the unfused XLA int8 path: XLA fuses each conv's epilogue but
still materializes q1/q2/q3 in HBM (~4 extra MB/sample round-tripped per
block at 64x64x256). Here the block reads x once (1 MB int8) and writes out
once; everything else lives in VMEM. Per-sample VMEM at the dominant shape
(R=4096, C=256, M=128): x 1 MB + f32 epilogues ~10 MB + scratch 1.6 MB +
weights 80 KB, inside the v5e VMEM budget with double-buffered I/O.

Numerics: epilogues are f32 (the unfused engine uses bf16) and the conv
accumulates exact s32 (unfused: bf16) — the fused path is slightly MORE
precise than its XLA twin; `residual_int8_ref` reimplements the identical
f32/s32 math with `lax.conv` for bit-exact kernel tests
(`tests/test_int8_residual.py`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _q8(xf):
    """f32 -> int8 code with the engine's rounding (round-half-even, clip)."""
    return jnp.clip(jnp.round(xf), -127, 127).astype(jnp.int8)


def _dot_s8(a8, b8):
    return jax.lax.dot_general(
        a8, b8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def zero_halo(s_ref, h, w):
    """Zero the dy-halo rows of the tap scratch once per kernel invocation
    (scratch persists over the sequential TPU grid; every program overwrites
    only the center rows)."""
    m3 = s_ref.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        s_ref[0:w, :] = jnp.zeros((w, m3), jnp.int8)
        s_ref[w + h * w:, :] = jnp.zeros((w, m3), jnp.int8)


def residual_rows(x8, vecs, s_ref, h, w):
    """One residual block on [R, C] int8 codes held in VMEM/registers.

    vecs = (m0, c0, w1q, m1, c1, w2cat, m2, c2, w3q, g_in, g3, g_b): folded
    f32 epilogue vectors ([1, C]/[1, M]) and int8 weights; w2cat is
    [3, 3M, M] (taps concatenated along K per dy row). s_ref is the shared
    [R + 2W, 3M] int8 tap scratch with zeroed halo (`zero_halo`). Returns
    the [R, C] int8 output codes. Shared by the single-block kernel here
    and the whole-level kernels in `ops/int8_hourglass.py`."""
    m0, c0, w1, m1, c1, w2cat, m2, c2, w3, g_in, g3, g_b = vecs
    r = h * w
    m = w1.shape[-1]
    xf = x8.astype(jnp.float32)

    # norm-relu-quant (s8 -> s8, folded per-channel affine)
    q1 = _q8(jnp.maximum(xf * m0[:] + c0[:], 0.0))

    # 1x1 C -> M on the MXU (s32 accum), f32 epilogue. q2 stays f32
    # (integer-valued codes, in [0, 127] after the relu): Mosaic's roll
    # needs 32-bit lanes.
    acc1 = _dot_s8(q1, w1[:]).astype(jnp.float32)
    q2f = jnp.minimum(jnp.round(jnp.maximum(acc1 * m1[:] + c1[:], 0.0)), 127.0)

    # Build the three dx-shifts of q2. In row space out[r] needs
    # in[r + dy*w + dx]; pltpu.roll(x, s, 0)[i] == x[i - s], so the dx shift
    # is roll by (-dx) mod r, masked where the shift wraps across an image
    # row (x == 0 / x == w-1 columns).
    row = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    xx = row % w
    for j, dx in enumerate((-1, 0, 1)):
        shift = (-dx) % r
        t = pltpu.roll(q2f, shift, 0) if shift else q2f
        if dx == -1:
            t = t * (xx > 0)
        elif dx == 1:
            t = t * (xx < w - 1)
        s_ref[w:w + r, j * m:(j + 1) * m] = t.astype(jnp.int8)

    # 3x3 M -> M as three fat [R, 3M] x [3M, M] matmuls; the dy shifts are
    # aligned static row-slices into the haloed scratch.
    acc2 = jnp.zeros((r, m), jnp.int32)
    for dy in (-1, 0, 1):
        o = w + dy * w
        acc2 += _dot_s8(s_ref[o:o + r, :], w2cat[dy + 1])
    q3 = _q8(jnp.maximum(acc2.astype(jnp.float32) * m2[:] + c2[:], 0.0))

    # 1x1 M -> C + dequantized skip, requantize to the trunk scale
    acc3 = _dot_s8(q3, w3[:]).astype(jnp.float32)
    return _q8(xf * g_in[:] + acc3 * g3[:] + g_b[:])


def _kernel(x_ref, m0, c0, w1, m1, c1, w2cat, m2, c2, w3, g_in, g3, g_b,
            out_ref, s_ref, *, h, w):
    c = x_ref.shape[-1]
    zero_halo(s_ref, h, w)
    vecs = (m0, c0, w1, m1, c1, w2cat, m2, c2, w3, g_in, g3, g_b)
    out = residual_rows(x_ref[0].reshape(h * w, c), vecs, s_ref, h, w)
    out_ref[0] = out.reshape(h, w, c)


@partial(jax.jit, static_argnames=("interpret",))
def fused_residual_int8(
    q_in: jax.Array,
    m0, c0, w1q, m1, c1, w2q, m2, c2, w3q, g_in, g3, g_b,
    interpret: bool = False,
) -> jax.Array:
    """Run the fused int8 residual block.

    q_in: [N, H, W, C] int8 codes. w1q [C, M] / w2q [3, 3, M, M] /
    w3q [M, C] int8 weights. All epilogue vectors f32, shape [1, C] or
    [1, M] (already folded: see module docstring). Returns [N, H, W, C]
    int8 codes. Requires M and C multiples of 128 and W a multiple of 32
    (int8 sublane tile for the scratch halo rows).
    """
    n, h, w, c = q_in.shape
    m = w1q.shape[-1]
    assert w2q.shape == (3, 3, m, m) and w3q.shape == (m, c)
    assert m % 128 == 0 and c % 128 == 0 and w % 32 == 0, (m, c, w)
    # [3, 3M, M]: w2cat[dy] = concat over dx of w2q[dy, dx] along K
    w2cat = jnp.concatenate([w2q[:, j] for j in range(3)], axis=1)
    vecs = (m0, c0, w1q, m1, c1, w2cat, m2, c2, w3q, g_in, g3, g_b)
    vspec = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_kernel, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), jnp.int8),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [vspec(a) for a in vecs],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h * w + 2 * w, 3 * m), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * h * w * (c * m * 2 + 9 * m * m * 2 + m * c * 2),
            bytes_accessed=2 * n * h * w * c,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_in, *vecs)


def residual_int8_ref(q_in, m0, c0, w1q, m1, c1, w2q, m2, c2, w3q,
                      g_in, g3, g_b):
    """Bit-exact JAX twin of the kernel (test oracle; also documents the
    math). Same f32 epilogues and exact s32 conv accumulation."""
    xf = q_in.astype(jnp.float32)
    q1 = _q8(jnp.maximum(xf * m0[0] + c0[0], 0.0))
    acc1 = jnp.einsum("nhwc,cm->nhwm", q1.astype(jnp.int32),
                      w1q.astype(jnp.int32)).astype(jnp.float32)
    q2f = jnp.minimum(jnp.round(jnp.maximum(acc1 * m1[0] + c1[0], 0.0)),
                      127.0)
    acc2 = jax.lax.conv_general_dilated(
        q2f.astype(jnp.int8), w2q, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    q3 = _q8(jnp.maximum(acc2 * m2[0] + c2[0], 0.0))
    acc3 = jnp.einsum("nhwm,mc->nhwc", q3.astype(jnp.int32),
                      w3q.astype(jnp.int32)).astype(jnp.float32)
    return _q8(xf * g_in[0] + acc3 * g3[0] + g_b[0])
