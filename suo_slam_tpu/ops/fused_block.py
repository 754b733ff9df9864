"""Pallas fused inference residual block v2: affine-norm bottleneck.

Second attempt at keeping a whole pre-activation bottleneck block in VMEM
(see `fused_residual.py` for v1 and why it lost to XLA: NHWC<->flat
relayouts and in-kernel GroupNorm reductions). v2 exploits two things:

1. With the (default) BatchNorm backbone, inference normalization is a pure
   per-channel affine — no reductions in the kernel at all.
2. All tensors stay in ONE [R=H*W, C] 2-D layout; the 3x3 convolution's nine
   taps become `pltpu.roll`s along the sublane (row) axis by dy*W + dx with
   boundary masks built from row-index iota — no padding, no NHWC slicing,
   no relayouts.

Per-sample VMEM budget at the dominant shape (64x64, C=256, M=128):
x 2 MB (bf16) + y1 1 MB + rolled tap 1 MB + f32 acc 2 MB + weights ~0.5 MB —
comfortably inside 16 MB with double-buffered I/O.

The block computed (inference form of `models/hourglass.Residual`):
    y = relu(x * a1 + b1) @ W1 + c1
    y = relu(y * a2 + b2);  y = conv3x3(y, W2) + c2
    y = relu(y * a3 + b3) @ W3 + c3
    out = x + y
where (a_i, b_i) are the folded BatchNorm affines.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, a1, b1, w1, c1, a2, b2, w2, c2, a3, b3, w3, c3, out_ref,
            *, h, w):
    r = h * w
    c = x_ref.shape[-1]
    m = w1.shape[-1]
    dt = x_ref.dtype
    x2 = x_ref[0]  # [R, C]

    y = jnp.maximum(x2.astype(jnp.float32) * a1[:] + b1[:], 0.0).astype(dt)
    y1 = jnp.dot(y, w1[:].astype(dt), preferred_element_type=jnp.float32) + c1[:]
    # stays f32: Mosaic's rotate only supports 32-bit element types
    y1 = jnp.maximum(y1 * a2[:] + b2[:], 0.0)  # [R, M] f32

    # 3x3 conv: out[y, x] = sum_{dy, dx} in[y+dy, x+dx] @ W[dy+1, dx+1]
    # in row space: source row = r + dy*W + dx -> roll by -(dy*W + dx).
    row = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    yy = row // w
    xx = row - yy * w
    acc = jnp.zeros((r, m), jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            shift = (-(dy * w + dx)) % r  # pltpu.roll wants non-negative
            tap = pltpu.roll(y1, shift, 0) if shift else y1
            valid = jnp.ones((r, 1), jnp.float32)
            if dy == -1:
                valid = valid * (yy > 0)
            elif dy == 1:
                valid = valid * (yy < h - 1)
            if dx == -1:
                valid = valid * (xx > 0)
            elif dx == 1:
                valid = valid * (xx < w - 1)
            tap = (tap * valid).astype(dt)
            acc += jnp.dot(tap, w2[dy + 1, dx + 1].astype(dt),
                           preferred_element_type=jnp.float32)
    y2 = acc + c2[:]
    y2 = jnp.maximum(y2 * a3[:] + b3[:], 0.0).astype(dt)
    y3 = jnp.dot(y2, w3[:].astype(dt), preferred_element_type=jnp.float32) + c3[:]
    out_ref[0] = (x2.astype(jnp.float32) + y3).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("h", "w"))
def fused_affine_bottleneck(
    x: jax.Array, a1, b1, w1, c1, a2, b2, w2, c2, a3, b3, w3, c3,
    h: int, w: int,
) -> jax.Array:
    """x: [N, H*W, C] (bf16); affines [C]/[M]; w1 [C, M], w2 [3, 3, M, M],
    w3 [M, C]. Returns [N, H*W, C]."""
    n, r, c = x.shape
    assert r == h * w
    m = w1.shape[-1]
    r2 = lambda v: v.reshape(1, -1).astype(jnp.float32)
    vec = (r2(a1), r2(b1), w1, r2(c1), r2(a2), r2(b2), w2, r2(c2),
           r2(a3), r2(b3), w3, r2(c3))
    vspec = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_kernel, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((n, r, c), x.dtype),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, r, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [vspec(a) for a in vec],
        out_specs=pl.BlockSpec((1, r, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * r * (c * m * 2 + m * m * 18 + m * c * 2),
            bytes_accessed=2 * n * r * c * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, *vec)


def reference_affine_bottleneck(x, a1, b1, w1, c1, a2, b2, w2, c2, a3, b3,
                                w3, c3, h, w):
    """XLA twin (test oracle + the shape XLA actually runs in the model)."""
    n, r, c = x.shape
    dt = x.dtype
    y = jnp.maximum(x.astype(jnp.float32) * a1 + b1, 0.0).astype(dt)
    y1 = jnp.einsum("nrc,cm->nrm", y, w1.astype(dt),
                    preferred_element_type=jnp.float32) + c1
    y1 = jnp.maximum(y1 * a2 + b2, 0.0).astype(dt)
    img = y1.reshape(n, h, w, -1)
    y2 = jax.lax.conv_general_dilated(
        img, w2.astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).reshape(n, r, -1) + c2
    y2 = jnp.maximum(y2 * a3 + b3, 0.0).astype(dt)
    y3 = jnp.einsum("nrm,mc->nrc", y2, w3.astype(dt),
                    preferred_element_type=jnp.float32) + c3
    return (x.astype(jnp.float32) + y3).astype(dt)
