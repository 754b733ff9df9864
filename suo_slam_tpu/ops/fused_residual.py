"""Pallas fused pre-activation bottleneck residual block (inference path).

The stacked-hourglass backbone is HBM-bandwidth bound under XLA: each
GN -> 1x1 -> GN -> 3x3 -> GN -> 1x1 -> add block round-trips the [H, W, C]
activation through HBM ~6 times (measured ~240 MB/crop, 61% of v5e HBM
bandwidth at 29% MXU). This kernel keeps ONE sample's activations resident in
VMEM for the whole block — read x once, write out once — cutting block
traffic ~3x.

Layout: grid over the batch; per step the [H, W, C] sample plus the [H, W, M]
bottleneck activations and all weights fit comfortably in 16 MB VMEM for the
dominant shape (64 x 64 x 256, M = 128; ~7 MB).

The 3x3 convolution runs as 9 shifted [H*W, M] x [M, M] matmuls on the MXU
over a zero-padded VMEM copy. GroupNorm statistics are exact (full sample in
VMEM) and accumulated in f32.

STATUS — experimental, not wired into the model. Measured on v5e (batch 256,
64x64x256): this kernel 33.2 ms vs ~7.5 ms for the equivalent flax/XLA block
sequence. The in-kernel relayouts (NHWC->flat reshapes and the 9 shifted
windows of the 3x3 conv) currently cost more than the HBM traffic they save;
XLA's conv + fusion pipeline wins. Kept (with its correctness tests) as the
starting point for a revisit with an [H, W]-native layout and
`pltpu.roll`-based shifts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _group_norm(x2, scale, bias, groups, eps=1e-5, out_dt=None):
    """Exact GroupNorm + affine on an [R, C] VMEM tensor, any input dtype.

    Mosaic-friendly formulation: group aggregation via matmul with a [C, G]
    one-hot assignment matrix instead of a 3-D reshape (which the TPU vector
    layout pass rejects). Statistics accumulate in f32; the elementwise
    normalization upcasts per-tile (no materialized f32 copy of x), and the
    result is emitted in `out_dt` (default: input dtype) to keep VMEM small.
    """
    r, c = x2.shape
    out_dt = out_dt or x2.dtype
    gs = c // groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gi = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    A = (ch // gs == gi).astype(jnp.float32)  # [C, G]
    xf = x2.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=0, keepdims=True)        # [1, C]
    s2 = jnp.sum(xf * xf, axis=0, keepdims=True)   # [1, C]
    denom = float(r * gs)
    gmean = jnp.dot(s1, A, preferred_element_type=jnp.float32) / denom   # [1, G]
    gmean2 = jnp.dot(s2, A, preferred_element_type=jnp.float32) / denom  # [1, G]
    gvar = jnp.maximum(gmean2 - gmean * gmean, 0.0)
    # broadcast group stats back to channels
    mean_c = jnp.dot(gmean, A.T, preferred_element_type=jnp.float32)     # [1, C]
    inv_c = jnp.dot(jax.lax.rsqrt(gvar + eps), A.T,
                    preferred_element_type=jnp.float32)
    return ((xf - mean_c) * inv_c * scale + bias).astype(out_dt)


def _bottleneck_kernel(
    x_ref, g1s, g1b, w1, b1, g2s, g2b, w2, b2, g3s, g3b, w3, b3, out_ref,
    *, h, w, groups,
):
    c = x_ref.shape[-1]
    m = w1.shape[-1]
    dt = x_ref.dtype  # matmul compute dtype (bf16 in production)
    x2 = x_ref[0].reshape(h * w, c)  # [R, C] input dtype

    # GN1 -> ReLU -> 1x1 (C -> M); GN emits `dt` to keep VMEM small
    y = jnp.maximum(_group_norm(x2, g1s[:], g1b[:], groups, out_dt=dt), 0.0)
    y1 = (
        jnp.dot(y, w1[:].astype(dt), preferred_element_type=jnp.float32)
        + b1[:]
    )

    # GN2 -> ReLU -> 3x3 (M -> M) as 9 shifted matmuls
    y1 = jnp.maximum(_group_norm(y1, g2s[:], g2b[:], groups, out_dt=dt), 0.0)
    y1p = jnp.pad(y1.reshape(h, w, m), ((1, 1), (1, 1), (0, 0)))  # [H+2, W+2, M]
    acc = jnp.zeros((h * w, m), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            win = y1p[ky : ky + h, kx : kx + w, :].reshape(h * w, m)
            acc += jnp.dot(win, w2[ky, kx].astype(dt),
                           preferred_element_type=jnp.float32)
    y2 = acc + b2[:]

    # GN3 -> ReLU -> 1x1 (M -> C) + residual
    y2 = jnp.maximum(_group_norm(y2, g3s[:], g3b[:], groups, out_dt=dt), 0.0)
    y3 = (
        jnp.dot(y2, w3[:].astype(dt), preferred_element_type=jnp.float32)
        + b3[:]
    )
    out = x2.astype(jnp.float32) + y3
    out_ref[0] = out.reshape(h, w, c).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("groups",))
def fused_bottleneck(
    x: jax.Array,
    g1s, g1b, w1, b1, g2s, g2b, w2, b2, g3s, g3b, w3, b3,
    groups: int = 32,
) -> jax.Array:
    """Fused pre-act bottleneck: x + conv1x1(relu(gn(conv3x3(relu(gn(
    conv1x1(relu(gn(x))))))))), same-channel case.

    x: [N, H, W, C] (bf16 recommended). w1: [C, M], w2: [3, 3, M, M],
    w3: [M, C]; GN scale/bias per stage. Returns [N, H, W, C] in x.dtype.
    """
    n, h, w, c = x.shape
    m = w1.shape[-1]
    assert w3.shape == (m, c) and w2.shape == (3, 3, m, m)
    kernel = partial(_bottleneck_kernel, h=h, w=w, groups=groups)
    # 1-D param vectors go in as [1, C] (Mosaic prefers >= 2-D operands)
    r2 = lambda v: v.reshape(1, -1)
    vec_args = (r2(g1s), r2(g1b), w1, r2(b1), r2(g2s), r2(g2b), w2, r2(b2),
                r2(g3s), r2(g3b), w3, r2(b3))
    vspec = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    flops = n * h * w * (c * m * 2 + m * m * 9 * 2 + m * c * 2)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [vspec(a) for a in vec_args],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * n * h * w * c * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, *vec_args)


def reference_bottleneck(
    x, g1s, g1b, w1, b1, g2s, g2b, w2, b2, g3s, g3b, w3, b3, groups: int = 32
):
    """Plain-XLA twin of `fused_bottleneck` (training path + test oracle)."""
    n, h, w, c = x.shape
    m = w1.shape[-1]

    def gn(t, scale, bias):
        tf = t.reshape(n, h * w, -1).astype(jnp.float32)
        y = jax.vmap(lambda s: _group_norm(s, scale, bias, groups))(tf)
        return y.reshape(n, h, w, -1)

    dt = x.dtype
    y = jnp.maximum(gn(x, g1s, g1b), 0.0)
    y1 = (
        jnp.einsum("nhwc,cm->nhwm", y.astype(dt), w1.astype(dt),
                   preferred_element_type=jnp.float32)
        + b1
    )
    y1 = jnp.maximum(gn(y1, g2s, g2b), 0.0)
    y2 = jax.lax.conv_general_dilated(
        y1.astype(dt), w2.astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b2
    y2 = jnp.maximum(gn(y2, g3s, g3b), 0.0)
    y3 = (
        jnp.einsum("nhwm,mc->nhwc", y2.astype(dt), w3.astype(dt),
                   preferred_element_type=jnp.float32)
        + b3
    )
    return (x.astype(jnp.float32) + y3).astype(x.dtype)
