"""Fused-kernel inference forward for PkpNet (bf16, BatchNorm backbone).

Walks the trained flax variables tree and re-executes the exact PkpNet
computation with `ops.fused_block.fused_affine_bottleneck` substituted for
every same-channel bottleneck residual at spatially-large levels — one VMEM
round trip per block instead of ~6 HBM round trips (measured 1.4x per block
on v5e). Everything else (stem, lin/head convs, soft-argmax readout,
classifier) runs the standard XLA ops.

Equivalence with `net.apply` is enforced by `tests/test_fused_forward.py`
on random weights; the traversal mirrors the module-creation order of
`models/hourglass.py` / `models/pkpnet.py` exactly (flax names are
deterministic: Conv_k / Norm_k / Residual_k / Hourglass_k in creation order).

STATUS — experimental, NOT the production path. The fused block wins 1.4x in
isolation (5.0 vs 7.1 ms at batch 256, 64x64x256), but the END-TO-END fused
forward measures SLOWER than the plain flax path (91-94 ms vs 79 ms at batch
256): XLA's cross-op fusion over the unbroken flax graph (affine+relu folded
into conv epilogues, upsample+add fusions) plus the NHWC<->[N,HW,C] reshape
boundaries around each pallas_call more than cancel the per-block gain. Kept
(with exactness tests) as the starting point for a whole-level megakernel.

Restrictions: inference only, norm="batch", prior_mode="post_stem",
quant="off".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import heatmap as hm
from ..ops.fused_block import fused_affine_bottleneck
from .pkpnet import PkpNetOutput

FUSE_MIN_ROWS = 1024  # fuse blocks with H*W >= this (32x32 and up)
BN_EPS = 1e-5


def _bn_affine(p, s):
    a = p["scale"] * jax.lax.rsqrt(s["var"] + BN_EPS)
    return a, p["bias"] - s["mean"] * a


def _norm_relu(p, s, x):
    a, b = _bn_affine(p["MaskedBatchNorm_0"], s["MaskedBatchNorm_0"])
    return jnp.maximum(x.astype(jnp.float32) * a + b, 0.0).astype(x.dtype)


def _conv(p, x, strides=(1, 1), padding="SAME", dtype=None):
    dtype = dtype or x.dtype
    k = p["kernel"].astype(dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), k, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + p["bias"]).astype(dtype)


def _residual(p, s, x, features, fuse=True):
    """Mirror of `hourglass.Residual`; p/s are its params/batch_stats."""
    n, h, w, cin = x.shape
    if fuse and cin == features and h * w >= FUSE_MIN_ROWS:
        a1, b1 = _bn_affine(p["Norm_0"]["MaskedBatchNorm_0"],
                            s["Norm_0"]["MaskedBatchNorm_0"])
        a2, b2 = _bn_affine(p["Norm_1"]["MaskedBatchNorm_0"],
                            s["Norm_1"]["MaskedBatchNorm_0"])
        a3, b3 = _bn_affine(p["Norm_2"]["MaskedBatchNorm_0"],
                            s["Norm_2"]["MaskedBatchNorm_0"])
        out = fused_affine_bottleneck(
            x.reshape(n, h * w, cin),
            a1, b1, p["Conv_0"]["kernel"][0, 0], p["Conv_0"]["bias"],
            a2, b2, p["Conv_1"]["kernel"], p["Conv_1"]["bias"],
            a3, b3, p["Conv_2"]["kernel"][0, 0], p["Conv_2"]["bias"],
            h=h, w=w,
        )
        return out.reshape(n, h, w, cin)
    y = _norm_relu(p["Norm_0"], s["Norm_0"], x)
    y = _conv(p["Conv_0"], y)
    y = _norm_relu(p["Norm_1"], s["Norm_1"], y)
    y = _conv(p["Conv_1"], y)
    y = _norm_relu(p["Norm_2"], s["Norm_2"], y)
    y = _conv(p["Conv_2"], y)
    if cin != features:
        x = _conv(p["Conv_3"], x)
    return x + y


def _upsample2x(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def _hourglass(p, s, x, depth, n_modules, features):
    """Mirror of `hourglass.Hourglass.__call__` creation order."""
    r = 0
    up1 = x
    for _ in range(n_modules):
        up1 = _residual(p[f"Residual_{r}"], s[f"Residual_{r}"], up1, features)
        r += 1
    low = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    for _ in range(n_modules):
        low = _residual(p[f"Residual_{r}"], s[f"Residual_{r}"], low, features)
        r += 1
    if depth > 1:
        low = _hourglass(p["Hourglass_0"], s["Hourglass_0"], low,
                         depth - 1, n_modules, features)
    else:
        for _ in range(n_modules):
            low = _residual(p[f"Residual_{r}"], s[f"Residual_{r}"], low, features)
            r += 1
    for _ in range(n_modules):
        low = _residual(p[f"Residual_{r}"], s[f"Residual_{r}"], low, features)
        r += 1
    return up1 + _upsample2x(low)


def make_fused_apply(net):
    """Returns apply(variables, images_roi [N,H,W,3], prior [N,H/4,W/4,K]) ->
    PkpNetOutput, equivalent to `net.apply(variables, ...)` at inference."""
    assert net.norm == "batch" and net.prior_mode == "post_stem"
    assert net.quant == "off"
    n_stack, n_modules = net.n_stack, net.n_modules
    features, num_kp = net.features, net.num_kp
    dtype = net.dtype

    def apply(variables, images_roi, prior_kp=None):
        p = variables["params"]["HourglassNet_0"]
        s = variables["batch_stats"]["HourglassNet_0"]
        n, h, w, _ = images_roi.shape
        if prior_kp is None:
            prior_kp = jnp.zeros((n, h // 4, w // 4, num_kp), dtype)

        x = images_roi.astype(dtype)
        x = _conv(p["Conv_0"], x, strides=(2, 2),
                  padding=[(3, 3), (3, 3)])
        x = _norm_relu(p["Norm_0"], s["Norm_0"], x)
        x = _residual(p["Residual_0"], s["Residual_0"], x, 128)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
        x = _residual(p["Residual_1"], s["Residual_1"], x, 128)
        x = _residual(p["Residual_2"], s["Residual_2"], x, features)
        x = x + _conv(p["Conv_1"], prior_kp.astype(dtype))

        conv_i = 2
        norm_i = 1
        res_i = 3
        outs = []
        for i in range(n_stack):
            hg = _hourglass(p[f"Hourglass_{i}"], s[f"Hourglass_{i}"], x,
                            4, n_modules, features)
            ll = hg
            for _ in range(n_modules):
                ll = _residual(p[f"Residual_{res_i}"], s[f"Residual_{res_i}"],
                               ll, features)
                res_i += 1
            ll = _conv(p[f"Conv_{conv_i}"], ll)
            conv_i += 1
            ll = _norm_relu(p[f"Norm_{norm_i}"], s[f"Norm_{norm_i}"], ll)
            norm_i += 1
            raw = _conv(p[f"Conv_{conv_i}"], ll.astype(jnp.float32),
                        dtype=jnp.float32)
            conv_i += 1
            outs.append(raw)
            if i < n_stack - 1:
                ll_ = _conv(p[f"Conv_{conv_i}"], ll)
                conv_i += 1
                tmp_ = _conv(p[f"Conv_{conv_i}"], raw.astype(dtype))
                conv_i += 1
                x = x + ll_ + tmp_

        raw = outs[-1]
        prob = hm.spatial_softmax(raw)
        uv, cov = hm.soft_argmax(prob, calc_cov=net.calc_cov)
        pooled = jnp.mean(raw, axis=(1, 2))
        y = jnp.maximum(pooled, 0.0)
        dp = variables["params"]["Dense_0"]
        logits = y @ dp["kernel"] + dp["bias"]
        return PkpNetOutput(
            uv=uv, cov=cov, prob=prob, prob_logits=raw,
            kp_mask_logits=logits, kp_mask=jax.nn.sigmoid(logits),
            aux_logits=tuple(outs[:-1]),
        )

    return apply
