"""Batched ROI crop-and-resize on device.

TPU-native replacement for the `torchvision.ops.roi_align` front-end of the
reference model (`lib/models/pkpnet.py:93`): variable-count per-image boxes
become a fixed-capacity padded [B, O_max, 4] array with a validity mask, and
every ROI is resampled to a dense [B, O_max, out_h, out_w, C] batch in one
gather-based bilinear kernel that XLA fuses.

Sampling convention: one bilinear sample at each output-bin center,
x = x1 + (j + 0.5) * bin_w, with integer pixel centers (torchvision
roi_align `aligned=False`). The reference's adaptive multi-sample averaging
(sampling_ratio=-1) is deliberately not replicated: for this pipeline the ROI
(typically 80-400 px) is resampled to 256x256, where the bin is <= ~1.6
source pixels and one center tap is within the bilinear noise floor — and a
single static gather keeps the op a pure XLA fusion.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear_sample(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Sample img [H, W, C] at continuous pixel-center coords x, y [h, w].

    Out-of-bounds taps clamp to the border (torchvision clamps the low side
    and zero-pads the high side; for ROI boxes inside the image this never
    triggers, and clamping is friendlier for gradients).
    """
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def roi_crop(
    img: jax.Array, box: jax.Array, out_hw: tuple[int, int]
) -> jax.Array:
    """Crop-and-resize one box from one image. img [H, W, C], box (x1,y1,x2,y2).

    Returns [out_h, out_w, C].
    """
    oh, ow = out_hw
    dtype = img.dtype
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    bw = (x2 - x1) / ow
    bh = (y2 - y1) / oh
    xs = x1 + (jnp.arange(ow, dtype=dtype) + 0.5) * bw
    ys = y1 + (jnp.arange(oh, dtype=dtype) + 0.5) * bh
    x = jnp.broadcast_to(xs[None, :], (oh, ow))
    y = jnp.broadcast_to(ys[:, None], (oh, ow))
    return _bilinear_sample(img, x, y)


@partial(jax.jit, static_argnames=("out_hw",))
def roi_crop_batch(
    images: jax.Array,
    boxes: jax.Array,
    box_mask: jax.Array,
    out_hw: tuple[int, int] = (256, 256),
) -> jax.Array:
    """Padded batched ROI extraction.

    Args:
      images: [B, H, W, C].
      boxes: [B, O, 4] (x1, y1, x2, y2) pixel coords; padding rows arbitrary.
      box_mask: [B, O] bool — which box slots are real.
    Returns:
      [B, O, out_h, out_w, C]; masked slots are zero.
    """
    crops = jax.vmap(  # over batch
        jax.vmap(roi_crop, in_axes=(None, 0, None)), in_axes=(0, 0, None)
    )(images, boxes, out_hw)
    return crops * box_mask[..., None, None, None].astype(crops.dtype)
