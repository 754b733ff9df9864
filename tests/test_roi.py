"""Tests for the batched ROI crop front-end."""

import jax
import numpy as np
import jax.numpy as jnp

from suo_slam_tpu.ops import roi


def test_identity_crop_recovers_image():
    h = w = 16
    img = jnp.arange(h * w * 3, dtype=jnp.float32).reshape(h, w, 3) / (h * w * 3)
    # With the aligned=False convention, bin centers land on integer pixel
    # centers when the box is offset by -0.5 (the usual half-pixel shift).
    box = jnp.asarray([-0.5, -0.5, w - 0.5, h - 0.5])
    out = roi.roi_crop(img, box, (h, w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_crop_of_linear_ramp_is_exact():
    # Bilinear sampling of a linear function is exact regardless of box
    h = w = 32
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    img = jnp.asarray((2.0 * xs + 3.0 * ys)[..., None])
    box = jnp.asarray([4.0, 6.0, 20.0, 30.0])
    oh, ow = 8, 8
    out = roi.roi_crop(img, box, (oh, ow))
    bw = (20.0 - 4.0) / ow
    bh = (30.0 - 6.0) / oh
    xc = 4.0 + (np.arange(ow) + 0.5) * bw
    yc = 6.0 + (np.arange(oh) + 0.5) * bh
    # img[i, j] = 2j + 3i with pixel center (i, j) at coordinate (x=j, y=i),
    # and bilinear interpolation is exact on a linear ramp.
    expect = 2.0 * xc[None, :] + 3.0 * yc[:, None]
    np.testing.assert_allclose(np.asarray(out[..., 0]), expect, atol=1e-4)


def _gather_bilinear_oracle(img, box, out_hw):
    """The pre-round-5 gather formulation as a numpy oracle: one bilinear
    tap per output-bin center with border-clamped indices. The matmul
    rewrite (`ops/roi.py`) must reproduce this exactly (to float rounding),
    including boxes that leave the image."""
    oh, ow = out_hw
    h, w, _ = img.shape
    x1, y1, x2, y2 = box
    xs = x1 + (np.arange(ow) + 0.5) * (x2 - x1) / ow
    ys = y1 + (np.arange(oh) + 0.5) * (y2 - y1) / oh
    x0 = np.floor(xs)
    y0 = np.floor(ys)
    wx = (xs - x0)[None, :, None]
    wy = (ys - y0)[:, None, None]
    x0i = np.clip(x0.astype(int), 0, w - 1)
    x1i = np.clip(x0i + 1, 0, w - 1)
    y0i = np.clip(y0.astype(int), 0, h - 1)
    y1i = np.clip(y0i + 1, 0, h - 1)
    top = img[y0i][:, x0i] * (1 - wx) + img[y0i][:, x1i] * wx
    bot = img[y1i][:, x0i] * (1 - wx) + img[y1i][:, x1i] * wx
    return top * (1 - wy) + bot * wy


def test_matmul_matches_gather_oracle():
    rng = np.random.default_rng(7)
    img = rng.uniform(size=(37, 53, 3)).astype(np.float32)
    boxes = [
        [5.0, 8.0, 40.0, 30.0],  # interior
        [0.0, 0.0, 53.0, 37.0],  # full image
        [10.25, 4.75, 11.5, 6.25],  # sub-pixel-scale box (upsampling)
    ]
    for box in boxes:
        got = np.asarray(roi.roi_crop(jnp.asarray(img), jnp.asarray(box), (16, 12)))
        want = _gather_bilinear_oracle(img, box, (16, 12))
        np.testing.assert_allclose(got, want, atol=2e-6, err_msg=str(box))


def test_out_of_bounds_box_replicates_border():
    """Samples outside the image take the border value (replicate padding).

    The pre-round-5 gather formulation clamped indices AFTER the floor,
    which blended the two edge pixels with the original fractional weight
    for coords in (-1, 0) — a discontinuity at the border, not replication.
    The matmul form clamps the sample coordinate itself; on a coordinate
    ramp image the result is then exactly clip(x, 0, w-1)."""
    h, w = 9, 11
    ramp_x = np.broadcast_to(
        np.arange(w, dtype=np.float32)[None, :, None], (h, w, 1)).copy()
    ramp_y = np.broadcast_to(
        np.arange(h, dtype=np.float32)[:, None, None], (h, w, 1)).copy()
    box = jnp.asarray([-4.0, -3.0, w + 5.0, h + 4.0])
    oh, ow = 10, 8
    xs = -4.0 + (np.arange(ow) + 0.5) * (w + 9.0) / ow
    ys = -3.0 + (np.arange(oh) + 0.5) * (h + 7.0) / oh
    out_x = np.asarray(roi.roi_crop(jnp.asarray(ramp_x), box, (oh, ow)))
    out_y = np.asarray(roi.roi_crop(jnp.asarray(ramp_y), box, (oh, ow)))
    np.testing.assert_allclose(
        out_x[..., 0], np.broadcast_to(np.clip(xs, 0, w - 1)[None, :], (oh, ow)),
        atol=1e-5)
    np.testing.assert_allclose(
        out_y[..., 0], np.broadcast_to(np.clip(ys, 0, h - 1)[:, None], (oh, ow)),
        atol=1e-5)


def test_nan_padding_boxes_cannot_poison_masked_output():
    imgs = jnp.ones((1, 16, 16, 3))
    boxes = jnp.asarray([[[2.0, 2.0, 12.0, 12.0],
                          [np.nan, np.nan, np.nan, np.nan]]])
    mask = jnp.asarray([[True, False]])
    out = np.asarray(roi.roi_crop_batch(imgs, boxes, mask, out_hw=(8, 8)))
    assert np.isfinite(out).all()
    assert out[0, 1].max() == 0.0
    assert out[0, 0].min() > 0.99


def test_grad_matches_finite_differences():
    # The backward is now transposed matmuls; check it against FD on a
    # small problem (sum-of-squares loss, a handful of probe pixels).
    rng = np.random.default_rng(3)
    img = rng.uniform(size=(12, 14, 1)).astype(np.float32)
    box = jnp.asarray([1.5, 2.25, 11.0, 9.5])

    def loss(im):
        return jnp.sum(roi.roi_crop(im, box, (6, 6)) ** 2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(img)))
    eps = 1e-3
    for (i, j) in [(3, 4), (0, 0), (11, 13), (6, 9)]:
        d = np.zeros_like(img)
        d[i, j, 0] = eps
        fd = (float(loss(jnp.asarray(img + d))) - float(loss(jnp.asarray(img - d)))) / (2 * eps)
        np.testing.assert_allclose(g[i, j, 0], fd, rtol=2e-2, atol=2e-3)


def test_batch_masking_zeroes_padded_slots():
    imgs = jnp.ones((2, 16, 16, 3))
    boxes = jnp.tile(jnp.asarray([0.0, 0.0, 16.0, 16.0]), (2, 3, 1))
    mask = jnp.asarray([[True, True, False], [True, False, False]])
    out = roi.roi_crop_batch(imgs, boxes, mask, out_hw=(8, 8))
    assert out.shape == (2, 3, 8, 8, 3)
    assert float(jnp.sum(out[0, 2])) == 0.0
    assert float(jnp.sum(out[1, 1])) == 0.0
    assert float(jnp.min(out[0, 0])) == 1.0
