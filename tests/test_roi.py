"""Tests for the batched ROI crop front-end."""

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


def test_batch_masking_zeroes_padded_slots():
    imgs = jnp.ones((2, 16, 16, 3))
    boxes = jnp.tile(jnp.asarray([0.0, 0.0, 16.0, 16.0]), (2, 3, 1))
    mask = jnp.asarray([[True, True, False], [True, False, False]])
    out = roi.roi_crop_batch(imgs, boxes, mask, out_hw=(8, 8))
    assert out.shape == (2, 3, 8, 8, 3)
    assert float(jnp.sum(out[0, 2])) == 0.0
    assert float(jnp.sum(out[1, 1])) == 0.0
    assert float(jnp.min(out[0, 0])) == 1.0
