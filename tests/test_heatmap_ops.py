"""Tests for heatmap readout ops: soft-argmax mean/cov, prior rendering."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from suo_slam_tpu.ops import heatmap as hm
from suo_slam_tpu.core import geometry


def _gauss_heatmap(h, w, mu_px, sigma_px):
    ys, xs = np.mgrid[0:h, 0:w]
    g = np.exp(-(((xs - mu_px[0]) ** 2) + ((ys - mu_px[1]) ** 2)) / (2 * sigma_px**2))
    return g / g.sum()


def test_ndc_grid_matches_pixels_to_ndc():
    h, w = 64, 64
    u, v = hm.ndc_grid(h, w)
    ys, xs = np.mgrid[0:h, 0:w]
    xy = jnp.stack([jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32)], -1)
    uv_ref = geometry.pixels_to_ndc(xy, (h, w))
    np.testing.assert_allclose(np.asarray(u), np.asarray(uv_ref[..., 0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(uv_ref[..., 1]), atol=1e-6)


def test_spatial_softmax_normalizes():
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (2, 8, 8, 5))
    prob = hm.spatial_softmax(logits)
    sums = jnp.sum(prob, axis=(1, 2))
    np.testing.assert_allclose(np.asarray(sums), 1.0, atol=1e-6)


def test_soft_argmax_recovers_gaussian_mean_and_cov():
    h = w = 64
    mu_px = (40.0, 20.0)  # x, y
    sigma_px = 3.0
    g = _gauss_heatmap(h, w, mu_px, sigma_px)
    prob = jnp.asarray(g, jnp.float32)[None, :, :, None]
    uv, cov = hm.soft_argmax(prob)
    # expected NDC mean from the pixel-space mean
    uv_ref = geometry.pixels_to_ndc(jnp.asarray(mu_px, jnp.float32), (h, w))
    np.testing.assert_allclose(np.asarray(uv[0, 0]), np.asarray(uv_ref), atol=2e-3)
    # isotropic Gaussian: cov = (sigma_px / (w/2))^2 I in NDC
    sig_ndc2 = (sigma_px / (w / 2.0)) ** 2
    np.testing.assert_allclose(np.asarray(cov[0, 0, 0, 0]), sig_ndc2, rtol=0.05)
    np.testing.assert_allclose(np.asarray(cov[0, 0, 1, 1]), sig_ndc2, rtol=0.05)
    assert abs(float(cov[0, 0, 0, 1])) < 1e-4


def test_soft_argmax_cov_matches_two_pass_reference():
    """Single-pass moment cov == explicit E[(p-mu)(p-mu)^T] (the reference
    formulation, `lib/models/pkpnet.py:44-57`)."""
    key = jax.random.PRNGKey(1)
    logits = jax.random.normal(key, (3, 16, 16, 4), jnp.float64)
    prob = hm.spatial_softmax(logits)
    uv, cov = hm.soft_argmax(prob, min_var=0.0)
    u, v = hm.ndc_grid(16, 16, jnp.float64)
    p = jnp.stack([u, v], -1)  # [H, W, 2]
    res = p[None, :, :, None, :] - uv[:, None, None, :, :]  # [N,H,W,K,2]
    outer = res[..., :, None] * res[..., None, :]
    cov_ref = jnp.sum(prob[..., None, None] * outer, axis=(1, 2))
    np.testing.assert_allclose(np.asarray(cov), np.asarray(cov_ref), atol=1e-10)


def test_heatmap_variance_matches_direct():
    key = jax.random.PRNGKey(2)
    logits = jax.random.normal(key, (2, 16, 16, 3), jnp.float64)
    prob = hm.spatial_softmax(logits)
    uv, _ = hm.soft_argmax(prob, calc_cov=False)
    var = hm.heatmap_variance(prob, uv)
    u, v = hm.ndc_grid(16, 16, jnp.float64)
    p = jnp.stack([u, v], -1)
    d2 = jnp.sum((p[None, :, :, None, :] - uv[:, None, None, :, :]) ** 2, -1)
    var_ref = jnp.sum(prob * d2, axis=(1, 2))
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref), atol=1e-10)


def test_render_prior_heatmaps_peak_location_and_mask():
    uv = jnp.asarray([[[0.25, -0.5], [0.0, 0.0]]], jnp.float32)  # [1, 2, 2]
    mask = jnp.asarray([[True, False]])
    out = hm.render_prior_heatmaps(uv, mask, hw=(64, 64), sigma_px=3.0)
    assert out.shape == (1, 64, 64, 2)
    # masked channel is identically zero
    assert float(jnp.max(out[..., 1])) == 0.0
    # peak of channel 0 is at the pixel nearest the NDC point, with value ~1
    idx = jnp.argmax(out[0, :, :, 0])
    py, px = np.unravel_index(int(idx), (64, 64))
    xy = geometry.ndc_to_pixels(uv[0, 0], (64, 64))
    assert abs(px - float(xy[0])) <= 0.5 + 1e-6
    assert abs(py - float(xy[1])) <= 0.5 + 1e-6
    assert float(jnp.max(out[..., 0])) == pytest.approx(1.0, abs=0.05)


def test_render_prior_nonfinite_uv_is_ignored():
    uv = jnp.asarray([[[jnp.nan, 0.1]]], jnp.float32)
    mask = jnp.asarray([[True]])
    out = hm.render_prior_heatmaps(uv, mask, hw=(32, 32))
    assert float(jnp.max(out)) == 0.0


def test_soft_argmax_from_logits_matches_two_step():
    """The fused logits readout must reproduce spatial_softmax + soft_argmax
    (it folds the normalizer into the moment contraction as a ones-column)."""
    key = jax.random.PRNGKey(7)
    logits = 4.0 * jax.random.normal(key, (3, 16, 16, 5))
    uv_f, cov_f, prob_f = hm.soft_argmax_from_logits(logits)
    prob = hm.spatial_softmax(logits)
    uv, cov = hm.soft_argmax(prob)
    np.testing.assert_allclose(np.asarray(prob_f), np.asarray(prob), atol=1e-6)
    np.testing.assert_allclose(np.asarray(uv_f), np.asarray(uv), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cov_f), np.asarray(cov), atol=1e-5)


def test_soft_argmax_from_logits_bf16_precision():
    """bf16 logits (the int8 engine's storage dtype) must not cost uv
    precision: the moment features/contraction are f32 internally. A sharp
    gaussian heatmap is the adversarial case."""
    h = w = 64
    g = _gauss_heatmap(h, w, (40.0, 20.0), 2.0)
    logits = np.log(np.maximum(g, 1e-30))[None, :, :, None]
    uv32, cov32, _ = hm.soft_argmax_from_logits(jnp.asarray(logits, jnp.float32))
    uv16, cov16, _ = hm.soft_argmax_from_logits(jnp.asarray(logits, jnp.bfloat16))
    assert uv32.dtype == jnp.float32 and uv16.dtype == jnp.float32
    # bf16 rounding of the LOGITS perturbs the softmax slightly; the readout
    # itself must not add grid-coordinate bias (would be ~4e-3 NDC if the
    # grid were bf16)
    np.testing.assert_allclose(np.asarray(uv16), np.asarray(uv32), atol=2e-4)
    np.testing.assert_allclose(np.asarray(cov16), np.asarray(cov32), atol=2e-4)
