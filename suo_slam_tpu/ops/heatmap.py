"""Heatmap readout and prior-keypoint rendering, fully on device.

TPU-native replacement for the reference's heatmap post-processing
(`lib/models/pkpnet.py:13-63` spatial_softmax / post_process_kp) and the
host-side prior rasterization (`lib/utils/utils.py:364-411`
draw_gaussian_2d / make_prior_kp_input, called from `lib/datasets/bop.py:709`
and `lib/object_slam.py:513`).

Layout: heatmaps are NHWC — [N, H, W, K] with K the 41-channel keypoint
vocabulary. The readout grid uses the *natural* orientation (columns carry u,
rows carry v, v up) rather than the reference's transposed meshgrid
(`pkpnet.py:19-26`); see the note in `core/geometry.py`. The NDC values at
pixel centers match `core.geometry.pixels_to_ndc` exactly.

The soft-argmax mean and covariance are computed in ONE pass as five moments
(u, v, u^2, v^2, uv) contracted against the probability map with a single
[N*K, HW] x [HW, 5] matmul that XLA tiles onto the MXU — instead of the
reference's two-pass mean-then-residual-outer-product reduction
(`pkpnet.py:44-57`), which materializes a [N, K, H, W, 2, 2] tensor.
cov = E[pp^T] - mu mu^T is algebraically identical.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Effective sigma of the reference's prior Gaussian: draw_gaussian_2d uses
# cv2.GaussianBlur(ksize=2*ceil(3*15)+1=91, sigma=0) whose derived sigma is
# 0.3*((91-1)*0.5 - 1) + 0.8 = 14.0 pixels (`lib/utils/utils.py:364-368`).
PRIOR_SIGMA_PX = 14.0
PRIOR_SIGMA_REF_H = 256  # sigma above is defined at this map height


def prior_sigma_for(hw: tuple[int, int]) -> float:
    """Scale the reference prior sigma to another map resolution (the prior
    is a fixed fraction ~5.5% of the ROI span)."""
    return PRIOR_SIGMA_PX * hw[0] / PRIOR_SIGMA_REF_H


def ndc_grid(h: int, w: int, dtype=jnp.float32) -> tuple[jax.Array, jax.Array]:
    """(u, v) NDC value of every pixel center; each [h, w].

    u increases along columns (right), v decreases along rows (up = +v),
    matching `core.geometry.pixels_to_ndc`.
    """
    ru = (jnp.arange(w, dtype=dtype) + 0.5) / (w / 2.0) - 1.0
    rv = 1.0 - (jnp.arange(h, dtype=dtype) + 0.5) / (h / 2.0)
    u = jnp.broadcast_to(ru[None, :], (h, w))
    v = jnp.broadcast_to(rv[:, None], (h, w))
    return u, v


def spatial_softmax(logits: jax.Array) -> jax.Array:
    """Per-channel softmax over the spatial dims of [..., H, W, K]."""
    h, w, k = logits.shape[-3:]
    flat = logits.reshape(logits.shape[:-3] + (h * w, k))
    prob = jax.nn.softmax(flat, axis=-2)
    return prob.reshape(logits.shape)


def soft_argmax_from_logits(
    logits: jax.Array, calc_cov: bool = True, min_var: float = 1e-6
) -> tuple[jax.Array, jax.Array | None, jax.Array]:
    """Softmax + soft-argmax readout in one moment contraction.

    Equivalent to `soft_argmax(spatial_softmax(logits))` but folds the
    softmax normalizer into the moment matmul as a ones-column: the
    unnormalized exp map feeds a single [HW, 6] contraction and the
    probabilities are only materialized if the caller actually uses the
    returned `prob` (XLA dead-code-eliminates it otherwise). Saves two full
    passes over the [N, H, W, K] map vs the two-step form (device trace).

    Returns (uv [..., K, 2], cov [..., K, 2, 2] | None, prob like logits).
    """
    h, w, k = logits.shape[-3:]
    flat = logits.reshape(logits.shape[:-3] + (h * w, k))
    # Logits may arrive in bf16 (the int8 engine's storage dtype); the
    # moment features and contraction stay f32 — bf16 NDC grid coords would
    # bias uv by ~4e-3 and the E[x^2]-E[x]^2 cancellation needs full f32
    # (see the precision note in `soft_argmax` below).
    shift = jax.lax.stop_gradient(jnp.max(flat, axis=-2, keepdims=True))
    e = jnp.exp((flat - shift).astype(jnp.float32))
    u, v = ndc_grid(h, w, jnp.float32)
    ones = jnp.ones_like(u)
    feats = jnp.stack([ones, u, v, u * u, v * v, u * v], axis=-1).reshape(h * w, 6)
    m = jnp.einsum("...pk,pf->...kf", e, feats,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    z = jnp.maximum(m[..., :1], jnp.finfo(jnp.float32).tiny)  # [..., K, 1]
    m = m[..., 1:] / z
    prob = (e / z[..., 0][..., None, :]).astype(logits.dtype).reshape(logits.shape)
    mu = m[..., :2]
    if not calc_cov:
        return mu, None, prob
    eu, ev, euu, evv, euv = m[..., 0], m[..., 1], m[..., 2], m[..., 3], m[..., 4]
    cuu = euu - eu * eu + min_var
    cvv = evv - ev * ev + min_var
    cuv = euv - eu * ev
    cov = jnp.stack(
        [jnp.stack([cuu, cuv], -1), jnp.stack([cuv, cvv], -1)], axis=-2
    )
    return mu, cov, prob


def soft_argmax(
    prob: jax.Array, calc_cov: bool = True, min_var: float = 1e-6
) -> tuple[jax.Array, jax.Array | None]:
    """Expected UV (and 2x2 covariance) of [..., H, W, K] probability maps.

    Returns:
      uv: [..., K, 2] in NDC.
      cov: [..., K, 2, 2] or None. A floor of `min_var` is added on the
        diagonal (the reference adds 1e-6 in the loss, `utils.py:119-121`,
        and the SLAM engine floors eigenvalues downstream).
    """
    h, w, k = prob.shape[-3:]
    dtype = prob.dtype
    u, v = ndc_grid(h, w, dtype)
    # Moment features: [HW, 5] = (u, v, uu, vv, uv)
    feats = jnp.stack([u, v, u * u, v * v, u * v], axis=-1).reshape(h * w, 5)
    flat = prob.reshape(prob.shape[:-3] + (h * w, k))
    # HIGHEST precision: on TPU the default f32 einsum truncates operands to
    # bf16 on the MXU; the E[x^2] - E[x]^2 cancellation then yields
    # covariances that are indefinite at the ~1e-3 level once heatmaps
    # sharpen, the Mahalanobis MLE loss turns negative, and training
    # diverges (observed on v5e at full size; CPU tests never see it).
    m = jnp.einsum("...pk,pf->...kf", flat, feats,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST).astype(dtype)
    mu = m[..., :2]
    if not calc_cov:
        return mu, None
    eu, ev, euu, evv, euv = m[..., 0], m[..., 1], m[..., 2], m[..., 3], m[..., 4]
    cuu = euu - eu * eu + min_var
    cvv = evv - ev * ev + min_var
    cuv = euv - eu * ev
    cov = jnp.stack(
        [jnp.stack([cuu, cuv], -1), jnp.stack([cuv, cvv], -1)], axis=-2
    )
    return mu, cov


def heatmap_variance(prob: jax.Array, uv: jax.Array) -> jax.Array:
    """E[|p - uv|^2] per channel: [..., H, W, K], [..., K, 2] -> [..., K].

    The spread term of the reference's `variance_loss` (`utils.py:87-108`).
    """
    h, w, k = prob.shape[-3:]
    u, v = ndc_grid(h, w, prob.dtype)
    feats = jnp.stack([jnp.ones_like(u), u, v, u * u + v * v], -1).reshape(h * w, 4)
    flat = prob.reshape(prob.shape[:-3] + (h * w, k))
    m = jnp.einsum("...pk,pf->...kf", flat, feats,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST).astype(prob.dtype)
    # E[|p|^2] - 2 uv . E[p] + |uv|^2 E[1]   (E[1]=1 for softmaxed prob)
    return (
        m[..., 3]
        - 2.0 * (uv[..., 0] * m[..., 1] + uv[..., 1] * m[..., 2])
        + jnp.sum(uv * uv, -1) * m[..., 0]
    )


@partial(jax.jit, static_argnames=("hw",))
def render_prior_heatmaps(
    uv: jax.Array,
    mask: jax.Array,
    hw: tuple[int, int] = (256, 256),
    sigma_px: float | jax.Array = PRIOR_SIGMA_PX,
) -> jax.Array:
    """Render prior-keypoint Gaussians on device: [..., K, 2] -> [..., H, W, K].

    Replaces `make_prior_kp_input` + `draw_gaussian_2d`
    (`lib/utils/utils.py:364-411`): each valid keypoint becomes an isotropic
    Gaussian with peak value 1 at its (clipped) NDC location. The reference
    rounds the peak to the nearest pixel and uses a discrete blur; we evaluate
    the continuous Gaussian, which is the same function up to sub-pixel
    placement.

    Args:
      uv: [..., K, 2] prior keypoint NDC coords (non-finite values allowed —
        treated as invalid like `utils.py:402`).
      mask: [..., K] bool validity.
      hw: output (height, width).
      sigma_px: Gaussian sigma in *pixels* of the output map.
    """
    h, w = hw
    dtype = jnp.float32
    u, v = ndc_grid(h, w, dtype)
    finite = jnp.all(jnp.isfinite(uv), axis=-1)
    uvc = jnp.clip(jnp.nan_to_num(uv), -1.0, 1.0)
    # sigma in NDC units (u spans 2 over w pixels)
    su = jnp.asarray(sigma_px, dtype) / (w / 2.0)
    sv = jnp.asarray(sigma_px, dtype) / (h / 2.0)
    du = (u[..., None] - uvc[..., None, None, :, 0]) / su  # [..., H, W, K]
    dv = (v[..., None] - uvc[..., None, None, :, 1]) / sv
    g = jnp.exp(-0.5 * (du * du + dv * dv))
    valid = (mask & finite).astype(dtype)[..., None, None, :]  # [..., 1, 1, K]
    return g * valid


def max_merge_priors(a: jax.Array, b: jax.Array) -> jax.Array:
    """Merge two prior maps (element-wise max keeps peak-1 semantics)."""
    return jnp.maximum(a, b)
