"""Training losses for PkpNet: MLE (Mahalanobis + logdet), variance, BCE.

Mask-safe rebuild of the reference losses (`lib/utils/utils.py:87-179`,
annealing weights from `train.py:70-84`). The reference boolean-indexes the
valid keypoints (`uv[mask]`), which is a dynamic shape; here every term is a
masked mean over the padded [N, K] layout so the whole loss jits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import heatmap as hm


def _masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def mle_loss(
    uv_pred: jax.Array, uv_gt: jax.Array, cov: jax.Array, mask: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Gaussian MLE: (Mahalanobis residual mean, logdet(cov) mean).

    Matches `mle_loss` (`utils.py:110-143`) including the 1e-6 diagonal
    loading; the 2x2 inverse is closed-form instead of `torch.inverse`.
    """
    res = uv_gt - uv_pred  # [..., 2]
    a = cov[..., 0, 0] + 1e-6
    d = cov[..., 1, 1] + 1e-6
    b = cov[..., 0, 1]
    det = jnp.maximum(a * d - b * b, 1e-12)
    # res^T cov^-1 res with closed-form 2x2 inverse
    ru, rv = res[..., 0], res[..., 1]
    maha = (d * ru * ru - 2.0 * b * ru * rv + a * rv * rv) / det
    return _masked_mean(maha, mask), _masked_mean(jnp.log(det), mask)


def l2_variance_loss(
    uv_pred: jax.Array, uv_gt: jax.Array, prob: jax.Array, mask: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """No-covariance fallback: L2 on uv + heatmap variance minimization
    (`utils.py:87-108,165-171`)."""
    res = uv_gt - uv_pred
    uv_l = _masked_mean(jnp.sum(res * res, -1), mask)
    var = hm.heatmap_variance(prob, uv_pred)  # [N, K]
    return uv_l, _masked_mean(var, mask)


def bce_with_logits(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Stable elementwise binary cross-entropy from logits."""
    return jnp.maximum(logits, 0.0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def kp_loss(
    uv: jax.Array,
    cov: jax.Array | None,
    prob: jax.Array,
    kp_mask_logits: jax.Array,
    uv_gt: jax.Array,
    mask: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(uv_loss, var_loss, mask_bce_loss), all scalars (`utils.py:154-179`).

    mask: [N, K] bool — which keypoint channels are labeled for each object.
    The BCE trains the validity head against this mask over ALL channels
    (not masked — that's the label), using logits for stability (the
    reference sigmoid-then-BCEs, `utils.py:174-177`).
    """
    if cov is not None:
        uv_l, var_l = mle_loss(uv, uv_gt, cov, mask)
    else:
        uv_l, var_l = l2_variance_loss(uv, uv_gt, prob, mask)
    bce = jnp.mean(bce_with_logits(kp_mask_logits, mask.astype(jnp.float32)))
    any_valid = jnp.sum(mask) > 0
    zero = jnp.zeros((), uv_l.dtype)
    return (
        jnp.where(any_valid, uv_l, zero),
        jnp.where(any_valid, var_l, zero),
        jnp.where(any_valid, bce, zero),
    )


def anneal_weights(epoch: jax.Array | float) -> tuple[jax.Array, jax.Array]:
    """(var_lambda, mask_lambda) = sigmoid(epoch-5), sigmoid(epoch-10)
    (`train.py:70-84`)."""
    e = jnp.asarray(epoch, jnp.float32)
    return jax.nn.sigmoid(e - 5.0), jax.nn.sigmoid(e - 10.0)


def total_loss(
    uv: jax.Array,
    cov: jax.Array | None,
    prob: jax.Array,
    kp_mask_logits: jax.Array,
    uv_gt: jax.Array,
    mask: jax.Array,
    epoch: jax.Array | float,
    do_anneal: bool = True,
) -> tuple[jax.Array, dict]:
    """Combined training objective: uv + 0.5*var_l*var + mask_l*bce
    (`train.py:70-87`)."""
    uv_l, var_l, bce_l = kp_loss(uv, cov, prob, kp_mask_logits, uv_gt, mask)
    if do_anneal:
        var_w, mask_w = anneal_weights(epoch)
    else:
        var_w = mask_w = jnp.asarray(1.0, jnp.float32)
    loss = uv_l + 0.5 * var_w * var_l + mask_w * bce_l
    aux = {
        "uv_loss": uv_l,
        "var_loss": var_l,
        "mask_loss": bce_l,
        "var_lambda": var_w,
        "mask_lambda": mask_w,
    }
    return loss, aux
