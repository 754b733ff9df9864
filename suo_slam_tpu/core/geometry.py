"""Projective geometry and the NDC conventions of the pipeline.

The whole system operates on keypoint UVs in *bbox-normalized device
coordinates* (NDC): for a pixel (u, v) inside a bbox of size (w, h) anchored
at (x, y),

    ndc_u = 2 * (u - x) / w - 1        (right is +u)
    ndc_v = 1 - 2 * (v - y) / h        (up is +v; note the flip)

This matches the reference's dataset convention (`lib/datasets/bop.py:648-655`)
and `fix_K_for_bbox_ndc` (`lib/utils/utils.py:416-429`), which folds the
crop+normalize into the camera matrix so that projecting a camera-frame point
with the fixed K lands directly in NDC.

NOTE (deliberate deviation): the reference's soft-argmax grid
(`lib/models/pkpnet.py:19-26`) indexes the heatmap so the *row* axis carries
the u coordinate (a transposed readout the network has to learn around). We
use the natural orientation — heatmap columns carry u, rows carry v — which
is strictly easier for a conv net and changes nothing about the external NDC
contract. See `suo_slam_tpu/ops/heatmap.py`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def transform_pts(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply [..., 3/4, 4] pose(s) to [..., N, 3] points (broadcasting).

    Equivalent to the reference `lib/utils/utils.py:454-460`: missing batch
    dims of T are broadcast over the leading dims of pts.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    while R.ndim - 2 < pts.ndim - 1:
        R = R[..., None, :, :]
        t = t[..., None, :]
    return (pts[..., None, :] @ jnp.swapaxes(R, -1, -2))[..., 0, :] + t


def project(K: jax.Array, pts_cam: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Project camera-frame points with a (possibly full) 3x3 K.

    Args:
      K: [..., 3, 3] camera matrix (may contain NDC fix-up / off-diagonals).
      pts_cam: [..., N, 3].
    Returns:
      uv [..., N, 2] and depth z [..., N] (pre-division, row 3 of K @ p).
    """
    uvw = pts_cam @ jnp.swapaxes(K, -1, -2)
    z = uvw[..., 2]
    uv = uvw[..., :2] / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)[..., None]
    return uv, z


def project_k4(cam_k: jax.Array, pts_cam: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Project with diagonal intrinsics cam_k = (fx, fy, cx, cy).

    This is the fast path used inside the BA/PnP kernels (the reference's g2o
    edges use the same 4-vector form, `types_object_slam.cpp:56-58`).
    """
    z = pts_cam[..., 2]
    iz = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = cam_k[..., 0] * pts_cam[..., 0] * iz + cam_k[..., 2]
    v = cam_k[..., 1] * pts_cam[..., 1] * iz + cam_k[..., 3]
    return jnp.stack([u, v], axis=-1), z


def fix_K_for_bbox_ndc(K: jax.Array, bbox: jax.Array) -> jax.Array:
    """Camera matrix projecting camera-frame points into bbox NDC.

    bbox is [..., 4] = (x1, y1, x2, y2). Matches the reference
    `lib/utils/utils.py:416-429` exactly: K' = S @ T @ K with
    T = shift by (-x1, -y1), S = diag(2/w, -2/h) with (-1, +1) offsets.
    Vmappable over leading batch dims.
    """
    x1, y1, x2, y2 = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    w = x2 - x1
    h = y2 - y1
    zeros = jnp.zeros_like(x1)
    ones = jnp.ones_like(x1)
    T = jnp.stack(
        [
            jnp.stack([ones, zeros, -x1], -1),
            jnp.stack([zeros, ones, -y1], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )
    S = jnp.stack(
        [
            jnp.stack([2.0 / w, zeros, -ones], -1),
            jnp.stack([zeros, -2.0 / h, ones], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )
    return S @ T @ K.astype(S.dtype)


def k_to_cam4(K: jax.Array) -> jax.Array:
    """Extract (fx, fy, cx, cy) from a diagonal-form 3x3 K."""
    return jnp.stack([K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2]], axis=-1)


def ndc_to_pixels(uv_ndc: jax.Array, img_hw: tuple[int, int]) -> jax.Array:
    """NDC -> pixel coordinates of an (h, w) image.

    Matches the reference rasterization convention
    (`lib/utils/utils.py:209-212` and `:404-407`):
      x = clip(u) * w/2 + w/2 - 0.5
      y = h - 0.5 - (clip(v) * h/2 + h/2)
    """
    h, w = img_hw
    u = jnp.clip(uv_ndc[..., 0], -1.0, 1.0)
    v = jnp.clip(uv_ndc[..., 1], -1.0, 1.0)
    x = u * (w / 2.0) + (w / 2.0) - 0.5
    y = h - 0.5 - (v * (h / 2.0) + (h / 2.0))
    return jnp.stack([x, y], axis=-1)


def pixels_to_ndc(xy: jax.Array, img_hw: tuple[int, int]) -> jax.Array:
    """Inverse of `ndc_to_pixels` (without the clip)."""
    h, w = img_hw
    u = (xy[..., 0] + 0.5 - w / 2.0) / (w / 2.0)
    v = (h - 0.5 - xy[..., 1] - h / 2.0) / (h / 2.0)
    return jnp.stack([u, v], axis=-1)


def normalize_image_points(K: jax.Array, uv: jax.Array) -> jax.Array:
    """Pixel/NDC uv -> pinhole-normalized image coordinates (K^-1 applied).

    Matches the reference PnP wrapper (`lib/object_slam.py:34-36`):
    points_2d @ inv(K).T taking the first two columns. Supports full 3x3 K.
    """
    Kinv = jnp.linalg.inv(K)
    uv1 = jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)
    xyw = uv1 @ jnp.swapaxes(Kinv, -1, -2)
    return xyw[..., :2] / xyw[..., 2:3]


def bbox_xywh_to_xyxy(b: jax.Array) -> jax.Array:
    x, y, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([x, y, x + w, y + h], axis=-1)


def homography_ndc_to_full(K_full: jax.Array, K_bbox: jax.Array) -> jax.Array:
    """H = K_full @ inv(K_bbox): maps bbox-NDC uv to full-image pixels.

    Used for visualization / result collection (reference
    `lib/object_slam.py:234-235`). Apply as uv @ H[:2,:2].T + H[:2,2].
    """
    return K_full @ jnp.linalg.inv(K_bbox)


def apply_homography_2d(H: jax.Array, uv: jax.Array) -> jax.Array:
    """Affine-apply the top 2x3 of H to [..., 2] points (reference
    right-multiply form `uv @ H.T[:2,:2] + H.T[2:3,:2]`)."""
    return uv @ jnp.swapaxes(H[..., :2, :2], -1, -2) + H[..., None, :2, 2]
