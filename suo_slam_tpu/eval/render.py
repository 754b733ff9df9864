"""Z-buffer depth rasterizer (host numpy, eval tier).

Replaces the vendored bop_toolkit OpenGL/glumpy renderer for the purposes of
VSD evaluation and keypoint labeling (`thirdparty/bop_toolkit/bop_toolkit_lib/
renderer_py.py` in the reference — used by `scripts/eval_siso.py` and
`manual_keypoints.py`). Depth-only, vectorized per triangle over its pixel
bbox with perspective-correct interpolation; no GL / GPU dependency.

BOP convention: depth images hold the camera-frame z coordinate (mm), not ray
length.
"""

from __future__ import annotations

import numpy as np


def render_depth(
    verts: np.ndarray,
    faces: np.ndarray,
    K: np.ndarray,
    T_OtoC: np.ndarray,
    hw: tuple[int, int],
    near: float = 10.0,
) -> np.ndarray:
    """Render the depth map of one mesh under pose T_OtoC.

    Args:
      verts: [V, 3] object-frame vertices (mm).
      faces: [F, 3] int triangle indices.
      K: [3, 3] intrinsics. T_OtoC: [3/4, 4]. hw: (height, width).
    Returns:
      [H, W] f32 depth (camera z, mm); 0 where no surface.
    """
    h, w = hw
    depth = np.zeros((h, w), np.float32)
    if faces is None or len(faces) == 0 or len(verts) == 0:
        return depth
    R, t = np.asarray(T_OtoC)[:3, :3], np.asarray(T_OtoC)[:3, 3]
    p_cam = verts @ R.T + t  # [V, 3]
    z = p_cam[:, 2]
    uvw = p_cam @ np.asarray(K).T
    safe = np.where(np.abs(uvw[:, 2]) < 1e-9, 1e-9, uvw[:, 2])
    uv = uvw[:, :2] / safe[:, None]

    tri_uv = uv[faces]        # [F, 3, 2]
    tri_z = z[faces]          # [F, 3]
    # cull triangles fully behind the near plane or outside the image
    ok = np.all(tri_z > near, axis=1)
    ok &= np.any(tri_uv[..., 0] < w, axis=1) & np.any(tri_uv[..., 0] >= 0, axis=1)
    ok &= np.any(tri_uv[..., 1] < h, axis=1) & np.any(tri_uv[..., 1] >= 0, axis=1)
    zbuf = np.full((h, w), np.inf, np.float32)

    for f_uv, f_z in zip(tri_uv[ok], tri_z[ok]):
        x0 = max(0, int(np.floor(f_uv[:, 0].min())))
        x1 = min(w - 1, int(np.ceil(f_uv[:, 0].max())))
        y0 = max(0, int(np.floor(f_uv[:, 1].min())))
        y1 = min(h - 1, int(np.ceil(f_uv[:, 1].max())))
        if x1 < x0 or y1 < y0:
            continue
        xs = np.arange(x0, x1 + 1) + 0.5
        ys = np.arange(y0, y1 + 1) + 0.5
        px, py = np.meshgrid(xs, ys)
        a, b, c = f_uv[0], f_uv[1], f_uv[2]
        det = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        if abs(det) < 1e-12:
            continue
        l1 = ((px - a[0]) * (c[1] - a[1]) - (py - a[1]) * (c[0] - a[0])) / det
        l2 = -((px - a[0]) * (b[1] - a[1]) - (py - a[1]) * (b[0] - a[0])) / det
        l0 = 1.0 - l1 - l2
        inside = (l0 >= -1e-9) & (l1 >= -1e-9) & (l2 >= -1e-9)
        if not inside.any():
            continue
        # perspective-correct depth: interpolate 1/z
        iz = l0 / f_z[0] + l1 / f_z[1] + l2 / f_z[2]
        zpix = np.where(iz > 1e-12, 1.0 / np.maximum(iz, 1e-12), np.inf)
        zpix = np.where(inside, zpix, np.inf).astype(np.float32)
        sub = zbuf[y0 : y1 + 1, x0 : x1 + 1]
        np.minimum(sub, zpix, out=sub)

    hit = np.isfinite(zbuf)
    depth[hit] = zbuf[hit]
    return depth
