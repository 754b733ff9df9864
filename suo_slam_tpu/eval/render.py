"""Z-buffer depth rasterizer (host numpy, eval tier).

Replaces the vendored bop_toolkit OpenGL/glumpy renderer for the purposes of
VSD evaluation and keypoint labeling (`thirdparty/bop_toolkit/bop_toolkit_lib/
renderer_py.py` in the reference — used by `scripts/eval_siso.py` and
`manual_keypoints.py`). Depth + flat-shaded Lambertian RGB, vectorized per
triangle over its pixel bbox with perspective-correct interpolation; no
GL / GPU dependency.

BOP convention: depth images hold the camera-frame z coordinate (mm), not ray
length.
"""

from __future__ import annotations

import numpy as np


def _rasterize(verts, faces, K, T_OtoC, hw, near=10.0):
    """Z-buffer rasterization. Returns ([H,W] f32 depth with 0=miss,
    [H,W] int32 face index with -1=miss)."""
    h, w = hw
    depth = np.zeros((h, w), np.float32)
    fid = np.full((h, w), -1, np.int32)
    if faces is None or len(faces) == 0 or len(verts) == 0:
        return depth, fid
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

    for f_idx, f_uv, f_z in zip(np.where(ok)[0], tri_uv[ok], tri_z[ok]):
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
        win = zpix < sub
        sub[win] = zpix[win]
        fid[y0 : y1 + 1, x0 : x1 + 1][win] = f_idx

    hit = np.isfinite(zbuf)
    depth[hit] = zbuf[hit]
    return depth, fid


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
    depth, _ = _rasterize(verts, faces, K, T_OtoC, hw, near)
    return depth


def render_shaded(
    verts: np.ndarray,
    faces: np.ndarray,
    K: np.ndarray,
    T_OtoC: np.ndarray,
    hw: tuple[int, int],
    color=(200, 200, 200),
    light_dir=(0.3, -0.4, -1.0),
    ambient: float = 0.35,
    near: float = 10.0,
):
    """Flat-shaded Lambertian RGB render (+ depth) of one mesh.

    Replaces the lit views the reference labeling GUI / sym-choice viewer get
    from the GL renderer (`manual_keypoints.py:107-120` via
    `bop_toolkit_lib/renderer_py.py`): per-face normal in the camera frame,
    intensity = ambient + (1-ambient)*|n . l| (double-sided — mesh winding in
    BOP models is not consistent), uniform base color.

    Returns ([H, W, 3] uint8 RGB with black background, [H, W] f32 depth).
    """
    depth, fid = _rasterize(verts, faces, K, T_OtoC, hw, near)
    img = np.zeros(hw + (3,), np.uint8)
    if faces is None or len(faces) == 0 or not (fid >= 0).any():
        return img, depth
    R, t = np.asarray(T_OtoC)[:3, :3], np.asarray(T_OtoC)[:3, 3]
    p_cam = np.asarray(verts) @ R.T + t
    tri = p_cam[np.asarray(faces)]  # [F, 3, 3]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    l = np.asarray(light_dir, np.float64)
    l /= np.linalg.norm(l)
    intens = ambient + (1.0 - ambient) * np.abs(n @ l)  # [F]
    hit = fid >= 0
    shade = intens[fid[hit]][:, None] * np.asarray(color, np.float64)[None, :]
    img[hit] = np.clip(shade, 0, 255).astype(np.uint8)
    return img, depth
