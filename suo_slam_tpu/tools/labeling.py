"""Keypoint-labeling core: render, back-project clicks, aggregate, save.

Headless rebuild of the reference labeling tool's logic
(`manual_keypoints.py`): the GUI there renders a 2x4 panel of poses with the
BOP GL renderer (`:107-120`), back-projects each click through the rendered
depth into the object frame (`:143-179`), aggregates >= 3 samples per
keypoint into a mean + 3x3 sample covariance (`kp_stats` `:181-210`), and
saves `kp_info/obj_XXXXXX_kp_info.json` with
`{keypoints: {name: {pos_mean[3], pos_cov[9]}}, view_pose[16]}` (`:337-356`).

This module is the GUI-independent core (renders with
`eval.render.render_depth`, no OpenGL); `manual_keypoints.py` at the repo
root wraps it in a cv2 window. Keeping the math here makes it testable.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..eval.render import render_depth, render_shaded  # noqa: F401 (depth
# kept exported for downstream users of this module)
from ..kp import config as kp_config


def canonical_view_poses(diameter: float, n_views: int = 8) -> np.ndarray:
    """[n, 4, 4] object->camera poses spanning viewpoints (the 2x4 panel)."""
    dist = 3.0 * diameter
    poses = []
    for i in range(n_views):
        az = 2 * np.pi * i / n_views
        el = 0.5 if i % 2 == 0 else -0.5
        ca, sa = np.cos(az), np.sin(az)
        ce, se = np.cos(el), np.sin(el)
        # camera looks at the origin from direction (az, el)
        Rz = np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1.0]])
        Rx = np.array([[1, 0, 0], [0, ce, -se], [0, se, ce]])
        T = np.eye(4)
        T[:3, :3] = Rx @ Rz
        T[2, 3] = dist
        poses.append(T)
    return np.stack(poses)


def propagate_cov_2d(K, T_OtoC, mean, cov):
    """First-order propagation of a 3D keypoint covariance into image space.

    Mirrors the reference inspection pane's propagation
    (`manual_keypoints.py:261-276`): with p_C = R @ mean + t and
    uvz = K @ p_C, the 2x2 image covariance is S @ cov @ S.T with
    S = d(uv)/d(uvz) @ K @ R.

    DOCUMENTED DEVIATION: the reference's Jacobian has a row typo — both of
    its rows start with 1/z (`duv_duvz = [[1/z, 0, -x/z^2],
    [1/z, 0, -y/z^2]]`, `manual_keypoints.py:263-265`), which propagates the
    v-axis variance through the u-row of K. The correct derivative of
    (u, v) = (x/z, y/z) is [[1/z, 0, -x/z^2], [0, 1/z, -y/z^2]]; this
    implementation uses the correct form (verified against finite
    differences and Monte-Carlo in tests/test_tools.py). The deviation only
    affects the visualization ellipses — nothing downstream consumes it.

    Returns (uv [2], cov2 [2, 2], z).
    """
    R, t = np.asarray(T_OtoC)[:3, :3], np.asarray(T_OtoC)[:3, 3]
    p_c = R @ np.asarray(mean, np.float64) + t
    uvz = np.asarray(K, np.float64) @ p_c
    x, y, z = uvz
    uv = np.array([x / z, y / z])
    duv_duvz = np.array([
        [1.0 / z, 0.0, -x / z**2],
        [0.0, 1.0 / z, -y / z**2],
    ])
    S = duv_duvz @ np.asarray(K, np.float64) @ R
    return uv, S @ np.asarray(cov, np.float64) @ S.T, float(z)


def cov_ellipse(cov2, chi2_val=5.991):
    """((major, minor) axis lengths, angle_deg) of the chi2 confidence
    ellipse, matching the reference's drawing parameters
    (`manual_keypoints.py:268-276`): axis = 2 * sqrt(chi2 * lambda), angle
    from the first eigenvector."""
    lamb, V = np.linalg.eig(np.asarray(cov2, np.float64))
    lamb = np.maximum(lamb.real, 0.0)
    angle = float(np.degrees(np.arctan2(V[1, 0].real, V[0, 0].real)))
    axes = (2.0 * np.sqrt(chi2_val * lamb[0]), 2.0 * np.sqrt(chi2_val * lamb[1]))
    return axes, angle


def adjust_view_pose(view_pose, key, delta=2.0):
    """Interactive view-pose adjustment, the reference's key contract
    (`manual_keypoints.py:307-326`): w/s pitch by -/+delta deg, a/d yaw by
    +/-delta deg (left-composed onto R), i/o zoom by -/+delta along z.
    Returns a NEW [4, 4] pose; unknown keys return the input unchanged."""
    from ..data.bop import _euler2R_np

    T = np.array(view_pose, np.float64, copy=True)
    if T.shape[0] == 3:
        T = np.concatenate([T, np.eye(4)[3:]], 0)
    if key == "w":
        T[:3, :3] = _euler2R_np([-delta, 0, 0]) @ T[:3, :3]
    elif key == "s":
        T[:3, :3] = _euler2R_np([delta, 0, 0]) @ T[:3, :3]
    elif key == "a":
        T[:3, :3] = _euler2R_np([0, delta, 0]) @ T[:3, :3]
    elif key == "d":
        T[:3, :3] = _euler2R_np([0, -delta, 0]) @ T[:3, :3]
    elif key == "i":
        T[2, 3] -= delta
    elif key == "o":
        T[2, 3] += delta
    return T


class KeypointLabeler:
    """Sample-collecting labeler for one object mesh."""

    def __init__(self, verts, faces, K, hw=(240, 320), diameter=None, n_views=8):
        self.verts = np.asarray(verts, np.float64)
        self.faces = faces
        self.K = np.asarray(K, np.float64)
        self.hw = hw
        if diameter is None:
            d = self.verts - self.verts.mean(0)
            diameter = 2.0 * float(np.linalg.norm(d, axis=1).max())
        self.view_poses = canonical_view_poses(diameter, n_views)
        # Shaded RGB for display (like the reference GUI's lit GL views,
        # `manual_keypoints.py:107-120`); depth drives the back-projection.
        self.shaded = []
        self.depths = []
        for T in self.view_poses:
            rgb, d = render_shaded(self.verts, self.faces, self.K, T, hw)
            self.shaded.append(rgb)
            self.depths.append(d)
        self.samples: dict[str, list[np.ndarray]] = {}
        # the USER-ADJUSTED canonical view pose saved into kp_info (the pose
        # `pick_symmetry_transform` canonicalizes symmetric GT against at
        # train time, `lib/datasets/bop.py:358-385`); starts at panel view 0
        # and is refined in the inspection pane (`adjust_view_pose`)
        self.view_pose = self.view_poses[0].copy()

    def render_panel(self) -> np.ndarray:
        """Flat-shaded RGB panel [2, n/2] grid for display ([H, W, 3] u8)."""
        imgs = self.shaded
        n = len(imgs)
        top = np.concatenate(imgs[: n // 2], axis=1)
        bot = np.concatenate(imgs[n // 2 :], axis=1)
        return np.concatenate([top, bot], axis=0)

    def backproject(self, view_idx: int, x: float, y: float):
        """Pixel click -> 3D point in the OBJECT frame, or None off-surface.

        Mirrors `manual_keypoints.py:143-179`: read rendered depth, unproject
        through K, transform by the inverse view pose.
        """
        d = self.depths[view_idx]
        xi, yi = int(x), int(y)
        if not (0 <= xi < d.shape[1] and 0 <= yi < d.shape[0]) or d[yi, xi] <= 0:
            return None
        z = float(d[yi, xi])
        # the renderer samples at pixel centers: unproject (xi+0.5, yi+0.5)
        p_cam = np.linalg.inv(self.K) @ np.array([(xi + 0.5) * z, (yi + 0.5) * z, z])
        T = self.view_poses[view_idx]
        return T[:3, :3].T @ (p_cam - T[:3, 3])

    def add_sample(self, kp_name: str, view_idx: int, x: float, y: float) -> bool:
        assert kp_name in kp_config.KP_INDEX, f"Unknown keypoint {kp_name}"
        p = self.backproject(view_idx, x, y)
        if p is None:
            return False
        self.samples.setdefault(kp_name, []).append(p)
        return True

    def kp_stats(self, min_samples: int = 3):
        """name -> (mean [3], cov [3, 3]) for keypoints with enough samples
        (`manual_keypoints.py:181-210`)."""
        out = {}
        for name, pts in self.samples.items():
            if len(pts) < min_samples:
                continue
            arr = np.stack(pts)
            mean = arr.mean(0)
            res = arr - mean
            cov = (res.T @ res) / max(1, len(pts) - 1)
            out[name] = (mean, cov)
        return out

    def render_inspection(self, min_samples: int = 3):
        """The inspection pane (`manual_keypoints.py:212-326`): render the
        object at the current USER-ADJUSTED `self.view_pose`, with the
        labeled keypoints as dots (left/'Unscaled') and as first-order
        covariance-propagated chi2 ellipses (right/'Scaled w/ Cov').

        Returns (img [H, 2W, 3] u8, ok) where ok=False if any sampled
        keypoint has < min_samples (the reference refuses to accept then,
        `:306-312`)."""
        import cv2

        rgb, _ = render_shaded(self.verts, self.faces, self.K, self.view_pose,
                               self.hw)
        normal = np.ascontiguousarray(rgb)
        scaled = normal.copy()
        ok = True
        for name, pts in self.samples.items():
            if len(pts) < min_samples:
                ok = False
        for name, (mean, cov) in self.kp_stats(min_samples).items():
            uv, cov2, z = propagate_cov_2d(self.K, self.view_pose, mean, cov)
            if z <= 0:
                continue
            u, v = int(round(uv[0])), int(round(uv[1]))
            col = [int(c) for c in kp_config.kp_color(name)]
            cv2.circle(normal, (u, v), 4, [0, 0, 0], -1)
            cv2.circle(normal, (u, v), 3, col, -1)
            (ax0, ax1), ang = cov_ellipse(cov2)
            cv2.ellipse(scaled, (u, v),
                        (int(round(ax0)), int(round(ax1))), ang, 0, 360,
                        col, -1)
        cv2.putText(normal, "Unscaled", (3, 18), cv2.FONT_HERSHEY_SIMPLEX,
                    0.5, (10, 10, 255), 1, cv2.LINE_AA)
        cv2.putText(scaled, "Scaled w/ Cov", (3, 18),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (10, 255, 10), 1,
                    cv2.LINE_AA)
        return np.concatenate([normal, scaled], axis=1), ok

    def save(self, path: str, view_pose: np.ndarray | None = None,
             min_samples: int = 3):
        """Write the kp_info JSON (same schema as `manual_keypoints.py:337-356`).

        The saved `view_pose` is the user-adjusted `self.view_pose` (set in
        the inspection pane) unless overridden — it is semantically
        load-bearing: `pick_symmetry_transform` canonicalizes symmetric-
        object GT against it at train time."""
        stats = self.kp_stats(min_samples)
        assert stats, "No keypoints with enough samples to save"
        vp = self.view_pose if view_pose is None else view_pose
        data = {
            "keypoints": {
                name: {
                    "pos_mean": mean.tolist(),
                    "pos_cov": cov.reshape(-1).tolist(),
                }
                for name, (mean, cov) in stats.items()
            },
            "view_pose": np.asarray(vp).reshape(-1).tolist(),
        }
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(data, f, indent=1)
        return data


def load_kp_info(path: str):
    with open(path) as f:
        data = json.load(f)
    kps = {
        n: (np.asarray(v["pos_mean"]), np.asarray(v["pos_cov"]).reshape(3, 3))
        for n, v in data["keypoints"].items()
    }
    return kps, np.asarray(data["view_pose"]).reshape(4, 4)
