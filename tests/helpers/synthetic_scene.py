"""Synthetic multi-object multi-view scene for SLAM-engine tests.

Mirrors the reference's oracle-input strategy (`--debug_gt_kp`,
`lib/args.py:130-135`) and the g2o synthetic demo
(`thirdparty/g2opy/python/examples/object_slam_demo.py`): objects placed in
the world (= first camera) frame, a camera orbiting them, GT keypoints
projected per frame into bbox NDC — the exact input contract of both
`ObjectSlam.process_view` and the reference `ObjectSLAM.process_view`.
"""

import numpy as np

from suo_slam_tpu.kp import config as kp_config

NK = kp_config.num_kp()


class StubMeshDb:
    """Array-indexed mesh database (our engine's interface)."""

    def __init__(self, n_obj, diameter=100.0, symmetric=()):
        self.diameter = np.full((n_obj,), diameter, np.float32)
        self.is_symmetric = np.zeros((n_obj,), bool)
        for o in symmetric:
            self.is_symmetric[o - 1] = True

    def as_reference_dict(self, obj_ids=None):
        """The dict-of-dicts shape the reference engine consumes
        (`lib/utils/mesh_database.py:17-45`, `lib/object_slam.py:343`)."""
        n = len(self.diameter)
        ids = obj_ids if obj_ids is not None else range(1, n + 1)
        return {
            int(o): {
                "is_symmetric": bool(self.is_symmetric[o - 1]),
                "diameter": float(self.diameter[o - 1]),
                "continuous_sym": False,
            }
            for o in ids
        }


def _euler_R(rx, ry, rz):
    from suo_slam_tpu.data.bop import _euler2R_np

    return _euler2R_np(np.rad2deg([rx, ry, rz]))


def make_scene(n_obj=4, n_views=8, n_kp=12, seed=0):
    """Objects in the world (= first camera) frame, orbiting camera."""
    rng = np.random.default_rng(seed)
    K = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]])
    hw = (240, 320)
    kp = {}
    T_obj = {}
    for j in range(n_obj):
        obj_id = j + 1
        pts = rng.uniform(-40, 40, (n_kp, 3))
        kp[obj_id] = pts
        T = np.eye(4)
        T[:3, :3] = _euler_R(*rng.uniform(-0.5, 0.5, 3))
        T[:3, 3] = [(-120 + 80 * j), rng.uniform(-40, 40), 600 + 50 * j]
        T_obj[obj_id] = T
    cams = []
    for i in range(n_views):
        ang = 0.06 * i
        T = np.eye(4)
        T[:3, :3] = _euler_R(0.02 * i, ang, 0)
        T[:3, 3] = [-40 * np.sin(ang), 6.0 * i, 80 * (1 - np.cos(ang))]
        cams.append(T)
    return K, hw, kp, T_obj, cams


def project_frame(K, hw, kp, T_obj, T_GtoC, pad=8.0):
    """GT detections for one frame: bboxes, NDC kps, channel masks."""
    obj_ids, bboxes, model_kps, model_masks, kp_masks, uv_gts = [], [], [], [], [], []
    for obj_id, pts in kp.items():
        T_OtoC = T_GtoC @ T_obj[obj_id]
        p_cam = pts @ T_OtoC[:3, :3].T + T_OtoC[:3, 3]
        if np.any(p_cam[:, 2] < 1.0):
            continue
        uvw = p_cam @ K.T
        uv = uvw[:, :2] / uvw[:, 2:3]
        x1, y1 = uv.min(0) - pad
        x2, y2 = uv.max(0) + pad
        if x2 < 0 or y2 < 0 or x1 > hw[1] or y1 > hw[0]:
            continue
        n = pts.shape[0]
        mk = np.zeros((NK, 3), np.float32)
        mm = np.zeros((NK,), bool)
        ug = np.zeros((NK, 2), np.float32)
        mk[:n] = pts
        mm[:n] = True
        w, h = x2 - x1, y2 - y1
        ug[:n] = np.stack(
            [2 * (uv[:, 0] - x1) / w - 1, 1 - 2 * (uv[:, 1] - y1) / h], -1
        )
        obj_ids.append(obj_id)
        bboxes.append([x1, y1, x2, y2])
        model_kps.append(mk)
        model_masks.append(mm)
        kp_masks.append(mm.copy())
        uv_gts.append(ug)
    return (
        np.asarray(obj_ids),
        np.asarray(bboxes, np.float32),
        np.stack(model_kps),
        np.stack(model_masks),
        np.stack(kp_masks),
        np.stack(uv_gts),
    )


def rot_err_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.rad2deg(np.arccos(np.clip(c, -1, 1)))
