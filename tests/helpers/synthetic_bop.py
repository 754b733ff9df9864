"""Synthetic BOP dataset generator for tests.

Writes a tiny but structurally complete BOP-format dataset to disk — scene
dirs with `scene_camera.json` / `scene_gt.json` / `scene_gt_info.json`, RGB
frames with the objects actually drawn (colored cuboid faces projected with
the GT pose, so keypoint networks have real signal), depth maps, kp_info
label JSONs, `models_info.json` + PLY meshes, and a `keyframe.txt` — in the
layout `suo_slam_tpu.data.bop.BopDataset` indexes (same contract as the
reference loader `lib/datasets/bop.py`).

Objects are cuboids whose 8 box-corner keypoints come from the `box_like`
shape class of the 41-kp vocabulary, so `kp_configs/ycbv_kp_config.csv`-style
configs apply. Units: mm, like BOP.
"""

from __future__ import annotations

import json
import os

import numpy as np

# Cuboid half-extents per synthetic object (mm)
OBJ_HALF_EXTENTS = {
    1: (40.0, 30.0, 20.0),
    2: (25.0, 25.0, 50.0),
    3: (35.0, 35.0, 35.0),
}

# Channel order of the box_like shape class: front face (z>0) tl,tr,br,bl then
# back face tl,tr,br,bl — tl = (-x, +y).
def cuboid_corners(hx, hy, hz):
    return np.array(
        [
            [-hx, +hy, +hz], [+hx, +hy, +hz], [+hx, -hy, +hz], [-hx, -hy, +hz],
            [-hx, +hy, -hz], [+hx, +hy, -hz], [+hx, -hy, -hz], [-hx, -hy, -hz],
        ]
    )


BOX_KP_NAMES = [
    "box_corner_front_tl", "box_corner_front_tr", "box_corner_front_br",
    "box_corner_front_bl", "box_corner_back_tl", "box_corner_back_tr",
    "box_corner_back_br", "box_corner_back_bl",
]

_FACES = [  # corner indices per cuboid face
    (0, 1, 2, 3), (4, 5, 6, 7), (0, 1, 5, 4), (2, 3, 7, 6), (1, 2, 6, 5), (0, 3, 7, 4),
]
_FACE_SHADE = [1.0, 0.45, 0.85, 0.6, 0.75, 0.55]
_OBJ_COLOR = {1: (200, 60, 40), 2: (40, 180, 70), 3: (50, 80, 210)}


def _euler_R(rx, ry, rz):
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def _project(K, pts):
    uvw = pts @ K.T
    return uvw[:, :2] / uvw[:, 2:3], uvw[:, 2]


def _draw_poly(img, depth, uv, z, color):
    """Tiny scanline rasterizer (no cv2 dependency in the fixture)."""
    h, w = img.shape[:2]
    ys = np.clip([np.floor(uv[:, 1].min()), np.ceil(uv[:, 1].max())], 0, h - 1).astype(int)
    xs = np.clip([np.floor(uv[:, 0].min()), np.ceil(uv[:, 0].max())], 0, w - 1).astype(int)
    if ys[1] <= ys[0] or xs[1] <= xs[0]:
        return
    yy, xx = np.mgrid[ys[0] : ys[1] + 1, xs[0] : xs[1] + 1]
    pts = np.stack([xx.ravel() + 0.5, yy.ravel() + 0.5], -1)
    inside = np.ones(pts.shape[0], bool)
    n = uv.shape[0]
    sign = 0.0
    for i in range(n):
        a, b = uv[i], uv[(i + 1) % n]
        cross = (b[0] - a[0]) * (pts[:, 1] - a[1]) - (b[1] - a[1]) * (pts[:, 0] - a[0])
        if sign == 0.0:
            sign = np.sign(cross[np.argmax(np.abs(cross))]) or 1.0
        inside &= sign * cross >= -1e-9
    zmean = float(np.mean(z))
    sel = inside & (zmean < depth[yy.ravel(), xx.ravel()])
    iy, ix = yy.ravel()[sel], xx.ravel()[sel]
    img[iy, ix] = color
    depth[iy, ix] = zmean


def render_frame(K, poses, obj_ids, hw=(240, 320)):
    """Painter's-algorithm render of cuboids. Returns (rgb uint8, depth mm)."""
    h, w = hw
    img = np.full((h, w, 3), 30, np.uint8)
    depth = np.full((h, w), np.inf, np.float32)
    order = np.argsort([-p[2, 3] for p in poses])  # far to near
    for i in order:
        T, obj_id = poses[i], obj_ids[i]
        corners = cuboid_corners(*OBJ_HALF_EXTENTS[obj_id])
        p_cam = corners @ T[:3, :3].T + T[:3, 3]
        col = np.asarray(_OBJ_COLOR[obj_id], np.float64)
        # order faces far->near within the object
        fz = [np.mean(p_cam[list(f)][:, 2]) for f in _FACES]
        for fi in np.argsort(fz)[::-1]:
            f = _FACES[fi]
            quad = p_cam[list(f)]
            if np.any(quad[:, 2] <= 1.0):
                continue
            uv, z = _project(K, quad)
            _draw_poly(img, depth, uv, z, (col * _FACE_SHADE[fi]).astype(np.uint8))
    depth[~np.isfinite(depth)] = 0.0
    return img, depth


def _bbox_from_kp(K, p_cam, hw, pad=6):
    uv, _ = _project(K, p_cam)
    h, w = hw
    x1 = max(0.0, uv[:, 0].min() - pad)
    y1 = max(0.0, uv[:, 1].min() - pad)
    x2 = min(float(w), uv[:, 0].max() + pad)
    y2 = min(float(h), uv[:, 1].max() + pad)
    return [float(x1), float(y1), float(x2 - x1), float(y2 - y1)]


def write_synthetic_bop(
    root: str,
    n_scenes: int = 1,
    n_views: int = 4,
    hw: tuple[int, int] = (240, 320),
    seed: int = 0,
    splits: tuple[str, ...] | None = None,
    obj2_continuous_sym: bool = True,
    bop_dset: str = "ycbv",
):
    """Create the dataset under `root`. Returns root.

    Object 2 optionally gets a continuous z-axis symmetry entry (exercising
    the discretization path); object 3 gets one discrete 180-deg symmetry.

    bop_dset="tless" writes the T-LESS layout instead: `models_cad` (+
    `models_eval` symlink), `test_primesense` split, and
    `all_target_tless.json` targets instead of `keyframe.txt`.
    """
    import cv2

    if splits is None:
        splits = (
            ("train_primesense", "test_primesense")
            if bop_dset == "tless" else ("train_synt", "test")
        )
    rng = np.random.default_rng(seed)
    h, w = hw
    K = np.array([[280.0, 0.0, w / 2.0], [0.0, 280.0, h / 2.0], [0.0, 0.0, 1.0]])
    os.makedirs(root, exist_ok=True)

    # ---- models dir + models_info.json + PLYs -----------------------------
    models_name = "models_bop-compat" if bop_dset == "ycbv" else "models_cad"
    models_dir = os.path.join(root, models_name)
    os.makedirs(models_dir, exist_ok=True)
    models_info = {}
    for obj_id, he in OBJ_HALF_EXTENTS.items():
        corners = cuboid_corners(*he)
        diameter = float(2.0 * np.linalg.norm(he))
        mi = {
            "diameter": diameter,
            "min_x": -he[0], "min_y": -he[1], "min_z": -he[2],
            "size_x": 2 * he[0], "size_y": 2 * he[1], "size_z": 2 * he[2],
        }
        if obj_id == 2 and obj2_continuous_sym:
            mi["symmetries_continuous"] = [{"axis": [0, 0, 1], "offset": [0, 0, 0]}]
        if obj_id == 3:
            Tsym = np.eye(4)
            Tsym[:3, :3] = _euler_R(0, 0, np.pi)
            mi["symmetries_discrete"] = [Tsym.reshape(-1).tolist()]
        models_info[str(obj_id)] = mi
        # small vertex cloud: corners + surface samples; triangulated faces
        # over the 8 corners so the depth renderer / VSD path has geometry
        extra = rng.uniform(-1, 1, (64, 3)) * np.asarray(he)
        for ax in range(3):  # project extras onto the surface
            if ax == 0:
                extra[0::3, 0] = np.sign(extra[0::3, 0] + 1e-9) * he[0]
            elif ax == 1:
                extra[1::3, 1] = np.sign(extra[1::3, 1] + 1e-9) * he[1]
            else:
                extra[2::3, 2] = np.sign(extra[2::3, 2] + 1e-9) * he[2]
        pts = np.concatenate([corners, extra])
        _write_ascii_ply(
            os.path.join(models_dir, f"obj_{obj_id:06d}.ply"), pts, CUBOID_TRIS
        )
    with open(os.path.join(models_dir, "models_info.json"), "w") as f:
        json.dump(models_info, f)

    # ---- kp_info labels ---------------------------------------------------
    kp_dir = os.path.join(root, "kp_info")
    os.makedirs(kp_dir, exist_ok=True)
    for obj_id, he in OBJ_HALF_EXTENTS.items():
        corners = cuboid_corners(*he)
        view_pose = np.eye(4)
        view_pose[:3, :3] = _euler_R(0.3, 0.2, 0.1)
        view_pose[2, 3] = 600.0
        info = {
            "keypoints": {
                name: {
                    "pos_mean": corners[i].tolist(),
                    "pos_cov": (np.eye(3) * 1.0).reshape(-1).tolist(),
                }
                for i, name in enumerate(BOX_KP_NAMES)
            },
            "view_pose": view_pose.reshape(-1).tolist(),
        }
        with open(os.path.join(kp_dir, f"obj_{obj_id:06d}_kp_info.json"), "w") as f:
            json.dump(info, f)

    # ---- kp config csv (box_like only, 3 objects) -------------------------
    cfg_dir = os.path.join(root, "kp_configs")
    os.makedirs(cfg_dir, exist_ok=True)
    # exact reference CSV format (no spaces — the reference reads it with
    # pandas and indexes columns by name, `kp_configs/ycbv_kp_config.csv:1`)
    with open(os.path.join(cfg_dir, f"{bop_dset}_kp_config.csv"), "w") as f:
        f.write("# instance,class,has_grip,has_spout,has_brand_name,"
                "has_nutrition_facts,has_bar_code\n")
        for obj_id in OBJ_HALF_EXTENTS:
            f.write(f"synth_obj_{obj_id},box_like,0,0,0,0,0\n")

    # ---- scenes -----------------------------------------------------------
    keyframe_lines = []
    for split in splits:
        for scene_id in range(n_scenes):
            scene_dir = os.path.join(root, split, f"{scene_id:06d}")
            for sub in ("rgb", "depth", "mask_visib"):
                os.makedirs(os.path.join(scene_dir, sub), exist_ok=True)
            scene_camera, scene_gt, scene_gt_info = {}, {}, {}
            # STATIC world: fixed object poses in the world frame, camera on a
            # small orbit — a rigid scene as SLAM assumes.
            obj_ids = list(OBJ_HALF_EXTENTS.keys())
            T_obj_world = []
            for j, obj_id in enumerate(obj_ids):
                T = np.eye(4)
                T[:3, :3] = _euler_R(*rng.uniform(-0.5, 0.5, 3))
                T[:3, 3] = [-100.0 + 95.0 * j, rng.uniform(-35, 35), 620.0 + 60.0 * j]
                T_obj_world.append(T)
            for view_id in range(n_views):
                ang = 0.08 * view_id
                T_WtoC = np.eye(4)
                T_WtoC[:3, :3] = _euler_R(0.02 * view_id, ang, 0.01 * view_id)
                T_WtoC[:3, 3] = [-50.0 * np.sin(ang), 5.0 * view_id,
                                 60.0 * (1 - np.cos(ang))]
                poses = [T_WtoC @ T for T in T_obj_world]
                img, depth = render_frame(K, poses, obj_ids, hw)
                cv2.imwrite(os.path.join(scene_dir, "rgb", f"{view_id:06d}.png"), img)
                cv2.imwrite(
                    os.path.join(scene_dir, "depth", f"{view_id:06d}.png"),
                    depth.astype(np.uint16),
                )
                scene_camera[str(view_id)] = {
                    "cam_K": K.reshape(-1).tolist(),
                    "depth_scale": 1.0,
                    "cam_R_w2c": T_WtoC[:3, :3].reshape(-1).tolist(),
                    "cam_t_w2c": T_WtoC[:3, 3].tolist(),
                }
                gt_list, info_list = [], []
                for j, obj_id in enumerate(obj_ids):
                    T = poses[j]
                    corners = cuboid_corners(*OBJ_HALF_EXTENTS[obj_id])
                    p_cam = corners @ T[:3, :3].T + T[:3, 3]
                    bbox = _bbox_from_kp(K, p_cam, hw)
                    gt_list.append({
                        "obj_id": obj_id,
                        "cam_R_m2c": T[:3, :3].reshape(-1).tolist(),
                        "cam_t_m2c": T[:3, 3].tolist(),
                    })
                    info_list.append({
                        "bbox_obj": bbox, "bbox_visib": bbox,
                        "visib_fract": 0.95, "px_count_visib": 1000,
                    })
                    mask = np.zeros(hw, np.uint8)
                    x1, y1, bw_, bh_ = [int(v) for v in bbox]
                    mask[y1 : y1 + bh_, x1 : x1 + bw_] = 255
                    cv2.imwrite(
                        os.path.join(scene_dir, "mask_visib", f"{view_id:06d}_{j:06d}.png"),
                        mask,
                    )
                scene_gt[str(view_id)] = gt_list
                scene_gt_info[str(view_id)] = info_list
                if "test" in split:
                    keyframe_lines.append(f"{scene_id:06d}/{view_id:06d}")
            with open(os.path.join(scene_dir, "scene_camera.json"), "w") as f:
                json.dump(scene_camera, f)
            with open(os.path.join(scene_dir, "scene_gt.json"), "w") as f:
                json.dump(scene_gt, f)
            with open(os.path.join(scene_dir, "scene_gt_info.json"), "w") as f:
                json.dump(scene_gt_info, f)
    if bop_dset == "ycbv":
        with open(os.path.join(root, "keyframe.txt"), "w") as f:
            f.write("\n".join(keyframe_lines) + "\n")
    else:
        targets = []
        for ln in keyframe_lines:
            s, v = (int(x) for x in ln.split("/"))
            for obj_id in OBJ_HALF_EXTENTS:
                targets.append({
                    "scene_id": s, "im_id": v, "obj_id": obj_id, "inst_count": 1,
                })
        with open(os.path.join(root, "all_target_tless.json"), "w") as f:
            json.dump(targets, f)
        eval_dir = os.path.join(root, "models_eval")
        if not os.path.exists(eval_dir):
            os.symlink(models_name, eval_dir, target_is_directory=True)
    return root


# cuboid faces as triangles over the 8 corners (front z+: 0..3, back z-: 4..7)
_QUADS = [(0, 1, 2, 3), (5, 4, 7, 6), (4, 5, 1, 0), (3, 2, 6, 7), (1, 5, 6, 2), (4, 0, 3, 7)]
CUBOID_TRIS = np.asarray(
    [[a, b, c] for a, b, c, d in _QUADS for a, b, c in [(a, b, c), (a, c, d)]],
    np.int32,
)


def _write_ascii_ply(path, pts, faces=None):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {pts.shape[0]}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if faces is not None:
            f.write(f"element face {len(faces)}\n")
            f.write("property list uchar int vertex_indices\n")
        f.write("end_header\n")
        for p in pts:
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n")
        if faces is not None:
            for tri in faces:
                f.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n")
