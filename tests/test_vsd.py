"""Depth rasterizer + VSD metric tests on the synthetic fixture."""

import os

import numpy as np
import pytest

from tests.helpers.synthetic_bop import (
    CUBOID_TRIS,
    OBJ_HALF_EXTENTS,
    cuboid_corners,
    write_synthetic_bop,
)

from suo_slam_tpu.eval import render, vsd


@pytest.fixture(scope="module")
def bop_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vsd_bop")
    return write_synthetic_bop(str(root), n_scenes=1, n_views=3)


K = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]])
HW = (240, 320)


def test_render_depth_front_face():
    he = (40.0, 30.0, 20.0)
    verts = cuboid_corners(*he)
    T = np.eye(4)
    T[2, 3] = 500.0
    d = render.render_depth(verts, CUBOID_TRIS, K, T, HW)
    # center pixel looks at the front face: depth = 500 - hz = 480
    assert d[120, 160] == pytest.approx(480.0, abs=1.0)
    # out-of-silhouette pixel is empty
    assert d[5, 5] == 0.0
    # silhouette extent matches projection: half-width 40mm at z=480 -> 25 px
    row = d[120]
    occupied = np.where(row > 0)[0]
    assert abs(occupied.min() - (160 - 300 * 40 / 480)) < 2
    assert abs(occupied.max() - (160 + 300 * 40 / 480)) < 2


def test_render_depth_empty_mesh():
    d = render.render_depth(np.zeros((0, 3)), None, K, np.eye(4), HW)
    assert d.shape == HW and d.sum() == 0


def test_vsd_error_perfect_and_bad():
    he = (40.0, 30.0, 20.0)
    verts = cuboid_corners(*he)
    T = np.eye(4)
    T[2, 3] = 500.0
    d_test = render.render_depth(verts, CUBOID_TRIS, K, T, HW)
    assert vsd.vsd_error(d_test, verts, CUBOID_TRIS, K, T, T) == pytest.approx(0.0)
    T_bad = T.copy()
    T_bad[0, 3] += 100.0  # shift by > object size
    e = vsd.vsd_error(d_test, verts, CUBOID_TRIS, K, T_bad, T)
    assert e > 0.5


def test_vsd_error_small_offset_within_tau():
    he = (40.0, 30.0, 20.0)
    verts = cuboid_corners(*he)
    T = np.eye(4)
    T[2, 3] = 500.0
    d_test = render.render_depth(verts, CUBOID_TRIS, K, T, HW)
    T_off = T.copy()
    T_off[2, 3] += 10.0  # 10 mm depth shift < tau=20
    e = vsd.vsd_error(d_test, verts, CUBOID_TRIS, K, T_off, T)
    assert e < 0.25


def _write_csv(path, rows):
    with open(path, "w") as f:
        for scene_id, im_id, obj_id, T in rows:
            r = " ".join(str(v) for v in T[:3, :3].reshape(-1))
            t = " ".join(str(v) for v in T[:3, 3].reshape(-1))
            f.write(f"{scene_id},{im_id},{obj_id},1.0,{r},{t},-1\n")


def test_run_vsd_eval_gt_poses_full_recall(bop_root, tmp_path):
    from suo_slam_tpu.data.bop import BopDataset
    from suo_slam_tpu.data.mesh import load_mesh_db

    ds = BopDataset(bop_root, "test", kp_config_root=os.path.join(bop_root, "kp_configs"))
    db = load_mesh_db(os.path.join(bop_root, "models_bop-compat"))
    rows = []
    for s in ds.scene_ids():
        for v in ds.view_ids(s):
            for o in ds.obj_ids(s, v):
                T = np.eye(4)
                T[:3, :] = ds.get_obj_pose(s, v, o)
                rows.append((s, v, o, T))
    csv = tmp_path / "est.csv"
    _write_csv(str(csv), rows)
    out = vsd.run_vsd_eval(str(csv), ds, db, str(tmp_path))
    assert out["mean_obj_recall"] == pytest.approx(1.0)
    assert (tmp_path / "vsd_summary.txt").exists()
    # corrupt all poses -> recall collapses
    bad = [(s, v, o, T + np.diag([0, 0, 0, 0]) + np.array([[0, 0, 0, 150]] * 3 + [[0] * 4]))
           for s, v, o, T in rows]
    csv2 = tmp_path / "bad.csv"
    _write_csv(str(csv2), bad)
    out2 = vsd.run_vsd_eval(str(csv2), ds, db, str(tmp_path))
    assert out2["mean_obj_recall"] < 0.3
