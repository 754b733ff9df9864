"""SLAM engine integration tests with GT keypoints (debug_gt_kp mode).

Mirrors the reference's oracle-input testing strategy (`--debug_gt_kp`,
`lib/args.py:130-135`) and the g2o synthetic demo
(`thirdparty/g2opy/python/examples/object_slam_demo.py`): a synthetic
multi-object multi-view scene drives the full engine — PnP init, camera
RANSAC, tracking BA, global BA — and we check pose recovery.
"""

import numpy as np
import pytest

from suo_slam_tpu.slam import ObjectSlam, SlamConfig

from tests.helpers.synthetic_scene import (  # noqa: F401
    NK,
    StubMeshDb,
    make_scene,
    project_frame,
    rot_err_deg,
)

RNG = np.random.default_rng(7)


def _make_engine(**kw):
    kw.setdefault("debug_gt_kp", True)
    kw.setdefault("manual_kp_std", 0.01)
    kw.setdefault("gt_kp_noise_std", 0.005)
    kw.setdefault("view_capacity", 16)
    kw.setdefault("obj_capacity", 8)
    cfg = SlamConfig(**kw)
    return ObjectSlam(cfg, mesh_db=StubMeshDb(8))


IMG = np.zeros((240, 320, 3), np.float32)


def run_scene(engine, n_views=8, cam_pose=None, seed=0, n_obj=4):
    K, hw, kp, T_obj, cams = make_scene(n_obj=n_obj, n_views=n_views, seed=seed)
    for i, T_GtoC in enumerate(cams):
        obj_ids, bboxes, mks, mms, kms, uvs = project_frame(K, hw, kp, T_obj, T_GtoC)
        engine.process_view(
            i, IMG, K, obj_ids, bboxes, mks, mms, kms, uv_gt=uvs,
            cam_pose=T_GtoC if cam_pose else None,
        )
    return K, kp, T_obj, cams


@pytest.mark.slow
def test_single_view_pose_recovery():
    engine = _make_engine(single_view_mode=True)
    K, hw, kp, T_obj, cams = make_scene(n_views=1)
    obj_ids, bboxes, mks, mms, kms, uvs = project_frame(K, hw, kp, T_obj, cams[0])
    engine.process_view(0, IMG, K, obj_ids, bboxes, mks, mms, kms, uv_gt=uvs)
    res = engine.collect_results()
    assert 0 in res
    for obj_id in obj_ids:
        T = res[0]["poses"][int(obj_id)]["T_OtoC"]
        assert T is not None
        T_gt = cams[0] @ T_obj[int(obj_id)]
        assert rot_err_deg(T[:3, :3], T_gt[:3, :3]) < 2.0
        assert np.linalg.norm(T[:3, 3] - T_gt[:3, 3]) < 12.0  # mm


@pytest.mark.slow
def test_full_slam_trajectory_and_objects():
    engine = _make_engine()
    K, kp, T_obj, cams = run_scene(engine, n_views=8)
    res = engine.collect_results(final=True)
    assert len(res) == 8
    for i, T_GtoC_gt in enumerate(cams):
        # camera pose is anchored at view 0 = I (same as GT world def)
        est = engine.cam_T[engine.view_slot[i]]
        assert rot_err_deg(est[:3, :3], T_GtoC_gt[:3, :3]) < 2.0, f"view {i}"
        assert np.linalg.norm(est[:3, 3] - T_GtoC_gt[:3, 3]) < 15.0, f"view {i}"
        for obj_id in kp:
            T = res[i]["poses"].get(obj_id, {}).get("T_OtoC")
            if T is None:
                continue
            T_gt = T_GtoC_gt @ T_obj[obj_id]
            assert rot_err_deg(T[:3, :3], T_gt[:3, :3]) < 2.0
            assert np.linalg.norm(T[:3, 3] - T_gt[:3, 3]) < 12.0


@pytest.mark.slow
def test_slam_with_outlier_measurements():
    """Corrupt some keypoints badly; chi2 gating must keep poses accurate."""
    engine = _make_engine()
    K, hw, kp, T_obj, cams = make_scene(n_views=6, seed=3)
    rng = np.random.default_rng(1)
    for i, T_GtoC in enumerate(cams):
        obj_ids, bboxes, mks, mms, kms, uvs = project_frame(K, hw, kp, T_obj, T_GtoC)
        if i > 0:  # leave the init view clean
            for j in range(uvs.shape[0]):
                sel = np.where(kms[j])[0]
                bad = rng.choice(sel, size=max(1, len(sel) // 6), replace=False)
                uvs[j, bad] += rng.uniform(0.2, 0.5, (len(bad), 2)) * rng.choice([-1, 1], (len(bad), 2))
        engine.process_view(i, IMG, K, obj_ids, bboxes, mks, mms, kms, uv_gt=uvs)
    res = engine.collect_results(final=True)
    for i, T_GtoC_gt in enumerate(cams):
        for obj_id in kp:
            T = res[i]["poses"].get(obj_id, {}).get("T_OtoC")
            if T is None:
                continue
            T_gt = T_GtoC_gt @ T_obj[obj_id]
            assert rot_err_deg(T[:3, :3], T_gt[:3, :3]) < 3.0
            assert np.linalg.norm(T[:3, 3] - T_gt[:3, 3]) < 15.0
    # outliers were actually rejected somewhere
    assert engine.inliers.sum() < engine.valid.sum()


def test_gt_cam_pose_mode():
    """External camera poses (--gt_cam_pose): all objects get prior path."""
    engine = _make_engine()
    K, kp, T_obj, cams = run_scene(engine, n_views=5, cam_pose=True)
    res = engine.collect_results(final=True)
    for i, T_GtoC_gt in enumerate(cams):
        est = engine.cam_T[engine.view_slot[i]]
        # provided poses should not drift far after BA
        assert np.linalg.norm(est[:3, 3] - T_GtoC_gt[:3, 3]) < 10.0


@pytest.mark.slow
def test_capacity_growth():
    engine = _make_engine(view_capacity=4, obj_capacity=4)
    run_scene(engine, n_views=8)
    assert engine.V >= 8
    assert len(engine.view_ids) == 8
    res = engine.collect_results(final=True)
    assert len(res) == 8


def test_reset_clears_state():
    engine = _make_engine()
    run_scene(engine, n_views=3)
    engine.reset()
    assert engine.num_views_processed() == 0
    assert not engine.obj_active.any()
    run_scene(engine, n_views=3)
    assert engine.num_views_processed() == 3


def test_object_recovery_after_corrupt_start():
    """An object whose first detections are garbage must not poison the map:
    once clean detections arrive it ends with an accurate pose (reinit /
    late-init paths, `object_slam.py:581-591,595-697`)."""
    engine = _make_engine(global_opt_every=2)
    K, hw, kp, T_obj, cams = make_scene(n_obj=3, n_views=8, seed=9)
    rng = np.random.default_rng(2)
    for i, T_GtoC in enumerate(cams):
        obj_ids, bboxes, mks, mms, kms, uvs = project_frame(K, hw, kp, T_obj, T_GtoC)
        if i <= 4:
            # corrupt EVERY keypoint of object 2 for the first five views
            j = list(obj_ids).index(2)
            uvs[j] = rng.uniform(-0.95, 0.95, uvs[j].shape)
        engine.process_view(i, IMG, K, obj_ids, bboxes, mks, mms, kms, uv_gt=uvs)
    res = engine.collect_results(final=True)
    s2 = engine.obj_slot[2]
    assert engine.obj_active[s2], "object was not (re)initialized after clean views"
    T = res[7]["poses"][2]["T_OtoC"]
    T_gt = cams[7] @ T_obj[2]
    assert np.linalg.norm(T[:3, 3] - T_gt[:3, 3]) < 20.0
    # the clean objects were never disturbed
    for obj_id in (1, 3):
        T = res[7]["poses"][obj_id]["T_OtoC"]
        T_gt = cams[7] @ T_obj[obj_id]
        assert np.linalg.norm(T[:3, 3] - T_gt[:3, 3]) < 12.0


def test_object_removal_on_lost_inliers():
    """Direct check of the min-inlier removal (`object_slam.py:913-930`):
    an active object whose measurements are all outliers is dropped at the
    next global BA."""
    engine = _make_engine()
    K, hw, kp, T_obj, cams = make_scene(n_obj=2, n_views=3, seed=11)
    for i, T_GtoC in enumerate(cams):
        obj_ids, bboxes, mks, mms, kms, uvs = project_frame(K, hw, kp, T_obj, T_GtoC)
        engine.process_view(i, IMG, K, obj_ids, bboxes, mks, mms, kms, uv_gt=uvs)
    s = engine.obj_slot[1]
    assert engine.obj_active[s]
    # teleport the object estimate far away: every edge becomes chi2-outlier
    engine.obj_T[s][:3, 3] += np.asarray([500.0, 500.0, 500.0], np.float32)
    engine.obj_num_dets[1] = 5  # threshold becomes 6 inliers
    engine.optimize()  # global BA reclassifies, then removal check runs
    assert not engine.obj_active[s], "outlier-only object was not removed"


def test_device_mirrors_stay_consistent():
    """The incremental device mirrors of the bulk measurement buffers must
    equal the host source-of-truth after every frame and after global BA
    (a stale mirror silently corrupts the BA problem)."""
    engine = _make_engine(global_opt_every=3)
    K, hw, kp, T_obj, cams = make_scene(n_views=6)

    def check():
        for name in engine._MIRRORED:
            if name in engine._dev:
                np.testing.assert_array_equal(
                    np.asarray(engine._dev[name]), getattr(engine, name),
                    err_msg=f"device mirror of {name} diverged from host",
                )

    for i, T_GtoC in enumerate(cams):
        obj_ids, bboxes, mks, mms, kms, uvs = project_frame(K, hw, kp, T_obj, T_GtoC)
        engine.process_view(i, IMG, K, obj_ids, bboxes, mks, mms, kms, uv_gt=uvs)
        check()
    engine.collect_results(final=True)
    check()
    assert any(n in engine._dev for n in engine._MIRRORED), (
        "mirrors never exercised — the kernels stopped using _dev_buf?"
    )


@pytest.mark.slow  # every capacity doubling recompiles all kernel shapes
def test_device_mirrors_survive_capacity_growth():
    """_grow_views/_grow_objects reallocate the host buffers; mirrors must
    be invalidated and rebuilt at the new shapes."""
    engine = _make_engine(view_capacity=2, obj_capacity=2)
    K, hw, kp, T_obj, cams = make_scene(n_views=5)
    for i, T_GtoC in enumerate(cams):
        obj_ids, bboxes, mks, mms, kms, uvs = project_frame(K, hw, kp, T_obj, T_GtoC)
        engine.process_view(i, IMG, K, obj_ids, bboxes, mks, mms, kms, uv_gt=uvs)
    assert engine.V > 2 and engine.O > 2
    for name in engine._MIRRORED:
        if name in engine._dev:
            np.testing.assert_array_equal(
                np.asarray(engine._dev[name]), getattr(engine, name)
            )
