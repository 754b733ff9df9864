"""Sliding-window BA: old camera poses freeze but still constrain objects."""

import numpy as np

from tests.test_slam_engine import _make_engine, make_scene, project_frame, rot_err_deg

IMG = np.zeros((240, 320, 3), np.float32)


def test_sliding_window_accuracy_and_freezing():
    eng_full = _make_engine()
    eng_win = _make_engine(max_active_views=3)
    K, hw, kp, T_obj, cams = make_scene(n_obj=4, n_views=8, seed=4)
    for eng in (eng_full, eng_win):
        for i, T in enumerate(cams):
            obj_ids, bboxes, mks, mms, kms, uvs = project_frame(K, hw, kp, T_obj, T)
            eng.process_view(i, IMG, K, obj_ids, bboxes, mks, mms, kms, uv_gt=uvs)
        eng.collect_results(final=True)

    # windowed mode stays accurate on a clean scene
    for i, T_gt in enumerate(cams):
        est = eng_win.cam_T[eng_win.view_slot[i]]
        assert rot_err_deg(est[:3, :3], T_gt[:3, :3]) < 2.0
        assert np.linalg.norm(est[:3, 3] - T_gt[:3, 3]) < 15.0
    # object poses agree between full and windowed BA
    for obj_id, s in eng_full.obj_slot.items():
        sw = eng_win.obj_slot[obj_id]
        if eng_full.obj_active[s] and eng_win.obj_active[sw]:
            d = np.linalg.norm(
                eng_full.obj_T[s][:3, 3] - eng_win.obj_T[sw][:3, 3]
            )
            assert d < 10.0, (obj_id, d)
