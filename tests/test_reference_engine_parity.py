"""Closed-loop engine-vs-engine behavioral parity (system-level oracle).

Runs the ACTUAL reference engine (`/root/reference/lib/object_slam.py`) —
its native dependencies satisfied by this repo's drop-in shims
(`suo_slam_tpu.compat.g2o` / `.lambdatwist`, backed by the JAX solvers) —
head-to-head against our `slam/engine.py` on byte-identical synthetic
sequences, and asserts trajectory / object-pose / inlier / lifecycle
agreement. This converts the component-level differential parity
(`test_reference_parity.py`) into SYSTEM parity: the reference's control
flow (camera RANSAC gating `lib/object_slam.py:975-1072`, reinit voting
`:595-697`, the optimize() round schedule with chi2 edge switching
`:843-896`, removal ordering `:904-930`) executes for real on both sides.

Determinism / alignment notes:
  - Measurement noise is baked ONCE into the fixture's uv_gt; both engines'
    own noise injection is disabled (`np.random.normal` patched to zero for
    the reference's hardcoded `:1131` draw; `gt_kp_noise_std=0` for ours),
    so both consume identical inputs. The remaining nondeterminism is each
    side's RANSAC hypothesis sampling, which converges to the same optimum
    on these well-conditioned scenes.
  - `manual_kp_std=1.0` in BOTH engines makes every information matrix
    identity on both sides: the reference uses `np.eye(2)` for BA edges
    when cov is None (`:825-828`) but `1/sigma^2` in camera RANSAC
    (`:1060-1065`) and reinit voting (`:676-680`); ours uses `1/sigma^2`
    everywhere (the documented `manual_info` deviation, PARITY.md). At
    sigma=1 the two conventions coincide exactly, isolating control-flow
    parity from that deviation. `test_manual_info_deviation_quantified`
    then measures the deviation itself at the reference's realistic sigma.

Tolerances: both engines minimize the same objective with the same solver
family, so agreement is far tighter than accuracy vs GT; the bounds below
(0.5 deg / 2.5 length units) are several times the observed gaps.
"""

import contextlib
import io
from unittest import mock

import numpy as np
import pytest

from suo_slam_tpu.slam import ObjectSlam, SlamConfig
from tests.helpers import reference_oracle
from tests.helpers.synthetic_scene import (
    StubMeshDb,
    make_scene,
    project_frame,
    rot_err_deg,
)

pytestmark = pytest.mark.slow

IMG = np.zeros((240, 320, 3), np.float32)
ROT_TOL = 0.5  # deg
T_TOL = 2.5  # scene length units (objects at depth ~600)


def build_views(n_obj=4, n_views=8, seed=0, noise=0.005, corrupt=None):
    """Shared per-view input tuples; noise baked in so both engines see the
    same measurements. `corrupt(i, obj_ids, uvs, kp_masks, rng)` may mutate
    uvs in place to inject outliers."""
    K, hw, kp, T_obj, cams = make_scene(n_obj=n_obj, n_views=n_views, seed=seed)
    rng = np.random.default_rng(1234)
    views = []
    for i, T_GtoC in enumerate(cams):
        obj_ids, bboxes, mks, mms, kms, uvs = project_frame(K, hw, kp, T_obj, T_GtoC)
        uvs = (uvs + rng.normal(0, noise, uvs.shape) * kms[..., None]).astype(
            np.float32
        )
        if corrupt is not None:
            corrupt(i, obj_ids, uvs, kms, rng)
        views.append((i, K, obj_ids, bboxes, mks, mms, kms, uvs))
    return views, (K, hw, kp, T_obj, cams)


def _to44(T):
    out = np.eye(4)
    out[: T.shape[0], :] = np.asarray(T, np.float64)[:, :4]
    return out


def run_reference(views, mesh_db, gt_cam_poses=None, manual_kp_std=1.0, **kw):
    """Drive the actual reference ObjectSLAM; returns (per-view state
    timeline, final summary dict)."""
    mod = reference_oracle.load_object_slam()
    eng = mod.ObjectSLAM(
        None, mesh_db.as_reference_dict(), debug_gt_kp=True,
        manual_kp_std=manual_kp_std, **kw,
    )

    def zero_normal(loc=0.0, scale=1.0, size=None):
        return np.zeros(size if size is not None else ())

    timeline = []
    log = io.StringIO()
    with mock.patch.object(np.random, "normal", zero_normal), \
            contextlib.redirect_stdout(log):
        for (vid, K, obj_ids, bboxes, mks, mms, kms, uvs) in views:
            eng.process_view(
                vid, IMG, K.copy(), obj_ids.copy(), bboxes.copy(), mks.copy(),
                mms.copy(), kms.copy(), uv_gt=uvs.copy(),
                cam_pose=None if gt_cam_poses is None else gt_cam_poses[vid].copy(),
            )
            timeline.append({
                "cams": set(eng.cam_poses.keys()),
                "objs": set(eng.obj_poses.keys()),
            })
        res = eng.collect_results(no_viz=True, final=True)
    out = {
        "cam_T": {v: _to44(T) for v, T in eng.cam_poses.items()},
        "obj_T": {o: _to44(T) for o, T in eng.obj_poses.items()},
        "inliers": {
            v: {o: d["inliers"].copy() for o, d in det.items()}
            for v, det in eng.detections.items()
        },
        "kp_mask": {
            v: {o: d["kp_mask"].copy() for o, d in det.items()}
            for v, det in eng.detections.items()
        },
        "results": res,
        "log": log.getvalue(),
    }
    return timeline, out


def run_ours(views, mesh_db, gt_cam_poses=None, manual_kp_std=1.0, **cfg_kw):
    cfg = SlamConfig(
        debug_gt_kp=True, gt_kp_noise_std=0.0, manual_kp_std=manual_kp_std,
        view_capacity=16, obj_capacity=8, **cfg_kw,
    )
    eng = ObjectSlam(cfg, mesh_db=mesh_db)
    timeline = []
    for (vid, K, obj_ids, bboxes, mks, mms, kms, uvs) in views:
        eng.process_view(
            vid, IMG, K.copy(), obj_ids.copy(), bboxes.copy(), mks.copy(),
            mms.copy(), kms.copy(), uv_gt=uvs.copy(),
            cam_pose=None if gt_cam_poses is None else gt_cam_poses[vid].copy(),
        )
        timeline.append({
            "cams": {v for v in eng.view_ids if eng._has_cam_pose(v)},
            "objs": {
                o for o, s in eng.obj_slot.items() if eng.obj_active[s]
            },
        })
    res = eng.collect_results(final=True)
    inliers, kp_mask = {}, {}
    for vid, dets in eng.detections.items():
        v = eng.view_slot[vid]
        inliers[vid] = {}
        kp_mask[vid] = {}
        for obj_id in dets:
            s = eng.obj_slot[obj_id]
            m = eng.valid[v, s]
            inliers[vid][obj_id] = eng.inliers[v, s][m]
            kp_mask[vid][obj_id] = m.copy()
    out = {
        "cam_T": {
            v: _to44(eng.cam_T[eng.view_slot[v]])
            for v in eng.view_ids if eng._has_cam_pose(v)
        },
        "obj_T": {
            o: _to44(eng.obj_T[s])
            for o, s in eng.obj_slot.items() if eng.obj_active[s]
        },
        "inliers": inliers,
        "kp_mask": kp_mask,
        "results": res,
    }
    return timeline, out


def assert_pose_agree(Ta, Tb, what, rot_tol=ROT_TOL, t_tol=T_TOL):
    r = rot_err_deg(Ta[:3, :3], Tb[:3, :3])
    t = np.linalg.norm(Ta[:3, 3] - Tb[:3, 3])
    assert r < rot_tol and t < t_tol, (
        f"{what}: engines disagree rot={r:.3f} deg t={t:.3f}"
    )


def assert_state_parity(ref, ours, check_inliers=True):
    """Core comparison: same cameras/objects exist, same poses, same
    per-detection inlier classifications."""
    assert set(ref["cam_T"]) == set(ours["cam_T"]), "camera-pose-found sets differ"
    assert set(ref["obj_T"]) == set(ours["obj_T"]), "active-object sets differ"
    for v in ref["cam_T"]:
        assert_pose_agree(ref["cam_T"][v], ours["cam_T"][v], f"cam view {v}")
    for o in ref["obj_T"]:
        assert_pose_agree(ref["obj_T"][o], ours["obj_T"][o], f"obj {o}")
    # per-view T_OtoC from collect_results
    for v, r in ref["results"].items():
        assert v in ours["results"]
        for o, entry in r["poses"].items():
            T_ref = entry["T_OtoC"]
            ours_entry = ours["results"][v]["poses"].get(o, {})
            T_ours = ours_entry.get("T_OtoC") if ours_entry else None
            assert (T_ref is None) == (T_ours is None), (
                f"view {v} obj {o}: presence differs (ref {T_ref is not None}, "
                f"ours {T_ours is not None})"
            )
            if T_ref is not None:
                assert_pose_agree(T_ref, T_ours, f"T_OtoC view {v} obj {o}")
    if check_inliers:
        for v in ref["inliers"]:
            for o, inl_ref in ref["inliers"][v].items():
                inl_ours = ours["inliers"][v][o]
                assert inl_ref.shape == inl_ours.shape, (v, o)
                assert np.array_equal(inl_ref, inl_ours), (
                    f"view {v} obj {o}: inlier sets differ "
                    f"(ref {inl_ref.sum()}/{len(inl_ref)}, "
                    f"ours {inl_ours.sum()}/{len(inl_ours)})"
                )


def assert_timeline_parity(tl_ref, tl_ours):
    """Same lifecycle decisions at the same views (camera recovered,
    objects initialized/removed/re-added)."""
    assert len(tl_ref) == len(tl_ours)
    for i, (a, b) in enumerate(zip(tl_ref, tl_ours)):
        assert a["cams"] == b["cams"], f"after view {i}: cam sets {a['cams']} vs {b['cams']}"
        assert a["objs"] == b["objs"], f"after view {i}: obj sets {a['objs']} vs {b['objs']}"


# ---------------------------------------------------------------------------


def test_full_slam_parity():
    """SLAM mode: camera RANSAC, tracking BA, periodic + final global BA."""
    views, _ = build_views(n_obj=4, n_views=8)
    mesh = StubMeshDb(8)
    tl_ref, ref = run_reference(views, mesh, global_opt_every=4)
    tl_ours, ours = run_ours(views, mesh, global_opt_every=4)
    assert_timeline_parity(tl_ref, tl_ours)
    assert_state_parity(ref, ours)


def test_full_slam_parity_with_symmetric_objects():
    """Symmetric split + prior-detection path + second _process_objects
    pass; objects 2 and 4 symmetric (camera RANSAC from objects 1, 3)."""
    views, _ = build_views(n_obj=4, n_views=8, seed=2)
    mesh = StubMeshDb(8, symmetric=(2, 4))
    tl_ref, ref = run_reference(views, mesh, global_opt_every=4)
    tl_ours, ours = run_ours(views, mesh, global_opt_every=4)
    assert_timeline_parity(tl_ref, tl_ours)
    assert_state_parity(ref, ours)


def test_sfm_parity():
    """SfM mode: global BA every view, reinit window = all views."""
    views, _ = build_views(n_obj=3, n_views=5, seed=4)
    mesh = StubMeshDb(8)
    tl_ref, ref = run_reference(views, mesh, sfm_mode=True)
    tl_ours, ours = run_ours(views, mesh, sfm_mode=True)
    assert_timeline_parity(tl_ref, tl_ours)
    assert_state_parity(ref, ours)


def test_single_view_parity():
    """Single-view mode (PVNet-style): engine reset per view, PnP + per-view
    optimize, no camera estimation."""
    views, _ = build_views(n_obj=4, n_views=3, seed=5)
    mesh = StubMeshDb(8)
    for view in views:
        tl_ref, ref = run_reference([view], mesh, single_view_mode=True)
        tl_ours, ours = run_ours([view], mesh, single_view_mode=True)
        assert_state_parity(ref, ours)


def test_gt_cam_pose_parity():
    """--gt_cam_pose: external camera poses, every object via prior path."""
    views, (_, _, _, _, cams) = build_views(n_obj=4, n_views=5, seed=6)
    mesh = StubMeshDb(8)
    gt = {i: cams[i] for i in range(len(cams))}
    tl_ref, ref = run_reference(views, mesh, gt_cam_poses=gt, global_opt_every=4)
    tl_ours, ours = run_ours(views, mesh, gt_cam_poses=gt, global_opt_every=4)
    assert_timeline_parity(tl_ref, tl_ours)
    assert_state_parity(ref, ours)


def test_outlier_classification_parity():
    """Gross outliers (chi2 ~ 30 at identity info): both engines must flag
    the IDENTICAL per-keypoint outlier sets through the optimize() chi2
    switching (`lib/object_slam.py:877-892`)."""
    corrupted = {}

    def corrupt(i, obj_ids, uvs, kms, rng):
        if i == 0:
            return  # clean init view
        for j in range(uvs.shape[0]):
            sel = np.where(kms[j])[0]
            bad = rng.choice(sel, size=2, replace=False)
            uvs[j, bad] += 4.0 * rng.choice([-1.0, 1.0], (2, 2))
            corrupted[(i, int(obj_ids[j]))] = bad

    views, _ = build_views(n_obj=3, n_views=6, seed=7, corrupt=corrupt)
    mesh = StubMeshDb(8)
    tl_ref, ref = run_reference(views, mesh, global_opt_every=3)
    tl_ours, ours = run_ours(views, mesh, global_opt_every=3)
    assert_timeline_parity(tl_ref, tl_ours)
    assert_state_parity(ref, ours, check_inliers=True)
    # and the corrupted points really were rejected (not a vacuous pass)
    n_rej = 0
    for (v, o), bad in corrupted.items():
        if o in ref["inliers"].get(v, {}):
            kp_idx = np.where(ref["kp_mask"][v][o])[0]
            pos = np.searchsorted(kp_idx, bad)
            n_rej += int((~ref["inliers"][v][o][pos]).sum())
    assert n_rej >= len(corrupted), "outlier machinery never fired"


def test_near_degenerate_scene_parity():
    """Adversarial conditioning probe: one object's keypoints are made
    near-COPLANAR (z flattened to 2% of its spread) and its plane tilted
    toward edge-on, so per-object PnP for it is genuinely ill-conditioned
    and the two engines' independent RANSAC draws can land in different
    basins. What MUST still agree is the control flow: identical lifecycle
    timelines (camera recovered / objects initialized / removed at the same
    views) and camera poses — the camera RANSAC is anchored by the two
    well-conditioned objects, whose cov-gated chi2 voting should out-vote
    any flipped hypothesis from the degenerate one.

    MEASURED result (2026-08-18, this fixture): the engines agree to
    <= 0.01 deg / <1e-3 units on EVERY pose including the degenerate
    object — the global BA re-anchors object 2 through the two
    well-conditioned ones, so even when per-frame PnP basins could differ,
    both sides land in the same optimum. The asserted tolerances are
    deliberately looser than that measurement (cameras/clean objects
    2 deg / 10 units; degenerate object 25 deg / 60 units = shared
    orientation basin only) because the sub-0.01-deg agreement is
    convergence, not contract: a RANSAC basin flip before the final BA
    would be legitimate behavior, and this test must stay diagnostic
    (control-flow parity) rather than flaky. Exact inlier parity is NOT
    asserted — near the chi2 boundary an ill-conditioned pose legitimately
    flips individual classifications."""
    views, (K, hw, kp, T_obj, cams) = build_views(
        n_obj=3, n_views=6, seed=11, noise=0.004, corrupt=None,
    )
    # flatten object 2's kps onto a plane and tilt it near edge-on, then
    # re-project all views against the modified geometry
    kp[2] = kp[2].copy()
    kp[2][:, 2] *= 0.02
    T_obj[2] = T_obj[2].copy()
    T_obj[2][:3, :3] = T_obj[2][:3, :3] @ _euler_R_local(np.deg2rad(75.0))
    rng = np.random.default_rng(4321)
    views = []
    for i, T_GtoC in enumerate(cams):
        obj_ids, bboxes, mks, mms, kms, uvs = project_frame(K, hw, kp, T_obj, T_GtoC)
        uvs = (uvs + rng.normal(0, 0.004, uvs.shape) * kms[..., None]).astype(
            np.float32
        )
        views.append((i, K, obj_ids, bboxes, mks, mms, kms, uvs))
    mesh = StubMeshDb(8)
    tl_ref, ref = run_reference(views, mesh, global_opt_every=3)
    tl_ours, ours = run_ours(views, mesh, global_opt_every=3)

    assert_timeline_parity(tl_ref, tl_ours)
    assert set(ref["cam_T"]) == set(ours["cam_T"])
    assert set(ref["obj_T"]) == set(ours["obj_T"])
    for v in ref["cam_T"]:
        assert_pose_agree(ref["cam_T"][v], ours["cam_T"][v], f"cam view {v}",
                          rot_tol=2.0, t_tol=10.0)
    for o in ref["obj_T"]:
        if o == 2:
            assert_pose_agree(ref["obj_T"][o], ours["obj_T"][o],
                              "degenerate obj 2", rot_tol=25.0, t_tol=60.0)
        else:
            assert_pose_agree(ref["obj_T"][o], ours["obj_T"][o], f"obj {o}",
                              rot_tol=2.0, t_tol=10.0)
    # non-vacuity: the fixture really is ill-conditioned — object 2's kp
    # cloud is ~planar (smallest singular value << others)
    sv = np.linalg.svd(kp[2] - kp[2].mean(0), compute_uv=False)
    assert sv[2] < 0.05 * sv[0], sv


def _euler_R_local(rx):
    from suo_slam_tpu.data.bop import _euler2R_np

    return _euler2R_np(np.rad2deg([rx, 0.0, 0.0]))


def test_manual_info_deviation_quantified():
    """The ONE intentional behavioral deviation (PARITY.md): with manual
    covariance at realistic sigma, the reference BA weights edges with
    identity information (vacuous chi2 gate at NDC scale,
    `lib/object_slam.py:825-828`) while ours uses 1/sigma^2 (meaningful
    gate). Poses must still agree (uniform info scaling does not move the
    LS optimum); inlier COUNTS may differ, ours <= reference."""
    views, _ = build_views(n_obj=4, n_views=6, seed=8)
    mesh = StubMeshDb(8)
    _, ref = run_reference(views, mesh, manual_kp_std=0.01, global_opt_every=3)
    _, ours = run_ours(views, mesh, manual_kp_std=0.01, global_opt_every=3)
    assert set(ref["cam_T"]) == set(ours["cam_T"])
    for v in ref["cam_T"]:
        assert_pose_agree(ref["cam_T"][v], ours["cam_T"][v], f"cam view {v}",
                          rot_tol=1.0, t_tol=5.0)
    n_ref = sum(d.sum() for v in ref["inliers"].values() for d in v.values())
    n_ours = sum(d.sum() for v in ours["inliers"].values() for d in v.values())
    # reference gate at identity info is vacuous -> keeps everything
    assert n_ours <= n_ref


def test_ref_manual_info_exact_parity():
    """`SlamConfig.ref_manual_info` closes the manual_info deviation: the BA
    problem's information is rescaled back to identity for no-cov runs
    (exactly `lib/object_slam.py:825-828`), so the SAME sigma=0.01 scenario
    that exposes inlier-count divergence in
    `test_manual_info_deviation_quantified` must now produce IDENTICAL
    timelines, poses, and per-keypoint inlier sets."""

    def corrupt(i, obj_ids, uvs, kms, rng):
        # mild outliers on a few of object 2's keypoints: big enough that the
        # default 1/0.01^2 gate rejects them (chi2 >> 5.991), small enough
        # that the identity gate keeps them (r ~ 0.08 NDC -> chi2 ~ 0.006)
        j = list(obj_ids).index(2)
        uvs[j, 10:14] += 0.08

    views, _ = build_views(n_obj=4, n_views=6, seed=8, corrupt=corrupt)
    mesh = StubMeshDb(8)
    tl_ref, ref = run_reference(views, mesh, manual_kp_std=0.01,
                                global_opt_every=3)
    tl_ours, ours = run_ours(views, mesh, manual_kp_std=0.01,
                             global_opt_every=3, ref_manual_info=True)
    assert_timeline_parity(tl_ref, tl_ours)
    assert_state_parity(ref, ours)
    # the rescale must NOT leak into RANSAC/reinit: the run still finds the
    # same camera-pose set as the default-mode run (sanity, not parity)
    _, ours_default = run_ours(views, mesh, manual_kp_std=0.01,
                               global_opt_every=3)
    assert set(ours["cam_T"]) == set(ours_default["cam_T"])
    # non-vacuity: the scenario must actually distinguish the modes — the
    # default 1/sigma^2 gate keeps strictly fewer inliers than the vacuous
    # identity gate this test proves exact parity under
    n = lambda r: sum(d.sum() for v in r["inliers"].values() for d in v.values())
    assert n(ours_default) < n(ours), (n(ours_default), n(ours))


def test_low_inlier_removal_timing_parity():
    """The reference runs min-inlier object removal after EVERY optimize(),
    including the per-frame tracking opt (`lib/object_slam.py:904-930` is
    outside the `if not curr_only:` block). An object whose measurements go
    bad must disappear at the same view index in both engines, not only at
    the next global BA."""

    def corrupt(i, obj_ids, uvs, kms, rng):
        j = list(obj_ids).index(3)
        if i == 0:
            kms[j, 4:] = False  # only 4 clean kps at init -> low inlier budget
        else:
            uvs[j] += 4.0  # every later view pure outliers
            kms[j, 6:] = False

    views, _ = build_views(n_obj=3, n_views=6, seed=9, corrupt=corrupt)
    mesh = StubMeshDb(8)
    tl_ref, ref = run_reference(views, mesh, global_opt_every=5)
    tl_ours, ours = run_ours(views, mesh, global_opt_every=5)
    assert_timeline_parity(tl_ref, tl_ours)
    assert_state_parity(ref, ours)
    # the scenario actually removed object 3 somewhere before the end
    assert any(3 not in t["objs"] for t in tl_ref[1:]), (
        "object 3 never removed - scenario too weak"
    )
