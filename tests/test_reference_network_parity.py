"""Closed-loop NETWORK-PATH parity: reference engine vs ours with the
network in the loop on both sides.

`test_reference_engine_parity.py` drives both engines in `debug_gt_kp` mode,
which bypasses the reference's network-side control flow entirely. This
harness closes that gap: both engines run with `debug_gt_kp=False` and a
shared DETERMINISTIC fake network injected at each side's model boundary —
`ObjectSLAM.model` (the torch module slot consumed inside `__run_kp_model`,
`/root/reference/lib/object_slam.py:1090-1099`) and our
`ObjectSlam(infer_fn=...)` — so the code under test on each side is its OWN
network-path plumbing:

  - keypoint filtering: validity-mask > 0.3, ROI-border threshold, and the
    2*kp_var_thresh stdev gate (`lib/object_slam.py:1102-1115` vs
    `slam/kernels.filter_keypoints`);
  - prior-detection construction for symmetric objects: map-pose projection,
    all-depths-positive gate, and the rasterized prior input
    (`lib/object_slam.py:486-519` + `utils.make_prior_kp_input`
    `lib/utils/utils.py:398-411` vs `engine._process_objects`);
  - the covariance-weighted chi2 paths (camera RANSAC `:1053-1065`, BA edge
    information, reinit voting) at REAL predicted covariance — the gt-kp
    harness could only exercise these at identity information.

The fake network is a pure function of (view, object, keypoint) plus the
prior input, so both engines receive bit-identical predictions; any
lifecycle/pose/inlier divergence is a control-flow difference. Its outputs
are constructed to make every gate non-vacuous: designated keypoints fail
the mask gate, the border gate, and the sigma gate; later views carry a
gross outlier (chi2 ~ 80 at the predicted sigma); and symmetric objects
answer UNDER A SYMMETRY TRANSFORM chosen from the prior when one is given
(else pseudorandomly per view) — so the prior-feedback loop is load-bearing:
without it the symmetry choice flips every view and the map falls apart.
"""

import contextlib
import io

import numpy as np
import pytest

from suo_slam_tpu.kp import config as kp_config
from suo_slam_tpu.slam import ObjectSlam, SlamConfig
from tests.helpers import reference_oracle
from tests.helpers.synthetic_scene import StubMeshDb, make_scene, project_frame
from tests.test_reference_engine_parity import (
    IMG,
    _to44,
    assert_pose_agree,
    assert_state_parity,
    assert_timeline_parity,
)

pytestmark = pytest.mark.slow

NK = kp_config.num_kp()
N_REAL_KP = 12
PRED_RES = (256, 256)

# designated control-flow probes: (obj_id, kp_channel)
LOWMASK = (1, 5)     # validity prob 0.05 -> dropped by the >0.3 mask gate
BIGSIG = (3, 2)      # stdev 0.7 -> dropped by the all(std < 2*0.2) gate
BORDER = (2, 4)      # uv pinned at 0.95 -> dropped by the |uv|<0.9 gate
OUTLIER = (1, 7)     # views >= OUTLIER_FROM: +0.45 NDC -> BA chi2 outlier
OUTLIER_FROM = 3
NOISE_STD = 0.003


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


SYM_R = [np.eye(3), _rotz(2 * np.pi / 3), _rotz(4 * np.pi / 3)]
SYM_OBJS = (2, 4)


def _sym_T(s):
    T = np.eye(4)
    T[:3, :3] = SYM_R[s]
    return T


def make_sym_scene(n_views=8, seed=0):
    """make_scene, but objects 2 and 4 get kp sets with an exact 3-fold
    z-symmetry (R_120 permutes the rows), so measurements under any symmetry
    candidate stay inside the GT bbox and PnP under a 'wrong' candidate
    yields the consistent pose T_obj @ S."""
    K, hw, kp, T_obj, cams = make_scene(
        n_obj=4, n_views=n_views, n_kp=N_REAL_KP, seed=seed
    )
    rng = np.random.default_rng(seed + 100)
    for obj in SYM_OBJS:
        base = rng.uniform(-40, 40, (N_REAL_KP // 3, 3))
        kp[obj] = np.concatenate([base, base @ SYM_R[1].T, base @ SYM_R[2].T])
    views = []
    for i, T_GtoC in enumerate(cams):
        obj_ids, bboxes, mks, mms, kms, uvs = project_frame(K, hw, kp, T_obj, T_GtoC)
        views.append((i, K, obj_ids, bboxes, mks, mms, kms, uvs))
    return views, (K, hw, kp, T_obj, cams)


def _quantize_prior_uv(uv, vh=PRED_RES[0], vw=PRED_RES[1]):
    """The raster->argmax roundtrip of the reference prior input: NDC uv is
    drawn as a Gaussian peaked at an integer pixel (`make_prior_kp_input`,
    `lib/utils/utils.py:398-411`), so a decoder recovers the pixel-center
    NDC. Both fake-net adapters apply the SAME quantization so their prior
    views are bit-identical."""
    u = float(np.clip(uv[0], -1.0, 1.0))
    v = float(np.clip(uv[1], -1.0, 1.0))
    px = int(round((u * vw / 2 + vw / 2) - 0.5))
    py = int(round(vh - 0.5 - (v * vh / 2 + vh / 2)))
    return np.array([(2 * px + 1 - vw) / vw, (vh - 1 - 2 * py) / vh], np.float64)


class FakeNetCore:
    """Deterministic network simulator shared by both engine adapters.

    Maps each incoming detection box back to its (view, object) via exact
    float32 bytes (boxes pass through both engines unmodified at
    bbox_inflate=0), then emits uv/cov/mask-prob that depend only on
    (view, object, keypoint) and the QUANTIZED prior peaks."""

    def __init__(self, views, scene):
        K, hw, kp, T_obj, cams = scene
        self.K, self.kp, self.T_obj, self.cams = K, kp, T_obj, cams
        self.box_index = {}
        for (i, _K, obj_ids, bboxes, *_rest) in views:
            for j, obj_id in enumerate(obj_ids):
                self.box_index[np.asarray(bboxes[j], np.float32).tobytes()] = (
                    i, int(obj_id),
                )
        # prior views as seen by each side, for a bit-identity assertion
        self.prior_log = {"ref": {}, "ours": {}}

    def _ndc_project(self, view, obj_id, box, s):
        """Project the object's model kps under symmetry candidate `s` into
        the box's NDC (same convention as `project_frame`)."""
        T = self.cams[view] @ self.T_obj[obj_id] @ _sym_T(s)
        pts = self.kp[obj_id]
        p_cam = pts @ T[:3, :3].T + T[:3, 3]
        uvw = p_cam @ self.K.T
        uv = uvw[:, :2] / uvw[:, 2:3]
        x1, y1, x2, y2 = np.asarray(box, np.float64)
        w, h = x2 - x1, y2 - y1
        return np.stack(
            [2 * (uv[:, 0] - x1) / w - 1, 1 - 2 * (uv[:, 1] - y1) / h], -1
        )

    def _choose_sym(self, view, obj_id, box, prior_present, prior_uvq):
        if obj_id not in SYM_OBJS:
            return 0
        if prior_present.any():
            # pick the candidate whose projection best explains the prior
            dists = []
            for s in range(len(SYM_R)):
                uv_s = self._ndc_project(view, obj_id, box, s)
                d = np.linalg.norm(
                    uv_s[prior_present[:N_REAL_KP]]
                    - prior_uvq[:N_REAL_KP][prior_present[:N_REAL_KP]],
                    axis=-1,
                ).mean()
                dists.append(d)
            return int(np.argmin(dists))
        # no prior: pseudorandom per (view, object) -> flips across views,
        # so a broken prior path cannot produce a consistent map
        return (view * 7 + obj_id * 5 + 1) % len(SYM_R)

    def outputs(self, side, boxes, prior_present, prior_uvq):
        """boxes [n,4] f32; prior_present [n,NK] bool; prior_uvq [n,NK,2]
        (quantized peaks; rows all-False where no prior). Returns
        (uv [n,NK,2] f32, cov [n,NK,2,2] f32, mask_prob [n,NK] f32)."""
        n = boxes.shape[0]
        uv = np.zeros((n, NK, 2), np.float32)
        cov = np.tile(np.eye(2, dtype=np.float32) * 1e4, (n, NK, 1, 1))
        maskp = np.full((n, NK), 0.01, np.float32)
        for r in range(n):
            key = np.asarray(boxes[r], np.float32).tobytes()
            hit = self.box_index.get(key)
            if hit is None:  # padded slot (ours) — engine discards the row
                continue
            view, obj_id = hit
            self.prior_log[side][(view, obj_id)] = (
                prior_present[r].copy(), prior_uvq[r].copy(),
            )
            s = self._choose_sym(view, obj_id, boxes[r], prior_present[r],
                                 prior_uvq[r])
            base_uv = self._ndc_project(view, obj_id, boxes[r], s)
            rng = np.random.default_rng(view * 1009 + obj_id * 101)
            base_uv = base_uv + rng.normal(0, NOISE_STD, base_uv.shape)
            uv[r, :N_REAL_KP] = base_uv
            maskp[r, :N_REAL_KP] = 0.95
            for k in range(N_REAL_KP):
                std = 0.04 + 0.03 * ((k * 37) % N_REAL_KP) / N_REAL_KP
                cov[r, k] = np.eye(2, dtype=np.float32) * std**2
            if obj_id == LOWMASK[0]:
                maskp[r, LOWMASK[1]] = 0.05
            if obj_id == BIGSIG[0]:
                cov[r, BIGSIG[1]] = np.eye(2, dtype=np.float32) * 0.7**2
            if obj_id == BORDER[0]:
                uv[r, BORDER[1]] = (0.95, 0.95)
            if obj_id == OUTLIER[0] and view >= OUTLIER_FROM:
                uv[r, OUTLIER[1]] += 0.45
        return uv, cov, maskp


class RefFakeModel:
    """Drop-in for the torch PkpNet consumed at
    `lib/object_slam.py:1090-1099`: called under no_grad with
    (img [1,3,H,W], [boxes], [priors [n,NK,256,256]]), returns the pred dict.
    Decodes the engine-rasterized prior channels back to quantized peaks."""

    def __init__(self, core):
        self.core = core

    def __call__(self, img_th, bboxes_th, priors_th):
        import torch

        boxes = bboxes_th[0].cpu().numpy()
        priors = priors_th[0].cpu().numpy()
        n = boxes.shape[0]
        present = np.zeros((n, NK), bool)
        uvq = np.zeros((n, NK, 2), np.float64)
        vh, vw = priors.shape[-2:]
        for r in range(n):
            for ch in range(NK):
                chan = priors[r, ch]
                if chan.max() > 0.5:
                    py, px = np.unravel_index(int(chan.argmax()), chan.shape)
                    present[r, ch] = True
                    uvq[r, ch] = ((2 * px + 1 - vw) / vw, (vh - 1 - 2 * py) / vh)
        uv, cov, maskp = self.core.outputs("ref", boxes, present, uvq)
        return {
            "uv": torch.tensor(uv),
            "cov": torch.tensor(cov),
            "kp_mask": torch.tensor(maskp),
        }


class OursFakeInfer:
    """Drop-in for `kernels.make_frame_inference`: called with
    (img, boxes [ob,4], obj_valid [ob], prior_uv [ob,NK,2],
    prior_valid [ob,NK]); applies the same raster->argmax quantization the
    reference side sees so both fakes receive bit-identical priors."""

    def __init__(self, core):
        self.core = core

    def __call__(self, img, boxes, obj_valid, prior_uv, prior_valid):
        boxes = np.asarray(boxes, np.float32)
        prior_uv = np.asarray(prior_uv, np.float64)
        present = np.asarray(prior_valid, bool)
        n = boxes.shape[0]
        uvq = np.zeros((n, NK, 2), np.float64)
        for r in range(n):
            for ch in np.where(present[r])[0]:
                uvq[r, ch] = _quantize_prior_uv(prior_uv[r, ch])
        uv, cov, maskp = self.core.outputs("ours", boxes, present, uvq)
        import jax.numpy as jnp

        return jnp.asarray(uv), jnp.asarray(cov), jnp.asarray(maskp)


# ---------------------------------------------------------------------------


def run_reference_netpath(views, core, mesh_db, **kw):
    mod = reference_oracle.load_object_slam()
    # Constructed in debug_gt_kp mode to skip the torch checkpoint load
    # (`lib/object_slam.py:86-95`), then flipped to the network path with the
    # fake model installed in the slot `__run_kp_model` consumes.
    eng = mod.ObjectSLAM(
        None, mesh_db.as_reference_dict(), debug_gt_kp=True, **kw,
    )
    eng.debug_gt_kp = False
    eng.no_network_cov = False
    eng.model = RefFakeModel(core)
    timeline = []
    log = io.StringIO()
    with contextlib.redirect_stdout(log):
        for (vid, K, obj_ids, bboxes, mks, mms, kms, _uvs) in views:
            eng.process_view(
                vid, IMG, K.copy(), obj_ids.copy(), bboxes.copy(), mks.copy(),
                mms.copy(), kms.copy(), uv_gt=None,
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
        "avg_std": eng.avg_std_meter.average(),
        "log": log.getvalue(),
    }
    return timeline, out


def run_ours_netpath(views, core, mesh_db, **cfg_kw):
    cfg = SlamConfig(
        debug_gt_kp=False, view_capacity=16, obj_capacity=8, **cfg_kw,
    )
    eng = ObjectSlam(cfg, mesh_db=mesh_db, infer_fn=OursFakeInfer(core))
    timeline = []
    for (vid, K, obj_ids, bboxes, mks, mms, kms, _uvs) in views:
        eng.process_view(
            vid, IMG, K.copy(), obj_ids.copy(), bboxes.copy(), mks.copy(),
            mms.copy(), kms.copy(), uv_gt=None,
        )
        timeline.append({
            "cams": {v for v in eng.view_ids if eng._has_cam_pose(v)},
            "objs": {o for o, s in eng.obj_slot.items() if eng.obj_active[s]},
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
        "avg_std": (eng.avg_std_sum / eng.avg_std_n) if eng.avg_std_n else 0.0,
    }
    return timeline, out


def _assert_priors_agree(core):
    """Both sides' fakes must have SEEN the same prior inputs: same
    (view, object) coverage, same per-channel presence, and the same
    quantized peaks to within ONE raster pixel — i.e. the reference's host
    rasterization + our uv/valid plumbing encode the same prior signal.

    One pixel (2/256 NDC) of slack is principled, not a fudge: each engine
    projects its OWN map estimate into the prior, and the two maps differ at
    the 1e-3 level from independent RANSAC draws, so a projection landing
    within that of a pixel-center boundary legitimately rounds to the
    neighboring cell. A plumbing bug (flipped axis, off-by-half-grid, wrong
    channel) shows up as a >1-pixel or systematic mismatch."""
    one_px = 2.0 / PRED_RES[0] + 1e-9
    ref, ours = core.prior_log["ref"], core.prior_log["ours"]
    assert set(ref) == set(ours), (
        f"prior coverage differs: ref-only {set(ref) - set(ours)}, "
        f"ours-only {set(ours) - set(ref)}"
    )
    n_exact = n_total = 0
    for key in ref:
        p_ref, uv_ref = ref[key]
        p_ours, uv_ours = ours[key]
        assert np.array_equal(p_ref, p_ours), f"prior presence differs at {key}"
        if not p_ref.any():
            continue
        d = np.abs(uv_ref[p_ref] - uv_ours[p_ours])
        assert d.max() <= one_px, (
            f"prior peaks differ by >1 raster pixel at {key}: max {d.max()}"
        )
        n_exact += int((d == 0).all(axis=-1).sum())
        n_total += int(p_ref.sum())
    # ties must be the rare case, not the norm (a systematic half-pixel
    # offset would make ~every element a "tie")
    assert n_exact >= 0.8 * n_total, (n_exact, n_total)


def test_network_path_full_slam_parity():
    """Full SLAM with the network path live on both sides: filtering gates,
    cov-weighted camera RANSAC / BA / reinit, symmetric prior feedback."""
    views, scene = make_sym_scene(n_views=8, seed=0)
    core = FakeNetCore(views, scene)
    mesh = StubMeshDb(8, symmetric=SYM_OBJS)
    tl_ref, ref = run_reference_netpath(views, core, mesh, global_opt_every=4)
    tl_ours, ours = run_ours_netpath(views, core, mesh, global_opt_every=4)

    assert_timeline_parity(tl_ref, tl_ours)
    assert_state_parity(ref, ours)
    _assert_priors_agree(core)

    # ---- non-vacuity: every probed gate actually fired, identically ----
    K, hw, kp, T_obj, cams = scene
    for (obj_id, ch), why in ((LOWMASK, "mask gate"), (BIGSIG, "sigma gate"),
                              (BORDER, "border gate")):
        for v in ref["kp_mask"]:
            if obj_id in ref["kp_mask"][v]:
                assert not ref["kp_mask"][v][obj_id][ch], (
                    f"{why} never fired for obj {obj_id} ch {ch} view {v}"
                )
                assert not ours["kp_mask"][v][obj_id][ch]
    # every OTHER real channel of a clean object survived the filters
    clean = ref["kp_mask"][0][4]
    assert clean[:N_REAL_KP].all() and not clean[N_REAL_KP:].any()

    # the gross outlier was chi2-rejected (same slot both sides, already
    # array-equal via assert_state_parity; check it actually fired)
    fired = 0
    for v in range(OUTLIER_FROM, len(views)):
        if OUTLIER[0] in ref["inliers"].get(v, {}):
            kp_idx = np.where(ref["kp_mask"][v][OUTLIER[0]])[0]
            pos = int(np.searchsorted(kp_idx, OUTLIER[1]))
            fired += int(~ref["inliers"][v][OUTLIER[0]][pos])
    assert fired >= 2, "gross-outlier rejection never fired"

    # the cov path was live (STD meter fed with real predicted sigmas).
    # Ours is the true kp-weighted mean of the base stds (0.04..0.07); the
    # reference's AverageMeter.update(x, k) adds x once but bumps n by k
    # (`lib/utils/eval_meter.py:52-60`), so its diagnostic reads ~mean/batch
    # — assert each side in its own convention, both strictly positive.
    assert 0.03 < ours["avg_std"] < 0.2, ours["avg_std"]
    assert 0.0 < ref["avg_std"] < ours["avg_std"], ref["avg_std"]

    # ---- prior feedback is load-bearing: symmetric objects locked to the
    # view-0 pseudorandom choice, which is a NON-identity transform for
    # object 2 — the map pose is T_obj @ S_lock, not T_obj ----
    for obj_id in SYM_OBJS:
        s_lock = (0 * 7 + obj_id * 5 + 1) % len(SYM_R)
        T_expect = T_obj[obj_id] @ _sym_T(s_lock)
        assert_pose_agree(ref["obj_T"][obj_id], T_expect,
                          f"sym obj {obj_id} lock", rot_tol=2.0, t_tol=6.0)
    assert (2 * 5 + 1) % 3 != 0, "fixture must lock obj 2 to a non-identity"


def test_network_path_give_all_prior_parity():
    """--give_all_prior: every object goes through the prior path once the
    camera pose exists (`lib/object_slam.py:357-360`) — non-symmetric
    objects' fakes still answer identity, but the prior plumbing runs for
    all four objects on both sides."""
    views, scene = make_sym_scene(n_views=6, seed=3)
    core = FakeNetCore(views, scene)
    mesh = StubMeshDb(8, symmetric=SYM_OBJS)
    tl_ref, ref = run_reference_netpath(
        views, core, mesh, give_all_prior=True, global_opt_every=3)
    tl_ours, ours = run_ours_netpath(
        views, core, mesh, give_all_prior=True, global_opt_every=3)
    assert_timeline_parity(tl_ref, tl_ours)
    assert_state_parity(ref, ours)
    _assert_priors_agree(core)
    # all four objects got priors from view 1 on
    covered = {o for (v, o) in core.prior_log["ref"] if v >= 1}
    assert covered == {1, 2, 3, 4}, covered
