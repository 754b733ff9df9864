"""Jitted device kernels for the SLAM front-end.

These replace the per-frame hot paths of the reference engine with batched
on-device programs:

- `frame_inference`: ROI crop + prior render + PkpNet forward + keypoint
  filtering for every object in a frame in ONE jitted call (reference:
  `lib/object_slam.py:1077-1115` — roi_align, host prior rasterization,
  torch forward, numpy filtering).
- `pnp_frame`: batched uncertainty-gated PnP with the depth sanity gate
  (reference: per-object `pnp()` python loop + lambdatwist C++,
  `lib/object_slam.py:1140-1151`).
- `camera_pose_ransac`: all object-pose hypotheses scored against all
  keypoints in one [H, O, K] tensor program (reference: triple python loop,
  `lib/object_slam.py:1030-1068`).
- `reinit_counts`: chi2 inlier counts of PnP-vs-estimated object poses over
  the last N views (reference: `lib/object_slam.py:640-686`).

All kernels are static-shape over padded buffers with validity masks and are
cached per capacity bucket.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import lie
from ..solvers import ba
from ..solvers import pnp as pnp_mod
from ..solvers.ba import CHI2_THRESH_2DOF

COV_DIAG_FLOOR = 1e-4  # reference floors cov diag at 1e-4 (`object_slam.py:669,1054`)


def info_from_cov(cov: jax.Array) -> jax.Array:
    """2x2 information = inverse covariance with floored diagonal.

    Closed-form inverse; the floor matches the reference's RANSAC/reinit paths
    (`object_slam.py:1053-1055`). Applied uniformly (the reference BA inverts
    the raw covariance, `:826-827` — same result away from the floor).
    """
    a = jnp.maximum(cov[..., 0, 0], COV_DIAG_FLOOR)
    d = jnp.maximum(cov[..., 1, 1], COV_DIAG_FLOOR)
    b = cov[..., 0, 1]
    det = jnp.maximum(a * d - b * b, 1e-12)
    inv = jnp.stack(
        [jnp.stack([d, -b], -1), jnp.stack([-b, a], -1)], axis=-2
    ) / det[..., None, None]
    return inv


def manual_info(shape, manual_kp_std: jax.Array | float, dtype=jnp.float32) -> jax.Array:
    """Isotropic information I / sigma^2 for the no-network-cov path.

    NOTE (deliberate deviation): the reference BA uses the identity
    information in no-cov mode (`object_slam.py:825-828`), which makes the
    5.991 chi2 gate vacuous in NDC units; its RANSAC/reinit paths use
    1/manual_kp_std^2 (`:1060-1062`). We use 1/manual_kp_std^2 everywhere for
    consistent gating.
    """
    s2 = jnp.asarray(manual_kp_std, dtype) ** 2
    eye = jnp.eye(2, dtype=dtype) / s2
    return jnp.broadcast_to(eye, tuple(shape) + (2, 2))


def filter_keypoints(
    uv: jax.Array,
    cov: jax.Array | None,
    mask_prob: jax.Array,
    model_mask: jax.Array,
    bbox_thresh: float = 0.9,
    kp_var_thresh: float = 0.2,
    mask_thresh: float = 0.3,
) -> jax.Array:
    """Predicted-keypoint validity filter (`object_slam.py:1102-1115`).

    Keep channels that the validity head accepts (> mask_thresh), that the
    object has (model_mask), that are away from the ROI border
    (|uv| < bbox_thresh), and — when covariance is predicted — whose stdevs
    are both below 2 * kp_var_thresh (fraction of the bbox span 2).
    """
    keep = (mask_prob > mask_thresh) & model_mask
    keep &= (jnp.min(uv, -1) > -bbox_thresh) & (jnp.max(uv, -1) < bbox_thresh)
    if cov is not None:
        std = jnp.sqrt(jnp.maximum(cov[..., (0, 1), (0, 1)], 0.0))
        keep &= jnp.all(std < 2.0 * kp_var_thresh, axis=-1)
    return keep


@partial(jax.jit, static_argnames=("n_hyp",))
def pnp_frame(
    model_kps: jax.Array,   # [O, K, 3]
    uv: jax.Array,          # [O, K, 2] NDC predictions
    kp_mask: jax.Array,     # [O, K] filtered validity
    cam_k4: jax.Array,      # [O, 4] NDC-fixed (fx, fy, cx, cy)
    diameters: jax.Array,   # [O]
    key: jax.Array,
    n_hyp: int = 64,
) -> tuple[jax.Array, jax.Array]:
    """Batched per-object PnP with the reference acceptance gates.

    Returns (T_OtoC [O, 4, 4], success [O]). A pose is accepted when PnP
    succeeds with >= 4 inliers and t_z > 0.5 * diameter
    (`object_slam.py:1145-1151`). Failed slots hold identity.
    """
    y_norm = (uv - cam_k4[:, None, 2:]) / cam_k4[:, None, :2]
    res = pnp_mod.pnp_ransac_batch(model_kps, y_norm, kp_mask, key, n_hyp=n_hyp)
    ok = res.success & (res.num_inliers >= 4) & (res.T[:, 2, 3] > 0.5 * diameters)
    T = jnp.where(ok[:, None, None], res.T, jnp.eye(4, dtype=res.T.dtype))
    return T, ok


def _chi2_counts(T_OtoC, model_kp, uv, info, mask, cam_k4, chi2_thresh):
    """Masked chi2 inlier count for [..., O, K] measurement sets.

    T_OtoC: [..., O, 4, 4]; model_kp/uv/info/mask/cam_k4 broadcast over the
    leading dims. Points behind the camera never count (`z > 0` gate,
    `object_slam.py:1042-1044`).
    """
    p = (
        jnp.einsum("...oij,okj->...oki", T_OtoC[..., :3, :3], model_kp)
        + T_OtoC[..., None, :3, 3]
    )
    z = p[..., 2]
    iz = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = cam_k4[..., 0:1] * p[..., 0] * iz + cam_k4[..., 2:3]
    v = cam_k4[..., 1:2] * p[..., 1] * iz + cam_k4[..., 3:4]
    r = uv - jnp.stack([u, v], -1)
    chi2 = jnp.einsum("...i,...ij,...j->...", r, info, r)
    good = (chi2 <= chi2_thresh) & (z > 0) & mask
    return jnp.sum(good, axis=(-2, -1))


@jax.jit
def camera_pose_ransac(
    T_pnp: jax.Array,       # [O, 4, 4] current-frame PnP object poses
    pnp_ok: jax.Array,      # [O]
    T_obj: jax.Array,       # [O, 4, 4] estimated T_OtoG
    obj_ok: jax.Array,      # [O] object has a map estimate
    model_kp: jax.Array,    # [O, K, 3]
    uv: jax.Array,          # [O, K, 2] current detections
    info: jax.Array,        # [O, K, 2, 2]
    inliers: jax.Array,     # [O, K] current inlier classification
    cam_k4: jax.Array,      # [O, 4]
    min_num_inliers: int = 4,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """RANSAC over per-object camera-pose hypotheses
    (`object_slam.py:975-1072`).

    Hypothesis h_j: T_GtoC = T_pnp[j] @ inv(T_obj[j]). Every hypothesis is
    scored against every object's inlier keypoints via covariance-weighted
    chi2 — one [O_hyp, O, K] tensor contraction instead of the reference's
    triple loop. Objects whose current detection has zero inliers don't score
    (`:1037`).

    Returns (T_GtoC [4, 4], num_inliers, ok).
    """
    cand = pnp_ok & obj_ok
    T_hyp = T_pnp @ lie.invert_SE3(T_obj)  # [O, 4, 4]
    T_OtoC_hyp = T_hyp[:, None] @ T_obj[None, :]  # [H=O, O, 4, 4]
    score_mask = inliers & (jnp.any(inliers, -1) & cand)[:, None]
    counts = _chi2_counts(
        T_OtoC_hyp, model_kp, uv[None], info[None], score_mask[None],
        cam_k4[None], CHI2_THRESH_2DOF,
    )  # [H]
    counts = jnp.where(cand, counts, -1)
    best = jnp.argmax(counts)
    best_count = counts[best]
    ok = best_count >= min_num_inliers
    T_best = jnp.where(ok, T_hyp[best], jnp.eye(4, dtype=T_hyp.dtype))
    return T_best, best_count, ok


@jax.jit
def reinit_counts(
    T_pnp_OtoG: jax.Array,  # [O, 4, 4] world-frame pose from current PnP
    T_est_OtoG: jax.Array,  # [O, 4, 4] current map estimate
    cam_T: jax.Array,       # [N, 4, 4] poses of the views to check
    cam_valid: jax.Array,   # [N]
    model_kp: jax.Array,    # [O, K, 3]
    uv: jax.Array,          # [N, O, K, 2] detections in those views
    info: jax.Array,        # [N, O, K, 2, 2]
    valid: jax.Array,       # [N, O, K] detected-kp masks (NOT inlier-gated,
                            #           matching `object_slam.py:655-686`)
    cam_k4: jax.Array,      # [N, O, 4]
) -> tuple[jax.Array, jax.Array]:
    """chi2 inlier counts over the last N views for PnP vs estimated poses.

    Returns (count_pnp [O], count_est [O]).
    """
    mask = valid & cam_valid[:, None, None]

    # per-object counts: sum over views and keypoints, keep the O axis
    def counts_obj(T_OtoG):
        T_OtoC = cam_T[:, None] @ T_OtoG[None]
        p = (
            jnp.einsum("noij,okj->noki", T_OtoC[..., :3, :3], model_kp)
            + T_OtoC[:, :, None, :3, 3]
        )
        z = p[..., 2]
        iz = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
        u = cam_k4[..., 0:1] * p[..., 0] * iz + cam_k4[..., 2:3]
        v = cam_k4[..., 1:2] * p[..., 1] * iz + cam_k4[..., 3:4]
        r = uv - jnp.stack([u, v], -1)
        chi2 = jnp.einsum("noki,nokij,nokj->nok", r, info, r)
        good = (chi2 <= CHI2_THRESH_2DOF) & (z > 0) & mask
        return jnp.sum(good, axis=(0, 2))  # [O]

    return counts_obj(T_pnp_OtoG), counts_obj(T_est_OtoG)


@partial(jax.jit, static_argnames=("n_hyp",))
def frontend_step(
    uv: jax.Array,            # [ob, K, 2] predicted NDC keypoints
    cov: jax.Array | None,    # [ob, K, 2, 2] network covariance (None: manual)
    mask_prob: jax.Array | None,  # [ob, K] validity-head probs (None: debug)
    keep_in: jax.Array | None,    # [ob, K] precomputed keep (debug_gt_kp)
    model_kps: jax.Array,     # [ob, K, 3]
    model_masks: jax.Array,   # [ob, K]
    cam_k4: jax.Array,        # [ob, 4]
    diams: jax.Array,         # [ob] (inf for padded slots)
    key: jax.Array,
    manual_kp_std,            # traced scalar
    bbox_thresh, kp_var_thresh, mask_thresh,  # traced scalars
    slots: jax.Array | None = None,       # [ob] int32 object slots (pad = O)
    obj_T: jax.Array | None = None,       # [O, 4, 4] map estimates
    obj_active: jax.Array | None = None,  # [O]
    model_kp_full: jax.Array | None = None,  # [O, K, 3] slot-indexed mirror
    n_hyp: int = 64,
    min_num_inliers=4,
):
    """Fused per-group front-end: keypoint filter -> batched PnP ->
    information matrices -> (optionally) camera-pose RANSAC, with NO host
    round-trip between the stages (VERDICT r4 item 1; the reference pays a
    Python<->C++ boundary per stage, `lib/object_slam.py:9-10,1077-1151`).

    The camera RANSAC stage runs when `slots`/`obj_T`/`obj_active`/
    `model_kp_full` are given (statically, by pytree structure): the
    frame-local results are scattered into slot-indexed [O] rows (exactly
    what the host buffer writes + `camera_pose_ransac` over the synced view
    row used to compute) so the hypothesis scoring is bit-identical to the
    unfused path.

    Returns a dict of small per-frame arrays — the caller reads them back in
    ONE `jax.device_get` (the frame's first of two host syncs).
    """
    if keep_in is not None:
        keep = keep_in  # debug_gt_kp: dataset masks as-is (`object_slam.py:1126`)
    else:
        keep = filter_keypoints(
            uv, cov, mask_prob, model_masks,
            bbox_thresh, kp_var_thresh, mask_thresh,
        )
    T_pnp, pnp_ok = pnp_frame(
        model_kps, uv, keep, cam_k4, diams, key, n_hyp=n_hyp
    )
    if cov is not None:
        info = info_from_cov(cov)
        std = jnp.sqrt(jnp.maximum(cov[..., (0, 1), (0, 1)], 0.0))
        std_sum = jnp.sum(jnp.where(keep[..., None], std, 0.0))
        std_cnt = 2 * jnp.sum(keep)
    else:
        info = manual_info(uv.shape[:2], manual_kp_std, dtype=uv.dtype)
        std_sum = jnp.zeros((), uv.dtype)
        std_cnt = jnp.zeros((), jnp.int32)
    out = {
        "uv": uv, "cov": cov, "keep": keep, "info": info,
        "T_pnp": T_pnp, "pnp_ok": pnp_ok,
        "std_sum": std_sum, "std_cnt": std_cnt,
    }
    if slots is not None:
        O = obj_T.shape[0]
        K = uv.shape[1]
        dt = uv.dtype
        at = lambda a: a.at[slots]
        T_row = at(jnp.tile(jnp.eye(4, dtype=dt), (O, 1, 1))).set(T_pnp, mode="drop")
        ok_row = at(jnp.zeros((O,), bool)).set(pnp_ok, mode="drop")
        uv_row = at(jnp.zeros((O, K, 2), dt)).set(uv, mode="drop")
        info_row = at(jnp.zeros((O, K, 2, 2), dt)).set(info, mode="drop")
        keep_row = at(jnp.zeros((O, K), bool)).set(keep, mode="drop")
        k4_row = at(jnp.zeros((O, 4), dt)).set(cam_k4, mode="drop")
        T_cam, cam_count, cam_ok = camera_pose_ransac(
            T_row, ok_row, obj_T, obj_active & ok_row, model_kp_full,
            uv_row, info_row, keep_row, k4_row, min_num_inliers,
        )
        out.update({"T_cam": T_cam, "cam_count": cam_count, "cam_ok": cam_ok})
    return out


@partial(jax.jit, static_argnames=("iters_per_round",))
def tracking_tail(
    uv_m: jax.Array,       # [V, O, K, 2]   measurement-buffer mirrors
    info_m: jax.Array,     # [V, O, K, 2, 2]
    valid_m: jax.Array,    # [V, O, K]
    inliers_m: jax.Array,  # [V, O, K]
    cam_k4_m: jax.Array,   # [V, O, 4]
    model_kp_m: jax.Array,  # [O, K, 3]
    v,                     # int32 scalar: current view slot
    cam_T_v: jax.Array,    # [4, 4] current camera pose (host truth)
    obj_T: jax.Array,      # [O, 4, 4] map poses incl. this frame's non-sym inits
    obj_active: jax.Array,  # [O]
    sym: dict | None,      # symmetric-group frontend outputs + "slots"/"cam_k4"
    reinit: dict | None,   # cand_sel [O], T_pnp_G [O,4,4], cs [n], cam_valid [n],
                           # cam_T_w [n,4,4]
    info_scale,            # traced scalar (ref_manual_info rescale, else 1.0)
    init_with_outliers,    # traced bool
    iters_per_round: tuple = (10, 10, 10, 10),
):
    """Fused per-frame tail: scatter the symmetric group's measurements into
    the device mirrors -> late object init -> re-init voting -> tracking BA,
    one dispatch chain ending in the frame's SECOND (final) host sync.

    Replaces the unfused sequence sym-slot-sync + `reinit_counts` +
    `ba.optimize(curr_only)` (reference: `lib/object_slam.py:595-697` +
    `:703-930` per frame). Mirrors are returned updated; the small `out`
    pytree carries everything the host bookkeeping needs (sym results, late
    inits, reinit decisions, the BA'd camera pose + inlier row).
    """
    O, K = model_kp_m.shape[:2]
    dt = cam_T_v.dtype
    ok_row = jnp.zeros((O,), bool)
    T_pnp_row = jnp.tile(jnp.eye(4, dtype=dt), (O, 1, 1))
    late = jnp.zeros((O,), bool)
    if sym is not None:
        sl = sym["slots"]
        uv_m = uv_m.at[v, sl].set(sym["uv"], mode="drop")
        info_m = info_m.at[v, sl].set(sym["info"], mode="drop")
        valid_m = valid_m.at[v, sl].set(sym["keep"], mode="drop")
        inliers_m = inliers_m.at[v, sl].set(sym["keep"], mode="drop")
        cam_k4_m = cam_k4_m.at[v, sl].set(sym["cam_k4"], mode="drop")
        ok_row = ok_row.at[sl].set(sym["pnp_ok"], mode="drop")
        T_pnp_row = T_pnp_row.at[sl].set(sym["T_pnp"], mode="drop")
        # late init (`object_slam.py:581-591`): a detected-but-unmapped
        # object with a successful PnP enters the map at inv(T_GtoC) @ T_pnp
        late = ok_row & ~obj_active
        T_init = lie.invert_SE3(cam_T_v)[None] @ T_pnp_row
        obj_T = jnp.where(late[:, None, None], T_init, obj_T)
        obj_active = obj_active | late

    reinit_cond = jnp.zeros((O,), bool)
    if reinit is not None:
        # chi2 vote over the last-N-views window (`object_slam.py:595-697`).
        # Candidates: current-frame detections with a PnP pose on an active
        # object. Freshly late-initialized objects are formal candidates but
        # can never fire (T_pnp_G == their new map pose -> equal counts).
        T_pnp_G = jnp.where(
            reinit["cand_sel"][:, None, None],
            reinit["T_pnp_G"],
            lie.invert_SE3(cam_T_v)[None] @ T_pnp_row,
        )
        sel = reinit["cand_sel"] | (ok_row & obj_active)
        cs = reinit["cs"]
        n_pnp, n_est = reinit_counts(
            T_pnp_G, obj_T, reinit["cam_T_w"], reinit["cam_valid"],
            model_kp_m, uv_m[cs], info_m[cs], valid_m[cs], cam_k4_m[cs],
        )
        reinit_cond = sel & (n_pnp >= 3) & (n_pnp > 3 * n_est)
        obj_T = jnp.where(reinit_cond[:, None, None], T_pnp_G, obj_T)

    # tracking BA over the current view row only (O(1) in view capacity)
    row = lambda a: jax.lax.dynamic_slice_in_dim(a, v, 1, axis=0)
    uv_r, info_r, valid_r, inl_r, k4_r = (
        row(uv_m), row(info_m), row(valid_m), row(inliers_m), row(cam_k4_m)
    )
    problem = ba.BAProblem(
        cam_T=cam_T_v[None],
        obj_T=obj_T,
        uv=uv_r,
        info=info_r * info_scale,
        model_kp=model_kp_m,
        cam_k=k4_r,
        valid=valid_r,
        inliers=inl_r,
        cam_active=jnp.ones((1,), bool),
        obj_active=obj_active,
    )
    res = ba.optimize(
        problem, iters_per_round=iters_per_round, tracking_only=True,
        fix_first_cam=False, init_with_outliers=init_with_outliers,
    )
    # reference skips the tracking opt below 3 inlier edges in the current
    # frame (`object_slam.py:730`); select instead of branching
    did_opt = jnp.sum(inl_r[0] & obj_active[:, None]) >= 3
    cam_T_new = jnp.where(did_opt, res.cam_T[0], cam_T_v)
    inl_new = jnp.where(did_opt, res.inliers[0], inl_r[0])
    inliers_m = jax.lax.dynamic_update_slice_in_dim(
        inliers_m, inl_new[None], v, axis=0
    )
    mirrors = (uv_m, info_m, valid_m, inliers_m, cam_k4_m)
    out = {
        "late": late,
        "obj_T": obj_T,
        "reinit_cond": reinit_cond,
        "did_opt": did_opt,
        "cam_T_v": cam_T_new,
        "inliers_row": inl_new,
    }
    return mirrors, out


def make_frame_inference(net, variables, input_hw=(256, 256), int8=False,
                         int8_scales=None, int8_calib_frames=8):
    """Build the jitted fused per-frame network call.

    variables: the flax variables dict (`net.init(...)` / checkpoint) —
    params plus batch_stats for BatchNorm models. A bare params tree is
    wrapped for backward compatibility.

    int8=True routes the backbone through the int8-RESIDENT executor
    (`models/int8_forward.py`). Activation scales come from, in order of
    preference:
      - `int8_scales`: a persisted calibration tuple (offline
        `calibrate_int8.py` -> `int8_forward.load_scales` sidecar) — the
        production path; session-independent, robust to any first frame.
      - online fallback: absmax accumulated over the first
        `int8_calib_frames` processed frames' crops (tree-maximized, so an
        unrepresentative first frame — dark/empty scene — cannot pin the
        range; each calibration frame costs one extra f32 traversal).
        Scales are traced args of the jitted executor, so the per-frame
        updates never recompile.

    Returns fn(img [H, W, 3], boxes [O, 4], obj_valid [O], prior_uv [O, K, 2],
    prior_valid [O, K], has_prior=True) -> (uv [O, K, 2],
    cov [O, K, 2, 2] | None, mask_prob [O, K]).

    has_prior=False (host-static: the caller knows `prior_valid.any()`
    without a device sync) dispatches a program with the prior path
    statically absent — prior render, quantization, and injection conv all
    compiled away. Every non-symmetric batch and ALL of single-view
    evaluation take it; outputs are bit-identical to the default program on
    an all-zero prior. The returned fn advertises `supports_no_prior=True`.
    """
    from ..ops import heatmap as hm
    from ..ops import roi as roi_ops

    if "params" not in variables:
        variables = {"params": variables}
    phw = net.prior_hw(input_hw)

    def crop_stage(img, boxes, obj_valid):
        return roi_ops.roi_crop_batch(
            img[None], boxes[None], obj_valid[None], input_hw
        )[0]

    def stage(img, boxes, obj_valid, prior_uv, prior_valid):
        crops = crop_stage(img, boxes, obj_valid)
        prior = hm.render_prior_heatmaps(
            prior_uv, prior_valid, hw=phw, sigma_px=hm.prior_sigma_for(phw)
        )
        return crops, prior

    if not int8:

        @jax.jit
        def fn_p(img, boxes, obj_valid, prior_uv, prior_valid):
            crops, prior = stage(img, boxes, obj_valid, prior_uv, prior_valid)
            out = net.apply(variables, crops, prior)
            return out.uv, out.cov, out.kp_mask

        @jax.jit
        def fn_np(img, boxes, obj_valid):
            out = net.apply(variables, crop_stage(img, boxes, obj_valid))
            return out.uv, out.cov, out.kp_mask

        def fn(img, boxes, obj_valid, prior_uv, prior_valid, has_prior=True):
            if has_prior:
                return fn_p(img, boxes, obj_valid, prior_uv, prior_valid)
            return fn_np(img, boxes, obj_valid)

        fn.supports_no_prior = True
        return fn

    from ..models import int8_forward as i8

    if int8_scales is None and int8_calib_frames < 1:
        raise ValueError(
            "int8 inference needs activation scales: pass int8_scales (a "
            "persisted sidecar) or int8_calib_frames >= 1 for online "
            "calibration"
        )
    apply_i8 = i8.make_int8_apply(net)
    apply_i8_np = i8.make_int8_apply(net, no_prior=True)
    stage_j = jax.jit(stage)
    state = {}

    @jax.jit
    def run_i8(variables_q, scales, img, boxes, obj_valid, prior_uv, prior_valid):
        # single fused dispatch per frame (ROI + prior render + int8 net),
        # matching the bf16 branch; weights arrive pre-quantized
        crops, prior = stage(img, boxes, obj_valid, prior_uv, prior_valid)
        out = apply_i8(variables_q, scales, crops, prior)
        return out.uv, out.cov, out.kp_mask

    @jax.jit
    def run_i8_np(variables_q, scales, img, boxes, obj_valid):
        out = apply_i8_np(variables_q, scales, crop_stage(img, boxes, obj_valid))
        return out.uv, out.cov, out.kp_mask

    if int8_scales is not None:
        state["scales"] = tuple(jnp.asarray(s) for s in int8_scales)
        state["n_calib"] = int8_calib_frames  # calibration complete

    def fn(img, boxes, obj_valid, prior_uv, prior_valid, has_prior=True):
        if state.get("n_calib", 0) < int8_calib_frames:
            crops, prior = stage_j(img, boxes, obj_valid, prior_uv, prior_valid)
            # A frame often has no prior detections (frame 1 never does: no
            # object has a map pose yet), so its rendered prior can be
            # all-zero — calibrating the prior quant point on it would
            # collapse that scale to ~1e-8 and silently erase all later
            # prior feedback. Calibrate with a worst-case prior instead:
            # peak-1 Gaussians on every channel (the prior's value range is
            # [0, 1] by construction, `ops/heatmap.py
            # render_prior_heatmaps`).
            k = prior.shape[-1]
            full_uv = jnp.zeros((prior.shape[0], k, 2), prior.dtype)
            full_prior = hm.render_prior_heatmaps(
                full_uv, jnp.ones((prior.shape[0], k), bool), hw=phw,
                sigma_px=hm.prior_sigma_for(phw),
            ).astype(prior.dtype)
            s = i8.calibrate(net, variables, [crops], [full_prior])
            state["scales"] = (
                s if "scales" not in state
                else jax.tree.map(jnp.maximum, state["scales"], s)
            )
            state["n_calib"] = state.get("n_calib", 0) + 1
        if "vq" not in state:
            state["vq"] = i8.quantize_weights(net, variables)
        if not has_prior:
            return run_i8_np(state["vq"], state["scales"], img, boxes, obj_valid)
        return run_i8(state["vq"], state["scales"], img, boxes, obj_valid,
                      prior_uv, prior_valid)

    fn.int8_state = state  # introspection for tests / scale persistence
    fn.supports_no_prior = True
    return fn


def make_batch_inference(net, variables, input_hw=(256, 256), int8=False,
                         int8_scales=None):
    """Multi-VIEW no-prior network call for the batched single-view
    evaluator (`evaluate.py --batched`).

    Where `make_frame_inference` serves one frame's object bucket per
    dispatch (latency path), this packs a WINDOW of views into one jitted
    program — ROI crop over [G] images + the statically prior-free int8/bf16
    executor over the flattened [G*O] crop batch — so single-view evaluation
    runs at the throughput the chip delivers on large batches (bench.py)
    instead of being bound by per-view dispatch latency. Single-view mode
    never has priors (`lib/object_slam.py:361-362`), so only the no-prior
    program exists here.

    Returns fn(imgs [G, H, W, 3], boxes [G, O, 4], valid [G, O]) ->
    (uv [G, O, K, 2], cov [G, O, K, 2, 2] | None, mask_prob [G, O, K]).
    With a persisted scales sidecar the per-crop outputs are bit-identical
    to the engine's per-frame path (same executor, same scales; batch dim
    does not enter per-sample math). Online fallback: absmax calibration on
    the FIRST window's crops with the worst-case all-ones prior (same
    policy as `make_frame_inference`).

    Implemented as the prior-free special case of
    `make_multi_frame_inference` (ONE copy of the crop/unflatten/int8
    scaffolding to maintain; has_prior=False dispatches the statically
    prior-free program, so no prior work exists in the compiled graph).
    """
    multi = make_multi_frame_inference(
        net, variables, input_hw, int8=int8, int8_scales=int8_scales
    )
    nk = net.num_kp

    def fn(imgs, boxes, valid):
        g, o = boxes.shape[:2]
        return multi(
            imgs, boxes, valid,
            jnp.zeros((g, o, nk, 2), jnp.float32),
            jnp.zeros((g, o, nk), bool),
            has_prior=False,
        )

    if hasattr(multi, "int8_state"):
        fn.int8_state = multi.int8_state
    return fn


def make_multi_frame_inference(net, variables, input_hw=(256, 256), int8=False,
                               int8_scales=None):
    """Multi-FRAME network call WITH priors for the scene-pipelined SLAM
    evaluator (`evaluate.py --pipeline_scenes K`).

    Where `make_batch_inference` packs a window of PRIOR-FREE views (the
    single-view sweep), this packs one frame from each of G concurrently
    running SLAM scenes into one jitted program — ROI crop over [G] images,
    per-crop prior-heatmap render over the flattened [G*O] batch, and the
    with-prior executor — so full-SLAM evaluation's per-frame network calls
    (8-crop buckets, dispatch-latency-bound) run at large-batch throughput.
    SURVEY §7 hard-part (e): the prior-feedback loop makes each SCENE
    sequential; throughput comes from batching across scenes.

    Returns fn(imgs [G, H, W, 3], boxes [G, O, 4], valid [G, O],
    prior_uv [G, O, K, 2], prior_valid [G, O, K], has_prior=True) ->
    (uv [G, O, K, 2], cov [G, O, K, 2, 2] | None, mask_prob [G, O, K]).
    has_prior=False dispatches the statically prior-free program (outputs
    bit-identical to a zero prior, `make_frame_inference` contract), so
    rounds where NO scene has prior detections compile the prior path away;
    a mixed round uses the with-prior program with zero-prior rows for the
    prior-less scenes (again bit-identical for those rows). Scales policy
    matches `make_batch_inference` (persisted sidecar, else absmax on the
    first round's crops with the worst-case all-ones prior).
    """
    from ..models import int8_forward as i8
    from ..ops import heatmap as hm
    from ..ops import roi as roi_ops

    if "params" not in variables:
        variables = {"params": variables}
    phw = net.prior_hw(input_hw)

    def crop_stage(imgs, boxes, valid):
        crops = roi_ops.roi_crop_batch(imgs, boxes, valid, input_hw)
        return crops.reshape((-1,) + crops.shape[2:])  # [G*O, h, w, 3]

    def prior_stage(prior_uv, prior_valid):
        nk = prior_uv.shape[-2]
        return hm.render_prior_heatmaps(
            prior_uv.reshape((-1, nk, 2)), prior_valid.reshape((-1, nk)),
            hw=phw, sigma_px=hm.prior_sigma_for(phw),
        )  # [G*O, ph, pw, K]

    def unflatten(out, g, o):
        cov = None
        if out.cov is not None:
            cov = out.cov.reshape((g, o) + out.cov.shape[1:])
        return (
            out.uv.reshape((g, o) + out.uv.shape[1:]),
            cov,
            out.kp_mask.reshape((g, o) + out.kp_mask.shape[1:]),
        )

    if not int8:

        @jax.jit
        def fn_p(imgs, boxes, valid, prior_uv, prior_valid):
            crops = crop_stage(imgs, boxes, valid)
            out = net.apply(variables, crops, prior_stage(prior_uv, prior_valid))
            return unflatten(out, imgs.shape[0], boxes.shape[1])

        @jax.jit
        def fn_np(imgs, boxes, valid):
            out = net.apply(variables, crop_stage(imgs, boxes, valid))
            return unflatten(out, imgs.shape[0], boxes.shape[1])

        def fn(imgs, boxes, valid, prior_uv, prior_valid, has_prior=True):
            if has_prior:
                return fn_p(imgs, boxes, valid, prior_uv, prior_valid)
            return fn_np(imgs, boxes, valid)

        fn.supports_no_prior = True
        return fn

    apply_p = i8.make_int8_apply(net)
    apply_np = i8.make_int8_apply(net, no_prior=True)
    state = {}

    @jax.jit
    def run_p(variables_q, scales, imgs, boxes, valid, prior_uv, prior_valid):
        crops = crop_stage(imgs, boxes, valid)
        out = apply_p(variables_q, scales, crops,
                      prior_stage(prior_uv, prior_valid))
        return unflatten(out, imgs.shape[0], boxes.shape[1])

    @jax.jit
    def run_np(variables_q, scales, imgs, boxes, valid):
        out = apply_np(variables_q, scales, crop_stage(imgs, boxes, valid))
        return unflatten(out, imgs.shape[0], boxes.shape[1])

    if int8_scales is not None:
        state["scales"] = tuple(jnp.asarray(s) for s in int8_scales)

    def fn(imgs, boxes, valid, prior_uv, prior_valid, has_prior=True):
        if "scales" not in state:
            crops = jax.jit(crop_stage)(imgs, boxes, valid)
            full_uv = jnp.zeros((crops.shape[0], net.num_kp, 2), jnp.float32)
            full_prior = hm.render_prior_heatmaps(
                full_uv, jnp.ones((crops.shape[0], net.num_kp), bool),
                hw=phw, sigma_px=hm.prior_sigma_for(phw),
            )
            state["scales"] = i8.calibrate(net, variables, [crops], [full_prior])
        if "vq" not in state:
            state["vq"] = i8.quantize_weights(net, variables)
        if not has_prior:
            return run_np(state["vq"], state["scales"], imgs, boxes, valid)
        return run_p(state["vq"], state["scales"], imgs, boxes, valid,
                     prior_uv, prior_valid)

    fn.int8_state = state
    fn.supports_no_prior = True
    return fn
