"""The object-SLAM engine: symmetric/non-symmetric split, prior feedback,
camera RANSAC, reinit/removal, tracking + global BA.

TPU-native rebuild of the reference runtime (`lib/object_slam.py:51-1167`).
The state machine (which objects/views exist, success/failure branching) is
thin host Python; every numeric path is a batched jitted kernel:

- network + filtering: `kernels.make_frame_inference` / `filter_keypoints`
- per-object PnP: `kernels.pnp_frame` (replaces lambdatwist C++ per-object)
- camera-pose hypothesis RANSAC: `kernels.camera_pose_ransac`
- re-initialization voting: `kernels.reinit_counts`
- bundle adjustment: `solvers.ba.optimize` over fixed-capacity [V, O, K]
  measurement buffers (replaces g2o graph build + Cholmod LM entirely)

Graph measurement buffers live in padded numpy arrays on the host (the
source of truth for control logic, cheap slot writes per frame) with
incrementally-synced device mirrors (`_dev_buf`/`_sync_view_row`), so the
solves and scoring consume device-resident state without re-uploading the
bulk [V, O, K] buffers per call. Capacities auto-grow by power-of-two
bucketing, so jit caches stay warm.

Modes (`lib/object_slam.py:70-72`): SLAM (default), SfM (`sfm_mode`, global
BA every frame), single-view (`single_view_mode`, PnP only + per-view BA
refinement of nothing — optimize() runs with one view).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..kp import config as kp_config
from ..solvers import ba
from . import kernels


def _to44(T):
    out = np.eye(4)
    out[: T.shape[0], :] = np.asarray(T)[: T.shape[0], :]
    return out


MIN_PAD_BOX = 16.0  # harmless box size for padded (masked-out) ROI slots


def _bucket(n: int, lo: int = 4) -> int:
    """Next power-of-two >= n (>= lo) — keeps jit caches to a few shapes."""
    b = lo
    while b < n:
        b *= 2
    return b


def _pad0(a: np.ndarray, n: int) -> np.ndarray:
    if a.shape[0] == n:
        return a
    out = np.zeros((n,) + a.shape[1:], a.dtype)
    out[: a.shape[0]] = a
    return out


@dataclass
class SlamConfig:
    # mode flags (`lib/object_slam.py:52-72`)
    sfm_mode: bool = False
    single_view_mode: bool = False
    # ablations (`lib/args.py:111-141`)
    no_network_cov: bool = False
    no_prior_det: bool = False
    give_all_prior: bool = False
    debug_gt_kp: bool = False
    # thresholds (`lib/object_slam.py:55-58` defaults)
    global_opt_every: int = 10
    kp_var_thresh: float = 0.2
    bbox_thresh: float = 0.9
    bbox_inflate: float = 0.0
    mask_thresh: float = 0.3
    manual_kp_std: float = 0.005
    opt_init_with_outliers: bool = False
    gt_kp_noise_std: float = 0.01  # `object_slam.py:1131`
    # Reference-faithful no-cov BA weighting: the reference weights no-cov BA
    # edges with the IDENTITY information (`lib/object_slam.py:825-828`),
    # which makes the 5.991 chi2 gate vacuous at NDC scale, while its
    # RANSAC/reinit paths use 1/manual_kp_std^2 (`:1060-1062`). Our default
    # uses 1/manual_kp_std^2 everywhere (consistent gating; the documented
    # `manual_info` deviation, PARITY.md). Setting this flag rescales the BA
    # problem's information back to identity for manual-info runs, exactly
    # matching the reference's inlier classification on no-cov / debug_gt_kp
    # runs (RANSAC/reinit keep 1/sigma^2, as the reference does).
    ref_manual_info: bool = False
    # sliding window: if set, global BA only optimizes the camera poses of
    # the most recent N views (older views stay as fixed constraints on the
    # objects). The reference optimizes every view forever
    # (`object_slam.py:737-743`); this bounds per-BA cost on long sequences.
    max_active_views: int | None = None
    # capacities (power-of-2 growth)
    view_capacity: int = 16
    obj_capacity: int = 8
    pnp_hypotheses: int = 64
    reinit_check_views: int = 15
    input_hw: tuple[int, int] = (256, 256)
    # int8-RESIDENT network inference (`models/int8_forward.py`, +82% over
    # bf16 at trained-weight accuracy parity — BENCHMARKS.md). Requires
    # norm="batch" nets (post_stem or concat prior mode). Activation scales:
    # persisted sidecar (int8_scales_path, from offline calibrate_int8.py)
    # when given, else absmax accumulated online over the first
    # int8_calib_frames frames' crops.
    int8_inference: bool = False
    int8_scales_path: str | None = None
    int8_calib_frames: int = 8
    seed: int = 666  # reference seeds 666 before eval (`evaluate.py:408`)

    @property
    def slam_mode(self) -> bool:
        return not (self.sfm_mode or self.single_view_mode)


@dataclass
class _Detection:
    """Host record of one (view, object) detection (slot bookkeeping)."""

    bbox: np.ndarray
    pose_pnp: np.ndarray | None  # T_OtoC from this frame's PnP (4x4) or None
    score: float = 0.0
    prior_uv: np.ndarray | None = None


class ObjectSlam:
    """Feed `process_view` per frame; read `collect_results` for eval.

    Public surface mirrors the reference `ObjectSLAM`
    (`lib/object_slam.py:51,125,175,327,703`): `reset`, `process_view`,
    `optimize`, `collect_results`, `obj_num_inliers`, plus the timing meters.
    """

    def __init__(self, config: SlamConfig, mesh_db=None, net=None, params=None,
                 infer_fn=None):
        """mesh_db: `data.mesh.MeshDb` (or None for pure-GT debug runs).

        net/params: a `models.PkpNet` and its params. Required unless
        `config.debug_gt_kp`.

        infer_fn: optional custom frame-inference callable with the
        `kernels.make_frame_inference` signature
        `(img, boxes, obj_valid, prior_uv, prior_valid) -> (uv, cov,
        mask_prob)`; overrides net/params. Used to serve pre-compiled /
        externally-quantized executors and by the closed-loop network-path
        parity harness (tests/test_reference_network_parity.py).
        """
        self.cfg = config
        self.mesh_db = mesh_db
        self.net = net
        self.params = params
        self._infer = infer_fn
        if infer_fn is None and net is not None and params is not None:
            int8_scales = None
            if config.int8_inference and config.int8_scales_path:
                from ..models import int8_forward as i8

                int8_scales = i8.load_scales(config.int8_scales_path)
            self._infer = kernels.make_frame_inference(
                net, params, config.input_hw, int8=config.int8_inference,
                int8_scales=int8_scales,
                int8_calib_frames=config.int8_calib_frames,
            )
        assert config.debug_gt_kp or self._infer is not None, (
            "Need a network unless debug_gt_kp is set"
        )
        self.nk = kp_config.num_kp()

        # timing meters (reference `object_slam.py:104-123`)
        self.track_times: list[float] = []
        self.opt_times: list[float] = []
        self.avg_std_sum = 0.0
        self.avg_std_n = 0
        self.all_time_num_views = 0

        self.reset()

    # ------------------------------------------------------------- state ----
    def reset(self):
        c = self.cfg
        # Reseed per reset: every scene sees the same RANSAC key stream, so
        # per-scene results are independent of scene ORDER — a sequential
        # sweep and the scene-pipelined evaluator (`--pipeline_scenes`)
        # produce identical output. (The reference seeds once per run,
        # `evaluate.py:408`, but its RANSAC randomness lives in C++ rand —
        # the stream position is not part of the behavior contract.)
        self._key = jax.random.PRNGKey(c.seed)
        self.V = c.view_capacity
        self.O = c.obj_capacity
        K = self.nk
        # measurement buffers (host mirrors of the BA problem)
        self.uv = np.zeros((self.V, self.O, K, 2), np.float32)
        self.info = np.zeros((self.V, self.O, K, 2, 2), np.float32)
        self.valid = np.zeros((self.V, self.O, K), bool)
        self.inliers = np.zeros((self.V, self.O, K), bool)
        self.cam_k4 = np.zeros((self.V, self.O, 4), np.float32)
        self.model_kp = np.zeros((self.O, K, 3), np.float32)
        self.model_mask = np.zeros((self.O, K), bool)
        self.cam_T = np.tile(np.eye(4, dtype=np.float32), (self.V, 1, 1))
        self.obj_T = np.tile(np.eye(4, dtype=np.float32), (self.O, 1, 1))
        self.cam_active = np.zeros((self.V,), bool)   # view has a pose
        self.obj_active = np.zeros((self.O,), bool)   # object has a map pose
        self.obj_diam = np.full((self.O,), 1e-3, np.float32)

        # slot maps
        self.view_slot: dict[int, int] = {}
        self.obj_slot: dict[int, int] = {}
        self.view_ids: list[int] = []     # insertion order of POSED views
        self.views_seen: list[int] = []   # all processed views
        self.detections: dict[int, dict[int, _Detection]] = {}
        self.cam_K_full: dict[int, np.ndarray] = {}

        self.obj_num_dets: dict[int, int] = {}
        self.obj_num_det_kps: dict[int, int] = {}
        self.needs_opt = False
        # whether this run's stored info matrices are manual (1/sigma^2) or
        # network-predicted; must be uniform across a run for the
        # ref_manual_info rescale to be exact (None until first detection)
        self._manual_info_run: bool | None = None

        # device mirrors of the bulk [V, O, ...] measurement buffers (host
        # numpy stays the source of truth for the control logic; the mirrors
        # are updated incrementally so kernels/BA never re-upload the full
        # buffers per call — at V=64 that was ~1-2 MB per optimize())
        self._dev: dict[str, object] = {}

    # device mirrors ----------------------------------------------------------
    _MIRRORED = ("uv", "info", "valid", "inliers", "cam_k4", "model_kp")

    def _dev_buf(self, name):
        """Device copy of a mirrored host buffer (uploaded once, then kept
        in sync by `_sync_view_row` / the BA writeback / invalidation)."""
        buf = self._dev.get(name)
        if buf is None:
            buf = jnp.asarray(getattr(self, name))
            self._dev[name] = buf
        return buf

    def _sync_view_row(self, v):
        """Push row `v` of the per-view measurement buffers to the device
        mirrors (one small transfer per buffer instead of a full re-upload)."""
        for name in ("uv", "info", "valid", "inliers", "cam_k4"):
            if name in self._dev:
                self._dev[name] = self._dev[name].at[v].set(
                    jnp.asarray(getattr(self, name)[v])
                )

    # capacity management ----------------------------------------------------
    def _ensure_view_slot(self, view_id) -> int:
        if view_id in self.view_slot:
            return self.view_slot[view_id]
        n = len(self.view_slot)
        if n >= self.V:
            self._grow_views(self.V * 2)
        self.view_slot[view_id] = n
        return n

    def _grow_views(self, new_v):
        grow = new_v - self.V
        pad = lambda a, shape: np.concatenate([a, np.zeros((grow,) + shape, a.dtype)])
        self.uv = pad(self.uv, self.uv.shape[1:])
        self.info = pad(self.info, self.info.shape[1:])
        self.valid = pad(self.valid, self.valid.shape[1:])
        self.inliers = pad(self.inliers, self.inliers.shape[1:])
        self.cam_k4 = pad(self.cam_k4, self.cam_k4.shape[1:])
        self.cam_T = np.concatenate([self.cam_T, np.tile(np.eye(4, dtype=np.float32), (grow, 1, 1))])
        self.cam_active = np.concatenate([self.cam_active, np.zeros((grow,), bool)])
        self.V = new_v
        self._dev.clear()  # mirror shapes changed

    def _ensure_obj_slot(self, obj_id, model_kp=None, model_mask=None) -> int:
        if obj_id in self.obj_slot:
            return self.obj_slot[obj_id]
        n = len(self.obj_slot)
        if n >= self.O:
            self._grow_objects(self.O * 2)
        self.obj_slot[obj_id] = n
        if model_kp is not None:
            self.model_kp[n] = model_kp
            self.model_mask[n] = model_mask
            self._dev.pop("model_kp", None)  # rare; re-upload lazily
        if self.mesh_db is not None:
            self.obj_diam[n] = self.mesh_db.diameter[obj_id - 1]
        self.obj_num_dets.setdefault(obj_id, 0)
        self.obj_num_det_kps.setdefault(obj_id, 0)
        return n

    def _grow_objects(self, new_o):
        grow = new_o - self.O
        self.uv = np.concatenate([self.uv, np.zeros((self.V, grow) + self.uv.shape[2:], np.float32)], axis=1)
        self.info = np.concatenate([self.info, np.zeros((self.V, grow) + self.info.shape[2:], np.float32)], axis=1)
        self.valid = np.concatenate([self.valid, np.zeros((self.V, grow, self.nk), bool)], axis=1)
        self.inliers = np.concatenate([self.inliers, np.zeros((self.V, grow, self.nk), bool)], axis=1)
        self.cam_k4 = np.concatenate([self.cam_k4, np.zeros((self.V, grow, 4), np.float32)], axis=1)
        self.model_kp = np.concatenate([self.model_kp, np.zeros((grow, self.nk, 3), np.float32)])
        self.model_mask = np.concatenate([self.model_mask, np.zeros((grow, self.nk), bool)])
        self.obj_T = np.concatenate([self.obj_T, np.tile(np.eye(4, dtype=np.float32), (grow, 1, 1))])
        self.obj_active = np.concatenate([self.obj_active, np.zeros((grow,), bool)])
        self.obj_diam = np.concatenate([self.obj_diam, np.full((grow,), 1e-3, np.float32)])
        self.O = new_o
        self._dev.clear()  # mirror shapes changed

    def num_views_processed(self):
        return len(self.view_ids)

    def obj_num_inliers(self, obj_id):
        s = self.obj_slot.get(obj_id)
        return 0 if s is None else int(self.inliers[:, s].sum())

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------- frame ----
    def process_view(
        self,
        view_id,
        img,
        K,
        obj_ids,
        bboxes,
        model_kps,
        model_kps_masks,
        kp_masks,
        uv_gt=None,
        cam_pose=None,
    ):
        """Process one frame (`lib/object_slam.py:327-451`).

        img: [H, W, 3] f32 RGB in [0,1] (numpy). K: [3,3]. obj_ids: [O_f]
        ints. bboxes: [O_f, 4] xyxy pixels. model_kps/[O_f,41,3],
        model_kps_masks/kp_masks: [O_f, 41]. uv_gt: GT NDC kps (debug).
        cam_pose: optional external T_GtoC.
        """
        import time as _time

        assert view_id not in self.views_seen, f"Repeat view {view_id}"
        c = self.cfg
        tt0 = _time.perf_counter()
        self.views_seen.append(view_id)
        self.all_time_num_views += 1
        self.cam_K_full[view_id] = np.asarray(K, np.float64)
        obj_ids = np.asarray(obj_ids)
        bboxes = np.array(bboxes, np.float32)
        model_kps = np.asarray(model_kps, np.float32)
        model_kps_masks = np.asarray(model_kps_masks, bool)
        kp_masks = np.asarray(kp_masks, bool)

        # symmetric / non-symmetric split (`object_slam.py:337-362`)
        if not c.no_prior_det and self.mesh_db is not None:
            is_sym = np.array(
                [bool(self.mesh_db.is_symmetric[o - 1]) for o in obj_ids]
            )
        else:
            is_sym = np.zeros(len(obj_ids), bool)
        if cam_pose is not None:
            self._set_cam_pose(view_id, _to44(cam_pose))
            is_sym = np.ones(len(obj_ids), bool)
        if c.give_all_prior:
            is_sym = np.ones(len(obj_ids), bool)
        if c.single_view_mode:
            is_sym = np.zeros(len(obj_ids), bool)

        n_non_sym = int((~is_sym).sum())
        if (
            cam_pose is None
            and not c.single_view_mode
            and len(self.view_ids) > 0
            and n_non_sym == 0
        ):
            self._backup_estimate_camera_pose(view_id, obj_ids, bboxes)

        self.needs_opt = True
        bboxes[:, :2] *= 1.0 - c.bbox_inflate
        bboxes[:, 2:] *= 1.0 + c.bbox_inflate

        if n_non_sym > 0:
            self._process_objects(
                False, view_id, img, K, obj_ids[~is_sym], bboxes[~is_sym],
                model_kps[~is_sym], model_kps_masks[~is_sym], kp_masks[~is_sym],
                uv_gt[~is_sym] if uv_gt is not None else None,
            )
        if view_id not in self.view_slot or not self.cam_active[self.view_slot[view_id]]:
            if len(self.view_ids) == 0:
                self._set_cam_pose(view_id, np.eye(4))
            else:
                self._backup_estimate_camera_pose(view_id, obj_ids, bboxes)
        if is_sym.any() and (self._has_cam_pose(view_id) or c.no_prior_det):
            self._process_objects(
                True, view_id, img, K, obj_ids[is_sym], bboxes[is_sym],
                model_kps[is_sym], model_kps_masks[is_sym], kp_masks[is_sym],
                uv_gt[is_sym] if uv_gt is not None else None,
            )

        if not c.single_view_mode:
            self._maybe_reinit_objects(
                view_id,
                len(self.view_ids) if c.sfm_mode else c.reinit_check_views,
            )
            self.optimize(curr_only=True)

        tt1 = _time.perf_counter()
        if self.all_time_num_views > 5:  # warm-up exclusion (`:424-426`)
            self.track_times.append(tt1 - tt0)

        if c.sfm_mode or c.single_view_mode or (
            len(self.view_ids) > 1 and len(self.view_ids) % c.global_opt_every == 0
        ):
            t0 = _time.perf_counter()
            self.optimize()
            self.opt_times.append(_time.perf_counter() - t0)
            self.needs_opt = False

    # ------------------------------------------------------ internal steps --
    def _has_cam_pose(self, view_id):
        s = self.view_slot.get(view_id)
        return s is not None and bool(self.cam_active[s])

    def _set_cam_pose(self, view_id, T):
        s = self._ensure_view_slot(view_id)
        self.cam_T[s] = np.asarray(T, np.float32)[:4, :4]
        if not self.cam_active[s]:
            self.cam_active[s] = True
            self.view_ids.append(view_id)

    def _process_objects(
        self, is_sym, view_id, img, K, obj_ids, bboxes, model_kps,
        model_kps_masks, kp_masks, uv_gt=None,
    ):
        """Network + PnP for one symmetric/non-symmetric group
        (`lib/object_slam.py:470-593`)."""
        if len(obj_ids) == 0:
            return
        c = self.cfg
        of = len(obj_ids)
        nk = self.nk

        # NDC-fixed intrinsics per detection
        K_nd = np.zeros((of, 3, 3), np.float64)
        cam_k4 = np.zeros((of, 4), np.float32)
        for i in range(of):
            K_nd[i] = _fix_K_np(np.asarray(K, np.float64), bboxes[i])
            cam_k4[i] = (K_nd[i][0, 0], K_nd[i][1, 1], K_nd[i][0, 2], K_nd[i][1, 2])

        # prior detections for symmetric objects with map estimates
        # (`object_slam.py:486-519`)
        prior_uv = np.zeros((of, nk, 2), np.float32)
        prior_valid = np.zeros((of, nk), bool)
        if is_sym and not c.no_prior_det and self._has_cam_pose(view_id):
            T_GtoC = _to44(self.cam_T[self.view_slot[view_id]])
            for i, obj_id in enumerate(obj_ids):
                s = self.obj_slot.get(obj_id)
                if s is None or not self.obj_active[s]:
                    continue
                T_OtoC = T_GtoC @ _to44(self.obj_T[s])
                m = model_kps_masks[i]
                p_C = model_kps[i] @ T_OtoC[:3, :3].T + T_OtoC[:3, 3]
                uvd = p_C @ K_nd[i].T
                if np.all(uvd[m, 2] > 0):
                    prior_uv[i] = uvd[:, :2] / np.where(
                        np.abs(uvd[:, 2:3]) < 1e-9, 1e-9, uvd[:, 2:3]
                    )
                    prior_valid[i] = m

        # ---- network inference or GT keypoints ----
        if c.debug_gt_kp:
            assert uv_gt is not None and kp_masks is not None
            rng = np.random.default_rng(
                int(jax.random.randint(self._next_key(), (), 0, 2**31 - 1))
            )
            uv_pred = np.asarray(uv_gt, np.float32) + rng.normal(
                scale=c.gt_kp_noise_std, size=(of, nk, 2)
            ).astype(np.float32)
            cov_pred = None
            kp_mask = np.asarray(kp_masks, bool)
        else:
            # pad the object batch to a power-of-2 bucket so the jitted
            # network sees a handful of shapes, not one per object count
            ob = _bucket(of)
            obj_valid = np.zeros((ob,), bool)
            obj_valid[:of] = True
            bx = _pad0(bboxes, ob)
            bx[of:] = (0.0, 0.0, MIN_PAD_BOX, MIN_PAD_BOX)
            infer_kw = {}
            if not prior_valid.any() and getattr(
                self._infer, "supports_no_prior", False
            ):
                # statically prior-free program: every non-symmetric batch
                # and all of single-view mode — the prior render + injection
                # conv compile away (see kernels.make_frame_inference)
                infer_kw["has_prior"] = False
            uv_d, cov_d, maskp_d = self._infer(
                jnp.asarray(img, jnp.float32),
                jnp.asarray(bx, jnp.float32),
                jnp.asarray(obj_valid),
                jnp.asarray(_pad0(prior_uv, ob)),
                jnp.asarray(_pad0(prior_valid, ob)),
                **infer_kw,
            )
            use_cov = not c.no_network_cov and cov_d is not None
            keep = kernels.filter_keypoints(
                uv_d, cov_d if use_cov else None, maskp_d,
                jnp.asarray(_pad0(model_kps_masks, ob)),
                c.bbox_thresh, c.kp_var_thresh, c.mask_thresh,
            )
            uv_pred = np.asarray(uv_d)[:of]
            cov_pred = np.asarray(cov_d)[:of] if use_cov else None
            kp_mask = np.asarray(keep)[:of]
            if cov_pred is not None:
                std = np.sqrt(np.maximum(cov_pred[..., (0, 1), (0, 1)], 0.0))[kp_mask]
                if std.size:
                    self.avg_std_sum += float(std.mean()) * std.size
                    self.avg_std_n += std.size

        # ---- per-object PnP (bucketed batch) ----
        ob = _bucket(of)
        diams = _pad0(np.asarray([self._diam(o) for o in obj_ids], np.float32), ob)
        diams[of:] = np.inf  # padded slots can never pass the depth gate
        T_pnp, pnp_ok = kernels.pnp_frame(
            jnp.asarray(_pad0(model_kps, ob)), jnp.asarray(_pad0(uv_pred, ob)),
            jnp.asarray(_pad0(kp_mask, ob)), jnp.asarray(_pad0(cam_k4, ob)),
            jnp.asarray(diams),
            self._next_key(), n_hyp=c.pnp_hypotheses,
        )
        T_pnp = np.asarray(T_pnp)[:of]
        pnp_ok = np.asarray(pnp_ok)[:of]

        # ---- information matrices ----
        if cov_pred is not None:
            info = np.asarray(kernels.info_from_cov(jnp.asarray(cov_pred)))
        else:
            info = np.asarray(
                kernels.manual_info((of, nk), c.manual_kp_std)
            )
        is_manual = cov_pred is None
        if self._manual_info_run is None:
            self._manual_info_run = is_manual
        elif self._manual_info_run != is_manual:
            raise ValueError(
                "mixed manual/network info within one run: the "
                "ref_manual_info BA rescale assumes a uniform info source"
            )

        # ---- write detection slots ----
        dets = self.detections.setdefault(view_id, {})
        v = self._ensure_view_slot(view_id)
        for i, obj_id in enumerate(int(o) for o in obj_ids):
            s = self._ensure_obj_slot(obj_id, model_kps[i], model_kps_masks[i])
            self.uv[v, s] = uv_pred[i]
            self.info[v, s] = info[i]
            self.valid[v, s] = kp_mask[i]
            self.inliers[v, s] = kp_mask[i]  # all start as inliers (`:1140`)
            self.cam_k4[v, s] = cam_k4[i]
            pose = _to44(T_pnp[i]) if pnp_ok[i] else None
            dets[obj_id] = _Detection(
                bbox=bboxes[i].copy(),
                pose_pnp=pose,
                score=float(kp_mask[i].mean()),
                prior_uv=prior_uv[i].copy() if prior_valid[i].any() else None,
            )
            self.obj_num_dets[obj_id] += 1
            self.obj_num_det_kps[obj_id] += int(kp_mask[i].sum())
            # first-view object init (`object_slam.py:538-556`)
            if self.num_views_processed() == 0 and pose is not None:
                if self._has_cam_pose(view_id):
                    T_GtoC = _to44(self.cam_T[self.view_slot[view_id]])
                    self._set_obj_pose(obj_id, np.linalg.inv(T_GtoC) @ pose)
                else:
                    self._set_obj_pose(obj_id, pose)
        self._sync_view_row(v)

        # ---- camera pose from objects (`object_slam.py:574-580`) ----
        if not self._has_cam_pose(view_id):
            if self.num_views_processed() == 0:
                self._set_cam_pose(view_id, np.eye(4))
            else:
                T = self._estimate_camera_pose(view_id)
                if T is None:
                    return
                self._set_cam_pose(view_id, T)

        # late object init (`object_slam.py:581-591`)
        T_GtoC = _to44(self.cam_T[self.view_slot[view_id]])
        for obj_id in (int(o) for o in obj_ids):
            s = self.obj_slot[obj_id]
            det = dets.get(obj_id)
            if not self.obj_active[s] and det is not None and det.pose_pnp is not None:
                self._set_obj_pose(obj_id, np.linalg.inv(T_GtoC) @ det.pose_pnp)

    def _diam(self, obj_id):
        if self.mesh_db is None:
            return 1e-3
        return float(self.mesh_db.diameter[int(obj_id) - 1])

    def _set_obj_pose(self, obj_id, T_OtoG):
        s = self._ensure_obj_slot(obj_id)
        self.obj_T[s] = np.asarray(T_OtoG, np.float32)[:4, :4]
        self.obj_active[s] = True

    def _remove_obj(self, obj_id):
        s = self.obj_slot.get(obj_id)
        if s is not None:
            self.obj_active[s] = False

    # camera pose estimation --------------------------------------------------
    def _estimate_camera_pose(self, view_id, min_num_inliers=4):
        """Hypothesis RANSAC over per-object PnP poses
        (`lib/object_slam.py:975-1072`); scoring fully on device."""
        dets = self.detections.get(view_id, {})
        v = self.view_slot[view_id]
        T_pnp = np.tile(np.eye(4, dtype=np.float32), (self.O, 1, 1))
        pnp_ok = np.zeros((self.O,), bool)
        for obj_id, det in dets.items():
            s = self.obj_slot[obj_id]
            if det.pose_pnp is not None and self.obj_active[s]:
                T_pnp[s] = det.pose_pnp
                pnp_ok[s] = True
        if not pnp_ok.any():
            return None
        T_best, count, ok = kernels.camera_pose_ransac(
            jnp.asarray(T_pnp), jnp.asarray(pnp_ok),
            jnp.asarray(self.obj_T), jnp.asarray(self.obj_active & pnp_ok),
            self._dev_buf("model_kp"), self._dev_buf("uv")[v],
            self._dev_buf("info")[v], self._dev_buf("inliers")[v],
            self._dev_buf("cam_k4")[v], min_num_inliers,
        )
        return np.asarray(T_best) if bool(ok) else None

    def _backup_estimate_camera_pose(self, view_id, obj_ids, bboxes):
        """bbox-centroid PnP -> constant velocity -> hold
        (`lib/object_slam.py:933-973`)."""
        from ..solvers import pnp as pnp_mod

        assert len(self.view_ids) > 0 and not self._has_cam_pose(view_id)
        K = self.cam_K_full[view_id]
        centroids, centers = [], []
        for i, obj_id in enumerate(int(o) for o in obj_ids):
            s = self.obj_slot.get(obj_id)
            if s is not None and self.obj_active[s]:
                centroids.append(0.5 * (bboxes[i, :2] + bboxes[i, 2:]))
                centers.append(self.obj_T[s][:3, 3])
        T = None
        if len(centroids) >= 4:
            Kinv = np.linalg.inv(K)
            uv1 = np.concatenate(
                [np.stack(centroids), np.ones((len(centroids), 1))], -1
            )
            y = (uv1 @ Kinv.T)[:, :2]
            res = pnp_mod.pnp_ransac(
                jnp.asarray(np.stack(centers), jnp.float32),
                jnp.asarray(y, jnp.float32),
                jnp.ones((len(centroids),), bool),
                self._next_key(),
            )
            if bool(res.success):
                T = np.asarray(res.T)
        if T is None:
            if len(self.view_ids) > 1:
                T1 = _to44(self.cam_T[self.view_slot[self.view_ids[-2]]])
                T2 = _to44(self.cam_T[self.view_slot[self.view_ids[-1]]])
                T = (T2 @ np.linalg.inv(T1)) @ T2  # constant velocity
            else:
                T = _to44(self.cam_T[self.view_slot[self.view_ids[-1]]])
        self._set_cam_pose(view_id, T)

    # reinit ------------------------------------------------------------------
    def _maybe_reinit_objects(self, view_id, check_n_views):
        """PnP-vs-map chi2 vote (`lib/object_slam.py:595-697`)."""
        if self.num_views_processed() < 2 or not self._has_cam_pose(view_id):
            return
        check_n = min(len(self.view_ids), check_n_views)
        dets = self.detections.get(view_id, {})
        cand = [
            (obj_id, det) for obj_id, det in dets.items()
            if det.pose_pnp is not None and self.obj_active[self.obj_slot[obj_id]]
        ]
        if not cand:
            return
        T_GtoC_inv = np.linalg.inv(_to44(self.cam_T[self.view_slot[view_id]]))
        T_pnp_G = np.tile(np.eye(4, dtype=np.float32), (self.O, 1, 1))
        sel = np.zeros((self.O,), bool)
        for obj_id, det in cand:
            s = self.obj_slot[obj_id]
            T_pnp_G[s] = T_GtoC_inv @ det.pose_pnp
            sel[s] = True

        # fixed-size view window (pad with invalid slots) to keep one jit shape
        n_fix = _bucket(check_n, lo=self.cfg.reinit_check_views)
        cs = np.zeros((n_fix,), int)
        cam_valid = np.zeros((n_fix,), bool)
        for i in range(check_n):
            cs[i] = self.view_slot[self.view_ids[-(i + 1)]]
            cam_valid[i] = self.cam_active[cs[i]]
        cs_d = jnp.asarray(cs)
        n_pnp, n_est = kernels.reinit_counts(
            jnp.asarray(T_pnp_G), jnp.asarray(self.obj_T),
            jnp.asarray(self.cam_T[cs]), jnp.asarray(cam_valid),
            self._dev_buf("model_kp"), self._dev_buf("uv")[cs_d],
            self._dev_buf("info")[cs_d], self._dev_buf("valid")[cs_d],
            self._dev_buf("cam_k4")[cs_d],
        )
        n_pnp, n_est = np.asarray(n_pnp), np.asarray(n_est)
        for obj_id, _ in cand:
            s = self.obj_slot[obj_id]
            if n_pnp[s] >= 3 and n_pnp[s] > 3 * n_est[s]:
                self.obj_T[s] = T_pnp_G[s]

    # BA ----------------------------------------------------------------------
    def optimize(self, curr_only=False):
        """Robust LM over the measurement buffers (`lib/object_slam.py:703-930`)."""
        if len(self.view_ids) == 0:
            return
        c = self.cfg
        if curr_only:
            view_id = self.view_ids[-1]
            if not self._has_cam_pose(view_id):
                return
            v = self.view_slot[view_id]
            cam_sel = np.zeros((self.V,), bool)
            cam_sel[v] = True
            # reference needs >= 3 inlier edges in the current frame (`:730`)
            if (self.inliers[v] & self.obj_active[None, :, None]).sum() < 3:
                return
        else:
            cam_sel = self.cam_active

        cam_frozen = np.zeros((self.V,), bool)
        if not curr_only and c.max_active_views is not None:
            for view_id_old in self.view_ids[: -c.max_active_views]:
                cam_frozen[self.view_slot[view_id_old]] = True

        # reference-faithful no-cov weighting: stored info is I/sigma^2 (what
        # RANSAC/reinit need); the reference BA uses identity
        # (`object_slam.py:825-828`), so rescale the BA problem's info only.
        # Applied AFTER any view slicing to keep tracking O(1) in capacity.
        info_scale = (
            self.cfg.manual_kp_std ** 2
            if (self.cfg.ref_manual_info and self._manual_info_run)
            else None
        )

        def _scaled(info):
            return info if info_scale is None else info * info_scale

        if curr_only:
            # Tracking optimizes ONE camera over unary edges — slice the
            # problem to just the current view row so its cost and jit shape
            # are O(1) in the view capacity. Without this, every per-frame
            # tracking solve scans the full padded [V, O, K] buffers and
            # recompiles at each capacity doubling (at V=512 that was ~100x
            # the useful work on a long sequence).
            problem = ba.BAProblem(
                cam_T=jnp.asarray(self.cam_T[v : v + 1]),
                obj_T=jnp.asarray(self.obj_T),
                uv=self._dev_buf("uv")[v : v + 1],
                info=_scaled(self._dev_buf("info")[v : v + 1]),
                model_kp=self._dev_buf("model_kp"),
                cam_k=self._dev_buf("cam_k4")[v : v + 1],
                valid=self._dev_buf("valid")[v : v + 1],
                inliers=self._dev_buf("inliers")[v : v + 1],
                cam_active=jnp.ones((1,), bool),
                obj_active=jnp.asarray(self.obj_active),
            )
        else:
            problem = ba.BAProblem(
                cam_T=jnp.asarray(self.cam_T),
                obj_T=jnp.asarray(self.obj_T),
                uv=self._dev_buf("uv"),
                info=_scaled(self._dev_buf("info")),
                model_kp=self._dev_buf("model_kp"),
                cam_k=self._dev_buf("cam_k4"),
                valid=self._dev_buf("valid"),
                inliers=self._dev_buf("inliers"),
                cam_active=jnp.asarray(cam_sel & self.cam_active),
                obj_active=jnp.asarray(self.obj_active),
                cam_frozen=jnp.asarray(cam_frozen),
            )
        rounds = (
            (10, 10, 40, 40)
            if (c.sfm_mode or (c.slam_mode and not curr_only))
            else (10, 10, 10, 10)
        )
        result = ba.optimize(
            problem,
            iters_per_round=rounds,
            tracking_only=curr_only,
            fix_first_cam=not curr_only,
            init_with_outliers=c.opt_init_with_outliers and curr_only,
        )
        new_cam = np.asarray(result.cam_T)
        new_obj = np.asarray(result.obj_T)
        new_inl = np.asarray(result.inliers)
        if curr_only:
            self.cam_T[v] = new_cam[0]
            self.inliers[v] = new_inl[0]
            self._sync_view_row(v)
        else:
            upd = self.cam_active
            self.cam_T[upd] = new_cam[upd]
            self.obj_T[self.obj_active] = new_obj[self.obj_active]
            self.inliers[self.cam_active] = new_inl[self.cam_active]
            # masked writeback -> refresh the full inlier mirror (global BA
            # runs every global_opt_every frames; 1 bool buffer upload)
            self._dev["inliers"] = jnp.asarray(self.inliers)
            self._remove_behind_camera()
        # min-inlier removal runs after EVERY optimize, tracking included —
        # the reference's block at `lib/object_slam.py:917-930` sits outside
        # the `if not curr_only:` (pinned by
        # test_reference_engine_parity.py::test_low_inlier_removal_timing_parity)
        self._remove_low_inlier_objects()

    def _remove_behind_camera(self):
        """Behind-camera object removal, global BA only
        (`lib/object_slam.py:904-916`)."""
        if not self.view_ids:
            return
        v = self.view_slot[self.view_ids[-1]]
        T_GtoC = self.cam_T[v]
        for obj_id, s in list(self.obj_slot.items()):
            if not self.obj_active[s]:
                continue
            p = T_GtoC[:3, :3] @ self.obj_T[s][:3, 3] + T_GtoC[:3, 3]
            if p[2] < 0.5 * self._diam(obj_id):
                self._remove_obj(obj_id)

    def _remove_low_inlier_objects(self):
        """Min-inlier object removal (`lib/object_slam.py:917-930`)."""
        for obj_id, s in list(self.obj_slot.items()):
            if not self.obj_active[s]:
                continue
            min_inl = 3 if self.obj_num_dets.get(obj_id, 0) < 3 else 6
            if self.obj_num_inliers(obj_id) < min_inl:
                self._remove_obj(obj_id)

    # results -----------------------------------------------------------------
    def collect_results(self, last_only=False, final=False):
        """Per-view object poses T_OtoC for evaluation
        (`lib/object_slam.py:175-309`, viz omitted here — see eval tier)."""
        if self.cfg.slam_mode and self.needs_opt and final:
            import time as _time

            t0 = _time.perf_counter()
            self.optimize()
            self.opt_times.append(_time.perf_counter() - t0)
            self.needs_opt = False
        results = {}
        view_ids = [self.view_ids[-1]] if last_only else list(self.view_ids)
        for view_id in view_ids:
            T_GtoC = _to44(self.cam_T[self.view_slot[view_id]])
            dets = self.detections.get(view_id, {})
            obj_ids = set(dets) | {
                o for o, s in self.obj_slot.items() if self.obj_active[s]
            }
            poses = {}
            for obj_id in obj_ids:
                s = self.obj_slot.get(obj_id)
                T_OtoC = None
                if s is not None and self.obj_active[s]:
                    T_OtoC = T_GtoC @ _to44(self.obj_T[s])
                poses[obj_id] = {
                    "T_OtoC": T_OtoC,
                    "score": 1 + self.obj_num_inliers(obj_id),
                }
            results[view_id] = {"poses": poses}
        return results

    def get_view_viz_data(self, view_id):
        """Per-detection data for `eval.viz.make_frame_viz`: obj_id ->
        {bbox, uv [K,2] NDC, cov [K,2,2] NDC | None, kp_mask [K],
        prior_uv | None}."""
        out = {}
        v = self.view_slot.get(view_id)
        if v is None:
            return out
        for obj_id, det in self.detections.get(view_id, {}).items():
            s = self.obj_slot[obj_id]
            info = self.info[v, s]
            a, b, d = info[:, 0, 0], info[:, 0, 1], info[:, 1, 1]
            det_i = np.maximum(a * d - b * b, 1e-12)
            cov = np.stack(
                [np.stack([d, -b], -1), np.stack([-b, a], -1)], axis=-2
            ) / det_i[:, None, None]
            out[obj_id] = {
                "bbox": det.bbox,
                "uv": self.uv[v, s],
                "cov": None if self.cfg.no_network_cov or self.cfg.debug_gt_kp else cov,
                "kp_mask": self.valid[v, s],
                "prior_uv": det.prior_uv,
                "model_mask": self.model_mask[s],
            }
        return out

    # timing ------------------------------------------------------------------
    def tracking_hz(self):
        return 0.0 if not self.track_times else 1.0 / (
            sum(self.track_times) / len(self.track_times)
        )

    def avg_kp_std(self):
        return 0.0 if self.avg_std_n == 0 else self.avg_std_sum / self.avg_std_n


def _fix_K_np(K, bbox):
    x1, y1, x2, y2 = bbox
    w, h = x2 - x1, y2 - y1
    T = np.eye(3)
    T[:2, 2] = (-x1, -y1)
    S = np.eye(3)
    S[0, :] *= 2.0 / w
    S[1, :] *= -2.0 / h
    S[0, 2] -= 1.0
    S[1, 2] += 1.0
    return S @ T @ K
