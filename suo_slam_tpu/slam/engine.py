"""The object-SLAM engine: symmetric/non-symmetric split, prior feedback,
camera RANSAC, reinit/removal, tracking + global BA.

TPU-native rebuild of the reference runtime (`lib/object_slam.py:51-1167`).
The state machine (which objects/views exist, success/failure branching) is
thin host Python; every numeric path is a batched jitted kernel, and a frame
costs exactly TWO blocking host syncs (the north star's "no host round-trips
per frame", vs the reference's Python<->C++ hop per stage):

- sync 1 — non-symmetric group: network inference chained into
  `kernels.frontend_step` (keypoint filter -> batched PnP -> information ->
  camera-pose RANSAC) with one `jax.device_get` of the small result pytree.
- sync 2 — `kernels.tracking_tail`: the symmetric group's (already
  dispatched, unread) network+PnP outputs are scattered into the device
  mirrors in-kernel, then re-init voting and the tracking BA run on them;
  one combined readback covers the sym results + BA'd camera pose.
- global BA every `global_opt_every` frames: `solvers.ba.optimize` over the
  fixed-capacity [V, O, K] mirrors (replaces g2o graph build + Cholmod LM).

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
        if not c.debug_gt_kp:
            # stage the frame ON DEVICE once (both sym/non-sym groups crop
            # from it; a second host->device upload of a full image per frame
            # would cost real tunnel bandwidth)
            img = jnp.asarray(img, jnp.float32)
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
        sym_pending = None
        if is_sym.any() and (self._has_cam_pose(view_id) or c.no_prior_det):
            # symmetric group: dispatch the network + PnP chain but DEFER its
            # readback into the fused tail (sym scatter + reinit + tracking
            # BA run on its device outputs; one combined host sync)
            sym_pending = self._group_frontend(
                True, view_id, img, K, obj_ids[is_sym], bboxes[is_sym],
                model_kps[is_sym], model_kps_masks[is_sym], kp_masks[is_sym],
                uv_gt[is_sym] if uv_gt is not None else None,
                with_cam_ransac=False,
            )

        if not c.single_view_mode:
            self._fused_tail(view_id, sym_pending)

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
        """Network + PnP + camera-pose RANSAC for the non-symmetric group
        (`lib/object_slam.py:470-593`) — one device dispatch chain, ONE host
        sync (the frame's first). The symmetric group instead goes through
        `_group_frontend` with its readback deferred into `_fused_tail`."""
        if len(obj_ids) == 0:
            return
        with_cam_ransac = (
            not self._has_cam_pose(view_id) and self.num_views_processed() > 0
        )
        meta, dev = self._group_frontend(
            is_sym, view_id, img, K, obj_ids, bboxes, model_kps,
            model_kps_masks, kp_masks, uv_gt, with_cam_ransac,
        )
        host = jax.device_get({k: x for k, x in dev.items() if x is not None})
        host.setdefault("cov", None)
        self._commit_group(view_id, meta, host, sync=True)

        # ---- camera pose from objects (`object_slam.py:574-580`) ----
        if not self._has_cam_pose(view_id):
            if self.num_views_processed() == 0:
                self._set_cam_pose(view_id, np.eye(4))
            elif host["cam_ok"]:
                self._set_cam_pose(view_id, _to44(host["T_cam"]))
            else:
                # RANSAC found no camera: no late init for this group; the
                # caller falls back to the backup pose (`object_slam.py:579`)
                return

        # late object init (`object_slam.py:581-591`)
        T_GtoC = _to44(self.cam_T[self.view_slot[view_id]])
        dets = self.detections[view_id]
        for obj_id in meta["obj_ids"]:
            s = self.obj_slot[obj_id]
            det = dets.get(obj_id)
            if not self.obj_active[s] and det is not None and det.pose_pnp is not None:
                self._set_obj_pose(obj_id, np.linalg.inv(T_GtoC) @ det.pose_pnp)

    def _group_frontend(
        self, is_sym, view_id, img, K, obj_ids, bboxes, model_kps,
        model_kps_masks, kp_masks, uv_gt, with_cam_ransac,
    ):
        """Host prep + the device dispatch chain for one sym/non-sym group:
        (network inference | GT keypoints) -> `kernels.frontend_step`
        (filter -> PnP -> info -> optional camera RANSAC). NO host sync —
        the caller decides when to read the returned device dict back."""
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

        # slot assignment BEFORE the chain (host-deterministic: insertion
        # order, no device values involved)
        slots = np.empty((of,), np.int32)
        for i, obj_id in enumerate(int(o) for o in obj_ids):
            slots[i] = self._ensure_obj_slot(obj_id, model_kps[i], model_kps_masks[i])

        # pad the object batch to a power-of-2 bucket so the jitted programs
        # see a handful of shapes, not one per object count
        ob = _bucket(of)
        pad_slots = np.full((ob,), self.O, np.int32)  # O = dropped in scatter
        pad_slots[:of] = slots

        # ---- network inference or GT keypoints ----
        if c.debug_gt_kp:
            assert uv_gt is not None and kp_masks is not None
            rng = np.random.default_rng(
                int(jax.random.randint(self._next_key(), (), 0, 2**31 - 1))
            )
            uv_in = np.asarray(uv_gt, np.float32) + rng.normal(
                scale=c.gt_kp_noise_std, size=(of, nk, 2)
            ).astype(np.float32)
            uv_d = jnp.asarray(_pad0(uv_in, ob))
            cov_d = None
            maskp_d = None
            keep_in = jnp.asarray(_pad0(np.asarray(kp_masks, bool), ob))
        else:
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
            if c.no_network_cov:
                cov_d = None  # manual info + no stdev filter/meter
            keep_in = None

        diams = _pad0(np.asarray([self._diam(o) for o in obj_ids], np.float32), ob)
        diams[of:] = np.inf  # padded slots can never pass the depth gate
        fs_kw = {}
        if with_cam_ransac:
            fs_kw = dict(
                slots=jnp.asarray(pad_slots),
                obj_T=jnp.asarray(self.obj_T),
                obj_active=jnp.asarray(self.obj_active),
                model_kp_full=self._dev_buf("model_kp"),
            )
        dev = kernels.frontend_step(
            uv_d, cov_d, maskp_d, keep_in,
            jnp.asarray(_pad0(model_kps, ob)),
            jnp.asarray(_pad0(model_kps_masks, ob)),
            jnp.asarray(_pad0(cam_k4, ob)),
            jnp.asarray(diams),
            self._next_key(),
            np.float32(c.manual_kp_std), np.float32(c.bbox_thresh),
            np.float32(c.kp_var_thresh), np.float32(c.mask_thresh),
            n_hyp=c.pnp_hypotheses, **fs_kw,
        )
        meta = dict(
            of=of, obj_ids=[int(o) for o in obj_ids], bboxes=bboxes,
            cam_k4=cam_k4, slots=slots, pad_slots=pad_slots,
            prior_uv=prior_uv, prior_valid=prior_valid,
        )
        return meta, dev

    def _commit_group(self, view_id, meta, host, sync):
        """Host bookkeeping for one group's readback: measurement-buffer row
        writes, detection records, meters, first-view object init
        (`object_slam.py:538-556,1140`). sync=False when the device mirrors
        were already updated in-kernel (the tracking tail's sym scatter)."""
        of = meta["of"]
        uv_pred = host["uv"][:of]
        keep = host["keep"][:of]
        info = host["info"][:of]
        T_pnp = host["T_pnp"][:of]
        pnp_ok = host["pnp_ok"][:of]
        if host["cov"] is not None:
            self.avg_std_sum += float(host["std_sum"])
            self.avg_std_n += int(host["std_cnt"])
        is_manual = host["cov"] is None
        if self._manual_info_run is None:
            self._manual_info_run = is_manual
        elif self._manual_info_run != is_manual:
            raise ValueError(
                "mixed manual/network info within one run: the "
                "ref_manual_info BA rescale assumes a uniform info source"
            )

        dets = self.detections.setdefault(view_id, {})
        v = self._ensure_view_slot(view_id)
        for i, obj_id in enumerate(meta["obj_ids"]):
            s = meta["slots"][i]
            self.uv[v, s] = uv_pred[i]
            self.info[v, s] = info[i]
            self.valid[v, s] = keep[i]
            self.inliers[v, s] = keep[i]  # all start as inliers (`:1140`)
            self.cam_k4[v, s] = meta["cam_k4"][i]
            pose = _to44(T_pnp[i]) if pnp_ok[i] else None
            dets[obj_id] = _Detection(
                bbox=meta["bboxes"][i].copy(),
                pose_pnp=pose,
                score=float(keep[i].mean()),
                prior_uv=meta["prior_uv"][i].copy()
                if meta["prior_valid"][i].any() else None,
            )
            self.obj_num_dets[obj_id] += 1
            self.obj_num_det_kps[obj_id] += int(keep[i].sum())
            # first-view object init (`object_slam.py:538-556`; only the
            # non-symmetric group can run before the first camera pose)
            if self.num_views_processed() == 0 and pose is not None:
                if self._has_cam_pose(view_id):
                    T_GtoC = _to44(self.cam_T[self.view_slot[view_id]])
                    self._set_obj_pose(obj_id, np.linalg.inv(T_GtoC) @ pose)
                else:
                    self._set_obj_pose(obj_id, pose)
        if sync:
            self._sync_view_row(v)
        return v

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

    # fused per-frame tail ------------------------------------------------------
    def _fused_tail(self, view_id, sym_pending):
        """Symmetric-group scatter + re-init voting + tracking BA in ONE
        device dispatch chain ending in the frame's second (final) host sync
        (`kernels.tracking_tail`; replaces the reference's per-stage
        Python<->C++ hops, `lib/object_slam.py:595-697` + `:703-930`
        curr_only path)."""
        c = self.cfg
        if len(self.view_ids) == 0 or not self._has_cam_pose(view_id):
            # nothing to optimize; the symmetric group only runs WITH a pose
            assert sym_pending is None
            return
        v = self.view_slot[view_id]

        sym_dev = None
        meta_sym = None
        if sym_pending is not None:
            meta_sym, dev = sym_pending
            ob = len(meta_sym["pad_slots"])
            sym_dev = {
                "slots": jnp.asarray(meta_sym["pad_slots"]),
                "uv": dev["uv"], "info": dev["info"], "keep": dev["keep"],
                "T_pnp": dev["T_pnp"], "pnp_ok": dev["pnp_ok"],
                "cam_k4": jnp.asarray(_pad0(meta_sym["cam_k4"], ob)),
            }

        # re-init vote window (`object_slam.py:595-697`); skipped below 2
        # processed views exactly like the reference
        reinit_in = None
        if self.num_views_processed() >= 2:
            check_n_views = (
                len(self.view_ids) if c.sfm_mode else c.reinit_check_views
            )
            check_n = min(len(self.view_ids), check_n_views)
            # non-symmetric candidates are host state (committed in phase A);
            # symmetric candidates join on-device from the pending group
            cand_sel = np.zeros((self.O,), bool)
            T_pnp_G = np.tile(np.eye(4, dtype=np.float32), (self.O, 1, 1))
            T_GtoC_inv = np.linalg.inv(_to44(self.cam_T[v]))
            for obj_id, det in self.detections.get(view_id, {}).items():
                s = self.obj_slot[obj_id]
                if det.pose_pnp is not None and self.obj_active[s]:
                    T_pnp_G[s] = T_GtoC_inv @ det.pose_pnp
                    cand_sel[s] = True
            # fixed-size view window (pad with invalid slots): one jit shape
            n_fix = _bucket(check_n, lo=c.reinit_check_views)
            cs = np.zeros((n_fix,), np.int32)
            cam_valid = np.zeros((n_fix,), bool)
            for i in range(check_n):
                cs[i] = self.view_slot[self.view_ids[-(i + 1)]]
                cam_valid[i] = self.cam_active[cs[i]]
            reinit_in = {
                "cand_sel": jnp.asarray(cand_sel),
                "T_pnp_G": jnp.asarray(T_pnp_G),
                "cs": jnp.asarray(cs),
                "cam_valid": jnp.asarray(cam_valid),
                "cam_T_w": jnp.asarray(self.cam_T[cs]),
            }

        info_scale = np.float32(
            c.manual_kp_std ** 2
            if (c.ref_manual_info and self._manual_info_run)
            else 1.0
        )
        mirrors, tail_dev = kernels.tracking_tail(
            self._dev_buf("uv"), self._dev_buf("info"), self._dev_buf("valid"),
            self._dev_buf("inliers"), self._dev_buf("cam_k4"),
            self._dev_buf("model_kp"), jnp.int32(v),
            jnp.asarray(self.cam_T[v]), jnp.asarray(self.obj_T),
            jnp.asarray(self.obj_active),
            sym_dev, reinit_in,
            info_scale, bool(c.opt_init_with_outliers),
        )
        fetch = {"tail": tail_dev}
        if sym_pending is not None:
            fetch["sym"] = {k: x for k, x in sym_pending[1].items() if x is not None}
        host = jax.device_get(fetch)  # the frame's second (final) host sync
        for name, buf in zip(self._MIRRORED[:5], mirrors):
            self._dev[name] = buf

        t = host["tail"]
        if sym_pending is not None:
            host["sym"].setdefault("cov", None)
            self._commit_group(view_id, meta_sym, host["sym"], sync=False)
        # kernel-decided map updates: late inits + re-init votes (values are
        # where()-passthrough for untouched slots, so a full copy is exact)
        self.obj_T[...] = t["obj_T"]
        self.obj_active |= t["late"]
        # tracking BA writeback (no-op values when the <3-edge gate fired)
        self.cam_T[v] = t["cam_T_v"]
        self.inliers[v] = t["inliers_row"]
        if t["did_opt"]:
            # min-inlier removal runs after every completed optimize,
            # tracking included (`lib/object_slam.py:917-930`)
            self._remove_low_inlier_objects()

    # BA ----------------------------------------------------------------------
    def optimize(self):
        """GLOBAL robust LM over the measurement buffers
        (`lib/object_slam.py:703-930`). Per-frame tracking (the reference's
        `optimize(curr_only=True)`) runs inside the fused per-frame tail
        instead — `kernels.tracking_tail` via `_fused_tail`."""
        if len(self.view_ids) == 0:
            return
        c = self.cfg

        cam_frozen = np.zeros((self.V,), bool)
        if c.max_active_views is not None:
            for view_id_old in self.view_ids[: -c.max_active_views]:
                cam_frozen[self.view_slot[view_id_old]] = True

        # reference-faithful no-cov weighting: stored info is I/sigma^2 (what
        # RANSAC/reinit need); the reference BA uses identity
        # (`object_slam.py:825-828`), so rescale the BA problem's info only.
        info_scale = (
            self.cfg.manual_kp_std ** 2
            if (self.cfg.ref_manual_info and self._manual_info_run)
            else None
        )
        info = self._dev_buf("info")
        problem = ba.BAProblem(
            cam_T=jnp.asarray(self.cam_T),
            obj_T=jnp.asarray(self.obj_T),
            uv=self._dev_buf("uv"),
            info=info if info_scale is None else info * info_scale,
            model_kp=self._dev_buf("model_kp"),
            cam_k=self._dev_buf("cam_k4"),
            valid=self._dev_buf("valid"),
            inliers=self._dev_buf("inliers"),
            cam_active=jnp.asarray(self.cam_active),
            obj_active=jnp.asarray(self.obj_active),
            cam_frozen=jnp.asarray(cam_frozen),
        )
        rounds = (10, 10, 10, 10) if c.single_view_mode else (10, 10, 40, 40)
        result = ba.optimize(
            problem,
            iters_per_round=rounds,
            tracking_only=False,
            fix_first_cam=True,
            init_with_outliers=False,
        )
        new_cam = np.asarray(result.cam_T)
        new_obj = np.asarray(result.obj_T)
        new_inl = np.asarray(result.inliers)
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
