#!/usr/bin/env python
"""Evaluation harness: single-view / SfM / SLAM modes over BOP datasets.

TPU-native rebuild of the reference `evaluate.py`: same CLI surface
(`--nviews 1` = single-view PnP, `--nviews N` = per-frame SfM, `--nviews -1`
= full SLAM per scene), same per-dataset hyperparameters
(`evaluate.py:58-75`), same outputs — per-method outdir with `summary.txt`,
BOP'19-format CSV `scene_id,im_id,obj_id,score,R(9),t(3),time`
(`evaluate.py:276-282,318-322`) — driving the jitted SLAM engine instead of
torch + g2o.
"""

import os
import sys

import numpy as np

YCBV_CLASSES = {
    1: "002_master_chef_can", 2: "003_cracker_box", 3: "004_sugar_box",
    4: "005_tomato_soup_can", 5: "006_mustard_bottle", 6: "007_tuna_fish_can",
    7: "008_pudding_box", 8: "009_gelatin_box", 9: "010_potted_meat_can",
    10: "011_banana", 11: "019_pitcher_base", 12: "021_bleach_cleanser",
    13: "024_bowl", 14: "025_mug", 15: "035_power_drill", 16: "036_wood_block",
    17: "037_scissors", 18: "040_large_marker", 19: "051_large_clamp",
    20: "052_extra_large_clamp", 21: "061_foam_brick",
}
TLESS_CLASSES = {i + 1: str(i + 1) for i in range(30)}


class Evaluator:
    def __init__(self, dataset, data_root, chkpt_path, nviews=1,
                 no_network_cov=False, detection_type="saved", debug_gt_kp=False,
                 gt_cam_pose=False, no_prior_det=False, no_viz=True,
                 debug_saved_only=False, give_all_prior=False,
                 kp_config_root=None, bf16=True, norm="batch", int8=False,
                 int8_scales=None, ref_manual_info=False, viz_cov=False,
                 do_viz_extra=False, show_viz=False, batched=False,
                 eval_window=16, pipeline_scenes=0, int8_online_ok=False):
        from suo_slam_tpu.data.bop import BopDataset
        from suo_slam_tpu.data.mesh import load_mesh_db
        from suo_slam_tpu.slam import ObjectSlam, SlamConfig

        self.model_path = os.path.dirname(chkpt_path) if chkpt_path else "results"
        # per-dataset hyperparameters (`evaluate.py:58-75`)
        kp_var_thresh, bbox_thresh = 0.2, 0.9
        opt_init_with_outliers = False
        if dataset == "ycbv":
            models, split, self.do_add = "models_bop-compat_eval", "test", True
            manual_kp_std = 0.01
        else:
            models, split, self.do_add = "models_eval", "test_primesense", False
            kp_var_thresh, bbox_thresh = 0.5, 1.0
            manual_kp_std = 0.1
            opt_init_with_outliers = True

        self.dataset = BopDataset(
            data_root, split, bop_dset=dataset, ignore_symmetry=True,
            kp_config_root=kp_config_root, seed=666,
        )
        models_dir = os.path.join(data_root, models)
        if not os.path.isdir(models_dir):  # eval-model dir optional in fixtures
            models_dir = self.dataset.models_dir
        self.mesh_db = load_mesh_db(models_dir)

        self.debug_saved_only = debug_saved_only
        self.model_epoch = -1
        self.object_slam = None
        self.batched_runner = None
        self.pipeline_scenes = 0 if debug_saved_only else int(pipeline_scenes)
        if not debug_saved_only:
            net = params = None
            if not debug_gt_kp:
                from suo_slam_tpu.eval.loading import load_eval_network

                net, params, self.model_epoch = load_eval_network(
                    chkpt_path, bf16=bf16, norm=norm,
                    no_network_cov=no_network_cov,
                )
            if int8 and (net is None or net.norm != "batch"):
                raise SystemExit(
                    "--int8 requires a norm='batch' checkpoint (the int8 "
                    "executor folds BatchNorm into conv epilogues); got "
                    f"norm={getattr(net, 'norm', None)!r}"
                )
            scales_path = None
            if int8:
                from suo_slam_tpu.eval.loading import default_scales_path

                cand = int8_scales or default_scales_path(chkpt_path)
                if os.path.isfile(cand):
                    scales_path = cand
                    print(f"[evaluate] int8 scales sidecar: {cand}")
                elif int8_scales:
                    raise SystemExit(f"--int8_scales not found: {int8_scales}")
                else:
                    print("[evaluate] no int8 scales sidecar (run "
                          "calibrate_int8.py to persist one) — falling back "
                          "to online first-frames calibration")
            cfg = SlamConfig(
                sfm_mode=nviews > 1,
                single_view_mode=nviews == 1,
                no_network_cov=no_network_cov or debug_gt_kp,
                no_prior_det=no_prior_det,
                give_all_prior=give_all_prior,
                debug_gt_kp=debug_gt_kp,
                kp_var_thresh=kp_var_thresh,
                bbox_thresh=bbox_thresh,
                manual_kp_std=manual_kp_std,
                opt_init_with_outliers=opt_init_with_outliers,
                ref_manual_info=ref_manual_info,
                int8_inference=int8,
                int8_scales_path=scales_path,
            )
            if self.pipeline_scenes > 1 and nviews == 1:
                # single-view mode has its own throughput path; ignoring
                # (instead of erroring) keeps one flag set valid for a whole
                # eval_all_*.sh sweep that mixes --nviews 1 and -1 legs
                print("[evaluate] --pipeline_scenes has no effect with "
                      "--nviews 1 (use --batched for the single-view "
                      "throughput mode); ignoring")
                self.pipeline_scenes = 0
            if self.pipeline_scenes > 1:
                # pipelined evaluation (eval/pipeline.py): K independent
                # problems (scenes for --nviews -1, keyframes for SfM
                # --nviews N>1) in lockstep, one multi-frame network dispatch
                # per round; each problem keeps its own engine so all SLAM
                # semantics hold
                if batched:
                    raise SystemExit(
                        "--pipeline_scenes is exclusive with --batched"
                    )
                if not no_viz:
                    raise SystemExit(
                        "--pipeline_scenes is a throughput mode; viz needs "
                        "the sequential path (drop --pipeline_scenes or "
                        "keep --no_viz)"
                    )
                if int8 and not scales_path:
                    # Hard guard (not a warning): online calibration sees
                    # DIFFERENT crops in sequential vs pipelined mode (the
                    # first batched round packs one frame from K scenes), so
                    # the two modes would silently produce different CSVs.
                    # A persisted sidecar makes them bit-identical; refuse
                    # unless the caller explicitly accepts the divergence.
                    if not int8_online_ok:
                        raise SystemExit(
                            "--int8 --pipeline_scenes without a scales "
                            "sidecar: online calibration is mode-dependent "
                            "(pipelined calibrates on a multi-scene batch, "
                            "sequential on one scene's first frames), so "
                            "results would differ from the sequential "
                            "sweep. Persist a sidecar first:\n"
                            f"  python calibrate_int8.py {chkpt_path} "
                            "--dataset <dataset>\n"
                            "or pass --int8_online_ok to accept "
                            "mode-dependent output."
                        )
                    print("[evaluate] --int8_online_ok: pipelined online "
                          "calibration accepted — outputs may differ from "
                          "the sequential sweep")
                self._pipe = {
                    "cfg": cfg, "net": net, "params": params, "int8": int8,
                    "scales_path": scales_path,
                }
                # engines are built per scene inside _run_pipelined
                self.object_slam = None
            elif batched:
                # windowed network precompute (eval/batched.py): single-view
                # sweeps run the network at large-batch throughput; the
                # engine consumes cached outputs via infer_fn and keeps all
                # PnP/BA/collection semantics
                if nviews != 1 or debug_gt_kp or net is None:
                    raise SystemExit(
                        "--batched requires --nviews 1 with a real network "
                        "(no --debug_gt_kp)"
                    )
                from suo_slam_tpu.eval.batched import BatchedSingleViewRunner
                from suo_slam_tpu.slam import kernels as slam_kernels

                batch_scales = None
                if scales_path:
                    from suo_slam_tpu.models.int8_forward import load_scales

                    batch_scales = load_scales(scales_path)
                batch_fn = slam_kernels.make_batch_inference(
                    net, params, input_hw=cfg.input_hw, int8=int8,
                    int8_scales=batch_scales,
                )
                self.batched_runner = BatchedSingleViewRunner(
                    batch_fn, self._view_inputs, window=eval_window,
                    obj_slots=cfg.obj_capacity,
                    bbox_inflate=cfg.bbox_inflate,
                )
                self.object_slam = ObjectSlam(
                    cfg, mesh_db=self.mesh_db,
                    infer_fn=self.batched_runner.infer_fn,
                )
            else:
                self.object_slam = ObjectSlam(
                    cfg, mesh_db=self.mesh_db, net=net, params=params
                )
        self.nviews = nviews
        self.detection_type = detection_type
        self.debug_gt_kp = debug_gt_kp
        self.gt_cam_pose = gt_cam_pose
        self.no_viz = no_viz
        self.viz_cov = viz_cov
        self.do_viz_extra = do_viz_extra
        self.show_viz = show_viz
        if self.show_viz and self.no_viz:
            # same nesting as the reference (`evaluate.py:202-216`): the live
            # window is part of the viz block, so --no_viz wins — but say so
            # instead of silently showing nothing.
            print("[evaluate] --show_viz has no effect with --no_viz "
                  "(viz composition is disabled); drop --no_viz for the "
                  "live window")
        self.give_all_prior = give_all_prior
        self.no_network_cov = no_network_cov
        self.no_prior_det = no_prior_det
        self.rng = np.random.default_rng(666)

        self.saved_detections = None
        if detection_type == "saved":
            from suo_slam_tpu.eval.detections import (
                build_detection_map,
                load_pix2pose_results,
                load_posecnn_results,
            )

            bop_root = os.path.realpath(os.path.join(data_root, ".."))
            if dataset == "ycbv":
                self.saved_detections = load_posecnn_results(bop_root)
            else:
                self.saved_detections = load_pix2pose_results(bop_root)
            self.saved_detections_map = build_detection_map(
                self.saved_detections, self.dataset.targets
            )

    # ------------------------------------------------------------------ run --
    def run(self):
        import time as _time

        t0 = _time.time()
        try:
            summary = self._run()
        except Exception:
            import traceback

            traceback.print_exc()
            summary = None
        print(f"Eval took {_time.time() - t0:.3f} sec")
        return summary

    def method_name(self):
        method = (
            f"pkpnet-epoch={self.model_epoch}-nviews={self.nviews}"
            f"-det={self.detection_type}"
        )
        if self.debug_gt_kp:
            method += "-GT-KP"
        if self.gt_cam_pose:
            method += "-GT-CAM-POSE"
        if self.give_all_prior:
            method += "-ALL-PRIOR"
        if self.no_network_cov:
            method += "-NO-COV"
        if self.no_prior_det:
            method += "-NO-PRIOR-DET"
        return method + f"_{self.dataset.bop_dset}-{self.dataset.split}"

    def _run(self):
        from suo_slam_tpu.eval.meter import EvalMeter

        if self.saved_detections is not None:
            self.saved_det_meter = EvalMeter(self.mesh_db)
        num_cam_poses_found = 0
        num = 0
        csv_lines = []
        outdir = None
        if not self.debug_saved_only:
            self.meter = EvalMeter(self.mesh_db)
            outdir = os.path.join(self.model_path, self.method_name())
            os.makedirs(outdir, exist_ok=True)
            print(f"Writing eval results to {outdir}")

        scene_ids = self.dataset.scene_ids()
        if self.pipeline_scenes > 1 and not self.debug_saved_only:
            num, num_cam_poses_found = self._run_pipelined(scene_ids, csv_lines)
            scene_ids = []  # the sequential loop below is fully subsumed
        for i, scene_id in enumerate(scene_ids):
            view_ids = self.dataset.view_ids(scene_id)
            if self.batched_runner is not None:
                self.batched_runner.set_plan(scene_id, view_ids)
            if not self.debug_saved_only and self.nviews < 0:
                self.object_slam.reset()
            scene_results = []
            for j, view_id in enumerate(view_ids):
                print(
                    f"Running scene [{i + 1}/{len(scene_ids)}] "
                    f"view [{j + 1}/{len(view_ids)}]",
                    flush=True,
                )
                gt_obj_ids = self.dataset.obj_ids(scene_id, view_id)
                if not self.debug_saved_only:
                    views_to_proc = [view_id]
                    if self.nviews > 1:
                        views_to_proc += self._sample_sfm_views(view_ids, j)
                    results = self._run_slam(scene_id, views_to_proc)
                    if len(results) == 0:
                        continue
                    pred_poses = (
                        results[view_id]["poses"] if self.nviews > 0 else None
                    )
                    scene_results.append((view_id, pred_poses, gt_obj_ids))
                    if not self.no_viz:
                        self._write_viz(outdir, scene_id, j, view_id, results)

                if self.do_add and self.saved_detections is not None:
                    self._update_saved_det_meter(scene_id, view_id, gt_obj_ids)

            if self.debug_saved_only:
                continue
            # score the whole scene with the final optimized state
            final_results = (
                self.object_slam.collect_results(final=True)
                if self.nviews < 0 else None
            )
            n, nc = self._score_scene(
                scene_id, scene_results, final_results, csv_lines
            )
            num += n
            num_cam_poses_found += nc

        gt_obj_map = YCBV_CLASSES if self.dataset.bop_dset == "ycbv" else TLESS_CLASSES
        gt_obj_map = {
            o: n for o, n in gt_obj_map.items() if o <= self.dataset.num_obj()
        }
        summary = {}
        if self.do_add and self.saved_detections is not None:
            print("\nSaved detections result:")
            self.saved_det_meter.pprint_objs_str(gt_obj_map)
            summary["saved_det"] = {
                k: v[0] for k, v in self.saved_det_meter.result().items()
            }
        if not self.debug_saved_only:
            if self.do_add:
                print(f"\n{self.method_name()} result:")
                print(self.meter.pprint_objs_str(gt_obj_map))
                summary["ours"] = {k: v[0] for k, v in self.meter.result().items()}
            with open(os.path.join(outdir, "summary.txt"), "w") as f:
                if self.do_add:
                    f.write(self.meter.pprint_objs_str(gt_obj_map))
                if num > 0:
                    hz = self._tracking_hz()
                    lines = [
                        f"NOTE: {100 * num_cam_poses_found / num:.1f}% of camera poses found!",
                        f"TIMING: Tracking {hz:.2f} Hz",
                        f"Average keypoint stdev: {self._avg_kp_std():.5f}",
                    ]
                    for s in lines:
                        print(s)
                        f.write("\n" + s + "\n")
                    summary["cam_pose_pct"] = 100 * num_cam_poses_found / num
                    summary["tracking_hz"] = hz
            csv_path = os.path.join(outdir, self.method_name() + ".csv")
            with open(csv_path, "w") as f:
                f.writelines(csv_lines)
            print(f"CSV (BOP format) results written to {csv_path}")
            if self.dataset.bop_dset == "tless":
                try:
                    from suo_slam_tpu.eval.vsd import run_vsd_eval

                    summary["vsd"] = run_vsd_eval(
                        csv_path, self.dataset, self.mesh_db, outdir
                    )
                except ImportError:
                    print("VSD eval not available yet")
        return summary

    def _score_scene(self, scene_id, scene_results, final_results, csv_lines):
        """Score one finished scene (meter updates + BOP CSV lines); returns
        (n_views_scored, n_cam_poses_found). Shared by the sequential loop
        and `_run_pipelined` — the pipelined path calls it on the main
        thread in scene order, so meters/CSV are identical either way."""
        num = num_cam = 0
        for view_id, pred_poses, gt_obj_ids in scene_results:
            num += 1
            if self.nviews < 0:
                if view_id not in final_results:
                    if self.do_add:
                        for obj_id in gt_obj_ids:
                            self.meter.update_no_det([obj_id])
                    continue
                num_cam += 1
                pred_poses = final_results[view_id]["poses"]
            for obj_id in gt_obj_ids:
                r = pred_poses.get(obj_id)
                if r is not None and r["T_OtoC"] is not None:
                    gt_pose = self.dataset.get_obj_pose(scene_id, view_id, obj_id)
                    if self.do_add:
                        self.meter.update([obj_id], [r["T_OtoC"]], [gt_pose])
                    R, t = r["T_OtoC"][:3, :3], r["T_OtoC"][:3, 3]
                    arr2str = lambda x: " ".join(
                        str(e) for e in np.asarray(x).reshape(-1).tolist()
                    )
                    if self.dataset.is_target(scene_id, view_id, obj_id):
                        csv_lines.append(
                            f"{scene_id},{view_id},{obj_id},{r['score']},"
                            f"{arr2str(R)},{arr2str(t)},-1\n"
                        )
                else:
                    self.meter.update_no_det([obj_id])
        return num, num_cam

    def _sample_sfm_views(self, view_ids, j):
        """Extra views for keyframe j's SfM re-solve (`evaluate.py:196-198`).

        Single source for the `self.rng` draw: the sequential loop and the
        pipelined work-item precompute call THIS in the same iteration
        order, which is what keeps their sampled view sets — and therefore
        pipelined==sequential output parity — in lockstep."""
        others = view_ids[:j] + view_ids[j + 1 :]
        return list(self.rng.choice(
            others, size=min(self.nviews - 1, len(others)), replace=False
        ))

    def _run_pipelined(self, scene_ids, csv_lines):
        """Pipelined sweep (`--pipeline_scenes K`): K worker threads each
        drive their own engine over an independent problem — a whole scene
        for full SLAM (--nviews -1), one keyframe's N-view re-solve for SfM
        (--nviews N>1) — and a BatchingInferServer turns the K concurrent
        per-frame network calls into one multi-frame dispatch
        (eval/pipeline.py). Scoring stays on the main thread in scene/view
        order, so all artifacts match the sequential path."""
        from suo_slam_tpu.eval.pipeline import BatchingInferServer, ScenePool
        from suo_slam_tpu.slam import ObjectSlam
        from suo_slam_tpu.slam import kernels as slam_kernels

        # Work items. For SfM the extra-view sampling draws from self.rng on
        # the MAIN thread in the sequential iteration order, so the sampled
        # view sets are identical to the sequential sweep's.
        if self.nviews < 0:
            items = [("scene", scene_id, None) for scene_id in scene_ids]
        else:
            items = []
            for scene_id in scene_ids:
                view_ids = self.dataset.view_ids(scene_id)
                for j, view_id in enumerate(view_ids):
                    views = [int(view_id)] + [
                        int(v) for v in self._sample_sfm_views(view_ids, j)
                    ]
                    items.append(("kf", scene_id, (int(view_id), views)))

        K = min(self.pipeline_scenes, len(items))
        server = None
        if self._pipe["net"] is not None:
            scales = None
            if self._pipe["scales_path"]:
                from suo_slam_tpu.models.int8_forward import load_scales

                scales = load_scales(self._pipe["scales_path"])
            multi_fn = slam_kernels.make_multi_frame_inference(
                self._pipe["net"], self._pipe["params"],
                input_hw=self._pipe["cfg"].input_hw,
                int8=self._pipe["int8"], int8_scales=scales,
            )
            server = BatchingInferServer(multi_fn, K)
        kind = "scenes" if self.nviews < 0 else "SfM keyframes"
        print(f"Pipelining {len(items)} {kind} over {K} workers"
              + (" (batched network dispatch)" if server else ""))

        import threading

        warmed = threading.Event()

        def run_item(cid, item):
            _, scene_id, payload = item
            eng = ObjectSlam(
                self._pipe["cfg"], mesh_db=self.mesh_db,
                infer_fn=None if server is None else server.client(cid),
            )
            # the sequential sweep's timing warm-up excludes only the RUN's
            # first 6 views (one long-lived engine); a fresh engine per work
            # item would re-exclude per scene/keyframe and starve the
            # tracking-Hz meter, so pre-warm every engine after the first
            if warmed.is_set():
                eng.all_time_num_views = 6
            else:
                warmed.set()
            stats = lambda: {
                "track_times": list(eng.track_times),
                "std_sum": eng.avg_std_sum, "std_n": eng.avg_std_n,
            }
            if self.nviews < 0:
                scene_results = []
                for view_id in self.dataset.view_ids(scene_id):
                    view_id = int(view_id)
                    gt_obj_ids = self.dataset.obj_ids(scene_id, view_id)
                    self._feed_view(eng, scene_id, view_id, store_last=False)
                    results = eng.collect_results(last_only=True)
                    if len(results) == 0:
                        continue
                    scene_results.append((view_id, None, gt_obj_ids))
                return {
                    "scene_results": scene_results,
                    "final": eng.collect_results(final=True),
                    **stats(),
                }
            # SfM keyframe: fresh engine == sequential's reset-per-keyframe
            view_id, views = payload
            for v in views:
                self._feed_view(eng, scene_id, v,
                                first_for_gt_cam=views[0], store_last=False)
            results = eng.collect_results(last_only=False)
            if len(results) == 0:
                return {"kf": None, **stats()}
            return {
                "kf": (view_id, results[view_id]["poses"],
                       self.dataset.obj_ids(scene_id, view_id)),
                **stats(),
            }

        # ScenePool keys results by the work item; the SfM payload holds an
        # unhashable view list, so key by (kind, scene, keyframe) instead
        keyed = [(it[0], it[1], it[2] if it[0] == "scene" else it[2][0])
                 for it in items]
        by_key = dict(zip(keyed, items))
        results = ScenePool(server, K).run(
            keyed, lambda cid, key: run_item(cid, by_key[key])
        )

        num = num_cam = 0
        self._pipe_stats = {"track_times": [], "std_sum": 0.0, "std_n": 0}

        def absorb(r):
            self._pipe_stats["track_times"].extend(r["track_times"])
            self._pipe_stats["std_sum"] += r["std_sum"]
            self._pipe_stats["std_n"] += r["std_n"]

        do_saved = self.do_add and self.saved_detections is not None
        for scene_id in scene_ids:
            if self.nviews < 0:
                r = results.get(("scene", scene_id, None))
                if r is None:
                    continue
                absorb(r)
                scene_results = r["scene_results"]
                final = r["final"]
            else:
                scene_results = []
                for view_id in self.dataset.view_ids(scene_id):
                    r = results.get(("kf", scene_id, int(view_id)))
                    if r is None:
                        continue
                    absorb(r)
                    if r["kf"] is not None:
                        scene_results.append(r["kf"])
                final = None
            if do_saved:
                # the sequential loop only reaches the saved-det update for
                # views whose collect_results was non-empty (the `continue`
                # above it) — scene_results holds exactly those views
                for view_id, _, gt_obj_ids in scene_results:
                    self._update_saved_det_meter(scene_id, view_id, gt_obj_ids)
            n, nc = self._score_scene(scene_id, scene_results, final, csv_lines)
            num += n
            num_cam += nc
        return num, num_cam

    def _update_saved_det_meter(self, scene_id, view_id, gt_obj_ids):
        for gt_obj_id in gt_obj_ids:
            sd = self.saved_detections_map.get(scene_id, {}).get(view_id, {})
            if gt_obj_id in sd:
                idx = sd[gt_obj_id]
                self.saved_det_meter.update(
                    [gt_obj_id],
                    [self.saved_detections["poses"][idx]],
                    [self.dataset.get_obj_pose(scene_id, view_id, gt_obj_id)],
                )
            else:
                self.saved_det_meter.update_no_det([gt_obj_id])

    def _tracking_hz(self):
        if self.object_slam is not None:
            return self.object_slam.tracking_hz()
        tt = self._pipe_stats["track_times"]
        # NOTE: pipelined per-frame times include cross-scene batching waits;
        # the end-to-end "Eval took" wall clock is the throughput number.
        return 0.0 if not tt else 1.0 / (sum(tt) / len(tt))

    def _avg_kp_std(self):
        if self.object_slam is not None:
            return self.object_slam.avg_kp_std()
        s, n = self._pipe_stats["std_sum"], self._pipe_stats["std_n"]
        return 0.0 if n == 0 else s / n

    def _write_viz(self, outdir, scene_id, j, view_id, results):
        """3-panel viz image per frame (`evaluate.py:202-229` in the
        reference); per-object figure panels under `--do_viz_extra`
        (`evaluate.py:222-229`, `lib/object_slam.py:277-308`)."""
        import cv2

        from suo_slam_tpu.eval.viz import make_extra_viz, make_frame_viz

        viz_dir = os.path.join(outdir, "viz_images")
        os.makedirs(viz_dir, exist_ok=True)
        eng = self.object_slam
        view_for_viz = eng.view_ids[-1] if eng.view_ids else view_id
        dets = eng.get_view_viz_data(view_for_viz)
        if not self.viz_cov:
            # ellipses on the kp panel are opt-in (`object_slam.py:268`)
            dets = {o: {**d, "cov": None} for o, d in dets.items()}
        poses = {
            o: r["T_OtoC"]
            for o, r in results.get(view_for_viz, {}).get("poses", {}).items()
        }
        img = self._last_img
        # full-image prior blend panel like the reference's LEFT panel
        # (`object_slam.py:263-266`): rasterize each detection's prior kps
        from suo_slam_tpu.eval.viz import _bbox_ndc_to_px, render_prior_px

        priors = None
        for o, d in dets.items():
            if d.get("prior_uv") is None:
                continue
            pm = d.get("model_mask")
            if pm is None:
                pm = np.ones(d["prior_uv"].shape[0], bool)
            centers = _bbox_ndc_to_px(d["prior_uv"][pm], d["bbox"])
            pmap = render_prior_px(img.shape[:2], centers, np.where(pm)[0])
            priors = pmap if priors is None else np.maximum(priors, pmap)
        viz = make_frame_viz(
            img, dets, poses, self._last_K, mesh_db=self.mesh_db,
            priors=priors,
        )
        cv2.imwrite(
            os.path.join(viz_dir, f"scene_{scene_id}_{j:06d}.png"), viz[..., ::-1]
        )
        if self.show_viz:
            # live window like the reference (`evaluate.py:215-216`). cv2's
            # Qt backend ABORTS the process when no display server exists
            # (not a catchable cv2.error), so gate on one being present.
            if not (os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY")):
                self.show_viz = False
                print("[evaluate] --show_viz: no display server; disabled")
            else:
                try:
                    cv2.imshow("ObjectSLAM", viz[..., ::-1])
                    cv2.waitKey(1)
                except cv2.error:
                    self.show_viz = False
                    print("[evaluate] --show_viz: imshow failed; disabled")
        if self.do_viz_extra:
            extra = make_extra_viz(
                img, dets, poses, self._last_K, mesh_db=self.mesh_db,
                viz_cov=self.viz_cov,
            )
            extra_dir = os.path.join(viz_dir, f"scene_{scene_id}_{j:06d}")
            os.makedirs(extra_dir, exist_ok=True)
            for name, im in extra.items():
                cv2.imwrite(os.path.join(extra_dir, f"{name}.png"), im[..., ::-1])

    def _view_inputs(self, scene_id, view_id):
        """Per-view detections + sample: (obj_ids [N], bboxes [N, 4],
        sample) or None when saved detections have nothing usable."""
        obj_ids_gt = self.dataset.obj_ids(scene_id, view_id)
        if "gt" in self.detection_type:
            obj_ids = obj_ids_gt
        else:
            sd = self.saved_detections_map.get(scene_id, {}).get(view_id, {})
            obj_ids = [o for o in sd if o in obj_ids_gt]
            if not obj_ids:
                return None
        sample = self.dataset.get_raw(scene_id, view_id, obj_ids, p_give_prior=0.0)
        if "gt" in self.detection_type:
            bboxes = sample["bboxes"]
        else:
            sd = self.saved_detections_map[scene_id][view_id]
            bboxes = np.stack(
                [self.saved_detections["bboxes"][sd[o]] for o in obj_ids]
            )
        return np.asarray(obj_ids, np.int64), np.asarray(bboxes), sample

    _MISSING = object()

    def _feed_view(self, engine, scene_id, view_id_k, first_for_gt_cam=-1,
                   inputs=_MISSING, store_last=True):
        """Load one view's detections and feed `engine.process_view`.

        Returns False when the view has no usable detections. Shared by the
        sequential `_run_slam` and the scene-pipelined workers
        (`_run_pipelined`), which pass `store_last=False` — the `_last_*`
        viz state is main-thread-only."""
        if inputs is self._MISSING:
            inputs = self._view_inputs(scene_id, view_id_k)
        if inputs is None:
            print(f"WARNING no detections for scene {scene_id} view {view_id_k}")
            return False
        obj_ids, bboxes, sample = inputs
        obj_ids = np.asarray(obj_ids)
        bboxes = np.asarray(bboxes, np.float32)
        if store_last:
            self._last_img, self._last_K = sample["img"], sample["K"]
        cam_pose = None
        if self.gt_cam_pose:
            from suo_slam_tpu.data.bop import _to44_cam

            cam_pose = _to44_cam(
                self.dataset.get_cam_pose(scene_id, view_id_k)
            ) @ np.linalg.inv(
                _to44_cam(self.dataset.get_cam_pose(scene_id, first_for_gt_cam))
            )
        engine.process_view(
            view_id_k, sample["img"], sample["K"],
            np.asarray(obj_ids, np.int64), np.asarray(bboxes),
            sample["model_kps"], sample["kp_model_masks"], sample["kp_masks"],
            uv_gt=sample["kp_uvs"] if self.debug_gt_kp else None,
            cam_pose=cam_pose,
        )
        return True

    def _run_slam(self, scene_id, views_to_proc):
        if self.nviews > 0:
            self.object_slam.reset()
        else:
            assert len(views_to_proc) == 1
        for view_id_k in views_to_proc:
            view_id_k = int(view_id_k)
            inputs = self._MISSING
            if self.batched_runner is not None:
                # windowed precompute path: get() runs the network for the
                # next window on a miss and arms infer_fn for this view
                ent = self.batched_runner.get(scene_id, view_id_k)
                inputs = None if ent is None else (
                    ent["obj_ids"], ent["bboxes"], ent["sample"]
                )
            first = -1 if self.nviews < 0 else int(views_to_proc[0])
            self._feed_view(
                self.object_slam, scene_id, view_id_k,
                first_for_gt_cam=first, inputs=inputs,
            )
        return self.object_slam.collect_results(last_only=self.nviews < 0)


def main():
    from suo_slam_tpu.args import get_args
    from suo_slam_tpu.utils.jit_cache import enable_jit_cache

    enable_jit_cache()
    args = get_args("eval")
    if args.debug_gt_kp:
        args.detection_type = "gt"
    print("======= Eval Args ================")
    for k, v in sorted(vars(args).items()):
        print(f"{k}: {v}")
    print("==================================")
    np.random.seed(666)
    Evaluator(
        args.dataset, args.data_root, args.checkpoint_path, nviews=args.nviews,
        no_network_cov=args.no_network_cov, detection_type=args.detection_type,
        debug_gt_kp=args.debug_gt_kp, gt_cam_pose=args.gt_cam_pose,
        no_prior_det=args.no_prior_det, no_viz=args.no_viz,
        debug_saved_only=args.debug_saved_only, give_all_prior=args.give_all_prior,
        kp_config_root=args.kp_config_root, bf16=args.bf16, norm=args.norm,
        int8=args.int8, int8_scales=args.int8_scales,
        ref_manual_info=args.ref_manual_info,
        viz_cov=args.viz_cov, do_viz_extra=args.do_viz_extra,
        show_viz=args.show_viz, batched=args.batched,
        eval_window=args.eval_window, pipeline_scenes=args.pipeline_scenes,
        int8_online_ok=args.int8_online_ok,
    ).run()


if __name__ == "__main__":
    main()
