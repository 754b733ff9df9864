#!/usr/bin/env python
"""Manual keypoint labeling tool.

Rebuild of the reference `manual_keypoints.py`: click >= 3 samples per
semantic keypoint on rendered views of an object mesh; means + sample
covariances are saved to `kp_info/obj_XXXXXX_kp_info.json` (the format
`data.bop.BopDataset` consumes). Rendering uses the built-in z-buffer
rasterizer (`suo_slam_tpu/eval/render.py`) — no OpenGL required.

Usage:
  ./manual_keypoints.py --dataset ycbv --obj_id 3 [--data_root ...]
  ./manual_keypoints.py --dataset ycbv --viz        # offscreen label viz grid

GUI keys: 0-9/n/p select keypoint channel, u undo last sample, v inspect
(covariance ellipses + view-pose adjustment: w/a/s/d rotate, i/o zoom,
Enter accept pose, Esc back — reference `manual_keypoints.py:212-326`),
s save, q quit. The saved view_pose is the one accepted in the inspection
pane; it canonicalizes symmetric-object GT at train time.
"""

import argparse
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="ycbv", choices=["ycbv", "tless"])
    ap.add_argument("--obj_id", type=int, default=1)
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--kp_config_root", default=None)
    ap.add_argument("--viz", action="store_true",
                    help="Offscreen: render labeled keypoints for all objects")
    ap.add_argument("--out", default=None, help="Output dir for --viz images")
    args = ap.parse_args()
    data_root = args.data_root or os.path.join(
        os.getcwd(), "data/bop_datasets", args.dataset
    )
    models = "models_bop-compat" if args.dataset == "ycbv" else "models_cad"
    models_dir = os.path.join(data_root, models)

    from suo_slam_tpu.data.mesh import load_mesh_db
    from suo_slam_tpu.kp import config as kp_config
    from suo_slam_tpu.tools.labeling import KeypointLabeler, load_kp_info

    mesh_db = load_mesh_db(models_dir)
    K = np.array([[420.0, 0, 160.0], [0, 420.0, 120.0], [0, 0, 1.0]])

    if args.viz:
        import cv2

        from suo_slam_tpu.eval.viz import draw_points

        out_dir = args.out or os.path.join(data_root, "kp_info_viz")
        os.makedirs(out_dir, exist_ok=True)
        cfg = kp_config.load_kp_config(args.dataset, args.kp_config_root)
        for obj_id in mesh_db.obj_ids:
            path = os.path.join(data_root, "kp_info", f"obj_{obj_id:06d}_kp_info.json")
            if not os.path.exists(path):
                continue
            kps, _ = load_kp_info(path)
            lab = KeypointLabeler(
                mesh_db.verts_full[obj_id], mesh_db.faces[obj_id], K,
                diameter=float(mesh_db.diameter[obj_id - 1]),
            )
            panel = lab.render_panel()[..., ::-1].copy()  # RGB -> BGR for cv2
            h, w = lab.hw
            n = len(lab.view_poses)
            for vi, T in enumerate(lab.view_poses):
                ox = (vi % (n // 2)) * w
                oy = (vi // (n // 2)) * h
                for name, (mean, _) in kps.items():
                    p = T[:3, :3] @ mean + T[:3, 3]
                    uvw = K @ p
                    uv = uvw[:2] / uvw[2]
                    col = kp_config.kp_color(name).tolist()
                    cv2.circle(panel, (int(uv[0] + ox), int(uv[1] + oy)), 3, col, -1)
            fn = os.path.join(out_dir, f"obj_{obj_id:06d}.png")
            cv2.imwrite(fn, panel)
            print("Wrote", fn)
        return

    # ---- interactive labeling -------------------------------------------
    import cv2

    obj_id = args.obj_id
    labeler = KeypointLabeler(
        mesh_db.verts_full[obj_id], mesh_db.faces[obj_id], K,
        diameter=float(mesh_db.diameter[obj_id - 1]),
    )
    cfg = kp_config.load_kp_config(args.dataset, args.kp_config_root)
    kp_names = cfg.kp_names[obj_id - 1]
    state = {"kp_idx": 0}
    h, w = labeler.hw
    n = len(labeler.view_poses)

    def redraw():
        panel = labeler.render_panel()[..., ::-1].copy()  # RGB -> BGR for cv2
        name = kp_names[state["kp_idx"]]
        ns = len(labeler.samples.get(name, []))
        cv2.putText(panel, f"[{state['kp_idx'] + 1}/{len(kp_names)}] {name} "
                    f"({ns} samples; >=3 to save)", (8, 16),
                    cv2.FONT_HERSHEY_PLAIN, 1.0, (0, 255, 0), 1)
        cv2.imshow("manual_keypoints", panel)

    def on_mouse(event, x, y, flags, _):
        if event != cv2.EVENT_LBUTTONDOWN:
            return
        vi = (y // h) * (n // 2) + (x // w)
        name = kp_names[state["kp_idx"]]
        ok = labeler.add_sample(name, vi, x % w, y % h)
        print(("added" if ok else "MISSED surface:"), name, "view", vi)
        redraw()

    cv2.namedWindow("manual_keypoints")
    cv2.setMouseCallback("manual_keypoints", on_mouse)
    redraw()
    while True:
        k = cv2.waitKey(50) & 0xFF
        if k == ord("q"):
            break
        elif k == ord("n"):
            state["kp_idx"] = (state["kp_idx"] + 1) % len(kp_names)
            redraw()
        elif k == ord("p"):
            state["kp_idx"] = (state["kp_idx"] - 1) % len(kp_names)
            redraw()
        elif k == ord("u"):
            name = kp_names[state["kp_idx"]]
            if labeler.samples.get(name):
                labeler.samples[name].pop()
            redraw()
        elif k == ord("v"):
            # inspection pane: cov-propagated ellipses + view-pose
            # adjustment (reference `manual_keypoints.py:212-326`)
            from suo_slam_tpu.tools.labeling import adjust_view_pose

            print("Inspect: w/a/s/d rotate, i/o zoom, Enter accept pose, "
                  "Esc back")
            while True:
                img, ok = labeler.render_inspection()
                cv2.imshow("Inspect Results", img[..., ::-1])
                ki = cv2.waitKey(20) & 0xFF
                if ki == 27:  # Esc
                    cv2.destroyWindow("Inspect Results")
                    break
                elif ki == 13:  # Enter: accept the adjusted view pose
                    if not ok:
                        print("ERROR: some sampled keypoints have < 3 "
                              "samples; add more or undo them.")
                        continue
                    print("Accepted view_pose (saved with 's'):\n",
                          labeler.view_pose)
                    cv2.destroyWindow("Inspect Results")
                    break
                elif 0 <= ki < 128 and chr(ki) in "wasdio":
                    labeler.view_pose = adjust_view_pose(
                        labeler.view_pose, chr(ki)
                    )
            redraw()
        elif k == ord("s"):
            path = os.path.join(
                data_root, "kp_info", f"obj_{obj_id:06d}_kp_info.json"
            )
            labeler.save(path)
            print("Saved", path)


if __name__ == "__main__":
    main()
