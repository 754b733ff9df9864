#!/usr/bin/env python
"""Symmetry-choice inspector (rebuild of the reference `view_sym_choice.py`).

For a given scene/view/object, renders the object's depth silhouette under
every candidate symmetry composition T_OtoC @ T_sym and marks the one
`pick_symmetry_transform` selects (green border) vs the rest (red). Offscreen
by default — writes a grid PNG; `--show` opens a window.
"""

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="ycbv", choices=["ycbv", "tless"])
    ap.add_argument("--split", default="test")
    ap.add_argument("--scene_id", type=int, default=0)
    ap.add_argument("--view_id", type=int, default=0)
    ap.add_argument("--obj_id", type=int, default=1)
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--kp_config_root", default=None)
    ap.add_argument("--max_syms", type=int, default=16,
                    help="Cap the number of rendered candidates")
    ap.add_argument("--out", default="sym_choice.png")
    ap.add_argument("--show", action="store_true")
    args = ap.parse_args()
    data_root = args.data_root or os.path.join(
        os.getcwd(), "data/bop_datasets", args.dataset
    )

    import cv2

    from suo_slam_tpu.data.bop import BopDataset
    from suo_slam_tpu.data.mesh import load_mesh_db
    from suo_slam_tpu.eval.render import render_shaded

    ds = BopDataset(data_root, args.split, bop_dset=args.dataset,
                    kp_config_root=args.kp_config_root, seed=0)
    db = load_mesh_db(ds.models_dir)
    K = ds.data[args.scene_id][args.view_id].K
    T_gt = ds.get_obj_pose(args.scene_id, args.view_id, args.obj_id)
    T_best, i_best = ds.pick_symmetry_transform(args.obj_id - 1, T_gt)
    syms = ds.symmetries[args.obj_id - 1]
    img = ds.read_img(args.scene_id, args.view_id)
    hw = img.shape[:2]

    step = max(1, len(syms) // args.max_syms)
    idxs = list(range(0, len(syms), step))
    if i_best not in idxs:
        idxs.append(i_best)
    tiles = []
    T4 = np.eye(4)
    T4[:3, :] = T_gt[:3, :]
    for i in sorted(idxs):
        rgb, d = render_shaded(
            db.verts_full[args.obj_id], db.faces[args.obj_id], K, T4 @ syms[i], hw,
            color=(80, 220, 220),
        )
        mask = d > 0
        tile = img.copy()
        # blend the shaded candidate over the camera image (like the GL
        # overlay in the reference viewer)
        tile[mask] = (0.4 * tile[mask] + 0.6 * rgb[mask][..., ::-1]).clip(0, 255)
        color = (0, 255, 0) if i == i_best else (0, 0, 255)
        cv2.rectangle(tile, (1, 1), (hw[1] - 2, hw[0] - 2), color, 3)
        cv2.putText(tile, f"sym {i}", (8, 20), cv2.FONT_HERSHEY_PLAIN, 1.2, color, 2)
        tiles.append(tile)
    cols = int(np.ceil(np.sqrt(len(tiles))))
    rows = int(np.ceil(len(tiles) / cols))
    grid = np.zeros((rows * hw[0], cols * hw[1], 3), np.uint8)
    for k, t in enumerate(tiles):
        r, c = divmod(k, cols)
        grid[r * hw[0] : (r + 1) * hw[0], c * hw[1] : (c + 1) * hw[1]] = t
    cv2.imwrite(args.out, grid)
    print(f"Best symmetry index: {i_best}/{len(syms)}; wrote {args.out}")
    if args.show:
        cv2.imshow("sym_choice", grid)
        cv2.waitKey(0)


if __name__ == "__main__":
    main()
