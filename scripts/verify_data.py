#!/usr/bin/env python3
"""Eval-day data verification — step 0 of docs/REAL_DATA.md.

Checks a populated `data/bop_datasets/` tree end to end with the SAME
loaders the train/eval CLIs use (reference data contract:
`/root/reference/README.md:60-66`), then prints the exact eval-day
commands. Every check is independent; the script reports PASS / SKIP /
FAIL per item and exits non-zero if anything required FAILED.

Usage:
    python scripts/verify_data.py [--bop_root data/bop_datasets]
        [--dataset ycbv|tless|all] [--checkpoint path/to/model_best(.pth.tar)]

Checked per dataset:
  - directory layout (models dirs, splits, kp_info, keyframe/target lists)
  - mesh database load (models_info.json + every PLY)
  - kp_info JSON schema (41-name vocabulary, pos_mean[3]/pos_cov[9],
    view_pose[16]) for every object in models_info
  - one full `BopDataset.get_raw` per present split (exercises image/depth
    decode, symmetry stacks, NDC projection, masks, prior rendering)
  - saved-detections pkl parse (PoseCNN for YCBV incl. offsets.txt fixup,
    Pix2Pose for T-LESS) + detection-map build
  - VOC background dir (needed by synthetic training splits)
  - optional torch-checkpoint conversion (--checkpoint *.pth.tar)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# Data verification is host-side (numpy loaders + one tiny network load);
# never stall on a TPU tunnel init for it. Env var alone is insufficient if
# the environment pre-imports jax (sitecustomize), so set the config too.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover - jax optional for pure-layout checks
    pass

PASS, FAIL, SKIP = "PASS", "FAIL", "SKIP"

YCBV_SPLITS = ("train_real", "train_synt", "train_pbr", "test")
TLESS_SPLITS = ("train_primesense", "test_primesense")


def _fmt(status, name, detail=""):
    pad = " " * max(1, 44 - len(name))
    return f"  [{status}] {name}{pad}{detail}"


class Report:
    def __init__(self):
        self.rows = []

    def add(self, status, name, detail=""):
        self.rows.append((status, name, detail))
        print(_fmt(status, name, detail), flush=True)

    @property
    def failed(self):
        return [r for r in self.rows if r[0] == FAIL]


def check(report, name, fn, skip_reason=None):
    """Run one check; exceptions become FAIL rows with the message."""
    if skip_reason is not None:
        report.add(SKIP, name, skip_reason)
        return None
    try:
        detail = fn()
        report.add(PASS, name, detail or "")
        return True
    except Exception as e:  # noqa: BLE001 - report, don't crash the sweep
        report.add(FAIL, name, f"{type(e).__name__}: {e}")
        return False


def check_layout(report, ds_root, dataset):
    models = (
        ["models_bop-compat", "models_bop-compat_eval"]
        if dataset == "ycbv" else ["models_cad", "models_eval"]
    )
    for d in models:
        p = os.path.join(ds_root, d)
        check(report, f"{dataset}/{d}/",
              (lambda p=p: None if os.path.isdir(p) else (_ for _ in ()).throw(
                  FileNotFoundError(p))))
    extra = "keyframe.txt" if dataset == "ycbv" else "all_target_tless.json"
    p = os.path.join(ds_root, extra)
    check(report, f"{dataset}/{extra}",
          (lambda p=p: None if os.path.isfile(p) else (_ for _ in ()).throw(
              FileNotFoundError(p))))


def check_mesh_db(report, ds_root, dataset):
    from suo_slam_tpu.data.mesh import load_mesh_db

    models_dir = os.path.join(
        ds_root,
        "models_bop-compat_eval" if dataset == "ycbv" else "models_eval",
    )
    if not os.path.isdir(models_dir):
        models_dir = os.path.join(
            ds_root, "models_bop-compat" if dataset == "ycbv" else "models_cad"
        )

    def run():
        db = load_mesh_db(models_dir)
        n = len(db.diameter)
        n_sym = int(sum(bool(s) for s in db.is_symmetric))
        return f"{n} meshes, {n_sym} symmetric"

    check(report, f"{dataset} mesh database", run)


def check_kp_info(report, ds_root, dataset, kp_config_root):
    from suo_slam_tpu.kp import config as kp_config

    def run():
        mi_dir = os.path.join(
            ds_root,
            "models_bop-compat" if dataset == "ycbv" else "models_cad",
        )
        with open(os.path.join(mi_dir, "models_info.json")) as f:
            obj_ids = sorted(int(k) for k in json.load(f))
        names = set(kp_config.kp_list)
        n_kp = 0
        for obj_id in obj_ids:
            p = os.path.join(ds_root, "kp_info", f"obj_{obj_id:06d}_kp_info.json")
            with open(p) as f:
                info = json.load(f)
            assert "keypoints" in info and "view_pose" in info, p
            assert len(info["view_pose"]) == 16, f"{p}: view_pose != 16 floats"
            for name, kp in info["keypoints"].items():
                assert name in names, f"{p}: unknown keypoint name {name!r}"
                assert len(kp["pos_mean"]) == 3, f"{p}:{name} pos_mean != 3"
                assert len(kp["pos_cov"]) == 9, f"{p}:{name} pos_cov != 9"
                n_kp += 1
        return f"{len(obj_ids)} objects, {n_kp} labeled keypoints"

    check(report, f"{dataset} kp_info schema", run)


def check_splits(report, ds_root, dataset, kp_config_root):
    from suo_slam_tpu.data.bop import BopDataset

    splits = YCBV_SPLITS if dataset == "ycbv" else TLESS_SPLITS
    any_present = False
    for split in splits:
        name = f"{dataset}/{split} get_raw"
        if not os.path.isdir(os.path.join(ds_root, split)):
            check(report, name, None, skip_reason="split not on disk")
            continue
        any_present = True

        def run(split=split):
            ds = BopDataset(
                ds_root, split, bop_dset=dataset, ignore_symmetry="test" in split,
                kp_config_root=kp_config_root, seed=0,
            )
            s = ds.scene_ids()[0]
            v = ds.view_ids(s)[0]
            obj_ids = ds.obj_ids(s, v)
            if dataset == "tless" and split == "train_primesense":
                # the T-LESS train split is one-object-per-scene and its
                # paste-occluder path asserts that; probe per object like
                # the training loader does
                obj_ids = obj_ids[:1]
            raw = ds.get_raw(s, v, obj_ids)
            k = int(raw["kp_masks"].sum())
            return (f"scene {s} view {v}: {len(obj_ids)} objects, "
                    f"{k} projected kps, img {raw['img'].shape}")

        check(report, name, run)
    if not any_present:
        report.add(FAIL, f"{dataset} splits", "no split directory found")


def check_saved_detections(report, bop_root, dataset):
    from suo_slam_tpu.eval import detections as det

    if dataset == "ycbv":
        pkl = os.path.join(bop_root, "saved_detections", "ycbv_posecnn.pkl")
        off = os.path.join(bop_root, "ycbv", "offsets.txt")
        missing = [p for p in (pkl, off) if not os.path.isfile(p)]
        if missing:
            check(report, "ycbv PoseCNN detections", None,
                  skip_reason=f"missing {missing[0]} (GT-detection eval "
                              "still works)")
            return

        def run():
            data = det.build_detection_map(det.load_posecnn_results(bop_root))
            n = sum(len(v) for v in data.values())
            return f"{len(data)} frames, {n} detections"

        check(report, "ycbv PoseCNN detections", run)
    else:
        pkl = os.path.join(
            bop_root, "saved_detections",
            "tless_pix2pose_retinanet_siso_top1.pkl",
        )
        if not os.path.isfile(pkl):
            check(report, "tless Pix2Pose detections", None,
                  skip_reason=f"missing {pkl} (GT-detection eval still works)")
            return

        def run():
            data = det.build_detection_map(det.load_pix2pose_results(bop_root))
            n = sum(len(v) for v in data.values())
            return f"{len(data)} frames, {n} detections"

        check(report, "tless Pix2Pose detections", run)


def check_voc(report, bop_root):
    bg_dir = os.environ.get(
        "SUO_BG_IMAGES_DIR",
        os.path.join(bop_root, "VOCdevkit/VOC2012/JPEGImages"),
    )
    if not os.path.isdir(bg_dir):
        check(report, "VOC backgrounds", None,
              skip_reason=f"{bg_dir} absent (needed only for synthetic "
                          "TRAINING splits)")
        return

    def run():
        exts = (".jpg", ".jpeg", ".JPEG", ".png")
        n = sum(1 for f in os.listdir(bg_dir) if f.endswith(exts))
        assert n > 0, f"no images in {bg_dir}"
        return f"{n} images"

    check(report, "VOC backgrounds", run)


def check_checkpoint(report, chkpt):
    if not chkpt:
        check(report, "checkpoint load", None,
              skip_reason="pass --checkpoint to test conversion/load")
        return

    def run():
        from suo_slam_tpu.eval.loading import load_eval_network

        net, variables, epoch = load_eval_network(chkpt)
        import jax

        n = sum(x.size for x in jax.tree.leaves(variables["params"]))
        kind = "torch-converted" if chkpt.endswith((".pth.tar", ".pth")) else "native"
        return f"{kind}, epoch {epoch}, {n/1e6:.1f}M params"

    check(report, "checkpoint load", run)


def print_commands(bop_root, datasets, chkpt):
    ck = chkpt or "results/<run>/model_best"
    print("\nAll required checks passed. Eval-day commands (REAL_DATA.md):")
    for ds in datasets:
        root = os.path.join(bop_root, ds)
        sweep = f"./scripts/eval_all_{ds}.sh {ck} --data_root {root}"
        n_pipe = 12 if ds == "ycbv" else 20
        print(f"\n  # {ds}: paper sweep -> table.txt")
        print(f"  {sweep}")
        print(f"  # throughput mode (identical results):")
        print(f"  {sweep} --no_viz --pipeline_scenes {n_pipe}")
        print(f"  # metric-code sanity on the shipped detections:")
        print(f"  python evaluate.py --dataset {ds} --nviews 1 "
              f"--debug_saved_only --checkpoint_path '' --data_root {root}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--bop_root", default="data/bop_datasets")
    ap.add_argument("--dataset", default="all", choices=["ycbv", "tless", "all"])
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--kp_config_root", default=None,
                    help="Override kp_configs dir (default: <ds_root>/kp_configs "
                         "if present, else repo kp_configs/)")
    args = ap.parse_args(argv)

    bop_root = os.path.abspath(args.bop_root)
    datasets = ["ycbv", "tless"] if args.dataset == "all" else [args.dataset]
    datasets = [d for d in datasets if os.path.isdir(os.path.join(bop_root, d))]
    report = Report()
    if not datasets:
        report.add(FAIL, "bop_root", f"no ycbv/ or tless/ under {bop_root}")

    for ds in datasets:
        ds_root = os.path.join(bop_root, ds)
        kp_root = args.kp_config_root
        if kp_root is None:
            cand = os.path.join(ds_root, "kp_configs")
            kp_root = cand if os.path.isdir(cand) else None
        print(f"\n== {ds} ({ds_root}) ==")
        check_layout(report, ds_root, ds)
        check_mesh_db(report, ds_root, ds)
        check_kp_info(report, ds_root, ds, kp_root)
        check_splits(report, ds_root, ds, kp_root)
        check_saved_detections(report, bop_root, ds)
    print()
    check_voc(report, bop_root)
    check_checkpoint(report, args.checkpoint)

    if report.failed:
        print(f"\n{len(report.failed)} check(s) FAILED:")
        for status, name, detail in report.failed:
            print(_fmt(status, name, detail))
        return 1
    print_commands(bop_root, datasets, args.checkpoint)
    return 0


if __name__ == "__main__":
    sys.exit(main())
