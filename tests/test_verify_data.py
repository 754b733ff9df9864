"""scripts/verify_data.py — the eval-day step-0 data rehearsal (VERDICT r4 #3).

Runs the verifier against the synthetic fixture laid out in the REAL
directory shape (bop_datasets/{ycbv,tless} + saved_detections + offsets.txt
+ VOCdevkit), in-process, and pins PASS on a good tree / non-zero + named
FAIL rows on a broken one.
"""

import importlib.util
import json
import os
import pickle
import shutil

import numpy as np
import pytest

from tests.helpers.synthetic_bop import write_synthetic_bop

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_verifier():
    spec = importlib.util.spec_from_file_location(
        "verify_data", os.path.join(REPO, "scripts", "verify_data.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _quat_wxyz(R):
    w = np.sqrt(max(0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    return np.array(
        [w, (R[2, 1] - R[1, 2]) / (4 * w), (R[0, 2] - R[2, 0]) / (4 * w),
         (R[1, 0] - R[0, 1]) / (4 * w)]
    )


@pytest.fixture(scope="module")
def real_shape_root(tmp_path_factory):
    """Synthetic ycbv + tless in the real on-disk shape from REAL_DATA.md."""
    root = tmp_path_factory.mktemp("verify") / "bop_datasets"
    ycbv = root / "ycbv"
    write_synthetic_bop(str(ycbv), n_scenes=1, n_views=2)
    os.symlink(ycbv / "models_bop-compat", ycbv / "models_bop-compat_eval",
               target_is_directory=True)
    write_synthetic_bop(str(root / "tless"), n_scenes=1, n_views=2,
                        bop_dset="tless")

    # offsets.txt + PoseCNN pkl from GT poses (the saved-detections contract)
    with open(ycbv / "offsets.txt", "w") as f:
        for obj_id in (1, 2, 3):
            f.write(f"{obj_id:02d} [0.0, 0.0, 0.0]\n")
    from suo_slam_tpu.data.bop import BopDataset

    ds = BopDataset(str(ycbv), "test",
                    kp_config_root=str(ycbv / "kp_configs"), seed=0)
    results = {}
    for s in ds.scene_ids():
        for v in ds.view_ids(s):
            rois, poses = [], []
            for o in ds.obj_ids(s, v):
                T = ds.get_obj_pose(s, v, o)
                x, y, w, h = ds.data[s][v].objects[o].bbox_xywh
                rois.append([0, o, x, y, x + w, y + h])
                poses.append(np.concatenate(
                    [_quat_wxyz(T[:3, :3]), T[:3, 3] / 1000.0]))
            results[f"{s:06d}/{v:06d}"] = {
                "rois": np.asarray(rois, np.float64),
                "poses": np.asarray(poses, np.float64),
            }
    os.makedirs(root / "saved_detections")
    with open(root / "saved_detections" / "ycbv_posecnn.pkl", "wb") as f:
        pickle.dump(results, f)

    # one VOC background
    voc = root / "VOCdevkit" / "VOC2012" / "JPEGImages"
    os.makedirs(voc)
    import cv2

    cv2.imwrite(str(voc / "bg0.jpg"),
                np.full((32, 32, 3), 128, np.uint8))
    return str(root)


def test_verify_data_passes_on_good_tree(real_shape_root, capsys):
    mod = _load_verifier()
    rc = mod.main(["--bop_root", real_shape_root])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "FAIL" not in out, out
    # every declared check surface ran or consciously skipped
    for item in ["mesh database", "kp_info schema", "get_raw",
                 "PoseCNN detections", "VOC backgrounds", "checkpoint load"]:
        assert item in out, (item, out)
    # and it prints the eval-day commands
    assert "eval_all_ycbv.sh" in out and "--pipeline_scenes" in out, out


def test_verify_data_fails_on_broken_kp_info(real_shape_root, tmp_path, capsys):
    broken = tmp_path / "bop_datasets"
    shutil.copytree(real_shape_root, broken, symlinks=True)
    kp = broken / "ycbv" / "kp_info" / "obj_000001_kp_info.json"
    info = json.loads(kp.read_text())
    first = next(iter(info["keypoints"]))
    info["keypoints"][first]["pos_mean"] = [0.0]  # schema violation
    kp.write_text(json.dumps(info))
    mod = _load_verifier()
    rc = mod.main(["--bop_root", str(broken)])
    out = capsys.readouterr().out
    assert rc != 0
    assert "kp_info schema" in out and "FAIL" in out, out


def test_verify_data_fails_on_missing_dataset_dirs(tmp_path, capsys):
    mod = _load_verifier()
    rc = mod.main(["--bop_root", str(tmp_path)])
    assert rc != 0
    assert "bop_root" in capsys.readouterr().out
