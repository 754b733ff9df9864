"""Saved-detection loaders + --debug_saved_only e2e on synthetic pickles."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from tests.helpers.synthetic_bop import write_synthetic_bop

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _quat_wxyz(R):
    # w,x,y,z from rotation matrix (for fixture writing)
    w = np.sqrt(max(0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return np.array([w, x, y, z])


@pytest.fixture(scope="module")
def bop_layout(tmp_path_factory):
    """BOP root with dataset + saved PoseCNN-style detections + offsets."""
    root = tmp_path_factory.mktemp("sdet")
    ds_root = root / "bop_datasets" / "ycbv"
    write_synthetic_bop(str(ds_root), n_scenes=1, n_views=3)
    os.symlink(ds_root / "models_bop-compat", ds_root / "models_bop-compat_eval",
               target_is_directory=True)
    bop_root = root / "bop_datasets"

    # offsets.txt: zero offsets for the 3 objects (2-digit ids + json vector)
    os.makedirs(bop_root / "ycbv", exist_ok=True)
    with open(bop_root / "ycbv" / "offsets.txt", "w") as f:
        for obj_id in (1, 2, 3):
            f.write(f"{obj_id:02d} [0.0, 0.0, 0.0]\n")

    # PoseCNN-format pkl from GT poses (mm -> m, wxyz quat + t)
    from suo_slam_tpu.data.bop import BopDataset

    ds = BopDataset(str(ds_root), "test",
                    kp_config_root=os.path.join(str(ds_root), "kp_configs"))
    results = {}
    for s in ds.scene_ids():
        for v in ds.view_ids(s):
            rois, poses = [], []
            for o in ds.obj_ids(s, v):
                T = ds.get_obj_pose(s, v, o)
                bbox = ds.data[s][v].objects[o].bbox_xywh
                x, y, w, h = bbox
                rois.append([0, o, x, y, x + w, y + h])
                q = _quat_wxyz(T[:3, :3])
                poses.append(np.concatenate([q, T[:3, 3] / 1000.0]))
            results[f"{s:06d}/{v:06d}"] = {
                "rois": np.asarray(rois, np.float64),
                "poses": np.asarray(poses, np.float64),
            }
    os.makedirs(bop_root / "ycbv" / ".." / "saved_detections", exist_ok=True)
    with open(bop_root / "saved_detections" / "ycbv_posecnn.pkl", "wb") as f:
        pickle.dump(results, f)
    return str(ds_root)


def test_load_posecnn_results(bop_layout):
    from suo_slam_tpu.eval.detections import build_detection_map, load_posecnn_results

    bop_root = os.path.realpath(os.path.join(bop_layout, ".."))
    data = load_posecnn_results(bop_root)
    assert len(data["poses"]) == 9  # 3 views x 3 objects
    dmap = build_detection_map(data)
    assert set(dmap[0][0].keys()) == {1, 2, 3}
    # poses round-trip: quaternion->R->mm translation equals GT within noise
    from suo_slam_tpu.data.bop import BopDataset

    ds = BopDataset(bop_layout, "test",
                    kp_config_root=os.path.join(bop_layout, "kp_configs"))
    i = dmap[0][0][1]
    T = data["poses"][i]
    T_gt = ds.get_obj_pose(0, 0, 1)
    np.testing.assert_allclose(T[:3, 3], T_gt[:3, 3], atol=1e-3)
    np.testing.assert_allclose(T[:3, :3], T_gt[:3, :3], atol=1e-6)


@pytest.mark.slow  # subprocess e2e (fresh jax import + compile per run)
def test_debug_saved_only_cli(bop_layout, tmp_path):
    """--debug_saved_only scores the saved detections: GT-equal poses must
    give near-perfect AUC (the reference's metric-code golden check,
    `evaluate.py:139-143`)."""
    env = os.environ.copy()
    env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO})
    cmd = [sys.executable, os.path.join(REPO, "evaluate.py"),
           "--debug_saved_only", "--detection_type", "saved",
           "--dataset", "ycbv", "--data_root", bop_layout,
           "--kp_config_root", os.path.join(bop_layout, "kp_configs"),
           "--checkpoint_path", ""]
    res = subprocess.run(cmd, cwd=str(tmp_path), env=env, capture_output=True,
                         text=True, timeout=600)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    assert "Saved detections result" in res.stdout


@pytest.mark.slow
def test_evaluate_with_saved_detections(bop_layout, tmp_path):
    """Full eval pipeline driven by saved detections + GT keypoints."""
    env = os.environ.copy()
    env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO})
    cmd = [sys.executable, os.path.join(REPO, "evaluate.py"),
           "--nviews", "1", "--debug_gt_kp", "--detection_type", "saved",
           "--dataset", "ycbv", "--data_root", bop_layout,
           "--kp_config_root", os.path.join(bop_layout, "kp_configs"),
           "--checkpoint_path", "", "--no_viz"]
    # debug_gt_kp forces detection_type=gt in main(); call Evaluator directly
    code = f"""
import sys, numpy as np
sys.path.insert(0, {REPO!r})
sys.argv = ['evaluate.py']
np.random.seed(666)
from evaluate import Evaluator
s = Evaluator('ycbv', {bop_layout!r}, '', nviews=1, detection_type='saved',
              debug_gt_kp=True, no_viz=True,
              kp_config_root={os.path.join(bop_layout, 'kp_configs')!r}).run()
assert s is not None and 'ours' in s, s
print('ADD-S AUC:', s['ours']['AUC of ADD-S'])
assert s['ours']['AUC of ADD-S'] > 0.8, s
print('SAVED-DET EVAL OK')
"""
    res = subprocess.run([sys.executable, "-c", code], cwd=str(tmp_path), env=env,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    assert "SAVED-DET EVAL OK" in res.stdout


@pytest.mark.slow
def test_saved_detections_pipelined_matches_sequential(bop_layout, tmp_path):
    """Full-SLAM over saved detections: the pipelined sweep must reproduce
    the sequential sweep's saved-det meter AND ours meter exactly — the
    saved-det update is gated on non-empty collect_results in the
    sequential loop, and the pipelined path must respect the same gate
    (the parity bug class fixed in the round-4 review)."""
    code = f"""
import importlib.util, os, sys, numpy as np
sys.path.insert(0, {REPO!r})
sys.argv = ['evaluate.py']
np.random.seed(666)
spec = importlib.util.spec_from_file_location(
    'suo_evaluate_cli', os.path.join({REPO!r}, 'evaluate.py'))
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

def run(pipeline):
    ev = mod.Evaluator('ycbv', {bop_layout!r}, '', nviews=-1,
                       detection_type='saved', debug_gt_kp=True, no_viz=True,
                       kp_config_root={os.path.join(bop_layout, 'kp_configs')!r},
                       pipeline_scenes=pipeline)
    s = ev.run()
    assert s is not None and 'ours' in s and 'saved_det' in s, s
    return s

s_seq = run(0)
s_pipe = run(2)
assert s_pipe['ours'] == s_seq['ours'], (s_pipe['ours'], s_seq['ours'])
assert s_pipe['saved_det'] == s_seq['saved_det'], (
    s_pipe['saved_det'], s_seq['saved_det'])
assert s_pipe['cam_pose_pct'] == s_seq['cam_pose_pct']
print('PIPELINED SAVED-DET PARITY OK')
"""
    env = os.environ.copy()
    env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO})
    res = subprocess.run([sys.executable, "-c", code], cwd=str(tmp_path),
                         env=env, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    assert "PIPELINED SAVED-DET PARITY OK" in res.stdout
