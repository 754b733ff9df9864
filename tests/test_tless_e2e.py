"""T-LESS-style end-to-end: targets-json indexing, test_primesense split,
single-view eval with GT keypoints, and the VSD scoring path."""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

from tests.helpers.synthetic_bop import write_synthetic_bop

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tless_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("tless") / "bop_datasets" / "tless"
    write_synthetic_bop(str(root), n_scenes=1, n_views=3, bop_dset="tless")
    return str(root)


def test_tless_indexing_with_targets(tless_root):
    from suo_slam_tpu.data.bop import BopDataset

    ds = BopDataset(tless_root, "test_primesense", bop_dset="tless",
                    kp_config_root=os.path.join(tless_root, "kp_configs"))
    assert ds.targets is not None
    assert len(ds) == 3
    assert ds.is_target(0, 0, 1)
    assert not ds.is_target(0, 99, 1)
    # tless applies min_visib 0.1 on test too
    assert len(ds.obj_ids(0, 0)) == 3


@pytest.mark.slow
def test_tless_single_view_eval_with_vsd(tless_root, tmp_path):
    env = os.environ.copy()
    env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO})
    cmd = [sys.executable, os.path.join(REPO, "evaluate.py"),
           "--nviews", "1", "--debug_gt_kp", "--dataset", "tless",
           "--data_root", tless_root,
           "--kp_config_root", os.path.join(tless_root, "kp_configs"),
           "--checkpoint_path", "", "--no_viz"]
    res = subprocess.run(cmd, cwd=str(tmp_path), env=env, capture_output=True,
                         text=True, timeout=900)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    m = re.search(r"Mean object recall: ([\d.]+)%", res.stdout)
    assert m, res.stdout[-3000:]
    # GT keypoints with small noise should give high VSD recall
    assert float(m.group(1)) > 80.0, res.stdout[-2000:]
    assert list(tmp_path.rglob("vsd_summary.txt"))


@pytest.mark.slow
def test_sfm_mode_nviews_3(tmp_path):
    """SfM mode (`--nviews 3`): per-frame multi-view problems on ycbv."""
    ds_root = tmp_path / "ycbv"
    write_synthetic_bop(str(ds_root), n_scenes=1, n_views=4)
    os.symlink(ds_root / "models_bop-compat", ds_root / "models_bop-compat_eval",
               target_is_directory=True)
    env = os.environ.copy()
    env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO})
    cmd = [sys.executable, os.path.join(REPO, "evaluate.py"),
           "--nviews", "3", "--debug_gt_kp", "--dataset", "ycbv",
           "--data_root", str(ds_root),
           "--kp_config_root", os.path.join(str(ds_root), "kp_configs"),
           "--checkpoint_path", "", "--no_viz"]
    res = subprocess.run(cmd, cwd=str(tmp_path), env=env, capture_output=True,
                         text=True, timeout=900)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    m = re.search(r"AUC of ADD\(-S\): ([\d.]+)", res.stdout)
    assert m and float(m.group(1)) > 80.0, res.stdout[-2000:]
