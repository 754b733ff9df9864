"""Tests for the labeling core, viz drawing, and tool CLIs (offscreen)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.helpers.synthetic_bop import (
    CUBOID_TRIS,
    OBJ_HALF_EXTENTS,
    cuboid_corners,
    write_synthetic_bop,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
K = np.array([[420.0, 0, 160.0], [0, 420.0, 120.0], [0, 0, 1.0]])


@pytest.fixture(scope="module")
def bop_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("tools_bop")
    return write_synthetic_bop(str(root), n_scenes=1, n_views=2)


def test_labeler_backproject_roundtrip():
    from suo_slam_tpu.tools.labeling import KeypointLabeler

    he = OBJ_HALF_EXTENTS[1]
    verts = cuboid_corners(*he)
    lab = KeypointLabeler(verts, CUBOID_TRIS, K, diameter=2 * np.linalg.norm(he))
    # project a known surface point (front-face center of view 0) and
    # back-project the same pixel: must land on the surface nearby
    T = lab.view_poses[0]
    p_obj = np.array([0.0, 0.0, 0.0])  # center: backproject hits front surface
    # find any rendered pixel
    d = lab.depths[0]
    ys, xs = np.nonzero(d > 0)
    pick = len(xs) // 2
    p = lab.backproject(0, xs[pick], ys[pick])
    assert p is not None
    # point must lie on the cuboid surface (one coord at +-half extent)
    at_surface = [abs(abs(p[i]) - he[i]) < 1.0 for i in range(3)]
    assert any(at_surface), p
    # off-object click returns None
    assert lab.backproject(0, 0, 0) is None


def test_labeler_stats_and_save(tmp_path):
    from suo_slam_tpu.tools.labeling import KeypointLabeler, load_kp_info

    he = OBJ_HALF_EXTENTS[1]
    verts = cuboid_corners(*he)
    lab = KeypointLabeler(verts, CUBOID_TRIS, K, diameter=2 * np.linalg.norm(he))
    d = lab.depths[0]
    ys, xs = np.nonzero(d > 0)
    # click 4 nearby pixels as samples of one keypoint
    name = "box_corner_front_tl"
    mid = len(xs) // 2
    for off in range(4):
        assert lab.add_sample(name, 0, xs[mid + off], ys[mid + off])
    stats = lab.kp_stats(min_samples=3)
    assert name in stats
    mean, cov = stats[name]
    assert cov.shape == (3, 3) and np.all(np.linalg.eigvalsh(cov) > -1e-9)
    path = tmp_path / "kp_info" / "obj_000001_kp_info.json"
    lab.save(str(path))
    kps, vp = load_kp_info(str(path))
    np.testing.assert_allclose(kps[name][0], mean)
    assert vp.shape == (4, 4)


def test_viz_make_frame(tmp_path):
    from suo_slam_tpu.eval.viz import make_frame_viz

    img = np.random.default_rng(0).uniform(0, 1, (120, 160, 3)).astype(np.float32)
    nk = 41
    dets = {
        1: {
            "bbox": np.array([20.0, 20.0, 100.0, 100.0]),
            "uv": np.zeros((nk, 2), np.float32),
            "cov": np.tile(np.eye(2, dtype=np.float32) * 1e-3, (nk, 1, 1)),
            "kp_mask": np.zeros(nk, bool) | (np.arange(nk) < 8),
        }
    }
    poses = {1: None}
    viz = make_frame_viz(img, dets, poses, K)
    assert viz.shape == (120, 320, 3) and viz.dtype == np.uint8


def test_viz_make_extra():
    """`make_extra_viz` parity surface (`lib/object_slam.py:277-308`):
    full-frame bbox panel + per-object input/output/overlay crops; prior
    blend visibly changes the input panel; overlay present only for posed
    objects; cov ellipses only under viz_cov."""
    from suo_slam_tpu.eval.viz import make_extra_viz

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 0.3, (120, 160, 3)).astype(np.float32)
    nk = 41
    prior_uv = np.zeros((nk, 2), np.float32)
    mm = np.arange(nk) < 8
    dets = {
        1: {
            "bbox": np.array([20.0, 20.0, 100.0, 100.0]),
            "uv": np.zeros((nk, 2), np.float32),
            "cov": np.tile(np.eye(2, dtype=np.float32) * 0.05, (nk, 1, 1)),
            "kp_mask": mm.copy(),
            "prior_uv": prior_uv,
            "model_mask": mm.copy(),
        },
        2: {  # no prior, no pose
            "bbox": np.array([0.0, 0.0, 40.0, 40.0]),
            "uv": np.zeros((nk, 2), np.float32),
            "cov": None,
            "kp_mask": mm.copy(),
        },
    }

    class _Mesh:
        points = {1: rng.uniform(-0.05, 0.05, (200, 3)).astype(np.float32)}

    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 0.5
    out = make_extra_viz(img, dets, {1: T, 2: None}, K, mesh_db=_Mesh(),
                         viz_cov=True)
    assert set(out) == {
        "bbox_input", "viz_obj_1_input", "viz_obj_1_output",
        "viz_obj_1_overlay", "viz_obj_2_input", "viz_obj_2_output",
    }
    assert out["bbox_input"].shape == (120, 160, 3)
    assert out["viz_obj_1_input"].shape == (80, 80, 3)
    # the prior blend must actually touch the crop (object 1 has a prior
    # Gaussian at the bbox center; object 2 has none, so its input is raw)
    raw1 = (255 * np.clip(img[20:100, 20:100], 0, 1)).astype(np.uint8)
    raw2 = (255 * np.clip(img[0:40, 0:40], 0, 1)).astype(np.uint8)
    assert not np.array_equal(out["viz_obj_1_input"], raw1)
    assert np.array_equal(out["viz_obj_2_input"], raw2)
    # viz_cov=False must draw no ellipses -> strictly fewer changed pixels
    out_nocov = make_extra_viz(img, dets, {1: T, 2: None}, K,
                               mesh_db=_Mesh(), viz_cov=False)
    d_cov = (out["viz_obj_1_output"] != raw1).any(-1).sum()
    d_nocov = (out_nocov["viz_obj_1_output"] != raw1).any(-1).sum()
    assert d_nocov < d_cov


def _run(cmd, cwd):
    env = os.environ.copy()
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    res = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True, text=True,
                         timeout=600)
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    return res


def test_manual_keypoints_viz_cli(bop_root, tmp_path):
    out = tmp_path / "labels_viz"
    _run(
        [sys.executable, os.path.join(REPO, "manual_keypoints.py"),
         "--dataset", "ycbv", "--viz", "--data_root", bop_root,
         "--kp_config_root", os.path.join(bop_root, "kp_configs"),
         "--out", str(out)],
        cwd=str(tmp_path),
    )
    assert (out / "obj_000001.png").exists()


@pytest.mark.slow  # subprocess e2e (fresh jax import per run)
def test_view_sym_choice_cli(bop_root, tmp_path):
    out = tmp_path / "sym.png"
    res = _run(
        [sys.executable, os.path.join(REPO, "view_sym_choice.py"),
         "--dataset", "ycbv", "--split", "test", "--scene_id", "0",
         "--view_id", "0", "--obj_id", "3", "--data_root", bop_root,
         "--kp_config_root", os.path.join(bop_root, "kp_configs"),
         "--out", str(out)],
        cwd=str(tmp_path),
    )
    assert out.exists()
    assert "Best symmetry index" in res.stdout


@pytest.mark.slow
def test_plot_cov_cli(bop_root, tmp_path):
    # train a 1-step tiny checkpoint first
    env = {"SUO_TINY_NET": "1"}
    cmd = [sys.executable, os.path.join(REPO, "train.py"),
           "--dataset", "ycbv", "--data_root", bop_root,
           "--kp_config_root", os.path.join(bop_root, "kp_configs"),
           "--data_split", "synt", "--batch_size", "1", "--truncate_obj", "3",
           "--epochs", "1", "--steps_per_epoch", "1", "--no_bf16"]
    e = os.environ.copy()
    e.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO, "SUO_TINY_NET": "1"})
    res = subprocess.run(cmd, cwd=str(tmp_path), env=e, capture_output=True,
                         text=True, timeout=600)
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    ckpt = list(tmp_path.rglob("checkpoint-latest"))[0]
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "plot_cov.py"),
         "-c", str(ckpt), "--dataset", "ycbv", "--split", "train_synt",
         "--data_root", bop_root,
         "--kp_config_root", os.path.join(bop_root, "kp_configs"),
         "--max_frames", "2", "--out", str(tmp_path)],
        cwd=str(tmp_path), env=e, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    assert (tmp_path / "percent_sigma_inbounds.txt").exists()
    assert (tmp_path / "sigma_plot.png").exists()


def test_render_shaded_matches_depth_and_shades_faces():
    import numpy as np

    from helpers.synthetic_bop import cuboid_corners, CUBOID_TRIS
    from suo_slam_tpu.eval.render import render_depth, render_shaded

    verts = np.asarray(cuboid_corners(40.0, 30.0, 25.0), np.float64)
    K = np.array([[200.0, 0, 80.0], [0, 200.0, 60.0], [0, 0, 1.0]])
    T = np.eye(4)
    T[:3, :3] = np.array([[0.9363, -0.2751, 0.2184],
                          [0.2896, 0.9564, -0.0370],
                          [-0.1987, 0.0978, 0.9752]])
    T[:3, 3] = [0, 0, 400.0]
    hw = (120, 160)
    rgb, depth = render_shaded(verts, CUBOID_TRIS, K, T, hw)
    depth_ref = render_depth(verts, CUBOID_TRIS, K, T, hw)
    np.testing.assert_allclose(depth, depth_ref, atol=1e-4)
    hit = depth > 0
    assert hit.sum() > 500
    # background black, surface lit within [ambient*color, color]
    assert rgb[~hit].max() == 0
    vals = rgb[hit][:, 0].astype(float)
    assert vals.min() >= 0.3 * 200 and vals.max() <= 255
    # a rotated cuboid shows >= 2 visible faces with distinct shading
    assert len(np.unique(rgb[hit][:, 0])) >= 2


def test_enable_jit_cache(tmp_path, monkeypatch):
    """CLI jit-cache helper: env dir honored, '0' disables, dir created."""
    import jax

    from suo_slam_tpu.utils.jit_cache import enable_jit_cache

    old = jax.config.jax_compilation_cache_dir
    try:
        d = str(tmp_path / "jitcache")
        monkeypatch.setenv("SUO_JIT_CACHE", d)
        assert enable_jit_cache() == d
        import os

        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
        monkeypatch.setenv("SUO_JIT_CACHE", "0")
        assert enable_jit_cache() is None
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


# ---- inspection pane: covariance propagation + view-pose adjustment -------


def test_propagate_cov_2d_matches_finite_diff_and_montecarlo():
    """The first-order image-space covariance must match (a) the
    finite-difference Jacobian of the projection and (b) a Monte-Carlo
    estimate from sampling the 3D covariance. Also pins the DOCUMENTED
    deviation from the reference formula (`manual_keypoints.py:263-265`
    repeats 1/z in the second row instead of [0, 1/z, ...]) — the reference
    expression gives a measurably different (wrong) ellipse."""
    from suo_slam_tpu.data.bop import _euler2R_np
    from suo_slam_tpu.tools.labeling import propagate_cov_2d

    rng = np.random.default_rng(0)
    T = np.eye(4)
    T[:3, :3] = _euler2R_np([20.0, -35.0, 50.0])
    T[:3, 3] = [12.0, -7.0, 300.0]
    mean = np.array([8.0, -5.0, 11.0])
    A = rng.normal(size=(3, 3))
    cov3 = A @ A.T * 0.5

    uv, cov2, z = propagate_cov_2d(K, T, mean, cov3)
    assert z > 0

    def project(p):
        q = K @ (T[:3, :3] @ p + T[:3, 3])
        return q[:2] / q[2]

    np.testing.assert_allclose(uv, project(mean), rtol=1e-12)

    # (a) finite-difference Jacobian propagation
    eps = 1e-5
    J = np.stack([
        (project(mean + eps * np.eye(3)[i]) - project(mean - eps * np.eye(3)[i]))
        / (2 * eps)
        for i in range(3)
    ], axis=1)
    np.testing.assert_allclose(cov2, J @ cov3 @ J.T, rtol=1e-5)

    # (b) Monte-Carlo
    pts = rng.multivariate_normal(mean, cov3, size=200000)
    uvs = np.stack([project(p) for p in pts])
    mc = np.cov(uvs.T)
    np.testing.assert_allclose(cov2, mc, rtol=0.08, atol=1e-6)

    # (c) the reference's typo'd Jacobian differs (documented deviation)
    R, t = T[:3, :3], T[:3, 3]
    uvz = K @ (R @ mean + t)
    x, y, zz = uvz
    duv_ref = np.array([[1 / zz, 0, -x / zz**2], [1 / zz, 0, -y / zz**2]])
    S_ref = duv_ref @ K @ R
    cov_ref = S_ref @ cov3 @ S_ref.T
    assert not np.allclose(cov_ref, cov2, rtol=0.05)


def test_cov_ellipse_closed_form():
    from suo_slam_tpu.tools.labeling import cov_ellipse

    cov = np.diag([4.0, 1.0])
    (ax0, ax1), ang = cov_ellipse(cov)
    # eig of a diagonal matrix keeps order: lambda = (4, 1)
    np.testing.assert_allclose(ax0, 2 * np.sqrt(5.991 * 4.0))
    np.testing.assert_allclose(ax1, 2 * np.sqrt(5.991 * 1.0))
    assert ang % 180 == 0.0
    # rotated cov: angle tracks the principal eigenvector
    th = np.deg2rad(30)
    Rm = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    (bx0, bx1), bang = cov_ellipse(Rm @ cov @ Rm.T)
    np.testing.assert_allclose(sorted([bx0, bx1]), sorted([ax0, ax1]),
                               rtol=1e-9)
    assert min(abs(bang - 30), abs(bang + 150), abs(bang - 210)) < 1e-6


def test_adjust_view_pose_key_contract():
    """w/a/s/d/i/o semantics of the reference inspection loop
    (`manual_keypoints.py:307-326`)."""
    from suo_slam_tpu.data.bop import _euler2R_np
    from suo_slam_tpu.tools.labeling import adjust_view_pose

    T0 = np.eye(4)
    T0[:3, :3] = _euler2R_np([10.0, 20.0, 30.0])
    T0[2, 3] = 100.0
    for key, euler in (("w", [-2, 0, 0]), ("s", [2, 0, 0]),
                       ("a", [0, 2, 0]), ("d", [0, -2, 0])):
        T = adjust_view_pose(T0, key)
        np.testing.assert_allclose(T[:3, :3], _euler2R_np(euler) @ T0[:3, :3])
        np.testing.assert_allclose(T[:3, 3], T0[:3, 3])
    np.testing.assert_allclose(adjust_view_pose(T0, "i")[2, 3], 98.0)
    np.testing.assert_allclose(adjust_view_pose(T0, "o")[2, 3], 102.0)
    # unknown key: unchanged; input never mutated
    np.testing.assert_array_equal(adjust_view_pose(T0, "x"), T0)
    np.testing.assert_allclose(T0[2, 3], 100.0)


def test_inspection_render_and_user_view_pose_saved(tmp_path):
    """End-to-end inspection-pane flow: label a keypoint, adjust the view
    pose, render the pane (ellipse drawn), save — the kp_info must carry the
    USER-ADJUSTED pose, not view_poses[0] (it canonicalizes symmetric GT at
    train time, `lib/datasets/bop.py:358-385`)."""
    from suo_slam_tpu.tools.labeling import (
        KeypointLabeler,
        adjust_view_pose,
        load_kp_info,
    )

    he = OBJ_HALF_EXTENTS[1]
    verts = cuboid_corners(*he)
    lab = KeypointLabeler(verts, CUBOID_TRIS, K, diameter=2 * np.linalg.norm(he))
    d = lab.depths[0]
    ys, xs = np.nonzero(d > 0)
    name = "box_corner_front_tl"
    for dx in range(4):
        assert lab.add_sample(name, 0, xs[len(xs) // 2] + dx, ys[len(ys) // 2])

    # not-enough-samples on a second kp blocks acceptance (ok=False)
    lab.samples.setdefault("box_corner_front_tr", []).append(np.zeros(3))
    img, ok = lab.render_inspection()
    assert not ok
    lab.samples.pop("box_corner_front_tr")

    img, ok = lab.render_inspection()
    assert ok
    h, w = lab.hw
    assert img.shape == (h, 2 * w, 3)
    # the scaled (right) pane differs from the unscaled (left): the ellipse
    # was actually drawn
    assert not np.array_equal(img[:, :w], img[:, w:])

    for key in "wwaai":
        lab.view_pose = adjust_view_pose(lab.view_pose, key)
    assert not np.allclose(lab.view_pose, lab.view_poses[0])

    path = os.path.join(tmp_path, "kp_info", "obj_000001_kp_info.json")
    lab.save(path)
    _, vp = load_kp_info(path)
    np.testing.assert_allclose(vp, lab.view_pose)
    assert not np.allclose(vp, lab.view_poses[0])
