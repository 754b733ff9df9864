"""Network-path SLAM smoke test: the full engine with a (random-weight) tiny
PkpNet — exercises frame inference, keypoint filtering, prior rendering and
the failure-tolerant branches that debug_gt_kp skips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from suo_slam_tpu.models import PkpNet
from suo_slam_tpu.slam import ObjectSlam, SlamConfig
from tests.test_slam_engine import StubMeshDb, make_scene, project_frame


@pytest.mark.slow
def test_engine_with_random_network_runs_and_degrades_gracefully():
    net = PkpNet(n_stack=1, n_modules=1, features=16)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    cfg = SlamConfig(
        input_hw=(64, 64), view_capacity=8, obj_capacity=8,
        manual_kp_std=0.01, mask_thresh=-1.0,  # accept all channels
    )
    mesh = StubMeshDb(8, symmetric=(2,))
    engine = ObjectSlam(cfg, mesh_db=mesh, net=net, params=variables)
    K, hw, kp, T_obj, cams = make_scene(n_obj=3, n_views=3, seed=1)
    img = np.random.default_rng(0).uniform(0, 1, (240, 320, 3)).astype(np.float32)
    for i, T in enumerate(cams):
        obj_ids, bboxes, mks, mms, kms, uvs = project_frame(K, hw, kp, T_obj, T)
        engine.process_view(i, img, K, obj_ids, bboxes, mks, mms, kms)
    # random keypoints rarely give valid PnP -> engine must survive with
    # backup camera poses and produce results for every view
    res = engine.collect_results(final=True)
    assert len(res) == 3
    for view in res.values():
        assert "poses" in view
    # symmetric object went through the prior-feedback path without crashing
    assert engine.all_time_num_views == 3


@pytest.mark.slow
def test_engine_symmetric_prior_feedback_path():
    """Force the prior path: give_all_prior + an object with a map pose."""
    net = PkpNet(n_stack=1, n_modules=1, features=16)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    cfg = SlamConfig(
        input_hw=(64, 64), view_capacity=8, obj_capacity=8, give_all_prior=True,
    )
    engine = ObjectSlam(cfg, mesh_db=StubMeshDb(8), net=net, params=variables)
    K, hw, kp, T_obj, cams = make_scene(n_obj=2, n_views=2, seed=2)
    img = np.zeros((240, 320, 3), np.float32)
    for i, T in enumerate(cams):
        obj_ids, bboxes, mks, mms, kms, uvs = project_frame(K, hw, kp, T_obj, T)
        # provide GT camera pose so priors project from the map
        engine.process_view(i, img, K, obj_ids, bboxes, mks, mms, kms, cam_pose=T)
    assert engine.num_views_processed() == 2


@pytest.mark.slow
def test_engine_int8_inference_path():
    """SlamConfig.int8_inference: first-frame calibration + int8-resident
    network inside the engine (needs norm='batch' post_stem nets)."""
    net = PkpNet(n_stack=1, n_modules=1, features=16, norm="batch")
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    cfg = SlamConfig(
        input_hw=(64, 64), view_capacity=8, obj_capacity=8,
        manual_kp_std=0.01, mask_thresh=-1.0, int8_inference=True,
    )
    engine = ObjectSlam(cfg, mesh_db=StubMeshDb(8), net=net, params=variables)
    K, hw, kp, T_obj, cams = make_scene(n_obj=2, n_views=2, seed=3)
    img = np.random.default_rng(1).uniform(0, 1, (240, 320, 3)).astype(np.float32)
    for i, T in enumerate(cams):
        obj_ids, bboxes, mks, mms, kms, uvs = project_frame(K, hw, kp, T_obj, T)
        engine.process_view(i, img, K, obj_ids, bboxes, mks, mms, kms)
    res = engine.collect_results(final=True)
    assert len(res) == 2
