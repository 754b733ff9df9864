"""Batched single-view evaluation (`--nviews 1 --batched`).

The windowed precompute must be invisible: same executor, same scales ->
per-crop outputs bit-identical to the per-frame path; the engine consumes
them through infer_fn with PnP/BA untouched (eval/batched.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from suo_slam_tpu.models import PkpNet
from suo_slam_tpu.models import int8_forward as i8
from suo_slam_tpu.slam import kernels

TINY = dict(n_stack=1, n_modules=1, features=32, dtype=jnp.float32)


@pytest.fixture(scope="module")
def net_v():
    net = PkpNet(**TINY)
    v = jax.jit(net.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    return net, v


def _frame_data(seed, g=3, o=2, hw=(96, 128)):
    rng = np.random.default_rng(seed)
    imgs = rng.uniform(0, 1, (g,) + hw + (3,)).astype(np.float32)
    boxes = np.zeros((g, o, 4), np.float32)
    for i in range(g):
        for j in range(o):
            x1, y1 = rng.uniform(0, 40, 2)
            boxes[i, j] = (x1, y1, x1 + rng.uniform(30, 60), y1 + rng.uniform(30, 60))
    valid = np.ones((g, o), bool)
    return imgs, boxes, valid


@pytest.mark.slow  # exact match holds under PRODUCTION XLA (the slow tier's
# compiler mode): the fast tier's jax_disable_most_optimizations changes
# bf16 accumulation between batch shapes, and a single flipped int8 code on
# a random-weight (flat) heatmap visibly moves soft-argmax. Measured zero
# diff under default optimizations; up to 0.027 NDC under the degraded mode.
def test_batch_inference_matches_frame_path(net_v):
    """make_batch_inference == per-view make_frame_inference(has_prior=False)
    crop-for-crop, bf16 and int8 tiers (int8 shares one fixed scales tuple ->
    bit-identical)."""
    net, v = net_v
    imgs, boxes, valid = _frame_data(0)
    # one calibration source for both paths
    from suo_slam_tpu.ops import roi as roi_ops

    crops = np.asarray(roi_ops.roi_crop_batch(imgs, boxes, valid, (64, 64)))
    flat = jnp.asarray(crops.reshape((-1,) + crops.shape[2:]))
    ph, pw = net.prior_hw((64, 64))
    ones_prior = jnp.ones((flat.shape[0], ph, pw, 41), jnp.float32)
    scales = i8.calibrate(net, v, [flat], [ones_prior])

    for int8 in (False, True):
        bfn = kernels.make_batch_inference(
            net, v, (64, 64), int8=int8, int8_scales=scales if int8 else None
        )
        uv_b, cov_b, m_b = bfn(jnp.asarray(imgs), jnp.asarray(boxes),
                               jnp.asarray(valid))
        ffn = kernels.make_frame_inference(
            net, v, (64, 64), int8=int8,
            int8_scales=scales if int8 else None,
        )
        for i in range(imgs.shape[0]):
            uv_f, cov_f, m_f = ffn(
                jnp.asarray(imgs[i]), jnp.asarray(boxes[i]),
                jnp.asarray(valid[i]),
                jnp.zeros((boxes.shape[1], 41, 2), jnp.float32),
                jnp.zeros((boxes.shape[1], 41), bool),
                has_prior=False,
            )
            np.testing.assert_allclose(
                np.asarray(uv_b)[i], np.asarray(uv_f), atol=1e-5,
                err_msg=f"int8={int8} view {i} uv",
            )
            np.testing.assert_allclose(
                np.asarray(m_b)[i], np.asarray(m_f), atol=1e-5
            )
            if cov_b is not None:
                np.testing.assert_allclose(
                    np.asarray(cov_b)[i], np.asarray(cov_f), atol=1e-5
                )


def test_runner_window_and_guard(net_v):
    """BatchedSingleViewRunner: windowed precompute over a plan with a
    detection-less view, engine-bucket padding, and the boxes guard."""
    from suo_slam_tpu.eval.batched import BatchedSingleViewRunner

    net, v = net_v
    imgs, boxes, valid = _frame_data(1, g=5, o=2)
    samples = {
        i: {"img": imgs[i], "K": np.eye(3, dtype=np.float32)} for i in range(5)
    }

    def load_inputs(scene_id, view_id):
        if view_id == 2:
            return None  # no detections
        return (
            np.arange(1, 3, dtype=np.int64),
            boxes[view_id].copy(),
            samples[view_id],
        )

    calls = []
    fn = kernels.make_batch_inference(net, v, (64, 64), int8=False)

    def counting_fn(im, bx, vd):
        calls.append(int(np.asarray(vd).sum()))
        return fn(im, bx, vd)

    r = BatchedSingleViewRunner(counting_fn, load_inputs, window=3,
                                obj_slots=2)
    r.set_plan(7, [0, 1, 2, 3, 4])
    ent0 = r.get(7, 0)
    assert ent0 is not None and ent0["out"][0].shape == (2, 41, 2)
    assert len(calls) == 1  # views 0,1 (2 is None) precomputed in one call
    assert r.get(7, 1) is not None
    assert r.get(7, 2) is None
    ent3 = r.get(7, 3)  # second window
    assert len(calls) == 2 and ent3 is not None
    # infer_fn pads to the engine's bucket (4 slots here)
    eng_boxes = np.zeros((4, 4), np.float32)
    eng_boxes[:2] = ent3["boxes_infl"]
    uv, cov, m = r.infer_fn(None, eng_boxes, None, None, None)
    assert uv.shape == (4, 41, 2) and m.shape == (4, 41)
    assert (uv[2:] == 0).all()
    # boxes mismatch -> loud failure, not silent wrong-view results
    with pytest.raises(AssertionError):
        r.infer_fn(None, eng_boxes + 5.0, None, None, None)
