"""int8-resident executor tests: traversal exactness, quantized accuracy,
calibration structure, and prior-path equivalence.

Compile budget matters here (single-CPU XLA compiles dominate the fast
tier): everything heavy is shared through the module-scope fixture — one
jitted init/apply pair, ONE calibration (same batch split everywhere), one
jitted int8 apply reused by every test — and structure-only checks run at
trace time via `jax.eval_shape` instead of compiling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from suo_slam_tpu.models import PkpNet
from suo_slam_tpu.models import int8_forward as i8

TINY = dict(n_stack=2, n_modules=1, features=32, dtype=jnp.float32)


@pytest.fixture(scope="module")
def setup():
    net = PkpNet(**TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 64, 64, 3))
    ph, pw = net.prior_hw((64, 64))
    prior = jax.random.uniform(jax.random.PRNGKey(2), (4, ph, pw, 41)) * 0.5
    variables = jax.jit(net.init)(jax.random.PRNGKey(1), x[:1])
    ref = jax.jit(net.apply)(variables, x, prior)
    scales = i8.calibrate(net, variables, [x[:2], x[2:]], [prior[:2], prior[2:]])
    apply_i8 = jax.jit(i8.make_int8_apply(net))
    out_i8 = apply_i8(variables, scales, x, prior)
    return net, variables, x, prior, ref, scales, apply_i8, out_i8


def test_f32_traversal_matches_flax_apply(setup):
    """The hand traversal (calib engine, full precision) must reproduce
    net.apply exactly — this pins the module-order walk."""
    net, v, x, prior, ref = setup[:5]
    out = jax.jit(i8.make_f32_reference_apply(net))(v, x, prior)
    np.testing.assert_allclose(np.asarray(out.uv), np.asarray(ref.uv), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.prob_logits), np.asarray(ref.prob_logits), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.kp_mask), np.asarray(ref.kp_mask), atol=1e-4
    )


def test_f32_traversal_no_prior(setup):
    """No-prior variant: the traversal must default the prior channels to
    zeros exactly like net.apply. Structure checked at trace time; values
    on a single crop (smaller compile than the full batch)."""
    net, v, x = setup[0], setup[1], setup[2]
    ref = jax.jit(net.apply)(v, x[:1])
    out = jax.jit(i8.make_f32_reference_apply(net))(v, x[:1])
    np.testing.assert_allclose(np.asarray(out.uv), np.asarray(ref.uv), atol=1e-4)


def test_calibration_structure(setup):
    """Scales: scalars at conv inputs, [C] vectors on the trunk; the int8
    engine must consume exactly all of them (index alignment). The
    consumption count is a TRACE-time property — eval_shape avoids
    compiling/executing the int8 graph a second time."""
    net, v, x, prior, _, scales = setup[:6]
    assert isinstance(scales, tuple) and len(scales) > 100
    ndims = {s.ndim for s in scales}
    assert ndims == {0, 1}
    assert all(float(jnp.max(s)) >= 0 for s in scales)

    def run(v, x, prior):
        eng = i8._Int8Engine(scales)
        outs = i8._traverse(eng, v, x, prior, net)
        # the assert fires during tracing if any point is left over/missing
        assert eng.i == len(scales), (eng.i, len(scales))
        return outs[-1]

    shape = jax.eval_shape(run, v, x, prior)
    assert shape.shape == (4, 16, 16, 41)


def test_int8_close_to_reference(setup):
    """Quantized outputs track the f32 model within PTQ noise on random
    weights (trained-weight validation lives in benchmarks/int8_accuracy.py)."""
    ref, out = setup[4], setup[7]
    rms = lambda a: float(jnp.sqrt(jnp.mean(jnp.asarray(a, jnp.float32) ** 2)))
    rel = rms(out.prob_logits.astype(jnp.float32) - ref.prob_logits) / rms(ref.prob_logits)
    assert rel < 0.08, f"logits rel RMS {rel}"
    assert out.uv.shape == ref.uv.shape and out.cov.shape == ref.cov.shape
    assert np.all(np.isfinite(np.asarray(out.uv)))
    # validity head: same dtype/shape semantics
    np.testing.assert_allclose(
        np.asarray(out.kp_mask), np.asarray(ref.kp_mask), atol=0.2
    )


def test_int8_batch_independent(setup):
    """Per-tensor scales are calibration constants, so single-crop results
    must not depend on batch composition."""
    v, x, prior, scales, apply_i8, full = (
        setup[1], setup[2], setup[3], setup[5], setup[6], setup[7]
    )
    solo = apply_i8(v, scales, x[1:2], prior[1:2])
    np.testing.assert_allclose(
        np.asarray(full.uv[1]), np.asarray(solo.uv[0]), atol=1e-5
    )


def test_int8_concat_prior_mode():
    """concat-prior traversal (torch-converted reference checkpoints): the
    int8 path must track the flax concat model within PTQ noise and consume
    the calibration points exactly."""
    net = PkpNet(prior_mode="concat", **TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    prior = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 41)) * 0.5
    v = jax.jit(net.init)(jax.random.PRNGKey(1), x[:1])
    ref = jax.jit(net.apply)(v, x, prior)
    scales = i8.calibrate(net, v, [x], [prior])
    out = jax.jit(i8.make_int8_apply(net))(v, scales, x, prior)
    rms = lambda a: float(jnp.sqrt(jnp.mean(jnp.asarray(a, jnp.float32) ** 2)))
    rel = rms(out.prob_logits.astype(jnp.float32) - ref.prob_logits) / rms(ref.prob_logits)
    assert rel < 0.08, f"concat logits rel RMS {rel}"


def test_quantize_weights_bit_identical(setup):
    """Pre-quantized weight trees must produce BIT-identical outputs to
    on-the-fly weight quantization under the same execution mode.

    (Compared EAGERLY: when the quantization runs inside a jitted graph,
    XLA's fast-math lowering of round(kernel / s_w) can flip codes at tie
    boundaries vs the eager op-by-op result — the pre-quantized tree is
    actually the deterministic one, matching the eager definition in both
    modes.)"""
    net, v, x, prior, _, scales = setup[:6]
    vq = i8.quantize_weights(net, v)
    # stem kernel untouched, engine conv kernels s8
    assert vq["params"]["HourglassNet_0"]["Conv_0"]["kernel"].dtype != jnp.int8
    r0 = vq["params"]["HourglassNet_0"]["Residual_0"]
    assert r0["Conv_0"]["kernel"].dtype == jnp.int8
    ap = i8.make_int8_apply(net)  # eager
    out = ap(v, scales, x, prior)
    out_q = ap(vq, scales, x, prior)
    np.testing.assert_array_equal(
        np.asarray(out.prob_logits, np.float32),
        np.asarray(out_q.prob_logits, np.float32),
    )
    np.testing.assert_array_equal(np.asarray(out.uv), np.asarray(out_q.uv))


def test_quantize_weights_concat_numpy_tree():
    """quantize_weights on the torch-converted deployment shape: concat
    prior mode with plain-NUMPY leaves (what load_torch_checkpoint yields)
    must still match the on-the-fly path exactly."""
    net = PkpNet(prior_mode="concat", **TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    prior = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 41)) * 0.5
    v = jax.jit(net.init)(jax.random.PRNGKey(1), x[:1])
    v_np = jax.tree.map(np.asarray, v)  # numpy leaves
    scales = i8.calibrate(net, v_np, [x], [prior])
    vq = i8.quantize_weights(net, v_np)
    assert vq["params"]["HourglassNet_0"]["Conv_0"]["kernel"].dtype != jnp.int8
    ap = i8.make_int8_apply(net)  # eager: jit fast-math can flip codes
    out = ap(v_np, scales, x, prior)
    out_q = ap(vq, scales, x, prior)
    np.testing.assert_array_equal(
        np.asarray(out.prob_logits, np.float32),
        np.asarray(out_q.prob_logits, np.float32),
    )


def test_calib_engine_rejects_prequantized_tree():
    """Feeding a quantize_weights tree to calibrate must raise, not silently
    use s8 codes as weights."""
    net = PkpNet(**TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = jax.jit(net.init)(jax.random.PRNGKey(1), x)
    vq = i8.quantize_weights(net, v)
    with pytest.raises(ValueError, match="ORIGINAL f32 weights"):
        i8.calibrate(net, vq, [x])


def test_scales_save_load_roundtrip(setup, tmp_path):
    """Persisted sidecar scales must reproduce the int8 outputs EXACTLY
    (order and values are the contract the executor consumes positionally)."""
    net, v, x, prior, _, scales, apply_i8, out_i8 = setup
    path = tmp_path / "int8_scales.npz"
    i8.save_scales(str(path), scales)
    loaded = i8.load_scales(str(path))
    assert len(loaded) == len(scales)
    for a, b in zip(scales, loaded):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))
    out2 = apply_i8(v, loaded, x, prior)
    np.testing.assert_array_equal(
        np.asarray(out_i8.prob_logits, np.float32),
        np.asarray(out2.prob_logits, np.float32),
    )


def test_loaded_scales_count_mismatch_raises(setup, tmp_path):
    """A sidecar from a different architecture must fail loudly via the
    scale-sequence drift check, not silently mis-scale."""
    net, v, x, prior, _, scales, apply_i8, _ = setup
    bad = scales[:-2]
    with pytest.raises(ValueError, match="drift"):
        i8.make_int8_apply(net)(v, bad, x[:1], prior[:1])


def test_no_prior_program_bit_identical(setup):
    """The statically-prior-free program (no_prior=True) must be
    BIT-identical to the default program fed an all-zero prior (zero codes
    contribute exactly zero through conv and add), for BOTH prior modes,
    consuming the same scales tuple."""
    net, v, x, _, _, scales = setup[:6]
    zero_prior = jnp.zeros((4,) + net.prior_hw((64, 64)) + (41,), jnp.float32)
    ref0 = i8.make_int8_apply(net)(v, scales, x, zero_prior)
    out = i8.make_int8_apply(net, no_prior=True)(v, scales, x)
    np.testing.assert_array_equal(
        np.asarray(ref0.prob_logits, np.float32),
        np.asarray(out.prob_logits, np.float32),
    )
    np.testing.assert_array_equal(np.asarray(ref0.uv), np.asarray(out.uv))
    np.testing.assert_array_equal(
        np.asarray(ref0.kp_mask), np.asarray(out.kp_mask)
    )


def test_no_prior_program_bit_identical_concat():
    net = PkpNet(prior_mode="concat", **TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    prior = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 41)) * 0.5
    v = jax.jit(net.init)(jax.random.PRNGKey(1), x[:1])
    scales = i8.calibrate(net, v, [x], [prior])
    ref0 = i8.make_int8_apply(net)(v, scales, x, jnp.zeros_like(prior))
    out = i8.make_int8_apply(net, no_prior=True)(v, scales, x)
    np.testing.assert_array_equal(
        np.asarray(ref0.prob_logits, np.float32),
        np.asarray(out.prob_logits, np.float32),
    )
    np.testing.assert_array_equal(np.asarray(ref0.uv), np.asarray(out.uv))


def test_frame_inference_no_prior_dispatch():
    """kernels.make_frame_inference: has_prior=False returns the same
    results as all-zero priors, for bf16 and int8 tiers."""
    from suo_slam_tpu.slam import kernels

    net = PkpNet(**TINY)
    img = jax.random.uniform(jax.random.PRNGKey(0), (96, 128, 3))
    boxes = jnp.asarray([[8.0, 8.0, 72.0, 72.0], [20.0, 10.0, 90.0, 80.0]])
    ov = jnp.ones((2,), bool)
    puv = jnp.zeros((2, 41, 2), jnp.float32)
    pv = jnp.zeros((2, 41), bool)  # no valid prior -> rendered prior is zero
    v = jax.jit(net.init)(jax.random.PRNGKey(1),
                          jnp.zeros((1, 64, 64, 3), jnp.float32))
    for int8 in (False, True):
        fn = kernels.make_frame_inference(net, v, (64, 64), int8=int8,
                                          int8_calib_frames=1)
        assert fn.supports_no_prior
        uv_p, _, m_p = fn(img, boxes, ov, puv, pv)
        uv_np, _, m_np = fn(img, boxes, ov, puv, pv, has_prior=False)
        np.testing.assert_array_equal(np.asarray(uv_p), np.asarray(uv_np))
        np.testing.assert_array_equal(np.asarray(m_p), np.asarray(m_np))
