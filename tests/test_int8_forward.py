"""int8-resident executor tests: traversal exactness, quantized accuracy,
calibration structure, and prior-path equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from suo_slam_tpu.models import PkpNet
from suo_slam_tpu.models import int8_forward as i8

TINY = dict(n_stack=2, n_modules=2, features=32, dtype=jnp.float32)


@pytest.fixture(scope="module")
def setup():
    net = PkpNet(**TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 64, 64, 3))
    ph, pw = net.prior_hw((64, 64))
    prior = jax.random.uniform(jax.random.PRNGKey(2), (4, ph, pw, 41)) * 0.5
    variables = net.init(jax.random.PRNGKey(1), x[:1])
    ref = net.apply(variables, x, prior)
    return net, variables, x, prior, ref


def test_f32_traversal_matches_flax_apply(setup):
    """The hand traversal (calib engine, full precision) must reproduce
    net.apply exactly — this pins the module-order walk."""
    net, v, x, prior, ref = setup
    out = i8.make_f32_reference_apply(net)(v, x, prior)
    np.testing.assert_allclose(np.asarray(out.uv), np.asarray(ref.uv), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.prob_logits), np.asarray(ref.prob_logits), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.kp_mask), np.asarray(ref.kp_mask), atol=1e-4
    )


def test_f32_traversal_no_prior(setup):
    net, v, x, prior, _ = setup
    ref = net.apply(v, x)
    out = i8.make_f32_reference_apply(net)(v, x)
    np.testing.assert_allclose(np.asarray(out.uv), np.asarray(ref.uv), atol=1e-4)


def test_calibration_structure(setup):
    """Scales: scalars at conv inputs, [C] vectors on the trunk; the int8
    engine must consume exactly all of them (index alignment)."""
    net, v, x, prior, _ = setup
    scales = i8.calibrate(net, v, [x[:2], x[2:]], [prior[:2], prior[2:]])
    assert isinstance(scales, tuple) and len(scales) > 100
    ndims = {s.ndim for s in scales}
    assert ndims == {0, 1}
    assert all(float(jnp.max(s)) >= 0 for s in scales)

    eng = i8._Int8Engine(scales)
    outs = i8._traverse(eng, v, x, prior, net)
    assert eng.i == len(scales), (eng.i, len(scales))
    assert outs[-1].shape == (4, 16, 16, 41)


def test_int8_close_to_reference(setup):
    """Quantized outputs track the f32 model within PTQ noise on random
    weights (trained-weight validation lives in test_int8_accuracy.py)."""
    net, v, x, prior, ref = setup
    scales = i8.calibrate(net, v, [x], [prior])
    out = jax.jit(i8.make_int8_apply(net))(v, scales, x, prior)
    rms = lambda a: float(jnp.sqrt(jnp.mean(jnp.asarray(a) ** 2)))
    rel = rms(out.prob_logits - ref.prob_logits) / rms(ref.prob_logits)
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
    net, v, x, prior, _ = setup
    scales = i8.calibrate(net, v, [x], [prior])
    apply_fn = jax.jit(i8.make_int8_apply(net))
    full = apply_fn(v, scales, x, prior)
    solo = apply_fn(v, scales, x[1:2], prior[1:2])
    np.testing.assert_allclose(
        np.asarray(full.uv[1]), np.asarray(solo.uv[0]), atol=1e-5
    )
