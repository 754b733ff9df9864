"""PkpNet / hourglass shape, dtype, and loss-gradient smoke tests (tiny net)."""

import numpy as np
import jax
import jax.numpy as jnp

from suo_slam_tpu.models import PkpNet
from suo_slam_tpu.models.hourglass import HourglassNet, upsample2x
from suo_slam_tpu.train import losses
import pytest

TINY = dict(n_stack=2, n_modules=1, features=32)


@pytest.fixture(scope="module")
def tiny():
    """Shared tiny net + one eager forward (warms the per-op compile cache
    for every test in this file — single-CPU XLA compiles dominate the
    fast tier)."""
    net = PkpNet(**TINY)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    return net, params, x, out


def test_upsample2x():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = upsample2x(x)
    assert y.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(y[0, :2, :2, 0]), 0.0)
    np.testing.assert_allclose(np.asarray(y[0, 2:, 2:, 0]), 3.0)


def test_hourglass_net_output_resolution(tiny):
    """Backbone resolution contract (input/4 like the reference) and the
    intermediate-supervision output count, checked at trace time."""
    net = HourglassNet(in_features=3, num_output=5, n_stack=2, n_modules=1, features=32)
    x = jnp.zeros((2, 64, 64, 3))
    params = jax.eval_shape(net.init, jax.random.PRNGKey(0), x)
    outs = jax.eval_shape(net.apply, params, x)
    assert len(outs) == 2
    for o in outs:
        assert o.shape == (2, 16, 16, 5)  # input/4 like the reference


def test_pkpnet_forward_shapes_and_prob(tiny):
    net, params, x, out = tiny
    k = 41
    assert out.uv.shape == (2, k, 2)
    assert out.cov.shape == (2, k, 2, 2)
    assert out.prob.shape == (2, 16, 16, k)
    assert out.kp_mask.shape == (2, k)
    np.testing.assert_allclose(np.asarray(jnp.sum(out.prob, axis=(1, 2))), 1.0, atol=1e-5)
    # cov is symmetric PSD-ish (diagonal floored)
    assert np.all(np.asarray(out.cov[..., 0, 0]) > 0)
    np.testing.assert_allclose(
        np.asarray(out.cov[..., 0, 1]), np.asarray(out.cov[..., 1, 0]), atol=1e-7
    )


def test_pkpnet_with_prior_channel_changes_output(tiny):
    net, params, x, out0 = tiny
    ph, pw = net.prior_hw((64, 64))
    prior = jnp.zeros((2, ph, pw, 41)).at[:, 5:8, 5:8, 0].set(1.0)
    out1 = net.apply(params, x, prior)
    assert not np.allclose(np.asarray(out0.uv), np.asarray(out1.uv))


def test_pkpnet_concat_prior_mode_matches_reference_wiring():
    net = PkpNet(prior_mode="concat", **TINY)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    prior = jnp.zeros((1, 64, 64, 41)).at[:, 20:30, 20:30, 0].set(1.0)
    out0 = net.apply(params, x)
    out1 = net.apply(params, x, prior)
    assert not np.allclose(np.asarray(out0.uv), np.asarray(out1.uv))


@pytest.mark.slow
def test_pkpnet_bf16_compute_f32_readout():
    net = PkpNet(dtype=jnp.bfloat16, **TINY)
    x = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.uv.dtype == jnp.float32
    assert out.cov.dtype == jnp.float32
    # params stored in f32
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.dtype == jnp.float32


@pytest.mark.slow
def test_loss_gradients_flow():
    net = PkpNet(**TINY)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    uv_gt = jax.random.uniform(jax.random.PRNGKey(3), (2, 41, 2), minval=-1, maxval=1)
    mask = jnp.ones((2, 41), bool).at[1, 20:].set(False)

    def loss_fn(p):
        out = net.apply(p, x)
        loss, aux = losses.total_loss(
            out.uv, out.cov, out.prob, out.kp_mask_logits, uv_gt, mask, epoch=20
        )
        return loss

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total > 0


def test_mle_loss_matches_direct_computation():
    key = jax.random.PRNGKey(4)
    uv = jax.random.normal(key, (3, 5, 2), jnp.float64)
    uv_gt = uv + 0.1 * jax.random.normal(jax.random.PRNGKey(5), (3, 5, 2), jnp.float64)
    A = jax.random.normal(jax.random.PRNGKey(6), (3, 5, 2, 2), jnp.float64) * 0.3
    cov = A @ jnp.swapaxes(A, -1, -2) + 0.05 * jnp.eye(2)
    mask = jnp.ones((3, 5), bool)
    maha, logdet = losses.mle_loss(uv, uv_gt, cov, mask)
    cov_l = cov + 1e-6 * jnp.eye(2)
    res = (uv_gt - uv)[..., None]
    maha_ref = jnp.mean(jnp.swapaxes(res, -1, -2) @ jnp.linalg.inv(cov_l) @ res)
    logdet_ref = jnp.mean(jnp.log(jnp.linalg.det(cov_l)))
    np.testing.assert_allclose(float(maha), float(maha_ref), rtol=1e-8)
    np.testing.assert_allclose(float(logdet), float(logdet_ref), rtol=1e-8)


@pytest.mark.slow
def test_groupnorm_option_forward_and_train():
    """norm='group' (the batch-independent option) still trains/infers."""
    net = PkpNet(norm="group", **TINY)
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" not in variables
    out = net.apply(variables, x)
    assert out.uv.shape == (2, 41, 2)
    # train step with empty batch_stats
    import optax

    from suo_slam_tpu.train import harness

    opt = optax.sgd(1e-3)
    state = harness.init_state(net, jax.random.PRNGKey(0), opt, input_hw=(64, 64))
    assert state.batch_stats == {}
    b, o, k = 1, 2, 41
    batch = harness.Batch(
        images=jax.random.uniform(jax.random.PRNGKey(6), (b, 80, 80, 3)),
        boxes=jnp.tile(jnp.asarray([4.0, 4.0, 68.0, 68.0]), (b, o, 1)),
        obj_mask=jnp.ones((b, o), bool),
        prior_uv=jnp.zeros((b, o, k, 2)),
        prior_mask=jnp.zeros((b, o, k), bool),
        uv_gt=jnp.zeros((b, o, k, 2)),
        kp_mask=jnp.ones((b, o, k), bool),
    )
    step = jax.jit(harness.make_train_step(net, opt, input_hw=(64, 64)))
    state, m = step(state, batch, jnp.asarray(1.0))
    assert np.isfinite(float(m["loss"]))
