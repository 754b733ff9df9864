"""Fused inference forward must match net.apply exactly (same math, fused
blocks swapped in) on random weights — CPU interpret-capable subset."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from suo_slam_tpu.models import PkpNet
from suo_slam_tpu.models.fused_forward import make_fused_apply


@pytest.mark.parametrize("n_modules", [1, 2])
@pytest.mark.slow
def test_fused_forward_matches_apply(n_modules):
    # FUSE_MIN_ROWS=1024 means no pallas block triggers at 64x64 input
    # (heatmap res 16x16=256 rows), so this verifies the pure traversal.
    net = PkpNet(n_stack=2, n_modules=n_modules, features=32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), x[:1])
    ph, pw = net.prior_hw((64, 64))
    prior = jax.random.uniform(jax.random.PRNGKey(2), (2, ph, pw, 41))
    ref = net.apply(variables, x, prior)
    fused = make_fused_apply(net)(variables, x, prior)
    np.testing.assert_allclose(np.asarray(fused.prob_logits),
                               np.asarray(ref.prob_logits), atol=2e-4)
    np.testing.assert_allclose(np.asarray(fused.uv), np.asarray(ref.uv),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(fused.kp_mask),
                               np.asarray(ref.kp_mask), atol=1e-4)


@pytest.mark.slow
def test_fused_forward_no_prior_matches():
    net = PkpNet(n_stack=1, n_modules=1, features=32)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    ref = net.apply(variables, x)
    fused = make_fused_apply(net)(variables, x)
    np.testing.assert_allclose(np.asarray(fused.uv), np.asarray(ref.uv),
                               atol=1e-4)
