"""Tests for the Pallas int8 fused residual block (`ops/int8_residual.py`).

Runs in Pallas interpreter mode on the CPU test platform; the same kernel
code compiles via Mosaic on TPU (exactness re-verified there by
`benchmarks/exp_var_m.py`-style runs; see BENCHMARKS.md).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from suo_slam_tpu.ops.int8_residual import fused_residual_int8, residual_int8_ref


def _random_block(rng, n, h, w, c, m):
    q_in = jnp.asarray(rng.integers(-127, 128, (n, h, w, c)), jnp.int8)
    f = lambda *s: jnp.asarray(rng.uniform(-0.02, 0.02, s), jnp.float32)
    fv = lambda k: jnp.abs(f(1, k)) + 0.01
    vecs = (
        fv(c), f(1, c),
        jnp.asarray(rng.integers(-127, 128, (c, m)), jnp.int8),
        fv(m), f(1, m) * 20,
        jnp.asarray(rng.integers(-127, 128, (3, 3, m, m)), jnp.int8),
        fv(m), f(1, m) * 20,
        jnp.asarray(rng.integers(-127, 128, (m, c)), jnp.int8),
        fv(c), fv(c) * 0.1, f(1, c) * 10,
    )
    return q_in, vecs


def test_kernel_bit_exact_vs_ref():
    """Kernel output must match the pure-JAX twin code-for-code: the rolled
    dx-shifts + halo dy-slices must reproduce lax.conv zero padding exactly,
    including all four requantization points."""
    rng = np.random.default_rng(0)
    q_in, vecs = _random_block(rng, 2, 32, 32, 256, 128)
    out = fused_residual_int8(q_in, *vecs, interpret=True)
    ref = residual_int8_ref(q_in, *vecs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_kernel_boundary_masks():
    """Zero everything except one interior + one border pixel: the 3x3 must
    not wrap across image rows or columns (regression for the roll masks)."""
    rng = np.random.default_rng(1)
    q_in, vecs = _random_block(rng, 1, 32, 32, 256, 128)
    q = np.zeros_like(np.asarray(q_in))
    q[0, 0, 0, :] = 63        # top-left corner
    q[0, 15, 31, :] = -80     # right edge, mid rows
    q_in = jnp.asarray(q)
    out = fused_residual_int8(q_in, *vecs, interpret=True)
    ref = residual_int8_ref(q_in, *vecs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.slow
def test_fused_forward_matches_unfused_engine():
    """Full-net comparison: the fused int8 path must agree with the unfused
    int8 path to within quantization noise (both deviate from bf16 by ~3%
    heatmap-logit RMS on random weights; their mutual deviation must be of
    the same order, not larger)."""
    from suo_slam_tpu.models import PkpNet
    from suo_slam_tpu.models import int8_forward as i8

    net = PkpNet(n_stack=1, n_modules=1, dtype=jnp.bfloat16)
    n, h, w = 2, 128, 128
    x = jax.random.uniform(jax.random.PRNGKey(0), (n, h, w, 3), jnp.float32)
    ph, pw = net.prior_hw((h, w))
    prior = jax.random.uniform(jax.random.PRNGKey(3), (n, ph, pw, net.num_kp),
                               jnp.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(1), x[:1])
    scales = i8.calibrate(net, variables, [x], [prior])

    lg = {}
    for fused in (False, True):
        ap = i8.make_int8_apply(net, fused=fused)
        lg[fused] = np.asarray(
            ap(variables, scales, x, prior).prob_logits, np.float32)
    rms = lambda a: float(np.sqrt((a ** 2).mean()))
    base = rms(np.asarray(
        net.apply(variables, x, prior).prob_logits, np.float32))
    assert rms(lg[True] - lg[False]) < 0.15 * base
