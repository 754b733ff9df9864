"""Covariance-calibration bounds (VERDICT r2 #7).

The paper's core uncertainty claim is that the network's predicted 2x2
keypoint covariance is statistically calibrated — checked by the reference
with `plot_cov.py` (% of errors inside the 99% chi2 bound,
`/root/reference/plot_cov.py:141-157`). Two layers of proof here:

1. the protocol math itself (`suo_slam_tpu/eval/calibration.py`) on
   sampled Gaussians with known covariance;
2. a trained network: a tiny PkpNet overfit with the MLE loss must come
   out calibrated on its training distribution — the loss's logdet term
   is what forces cov to match the residuals, so this is a real property
   of the training objective, not of the fixture.

Full-size trained-weight numbers (bf16 AND int8) are produced by
`benchmarks/int8_accuracy.py` and committed in BENCHMARKS.md.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from suo_slam_tpu.eval.calibration import CHI2_99_2DOF, cov_chi2, pct_inbounds


def _random_spd2(rng, n, scale=0.03):
    A = rng.normal(size=(n, 2, 2)) * scale
    return A @ np.swapaxes(A, -1, -2) + 1e-6 * np.eye(2)


def test_pct_inbounds_calibrated_gaussian():
    """Errors sampled from EXACTLY the predicted covariance: ~99% must fall
    inside the 99% chi2 bound (the definition of calibration)."""
    rng = np.random.default_rng(0)
    n = 20000
    cov = _random_spd2(rng, n)
    L = np.linalg.cholesky(cov)
    err = (L @ rng.normal(size=(n, 2, 1)))[..., 0]
    uv_gt = rng.uniform(-1, 1, (n, 2))
    pct = pct_inbounds(cov_chi2(uv_gt - err, cov, uv_gt))
    assert 98.3 < pct < 99.7, pct


def test_pct_inbounds_detects_overconfidence():
    """Covariances 3x too small (errors 3x sigma): far fewer errors are
    explained — the protocol must catch an overconfident predictor."""
    rng = np.random.default_rng(1)
    n = 20000
    cov = _random_spd2(rng, n)
    L = np.linalg.cholesky(cov)
    err = 3.0 * (L @ rng.normal(size=(n, 2, 1)))[..., 0]
    uv_gt = rng.uniform(-1, 1, (n, 2))
    pct = pct_inbounds(cov_chi2(uv_gt - err, cov, uv_gt))
    assert pct < 75.0, pct


def test_cov_chi2_matches_linalg():
    """Closed-form 2x2 Mahalanobis == explicit inv() contraction."""
    rng = np.random.default_rng(2)
    cov = _random_spd2(rng, 64)
    uv = rng.normal(size=(64, 2))
    gt = rng.normal(size=(64, 2))
    got = cov_chi2(uv, cov, gt)
    r = gt - uv
    want = np.einsum("ni,nij,nj->n", r, np.linalg.inv(cov), r)
    np.testing.assert_allclose(got, want, rtol=1e-9)


@pytest.mark.slow
def test_mle_trained_network_is_calibrated():
    """Overfit a tiny PkpNet with the MLE loss on fixed crops; the predicted
    covariances must (a) explain the residuals (>=90% inside the 99% bound)
    and (b) be SMALL (mean sigma well under the heatmap cell size), so the
    pass is not the vacuous huge-cov one an untrained net gives."""
    import optax

    from suo_slam_tpu.models import PkpNet
    from suo_slam_tpu.train import losses

    net = PkpNet(n_stack=2, n_modules=1, features=32, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    n, k = 4, 41
    x = jnp.asarray(rng.uniform(size=(n, 64, 64, 3)), jnp.float32)
    uv_gt = jnp.asarray(rng.uniform(-0.7, 0.7, (n, k, 2)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(n, k)) < 0.8)

    variables = net.init(jax.random.PRNGKey(0), x[:1])
    params = variables["params"]
    extra = {kk: v for kk, v in variables.items() if kk != "params"}
    n_steps = 400
    tx = optax.adam(optax.cosine_decay_schedule(3e-3, n_steps, 0.03))
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        # train in EVAL mode (no dropout, frozen init BN stats): the test is
        # about the MLE objective's optimum being calibrated, so the function
        # being optimized must be the function being evaluated.
        def loss_fn(p):
            out = net.apply({"params": p, **extra}, x)
            uv_l, var_l, bce = losses.kp_loss(
                out.uv, out.cov, out.prob, out.kp_mask_logits, uv_gt, mask)
            return uv_l + var_l + 0.1 * bce

        l, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, l

    l0 = None
    for i in range(n_steps):
        params, opt, l = step(params, opt)
        if l0 is None:
            l0 = float(l)
    assert float(l) < l0, "MLE loss must decrease"

    out = jax.jit(net.apply)({"params": params, **extra}, x)
    uv = np.asarray(out.uv, np.float64)
    cov = np.asarray(out.cov, np.float64)
    m = np.asarray(mask)
    chi2 = cov_chi2(uv, cov, np.asarray(uv_gt, np.float64))[m]
    pct = pct_inbounds(chi2)
    mean_sigma = float(np.sqrt(np.trace(cov[m], axis1=-2, axis2=-1) / 2).mean())
    # a UNIFORM 16x16 heatmap reads out sigma ~0.58 NDC; the MLE optimum
    # on this fixture sits near 0.30 (measured over seeds/steps). The bound
    # guards against the vacuous any-huge-cov pass, not peak sharpness.
    assert mean_sigma < 0.45, f"cov did not shrink (sigma={mean_sigma})"
    assert pct >= 90.0, f"only {pct:.1f}% inside the 99% bound (sigma={mean_sigma})"
