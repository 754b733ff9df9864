"""Covariance-calibration statistics (the `plot_cov.py` protocol,
reference `/root/reference/plot_cov.py:141-157`): the fraction of keypoint
errors falling inside the 99% chi-square bound of the network's predicted
2x2 covariance. This is the paper's core uncertainty claim — the predicted
covariances must be statistically calibrated for the chi2 gating in camera
RANSAC and BA to mean anything.

Shared by `plot_cov.py` (the CLI with scatter plots) and
`benchmarks/int8_accuracy.py` (bf16-vs-int8 calibration at trained weights).
"""

import numpy as np

# chi2.ppf(0.99, df=2)
CHI2_99_2DOF = 9.210


def cov_chi2(uv_pred, cov_pred, uv_gt):
    """Per-keypoint Mahalanobis chi2 of the error under the predicted 2x2
    covariance. Closed-form 2x2 inverse (no linalg calls; matches
    `plot_cov.py`). Shapes: uv_pred/uv_gt [..., 2], cov_pred [..., 2, 2];
    returns [...]."""
    res = np.asarray(uv_gt, np.float64) - np.asarray(uv_pred, np.float64)
    cov = np.asarray(cov_pred, np.float64)
    a, b, d = cov[..., 0, 0], cov[..., 0, 1], cov[..., 1, 1]
    det = np.maximum(a * d - b * b, 1e-12)
    return (
        d * res[..., 0] ** 2
        - 2 * b * res[..., 0] * res[..., 1]
        + a * res[..., 1] ** 2
    ) / det


def pct_inbounds(chi2s, bound=CHI2_99_2DOF):
    """% of chi2 values inside the bound (100.0 = every error explained by
    its predicted covariance; a CALIBRATED predictor sits near 99)."""
    chi2s = np.asarray(chi2s)
    if chi2s.size == 0:
        return float("nan")
    return 100.0 * float((chi2s <= bound).mean())
