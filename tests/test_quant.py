"""int8 quantized-inference tests: checkpoint compatibility and accuracy
against the bf16 path on random weights."""

import numpy as np
import jax
import jax.numpy as jnp

from suo_slam_tpu.models import PkpNet
from suo_slam_tpu.models.quant import calibrate
import pytest

TINY = dict(n_stack=2, n_modules=1, features=32)


def _tree_paths(tree, prefix=""):
    out = set()
    for k, v in tree.items():
        p = f"{prefix}/{k}"
        if isinstance(v, dict):
            out |= _tree_paths(v, p)
        else:
            out.add(p)
    return out


def test_param_tree_matches_bf16_model():
    x = jnp.zeros((1, 64, 64, 3))
    v_off = PkpNet(**TINY).init(jax.random.PRNGKey(0), x)
    v_q = PkpNet(quant="calib", **TINY).init(jax.random.PRNGKey(0), x)
    # identical parameter paths -> bf16 checkpoints load into the quant graph
    assert _tree_paths(v_off["params"]) == _tree_paths(v_q["params"])
    assert "quant" in v_q


@pytest.mark.slow
def test_int8_matches_bf16_on_random_weights():
    net_f = PkpNet(**TINY)
    net_c = PkpNet(quant="calib", **TINY)
    net_q = PkpNet(quant="int8", **TINY)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 64, 64, 3))
    variables = net_c.init(jax.random.PRNGKey(0), x[:1])
    # calibrate activation scales on a couple of batches
    variables = calibrate(net_c, variables, [x[:2], x[2:]])
    out_q = net_q.apply(variables, x)
    out_f = net_f.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}, x
    )
    # Judge accuracy at the heatmap-logit level: int8 PTQ noise should be a
    # small fraction of the signal. (Random weights produce multi-modal
    # near-uniform heatmaps whose soft-argmax amplifies any noise; trained
    # peaked heatmaps translate this logit error into sub-pixel uv shifts.)
    lq, lf = out_q.prob_logits, out_f.prob_logits
    rel = float(jnp.sqrt(jnp.mean((lq - lf) ** 2)) / jnp.sqrt(jnp.mean(lf**2)))
    assert rel < 0.03, rel
    uv_err = float(jnp.max(jnp.abs(out_q.uv - out_f.uv)))
    assert uv_err < 0.3, uv_err  # loose random-weight bound; see comment
    mask_err = float(jnp.max(jnp.abs(out_q.kp_mask - out_f.kp_mask)))
    assert mask_err < 0.3, mask_err


def test_calibrate_populates_scales():
    net_c = PkpNet(quant="calib", **TINY)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    variables = net_c.init(jax.random.PRNGKey(0), x[:1])
    variables = calibrate(net_c, variables, [x])
    leaves = jax.tree_util.tree_leaves(variables["quant"])
    # all scales positive except convs whose calibration input is identically
    # zero (e.g. the prior-injection conv when no prior is given)
    pos = sum(float(v) > 0 for v in leaves)
    assert pos >= len(leaves) - 1, (pos, len(leaves))
