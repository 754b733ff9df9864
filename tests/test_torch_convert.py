"""Torch-checkpoint conversion tests against the ACTUAL reference backbone.

The read-only reference mount provides `lib.models.hg.HourglassNet` (pure
torch); we random-init it, convert its state_dict, and require our flax
backbone to reproduce its outputs — the strongest possible structural-parity
check without trained weights. (The reference is used as a test oracle only;
nothing is copied.)
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from suo_slam_tpu.models import PkpNet
from suo_slam_tpu.models.hourglass import HourglassNet as FlaxHG
from suo_slam_tpu.train.torch_convert import convert_state_dict

NSTACK, NMOD, FEATS, NKP = 2, 2, 32, 41


@pytest.fixture(scope="module")
def torch_backbone():
    from lib.models.hg import HourglassNet as TorchHG

    torch.manual_seed(0)
    net = TorchHG(nInChan=3 + NKP, nStack=NSTACK, nModules=NMOD,
                  nFeats=FEATS, numOutput=NKP)
    net.eval()
    return net


def _convert(torch_backbone):
    sd = {f"backbone.{k}": v.detach().numpy()
          for k, v in torch_backbone.state_dict().items()}
    # fake classifier for the full-PkpNet tree
    sd["classifier.2.weight"] = np.eye(NKP, dtype=np.float32)
    sd["classifier.2.bias"] = np.zeros((NKP,), np.float32)
    return convert_state_dict(sd, n_stack=NSTACK, n_modules=NMOD)


def test_backbone_outputs_match(torch_backbone):
    params, stats = _convert(torch_backbone)
    x = np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3 + NKP)).astype(np.float32)
    with torch.no_grad():
        ref = torch_backbone(torch.tensor(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC

    flax_net = FlaxHG(in_features=3 + NKP, num_output=NKP, n_stack=NSTACK,
                      n_modules=NMOD, features=FEATS, norm="batch")
    variables = {"params": params["HourglassNet_0"],
                 "batch_stats": stats["HourglassNet_0"]}
    outs = flax_net.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(outs[-1]), ref, atol=2e-4)


def test_full_pkpnet_with_converted_weights_runs(torch_backbone):
    params, stats = _convert(torch_backbone)
    net = PkpNet(n_stack=NSTACK, n_modules=NMOD, features=FEATS,
                 norm="batch", prior_mode="concat", transpose_heatmaps=True)
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (1, 64, 64, 3)), jnp.float32
    )
    # tree structure must match a fresh init exactly
    ref_v = net.init(jax.random.PRNGKey(0), x)
    conv_paths = jax.tree_util.tree_structure({"params": params,
                                               "batch_stats": stats})
    init_paths = jax.tree_util.tree_structure(
        {"params": ref_v["params"], "batch_stats": ref_v["batch_stats"]}
    )
    assert conv_paths == init_paths
    out = net.apply({"params": params, "batch_stats": stats}, x)
    assert out.uv.shape == (1, NKP, 2)


def test_transposed_readout_matches_reference_meshgrid(torch_backbone):
    """Peak at heatmap (row=i0, col=j0): the reference readout gives
    u = r[i0], v = -r[j0] with r = (idx+0.5)/(S/2) - 1
    (`lib/models/pkpnet.py:19-26,44-49`). Our transpose flag must agree."""
    params, stats = _convert(torch_backbone)
    from suo_slam_tpu.ops import heatmap as hm

    S = 16
    i0, j0 = 11, 3
    logits = np.full((1, S, S, 1), -30.0, np.float32)
    logits[0, i0, j0, 0] = 30.0  # one-hot peak after softmax
    # what PkpNet does with transpose_heatmaps=True:
    raw = jnp.swapaxes(jnp.asarray(logits), 1, 2)
    uv, _ = hm.soft_argmax(hm.spatial_softmax(raw))
    r = lambda idx: (idx + 0.5) / (S / 2) - 1.0
    np.testing.assert_allclose(float(uv[0, 0, 0]), r(i0), atol=1e-5)
    np.testing.assert_allclose(float(uv[0, 0, 1]), -r(j0), atol=1e-5)


@pytest.mark.slow
def test_evaluate_cli_with_torch_checkpoint(tmp_path):
    """Full eval flow from a reference-format .pth.tar: save a (random-init)
    full-size reference-named checkpoint, convert via `evaluate.py -c *.pth.tar`,
    run single-view eval on the synthetic fixture."""
    from lib.models.hg import HourglassNet as TorchHG

    from tests.helpers.synthetic_bop import write_synthetic_bop

    torch.manual_seed(1)
    backbone = TorchHG(nInChan=3 + NKP, nStack=2, nModules=2, nFeats=256,
                       numOutput=NKP)
    sd = {f"backbone.{k}": v for k, v in backbone.state_dict().items()}
    sd["classifier.2.weight"] = torch.zeros(NKP, NKP)
    sd["classifier.2.bias"] = torch.full((NKP,), 5.0)  # all channels "valid"
    ckpt_path = tmp_path / "model_best.pth.tar"
    torch.save({"model": sd, "epoch": 59, "args": None, "best_val": 0.0},
               str(ckpt_path))

    ds_root = tmp_path / "ycbv"
    write_synthetic_bop(str(ds_root), n_scenes=1, n_views=1)
    import os

    os.symlink(ds_root / "models_bop-compat", ds_root / "models_bop-compat_eval",
               target_is_directory=True)
    import numpy as np

    np.random.seed(666)
    # import OUR evaluate.py explicitly — /root/reference is on sys.path in
    # this module and shadows the top-level module name
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "suo_evaluate", os.path.join(REPO, "evaluate.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    Evaluator = mod.Evaluator

    s = Evaluator(
        "ycbv", str(ds_root), str(ckpt_path), nviews=1, detection_type="gt",
        no_viz=True, kp_config_root=str(ds_root / "kp_configs"), bf16=False,
    ).run()
    # random weights -> garbage poses, but the converted-network pipeline must
    # run end to end and produce the metric surface
    assert s is not None and "ours" in s, s
