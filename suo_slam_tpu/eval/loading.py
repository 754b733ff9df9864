"""Checkpoint -> (net, variables) loading shared by the eval-side CLIs
(`evaluate.py`, `calibrate_int8.py`, `plot_cov.py`).

Handles both checkpoint families the reference ecosystem produces: our own
orbax directories (train.py) and the reference's torch `.pth.tar`
(`/root/reference/train.py:349-355`, converted layer-for-layer by
`train/torch_convert.py`).
"""

import os


def load_eval_network(chkpt_path, bf16=True, norm="batch",
                      no_network_cov=False):
    """Load a PkpNet + variables for inference.

    Returns (net, variables, model_epoch). Architecture recorded at train
    time wins over the `norm` argument (a mismatch would load the checkpoint
    into the wrong net or crash on batch_stats).
    """
    import jax
    import jax.numpy as jnp

    from ..models import PkpNet

    if chkpt_path.endswith((".pth.tar", ".pth")):
        # reference torch checkpoint: layer-for-layer conversion
        from ..train.torch_convert import load_torch_checkpoint

        net = PkpNet(
            calc_cov=not no_network_cov, norm="batch",
            prior_mode="concat", transpose_heatmaps=True,
            dtype=jnp.bfloat16 if bf16 else jnp.float32,
        )
        params, model_epoch, _ = load_torch_checkpoint(chkpt_path)
        return net, params, model_epoch

    from ..train.checkpoint import load_model_only, peek_checkpoint_args

    # trust the architecture recorded at train time over the CLI flag
    ck_norm = peek_checkpoint_args(chkpt_path).get("norm")
    if ck_norm in ("batch", "group") and ck_norm != norm:
        print(f"[load_eval_network] checkpoint was trained with "
              f"norm={ck_norm!r}; overriding norm={norm!r}")
        norm = ck_norm
    tiny = bool(int(os.environ.get("SUO_TINY_NET", "0")))
    net = PkpNet(
        calc_cov=not no_network_cov, norm=norm,
        dtype=jnp.bfloat16 if bf16 else jnp.float32,
        **(dict(n_stack=1, n_modules=1, features=16) if tiny else {}),
    )
    dummy = jnp.zeros((1, 256, 256, 3))
    template = net.init(jax.random.PRNGKey(0), dummy)
    params, model_epoch, _ = load_model_only(chkpt_path, template)
    return net, params, model_epoch


def default_scales_path(chkpt_path):
    """Canonical int8-scales sidecar location for a checkpoint path
    (directory checkpoints get a file inside; file checkpoints a sibling)."""
    if os.path.isdir(chkpt_path):
        return os.path.join(chkpt_path, "int8_scales.npz")
    return chkpt_path + ".int8_scales.npz"
