"""Jitted training step with data-parallel sharding over a device mesh.

Replaces the reference training loop internals (`train.py:27-164`) and its
single-process `DataParallelWrapper` (`lib/utils/training_utils.py:5-40`):
instead of scattering Python lists of tensors across CUDA devices, the batch
is a dense padded pytree sharded over the `data` axis of a
`jax.sharding.Mesh`, params are replicated, and XLA inserts the gradient
all-reduce over ICI.

The full fused step runs on device end to end: ROI crop from full images
(`ops.roi`), prior-heatmap concat, hourglass forward, soft-argmax readout,
MLE/variance/BCE losses with annealing, Adam update.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.pkpnet import PkpNet
from ..ops import roi as roi_ops
from . import losses


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any  # masked-BatchNorm running stats ({} for norm="group")
    opt_state: Any
    step: jax.Array
    rng: jax.Array


class Batch(NamedTuple):
    """Dense padded training batch (host collate produces this).

    B = images per step, O = object capacity per image (the reference's
    `truncate_obj`, `lib/utils/training_utils.py:42-110`), K = 41.
    """

    images: jax.Array     # [B, H, W, 3] f32 full frames in [0, 1]
    boxes: jax.Array      # [B, O, 4] pixel xyxy
    obj_mask: jax.Array   # [B, O] bool slot validity
    prior_uv: jax.Array   # [B, O, K, 2] NDC prior keypoints (for rendering)
    prior_mask: jax.Array  # [B, O, K] bool
    uv_gt: jax.Array      # [B, O, K, 2] NDC targets
    kp_mask: jax.Array    # [B, O, K] bool labeled-channel mask


def make_optimizer(lr: float = 1e-3) -> optax.GradientTransformation:
    """Adam(lr=1e-3), the reference default (`train.py:276`)."""
    return optax.adam(lr)


def init_state(
    net: PkpNet,
    rng: jax.Array,
    optimizer: optax.GradientTransformation,
    input_hw: tuple[int, int] = (256, 256),
) -> TrainState:
    h, w = input_hw
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = net.init(rng, dummy)
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=rng,
    )


def model_variables(params, batch_stats=None) -> dict:
    v = {"params": params}
    if batch_stats:
        v["batch_stats"] = batch_stats
    return v


def _forward_loss(net, params, batch_stats, batch: Batch, epoch, dropout_rng,
                  train: bool, input_hw: tuple[int, int],
                  do_anneal: bool = True):
    from ..ops import heatmap as hm

    b, o = batch.boxes.shape[:2]
    crops = roi_ops.roi_crop_batch(batch.images, batch.boxes, batch.obj_mask, input_hw)
    crops = crops.reshape((b * o,) + crops.shape[2:])
    phw = net.prior_hw(input_hw)
    prior = hm.render_prior_heatmaps(
        batch.prior_uv.reshape(b * o, -1, 2),
        batch.prior_mask.reshape(b * o, -1),
        hw=phw,
        sigma_px=hm.prior_sigma_for(phw),
    )
    row_mask = batch.obj_mask.reshape(b * o)
    out, updated = net.apply(
        model_variables(params, batch_stats),
        crops,
        prior,
        train=train,
        row_mask=row_mask,
        rngs={"dropout": dropout_rng} if train else None,
        mutable=["batch_stats"] if train else [],
    )
    uv_gt = batch.uv_gt.reshape(b * o, -1, 2)
    # labeled channels of real (non-padded) object slots only
    kp_mask = (batch.kp_mask & batch.obj_mask[..., None]).reshape(b * o, -1)
    loss, aux = losses.total_loss(
        out.uv, out.cov, out.prob, out.kp_mask_logits, uv_gt, kp_mask, epoch,
        do_anneal=do_anneal,
    )
    return loss, (aux, updated.get("batch_stats", batch_stats))


def make_train_step(net: PkpNet, optimizer: optax.GradientTransformation,
                    input_hw: tuple[int, int] = (256, 256),
                    do_anneal: bool = True):
    """Returns a jittable (state, batch, epoch) -> (state, metrics) step.

    `do_anneal=False` pins var/mask loss weights to 1 (the reference does
    this when starting from `--pretrain`, `train.py:333-334,70-84`).
    """

    def step(state: TrainState, batch: Batch, epoch: jax.Array):
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(p):
            return _forward_loss(net, p, state.batch_stats, batch, epoch,
                                 dropout_rng, True, input_hw, do_anneal)

        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(aux, loss=loss)
        return TrainState(params, new_stats, opt_state, state.step + 1, rng), metrics

    return step


def make_eval_step(net: PkpNet, input_hw: tuple[int, int] = (256, 256),
                   do_anneal: bool = True):
    def step(params, batch_stats, batch: Batch, epoch: jax.Array):
        loss, (aux, _) = _forward_loss(
            net, params, batch_stats, batch, epoch, jax.random.PRNGKey(0),
            False, input_hw, do_anneal
        )
        return dict(aux, loss=loss)

    return step


# ---------------------------------------------------------------------------
# Data-parallel placement over a mesh
# ---------------------------------------------------------------------------

def data_parallel_mesh(devices=None) -> Mesh:
    from ..parallel.mesh import data_parallel_mesh as _dp

    return _dp(devices)


def batch_sharding(mesh: Mesh) -> Batch:
    """PartitionSpecs sharding the leading batch axis of every Batch leaf."""
    s = NamedSharding(mesh, P("data"))
    return Batch(*(s for _ in Batch._fields))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_sharded_train_step(net, optimizer, mesh: Mesh,
                            input_hw: tuple[int, int] = (256, 256),
                            do_anneal: bool = True):
    """jit the train step with params replicated and batch sharded on `data`.

    XLA turns the grad reduction into a psum over ICI (the TPU-native
    equivalent of DataParallel's gather, `training_utils.py:36-40`).
    """
    step = make_train_step(net, optimizer, input_hw, do_anneal)
    rep = replicated(mesh)
    state_shard = TrainState(params=rep, batch_stats=rep, opt_state=rep,
                             step=rep, rng=rep)
    return jax.jit(
        step,
        in_shardings=(state_shard, batch_sharding(mesh), rep),
        out_shardings=(state_shard, rep),
        donate_argnums=(0,),
    )
