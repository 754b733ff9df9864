"""Device-mesh parallelism: data-parallel training and sharded inference.

The reference's only parallelism is single-process multi-GPU
`torch.nn.DataParallel` with a custom kwarg scatterer
(`lib/utils/training_utils.py:5-40`). The TPU-native equivalent here is a
`jax.sharding.Mesh` + NamedSharding placement: the batch axis shards over the
`data` mesh axis, params replicate, and XLA inserts the gradient all-reduce
(psum) over ICI — no NCCL, no process groups, works identically on one host
with 8 chips or on a multi-host slice.

`make_sharded_inference` is the serving-side analogue: a jitted PkpNet
forward whose object-crop batch shards across the mesh, for offline bulk
keypoint extraction at pod scale.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices).reshape(-1), axis_names=(axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, pytree, axis: str = "data"):
    """Place every leaf of a batch pytree with its leading axis sharded."""
    s = batch_sharded(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), pytree)


def pad_to_multiple(x: np.ndarray, m: int):
    """Pad the leading axis to a multiple of m (returns padded, true_n)."""
    n = x.shape[0]
    r = (-n) % m
    if r == 0:
        return x, n
    pad = np.zeros((r,) + x.shape[1:], x.dtype)
    return np.concatenate([x, pad]), n


def make_sharded_inference(net, variables, mesh: Mesh, input_hw=(256, 256)):
    """Jitted PkpNet forward with the crop batch sharded over the mesh.

    variables: full flax variables dict (a bare params tree is wrapped).
    Returns fn(images_roi [N, H, W, 3], prior [N, ph, pw, K]) ->
    (uv, cov, kp_mask) with N divisible by the mesh size (use
    `pad_to_multiple`).
    """
    if "params" not in variables:
        variables = {"params": variables}
    rep = replicated(mesh)
    shd = batch_sharded(mesh)
    variables = jax.device_put(variables, rep)

    @jax.jit
    def fwd(images_roi, prior):
        out = net.apply(variables, images_roi, prior)
        return out.uv, out.cov, out.kp_mask

    def fn(images_roi, prior):
        images_roi = jax.device_put(images_roi, shd)
        prior = jax.device_put(prior, shd)
        return fwd(images_roi, prior)

    return fn
