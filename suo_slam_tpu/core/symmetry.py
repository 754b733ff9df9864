"""Object symmetry handling.

BOP `models_info.json` lists discrete symmetries as 4x4 transforms and
continuous symmetries as (axis, offset). Like the reference
(`lib/datasets/bop.py:310-353`) we discretize each continuous symmetry into
64 steps and prepend the identity, producing a fixed per-object stack of
candidate transforms.

`pick_symmetry_transform` selects, for a GT pose T_OtoC, the symmetry T_s
minimizing the mean distance between the (mean-subtracted) keypoints
projected via T_OtoC @ T_s and via the labeled view pose
(`lib/datasets/bop.py:358-385`). Here it is a single vmapped argmin instead
of a Python loop, and works over a padded [S_max, 4, 4] stack with a
validity mask so it can live inside jit.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import lie

N_DISCRETIZE = 64  # continuous-symmetry discretization steps (reference value)


def build_symmetry_stack(info: dict, n_discretize: int = N_DISCRETIZE) -> np.ndarray:
    """Build the [S, 4, 4] discrete symmetry stack for one object.

    `info` is one entry of BOP models_info.json. Identity is always first
    (BOP omits it from the file).
    """
    syms = [np.eye(4)]
    for sym in info.get("symmetries_discrete", []):
        syms.append(np.asarray(sym, dtype=np.float64).reshape(4, 4))
    for sym in info.get("symmetries_continuous", []):
        axis = np.asarray(sym["axis"], dtype=np.float64).reshape(3)
        offset = np.asarray(sym["offset"], dtype=np.float64).reshape(3)
        assert np.allclose(offset, 0), "Only zero-offset continuous symmetries supported"
        assert axis.sum() == 1, "Only axis-aligned continuous symmetries supported"
        for n in range(n_discretize):
            euler = axis * 360.0 * n / n_discretize
            T = np.eye(4)
            T[:3, :3] = np.asarray(lie.euler2R(jnp.asarray(euler)))
            syms.append(T)
    return np.stack(syms).astype(np.float64)


def pad_symmetry_stack(syms: np.ndarray, s_max: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad [S, 4, 4] -> ([s_max, 4, 4], [s_max] bool valid). Pads with I."""
    s = syms.shape[0]
    assert s <= s_max, f"Need s_max >= {s}"
    out = np.tile(np.eye(4), (s_max, 1, 1))
    out[:s] = syms
    valid = np.zeros((s_max,), dtype=bool)
    valid[:s] = True
    return out, valid


def pick_symmetry_transform(
    T_OtoC: jax.Array,
    syms: jax.Array,
    sym_valid: jax.Array,
    kp_avg: jax.Array,
    T_VtoC: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Pick the symmetry closest to the labeled view pose.

    Args:
      T_OtoC: [4, 4] (or [3, 4]) GT object->camera pose.
      syms: [S, 4, 4] padded symmetry stack.
      sym_valid: [S] bool.
      kp_avg: [N, 3] labeled 3D keypoints (object frame).
      T_VtoC: [4, 4] labeled view pose.
    Returns:
      (T_OtoC @ T_best [4, 4], best index). Jit/vmap friendly.
    """
    from . import geometry

    T_OtoC = lie.to_4x4(T_OtoC)

    def mean_sub(p):
        return p - jnp.mean(p, axis=0, keepdims=True)

    ref = mean_sub(geometry.transform_pts(T_VtoC, kp_avg))

    def dist_for(T_sym):
        p = mean_sub(geometry.transform_pts(T_OtoC @ T_sym, kp_avg))
        return jnp.mean(jnp.linalg.norm(p - ref, axis=-1))

    dists = jax.vmap(dist_for)(syms)
    dists = jnp.where(sym_valid, dists, jnp.inf)
    i_best = jnp.argmin(dists)
    return T_OtoC @ syms[i_best], i_best
