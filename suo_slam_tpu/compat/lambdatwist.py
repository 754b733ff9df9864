"""Drop-in for the reference's `lambdatwist` pybind module.

Signature and contract match `thirdparty/lambdatwist/pnp_python_binding.cpp:
32-61`: ``pnp(xs_in, ys_in, threshold=0.001)`` takes [N,3] model points and
[N,2] PINHOLE-NORMALIZED image points and returns a 4x4 ``T`` mapping model
points into the camera frame — the 4x4 IDENTITY signals failure (the
reference caller tests ``np.allclose(res, np.eye(4))``,
`lib/object_slam.py:37-41`).

Backed by `solvers/pnp.py` (vectorized-hypothesis LambdaTwist P4P RANSAC +
damped GN refine). Point counts are padded to power-of-two buckets so the
jitted solve compiles a handful of shapes, not one per call.
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..solvers import pnp as pnp_mod

_call_counter = itertools.count()


@partial(jax.jit, static_argnames=("n_hyp",))
def _pnp_jit(x, y, mask, key, threshold, n_hyp=pnp_mod.DEFAULT_HYPOTHESES):
    return pnp_mod.pnp_ransac(x, y, mask, key, threshold=threshold,
                              n_hyp=n_hyp)


def pnp(xs_in, ys_in, threshold: float = 0.001) -> np.ndarray:
    """RANSAC PnP; returns 4x4 T_model_to_cam, identity on failure."""
    x = np.asarray(xs_in, np.float32)
    y = np.asarray(ys_in, np.float32)
    if x.ndim != 2 or x.shape[1] != 3 or y.shape != (x.shape[0], 2):
        raise ValueError(f"pnp: bad shapes {x.shape} / {y.shape}")
    n = x.shape[0]
    if n < 4:
        return np.eye(4)
    nb = max(8, 1 << (n - 1).bit_length())
    xp = np.zeros((nb, 3), np.float32)
    yp = np.zeros((nb, 2), np.float32)
    m = np.zeros((nb,), bool)
    xp[:n], yp[:n], m[:n] = x, y, True
    # fresh hypotheses per call, deterministic per process (the reference
    # binding reseeds its RNG per call with srand)
    key = jax.random.fold_in(jax.random.PRNGKey(7), next(_call_counter))
    res = _pnp_jit(jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(m), key,
                   jnp.asarray(threshold, jnp.float32))
    if not bool(res.success):
        return np.eye(4)
    return np.asarray(res.T, np.float64)
