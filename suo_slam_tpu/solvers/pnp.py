"""Vectorized PnP RANSAC with on-device Gauss-Newton refinement.

TPU-native replacement for the reference's native PnP stack
(`thirdparty/lambdatwist/pnp_ransac.cpp`): instead of a sequential
adaptive-iteration RANSAC loop with early-exit inlier counting
(`pnp_ransac.cpp:41-96,188-230`) and two Ceres refinement solves
(`pnp_ransac.cpp:240-330`), we

  1. draw a fixed batch of S 4-point hypotheses at once,
  2. solve all of them with a vmapped P4P (`solvers/p3p.py`),
  3. score every hypothesis against every point in one batched einsum,
  4. polish the winner with a fixed-iteration damped Gauss-Newton on the
     truncated-inlier set, re-selecting inliers between two rounds exactly
     like the reference's two-pass Ceres refine.

Everything is static-shape: callers pass a padded [N, ...] point set with a
validity mask, so the kernel vmaps over objects in a frame. The public
contract matches the reference wrapper `lib/object_slam.py:25-41`:
pinhole-normalized image points, threshold in normalized units (default
0.001 ~ 1-3 px, `parameters.h:34`), identity returned on failure.

f32 robustness: 3D points are centroid/scale preconditioned before the P3P
cubic+eig (whose conditioning depends on point-set scale), and the result is
un-preconditioned analytically. This keeps the solver accurate in f32 on TPU
while f64 remains available on CPU.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from . import p3p as p3p_mod

DEFAULT_HYPOTHESES = 128
DEFAULT_THRESHOLD = 1e-3
REFINE_GN_ITERS = 8


class PnpResult(NamedTuple):
    T: jax.Array        # [4, 4] camera-from-model pose (identity on failure)
    inliers: jax.Array  # [N] bool inlier mask (under `threshold`)
    num_inliers: jax.Array  # scalar int
    success: jax.Array  # scalar bool


def _precondition(x: jax.Array, mask: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Center + scale 3D points to unit RMS over the valid set."""
    m = mask.astype(x.dtype)[..., None]
    n = jnp.maximum(jnp.sum(m), 1.0)
    c = jnp.sum(x * m, axis=0) / n
    xc = (x - c) * m
    s = jnp.sqrt(jnp.maximum(jnp.sum(xc * xc) / n, 1e-12))
    return (x - c) / s, c, s


def _unprecondition(T: jax.Array, c: jax.Array, s: jax.Array) -> jax.Array:
    """If T maps x' = (x - c)/s to camera rays, the pose for raw x is
    (R, s t - R c) — projection is invariant to positive depth scaling."""
    R = T[:3, :3]
    t = s * T[:3, 3] - R @ c
    return T.at[:3, 3].set(t)


def _reproj_sq_err(T: jax.Array, x: jax.Array, y: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Squared normalized-plane reprojection error for all points.

    Returns (err_sq [N], z [N]). Behind-camera points get +inf error, like the
    native inlier counter (`pnp_ransac.cpp:69-75`).
    """
    p = x @ T[:3, :3].T + T[:3, 3]
    z = p[..., 2]
    iz = 1.0 / jnp.where(jnp.abs(z) < 1e-30, 1e-30, z)
    du = p[..., 0] * iz - y[..., 0]
    dv = p[..., 1] * iz - y[..., 1]
    err = du * du + dv * dv
    return jnp.where(z > 0, err, jnp.inf), z


def _inv3(M):
    """Closed-form 3x3 inverse (adjugate over determinant) — avoids the
    LuDecomposition custom call jnp.linalg lowers to, which dominated the
    vmapped GN refine's device profile."""
    c0 = jnp.cross(M[1], M[2])
    c1 = jnp.cross(M[2], M[0])
    c2 = jnp.cross(M[0], M[1])
    det = jnp.dot(M[0], c0)
    idet = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    return jnp.stack([c0, c1, c2], axis=1) * idet


def _solve6_spd(H, g):
    """Solve the (damped, SPD) 6x6 normal equations by 3x3-blocked Schur
    elimination with closed-form 3x3 inverses — a handful of fused
    elementwise/matmul ops instead of a batched LU custom call."""
    A, B, D = H[:3, :3], H[:3, 3:], H[3:, 3:]
    Ai = _inv3(A)
    S = D - B.T @ (Ai @ B)
    Si = _inv3(S)
    g1, g2 = g[:3], g[3:]
    x2 = Si @ (g2 - B.T @ (Ai @ g1))
    x1 = Ai @ (g1 - B @ x2)
    return jnp.concatenate([x1, x2])


def _gn_refine(
    T0: jax.Array,
    x: jax.Array,
    y: jax.Array,
    w: jax.Array,
    iters: int = REFINE_GN_ITERS,
) -> jax.Array:
    """Damped Gauss-Newton on SE(3) (left-multiplicative update) minimizing
    the weighted normalized reprojection error. Replaces the Ceres quaternion
    autodiff solve (`pnp_ransac.cpp:240-330`) with fixed iterations.

    w: [N] per-point weights (0 masks a point out).
    """
    dtype = T0.dtype

    def step(T, lm_lambda):
        R, t = T[:3, :3], T[:3, 3]
        p = x @ R.T + t  # [N, 3]
        z = p[..., 2]
        safe_z = jnp.where(jnp.abs(z) < 1e-30, 1e-30, z)
        iz = 1.0 / safe_z
        u = p[..., 0] * iz
        v = p[..., 1] * iz
        r = jnp.stack([u - y[..., 0], v - y[..., 1]], axis=-1)  # [N, 2]
        # d(uv)/dp
        zeros = jnp.zeros_like(iz)
        Jproj = jnp.stack(
            [
                jnp.stack([iz, zeros, -u * iz], -1),
                jnp.stack([zeros, iz, -v * iz], -1),
            ],
            axis=-2,
        )  # [N, 2, 3]
        # dp/d[omega, v] for T <- exp(delta) T: dp = -hat(p) w + v
        Jp = jnp.concatenate([-lie.hat(p), jnp.broadcast_to(jnp.eye(3, dtype=dtype), p.shape[:-1] + (3, 3))], axis=-1)  # [N, 3, 6]
        J = Jproj @ Jp  # [N, 2, 6]
        wz = w * (z > 0)  # never pull behind-camera points
        JW = J * wz[..., None, None]
        H = jnp.einsum("nik,nil->kl", JW, J)
        g = jnp.einsum("nik,ni->k", JW, r)
        H = H + lm_lambda * jnp.eye(6, dtype=dtype) * jnp.maximum(jnp.trace(H) / 6.0, 1e-12)
        delta = -_solve6_spd(H, g)
        T_new = lie.se3_exp(delta) @ T
        cost = jnp.sum(wz * jnp.sum(r * r, -1))
        p2 = x @ T_new[:3, :3].T + T_new[:3, 3]
        z2 = p2[..., 2]
        iz2 = 1.0 / jnp.where(jnp.abs(z2) < 1e-30, 1e-30, z2)
        r2 = jnp.stack([p2[..., 0] * iz2 - y[..., 0], p2[..., 1] * iz2 - y[..., 1]], -1)
        cost2 = jnp.sum(wz * jnp.sum(r2 * r2, -1))
        ok = (cost2 < cost) & jnp.all(jnp.isfinite(T_new))
        T = jnp.where(ok, T_new, T)
        lm_lambda = jnp.where(ok, lm_lambda * 0.33, lm_lambda * 4.0)
        return T, lm_lambda

    def body(_, carry):
        return step(*carry)

    T, _ = jax.lax.fori_loop(0, iters, body, (T0, jnp.asarray(1e-4, dtype)))
    return T


def _sample_hypothesis_indices(
    key: jax.Array, mask: jax.Array, n_hyp: int
) -> jax.Array:
    """[n_hyp, 4] distinct indices of valid points (Gumbel top-k trick).

    Contract note: when FEWER than 4 points are valid, the exhausted rows
    all return index 0 (every score is -inf, argmax ties to 0) — i.e. the
    indices are NOT distinct in that case, unlike the earlier lax.top_k
    variant. `pnp_ransac` is safe because it gates on `feasible = n_valid
    >= 4` before trusting any hypothesis; any new caller must keep an
    equivalent guard.
    """
    n = mask.shape[0]
    gumbel = jax.random.gumbel(key, (n_hyp, n))
    scores = jnp.where(mask[None, :], gumbel, -jnp.inf)
    # 4 iterated argmaxes instead of lax.top_k: identical selection (and
    # order) for distinct scores, but avoids the sort custom-call that
    # dominated the pnp_frame device profile (~0.4 ms/frame on v5e).
    idxs = []
    for _ in range(4):
        i = jnp.argmax(scores, axis=-1)
        idxs.append(i)
        scores = jnp.where(
            jax.nn.one_hot(i, n, dtype=bool), -jnp.inf, scores
        )
    return jnp.stack(idxs, axis=-1)


@partial(jax.jit, static_argnames=("n_hyp", "refine"))
def pnp_ransac(
    x: jax.Array,
    y: jax.Array,
    mask: jax.Array,
    key: jax.Array,
    threshold: float | jax.Array = DEFAULT_THRESHOLD,
    n_hyp: int = DEFAULT_HYPOTHESES,
    refine: bool = True,
) -> PnpResult:
    """Robust PnP from padded correspondences.

    Args:
      x: [N, 3] model points (padded).
      y: [N, 2] pinhole-normalized image points.
      mask: [N] bool validity of each correspondence.
      key: PRNG key for hypothesis sampling.
      threshold: inlier threshold in normalized image units.
    Returns:
      PnpResult. `success` is False (and T identity) when fewer than 4 valid
      points, no hypothesis reaches 4 inliers, or the solve degenerates —
      the same failure contract as the reference (`lib/object_slam.py:31-41`).
    """
    dtype = x.dtype
    n = x.shape[0]
    mask = mask.astype(bool)
    n_valid = jnp.sum(mask)
    feasible = n_valid >= 4

    xp, c, s = _precondition(x, mask)
    thr_sq = jnp.asarray(threshold, dtype) ** 2

    idx = _sample_hypothesis_indices(key, mask, n_hyp)  # [n_hyp, 4]
    x4 = xp[idx]  # [n_hyp, 4, 3]
    y4 = y[idx]

    Ts, _, ok = jax.vmap(p3p_mod.p4p)(y4, x4)  # [n_hyp, 4, 4]

    def count_inliers(T, ok_i):
        err, _ = _reproj_sq_err(T, xp, y)
        inl = (err < thr_sq) & mask
        return jnp.where(ok_i, jnp.sum(inl), -1)

    counts = jax.vmap(count_inliers)(Ts, ok)  # [n_hyp]
    best = jnp.argmax(counts)
    T_best = Ts[best]
    best_count = counts[best]
    success = feasible & (best_count >= 4)

    if refine:
        # Two refine rounds with truncated-inlier reselection between them
        # (the reference refines twice with Ceres, reselecting inliers:
        # `pnp_ransac.cpp:240-330`).
        err, _ = _reproj_sq_err(T_best, xp, y)
        w = ((err < thr_sq) & mask).astype(dtype)
        T_ref = _gn_refine(T_best, xp, y, w)
        err2, _ = _reproj_sq_err(T_ref, xp, y)
        w2 = ((err2 < thr_sq) & mask).astype(dtype)
        T_ref = _gn_refine(T_ref, xp, y, w2)
        # keep refinement only if it didn't lose inliers
        err3, _ = _reproj_sq_err(T_ref, xp, y)
        cnt3 = jnp.sum((err3 < thr_sq) & mask)
        use = (cnt3 >= best_count) & jnp.all(jnp.isfinite(T_ref))
        T_best = jnp.where(use, T_ref, T_best)

    T_out = _unprecondition(T_best, c.astype(dtype), s.astype(dtype))
    err_f, _ = _reproj_sq_err(T_out, x, y)
    inliers = (err_f < thr_sq) & mask
    num = jnp.sum(inliers)
    success = success & jnp.all(jnp.isfinite(T_out))
    T_out = jnp.where(success, T_out, jnp.eye(4, dtype=dtype))
    inliers = inliers & success
    return PnpResult(T=T_out, inliers=inliers, num_inliers=jnp.where(success, num, 0), success=success)


def pnp_ransac_batch(
    x: jax.Array, y: jax.Array, mask: jax.Array, key: jax.Array, **kw
) -> PnpResult:
    """vmap of `pnp_ransac` over a leading object axis. x: [O, N, 3] etc."""
    keys = jax.random.split(key, x.shape[0])
    return jax.vmap(lambda xi, yi, mi, ki: pnp_ransac(xi, yi, mi, ki, **kw))(x, y, mask, keys)
