"""Batched closed-form P3P (LambdaTwist method) in pure JAX.

Implements the Persson & Nordberg ECCV'18 "Lambda Twist" algorithm — the same
method as the reference's native solver (`thirdparty/lambdatwist/lambdatwist/
lambdatwist.p3p.h`, `solve_cubic.h`, `solve_eig0.h`, `refine_lambda.h`) — but
re-derived as a branch-free, fixed-shape program:

- data-dependent `if`s become `jnp.where` masks,
- the early-exit Newton loops become fixed-trip `lax.fori_loop`s with
  monotone step acceptance,
- all 4 candidate solutions are computed unconditionally with validity masks,

so the whole solver `vmap`s over RANSAC hypotheses and jits onto TPU without
host round-trips. Works in f32 (TPU) or f64 (CPU oracle tests); callers should
precondition 3D points (centroid/scale normalize) for f32, see
`suo_slam_tpu/solvers/pnp.py`.

Math outline: with bearing vectors y_i and 3D points x_i, find depths
lambda_i with |lambda_i y_i - lambda_j y_j|^2 = |x_i - x_j|^2. This reduces to
finding a root gamma of a cubic (the pencil of two conics), an eigendecomp of
a 3x3 with a known zero eigenvalue, two quadratics (4 lambda candidates), a
Gauss-Newton polish of lambda, and an absolute-orientation recovery of (R, t).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

CUBIC_ITERS = 50
REFINE_ITERS = 5


def _root2real(b: jax.Array, c: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Roots of x^2 + b x + c. Returns (r1, r2, real_mask); stable form."""
    v = b * b - 4.0 * c
    ok = v >= 0
    y = jnp.sqrt(jnp.maximum(v, 0.0))
    # avoid catastrophic cancellation: pick the stable formula by sign of b
    denom_p = jnp.where(jnp.abs(-b + y) < 1e-30, 1e-30, -b + y)
    denom_m = jnp.where(jnp.abs(-b - y) < 1e-30, 1e-30, -b - y)
    r1 = jnp.where(b < 0, 0.5 * (-b + y), 2.0 * c / denom_p)
    r2 = jnp.where(b < 0, 0.5 * (-b - y), 2.0 * c / denom_m)
    return r1, r2, ok


def _cubick(b: jax.Array, c: jax.Array, d: jax.Array) -> jax.Array:
    """One real root of r^3 + b r^2 + c r + d, picked at max |h'| for
    stability (cf. `solve_cubic.h:cubick`): smart init + Newton iterations."""
    # Init: if there are two stationary points, second-order approx around
    # whichever side keeps the root bracketed; else start near the inflection.
    disc = b * b - 3.0 * c
    has_stat = disc >= 0
    v = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - v) / 3.0
    k1 = ((t1 + b) * t1 + c) * t1 + d
    t2 = (-b + v) / 3.0
    k2 = ((t2 + b) * t2 + c) * t2 + d
    # guards: 3*t1 + b = -v <= 0 ; 3*t2 + b = v >= 0
    r0_left = t1 - jnp.sqrt(jnp.maximum(-k1 / jnp.where(jnp.abs(3.0 * t1 + b) < 1e-30, -1e-30, 3.0 * t1 + b), 0.0))
    r0_right = t2 + jnp.sqrt(jnp.maximum(-k2 / jnp.where(jnp.abs(3.0 * t2 + b) < 1e-30, 1e-30, 3.0 * t2 + b), 0.0))
    r0_stat = jnp.where(k1 > 0, r0_left, r0_right)
    r0_mono = -b / 3.0
    dh = (3.0 * r0_mono + 2.0 * b) * r0_mono + c
    r0_mono = jnp.where(jnp.abs(dh) < 1e-4, r0_mono + 1.0, r0_mono)
    r0 = jnp.where(has_stat, r0_stat, r0_mono)

    def body(_, r):
        fx = ((r + b) * r + c) * r + d
        fpx = (3.0 * r + 2.0 * b) * r + c
        fpx = jnp.where(jnp.abs(fpx) < 1e-30, 1e-30, fpx)
        return r - fx / fpx

    return jax.lax.fori_loop(0, CUBIC_ITERS, body, r0)


def _eig_with_known_0(A: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Eigendecomposition of a symmetric 3x3 with one known zero eigenvalue.

    Returns (E [3,3] eigenvectors as columns, L [3] eigenvalues) with
    |L0| >= |L1|, L2 = 0 (cf. `solve_eig0.h:eigwithknown0`).
    """
    # null vector = cross of two columns
    v3 = jnp.stack(
        [
            A[1, 0] * A[2, 1] - A[2, 0] * A[1, 1],
            A[2, 0] * A[0, 1] - A[2, 1] * A[0, 0],
            A[1, 1] * A[0, 0] - A[1, 0] * A[0, 1],
        ]
    )
    v3 = v3 / jnp.linalg.norm(v3)
    x01_sq = A[0, 1] * A[0, 1]
    b = -A[0, 0] - A[1, 1] - A[2, 2]
    c = (
        -x01_sq
        - A[0, 2] * A[0, 2]
        - A[1, 2] * A[1, 2]
        + A[0, 0] * (A[1, 1] + A[2, 2])
        + A[1, 1] * A[2, 2]
    )
    e1, e2, _ = _root2real(b, c)
    swap = jnp.abs(e1) < jnp.abs(e2)
    e1, e2 = jnp.where(swap, e2, e1), jnp.where(swap, e1, e2)

    mx0011 = -A[0, 0] * A[1, 1]
    prec_0 = A[0, 1] * A[1, 2] - A[0, 2] * A[1, 1]
    prec_1 = A[0, 1] * A[0, 2] - A[0, 0] * A[1, 2]

    def eigvec(e):
        tmp_d = e * (A[0, 0] + A[1, 1]) + mx0011 - e * e + x01_sq
        tmp = 1.0 / jnp.where(jnp.abs(tmp_d) < 1e-30, 1e-30, tmp_d)
        a1 = -(e * A[0, 2] + prec_0) * tmp
        a2 = -(e * A[1, 2] + prec_1) * tmp
        rnorm = 1.0 / jnp.sqrt(a1 * a1 + a2 * a2 + 1.0)
        return jnp.stack([a1 * rnorm, a2 * rnorm, rnorm])

    v1 = eigvec(e1)
    v2 = eigvec(e2)
    E = jnp.stack([v1, v2, v3], axis=1)
    L = jnp.stack([e1, e2, jnp.zeros_like(e1)])
    return E, L


def _gauss_newton_refine_L(
    L: jax.Array, a12, a13, a23, b12, b13, b23, iters: int = REFINE_ITERS
) -> jax.Array:
    """Polish lambda on the 3 distance constraints with monotone-accepted GN
    steps (cf. `refine_lambda.h:gauss_newton_refineL`)."""

    def residuals(L):
        l1, l2, l3 = L[0], L[1], L[2]
        r1 = l1 * l1 + l2 * l2 + b12 * l1 * l2 - a12
        r2 = l1 * l1 + l3 * l3 + b13 * l1 * l3 - a13
        r3 = l2 * l2 + l3 * l3 + b23 * l2 * l3 - a23
        return jnp.stack([r1, r2, r3])

    def body(_, L):
        l1, l2, l3 = L[0], L[1], L[2]
        r = residuals(L)
        # Jacobian has a fixed sparsity; explicit inverse of the 3x3
        dr1dl1 = 2.0 * l1 + b12 * l2
        dr1dl2 = 2.0 * l2 + b12 * l1
        dr2dl1 = 2.0 * l1 + b13 * l3
        dr2dl3 = 2.0 * l3 + b13 * l1
        dr3dl2 = 2.0 * l2 + b23 * l3
        dr3dl3 = 2.0 * l3 + b23 * l2
        det_d = -dr1dl1 * dr2dl3 * dr3dl2 - dr1dl2 * dr2dl1 * dr3dl3
        det = 1.0 / jnp.where(jnp.abs(det_d) < 1e-30, 1e-30, det_d)
        Ji = jnp.array(
            [
                [-dr2dl3 * dr3dl2, -dr1dl2 * dr3dl3, dr1dl2 * dr2dl3],
                [-dr2dl1 * dr3dl3, dr1dl1 * dr3dl3, -dr1dl1 * dr2dl3],
                [dr2dl1 * dr3dl2, -dr1dl1 * dr3dl2, -dr1dl2 * dr2dl1],
            ]
        )
        L_new = L - det * (Ji @ r)
        # accept only improving steps
        better = jnp.sum(jnp.abs(residuals(L_new))) <= jnp.sum(jnp.abs(r))
        return jnp.where(better, L_new, L)

    return jax.lax.fori_loop(0, iters, body, L)


@partial(jax.jit, static_argnames=())
def p3p(y: jax.Array, x: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Solve P3P for one triple.

    Args:
      y: [3, 3] bearing vectors (rows; homogeneous image points, any scale).
      x: [3, 3] corresponding 3D points (rows).
    Returns:
      Rs [4, 3, 3], ts [4, 3], valid [4] bool — up to four camera poses with
      lambda_i y_i = R x_i + t. Invalid slots contain identity poses.
    """
    dtype = jnp.result_type(y.dtype, x.dtype)
    y = y.astype(dtype)
    x = x.astype(dtype)
    y1 = y[0] / jnp.linalg.norm(y[0])
    y2 = y[1] / jnp.linalg.norm(y[1])
    y3 = y[2] / jnp.linalg.norm(y[2])

    b12 = -2.0 * jnp.dot(y1, y2)
    b13 = -2.0 * jnp.dot(y1, y3)
    b23 = -2.0 * jnp.dot(y2, y3)

    d12 = x[0] - x[1]
    d13 = x[0] - x[2]
    d12xd13 = jnp.cross(d12, d13)
    a12 = jnp.dot(d12, d12)
    a13 = jnp.dot(d13, d13)
    a23 = jnp.dot(x[1] - x[2], x[1] - x[2])

    # cubic for gamma
    c31 = -0.5 * b13
    c23 = -0.5 * b23
    c12 = -0.5 * b12
    blob = c12 * c23 * c31 - 1.0
    s31_sq = 1.0 - c31 * c31
    s23_sq = 1.0 - c23 * c23
    s12_sq = 1.0 - c12 * c12
    p3 = a13 * (a23 * s31_sq - a13 * s23_sq)
    p2 = 2.0 * blob * a23 * a13 + a13 * (2.0 * a12 + a13) * s23_sq + a23 * (a23 - a12) * s31_sq
    p1 = a23 * (a13 - a23) * s12_sq - a12 * a12 * s23_sq - 2.0 * a12 * (blob * a23 + a13 * s23_sq)
    p0 = a12 * (a12 * s23_sq - a23 * s12_sq)
    ip3 = 1.0 / jnp.where(jnp.abs(p3) < 1e-30, 1e-30, p3)
    g = _cubick(p2 * ip3, p1 * ip3, p0 * ip3)

    # conic pencil matrix at gamma
    A00 = a23 * (1.0 - g)
    A01 = (a23 * b12) * 0.5
    A02 = (a23 * b13 * g) * (-0.5)
    A11 = a23 - a12 + a13 * g
    A12 = b23 * (a13 * g - a12) * 0.5
    A22 = g * (a13 - a23) - a12
    A = jnp.array([[A00, A01, A02], [A01, A11, A12], [A02, A12, A22]])
    E, L = _eig_with_known_0(A)
    L0 = jnp.where(jnp.abs(L[0]) < 1e-30, 1e-30, L[0])
    v = jnp.sqrt(jnp.maximum(0.0, -L[1] / L0))

    def branch(s):
        """Candidates for one sign of v. Returns (Ls [2, 3], valid [2])."""
        w2_d = s * E[0, 1] - E[0, 0]
        w2 = 1.0 / jnp.where(jnp.abs(w2_d) < 1e-30, 1e-30, w2_d)
        w0 = (E[1, 0] - s * E[1, 1]) * w2
        w1 = (E[2, 0] - s * E[2, 1]) * w2
        a_d = (a13 - a12) * w1 * w1 - a12 * b13 * w1 - a12
        a = 1.0 / jnp.where(jnp.abs(a_d) < 1e-30, 1e-30, a_d)
        b = (a13 * b12 * w1 - a12 * b13 * w0 - 2.0 * w0 * w1 * (a12 - a13)) * a
        c = ((a13 - a12) * w0 * w0 + a13 * b12 * w0 + a13) * a
        tau1, tau2, real = _root2real(b, c)

        def lam_for(tau):
            tau_ok = tau > 0
            tau_safe = jnp.where(tau_ok, tau, 1.0)
            d_ = a23 / (tau_safe * (b23 + tau_safe) + 1.0)
            d_ok = d_ > 0
            l2 = jnp.sqrt(jnp.maximum(d_, 0.0))
            l3 = tau_safe * l2
            l1 = w0 * l2 + w1 * l3
            ok = real & tau_ok & d_ok & (l1 >= 0)
            return jnp.stack([l1, l2, l3]), ok

        L1, ok1 = lam_for(tau1)
        L2, ok2 = lam_for(tau2)
        return jnp.stack([L1, L2]), jnp.stack([ok1, ok2])

    Ls_p, ok_p = branch(v)
    Ls_m, ok_m = branch(-v)
    Ls = jnp.concatenate([Ls_p, Ls_m])  # [4, 3]
    ok = jnp.concatenate([ok_p, ok_m])  # [4]

    Ls = jax.vmap(lambda Li: _gauss_newton_refine_L(Li, a12, a13, a23, b12, b13, b23))(Ls)

    # absolute orientation: R [d12 d13 d12xd13] = [yd1 yd2 yd1xyd2]
    # Closed-form adjugate inverse: jnp.linalg.inv on a 3x3 lowers to a
    # batched LuDecomposition custom call under vmap — ~0.4 ms/frame for
    # the [O, n_hyp] hypothesis batch on v5e (device trace), vs a handful
    # of fused elementwise ops here.
    X = jnp.stack([d12, d13, d12xd13], axis=1)
    c0 = jnp.cross(X[1], X[2])
    c1 = jnp.cross(X[2], X[0])
    c2 = jnp.cross(X[0], X[1])
    detX = jnp.dot(X[0], c0)
    idet = 1.0 / jnp.where(jnp.abs(detX) < 1e-30, 1e-30, detX)
    Xinv = jnp.stack([c0, c1, c2], axis=1) * idet

    def recover(Li, ok_i):
        ry1 = y1 * Li[0]
        ry2 = y2 * Li[1]
        ry3 = y3 * Li[2]
        yd1 = ry1 - ry2
        yd2 = ry1 - ry3
        yd1xd2 = jnp.cross(yd1, yd2)
        Y = jnp.stack([yd1, yd2, yd1xd2], axis=1)
        R = Y @ Xinv
        t = ry1 - R @ x[0]
        finite = jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t))
        valid = ok_i & finite
        R = jnp.where(valid, R, jnp.eye(3, dtype=dtype))
        t = jnp.where(valid, t, jnp.zeros(3, dtype=dtype))
        return R, t, valid

    Rs, ts, valid = jax.vmap(recover)(Ls, ok)
    return Rs, ts, valid


def p4p(y4: jax.Array, x4: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """P3P on points 0..2 disambiguated by point 3 (cf. `p4p.cpp:11-69`).

    Args:
      y4: [4, 2] pinhole-normalized image points.
      x4: [4, 3] 3D points.
    Returns:
      (T [4, 4] camera-from-model pose, err scalar squared reprojection error
      of the 4th point, valid bool). Identity + inf on failure.
    """
    dtype = jnp.result_type(y4.dtype, x4.dtype)
    ones = jnp.ones((3, 1), dtype=dtype)
    Rs, ts, valid = p3p(jnp.concatenate([y4[:3].astype(dtype), ones], axis=1), x4[:3])

    def score(R, t, ok):
        xr = R @ x4[3] + t
        z_ok = xr[2] > 0
        iz = 1.0 / jnp.where(jnp.abs(xr[2]) < 1e-30, 1e-30, xr[2])
        e = (xr[0] * iz - y4[3, 0]) ** 2 + (xr[1] * iz - y4[3, 1]) ** 2
        # orthonormality sanity (the native code renormalizes via quaternion;
        # we just reject badly non-orthonormal Rs)
        RtR = R.T @ R
        ortho = jnp.max(jnp.abs(RtR - jnp.eye(3, dtype=dtype))) < 1e-2
        good = ok & z_ok & ortho & jnp.isfinite(e)
        return jnp.where(good, e, jnp.inf)

    errs = jax.vmap(score)(Rs, ts, valid)
    i = jnp.argmin(errs)
    best_ok = jnp.isfinite(errs[i])
    R = jnp.where(best_ok, Rs[i], jnp.eye(3, dtype=dtype))
    t = jnp.where(best_ok, ts[i], jnp.zeros(3, dtype=dtype))
    T = jnp.eye(4, dtype=dtype).at[:3, :3].set(R).at[:3, 3].set(t)
    return T, errs[i], best_ok
