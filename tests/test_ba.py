import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from suo_slam_tpu.core import lie
from suo_slam_tpu.solvers import ba


def make_problem(
    n_views=8,
    n_objs=4,
    n_kp=10,
    V=10,
    O=6,
    K=12,
    noise=0.0,
    outlier_frac=0.0,
    pose_noise=0.0,
    seed=0,
    dtype=np.float64,
    kp_sigma=0.01,
):
    """Random camera trajectory looking at objects near the origin.

    Mirrors the reference's synthetic integration test
    (thirdparty/g2opy/python/examples/object_slam_demo.py): N cameras x
    M objects x K points with noise/outliers, NDC-scale measurements.
    """
    rng = np.random.default_rng(seed)
    # objects scattered near origin (units ~ "mm" scale to stress conditioning)
    obj_T_gt = np.tile(np.eye(4), (O, 1, 1))
    model_kp = np.zeros((O, K, 3))
    for o in range(n_objs):
        obj_T_gt[o, :3, :3] = Rotation.random(random_state=rng).as_matrix()
        obj_T_gt[o, :3, 3] = rng.uniform(-150, 150, 3)
        model_kp[o, :n_kp] = rng.uniform(-40, 40, (n_kp, 3))
    # cameras on a rough arc looking at the origin from ~600mm
    cam_T_gt = np.tile(np.eye(4), (V, 1, 1))
    for v in range(n_views):
        ang = 0.25 * v / max(n_views - 1, 1)
        Rz = Rotation.from_euler("y", ang).as_matrix()
        center = Rz @ np.array([0, 0, -600.0]) + rng.normal(size=3) * 10
        # camera looks toward origin: z axis toward origin
        z = -center / np.linalg.norm(center)
        x = np.cross(np.array([0, 1.0, 0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_wc = np.stack([x, y, z], axis=1)  # world-from-camera
        R_cw = R_wc.T
        cam_T_gt[v, :3, :3] = R_cw
        cam_T_gt[v, :3, 3] = -R_cw @ center
    # first camera is the global frame
    T0_inv = np.linalg.inv(cam_T_gt[0])
    for v in range(n_views):
        cam_T_gt[v] = cam_T_gt[v] @ np.linalg.inv(np.eye(4))
    ref = cam_T_gt[0].copy()
    for v in range(n_views):
        cam_T_gt[v] = cam_T_gt[v] @ np.linalg.inv(ref)
    for o in range(n_objs):
        obj_T_gt[o] = ref @ obj_T_gt[o]

    cam_k = np.zeros((V, O, 4))
    cam_k[..., :2] = 2.0  # NDC-ish focal
    uv = np.zeros((V, O, K, 2))
    info = np.zeros((V, O, K, 2, 2))
    valid = np.zeros((V, O, K), dtype=bool)
    for v in range(n_views):
        for o in range(n_objs):
            p_G = model_kp[o, :n_kp] @ obj_T_gt[o, :3, :3].T + obj_T_gt[o, :3, 3]
            p_C = p_G @ cam_T_gt[v, :3, :3].T + cam_T_gt[v, :3, 3]
            z = p_C[:, 2]
            ok = z > 1.0
            u = cam_k[v, o, 0] * p_C[:, 0] / z + cam_k[v, o, 2]
            vv = cam_k[v, o, 1] * p_C[:, 1] / z + cam_k[v, o, 3]
            uv[v, o, :n_kp] = np.stack([u, vv], -1)
            valid[v, o, :n_kp] = ok
            info[v, o, :, 0, 0] = 1.0 / kp_sigma**2
            info[v, o, :, 1, 1] = 1.0 / kp_sigma**2
    if noise > 0:
        uv += rng.normal(size=uv.shape) * noise
    if outlier_frac > 0:
        out = rng.uniform(size=valid.shape) < outlier_frac
        uv = np.where((out & valid)[..., None], uv + rng.uniform(0.3, 1.0, uv.shape) * np.sign(rng.normal(size=uv.shape)), uv)
        gross_outliers = out & valid
    else:
        gross_outliers = np.zeros_like(valid)

    cam_T0 = cam_T_gt.copy()
    obj_T0 = obj_T_gt.copy()
    if pose_noise > 0:
        for v in range(1, n_views):
            xi = np.concatenate([rng.normal(size=3) * pose_noise, rng.normal(size=3) * pose_noise * 100])
            cam_T0[v] = np.asarray(lie.se3_exp(jnp.asarray(xi))) @ cam_T0[v]
        for o in range(n_objs):
            xi = np.concatenate([rng.normal(size=3) * pose_noise, rng.normal(size=3) * pose_noise * 100])
            obj_T0[o] = np.asarray(lie.se3_exp(jnp.asarray(xi))) @ obj_T0[o]

    cam_active = np.zeros(V, bool)
    cam_active[:n_views] = True
    obj_active = np.zeros(O, bool)
    obj_active[:n_objs] = True
    prob = ba.BAProblem(
        cam_T=jnp.asarray(cam_T0, dtype),
        obj_T=jnp.asarray(obj_T0, dtype),
        uv=jnp.asarray(uv, dtype),
        info=jnp.asarray(info, dtype),
        model_kp=jnp.asarray(model_kp, dtype),
        cam_k=jnp.asarray(cam_k, dtype),
        valid=jnp.asarray(valid),
        inliers=jnp.asarray(valid),
        cam_active=jnp.asarray(cam_active),
        obj_active=jnp.asarray(obj_active),
    )
    return prob, cam_T_gt, obj_T_gt, gross_outliers, (n_views, n_objs, n_kp)


def pose_errs(T_est, T_gt):
    dR = T_est[:3, :3] @ T_gt[:3, :3].T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    return ang, np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3])


def test_analytic_jacobians_match_autodiff():
    """The reference ships a commented-out FD check for its hand-derived g2o
    edge Jacobians (types_object_slam.cpp:109-122); we make it a real test."""
    prob, *_ = make_problem(n_views=2, n_objs=2, n_kp=3, V=2, O=2, K=3, seed=3)
    J_cam, J_obj = ba.edge_jacobians(
        prob.cam_T, prob.obj_T, prob.uv, prob.info, prob.model_kp, prob.cam_k
    )

    def r_of_cam_delta(d):
        cam_T = lie.se3_exp(d) @ prob.cam_T
        return ba.residual_fn(cam_T, prob.obj_T, prob.uv, prob.info, prob.model_kp, prob.cam_k)

    def r_of_obj_delta(d):
        obj_T = lie.se3_exp(d) @ prob.obj_T
        return ba.residual_fn(prob.cam_T, obj_T, prob.uv, prob.info, prob.model_kp, prob.cam_k)

    V, O, K = prob.valid.shape
    J_cam_ad = jax.jacfwd(r_of_cam_delta)(jnp.zeros((V, 6)))  # [V,O,K,2,V,6]
    J_obj_ad = jax.jacfwd(r_of_obj_delta)(jnp.zeros((O, 6)))  # [V,O,K,2,O,6]
    for v in range(V):
        np.testing.assert_allclose(
            np.asarray(J_cam_ad[v, :, :, :, v]), np.asarray(J_cam[v]), atol=1e-8
        )
    for o in range(O):
        np.testing.assert_allclose(
            np.asarray(J_obj_ad[:, o, :, :, o]), np.asarray(J_obj[:, o]), atol=1e-8
        )


def test_ba_converges_clean():
    # pose_noise ~1 sigma of the measurement model: the regime the engine
    # actually operates in (inits come from PnP)
    prob, cam_gt, obj_gt, _, (nv, no, _) = make_problem(pose_noise=0.004, seed=1)
    res = ba.optimize(prob)
    for v in range(nv):
        a, d = pose_errs(np.asarray(res.cam_T[v]), cam_gt[v])
        assert a < 1e-4 and d < 0.5, f"cam {v}: ang={a}, dt={d}"
    for o in range(no):
        a, d = pose_errs(np.asarray(res.obj_T[o]), obj_gt[o])
        assert a < 1e-4 and d < 0.5, f"obj {o}: ang={a}, dt={d}"


def test_ba_far_init_with_outliers_flag():
    """A far-off init (6 sigma) gates out nearly all edges under the default
    chi2 pre-classification (same mechanism as the reference); the
    opt_init_with_outliers escape hatch (used for T-LESS,
    `evaluate.py:74`/`object_slam.py:849-854`) must still converge."""
    prob, cam_gt, obj_gt, _, (nv, no, _) = make_problem(pose_noise=0.03, seed=1)
    res = ba.optimize(prob, init_with_outliers=True)
    for v in range(nv):
        a, d = pose_errs(np.asarray(res.cam_T[v]), cam_gt[v])
        assert a < 1e-6 and d < 1e-6, f"cam {v}: ang={a}, dt={d}"
    assert int(res.num_inliers) == int(np.asarray(prob.valid).sum())


def test_ba_noise_and_outliers():
    prob, cam_gt, obj_gt, gross, (nv, no, nk) = make_problem(
        noise=0.005, outlier_frac=0.25, pose_noise=0.005, seed=2
    )
    res = ba.optimize(prob)
    inl = np.asarray(res.inliers)
    # gross outliers must be classified out
    assert (inl & gross).sum() <= 0.02 * gross.sum() + 2
    # error floor is set by the 0.5-sigma measurement noise (checked against a
    # zero-outlier run of the same problem: same magnitudes)
    for v in range(nv):
        a, d = pose_errs(np.asarray(res.cam_T[v]), cam_gt[v])
        assert a < 0.035 and d < 20.0, f"cam {v}: ang={a}, dt={d}"
    for o in range(no):
        a, d = pose_errs(np.asarray(res.obj_T[o]), obj_gt[o])
        assert a < 0.035 and d < 20.0, f"obj {o}: ang={a}, dt={d}"


def test_ba_gauge_first_camera_fixed():
    prob, cam_gt, _, _, _ = make_problem(pose_noise=0.02, seed=4)
    res = ba.optimize(prob)
    np.testing.assert_allclose(np.asarray(res.cam_T[0]), np.asarray(prob.cam_T[0]), atol=1e-12)


def test_tracking_mode():
    """Unary-edge optimization of only the current camera with objects fixed."""
    prob, cam_gt, obj_gt, _, (nv, no, nk) = make_problem(seed=5, noise=0.002)
    # perturb camera 3, freeze everything at GT, mark only view 3 active
    V, O, K = prob.valid.shape
    cam_active = np.zeros(V, bool)
    cam_active[3] = True
    xi = np.array([0.006, -0.004, 0.003, 2.0, -1.5, 3.0])  # within the chi2 gate
    cam_T0 = np.asarray(prob.cam_T).copy()
    cam_T0[3] = np.asarray(lie.se3_exp(jnp.asarray(xi))) @ cam_T0[3]
    prob2 = prob._replace(cam_T=jnp.asarray(cam_T0), cam_active=jnp.asarray(cam_active))
    res = ba.optimize(prob2, iters_per_round=ba.DEFAULT_TRACKING_ROUNDS, tracking_only=True)
    a, d = pose_errs(np.asarray(res.cam_T[3]), cam_gt[3])
    assert a < 5e-3 and d < 2.5, f"tracking: ang={a}, dt={d}"
    # objects must not move
    np.testing.assert_allclose(np.asarray(res.obj_T), np.asarray(prob2.obj_T), atol=1e-12)

    # far-off init: all edges fail the chi2 gate -> the default run must be a
    # no-op (reference: "Not enough edges, quitting"), while
    # opt_init_with_outliers recovers (the T-LESS camera-tracking setting,
    # `object_slam.py:849-854`).
    xi_far = np.array([0.03, -0.02, 0.01, 8.0, -5.0, 10.0])
    cam_T0f = np.asarray(prob.cam_T).copy()
    cam_T0f[3] = np.asarray(lie.se3_exp(jnp.asarray(xi_far))) @ cam_T0f[3]
    prob3 = prob._replace(cam_T=jnp.asarray(cam_T0f), cam_active=jnp.asarray(cam_active))
    res_stuck = ba.optimize(prob3, iters_per_round=ba.DEFAULT_TRACKING_ROUNDS, tracking_only=True)
    np.testing.assert_allclose(np.asarray(res_stuck.cam_T[3]), cam_T0f[3], atol=1e-12)
    res_rec = ba.optimize(
        prob3, iters_per_round=ba.DEFAULT_TRACKING_ROUNDS, tracking_only=True,
        init_with_outliers=True,
    )
    a, d = pose_errs(np.asarray(res_rec.cam_T[3]), cam_gt[3])
    assert a < 5e-3 and d < 2.5, f"tracking far-init recovery: ang={a}, dt={d}"


def test_ba_f32():
    prob, cam_gt, obj_gt, _, (nv, no, _) = make_problem(
        pose_noise=0.004, noise=0.003, seed=6, dtype=np.float32
    )
    res = ba.optimize(prob)
    for v in range(nv):
        a, d = pose_errs(np.asarray(res.cam_T[v], np.float64), cam_gt[v])
        # f64 on the identical problem gives max ang err 0.0217 (statistical
        # floor); f32 matches it to 4 decimals thanks to the Jacobi
        # preconditioning, so any threshold above the floor checks f32 parity.
        assert a < 0.03 and d < 20.0, f"f32 cam {v}: ang={a}, dt={d}"


def test_ba_empty_problem_is_noop():
    prob, *_ = make_problem(seed=7)
    prob = prob._replace(valid=jnp.zeros_like(prob.valid), inliers=jnp.zeros_like(prob.inliers))
    res = ba.optimize(prob)
    np.testing.assert_allclose(np.asarray(res.cam_T), np.asarray(prob.cam_T), atol=1e-12)
    assert int(res.num_inliers) == 0


def _reference_huber_rounds(its):
    """Simulate the reference's kernel-drop placement (`lib/object_slam.py:866-896`).

    `set_robust_kernel(None)` runs in the reclassification loop AFTER
    `optimizer.optimize(its[it])` of round `it == max(1, len(its)//2)`, so the
    kernel is active DURING rounds 0..max(1, len//2) and inactive after.
    Returns the per-round kernel-active flags.
    """
    kernel_on = True
    flags = []
    for it in range(len(its)):
        flags.append(kernel_on)  # state during this round's optimize()
        if it == max(1, len(its) // 2):
            kernel_on = False
    return flags


def test_huber_schedule_matches_reference():
    # Our rule in ba.optimize: use_huber = rnd <= max(1, n_rounds // 2).
    for n in (1, 2, 3, 4, 6, 8):
        ours = [rnd <= max(1, n // 2) for rnd in range(n)]
        ref = _reference_huber_rounds([10] * n)
        assert ours == ref, f"n_rounds={n}: ours={ours} ref={ref}"


def test_no_cov_information_scaling_semantics():
    """Quantifies the deliberate deviation from the reference's no-cov BA.

    The reference uses IDENTITY information in `--no_network_cov` BA
    (`object_slam.py:825-828`) while gating inliers at chi2 <= 5.991 — in
    NDC units that accepts residuals up to sqrt(5.991) ~ 2.45, i.e. beyond
    the whole [-1, 1] image: the gate is vacuous and outliers stay in the
    optimization. Ours scales information by 1/manual_kp_std^2
    (`slam/kernels.py:54-66`) so the same gate means 2.45 sigma.

    This test pins both facts: (a) scale does not change the least-squares
    OPTIMUM on clean data (identical recovered poses); (b) with outliers,
    identity information classifies everything as inlier while scaled
    information rejects the outliers and recovers a far better pose.
    """
    prob, cam_gt, obj_gt, _, (nv, no, nk) = make_problem(
        pose_noise=0.004, noise=0.002, seed=11, dtype=np.float64
    )
    sigma = 0.01
    ident = jnp.broadcast_to(jnp.eye(2, dtype=prob.info.dtype), prob.info.shape)
    scaled = ident / sigma**2

    # (a) clean data: same optimum regardless of information scale
    res_i = ba.optimize(prob._replace(info=ident))
    res_s = ba.optimize(prob._replace(info=scaled))
    for v in range(nv):
        ai, _ = pose_errs(np.asarray(res_i.cam_T[v]), cam_gt[v])
        as_, _ = pose_errs(np.asarray(res_s.cam_T[v]), cam_gt[v])
        assert abs(ai - as_) < 0.02, (v, ai, as_)
    # identity info makes the 5.991 gate vacuous: every valid edge "inlier"
    assert int(res_i.num_inliers) == int(jnp.sum(prob.valid))

    # (b) inject gross outliers (0.3 NDC off) into 20% of measurements
    rng = np.random.default_rng(3)
    uv = np.asarray(prob.uv).copy()
    out_mask = rng.uniform(size=uv.shape[:-1]) < 0.2
    uv[out_mask] += rng.choice([-0.3, 0.3], size=uv[out_mask].shape)
    prob_o = prob._replace(uv=jnp.asarray(uv))

    res_io = ba.optimize(prob_o._replace(info=ident))
    res_so = ba.optimize(prob_o._replace(info=scaled))
    # identity: outliers accepted (gate vacuous)
    frac_in_ident = float(res_io.num_inliers) / float(jnp.sum(prob.valid))
    assert frac_in_ident > 0.95, frac_in_ident
    # scaled: outliers rejected
    n_clean = float(jnp.sum(prob.valid & ~jnp.asarray(out_mask)))
    assert float(res_so.num_inliers) <= n_clean * 1.02

    err_i = np.mean([pose_errs(np.asarray(res_io.cam_T[v]), cam_gt[v])[0]
                     for v in range(nv)])
    err_s = np.mean([pose_errs(np.asarray(res_so.cam_T[v]), cam_gt[v])[0]
                     for v in range(nv)])
    # quantified: scaled info recovers a much better pose under outliers
    assert err_s < 0.5 * err_i, (err_s, err_i)


def test_edge_planes_Hg_matches_oracle():
    """The plane-based H/g assembly (the hot LM path) must match the naive
    tensor oracle `_edge_terms` + einsum assembly exactly in f64."""
    V, O, K = 4, 2, 5
    r = np.random.default_rng(0)
    cam_T = np.tile(np.eye(4), (V, 1, 1))
    for v in range(V):
        q, _ = np.linalg.qr(r.normal(size=(3, 3)))
        cam_T[v, :3, :3] = q * np.sign(np.linalg.det(q))
        cam_T[v, :3, 3] = r.normal(size=3) * 0.1
    obj_T = np.tile(np.eye(4), (O, 1, 1))
    for o in range(O):
        q, _ = np.linalg.qr(r.normal(size=(3, 3)))
        obj_T[o, :3, :3] = q * np.sign(np.linalg.det(q))
        obj_T[o, :3, 3] = [0.3 * o, 0.1, 1.5]
    uv = r.normal(size=(V, O, K, 2)) * 0.1
    A = r.normal(size=(V, O, K, 2, 2)) * 0.2
    info = A @ np.swapaxes(A, -1, -2) + np.eye(2) * 2.0
    model_kp = r.uniform(-0.05, 0.05, (O, K, 3))
    cam_k = np.tile(np.asarray([1.2, 1.1, 0.01, 0.02]), (V, O, 1))
    w = r.uniform(0.2, 1.0, (V, O, K))
    args = tuple(jnp.asarray(a) for a in (cam_T, obj_T, uv, info, model_kp, cam_k))

    rr, chi2_o, _, J_cam, J_obj = ba._edge_terms(*args)
    J = jnp.concatenate([J_cam, J_obj], axis=-1)
    Wi = jnp.asarray(info) * jnp.asarray(w)[..., None, None]
    JW = jnp.einsum("vokai,vokab->vokbi", J, Wi)
    H_o = jnp.einsum("vokai,vokaj->voij", JW, J)
    g_o = jnp.einsum("vokai,voka->voi", JW, rr)

    H_n, g_n, chi2_n, _ = ba._edge_planes_Hg(*args, jnp.asarray(w))
    scale = float(jnp.max(jnp.abs(H_o)))
    np.testing.assert_allclose(np.asarray(H_n), np.asarray(H_o), atol=1e-9 * scale)
    np.testing.assert_allclose(np.asarray(g_n), np.asarray(g_o), atol=1e-10 * scale)
    np.testing.assert_allclose(np.asarray(chi2_n), np.asarray(chi2_o), atol=1e-10)


def test_schur_solver_matches_dense_reference():
    """Schur-complement solve (incl. the merged-RHS batched triangular
    solves) must match a dense solve of the full masked damped system."""
    V, O = 6, 3
    r = np.random.default_rng(1)

    def spd(n, b):
        A = r.normal(size=(b, n, n))
        return jnp.asarray(A @ np.swapaxes(A, -1, -2) + np.eye(n) * (n + 1.0))

    Hcc, Hoo = spd(6, V), spd(6, O)
    Hco = jnp.asarray(r.normal(size=(V, O, 6, 6)) * 0.2)
    gc = jnp.asarray(r.normal(size=(V, 6)))
    go = jnp.asarray(r.normal(size=(O, 6)))
    cam_free = jnp.asarray([True, True, False, True, True, True])
    obj_free = jnp.asarray([True, False, True])
    lam = jnp.asarray(1e-4)
    d_cam, d_obj, ok = ba._solve_normal_eq_schur(
        Hcc, Hoo, Hco, gc, go, cam_free, obj_free, lam
    )
    assert bool(ok)
    eye6 = np.eye(6)
    mc = np.asarray(cam_free, float)
    mo = np.asarray(obj_free, float)

    def damp(H, m):
        out = []
        for i in range(H.shape[0]):
            d = np.maximum(np.diag(np.asarray(H[i])), 1e-9)
            out.append(np.asarray(H[i]) + float(lam) * np.diag(d) if m[i] else eye6)
        return np.stack(out)

    Hcc_d, Hoo_d = damp(Hcc, mc), damp(Hoo, mo)
    Hco_m = np.asarray(Hco) * mc[:, None, None, None] * mo[None, :, None, None]
    n = 6 * (V + O)
    Hf = np.zeros((n, n))
    gf = np.zeros(n)
    for v in range(V):
        Hf[6 * v:6 * v + 6, 6 * v:6 * v + 6] = Hcc_d[v]
        gf[6 * v:6 * v + 6] = np.asarray(gc)[v] * mc[v]
    for o in range(O):
        Hf[6 * V + 6 * o:6 * V + 6 * o + 6, 6 * V + 6 * o:6 * V + 6 * o + 6] = Hoo_d[o]
        gf[6 * V + 6 * o:6 * V + 6 * o + 6] = np.asarray(go)[o] * mo[o]
    for v in range(V):
        for o in range(O):
            Hf[6 * v:6 * v + 6, 6 * V + 6 * o:6 * V + 6 * o + 6] = Hco_m[v, o]
            Hf[6 * V + 6 * o:6 * V + 6 * o + 6, 6 * v:6 * v + 6] = Hco_m[v, o].T
    d = np.linalg.solve(Hf, -gf)
    np.testing.assert_allclose(
        np.asarray(d_cam), d[:6 * V].reshape(V, 6) * mc[:, None], atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(d_obj), d[6 * V:].reshape(O, 6) * mo[:, None], atol=1e-8
    )
