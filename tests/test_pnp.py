import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from suo_slam_tpu.solvers import p3p as p3p_mod
from suo_slam_tpu.solvers import pnp as pnp_mod


def make_scene(n_pts, seed=0, noise=0.0, outlier_frac=0.0, dtype=np.float64, scale=1.0):
    """Synthetic P[n]P problem: random pose, points in front of camera.

    Like the reference's simulator harness
    (thirdparty/lambdatwist/simulator.h: PointCloudWithNoisyMeasurements).
    """
    rng = np.random.default_rng(seed)
    R = Rotation.random(random_state=rng).as_matrix()
    t = rng.normal(size=3) * 0.5
    x = rng.uniform(-1, 1, size=(n_pts, 3)) * scale
    # place points so they are in front: express in camera frame with z in [4, 8]*scale
    p_cam = rng.uniform(-1, 1, size=(n_pts, 3)) * scale
    p_cam[:, 2] = rng.uniform(4, 8, size=n_pts) * scale
    x = (p_cam - t * scale) @ R  # so that R x + t*scale = p_cam
    t = t * scale
    y = p_cam[:, :2] / p_cam[:, 2:3]
    if noise > 0:
        y = y + rng.normal(size=y.shape) * noise
    n_out = int(outlier_frac * n_pts)
    if n_out:
        out_idx = rng.choice(n_pts, size=n_out, replace=False)
        y[out_idx] = rng.uniform(-0.5, 0.5, size=(n_out, 2))
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return x.astype(dtype), y.astype(dtype), T.astype(dtype)


def pose_err(T_est, T_gt):
    dR = T_est[:3, :3] @ T_gt[:3, :3].T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    dt = np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3])
    return ang, dt


def test_p3p_exact():
    """Noise-free P3P must contain the GT pose among its solutions."""
    for seed in range(20):
        x, y, T = make_scene(3, seed=seed)
        y_h = np.concatenate([y, np.ones((3, 1))], axis=1)
        Rs, ts, valid = p3p_mod.p3p(jnp.asarray(y_h), jnp.asarray(x))
        Rs, ts, valid = np.asarray(Rs), np.asarray(ts), np.asarray(valid)
        assert valid.any(), f"no valid solution seed={seed}"
        errs = []
        for i in range(4):
            if valid[i]:
                Ti = np.eye(4)
                Ti[:3, :3] = Rs[i]
                Ti[:3, 3] = ts[i]
                a, d = pose_err(Ti, T)
                errs.append(a + d)
        assert min(errs) < 1e-6, f"seed={seed} best err {min(errs)}"


def test_p4p_disambiguates():
    for seed in range(20):
        x, y, T = make_scene(4, seed=100 + seed)
        T_est, err, ok = p3p_mod.p4p(jnp.asarray(y), jnp.asarray(x))
        assert bool(ok)
        a, d = pose_err(np.asarray(T_est), T)
        assert a < 1e-6 and d < 1e-6, f"seed={seed}: ang={a} dt={d}"


def test_pnp_ransac_clean():
    key = jax.random.PRNGKey(0)
    x, y, T = make_scene(41, seed=1)
    mask = np.ones(41, dtype=bool)
    res = pnp_mod.pnp_ransac(jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask), key)
    assert bool(res.success)
    a, d = pose_err(np.asarray(res.T), T)
    assert a < 1e-5 and d < 1e-5
    assert int(res.num_inliers) == 41


def test_pnp_ransac_outliers_noise():
    """Reference benchmark regime: sigma up to ~1px (noise ~0.002 normalized),
    50% outliers (test_pnp.cpp:76-83)."""
    key = jax.random.PRNGKey(7)
    fails = 0
    for seed in range(15):
        x, y, T = make_scene(41, seed=200 + seed, noise=0.001, outlier_frac=0.5)
        res = pnp_mod.pnp_ransac(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(np.ones(41, bool)),
            jax.random.fold_in(key, seed), threshold=0.005,
        )
        a, d = pose_err(np.asarray(res.T), T)
        if not (bool(res.success) and a < 0.03 and d < 0.15):
            fails += 1
    assert fails <= 1, f"{fails}/15 hard-regime failures"


def test_pnp_padded_mask():
    """Padding entries must not affect the result."""
    key = jax.random.PRNGKey(3)
    x, y, T = make_scene(10, seed=5)
    xp = np.zeros((41, 3))
    yp = np.zeros((41, 2))
    m = np.zeros(41, dtype=bool)
    xp[:10], yp[:10], m[:10] = x, y, True
    res = pnp_mod.pnp_ransac(jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(m), key)
    assert bool(res.success)
    a, d = pose_err(np.asarray(res.T), T)
    assert a < 1e-5 and d < 1e-5
    assert not bool(np.asarray(res.inliers)[10:].any())


def test_pnp_failure_contract():
    """<4 valid points -> identity pose, success False (lib/object_slam.py:31)."""
    key = jax.random.PRNGKey(4)
    x = np.zeros((41, 3))
    y = np.zeros((41, 2))
    m = np.zeros(41, dtype=bool)
    m[:3] = True
    res = pnp_mod.pnp_ransac(jnp.asarray(x), jnp.asarray(y), jnp.asarray(m), key)
    assert not bool(res.success)
    np.testing.assert_allclose(np.asarray(res.T), np.eye(4))
    assert int(res.num_inliers) == 0


def test_pnp_f32():
    """f32 path (TPU dtype) with preconditioning on mm-scale points."""
    key = jax.random.PRNGKey(9)
    ok = 0
    for seed in range(10):
        # mm-scale model points (like BOP meshes) at ~600mm depth
        x, y, T = make_scene(41, seed=300 + seed, noise=0.0005, scale=100.0)
        res = pnp_mod.pnp_ransac(
            jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
            jnp.asarray(np.ones(41, bool)), jax.random.fold_in(key, seed),
            threshold=0.004,
        )
        a, d = pose_err(np.asarray(res.T, np.float64), T)
        if bool(res.success) and a < 0.02 and d < 0.05 * 100.0:
            ok += 1
    assert ok >= 9, f"only {ok}/10 f32 solves accurate"


def test_pnp_batch_vmap():
    key = jax.random.PRNGKey(11)
    xs, ys, Ts = [], [], []
    for seed in range(6):
        x, y, T = make_scene(41, seed=400 + seed, noise=0.0005)
        xs.append(x)
        ys.append(y)
        Ts.append(T)
    res = pnp_mod.pnp_ransac_batch(
        jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ys)),
        jnp.asarray(np.ones((6, 41), bool)), key, threshold=0.004,
    )
    assert np.asarray(res.success).all()
    for i in range(6):
        a, d = pose_err(np.asarray(res.T[i]), Ts[i])
        assert a < 0.01 and d < 0.02, f"batch {i}: {a} {d}"
